"""Single-process numpy oracles for the graph kernels.

Each oracle is an independent reimplementation of the reference
semantics (the role of the reference's `-v` verifiers,
gms/common/benchmark.h:36-46):
  * pagerank_oracle        — PageRankPull, log_graph/pr.cc:34-61
  * components_oracle      — min-vertex-id per component via union-find
                             (fixpoint of cc.cc:40-72)
  * labelprop_oracle       — the pinned synchronous-LP semantics
                             (gms_spark/graph/labelprop.py docstring)
  * triangle_total_oracle  — serial recount, triangle_count/verifier.h:13-42
  * triangle_vertex_oracle — per-vertex Σ|N(u)∩N(v)| convention,
                             triangle_count/parallel/vertex.h:14-49
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import numpy as np

DATA = Path(__file__).parent / "data"


def load_el(name: str) -> np.ndarray:
    """Read a .el fixture into an (m,2) int array (raw, directed rows)."""
    rows = []
    for line in (DATA / name).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        u, v = line.split()[:2]
        rows.append((int(u), int(v)))
    return np.array(rows, dtype=np.int64).reshape(-1, 2)


def undirect(el: np.ndarray) -> np.ndarray:
    """Symmetrize + dedupe + drop self-loops (SquishGraph semantics)."""
    both = np.vstack([el, el[:, ::-1]])
    both = both[both[:, 0] != both[:, 1]]
    return np.unique(both, axis=0)


def neighbors(el: np.ndarray) -> dict[int, np.ndarray]:
    """Sorted neighbor arrays of an undirected (symmetrized) edge array."""
    adj: dict[int, list[int]] = {}
    for u, v in el:
        adj.setdefault(int(u), []).append(int(v))
        adj.setdefault(int(v), [])
    return {u: np.unique(np.array(vs, dtype=np.int64)) for u, vs in adj.items()}


def pagerank_oracle(
    el: np.ndarray, damping: float = 0.85, tol: float = 1e-6, max_iters: int = 100, fixed_iters: int | None = None
) -> dict[int, float]:
    """Pull power iteration over a directed simple edge array (float64)."""
    verts = np.unique(el)
    idx = {int(v): i for i, v in enumerate(verts)}
    n = len(verts)
    out_deg = np.zeros(n)
    for u, _ in el:
        out_deg[idx[int(u)]] += 1
    assert out_deg.min() > 0, "oracle requires out_degree >= 1 (pr.cc:43)"
    src = np.array([idx[int(u)] for u, _ in el])
    dst = np.array([idx[int(v)] for _, v in el])
    score = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    iters = fixed_iters if fixed_iters is not None else max_iters
    for _ in range(iters):
        contrib = score / out_deg
        s = np.zeros(n)
        np.add.at(s, dst, contrib[src])
        new = base + damping * s
        err = np.abs(new - score).sum()
        score = new
        if fixed_iters is None and err < tol:
            break
    return {int(v): float(score[idx[int(v)]]) for v in verts}


def components_oracle(el: np.ndarray) -> dict[int, int]:
    """Union-find; labels normalized to min vertex id per component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in el:
        for x in (int(u), int(v)):
            parent.setdefault(x, x)
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp: dict[int, int] = {}
    groups: dict[int, list[int]] = {}
    for x in parent:
        groups.setdefault(find(x), []).append(x)
    for members in groups.values():
        m = min(members)
        for x in members:
            comp[x] = m
    return comp


def labelprop_oracle(el: np.ndarray, iters: int) -> dict[int, int]:
    """Pinned synchronous LP over an undirected simple edge array."""
    adj = neighbors(undirect(el))
    labels = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, nbrs in adj.items():
            if len(nbrs) == 0:
                new[v] = labels[v]
                continue
            c = Counter(labels[int(u)] for u in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def triangle_total_oracle(el: np.ndarray) -> int:
    """Serial ordered recount u<v<w over the undirected graph
    (equivalent to verifier.h:13-42's recount/6)."""
    adj = neighbors(undirect(el))
    total = 0
    for u, nbrs in adj.items():
        for v in nbrs:
            v = int(v)
            if v > u:
                common = np.intersect1d(nbrs, adj[v], assume_unique=True)
                total += int((common > v).sum())
    return total


def triangle_vertex_oracle(el: np.ndarray) -> dict[int, int]:
    """counts[u] = Σ_{v∈N(u)} |N(u)∩N(v)| (vertex.h convention, = 2·tri(u))."""
    adj = neighbors(undirect(el))
    return {
        u: int(sum(len(np.intersect1d(nbrs, adj[int(v)], assume_unique=True)) for v in nbrs))
        for u, nbrs in adj.items()
    }
