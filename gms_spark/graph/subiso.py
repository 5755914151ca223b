"""Subgraph isomorphism — pattern matching as a join-based frontier.

Reference semantics (gms/algorithms/non_set_based/subgraphiso/vf2/
sequential/vf2.hpp:16-83): find embeddings of a small pattern graph in
a target graph (injective vertex mapping preserving pattern edges).
The reference's VF2 backtracks one mapping at a time and stops at the
first embedding (parallel variant splits the first level,
parallel/vf2.hpp); our engine enumerates ALL embeddings — the natural
bulk formulation — and `first_embedding` gives the reference's
boolean/1-row contract.

Spark shape: order pattern vertices so each one (after the first) is
adjacent to an earlier one (a connected search order — what VF2's
candidate-pair selection achieves); the frontier DataFrame holds one
row per partial mapping (one column per pattern vertex). Each level
extends by joining the adjacency of an already-mapped neighbor, then
filters (a) injectivity and (b) every pattern edge into the new vertex
— plain Catalyst joins/filters, no UDF, AQE-planned. Automorphic
pattern symmetry is NOT deduplicated (each automorphic image counts
separately, matching VF2 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _search_order(pattern_edges: list[tuple[int, int]]) -> list[int]:
    """Pattern vertices ordered so each is adjacent to an earlier one."""
    adj: dict[int, set[int]] = {}
    for u, v in pattern_edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    order = [min(adj)]
    seen = {order[0]}
    while len(order) < len(adj):
        nxt = min(
            (v for v in adj if v not in seen and adj[v] & seen),
            key=lambda v: (-len(adj[v] & seen), v),
        )
        order.append(nxt)
        seen.add(nxt)
    return order


def subgraph_match(edges: DataFrame, pattern_edges: list[tuple[int, int]]) -> DataFrame:
    """All embeddings of the pattern in a simple undirected graph.

    ``edges`` must be symmetrized. Returns one column ``p{i}`` per
    pattern vertex i, one row per injective embedding.
    """
    if not pattern_edges:
        raise ValueError("pattern must have at least one edge")
    order = _search_order(pattern_edges)
    pat: set[tuple[int, int]] = set()
    for u, v in pattern_edges:
        pat.add((u, v))
        pat.add((v, u))

    cols = [f"p{order[0]}"]
    frontier = edges.select(F.col("src").alias(cols[0])).distinct()
    mapped = [order[0]]
    for pv in order[1:]:
        anchors = [u for u in mapped if (u, pv) in pat]
        a0 = anchors[0]
        e = edges.select(F.col("src").alias(f"p{a0}"), F.col("dst").alias(f"p{pv}"))
        frontier = frontier.join(e, f"p{a0}")
        # injectivity vs all previously mapped vertices
        for u in mapped:
            frontier = frontier.where(F.col(f"p{pv}") != F.col(f"p{u}"))
        # remaining pattern edges into pv checked via semi-joins
        for u in anchors[1:]:
            e2 = edges.select(F.col("src").alias(f"p{u}"), F.col("dst").alias(f"p{pv}"))
            frontier = frontier.join(e2, [f"p{u}", f"p{pv}"], "left_semi")
        mapped.append(pv)
        cols.append(f"p{pv}")
    return frontier.select(*[f"p{i}" for i in sorted(int(c[1:]) for c in cols)])


def subgraph_count(edges: DataFrame, pattern_edges: list[tuple[int, int]]) -> int:
    """Number of embeddings (automorphisms counted, VF2 convention)."""
    return subgraph_match(edges, pattern_edges).count()


def first_embedding(edges: DataFrame, pattern_edges: list[tuple[int, int]]):
    """The reference contract: one embedding or None (vf2.hpp:16-83)."""
    rows = subgraph_match(edges, pattern_edges).limit(1).collect()
    return dict(zip(sorted({v for e in pattern_edges for v in e}), rows[0])) if rows else None
