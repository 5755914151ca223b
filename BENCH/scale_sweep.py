"""Data-scale sweep — measured evidence that the hot plans survive scale-up.

The plan audits (PLANS.md) argue the headline kernels would hold at
100×; this script MEASURES the claim at the largest inputs the 128 GiB
box fits:

  * PageRank superstep throughput (edges/sec) over R-MAT scale
    18 → 20 → 22 → 23 (deg 16): symmetrized edge counts ~2.8M → 31M →
    119M → 228M — a 64× data sweep on the same 32-core plan. Constant
    (or rising) edges/sec across the sweep = the superstep is
    throughput-bound, not latency/skew-bound; a collapse at the top end
    would expose a memory cliff or a skew stall the audits missed.
  * Connected components end-to-end wall time at the same scales —
    rounds grow ~log(n), so wall time should grow ~m·log(n)/throughput.
  * MinHash-LSH dedup (the shingle-array memory-cliff candidate) over
    the documents table at sf0.01 → sf0.1 → sf0.1×4 (deterministic
    suffix-perturbed replicas — same corpus statistics, 4× the rows;
    synthetic, engine-generated, no external data).

Run:  python BENCH/scale_sweep.py [--quick]
Writes BENCH/bench_r5_scale_sweep.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

QUICK = "--quick" in sys.argv
PR_SCALES = [18, 20] if QUICK else [18, 20, 22, 23]
CC_SCALES = [18, 20] if QUICK else [18, 20, 22]
DEG = 16
SUPERSTEPS = 5
OUT_PATH = "/root/repo/BENCH/bench_r5_scale_sweep.json"
# --only pagerank,components,minhash_dedup reruns just those sections,
# merging over an existing JSON (crash-resume for the long sweep)
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))


def _want(section: str) -> bool:
    return ONLY is None or section in ONLY


def main() -> None:
    import os

    from pyspark.sql import functions as F

    from bench import _prepare_scaling_input, _session, pr_throughput_from_parquet

    out: dict = {"deg": DEG, "supersteps": SUPERSTEPS, "pagerank": [], "components": [], "minhash_dedup": []}
    if ONLY is not None and os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            out.update(json.load(f))
        # sections being rerun replace their old rows (resume after a
        # mid-section crash would otherwise duplicate completed scales)
        for sec in ONLY:
            out[sec] = []

    # --- PageRank superstep throughput across R-MAT scales ----------------
    for scale in PR_SCALES if _want("pagerank") else []:
        path, n, m = _prepare_scaling_input(scale, DEG)
        s = _session(32)
        r = pr_throughput_from_parquet(s, path, n, m, SUPERSTEPS, trials=3, warmup=2)
        s.stop()
        row = {"scale": scale, "n_vertices": n, "m_edges": m, **r}
        out["pagerank"].append(row)
        print(json.dumps(row), flush=True)

    # --- Connected components end-to-end at the same scales ---------------
    from gms_spark.graph.components import connected_components

    for scale in CC_SCALES if _want("components") else []:
        path, n, m = _prepare_scaling_input(scale, DEG)
        s = _session(32)
        edges = s.read.parquet(path).select("src", "dst").persist()
        edges.count()
        t0 = time.time()
        res = connected_components(edges)
        n_comp = res.components.select("component").distinct().count()
        dt = time.time() - t0
        edges.unpersist()
        s.stop()
        row = {
            "scale": scale,
            "n_vertices": n,
            "m_edges": m,
            "wall_s": round(dt, 3),
            "iterations": res.iterations,
            "n_components": n_comp,
            "edges_per_sec_per_round": round(m * res.iterations / dt, 1),
        }
        out["components"].append(row)
        print(json.dumps(row), flush=True)

    # --- MinHash-LSH dedup: shingle-array memory-cliff probe ---------------
    from gms_spark.text.dedup import minhash_lsh_join

    for label, sf_dir, reps in [
        ("sf0.01", "/root/testdata/sf0.01", 1),
        ("sf0.1", "/root/testdata/sf0.1", 1),
        ("sf0.1x4", "/root/testdata/sf0.1", 4),
    ] if _want("minhash_dedup") else []:
        if QUICK and reps > 1:
            continue
        s = _session(32)
        docs = s.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        if reps > 1:
            # deterministic replicas: distinct ids, a replica-tagged first
            # token so copies of one doc stay near-dup (not exact-dup)
            base = docs
            parts = [base]
            n_docs = base.count()
            for r in range(1, reps):
                parts.append(
                    base.select(
                        (F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"),
                        F.concat(F.lit(f"rep{r} "), F.col("text")).alias("text"),
                    )
                )
            docs = parts[0]
            for p in parts[1:]:
                docs = docs.unionAll(p)
        docs = docs.persist()
        n_docs = docs.count()
        t0 = time.time()
        n_pairs = minhash_lsh_join(docs, threshold=0.5).count()
        dt = time.time() - t0
        docs.unpersist()
        s.stop()
        row = {
            "input": label,
            "n_docs": n_docs,
            "wall_s": round(dt, 3),
            "dup_pairs": n_pairs,
            "docs_per_sec": round(n_docs / dt, 1),
        }
        out["minhash_dedup"].append(row)
        print(json.dumps(row), flush=True)

    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
