"""ANN/embedding-tier data-scale sweep (the r5 verdict's evidence gap).

The graph/dedup tiers have measured scale points (bench_r5_scale_sweep);
this script measures the EMBEDDING tier at 3 corpus sizes that fit the
128 GiB box, for each size recording wall seconds, recall vs the exact
twin (where the exact twin is feasible), and whether the LSH bucket
guard engaged:

  * near_dup_lsh (banded hyperplane LSH + exact verify, guarded) vs
    near_dup_blocked (exact O(N²) block-nested BLAS) — recall at the
    sizes where N² is affordable, wall + pair count everywhere.
  * ivf_topk (distributed Lloyd IVF) and lsh_topk vs cosine_topk_blocked
    (exact top-k) — recall@10 over 100 queries at every size.

Corpora are engine-generated (seeded hash → unit vectors, ~6% of rows
are small-noise perturbations of earlier rows so near-dup structure and
bucket concentration are real), dim 64 like the driver's embeddings.

Run:  python BENCH/ann_scale_sweep.py [--quick]
Writes BENCH/bench_r6_ann_sweep.json.
"""

from __future__ import annotations

import json
import logging
import sys
import time

sys.path.insert(0, "/root/repo")

QUICK = "--quick" in sys.argv
SIZES = [20_000, 80_000] if QUICK else [20_000, 80_000, 320_000]
EXACT_ND_MAX = 80_000  # largest size for the O(N²) exact near-dup twin
DIM = 64
K = 10
N_QUERIES = 100
OUT_PATH = "/root/repo/BENCH/bench_r6_ann_sweep.json"


class _GuardLogCatcher(logging.Handler):
    def __init__(self):
        super().__init__()
        self.engaged = []

    def emit(self, record):
        self.engaged.append(record.getMessage()[:160])


def gen_corpus(spark, n: int):
    """(vec_id, embedding) — seeded-hash unit vectors; rows with
    vec_id % 16 == 3 are noise-perturbed copies of vec_id-3 (near-dup
    mass + bucket concentration)."""
    from pyspark.sql import functions as F

    import numpy as np
    import pandas as pd

    def make(batches):
        rng_dim = DIM
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), rng_dim), dtype=np.float32)
            for j, i in enumerate(ids):
                base_id = int(i) - 3 if int(i) % 16 == 3 and int(i) >= 3 else int(i)
                rs = np.random.RandomState((base_id * 2654435761 + 12345) % (2**32))
                v = rs.standard_normal(rng_dim).astype(np.float32)
                if base_id != int(i):
                    rs2 = np.random.RandomState((int(i) * 40503 + 7) % (2**32))
                    v = v + 0.05 * rs2.standard_normal(rng_dim).astype(np.float32)
                out[j] = v / np.linalg.norm(v)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(out)})

    return (
        spark.range(0, n, 1, 32)
        .mapInPandas(make, "vec_id long, embedding array<float>")
        .localCheckpoint(eager=True)
    )


def pairs_set(df):
    return {(r["a"], r["b"]) for r in df.select("a", "b").collect()}


def topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def main() -> None:
    from bench import _session
    from pyspark.sql import functions as F

    from gms_spark.sim.ann import (
        cosine_topk_blocked,
        ivf_topk,
        lsh_topk,
        near_dup_blocked,
        near_dup_lsh,
    )

    catcher = _GuardLogCatcher()
    logging.getLogger("gms_spark.lshguard").addHandler(catcher)

    spark = _session(32, pin_shuffled_hash=False)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"dim": DIM, "k": K, "n_queries": N_QUERIES, "near_dup": [], "topk": []}

    for n in SIZES:
        corpus = gen_corpus(spark, n)
        corpus.count()

        # ---- near-dup tier. Banding is scaled with N per the operator's
        # own guidance (the guard log's "raise n_planes" cue): candidate
        # mass ≈ N²/2^planes × bands, so planes grow with log₂N to hold
        # the verify volume ~flat. Multiprobe off for the sweep (the ×9
        # Hamming-1 fan-out is a recall lever for mid-cos pairs; the
        # measured recall column shows what the pure banding achieves).
        # A fixed default-parameter run at N=20k measured 197 s — WORSE
        # than the 7 s exact O(N²) BLAS twin — which is the point of the
        # cue: banding must track corpus size or verify mass re-goes
        # quadratic with a small constant.
        n_planes = 8 if n <= 20_000 else (12 if n <= 80_000 else 14)
        catcher.engaged.clear()
        t0 = time.time()
        lsh_pairs = near_dup_lsh(corpus, threshold=0.8, n_planes=n_planes, probes=0)
        got = pairs_set(lsh_pairs)
        lsh_s = round(time.time() - t0, 2)
        row = {
            "n": n,
            "n_planes": n_planes,
            "lsh_wall_s": lsh_s,
            "lsh_pairs": len(got),
            "guard_engaged": bool(catcher.engaged),
            "guard_log": catcher.engaged[:2],
        }
        if n <= EXACT_ND_MAX:
            t0 = time.time()
            exact = pairs_set(near_dup_blocked(corpus, threshold=0.8, block_size=4096))
            row["exact_wall_s"] = round(time.time() - t0, 2)
            row["exact_pairs"] = len(exact)
            row["recall"] = round(len(got & exact) / max(len(exact), 1), 4)
            row["precision"] = round(len(got & exact) / max(len(got), 1), 4)
        out["near_dup"].append(row)
        print("near_dup", row, flush=True)

        # ---- top-k tier
        queries = corpus.where(F.col("vec_id") % (n // N_QUERIES) == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ).localCheckpoint(eager=True)
        t0 = time.time()
        exact_tk = topk_map(cosine_topk_blocked(corpus, queries, k=K))
        exact_s = round(time.time() - t0, 2)
        t0 = time.time()
        ivf = topk_map(ivf_topk(corpus, queries, k=K, n_centroids=64, n_probe=8))
        ivf_s = round(time.time() - t0, 2)
        catcher.engaged.clear()
        t0 = time.time()
        lshk = topk_map(lsh_topk(corpus, queries, k=K))
        lshk_s = round(time.time() - t0, 2)

        def recall(approx):
            tot = sum(len(exact_tk[q] & approx.get(q, set())) for q in exact_tk)
            return round(tot / (len(exact_tk) * K), 4)

        row = {
            "n": n,
            "exact_wall_s": exact_s,
            "ivf_wall_s": ivf_s,
            "ivf_recall": recall(ivf),
            "lsh_wall_s": lshk_s,
            "lsh_recall": recall(lshk),
            "lsh_guard_engaged": bool(catcher.engaged),
        }
        out["topk"].append(row)
        print("topk", row, flush=True)

    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT_PATH)


if __name__ == "__main__":
    main()
