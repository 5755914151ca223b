"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline: PageRank superstep throughput (edges/sec) on a skewed R-MAT
web-graph proxy, plus the north rule's two-cluster-size scaling evidence:
the same job + byte-identical parquet input at 1, 4, 8, and 32 cores
(fresh session each). The REPORTED N-vs-4N efficiency is the 1-core vs
4-core pair (thru_4 / thru_1) / 4 — the cleanest single-box proxy for N
vs 4N executors (zero intra-job contention at N=1) — measured in an
A-B-B-A block order (1c, 4c, 4c, 1c): this sandbox shares hardware, and
back-to-back full runs showed the background load drifting enough to
swing a sequentially-measured pair by ±0.15; the time-symmetric design
cancels linear drift (each config's mean sits at the same midpoint in
time). The 8- and 32-core points are reported alongside so the
single-socket bandwidth saturation is visible, not hidden.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    cores for the main run (default 32)
  BENCH_SKIP_SCALING  set to skip the scaling runs (faster iteration)
  BENCH_RMAT_SCALE    R-MAT scale for PR throughput (default 17)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RMAT_SCALE = int(os.environ.get("BENCH_RMAT_SCALE", "17"))
SCALING_RMAT_SCALE = int(os.environ.get("BENCH_SCALING_RMAT_SCALE", "20"))
RMAT_DEG = 16
PR_SUPERSTEPS = 5
TRIALS = 4  # measured trials (reference protocol: >=3, gms/common/cli/args.h:24)
WARMUP = 2  # discarded: JIT + cache warmup demonstrably extends past one run


def _session(cores: int, pin_shuffled_hash: bool = True):
    from gms_spark.session import get_spark

    extra = {"spark.default.parallelism": str(max(cores, 8))}
    if pin_shuffled_hash:
        # Pin the cluster-realistic plan for THROUGHPUT/SCALING runs: a
        # 10^12-vertex scores table can never broadcast, so the scaling
        # measurement must use the shuffled-hash path at EVERY
        # parallelism level. AQE otherwise flips broadcast on/off
        # between runs (scores ≈ 8 MB at bench scale), which made
        # throughput non-deterministic. Headline queries keep the
        # default config (small dims legitimately broadcast there).
        extra["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    return get_spark(
        f"gms_spark-bench-{cores}",
        cores=cores,
        shuffle_partitions=max(cores, 8),
        extra_conf=extra,
    )


def pr_superstep_throughput(spark, scale: int, deg: int, supersteps: int) -> dict:
    """Edges/sec per PageRank superstep on a symmetrized R-MAT graph.

    Build (generator + squish/symmetrize + SpMV-table cache) is timed
    separately; the throughput clock covers only the iteration loop —
    the number that must scale with cores.
    """
    from pyspark.sql import functions as F

    from gms_spark.graph.build import build_undirected, degrees, vertices
    from gms_spark.graph.generators import rmat_el

    t0 = time.time()
    und = build_undirected(rmat_el(spark, scale, deg)).persist()
    m = und.count()
    verts = vertices(und).persist()
    n = verts.count()
    deg_df = degrees(und)
    ew = (
        und.join(deg_df.withColumnRenamed("vertex", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("degree")).alias("w"))
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")), "src")
        .persist()
    )
    ew.count()
    build_s = time.time() - t0

    damping, base = 0.85, 0.15 / n
    times: list[float] = []
    for _trial in range(TRIALS + WARMUP):  # leading WARMUP trials discarded
        # Symmetrized graph → every vertex has in-edges → groupBy(dst)
        # covers all vertices (no fill-join). The supersteps are chained
        # LAZILY and materialized by ONE action: Spark pipelines the 5
        # shuffle stages inside a single job — no per-superstep driver
        # round-trip, no persist/count double-scan. This is exactly what
        # a production run does between convergence checks.
        scores0 = verts.select("vertex", F.lit(1.0 / n).alias("score")).persist()
        scores0.count()
        t1 = time.time()
        scores = scores0
        for _ in range(supersteps):
            scores = (
                scores.withColumnRenamed("vertex", "src")
                .join(ew, "src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg((F.lit(base) + damping * F.sum(F.col("score") * F.col("w"))).alias("score"))
            )
        scores.agg(F.sum("score")).collect()  # one action materializes all supersteps
        times.append(time.time() - t1)
        scores0.unpersist()
    und.unpersist()
    ew.unpersist()
    verts.unpersist()
    measured = sorted(times[WARMUP:])  # median resists turbo/thermal outliers
    med = measured[len(measured) // 2] if len(measured) % 2 else sum(measured[len(measured) // 2 - 1 : len(measured) // 2 + 1]) / 2
    return {
        "n_vertices": n,
        "m_edges": m,
        "build_s": round(build_s, 3),
        "iter_s": round(med, 3),
        "trial_s": [round(t, 3) for t in times],
        "supersteps": supersteps,
        "edges_per_sec": round(m * supersteps / med, 1),
    }


def _prepare_scaling_input(scale: int, deg: int) -> tuple[str, int, int]:
    """Materialize the scaling graph's SpMV table (src, dst, w=1/deg) to
    parquet ONCE (32-core build) → (path, n_vertices, m_edges).

    Every parallelism level then reads the byte-identical input instead
    of regenerating it, and the symmetrize/degree build cost stays out of
    the low-core blocks' wall time."""
    import pathlib

    from pyspark.sql import functions as F

    from gms_spark.graph.build import build_undirected, degrees, vertices
    from gms_spark.graph.generators import rmat_el

    path = f"/tmp/gms_bench_spmv_s{scale}_d{deg}"
    meta = pathlib.Path(path + ".json")
    if meta.exists() and (pathlib.Path(path) / "_SUCCESS").exists():
        d = json.loads(meta.read_text())
        return path, d["n"], d["m"]
    s = _session(32)
    und = build_undirected(rmat_el(s, scale, deg)).persist()
    m = und.count()
    n = vertices(und).count()
    deg_df = degrees(und)
    (
        und.join(deg_df.withColumnRenamed("vertex", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("degree")).alias("w"))
        .write.mode("overwrite")
        .parquet(path)
    )
    s.stop()
    meta.write_text(json.dumps({"n": n, "m": m}))
    return path, n, m


def pr_throughput_from_parquet(spark, path: str, n: int, m: int, supersteps: int, trials: int, warmup: int) -> dict:
    """Superstep throughput over the pre-materialized SpMV table — the
    same chained-lazy trial loop as pr_superstep_throughput, input from
    parquet so every parallelism level runs on identical bytes."""
    from pyspark.sql import functions as F

    t0 = time.time()
    ew = (
        spark.read.parquet(path)
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")), "src")
        .persist()
    )
    ew.count()
    verts = ew.select(F.col("src").alias("vertex")).distinct().persist()
    verts.count()
    build_s = time.time() - t0

    damping, base = 0.85, 0.15 / n
    times: list[float] = []
    for _trial in range(trials + warmup):
        scores0 = verts.select("vertex", F.lit(1.0 / n).alias("score")).persist()
        scores0.count()
        t1 = time.time()
        scores = scores0
        for _ in range(supersteps):
            scores = (
                scores.withColumnRenamed("vertex", "src")
                .join(ew, "src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg((F.lit(base) + damping * F.sum(F.col("score") * F.col("w"))).alias("score"))
            )
        scores.agg(F.sum("score")).collect()
        times.append(time.time() - t1)
        scores0.unpersist()
    ew.unpersist()
    verts.unpersist()
    measured = times[warmup:]
    mean = sum(measured) / len(measured)
    return {
        "build_s": round(build_s, 3),
        "trial_s": [round(t, 3) for t in times],
        "mean_s": round(mean, 3),
        "edges_per_sec": round(m * supersteps / mean, 1),
    }


def _materialize(df) -> None:
    """Force FULL evaluation of every output column.

    A bare df.count() lets Catalyst prune unused projections — a
    projection-only query (token_stats, language_id) degenerates to a
    parquet row count and the recorded time under-measures the real
    work. Hashing every column into one aggregate makes all of them
    load-bearing while still returning a single row to the driver.
    """
    from pyspark.sql import functions as F

    # bit_xor, not sum: summing 64-bit hashes overflows under ANSI mode
    df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def run_headline_queries(spark) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = [
        "pagerank",
        "pagerank_directed",
        "components",
        "labelprop",
        "triangles_total",
        "kclique4",
        "vertex_similarity",
        "link_prediction",
        "coreness",
        "coloring",
        "coloring_barenboim",
        "coloring_elkin",
        "sssp_delta",
        "minhash_dedup",
        "dedup_clusters",
        "jaccard_dedup",
        "exact_dedup",
        "url_dedup",
        "host_graph",
        "pagerank_hosts",
        "token_stats",
        "language_id",
        "ann_topk",
        "ann_ivf",
        "embedding_near_dup",
        "events_hourly",
        "sessionize",
        "pricing_summary",
        "top_customers",
    ]
    def _ann_ivf_operator(spark, sf_dir):
        # The r5 driver query wraps ivf_topk in its oracle-checkable
        # verification summary (exhaustive-probe + exact-twin runs —
        # 3x the work by design). The BENCH row keeps measuring the
        # OPERATOR a user calls, comparable with the r<=4 records.
        from gms_spark.sim.ann import ivf_topk

        corpus = entry_mod._embeddings(spark, sf_dir)
        queries_df = entry_mod._ann_queries(corpus)
        return ivf_topk(corpus, queries_df, k=10, n_centroids=16, n_probe=4)

    out = {}
    for name in names:
        t0 = time.time()
        df = (_ann_ivf_operator if name == "ann_ivf" else qs[name])(spark, SF_DIR)
        _materialize(df)
        out[name] = round(time.time() - t0, 3)
        # Isolation between measurements: drop the py4j refs to the
        # previous query's frames, then let the ContextCleaner reclaim
        # its now-unreferenced localCheckpoint blocks (they are weakly
        # tracked and freed on the next JVM GC — without this, storage
        # churn from query k's stale blocks bleeds into query k+1's
        # seconds; measured as a growing persistent-RDD count over the
        # suite).
        del df
        import gc

        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    # pages pipeline: synth → extract → edges → 3 PR supersteps
    t0 = time.time()
    from gms_spark.graph.build import build_undirected, edges_from_pages
    from gms_spark.graph.pagerank import pagerank
    from gms_spark.synth import synth_pages

    pages = synth_pages(spark, 8000)
    _, edges = edges_from_pages(pages)
    und = build_undirected(edges)
    _materialize(pagerank(und, fixed_iters=3).scores)
    out["pages_pipeline"] = round(time.time() - t0, 3)
    return out


def kclique_order_comparison(spark) -> dict:
    """ADG-degeneracy vs (degree, id) DAG orientation on the doc graph —
    the reference's mining-order knob (kclisting.h ordering param).
    The ADG ordering BUILD is timed separately from the mining that
    consumes it (orient() takes a precomputed rank table): the build is
    a one-off shared across every mining consumer in a real session, so
    folding it into each kernel's seconds double-charges it."""
    import __spark_entry__ as entry_mod
    from gms_spark.graph.kclique import kclique_count
    from gms_spark.graph.orderings import adg_order

    und = entry_mod.doc_graph(spark, SF_DIR).persist()
    und.count()
    out = {}
    t0 = time.time()
    out["cliques"] = kclique_count(und, 4, order="degree")
    out["kclique4_degree_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    ranks = adg_order(und).select("vertex", "rank").localCheckpoint(eager=True)
    out["adg_order_build_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    out["cliques"] = kclique_count(und, 4, order=ranks)
    out["kclique4_adg_mine_s"] = round(time.time() - t0, 3)
    out["kclique4_adg_s"] = round(out["adg_order_build_s"] + out["kclique4_adg_mine_s"], 3)
    und.unpersist()
    return out


def bfs_direction_comparison(spark) -> dict:
    """Plain frontier BFS vs direction-optimizing BFS (bfs.cc:18-25) on a
    skewed R-MAT graph — the wide middle levels are where bottom-up wins."""
    from gms_spark.graph.build import build_undirected
    from gms_spark.graph.generators import rmat_el
    from gms_spark.graph.traversal import bfs, bfs_direction_optimizing

    und = build_undirected(rmat_el(spark, 14, RMAT_DEG)).persist()
    und.count()
    out = {}
    t0 = time.time()
    out["reached"] = bfs(und, source=0).count()
    out["bfs_topdown_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    reached_do = bfs_direction_optimizing(und, source=0).count()
    out["bfs_do_s"] = round(time.time() - t0, 3)
    assert reached_do == out["reached"]
    und.unpersist()
    return out


def shingle_dict_timing(spark) -> float:
    """Time of the shared shingle-dictionary build (assign_dense_ids over
    distinct shingles) — jaccard_dedup and minhash_dedup each pay this
    internally, so reporting it separately makes their per-query seconds
    interpretable (query_s - dict_s ≈ join/verify work)."""
    from gms_spark.text.dedup import shingle_ids

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    shingle_ids(docs).count()
    return round(time.time() - t0, 3)


def main() -> None:
    result: dict = {"sf": SF_DIR, "cpus": CPUS}

    spark = _session(CPUS, pin_shuffled_hash=False)
    from pyspark.sql import functions as F

    # one throwaway shuffle job so the FIRST headline query (pagerank)
    # doesn't absorb JVM/codegen/session warmup (~8s) into its seconds —
    # round-over-round comparisons were attributing it to whichever
    # query ran first (the r3 "pagerank +38%" driver mystery)
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    queries = run_headline_queries(spark)
    result["kclique_order"] = kclique_order_comparison(spark)
    result["bfs_direction"] = bfs_direction_comparison(spark)
    result["shingle_dict_s"] = shingle_dict_timing(spark)
    spark.stop()
    spark = _session(CPUS)
    thr = pr_superstep_throughput(spark, RMAT_SCALE, RMAT_DEG, PR_SUPERSTEPS)
    queries["pagerank_rmat_supersteps"] = thr["iter_s"]
    result["pagerank_throughput"] = thr
    spark.stop()

    if not os.environ.get("BENCH_SKIP_SCALING"):
        # North-rule scaling evidence: same job + byte-identical parquet
        # input at N and 4N cores (sandbox proxy for N vs 4N executors).
        # The 1-vs-4 pair is measured A-B-B-A (1c, 4c, 4c, 1c): this box
        # shares hardware and its background load drifts on the ~10 min
        # timescale of a scaling sweep — sequential per-config blocks
        # measured the same code at 0.74 and 1.02 efficiency in
        # back-to-back full runs. In the time-symmetric order each
        # config's two blocks average to the same midpoint in time, so
        # linear drift cancels from the ratio. Beyond ~8 threads a single
        # socket's memory bandwidth saturates (a multi-node cluster adds
        # bandwidth per node, local[k] cannot) — the 8-/32-core points
        # are reported so the saturation is visible, not hidden.
        path, n_sc, m_sc = _prepare_scaling_input(SCALING_RMAT_SCALE, RMAT_DEG)
        block_order = [1, 4, 4, 1, 8, 32]
        blocks: list[dict] = []
        for cores in block_order:
            s = _session(cores)
            r = pr_throughput_from_parquet(s, path, n_sc, m_sc, PR_SUPERSTEPS, trials=2, warmup=2)
            r["cores"] = cores
            blocks.append(r)
            s.stop()
        by_cores: dict[int, list[float]] = {}
        for b in blocks:
            by_cores.setdefault(b["cores"], []).append(b["mean_s"])
        t1 = sum(by_cores[1]) / len(by_cores[1])
        t4 = sum(by_cores[4]) / len(by_cores[4])
        work = m_sc * PR_SUPERSTEPS
        scaling = {
            "cores_n": 1,
            "cores_4n": 4,
            "design": "ABBA blocks (1,4,4,1) + 8/32 tail; 2 warmup + 2 measured per block",
            "n_vertices": n_sc,
            "m_edges": m_sc,
            "edges_per_sec_n": round(work / t1, 1),
            "edges_per_sec_4n": round(work / t4, 1),
            "efficiency": round((t1 / t4) / 4.0, 3),
            "edges_per_sec_8": round(work / (sum(by_cores[8]) / len(by_cores[8])), 1),
            "edges_per_sec_32_saturated": round(work / (sum(by_cores[32]) / len(by_cores[32])), 1),
            "blocks": [
                {"cores": b["cores"], "trial_s": b["trial_s"], "mean_s": b["mean_s"]} for b in blocks
            ],
        }
        scaling["efficiency_2x4n"] = round((t1 / (sum(by_cores[8]) / len(by_cores[8]))) / 8.0, 3)
        result["scaling"] = scaling

    result["queries"] = queries
    result["value"] = round(sum(queries.values()), 3)
    result["unit"] = "sec"
    result["metric"] = "total_headline_query_seconds"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
