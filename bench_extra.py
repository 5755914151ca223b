"""Per-query isolation harness for optimization work (bench.py is FROZEN
for measurement; this file exists so individual queries can be timed,
re-timed and plan-captured without touching the driver's clock).

Usage:
  python bench_extra.py time  <query> [query...]   # repeat-timed, bench-identical materialization
  python bench_extra.py plan  <query> [query...]   # write plans/r06/<query>_{before|after}.txt
  python bench_extra.py noop  <query> [query...]   # noop-sink timing (guide §1.4)

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_EXTRA_REPEATS (default 3)
  BENCH_EXTRA_TAG     plan filename suffix (default "before")
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")


def _session():
    from gms_spark.session import get_spark

    return get_spark(
        f"gms_spark-bench-extra-{CPUS}",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.default.parallelism": str(max(CPUS, 8))},
    )


def _materialize(df) -> None:
    """Bench-identical full materialization (see bench.py)."""
    from pyspark.sql import functions as F

    df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def _cleanup(spark):
    gc.collect()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    mode, names = sys.argv[1], sys.argv[2:]
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = _session()
    spark.sparkContext.setLogLevel("WARN")
    from pyspark.sql import functions as F

    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()  # warmup

    out: dict = {}
    for name in names:
        if mode == "plan":
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            path = f"plans/r06/{name}_{TAG}.txt"
            with open(path, "w") as f:
                f.write(p)
            print(f"wrote {path} ({len(p.splitlines())} lines)", flush=True)
            _cleanup(spark)
            continue
        times = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                _materialize(df)
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            del df
            _cleanup(spark)
        out[name] = {"trials": times, "min": min(times)}
        print(f"{name}: {times} min={min(times)}", flush=True)
    if out:
        print(json.dumps({"mode": mode, "sf": SF_DIR, "cpus": CPUS, "results": out}))


if __name__ == "__main__":
    main()
