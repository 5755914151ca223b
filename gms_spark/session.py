"""SparkSession builders for the engine.

Single place to pin the configs that matter at scale:
  * AQE on (runtime re-planning, skew-join splitting) — the safety net
    under our explicit degree-aware salting.
  * Arrow execution on — every Python-side kernel is Arrow-batched.
  * shuffle partition count sized to the parallelism level so the
    N-vs-4N scaling run only varies ``local[N]`` + partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gms_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or '*'. On a real cluster the
    same code runs unchanged under spark-submit (master comes from the
    submit environment; ``local[...]`` is only the sandbox default).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        except ValueError:
            shuffle_partitions = 32

    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Iterative SpMV joins a big static edge table with a small scores
        # table every superstep: shuffled-hash beats sort-merge (no
        # re-sort of the edge side each iteration).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", os.environ.get("GMS_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Only set master when not already provided by spark-submit. A
    # spark-submit-launched Python driver talks to the already-running
    # JVM through the py4j gateway (PYSPARK_GATEWAY_PORT is set by
    # deploy.PythonRunner); calling .master() there would override the
    # cluster's --master with the sandbox default.
    if (
        "PYSPARK_GATEWAY_PORT" not in os.environ
        and "SPARK_SUBMIT" not in os.environ
        and not os.environ.get("SPARK_MASTER")
    ):
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
