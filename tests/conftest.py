from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Suite sessions default to 8 cores (the sandbox has 32; 4 left the
# compute-bound tests needlessly serial while per-job scheduler
# overhead — the other half of the suite's wall time — is core-count
# independent). Override with GMS_TEST_CORES for experiments.
_CORES = int(os.environ.get("GMS_TEST_CORES", "8"))
_SHUF = int(os.environ.get("GMS_TEST_SHUFFLE", str(max(8, _CORES))))


@pytest.fixture(scope="session")
def spark():
    from gms_spark.session import get_spark

    s = get_spark(
        "gms_spark-tests",
        cores=_CORES,
        shuffle_partitions=_SHUF,
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.default.parallelism": str(_SHUF),
            # The suite verifies CORRECTNESS on toy graphs where every
            # superstep is fixed-overhead-bound; AQE's per-shuffle-stage
            # re-planning adds ~25% to that overhead (measured: SpMV-like
            # superstep 0.66s AQE-on vs 0.45s AQE-off at 8 partitions)
            # while adapting nothing at this scale. The engine's real
            # sessions keep AQE on (gms_spark/session.py — it is the
            # skew/coalesce safety net at scale); plan-level behavior is
            # audited separately in BENCH/plan_audit.py with AQE on.
            "spark.sql.adaptive.enabled": "false",
        },
    )
    yield s
    s.stop()


@pytest.fixture()
def edges_df_factory(spark):
    """numpy (m,2) edge array -> edges DataFrame."""

    def make(el):
        return spark.createDataFrame(
            [(int(u), int(v)) for u, v in el], "src long, dst long"
        )

    return make
