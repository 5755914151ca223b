from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from gms_spark.session import get_spark

    s = get_spark(
        "gms_spark-tests",
        cores=4,
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g", "spark.default.parallelism": "8"},
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
