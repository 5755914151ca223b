"""TableIO — atomic snapshot tables with commit markers.

The engine's checkpoint layer. Plays the role Iceberg plays on a real
cluster (atomic snapshot commit + time travel by snapshot id); in the
sandbox there is no Iceberg runtime jar, so the same API is backed by
parquet directories with an explicit ``_COMMITTED`` marker written only
after a successful parquet job — a reader never observes a half-written
snapshot. Swapping in Iceberg is a one-class change (same write/read/
snapshots contract), which is why kernels depend on this seam and not on
paths. Replaces the reference's binary .sg memory images
(gms/third_party/gapbs/reader.h:252-298) and its '@@@' stdout metric rows
(gms/third_party/gapbs/util.h:98-124) — metrics land in a ``lineage``
table instead.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- snapshots -------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _sdir(self, table: str, snapshot: int) -> str:
        return os.path.join(self._tdir(table), f"snap={snapshot:08d}")

    def write(self, df: DataFrame, table: str, snapshot: int, meta=None) -> str:
        """Write one atomic snapshot; visible only after the marker lands.

        ``meta`` may be a dict or a 0-arg callable evaluated AFTER the
        parquet job — so metrics observed by the write itself (an
        ``Observation`` riding ``df``) can land in the commit marker.
        """
        d = self._sdir(table, snapshot)
        if os.path.exists(d):
            shutil.rmtree(d)  # retry of an uncommitted write
        df.write.mode("overwrite").parquet(d)
        if callable(meta):
            meta = meta()
        with open(os.path.join(d, "_COMMITTED"), "w") as f:
            json.dump({"ts": time.time(), **(meta or {})}, f)
        return d

    def snapshots(self, table: str) -> list[int]:
        t = self._tdir(table)
        if not os.path.isdir(t):
            return []
        out = []
        for e in sorted(os.listdir(t)):
            if e.startswith("snap=") and os.path.exists(os.path.join(t, e, "_COMMITTED")):
                out.append(int(e.split("=")[1]))
        return out

    def last_committed(self, table: str) -> int | None:
        s = self.snapshots(table)
        return s[-1] if s else None

    def read(self, spark: SparkSession, table: str, snapshot: int | None = None) -> DataFrame:
        if snapshot is None:
            snapshot = self.last_committed(table)
        if snapshot is None:
            raise FileNotFoundError(f"no committed snapshot for table {table!r} under {self.root}")
        return spark.read.parquet(self._sdir(table, snapshot))

    # ---- lineage ----------------------------------------------------
    def append_lineage(self, spark: SparkSession, rows: list[dict]) -> None:
        """Append per-partition lineage rows (kernel, run_id, iteration,
        partition_id, rows, delta_norm, wall_ms, committed_at)."""
        if not rows:
            return
        d = os.path.join(self.root, "lineage")
        os.makedirs(d, exist_ok=True)
        # One json file per commit: append-only, atomic via rename.
        key = f"{rows[0].get('run_id','r')}_{rows[0].get('kernel','k')}_{rows[0].get('iteration',0):06d}"
        tmp = os.path.join(d, f".{key}.tmp")
        final = os.path.join(d, f"{key}.json")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, final)

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        d = os.path.join(self.root, "lineage")
        return spark.read.json(d)

    def lineage_rows(self) -> list[dict]:
        d = os.path.join(self.root, "lineage")
        out: list[dict] = []
        if not os.path.isdir(d):
            return out
        for e in sorted(os.listdir(d)):
            if e.endswith(".json"):
                with open(os.path.join(d, e)) as f:
                    out.extend(json.loads(line) for line in f if line.strip())
        return out
