"""North-rule launch path: the engine runs under ``spark-submit --py-files``.

The cluster launch contract (BASELINE.json north_rule; SURVEY §6) is
``spark-submit --py-files gms_spark.zip job.py ...``. This test builds
that zip, writes a job script OUTSIDE the repo (so ``import gms_spark``
can resolve ONLY through the shipped zip), and launches a kernel in a
fresh JVM from a scratch cwd — the exact cold path a cluster driver
exercises. It then checks three things a unit test of ``cli.main``
cannot: the package imports from ``--py-files``, the submit-time
``--master`` survives ``get_spark`` (session.py must not override it),
and the kernel's parquet output is correct when produced by that JVM.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

JOB = """\
import sys

from gms_spark.session import get_spark  # resolves via --py-files zip
from gms_spark import cli

spark = get_spark("launch-test")
print(f"MASTER={spark.sparkContext.master}", flush=True)
sys.exit(cli.main(sys.argv[1:]))
"""


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    return str(Path(pyspark.__file__).parent / "bin" / "spark-submit")


def test_spark_submit_py_files_launch(tmp_path):
    zip_path = tmp_path / "gms_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in sorted((REPO / "gms_spark").rglob("*.py")):
            zf.write(p, p.relative_to(REPO))

    job = tmp_path / "job.py"
    job.write_text(JOB)
    out_dir = tmp_path / "out"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import path
    env.pop("SPARK_GRAFT_CPUS", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            # launch test verifies packaging/import/master, not runtime
            # re-planning — AQE only adds per-stage overhead on 10 rows
            "--conf", "spark.sql.adaptive.enabled=false",
            "--py-files", str(zip_path),
            str(job),
            "--kernel", "components",
            "--input", str(REPO / "tests" / "data" / "triangles_3.el"),
            "--output", str(out_dir),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"
    # submit-time master must win over the sandbox local[*] default
    assert "MASTER=local[2]" in proc.stdout, proc.stdout
    assert "@@@ kernel=components" in proc.stdout, proc.stdout

    # verify the parquet the submitted JVM wrote: triangles_3.el is two
    # components, {0..3} labeled 0 and {5..9} labeled 5 (min vertex id)
    import duckdb

    rows = duckdb.sql(
        f"SELECT vertex, component FROM read_parquet('{out_dir}/*.parquet') ORDER BY vertex"
    ).fetchall()
    assert rows == [(v, 0 if v <= 3 else 5) for v in [0, 1, 2, 3, 5, 6, 7, 8, 9]]
