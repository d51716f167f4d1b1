"""End-to-end ``spark-submit --py-files`` deployment test (north rule).

Builds the archive with tools/make_pyfiles.py, then launches a REAL
spark-submit subprocess from an empty working directory (repo root is
NOT on the python path — imports must come from the shipped zip, as
they would on a cluster executor), runs a registry query against the
sf0.001 fixtures, and checks the row count against the independent
DuckDB oracle.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(
    _spark_submit() is None or not os.path.isdir(SF),
    reason="spark-submit or sf0.001 fixtures unavailable",
)
def test_submit_py_files_matches_oracle(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "geowave_spark.zip"))
    job = tmp_path / "submit_job.py"
    shutil.copyfile(os.path.join(REPO, "tools", "submit_job.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing from the repo leaks in
    out = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zip_path,
            str(job),
            "--sf",
            SF,
            "--query",
            "bbox",
        ],
        cwd=tmp_path,  # empty dir: no accidental repo-root imports
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    rec = json.loads([ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1])

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    expected = con.execute(
        f"SELECT count(*) FROM ({entry.oracle_sql()['bbox']})"
    ).fetchone()[0]
    assert rec["rows"] == expected
