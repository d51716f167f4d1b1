"""Build the spark-submit ``--py-files`` archive.

The north rule requires the engine to run via ``spark-submit
--py-files`` on a multi-executor cluster: every executor unpacks the
same archive, so nothing may import from the driver's working
directory. The archive carries the whole ``geowave_spark`` package
plus the driver-contract module ``__spark_entry__`` (the query
registry), and is what ``tools/submit_job.py`` and
``tests/test_spark_submit.py`` ship.

Usage:  python tools/make_pyfiles.py [OUT.zip]   (default dist/geowave_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "geowave_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "geowave_spark")
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
        zf.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
