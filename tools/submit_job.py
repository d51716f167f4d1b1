"""spark-submit entrypoint — the north-rule deployment shape.

Build the archive once, then run any registry query through a real
``spark-submit`` (the identical command with ``--master yarn``/``k8s``
ships the same archive to every executor of a multi-executor cluster):

    python tools/make_pyfiles.py
    spark-submit --master 'local[8]' \
        --py-files dist/geowave_spark.zip \
        tools/submit_job.py --sf /root/testdata/sf0.01 \
        --query spatial_join --out /tmp/sj_out

This file deliberately imports the engine ONLY through the shipped
archive (no repo-root sys.path edits): if the zip is incomplete, the
job fails — which is exactly what a cluster deployment would do.
``--out`` writes the result as parquet (the sink path used for
resumable pipelines); without it the job just counts.
"""

from __future__ import annotations

import argparse
import importlib
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True, help="scale-factor directory of parquet tables")
    ap.add_argument("--query", default="spatial_join", help="name from __spark_entry__.queries()")
    ap.add_argument("--out", default="", help="optional parquet output path")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"geowave-{args.query}").getOrCreate()
    entry = importlib.import_module("__spark_entry__")
    q = entry.queries()[args.query]
    t0 = time.time()
    df = q(spark, args.sf)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        rows = spark.read.parquet(args.out).count()
    else:
        rows = df.count()
    print(json.dumps({"query": args.query, "rows": rows, "sec": round(time.time() - t0, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
