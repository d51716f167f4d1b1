"""Two-parallelism scaling evidence (north-rule criterion).

No real cluster exists in this sandbox, so the N-vs-4N-executor
scaling criterion is evidenced by running the SAME heavy jobs at two
local parallelism levels (default local[8] vs local[32]) on the same
input and reporting throughput at both plus

    efficiency = (T_small / T_large) / (cores_large / cores_small)

Each level runs in its OWN subprocess (fresh JVM — no shared executor
state, mirrors separate cluster deployments); per-job wall time is
measured after a warmup action so JVM/JIT startup is excluded from the
job timings (it would never amortize differently across cluster sizes).

Jobs (the north-rule metrics):
  spatial_join   — points×boxes containment join at sf (rows/sec of
                   input points)
  poly_join      — points×octagon convex-polygon join
  tile_cut_merge — image tile assignment + pixel cut + mosaic merge
                   (images/sec)
  kde            — Gaussian-splat heatmap at level 10

Usage: python tools/scaling_bench.py [--cpus 8,32] [--sf DIR] [--n-images N]
Writes one JSON line per level plus a summary (also appended to
BENCH.md by the caller).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cpus = sys.argv[1]
sf_dir = sys.argv[2]
n_img = int(sys.argv[3])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"scaling-bench-{cpus}")
    .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from geowave_spark.operators.spatial_join import box_point_join
from geowave_spark.operators.poly_join import octagon_point_join
from geowave_spark.operators.kde import kde_level
from geowave_spark.operators.tiling import tile_cut_and_merge
from geowave_spark.sources.images import images_table
from geowave_spark.sources.testgeo import customer_boxes, events_points, supplier_octagons

pts = events_points(spark, sf_dir)
boxes = customer_boxes(spark, sf_dir)
octs = supplier_octagons(spark, sf_dir)
n_pts = pts.count()  # warmup + input size

times, counts = {}, {}

def run(name, df):
    t0 = time.time()
    counts[name] = df.count()
    times[name] = round(time.time() - t0, 3)

run("spatial_join", box_point_join(pts, boxes))
run("poly_join", octagon_point_join(pts, octs))
run("kde", kde_level(pts, 10))
imgs = images_table(spark, n_img, w=64, h=64, partitions=int(cpus) * 4)
imgs = imgs.persist(); imgs.count()  # materialize generation outside the timed cut+merge
run("tile_cut_merge", tile_cut_and_merge(imgs, 600_000, tile_size=64))

print(json.dumps({
    "cpus": int(cpus),
    "sf": sf_dir,
    "n_points": n_pts,
    "n_images": n_img,
    "times": times,
    "counts": counts,
    "throughput": {
        "spatial_join_pts_per_sec": round(n_pts / times["spatial_join"], 1),
        "poly_join_pts_per_sec": round(n_pts / times["poly_join"], 1),
        "kde_pts_per_sec": round(n_pts / times["kde"], 1),
        "tile_images_per_sec": round(n_img / times["tile_cut_merge"], 1),
    },
}))
spark.stop()
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n-images", type=int, default=4000)
    args = ap.parse_args()
    levels = [c.strip() for c in args.cpus.split(",")]

    results = []
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, "-c", WORKER, cpus, args.sf, str(args.n_images)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"worker at local[{cpus}] produced no JSON")
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec))

    if len(results) == 2:
        small, large = results
        ratio = large["cpus"] / small["cpus"]
        eff = {}
        for job in small["times"]:
            speedup = small["times"][job] / large["times"][job]
            eff[job] = round(speedup / ratio, 3)
        summary = {
            "core_ratio": ratio,
            "scaling_efficiency": eff,
            "criterion": "efficiency >= 0.8 per north rule (sandbox two-parallelism evidence)",
        }
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
