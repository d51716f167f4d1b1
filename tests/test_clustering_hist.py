"""KMeans + hulls (§2.8) and the raster histogram statistic."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geowave_spark.operators.clustering import (
    cluster_hulls,
    convex_hull,
    kmeans_clusters,
)
from geowave_spark.sources.testgeo import HOT_CX, HOT_CY, events_points


def test_convex_hull_square():
    xs = np.array([0, 4, 4, 0, 2, 1, 3])
    ys = np.array([0, 0, 4, 4, 2, 1, 3])
    h = convex_hull(xs, ys)
    assert set(h) == {(0, 0), (4, 0), (4, 4), (0, 4)}


def test_kmeans_recovers_hotspots(spark, sf_dir):
    """Clustering only the hot rows must place the 5 centers near the 5
    fixture hotspot centers (0.5°-radius clusters, k=5)."""
    hot = events_points(spark, sf_dir).where(F.col("event_id") % 5 == 0)
    clustered, centers = kmeans_clusters(hot, k=5)
    assert clustered.select("cluster").distinct().count() == 5
    for cx, cy in zip(HOT_CX, HOT_CY):
        d = min(
            ((cx - mx) ** 2 + (cy - my) ** 2) ** 0.5 for mx, my in centers
        )
        assert d < 1_000_000, (cx, cy, d)  # within ~1 degree


def test_cluster_hulls_contain_centers(spark, sf_dir):
    hot = events_points(spark, sf_dir).where(F.col("event_id") % 5 == 0)
    clustered, _ = kmeans_clusters(hot, k=5)
    hulls = cluster_hulls(clustered).collect()
    assert len(hulls) == 5
    n_total = sum(r.n_points for r in hulls)
    assert n_total == hot.count()
    for r in hulls:
        assert len(r.hull) >= 3


def test_tile_histograms_sum_to_pixels(spark):
    from geowave_spark.operators.tiling import tile_cut_and_merge, tile_histograms
    from geowave_spark.sources.images import images_table

    imgs = images_table(spark, 50, w=32, h=32, partitions=4)
    tiles = tile_cut_and_merge(imgs, 600_000, tile_size=32)
    hists = tile_histograms(tiles, tile_size=32, bins=16)
    rows = hists.collect()
    assert len(rows) == tiles.count()
    for r in rows[:20]:
        assert len(r.hist) == 16
        assert sum(r.hist) == 32 * 32


def test_kmeans_lloyd_recovers_planted_blobs(spark, sf_dir):
    """Farthest-point-init Lloyd must converge to the planted partition
    exactly: cluster sizes, integer-mean centroids, and the four ±2000
    hull corners per blob (the _q_kmeans_hulls fixed-point claim)."""
    from geowave_spark.operators.clustering import kmeans_lloyd
    from geowave_spark.sources.testgeo import KMEANS_K, kmeans_planted

    pts = kmeans_planted(spark, sf_dir)
    assigned, centers = kmeans_lloyd(pts, KMEANS_K)
    assert len(centers) == KMEANS_K

    rows = assigned.withColumn("blob", F.col("pid") % KMEANS_K).collect()
    # one engine cluster per planted blob, bijectively
    blob_of_cluster: dict[int, int] = {}
    for r in rows:
        prev = blob_of_cluster.setdefault(r.cluster, r.blob)
        assert prev == r.blob, "a cluster spans two planted blobs"
    assert len(blob_of_cluster) == KMEANS_K

    # centroid = exact per-blob mean of the derived integer coordinates
    import collections

    sums: dict[int, list] = collections.defaultdict(lambda: [0, 0, 0])
    for r in rows:
        s = sums[r.cluster]
        s[0] += r.x_u
        s[1] += r.y_u
        s[2] += 1
    for cid, (sx, sy, n) in sums.items():
        cx, cy = centers[cid]
        assert cx == sx / n and cy == sy / n

    # hulls: all 25 offset classes present => exactly the 4 corners
    from geowave_spark.operators.clustering import cluster_hulls

    for r in cluster_hulls(assigned).collect():
        b = blob_of_cluster[r.cluster]
        bx = -120_000_000 + (b % 8) * 30_000_000
        by = 20_000_000 + (b // 8) * 30_000_000
        got = {(int(x), int(y)) for x, y in r.hull}
        assert got == {
            (bx - 2000, by - 2000),
            (bx + 2000, by - 2000),
            (bx + 2000, by + 2000),
            (bx - 2000, by + 2000),
        }
