"""Clustering analytics: KMeans + per-cluster convex hulls.

Reference: KMeansRunner wraps Spark MLlib KMeans over the indexed
feature RDD (analytics/spark/.../kmeans/KMeansRunner.java:201-210) and
generates cluster hull polygons (KMeansHullGenerator.java); the hull
primitive itself is GeometryHullTool (analytics/api/).

Engine: pyspark.ml.clustering.KMeans on the (x_u, y_u) columns, hulls
via a monotone-chain convex hull over each cluster's points inside one
``applyInPandas`` group (Arrow-batched; the per-cluster point sets are
the only data that crosses into Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_clusters(
    points: DataFrame, k: int, seed: int = 42, max_iter: int = 20
) -> tuple[DataFrame, list[tuple[float, float]]]:
    """Cluster (x_u, y_u) points; returns (points + ``cluster`` column,
    center list). Deterministic under a fixed seed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    feats = VectorAssembler(inputCols=["x_u", "y_u"], outputCol="_features").transform(
        points.withColumn("x_u", F.col("x_u").cast("double")).withColumn(
            "y_u", F.col("y_u").cast("double")
        )
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="_features").fit(feats)
    out = model.transform(feats).withColumnRenamed("prediction", "cluster").drop(
        "_features"
    )
    centers = [(float(c[0]), float(c[1])) for c in model.clusterCenters()]
    return out, centers


def convex_hull(xs: np.ndarray, ys: np.ndarray) -> list[tuple[float, float]]:
    """Monotone-chain convex hull (CCW, no repeated last point) — the
    GeometryHullTool primitive, vectorized-sort + linear scan."""
    pts = sorted(set(zip(xs.tolist(), ys.tolist())))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def cluster_hulls(clustered: DataFrame) -> DataFrame:
    """Per-cluster convex hull (KMeansHullGenerator analog). Returns
    (cluster, n_points, hull — array of [x, y] doubles, CCW)."""

    def hull_group(pdf: pd.DataFrame) -> pd.DataFrame:
        h = convex_hull(
            pdf["x_u"].to_numpy(dtype=np.float64), pdf["y_u"].to_numpy(dtype=np.float64)
        )
        return pd.DataFrame(
            {
                "cluster": [int(pdf["cluster"].iloc[0])],
                "n_points": [len(pdf)],
                "hull": [[[float(x), float(y)] for x, y in h]],
            }
        )

    return clustered.select("cluster", "x_u", "y_u").groupBy("cluster").applyInPandas(
        hull_group, "cluster int, n_points long, hull array<array<double>>"
    )
