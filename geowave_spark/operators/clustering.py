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


def kmeans_lloyd(
    points: DataFrame, k: int, max_iter: int = 10
) -> tuple[DataFrame, list[tuple[float, float]]]:
    """Distributed Lloyd's KMeans with deterministic farthest-point
    (Gonzalez k-center greedy) initialization — the oracle-checkable
    sibling of :func:`kmeans_clusters` (reference: KMeansRunner.java
    :201-210 wraps MLlib with sampled init; sampling is why that path
    is not exact-oracle-checkable, so this variant replaces it with a
    deterministic greedy init and keeps the iteration distributed).

    Scale shape: every step is a DataFrame aggregation — init is k
    argmax-of-min-distance scans (top-1 via TakeOrderedAndProject, no
    sort materialization), each Lloyd round is one groupBy producing
    exactly k rows; nothing but k-row center lists ever reaches the
    driver. Assignment stays whole-stage-codegen (array of squared
    distances + array_position of the min; no Python).

    Requires columns (pid, x_u, y_u); returns (points + ``cluster``
    index column, centers) where centers[i] is cluster i's final
    (cx, cy). Ties in either argmax or argmin break deterministically
    (pid order / first index)."""
    pts = points.select("pid", "x_u", "y_u").persist()
    try:
        row = pts.orderBy("pid").select("x_u", "y_u").first()
        if row is None:
            raise ValueError("kmeans_lloyd: input has no rows")
        n_distinct = pts.select("x_u", "y_u").distinct().limit(k).count()
        if n_distinct < k:
            raise ValueError(
                f"kmeans_lloyd: k={k} exceeds distinct points ({n_distinct})"
            )
        seeds: list[tuple[float, float]] = [(float(row[0]), float(row[1]))]
        x, y = F.col("x_u").cast("double"), F.col("y_u").cast("double")

        def d2(cx: float, cy: float):
            return (x - F.lit(cx)) ** 2 + (y - F.lit(cy)) ** 2

        for _ in range(k - 1):
            min_d = F.least(*[d2(cx, cy) for cx, cy in seeds]) if len(seeds) > 1 else d2(*seeds[0])
            row = pts.orderBy(F.desc(min_d), "pid").select("x_u", "y_u").first()
            seeds.append((float(row[0]), float(row[1])))

        def assign(cs):
            dists = F.array(*[d2(cx, cy) for cx, cy in cs])
            return pts.withColumn(
                "cluster",
                (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
            )

        centers = seeds
        assigned = assign(centers)
        for _ in range(max_iter):
            rows = (
                assigned.groupBy("cluster")
                .agg(F.sum("x_u").alias("sx"), F.sum("y_u").alias("sy"), F.count("*").alias("n"))
                .collect()
            )
            new = list(centers)
            for r in rows:
                # exact: integer sums below 2^53, correctly-rounded division
                new[r["cluster"]] = (r["sx"] / r["n"], r["sy"] / r["n"])
            if new == centers:
                break
            centers = new
            assigned = assign(centers)
        return assigned, centers
    finally:
        pts.unpersist()


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
