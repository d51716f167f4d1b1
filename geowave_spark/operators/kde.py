"""KDE heatmap pyramid (KDERunner semantics,
analytics/spark/src/main/java/org/locationtech/geowave/analytic/spark/kde/KDERunner.java:95-310):

per level ℓ: splat each point into the 2^ℓ × 2^ℓ grid with a Gaussian
kernel, sum contributions per cell, percentile-normalize globally
(the reference's combineByKey(sum) → sortByKey → zipWithIndex rank),
emit raster tiles.

Engine plan per level — no RDDs:
  explode 5×5 kernel offsets (native sequence-explode)
  → groupBy(gx, gy).sum(weight)         (one shuffle, partial agg free)
  → percent_rank() window                (replaces the global sortByKey)
  → optional tile assembly via applyInPandas
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark import LAT_OFF_U, LON_OFF_U
from geowave_spark.index.native import grid_coord_col

# 5x5 Gaussian kernel, sigma=1 (GaussianFilter analog), scaled to ints
_K = np.array(
    [
        [1, 4, 7, 4, 1],
        [4, 16, 26, 16, 4],
        [7, 26, 41, 26, 7],
        [4, 16, 26, 16, 4],
        [1, 4, 7, 4, 1],
    ],
    dtype=np.int64,
)


def kde_level(points: DataFrame, level: int) -> DataFrame:
    """Gaussian splat + percentile normalization at one pyramid level.
    Returns (gx, gy, weight, pct) — pct ∈ [0,1] like the reference's
    rank/total normalization (KDERunner.java:251-259)."""
    n = 1 << level
    df = points.select(
        grid_coord_col(F.col("x_u"), level, LON_OFF_U).alias("cx"),
        grid_coord_col(F.col("y_u"), level, LAT_OFF_U).alias("cy"),
    )
    # kernel explode: 25 (dx, dy, w) triples as a literal array of structs
    triples = F.array(
        *[
            F.struct(
                F.lit(dx - 2).alias("dx"), F.lit(dy - 2).alias("dy"), F.lit(int(_K[dy, dx])).alias("w")
            )
            for dy in range(5)
            for dx in range(5)
        ]
    )
    splat = (
        df.withColumn("k", F.explode(triples))
        .select(
            (F.col("cx") + F.col("k.dx")).alias("gx"),
            (F.col("cy") + F.col("k.dy")).alias("gy"),
            F.col("k.w").alias("w"),
        )
        .where(F.col("gx").between(0, n - 1) & F.col("gy").between(0, n - 1))
    )
    agg = splat.groupBy("gx", "gy").agg(F.sum("w").alias("weight"))
    win = Window.orderBy("weight")
    return agg.withColumn("pct", F.percent_rank().over(win))


def kde_pyramid(points: DataFrame, min_level: int = 5, max_level: int = 8) -> DataFrame:
    """Multi-level KDE (reference default levels 5-20; the engine caps
    the demo range, each level is an independent plan branch)."""
    out = None
    for lvl in range(min_level, max_level + 1):
        d = kde_level(points, lvl).withColumn("level", F.lit(lvl))
        out = d if out is None else out.unionByName(d)
    return out.select("level", "gx", "gy", "weight", "pct")
