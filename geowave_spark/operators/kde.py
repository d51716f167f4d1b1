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
    # persist the aggregated grid: it feeds both the weight histogram
    # (build side) and the final join (probe side) — without this the
    # full splat+shuffle runs twice (the reference persists at the same
    # point, KDERunner.java:310 persist on the combined grid)
    agg = splat.groupBy("gx", "gy").agg(F.sum("w").alias("weight")).persist()
    # percentile normalization WITHOUT a global single-partition window:
    # percent_rank = (rank-1)/(N-1) with rank = 1 + #cells of smaller
    # weight, so it is a pure function of the *weight histogram* — tiny
    # (distinct weights ≪ cells). The window below runs over that
    # histogram only and the result is broadcast-joined back, replacing
    # the reference's global sortByKey (KDERunner.java:251-259) with a
    # plan that stays parallel at any grid size.
    hist = agg.groupBy("weight").agg(F.count("*").alias("_cnt"))
    w_all = Window.orderBy("weight").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_below = Window.orderBy("weight").rowsBetween(
        Window.unboundedPreceding, -1
    )
    hist = hist.select(
        "weight",
        F.coalesce(F.sum("_cnt").over(w_below), F.lit(0)).alias("_smaller"),
        F.sum("_cnt").over(w_all).alias("_total"),
    )
    pct = F.when(
        F.col("_total") > 1,
        F.col("_smaller").cast("double") / (F.col("_total") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.join(F.broadcast(hist), "weight").select(
        "gx", "gy", "weight", pct.alias("pct")
    )


def kde_pyramid(points: DataFrame, min_level: int = 5, max_level: int = 8) -> DataFrame:
    """Multi-level KDE (reference default levels 5-20; the engine caps
    the demo range, each level is an independent plan branch)."""
    out = None
    for lvl in range(min_level, max_level + 1):
        d = kde_level(points, lvl).withColumn("level", F.lit(lvl))
        out = d if out is None else out.unionByName(d)
    return out.select("level", "gx", "gy", "weight", "pct")
