"""All-pairs nearest-neighbor self-join (the NNMapReduce analog).

Reference: every entry finds its neighbors within ``maxDistance`` and
keeps a bounded top-K list (analytics/mapreduce/.../nn/NNMapReduce.java:60-165,
DefaultNeighborList.java:17). Partitioning duplicates each entry into
its own grid cell plus the expanded neighborhood so that every true
neighbor pair co-occurs in ≥1 partition
(analytics/api/.../partitioner/OrthodromicDistancePartitioner.java).

Engine plan (fully distributed, no driver-side loop — this is the
many-queries twin of operators.knn, which optimizes the few-queries
case with a broadcast ring):

  1. pick the cell resolution so one cell spans ≥ max_dist (then the
     3×3 neighborhood provably covers every pair within max_dist);
  2. LEFT side keyed by its own cell; RIGHT side exploded to its 3×3
     neighbor cells (the duplication side — 9× the reference's
     "expanded neighborhood" writes);
  3. equi-join on cell → exact integer distance filter → per-left
     window top-k (rank ties broken by id — DefaultNeighborList's
     deterministic ordering).

One shuffle (the cell equi-join; the window reuses the same hash
partitioning on the left key side). Dense cells parallelize via AQE;
for extreme hotspots compose with plans.stats salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark import LAT_OFF_U, LON_OFF_U, WORLD_X_U
from geowave_spark.index.native import cell_col, grid_coord_col


def res_for_distance(max_dist_u: int) -> int:
    """Coarsest resolution whose cell span is ≥ max_dist (so a 3×3 cell
    neighborhood covers every point within max_dist)."""
    res = 0
    while (WORLD_X_U >> (res + 1)) >= max_dist_u and res < 30:
        res += 1
    return res


def nn_self_join(
    points: DataFrame,
    max_dist_u: int,
    k: int,
    key: str = "event_id",
    left_filter=None,
) -> DataFrame:
    """Top-k neighbors within max_dist for every point (or the subset
    matching ``left_filter``). Returns (a_id, b_id, dist2, rank).

    ``left_filter`` (Column) restricts the query side only — the
    candidate side stays the full table, like the reference's query
    adapters vs indexed adapters split.
    """
    res = res_for_distance(max_dist_u)
    n_side = 1 << res

    left = points
    if left_filter is not None:
        left = left.where(left_filter)
    left = left.select(
        F.col(key).alias("a_id"),
        F.col("x_u").alias("ax"),
        F.col("y_u").alias("ay"),
        cell_col(F.col("x_u"), F.col("y_u"), res).alias("_cell"),
    )

    # candidate side: explode to the 3×3 neighborhood so every pair
    # within max_dist shares ≥1 cell key (grid coords clamped at the
    # domain edge; duplicates removed so border cells don't double-join)
    gx = (F.col("_gx") + F.col("_dx")).alias("gx")
    gy = (F.col("_gy") + F.col("_dy")).alias("gy")
    right = (
        points.select(
            F.col(key).alias("b_id"),
            F.col("x_u").alias("bx"),
            F.col("y_u").alias("by"),
        )
        .withColumn("_gx", grid_coord_col(F.col("bx"), res, LON_OFF_U))
        .withColumn("_gy", grid_coord_col(F.col("by"), res, LAT_OFF_U))
        .withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "b_id",
            "bx",
            "by",
            F.least(F.greatest(gx, F.lit(0)), F.lit(n_side - 1)).alias("gx"),
            F.least(F.greatest(gy, F.lit(0)), F.lit(n_side - 1)).alias("gy"),
        )
        .dropDuplicates(["b_id", "gx", "gy"])
    )

    from geowave_spark.index.native import _spread_col

    right = right.withColumn(
        "_cell", _spread_col(F.col("gx")).bitwiseOR(F.shiftleft(_spread_col(F.col("gy")), 1))
    ).drop("gx", "gy")

    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    cand = (
        left.join(right, "_cell")
        .where(F.col("a_id") != F.col("b_id"))
        .withColumn("dist2", dx * dx + dy * dy)
        .where(F.col("dist2") <= F.lit(int(max_dist_u) * int(max_dist_u)))
        # a pair can share up to 4 neighbor cells near borders
        .dropDuplicates(["a_id", "b_id"])
    )
    w = Window.partitionBy("a_id").orderBy("dist2", "b_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("a_id", "b_id", "dist2", "rank")
    )
