"""Within-distance join ("GeomWithinDistance" semantics).

Reference: a distance predicate joins by buffering the probe side's
envelope by the radius before index keying, then refining with the
exact distance (SqlQueryRunner.java:214-245;
udf/GeomWithinDistance.java:13-45 — bufferAmount = radius applied to
the non-build side only, TieredSpatialJoin.java:146,413-419).

Engine: the right point-set is expanded to radius boxes (native), run
through the single (res, cell) equi-join, then refined with the exact
integer squared distance — the whole plan is JVM-side, one shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.operators.spatial_join import (
    boxes_with_cells,
    points_keyed_by_res,
)


def point_distance_join(
    left_points: DataFrame,
    right_points: DataFrame,
    radius_u: int,
    left_key: str = "event_id",
    right_key: str = "c_custkey",
    negative: bool = False,
) -> DataFrame:
    """Pairs (left_key, right_key, dist2) with planar distance ≤ radius.

    ``negative=True`` returns left rows farther than radius from every
    right point (the `> r` anti form, SqlQueryRunner.java:214-245)."""
    r = int(radius_u)
    right_boxed = right_points.select(
        F.col(right_key),
        F.col("x_u").alias("rx"),
        F.col("y_u").alias("ry"),
        (F.col("x_u") - r).alias("x_lo"),
        (F.col("y_u") - r).alias("y_lo"),
        (F.col("x_u") + r).alias("x_hi"),
        (F.col("y_u") + r).alias("y_hi"),
    )
    # broadcast the buffered side: no shuffle, and hotspot cells fan out
    # across stream partitions (see box_point_join on strategy + why no
    # DedupeFilter stage is needed: ≤1 (res, cell) match per pair)
    b = F.broadcast(boxes_with_cells(right_boxed).withColumnRenamed("res", "_bres"))
    keyed = points_keyed_by_res(left_points, b.select(F.col("_bres").alias("res")).distinct())
    dx = F.col("x_u") - F.col("rx")
    dy = F.col("y_u") - F.col("ry")
    matched = (
        keyed.join(
            b,
            (keyed["res"] == b["_bres"]) & (keyed["_jcell"] == b["cell"]),
            "inner",
        )
        .withColumn("dist2", dx * dx + dy * dy)
        .where(F.col("dist2") <= F.lit(r * r))
        .select(left_key, right_key, "dist2")
    )
    if negative:
        return left_points.join(matched.select(left_key), left_key, "leftanti")
    return matched
