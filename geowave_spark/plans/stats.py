"""Skew statistics + explicit salting — the HashKeyIndexStrategy /
RoundRobinKeyIndexStrategy analog (core/index/.../simple/
HashKeyIndexStrategy.java:44-70, RoundRobinKeyIndexStrategy.java:44,
composed via CompoundIndexStrategy). The reference salts *every* key by
a fixed partition count; the engine salts only cells whose measured
occupancy exceeds a threshold (cheaper at 100 TB: cold cells keep
locality, hot cells fan out), then AQE skew-join covers the residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.index.native import cell_col


def hot_cells(points: DataFrame, res: int, threshold: int) -> DataFrame:
    """Cells with more than ``threshold`` rows (RowRangeHistogram-style
    occupancy stat driving split planning, SplitsProvider.java:356-380)."""
    return (
        points.withColumn("cell", cell_col(F.col("x_u"), F.col("y_u"), res))
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > threshold)
        .select("cell", "n")
    )


def salt_column(df: DataFrame, hot: DataFrame, n_salts: int, key: str) -> DataFrame:
    """Add a ``salt`` column: deterministic hash-mod for rows in hot
    cells (HashKeyIndexStrategy.getHashKeyFromValue semantics — a stable
    hash of the data id, not random), 0 elsewhere. Joining sides must
    explode the salt range on the build side to stay correct."""
    hot_b = F.broadcast(hot.select("cell").withColumn("_hot", F.lit(True)))
    out = df.join(hot_b, "cell", "left")
    return out.withColumn(
        "salt",
        F.when(
            F.col("_hot").isNotNull(), F.pmod(F.xxhash64(F.col(key)), F.lit(n_salts))
        ).otherwise(F.lit(0)),
    ).drop("_hot")


def table_stats(points: DataFrame, res: int = 8, ts_col: str | None = "ts") -> DataFrame:
    """One-pass table statistics row — the maintained-statistics analog
    (core/store/.../statistics/): row count, bounding box
    (BoundingBoxStatistic), time range (TimeRangeStatistic), HyperLogLog
    distinct cells (HyperLogLogStatistic → approx_count_distinct), and
    occupied-cell count at ``res`` (Partitions/IndexMetaDataSet — the
    tier-occupancy stat that prunes empty join branches,
    TieredSFCIndexStrategy.java:125-127). Persist the output to the
    metrics table; readers use it for join pruning and split planning."""
    cell = cell_col(F.col("x_u"), F.col("y_u"), res)
    aggs = [
        F.count("*").alias("n_rows"),
        F.min("x_u").alias("x_min"),
        F.max("x_u").alias("x_max"),
        F.min("y_u").alias("y_min"),
        F.max("y_u").alias("y_max"),
        F.approx_count_distinct(cell).alias("approx_cells"),
    ]
    if ts_col is not None and ts_col in points.columns:
        aggs += [F.min(ts_col).alias("t_min"), F.max(ts_col).alias("t_max")]
    return points.agg(*aggs).withColumn("res", F.lit(res))


def explode_salts(df: DataFrame, hot: DataFrame, n_salts: int) -> DataFrame:
    """Build-side twin of salt_column: replicate hot-cell rows across all
    salt values so the salted equi-join stays complete."""
    hot_b = F.broadcast(hot.select("cell").withColumn("_hot", F.lit(True)))
    out = df.join(hot_b, "cell", "left")
    return out.withColumn(
        "salt",
        F.explode(
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    ).drop("_hot")
