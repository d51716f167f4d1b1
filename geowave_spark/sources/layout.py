"""Indexed storage layout: partition + sort by SFC cell.

The reference's physical layout IS its index: rows sorted by
(partitionKey ‖ sortKey) so range scans touch only the matching
tablets (GeoWaveKeyImpl; SplitsProvider balances scan splits by the
row-range histogram). The engine's parquet/Iceberg equivalent:

  - directory partitioning by the COARSE cell (the partitionKey
    analog) → Catalyst prunes whole directories from the listing
    (``PartitionFilters`` in the scan node) before any I/O;
  - within each partition, rows sorted by the FULL-precision cell
    (the sortKey analog) → parquet row-group min/max statistics prune
    pages for cell-range predicates (``PushedFilters``).

At 100 TB this two-level pruning is what turns a bbox query from a
full scan into a few file reads; swapping the writer to an Iceberg
catalog (`df.writeTo(...).partitionedBy(...)`) is a config change —
the layout contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geowave_spark.index.native import cell_col, parent_cell_col

PART_COL = "pcell"


def write_spatial(
    df: DataFrame,
    path: str,
    res: int = 16,
    partition_res: int = 4,
    x_col: str = "x_u",
    y_col: str = "y_u",
) -> None:
    """Write ``df`` in the indexed layout: directory per coarse cell at
    ``partition_res``, rows sorted by the full cell at ``res``."""
    out = df.withColumn("cell", cell_col(F.col(x_col), F.col(y_col), res)).withColumn(
        PART_COL, parent_cell_col(F.col("cell"), res - partition_res)
    )
    (
        out.repartition(PART_COL)
        .sortWithinPartitions(PART_COL, "cell")
        .write.mode("overwrite")
        .partitionBy(PART_COL)
        .parquet(path)
    )


def read_spatial(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def bbox_scan(
    spark: SparkSession,
    path: str,
    x_lo: int,
    y_lo: int,
    x_hi: int,
    y_hi: int,
    res: int = 16,
    partition_res: int = 4,
) -> DataFrame:
    """bbox query over the indexed layout: coarse-cell partition filter
    (directory pruning) + cell-range predicate (row-group pruning) +
    exact native refinement — the three-level scan narrowing of
    BaseConstraintsQuery (ranges → server filter → client filter)."""
    from geowave_spark.index.zorder import bbox_ranges

    df = read_spatial(spark, path)
    # coarse partitions covering the box (small driver-side list — the
    # QueryRanges partition-key set); a range can span consecutive
    # coarse cells, so walk each decomposed range inclusively
    parts: set[int] = set()
    for lo, hi in bbox_ranges(x_lo, y_lo, x_hi, y_hi, res):
        parts.update(range(lo >> (2 * (res - partition_res)), (hi >> (2 * (res - partition_res))) + 1))
    pred = F.col(PART_COL).isin([int(p) for p in sorted(parts)])
    cell_pred = None
    for lo, hi in bbox_ranges(x_lo, y_lo, x_hi, y_hi, res):
        p = F.col("cell").between(int(lo), int(hi))
        cell_pred = p if cell_pred is None else cell_pred | p
    return df.where(pred & cell_pred).where(
        F.col("x_u").between(x_lo, x_hi) & F.col("y_u").between(y_lo, y_hi)
    )
