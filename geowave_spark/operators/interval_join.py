"""Interval×interval OVERLAPS join — ranged-time fields on BOTH sides.

The reference joins features on temporal constraints the same way it
indexes them: a ranged-time value is binned into every periodic unit it
touches (core/geotime/.../index/dimension/TemporalBinningStrategy.java:36-43
getInsertionIds) and duplicates are dropped on read (DedupeFilter). The
engine applies that bin-spanning idea to the JOIN itself, but removes
the dedupe stage entirely with first-shared-bin emission:

  1. explode each side's [start, end) interval into the DAY bins it
     touches (same half-open edge rule as the stored interval index —
     plans/store.interval_bin_bounds, pinned by tests there);
  2. equi-join on the bin (an ordinary shuffle hash join — Catalyst
     picks broadcast when one side is small, AQE splits skewed bins);
  3. keep a candidate pair ONLY in the first bin the two ranges share
     (`bin == greatest(a_bin_lo, b_bin_lo)`) — every qualifying pair
     is emitted exactly once, so no `distinct`/`dropDuplicates`
     shuffle is ever needed;
  4. refine with the exact half-open overlap
     (a_start < b_end AND b_start < a_end).

Scale: cost is one explode per side (duplication factor = mean bins
per interval, ~2 for day-scale ranges) plus ONE shuffle pair on the
bin key. A hot bin (one day holding a disproportionate share of both
sides) is the skew axis — AQE's skew-join split handles it at runtime;
for pathological hot days, salt the bin key on the larger side and
replicate the smaller (the same recipe as the spatial join's dense
cells). There is no pair-dedupe shuffle to skew at all, which is the
point of step 3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    unit: str = "DAY",
    how: str = "inner",
    a_key: str | None = None,
) -> DataFrame:
    """Join rows of `a` and `b` whose half-open time ranges overlap:
    a_start < b_end AND b_start < a_end (end exclusive on both sides —
    touching intervals do NOT match). The two frames must carry
    disjoint column names (alias before calling); the result has all
    columns of both and each qualifying pair appears EXACTLY once.

    `how` supports 'inner', 'left_semi' and 'left_anti' (the semi/anti
    forms return the `a` rows that overlap at least one / no `b` row,
    each once; they require `a_key`, a unique key of `a` — existence
    is resolved key-only, no pair materialization or full-row
    distinct; 'left_anti' is the negative form, mirroring the
    reference's negative distance-join output)."""
    from geowave_spark.plans.store import interval_bin_bounds

    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(
            f"how must be 'inner', 'left_semi' or 'left_anti', got {how!r}"
        )

    a_lo, a_hi = interval_bin_bounds(F.col(a_start), F.col(a_end), unit)
    b_lo, b_hi = interval_bin_bounds(F.col(b_start), F.col(b_end), unit)
    ae = a.withColumn("_a_blo", a_lo).withColumn(
        "_bin", F.explode(F.sequence(a_lo, a_hi))
    )
    be = b.withColumn("_b_blo", b_lo).withColumn(
        "_bin", F.explode(F.sequence(b_lo, b_hi))
    )
    exact = (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    if how in ("left_semi", "left_anti"):
        # existence only: b candidates ride the join slim (bin + the
        # two refine timestamps), matches collapse to a key column,
        # and the outer LeftSemi/LeftAnti absorbs both the explode
        # duplicates and the many-b multiplicity — no distinct stage
        if a_key is None:
            raise ValueError(f"{how} requires a_key (a unique key of `a`)")
        hit = (
            ae.join(be.select("_bin", b_start, b_end), "_bin")
            .where(exact)
            .select(a_key)
        )
        return a.join(hit, a_key, how)
    first_shared = F.col("_bin") == F.greatest(F.col("_a_blo"), F.col("_b_blo"))
    return (
        ae.join(be, "_bin")
        .where(first_shared & exact)
        .drop("_bin", "_a_blo", "_b_blo")
    )


def overlap_micros(a_start: str, a_end: str, b_start: str, b_end: str) -> Column:
    """Exact overlap length in integer MICROSECONDS of two half-open
    ranges known to overlap: µs(least(ends)) − µs(greatest(starts)).
    Integer-exact at the fixtures' µs timestamp precision, so the
    DuckDB twin (epoch_us(least(..)) - epoch_us(greatest(..))) hashes
    identically."""
    gs = F.greatest(F.col(a_start), F.col(b_start))
    le = F.least(F.col(a_end), F.col(b_end))
    # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike
    # (unix_micros would force an LTZ cast through the session zone)
    return F.timestamp_diff("MICROSECOND", gs, le)
