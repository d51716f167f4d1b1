"""Interval (ranged-time) index dimension — plans/store.st_interval_store.

Parity target: the reference indexes features whose time is a START/END
range by duplicating the insertion across every time bin the range
spans, deduping on read (core/geotime/.../index/dimension/
TemporalBinningStrategy.java:36-43 bin-spanning insertion; vector
adapter TimeDescriptors start/end configuration)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geowave_spark.plans.store import (
    interval_bin_bounds,
    st_interval_query,
    st_interval_store,
)
from geowave_spark.sources.testgeo import events_intervals


def _bins(spark, rows):
    """(start, end) string pairs -> list of [bin_lo, bin_hi]."""
    df = spark.createDataFrame(rows, "s STRING, e STRING").select(
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    lo, hi = interval_bin_bounds(F.col("s"), F.col("e"))
    return [
        (r["lo"], r["hi"])
        for r in df.select(lo.alias("lo"), hi.alias("hi")).collect()
    ]


def test_bin_bounds_midnight_end_is_exclusive(spark):
    """An interval ending exactly at midnight must NOT occupy the next
    day's bin; one starting at midnight must occupy that day."""
    d0 = 19723  # 2024-01-01 in days-since-epoch
    got = _bins(
        spark,
        [
            ("2024-01-01 06:00:00", "2024-01-02 00:00:00"),  # midnight end
            ("2024-01-01 00:00:00", "2024-01-01 06:00:00"),  # midnight start
            ("2024-01-01 23:00:00", "2024-01-03 01:00:00"),  # spans 3 days
            ("2024-01-01 10:00:00", "2024-01-01 11:00:00"),  # within one day
        ],
    )
    assert got == [(d0, d0), (d0, d0), (d0, d0 + 2), (d0, d0)]


def test_store_duplicates_rows_per_spanned_bin(spark, sf_dir):
    """The stored layout carries one row per (event, touched DAY bin):
    total stored rows == sum over events of days spanned, and each
    event's bin set is exactly its interval's day range."""
    iv = events_intervals(spark, sf_dir)
    lo, hi = interval_bin_bounds(F.col("ts_start"), F.col("ts_end"))
    expected = iv.select((hi - lo + 1).alias("k")).agg(F.sum("k")).first()[0]
    stored = st_interval_store(spark, sf_dir)
    assert stored.count() == expected
    # 1h..49h durations span 1-4 calendar-day bins (49h starting late
    # in a day touches four dates)
    per_event = stored.groupBy("event_id").agg(F.count("*").alias("k"))
    mn, mx = per_event.agg(F.min("k"), F.max("k")).first()
    assert 1 <= mn and mx <= 4
    # no duplicate (event, bin) keys
    assert stored.select("event_id", "bin").distinct().count() == expected


def test_query_matches_brute_overlap_and_dedupes(spark, sf_dir):
    """st_interval_query over the bin-exploded layout returns each
    overlapping event EXACTLY once, equal to the brute overlap filter
    on the raw interval table."""
    bbox = (-60_000_000, -40_000_000, 70_000_000, 55_000_000)
    t_lo, t_hi = "2024-01-05 00:00:00", "2024-01-20 00:00:00"
    stored = st_interval_store(spark, sf_dir)
    got = st_interval_query(stored, *bbox, t_lo, t_hi).select("event_id")
    brute = events_intervals(spark, sf_dir).where(
        F.col("x_u").between(bbox[0], bbox[2])
        & F.col("y_u").between(bbox[1], bbox[3])
        & (F.col("ts_start") < F.lit(t_hi).cast("timestamp"))
        & (F.col("ts_end") > F.lit(t_lo).cast("timestamp"))
    )
    g = {r["event_id"] for r in got.collect()}
    b = {r["event_id"] for r in brute.select("event_id").collect()}
    assert g == b and got.count() == len(g)  # deduped: no row twice


def test_query_boundary_semantics(spark):
    """Half-open overlap at the exact bin edge: a query starting at an
    interval's end (or ending at its start) must exclude it — both in
    the refine predicate and through the coarse bin scan."""
    rows = [
        # event 1 ends exactly at the query start -> excluded
        (1, "2024-01-04 12:00:00", "2024-01-05 00:00:00"),
        # event 2 starts exactly at the query end -> excluded
        (2, "2024-01-20 00:00:00", "2024-01-20 06:00:00"),
        # event 3 overlaps the first instant of the query -> included
        (3, "2024-01-04 12:00:00", "2024-01-05 00:00:01"),
        # event 4 overlaps the last instant -> included
        (4, "2024-01-19 23:59:59", "2024-01-21 00:00:00"),
    ]
    iv = spark.createDataFrame(rows, "event_id LONG, s STRING, e STRING").select(
        "event_id",
        F.col("s").cast("timestamp").alias("ts_start"),
        F.col("e").cast("timestamp").alias("ts_end"),
        F.lit(0).cast("long").alias("x_u"),
        F.lit(0).cast("long").alias("y_u"),
    )
    lo, hi = interval_bin_bounds(F.col("ts_start"), F.col("ts_end"))
    from geowave_spark.index.native import cell_col

    stored = iv.withColumn("bin", F.explode(F.sequence(lo, hi))).withColumn(
        "cell", cell_col(F.col("x_u"), F.col("y_u"), 8)
    )
    got = st_interval_query(
        stored, -1, -1, 1, 1, "2024-01-05 00:00:00", "2024-01-20 00:00:00"
    )
    assert {r["event_id"] for r in got.collect()} == {3, 4}


def test_interval_store_scan_is_sargable(spark, sf_dir):
    """The coarse (bin, cell) constraint must reach the parquet scan of
    the stored layout (PushedFilters), not run as a post-filter."""
    stored = st_interval_store(spark, sf_dir)
    import contextlib
    from io import StringIO

    q = st_interval_query(
        stored,
        -60_000_000,
        -40_000_000,
        70_000_000,
        55_000_000,
        "2024-01-05 00:00:00",
        "2024-01-20 00:00:00",
    )
    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "bin" in pushed[0] and "cell" in pushed[0]


def test_scalar_and_column_bin_rules_lockstep(spark):
    """interval_query_bin_bounds (driver scalar, query side) and
    interval_bin_bounds (Column, write side) must implement the SAME
    half-open midnight rule — evaluated here over a boundary grid
    (exact midnights, one second each side, multi-day spans)."""
    from geowave_spark.plans.store import (
        interval_bin_bounds,
        interval_query_bin_bounds,
    )

    cases = [
        ("2024-03-01T00:00:00", "2024-03-02T00:00:00"),  # exact-midnight end
        ("2024-03-01T00:00:00", "2024-03-02T00:00:01"),
        ("2024-03-01T23:59:59", "2024-03-02T00:00:00"),
        ("2024-03-01T12:00:00", "2024-03-04T00:00:00"),
        ("2024-02-28T00:00:00", "2024-03-01T00:00:00"),  # leap-month edge
        ("2024-03-01T00:00:01", "2024-03-01T23:59:59"),
    ]
    df = spark.createDataFrame(cases, "lo STRING, hi STRING").select(
        "lo",
        "hi",
        F.col("lo").cast("timestamp").alias("ts_lo"),
        F.col("hi").cast("timestamp").alias("ts_hi"),
    )
    b_lo, b_hi = interval_bin_bounds(F.col("ts_lo"), F.col("ts_hi"))
    got = {
        (r["lo"], r["hi"]): (r["blo"], r["bhi"])
        for r in df.select("lo", "hi", b_lo.alias("blo"), b_hi.alias("bhi")).collect()
    }
    for lo, hi in cases:
        assert got[(lo, hi)] == interval_query_bin_bounds(lo, hi), (lo, hi)
