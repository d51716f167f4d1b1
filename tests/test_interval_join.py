"""Interval×interval OVERLAPS join — operators/interval_join.py.

Parity target: the reference's temporal-constraint joins bin a ranged
time into every periodic unit it touches and dedupe on read
(core/geotime/.../index/dimension/TemporalBinningStrategy.java:36-43;
DedupeFilter). The engine's join replaces the read-side dedupe with
first-shared-bin emission — these tests pin the exactly-once contract,
the half-open edge rule, and full parity against a brute-force
cross-join on a deterministic fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from geowave_spark.operators.interval_join import (
    interval_overlap_join,
    overlap_micros,
)


def _iv_frame(spark, rows, prefix):
    """rows of (id, start_iso, end_iso) -> aliased interval frame."""
    df = spark.createDataFrame(rows, "id LONG, s STRING, e STRING")
    return df.select(
        F.col("id").alias(f"{prefix}_id"),
        F.col("s").cast("timestamp").alias(f"{prefix}_start"),
        F.col("e").cast("timestamp").alias(f"{prefix}_end"),
    )


def test_touching_intervals_do_not_match(spark):
    """Half-open semantics: [a, b) and [b, c) share the instant b only
    as an exclusive endpoint — no overlap."""
    a = _iv_frame(spark, [(1, "2024-01-01 00:00:00", "2024-01-01 12:00:00")], "a")
    b = _iv_frame(
        spark,
        [
            (1, "2024-01-01 12:00:00", "2024-01-02 00:00:00"),  # touches a's end
            (2, "2024-01-01 11:59:59", "2024-01-01 12:00:01"),  # overlaps 1 s
        ],
        "b",
    )
    got = interval_overlap_join(a, b).select("a_id", "b_id").collect()
    assert [(r["a_id"], r["b_id"]) for r in got] == [(1, 2)]


def test_multi_bin_pair_emitted_exactly_once(spark):
    """A pair sharing SEVERAL day bins must appear once — the
    first-shared-bin filter replaces a dedupe shuffle."""
    a = _iv_frame(spark, [(1, "2024-01-01 06:00:00", "2024-01-06 06:00:00")], "a")
    b = _iv_frame(spark, [(7, "2024-01-02 00:00:00", "2024-01-05 00:00:00")], "b")
    got = interval_overlap_join(a, b)
    assert got.count() == 1
    row = got.select(
        overlap_micros("a_start", "a_end", "b_start", "b_end").alias("ov")
    ).first()
    assert row["ov"] == 3 * 24 * 3600 * 1_000_000  # the full b range


def test_cross_midnight_overlap_found_across_bins(spark):
    """Ranges binned into DIFFERENT single days still join when they
    genuinely overlap across midnight (b starts before a's day and
    pokes into it): bin-spanning insertion makes the shared day a
    join hit even though b's home bin differs."""
    a = _iv_frame(spark, [(1, "2024-01-02 00:30:00", "2024-01-02 02:00:00")], "a")
    b = _iv_frame(spark, [(9, "2024-01-01 20:00:00", "2024-01-02 01:00:00")], "b")
    assert interval_overlap_join(a, b).count() == 1


def test_parity_with_bruteforce_cross_join(spark):
    """Full parity on a deterministic 180×170 fixture with second-to-
    multi-day durations: the bin-keyed join's pair set equals the
    brute-force cross-join filter, pairwise and exactly once."""
    base = spark.range(0, 180).select(
        F.col("id").alias("a_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 104729) % (30 * 86400)
        ).alias("a_start"),
    )
    a = base.withColumn(
        "a_end",
        F.timestamp_seconds(
            F.unix_timestamp("a_start") + 60 + (F.col("a_id") * 7919) % (3 * 86400)
        ),
    )
    bbase = spark.range(0, 170).select(
        F.col("id").alias("b_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 15485863) % (30 * 86400)
        ).alias("b_start"),
    )
    b = bbase.withColumn(
        "b_end",
        F.timestamp_seconds(
            F.unix_timestamp("b_start") + 60 + (F.col("b_id") * 104723) % (2 * 86400)
        ),
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(a, b).select("a_id", "b_id").collect()
    )
    want = sorted(
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .where(
            (F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end"))
        )
        .select("a_id", "b_id")
        .collect()
    )
    assert want  # fixture produces a non-trivial pair set
    assert got == want  # exactly once each, no misses, no extras

    semi = interval_overlap_join(a, b, how="left_semi", a_key="a_id")
    assert sorted(r["a_id"] for r in semi.select("a_id").collect()) == sorted(
        {p[0] for p in want}
    )
    anti = interval_overlap_join(a, b, how="left_anti", a_key="a_id")
    assert sorted(r["a_id"] for r in anti.select("a_id").collect()) == sorted(
        set(range(180)) - {p[0] for p in want}
    )


def test_inner_plan_has_no_dedupe_or_cartesian(spark):
    """The exactly-once contract must come from the first-shared-bin
    FILTER, not a dropDuplicates: the physical plan carries no
    deduplicating aggregate and no cartesian product."""
    a = _iv_frame(spark, [(1, "2024-01-01 00:00:00", "2024-01-03 00:00:00")], "a")
    b = _iv_frame(spark, [(2, "2024-01-02 00:00:00", "2024-01-04 00:00:00")], "b")
    plan = interval_overlap_join(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "HashAggregate" not in plan  # no distinct-style dedupe stage
