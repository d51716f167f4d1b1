"""Indexed storage layout: partition pruning + row-group pruning."""

from __future__ import annotations

import contextlib
from io import StringIO

from pyspark.sql import functions as F

from geowave_spark.sources.layout import PART_COL, bbox_scan, read_spatial, write_spatial
from geowave_spark.sources.testgeo import events_points

BBOX = (-60_000_000, -40_000_000, 70_000_000, 55_000_000)


def test_layout_roundtrip_and_bbox_scan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "indexed")
    pts = events_points(spark, sf_dir)
    write_spatial(pts, path, res=16, partition_res=4)

    stored = read_spatial(spark, path)
    assert stored.count() == pts.count()
    assert PART_COL in stored.columns and "cell" in stored.columns

    got = bbox_scan(spark, path, *BBOX, res=16, partition_res=4)
    want = pts.where(
        F.col("x_u").between(BBOX[0], BBOX[2]) & F.col("y_u").between(BBOX[1], BBOX[3])
    )
    assert got.count() == want.count() > 0
    assert {r.event_id for r in got.select("event_id").collect()} == {
        r.event_id for r in want.select("event_id").collect()
    }


def test_layout_scan_prunes_partitions(spark, sf_dir, tmp_path):
    """The physical plan must show directory-level PartitionFilters on
    the coarse cell and pushed row-group filters on the sort cell —
    the tablet-range-scan analog."""
    path = str(tmp_path / "indexed2")
    write_spatial(events_points(spark, sf_dir), path, res=16, partition_res=4)

    # small box -> few coarse partitions
    df = bbox_scan(spark, path, -5_000_000, -5_000_000, 5_000_000, 5_000_000)
    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and PART_COL in plan
    assert "PushedFilters" in plan
    # the partition filter actually restricts the listing: scanned
    # partition count << total partition count
    total_parts = read_spatial(spark, path).select(PART_COL).distinct().count()
    scanned_parts = df.select(PART_COL).distinct().count()
    assert scanned_parts < total_parts


def test_attribute_index_store_and_range_query(spark, sf_dir, monkeypatch, tmp_path):
    """AttributeIndex analog: a non-spatial column backs a sorted
    stored layout; the range predicate reaches PushedFilters and the
    scan matches a plain filter of the raw table exactly."""
    from geowave_spark.plans import store as S

    monkeypatch.setattr(S, "CACHE_ROOT", str(tmp_path / "cache"))
    stored = S.attr_store(spark, sf_dir, "user_id")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = events.agg(F.min("user_id"), F.max("user_id")).first()
    lo, hi = int(lo), int(lo + max((hi - lo) // 4, 1))
    got = S.attr_range_query(stored, "user_id", lo, hi)

    raw = events.where(F.col("user_id").between(lo, hi))
    assert got.count() == raw.count() > 0
    assert {r.event_id for r in got.select("event_id").collect()} == {
        r.event_id for r in raw.select("event_id").collect()
    }

    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "user_id" in plan


def test_choose_index_rule():
    """ChooseBestMatchIndexQueryStrategy: composite only wins when both
    dimensions are constrained; otherwise the best single-dim index."""
    from geowave_spark.plans.store import choose_index

    assert choose_index({"spatial", "temporal"}) == "spatial_temporal"
    assert choose_index({"spatial"}) == "spatial"
    assert choose_index({"temporal"}) == "attribute:ts"
    assert choose_index({"attr:user_id"}) == "attribute:user_id"
    assert choose_index(set()) == "full_scan"
