"""Spatial join vs brute-force oracle — the reference's decisive test
(GeoWaveSparkSpatialJoinIT.java:104-172: indexed.except(brute) empty,
equal counts, per side)."""

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators.spatial_join import box_point_join, boxes_with_cells
from geowave_spark.sources.testgeo import customer_boxes, events_points


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return events_points(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def boxes(spark, sf_dir):
    return customer_boxes(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def brute_pairs(points, boxes):
    return (
        points.crossJoin(boxes)
        .where(
            F.col("x_u").between(F.col("x_lo"), F.col("x_hi"))
            & F.col("y_u").between(F.col("y_lo"), F.col("y_hi"))
        )
        .select("event_id", "c_custkey")
        .cache()
    )


def test_join_matches_brute_force(spark, points, boxes, brute_pairs):
    got = box_point_join(points, boxes).cache()
    n_got, n_exp = got.count(), brute_pairs.count()
    assert n_exp > 0, "fixture produced no matching pairs"
    assert n_got == n_exp
    assert got.exceptAll(brute_pairs).count() == 0
    assert brute_pairs.exceptAll(got).count() == 0


def test_join_semi_and_anti_forms(points, boxes, brute_pairs):
    semi = box_point_join(points, boxes, how="leftsemi")
    anti = box_point_join(points, boxes, how="leftanti")
    matched_ids = set(r["event_id"] for r in brute_pairs.select("event_id").distinct().collect())
    assert set(r["event_id"] for r in semi.select("event_id").collect()) == matched_ids
    n_total = points.count()
    assert anti.count() == n_total - len(matched_ids)
    # semi output keeps the full point schema (per-side output form)
    assert set(semi.columns) == set(points.columns)


def test_boxes_with_cells_duplication_bounded(boxes):
    b = boxes_with_cells(boxes)
    per_box = b.groupBy("c_custkey").agg(F.count("*").alias("n"))
    assert per_box.agg(F.max("n")).first()[0] <= 4  # corner-cell cap


def test_join_broadcast_hint(points, boxes, brute_pairs):
    got = box_point_join(points, boxes, broadcast_boxes=True)
    assert got.count() == brute_pairs.count()
