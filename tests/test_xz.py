"""XZ-order extent index: single-key invariant, coverage invariant,
extent query and point join vs brute force (the reference's
oracle-vs-optimized strategy, GeoWaveSparkSpatialJoinIT.java:104-172;
curve semantics: core/index/.../sfc/xz/XZOrderSFC.java)."""

import pytest
from pyspark.sql import functions as F

from geowave_spark.index.xz import (
    R_MAX_DEFAULT,
    xz_box_point_join,
    xz_extent_query,
    xz_keys,
)
from geowave_spark.index.zorder import grid_coord
from geowave_spark.sources.testgeo import customer_boxes, events_points

QUERY_BOXES = [
    (-60_000_000, -40_000_000, 70_000_000, 55_000_000),
    (-179_000_000, -80_000_000, -100_000_000, 80_000_000),
    (0, 0, 1_000_000, 1_000_000),
]


@pytest.fixture(scope="module")
def boxes(spark, sf_dir):
    return customer_boxes(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return events_points(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def keyed(boxes):
    return xz_keys(boxes).cache()


def test_one_key_per_extent(boxes, keyed):
    # no explode anywhere: exactly one (res, ax, ay) row per input row
    assert keyed.count() == boxes.count()


def test_enlarged_cell_covers_extent(keyed):
    """The 2x2 block anchored at (ax, ay) covers the bbox, and res is
    the finest such resolution (fit fails at res+1 unless res==r_max)."""
    rows = keyed.collect()
    assert rows
    for r in rows:
        assert 0 <= r.res <= R_MAX_DEFAULT
        gx0, gx1 = grid_coord(r.x_lo, r.res), grid_coord(r.x_hi, r.res)
        gy0, gy1 = grid_coord(r.y_lo, r.res), grid_coord(r.y_hi, r.res)
        assert r.ax == gx0 and r.ay == gy0
        assert gx1 <= r.ax + 1 and gy1 <= r.ay + 1
        if r.res < R_MAX_DEFAULT:
            f = r.res + 1
            assert (
                grid_coord(r.x_hi, f) > grid_coord(r.x_lo, f) + 1
                or grid_coord(r.y_hi, f) > grid_coord(r.y_lo, f) + 1
            )


@pytest.mark.parametrize("q", QUERY_BOXES)
def test_extent_query_matches_brute(boxes, keyed, q):
    qx0, qy0, qx1, qy1 = q
    got = xz_extent_query(keyed, qx0, qy0, qx1, qy1, keyed=True).select("c_custkey")
    exp = boxes.where(
        (F.col("x_lo") <= qx1)
        & (F.col("x_hi") >= qx0)
        & (F.col("y_lo") <= qy1)
        & (F.col("y_hi") >= qy0)
    ).select("c_custkey")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0


def test_xz_join_matches_brute(points, boxes):
    brute = (
        points.crossJoin(boxes)
        .where(
            F.col("x_u").between(F.col("x_lo"), F.col("x_hi"))
            & F.col("y_u").between(F.col("y_lo"), F.col("y_hi"))
        )
        .select("event_id", "c_custkey")
        .cache()
    )
    got = xz_box_point_join(points, boxes).cache()
    assert brute.count() > 0
    assert got.count() == brute.count()
    assert got.exceptAll(brute).count() == 0

    semi = xz_box_point_join(points, boxes, how="leftsemi")
    assert semi.count() == brute.select("event_id").distinct().count()
    anti = xz_box_point_join(points, boxes, how="leftanti")
    assert anti.count() == points.count() - semi.count()
