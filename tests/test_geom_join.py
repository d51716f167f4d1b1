"""General-geometry join vs brute force — the reference's decisive
oracle pattern: GeoWaveSparkSpatialJoinIT.java:104-172 computes the
same join brute-force (cross join + the same predicate UDF) and asserts
indexed ≡ brute (equal counts + empty except). Mirrored here for the
point×polygon, line×polygon, geometry×geometry, and distance forms,
including semi/anti outputs."""

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators.geom_join import (
    _pair_refine_udf,
    geom_geom_join,
    geom_point_join,
)
from geowave_spark.sources.testgeo import (
    customer_snapped_boxes,
    events_points,
    part_tracks,
    supplier_lshapes,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixtures(spark):
    return {
        "pts": events_points(spark, SF).limit(2000).cache(),
        "lsh": supplier_lshapes(spark, SF).cache(),
        "trk": part_tracks(spark, SF).limit(400).cache(),
        "snb": customer_snapped_boxes(spark, SF).limit(400).cache(),
    }


def _pairs(df, k1, k2):
    return set(map(tuple, df.select(k1, k2).collect()))


def brute_geom_geom(left, right, predicate, lk, rk, distance_u=None):
    """Cross join + the SAME refine UDF (the IT's brute-force arm)."""
    l = left.select(F.col(lk), F.col("geom").alias("_lg"))
    r = right.select(F.col(rk), F.col("geom").alias("_rg"))
    return (
        l.crossJoin(r)
        .where(_pair_refine_udf(predicate, distance_u)(F.col("_lg"), F.col("_rg")))
        .select(lk, rk)
    )


@pytest.mark.parametrize("predicate", ["intersects", "crosses"])
def test_line_polygon_join_parity(spark, fixtures, predicate):
    idx = geom_geom_join(
        fixtures["trk"], fixtures["lsh"], predicate,
        left_key="p_partkey", right_key="s_suppkey",
    )
    brute = brute_geom_geom(
        fixtures["trk"], fixtures["lsh"], predicate, "p_partkey", "s_suppkey"
    )
    assert _pairs(idx, "p_partkey", "s_suppkey") == _pairs(
        brute, "p_partkey", "s_suppkey"
    )


def test_box_box_join_parity(spark, fixtures):
    snb = fixtures["snb"]
    a = snb.select(F.col("c_custkey").alias("a_key"), "geom")
    b = snb.select(F.col("c_custkey").alias("b_key"), "geom")
    for pred in ["touches", "overlaps", "equals", "contains"]:
        idx = geom_geom_join(
            a, b, pred, left_key="a_key", right_key="b_key",
            pair_filter=F.col("a_key") < F.col("b_key"),
        )
        brute = brute_geom_geom(a, b, pred, "a_key", "b_key").where(
            F.col("a_key") < F.col("b_key")
        )
        assert _pairs(idx, "a_key", "b_key") == _pairs(brute, "a_key", "b_key"), pred


def test_point_polygon_join_parity_and_forms(spark, fixtures):
    pts, lsh = fixtures["pts"], fixtures["lsh"]
    idx = geom_point_join(pts, lsh, "intersects", geom_key="s_suppkey")
    # brute force: cross join + vectorized point refine on raw coords
    from geowave_spark.operators.geom_join import _point_refine_udf

    brute = (
        pts.crossJoin(lsh.select("s_suppkey", F.col("geom").alias("_g")))
        .where(_point_refine_udf("intersects", None)(F.col("_g"), F.col("x_u"), F.col("y_u")))
        .select("event_id", "s_suppkey")
    )
    got, exp = _pairs(idx, "event_id", "s_suppkey"), _pairs(brute, "event_id", "s_suppkey")
    assert got == exp

    matched_pts = {p for p, _s in exp}
    semi = geom_point_join(pts, lsh, "intersects", geom_key="s_suppkey", how="leftsemi")
    anti = geom_point_join(pts, lsh, "intersects", geom_key="s_suppkey", how="leftanti")
    semi_ids = {r["event_id"] for r in semi.select("event_id").collect()}
    anti_ids = {r["event_id"] for r in anti.select("event_id").collect()}
    all_ids = {r["event_id"] for r in pts.select("event_id").collect()}
    assert semi_ids == matched_pts
    assert anti_ids == all_ids - matched_pts
    assert semi.count() + anti.count() == pts.count()


def test_distance_join_parity(spark, fixtures):
    pts, trk = fixtures["pts"], fixtures["trk"]
    r = 1_500_000
    idx = geom_point_join(pts, trk, distance_u=r, geom_key="p_partkey")
    from geowave_spark.operators.geom_join import _point_refine_udf

    brute = (
        pts.crossJoin(trk.select("p_partkey", F.col("geom").alias("_g")))
        .where(_point_refine_udf("intersects", r)(F.col("_g"), F.col("x_u"), F.col("y_u")))
        .select("event_id", "p_partkey")
    )
    assert _pairs(idx, "event_id", "p_partkey") == _pairs(brute, "event_id", "p_partkey")


def test_geom_geom_semi_anti(spark, fixtures):
    trk, lsh = fixtures["trk"], fixtures["lsh"]
    inner = geom_geom_join(
        trk, lsh, "intersects", left_key="p_partkey", right_key="s_suppkey"
    )
    matched = {r["p_partkey"] for r in inner.select("p_partkey").collect()}
    semi = geom_geom_join(
        trk, lsh, "intersects", left_key="p_partkey", right_key="s_suppkey",
        how="leftsemi",
    )
    anti = geom_geom_join(
        trk, lsh, "intersects", left_key="p_partkey", right_key="s_suppkey",
        how="leftanti",
    )
    ids = {r["p_partkey"] for r in trk.select("p_partkey").collect()}
    assert {r["p_partkey"] for r in semi.collect()} == matched
    assert {r["p_partkey"] for r in anti.collect()} == ids - matched
