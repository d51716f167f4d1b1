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


def test_size_gate_mixed_broadcast_parity(spark, fixtures, monkeypatch):
    """With the per-side byte cap forced to 0 one or both payload
    dictionaries are disabled — every routing (fact-left×dim-right,
    dim-left×fact-right, no-broadcast shuffle) must match the default
    auto plan and brute force. Guards the 100×-scale contract: a side
    over the cap is never collect()ed to the driver."""
    from geowave_spark.operators import geom_join as GJ

    brute = _pairs(
        brute_geom_geom(
            fixtures["trk"], fixtures["lsh"], "intersects", "p_partkey", "s_suppkey"
        ),
        "p_partkey",
        "s_suppkey",
    )

    # auto (both sides small -> both dictionaries)
    auto = geom_geom_join(
        fixtures["trk"], fixtures["lsh"], "intersects",
        left_key="p_partkey", right_key="s_suppkey",
    )
    assert _pairs(auto, "p_partkey", "s_suppkey") == brute

    # cap 0: auto degrades to the shuffle path (neither side collected)
    monkeypatch.setattr(GJ, "BC_MAX_BYTES", 0)
    none_bc = geom_geom_join(
        fixtures["trk"], fixtures["lsh"], "intersects",
        left_key="p_partkey", right_key="s_suppkey",
    )
    assert _pairs(none_bc, "p_partkey", "s_suppkey") == brute

    # one-side dictionaries: patch the gate so exactly one side fits
    lsh_bytes = int(
        fixtures["lsh"].agg(F.sum(F.length("geom"))).first()[0]
    )
    trk_bytes = int(
        fixtures["trk"].agg(F.sum(F.length("geom"))).first()[0]
    )
    monkeypatch.setattr(GJ, "BC_MAX_BYTES", min(lsh_bytes, trk_bytes) + 8)
    mixed = geom_geom_join(
        fixtures["trk"], fixtures["lsh"], "intersects",
        left_key="p_partkey", right_key="s_suppkey",
    )
    assert _pairs(mixed, "p_partkey", "s_suppkey") == brute

    # and the flipped orientation (big side on the right)
    flipped = geom_geom_join(
        fixtures["lsh"], fixtures["trk"], "intersects",
        left_key="s_suppkey", right_key="p_partkey",
    )
    flipped_brute = brute_geom_geom(
        fixtures["lsh"], fixtures["trk"], "intersects", "s_suppkey", "p_partkey"
    )
    assert _pairs(flipped, "s_suppkey", "p_partkey") == _pairs(
        flipped_brute, "s_suppkey", "p_partkey"
    )


def test_duplicate_payload_keys_degrade_on_auto_raise_on_forced(spark, fixtures):
    """ADVICE r3 (low): a key column with conflicting duplicates must
    not hard-fail the DEFAULT auto path — the join degrades to the
    shuffle-refine branch (correct without any payload dictionary).
    Only the FORCED broadcast mode (broadcast_right=True) raises, and
    byte-identical duplicate rows broadcast fine in either mode."""
    dup = fixtures["trk"].select(
        (F.col("p_partkey") % 5).alias("p_partkey"), "geom"
    )
    # auto: degrades, matches brute force on the same (duplicated) keys
    got = geom_geom_join(
        dup, fixtures["lsh"], "intersects",
        left_key="p_partkey", right_key="s_suppkey",
    )
    brute = brute_geom_geom(
        dup, fixtures["lsh"], "intersects", "p_partkey", "s_suppkey"
    )
    assert _pairs(got, "p_partkey", "s_suppkey") == _pairs(
        brute, "p_partkey", "s_suppkey"
    )
    # forced broadcast: the hard error is reserved for this mode
    with pytest.raises(Exception, match="one geometry per key"):
        geom_geom_join(
            dup, fixtures["lsh"], "intersects",
            left_key="p_partkey", right_key="s_suppkey",
            broadcast_right=True,
        ).count()
    # byte-identical duplicate rows: dedupe, keep the broadcast plan
    ident = fixtures["trk"].limit(50)
    ident2 = ident.union(ident)
    same = geom_geom_join(
        ident2, fixtures["lsh"], "intersects",
        left_key="p_partkey", right_key="s_suppkey",
        broadcast_right=True,
    )
    base = geom_geom_join(
        ident, fixtures["lsh"], "intersects",
        left_key="p_partkey", right_key="s_suppkey",
    )
    assert _pairs(same, "p_partkey", "s_suppkey") == _pairs(
        base, "p_partkey", "s_suppkey"
    )


def test_point_join_size_gate_parity(spark, fixtures, monkeypatch):
    """geom_point_join auto-gates its dimension collect: over the cap
    it must fall back to the row-carried refine with identical rows."""
    from geowave_spark.operators import geom_join as GJ
    from geowave_spark.operators.geom_join import _point_refine_udf

    brute = _pairs(
        fixtures["pts"].select("event_id", "x_u", "y_u")
        .crossJoin(fixtures["lsh"].select("s_suppkey", F.col("geom").alias("_g")))
        .where(
            _point_refine_udf("intersects", None)(
                F.col("_g"), F.col("x_u"), F.col("y_u")
            )
        ),
        "event_id",
        "s_suppkey",
    )
    monkeypatch.setattr(GJ, "BC_MAX_BYTES", 0)
    got = geom_point_join(
        fixtures["pts"], fixtures["lsh"], "intersects", geom_key="s_suppkey"
    )
    assert _pairs(got, "event_id", "s_suppkey") == brute
