"""SqlQueryRunner-analog routing: a spark.sql spatial predicate must
produce the indexed join plan (no CartesianProduct /
BroadcastNestedLoopJoin) and match the naive UDF-filter result
row-for-row — the round-2 'done' contract for SQL-plan routing."""

import pytest
from pyspark.sql import functions as F

from geowave_spark.api import DataStore
from geowave_spark.sources.testgeo import part_tracks, supplier_lshapes

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(spark):
    ds = DataStore(spark)
    supplier_lshapes(spark, SF).createOrReplaceTempView("lshapes_v")
    part_tracks(spark, SF).limit(500).createOrReplaceTempView("tracks_v")
    return ds


def _explain(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_cartesian(df):
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


SQL = (
    "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
    "WHERE GeomIntersects(t.geom, o.geom)"
)


def test_rewrite_produces_indexed_plan_and_same_rows(spark, store):
    routed = store.sql(SQL)
    _no_cartesian(routed)
    naive = store.sql(SQL, rewrite=False)
    assert "Cartesian" in _explain(naive) or "NestedLoop" in _explain(naive)
    got = set(map(tuple, routed.collect()))
    exp = set(map(tuple, naive.collect()))
    assert got == exp
    assert len(got) > 0


def test_rewrite_distance_predicate(spark, store):
    sql = (
        "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
        "WHERE GeomWithinDistance(t.geom, o.geom, 500000.0)"
    )
    routed = store.sql(sql)
    _no_cartesian(routed)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))


def test_rewrite_crosses_predicate(spark, store):
    sql = (
        "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
        "WHERE GeomCrosses(t.geom, o.geom)"
    )
    routed = store.sql(sql)
    _no_cartesian(routed)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))


def test_residual_conjuncts_route_with_native_filter(spark, store):
    """OptimalCQLQuery residual split: spatial conjunct through the
    indexed join, attribute conjuncts reattached natively."""
    sql = (
        "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
        "WHERE GeomIntersects(t.geom, o.geom) AND t.p_partkey > 10 "
        "AND o.s_suppkey % 2 = 0"
    )
    routed = store.sql(sql)
    _no_cartesian(routed)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))


def test_order_by_and_limit_preserved(spark, store):
    """The round-2 re-emitter silently dropped ORDER BY / LIMIT; they
    must now ride through the rewrite verbatim."""
    sql = (
        "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
        "WHERE GeomIntersects(t.geom, o.geom) "
        "ORDER BY t.p_partkey, o.s_suppkey LIMIT 10"
    )
    routed = store.sql(sql)
    _no_cartesian(routed)
    naive = store.sql(sql, rewrite=False)
    assert list(map(tuple, routed.collect())) == list(map(tuple, naive.collect()))
    assert routed.count() == 10


def test_group_by_preserved(spark, store):
    sql = (
        "SELECT t.p_partkey, count(*) AS n FROM tracks_v t, lshapes_v o "
        "WHERE GeomIntersects(t.geom, o.geom) GROUP BY t.p_partkey"
    )
    routed = store.sql(sql)
    _no_cartesian(routed)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))


def test_select_literal_containing_from_slices_correctly(spark, store):
    sql = (
        "SELECT t.p_partkey, 'keep from here' AS lit "
        "FROM tracks_v t, lshapes_v o WHERE GeomIntersects(t.geom, o.geom)"
    )
    routed = store.sql(sql)
    _no_cartesian(routed)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))


def test_select_subquery_item(spark, store):
    """A scalar subquery in the select list must either route with
    identical results or fall back to the plain plan — never mis-slice."""
    sql = (
        "SELECT t.p_partkey, (SELECT max(s_suppkey) FROM lshapes_v) AS mx "
        "FROM tracks_v t, lshapes_v o WHERE GeomIntersects(t.geom, o.geom)"
    )
    routed = store.sql(sql)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))


def test_unroutable_shapes_fall_back(spark, store):
    from geowave_spark.plans.sql_rewrite import try_rewrite_spatial_sql

    # spatial predicate under OR → not a required conjunct
    assert (
        try_rewrite_spatial_sql(
            spark,
            "SELECT t.p_partkey FROM tracks_v t, lshapes_v o "
            "WHERE GeomIntersects(t.geom, o.geom) OR t.p_partkey > 10",
        )
        is None
    )
    # negated spatial predicate
    assert (
        try_rewrite_spatial_sql(
            spark,
            "SELECT t.p_partkey FROM tracks_v t, lshapes_v o "
            "WHERE NOT GeomIntersects(t.geom, o.geom)",
        )
        is None
    )
    # two geom predicates → ambiguous
    assert (
        try_rewrite_spatial_sql(
            spark,
            "SELECT t.p_partkey FROM tracks_v t, lshapes_v o "
            "WHERE GeomIntersects(t.geom, o.geom) AND GeomCrosses(t.geom, o.geom)",
        )
        is None
    )
    # single-relation scalar filter → not a join predicate
    assert (
        try_rewrite_spatial_sql(
            spark,
            "SELECT t.p_partkey FROM tracks_v t "
            "WHERE GeomIntersects(t.geom, t.geom)",
        )
        is None
    )
    # no geom predicate at all
    assert (
        try_rewrite_spatial_sql(
            spark, "SELECT p_partkey FROM tracks_v WHERE p_partkey > 10"
        )
        is None
    )
    # set operation over the routable shape
    assert (
        try_rewrite_spatial_sql(
            spark,
            "SELECT t.p_partkey FROM tracks_v t, lshapes_v o "
            "WHERE GeomIntersects(t.geom, o.geom) "
            "UNION SELECT p_partkey FROM tracks_v",
        )
        is None
    )


def test_between_residual_routes_and_matches(spark, store):
    """ADVICE r3 (high): ``col BETWEEN a AND b`` analyzes to And nodes
    so the query passes plan detection, but the text splitter used to
    slice at BETWEEN's AND and re-emit unparsable SQL. The splitter is
    now BETWEEN-aware; the query must route AND match the naive plan."""
    sql = (
        "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
        "WHERE GeomIntersects(t.geom, o.geom) AND t.p_partkey BETWEEN 5 AND 300"
    )
    routed = store.sql(sql)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))
    _no_cartesian(routed)


def test_between_chain_and_not_between(spark, store):
    sql = (
        "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
        "WHERE t.p_partkey BETWEEN 5 AND 300 "
        "AND GeomIntersects(t.geom, o.geom) "
        "AND o.s_suppkey NOT BETWEEN 900 AND 1000"
    )
    routed = store.sql(sql)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))
    _no_cartesian(routed)


def test_case_when_and_residual(spark, store):
    """An AND inside CASE ... WHEN x AND y ... END must not split."""
    sql = (
        "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
        "WHERE GeomIntersects(t.geom, o.geom) AND "
        "(CASE WHEN t.p_partkey > 5 AND o.s_suppkey > 0 THEN 1 ELSE 0 END) = 1"
    )
    routed = store.sql(sql)
    naive = store.sql(sql, rewrite=False)
    assert set(map(tuple, routed.collect())) == set(map(tuple, naive.collect()))


def test_split_conjuncts_between_case_unit():
    from geowave_spark.plans.sql_rewrite import _split_conjuncts

    assert _split_conjuncts("a BETWEEN 1 AND 5 AND b = 2") == [
        "a BETWEEN 1 AND 5",
        "b = 2",
    ]
    assert _split_conjuncts(
        "x BETWEEN 1 AND 2 AND y NOT BETWEEN 3 AND 4 AND z"
    ) == ["x BETWEEN 1 AND 2", "y NOT BETWEEN 3 AND 4", "z"]
    assert _split_conjuncts(
        "CASE WHEN a AND b THEN 1 ELSE 0 END = 1 AND c"
    ) == ["CASE WHEN a AND b THEN 1 ELSE 0 END = 1", "c"]
    # BETWEEN inside parens is masked out entirely — paren group stays whole
    assert _split_conjuncts("(a BETWEEN 1 AND 5) AND b") == [
        "(a BETWEEN 1 AND 5)",
        "b",
    ]


def test_rewrite_fractional_radius_matches_unrouted(spark, store):
    """Regression: the rewrite truncated GeomWithinDistance's radius
    with int(), silently dropping pairs at distance in (int(r), r]
    vs the unrouted plan; the float now passes through (the join
    ceil-buffers its cover and refines against the exact radius)."""
    sql = (
        "SELECT t.p_partkey, o.s_suppkey FROM tracks_v t, lshapes_v o "
        "WHERE GeomWithinDistance(t.geom, o.geom, 2000000.7)"
    )
    routed = store.sql(sql)
    _no_cartesian(routed)
    unrouted = store.sql(sql, rewrite=False)
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, unrouted.collect())
    )


def test_rewrite_select_star_hides_internal_columns(spark, store):
    """Regression: SELECT * over the rewritten FROM also expanded
    __gw_pairs' internal __lg/__rg WKB columns; the star now expands
    to the two view stars, matching the unrouted schema."""
    sql = (
        "SELECT * FROM tracks_v t, lshapes_v o "
        "WHERE GeomIntersects(t.geom, o.geom)"
    )
    routed = store.sql(sql)
    unrouted = store.sql(sql, rewrite=False)
    assert routed.columns == unrouted.columns
    assert not any(c.startswith("__") for c in routed.columns)
    assert routed.count() == unrouted.count()
