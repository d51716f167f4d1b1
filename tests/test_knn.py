"""kNN ring expansion vs brute-force window oracle (NNMapReduce top-K
semantics, NNMapReduce.java:60-95)."""

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators.knn import knn, knn_brute
from geowave_spark.sources.testgeo import events_points

QUERIES = [
    (1, 0, 0),
    (2, -73_950_000, 40_700_000),  # hotspot center — dense cell
    (3, 150_000_000, -60_000_000),  # sparse corner
]


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return events_points(spark, sf_dir).cache()


@pytest.mark.parametrize("k", [1, 5, 10])
def test_knn_matches_brute(spark, points, k):
    got = knn(spark, points, QUERIES, k).toPandas()
    exp = knn_brute(spark, points, QUERIES, k).toPandas()
    key = ["query_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert got[["query_id", "event_id", "dist2", "rank"]].equals(
        exp[["query_id", "event_id", "dist2", "rank"]]
    )
    assert len(got) == k * len(QUERIES)


def test_knn_join_matches_brute_large_queryset(spark):
    """Distributed knn_join (resolution-ladder rounds, no per-query
    driver state) must equal brute force over a large query set."""
    from geowave_spark.operators.knn import knn_brute, knn_join
    from geowave_spark.sources.testgeo import events_points

    pts = events_points(spark, "/root/testdata/sf0.001")
    queries = [(i, (i * 7_919_993) % 300_000_000 - 150_000_000,
                (i * 3_644_437) % 150_000_000 - 75_000_000) for i in range(150)]
    qdf = spark.createDataFrame(
        [(int(q), int(x), int(y)) for q, x, y in queries],
        "query_id long, qx long, qy long",
    )
    got = knn_join(pts, qdf, 5)
    exp = knn_brute(spark, pts, queries, 5)
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in exp.collect()}
    assert g == e


def test_knn_join_releases_round_frames(spark):
    """Ladder persist hygiene: running the ladder must not accumulate
    one persisted frame per round per call — a long-lived session
    (bench loop, streaming driver) holds at most the checkpointed
    result, not every round's window output."""
    from geowave_spark.operators.knn import knn_join
    from geowave_spark.sources.testgeo import events_points

    pts = events_points(spark, "/root/testdata/sf0.001")
    qdf = pts.where(F.col("event_id") % 11 == 0).select(
        F.col("event_id").alias("query_id"),
        F.col("x_u").alias("qx"),
        F.col("y_u").alias("qy"),
    )

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_persisted()
    r1 = knn_join(pts, qdf, 5)
    n1 = r1.count()
    after1 = n_persisted()
    r2 = knn_join(pts, qdf, 5)
    assert r2.count() == n1
    after2 = n_persisted()
    # each call may leave its (checkpointed) result + final remaining
    # until GC, but never a per-round accumulation (>=3 rounds run at
    # this density if leaking)
    assert after1 - base <= 3
    assert after2 - after1 <= 3


def test_knn_join_best_effort_when_k_exceeds_corpus(spark):
    """Regression: a query that can never satisfy the resolution gate
    (k > corpus size, or the k-th neighbor farther than a world span)
    previously produced ZERO rows from knn_join while knn() returned
    the available neighbors. The res-0 round now emits best-effort
    top-k for every unresolved query — and at res 0 the single cell
    holds every point, so those rows are the exact global ranks."""
    from geowave_spark.operators.knn import knn_join

    pts = spark.createDataFrame(
        [(i, i * 1_000_000, 0) for i in range(5)], "event_id LONG, x_u LONG, y_u LONG"
    )
    qdf = spark.createDataFrame(
        [(1, 0, 0), (2, 170_000_000, -80_000_000)], "query_id LONG, qx LONG, qy LONG"
    )
    out = knn_join(pts, qdf, k=10).toPandas()  # k > 5 points
    assert sorted(out["query_id"].unique()) == [1, 2]
    # every query gets ALL 5 available neighbors, exact ranks
    for q in (1, 2):
        sub = out[out["query_id"] == q].sort_values("rank")
        assert list(sub["rank"]) == [1, 2, 3, 4, 5]
        assert list(sub["dist2"]) == sorted(sub["dist2"])
    exp = knn(spark, pts, [(1, 0, 0), (2, 170_000_000, -80_000_000)], 10).toPandas()
    key = ["query_id", "rank"]
    assert (
        out.sort_values(key).reset_index(drop=True)[["query_id", "event_id", "dist2"]]
        .equals(exp.sort_values(key).reset_index(drop=True)[["query_id", "event_id", "dist2"]])
    )
