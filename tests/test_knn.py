"""kNN ring expansion vs brute-force window oracle (NNMapReduce top-K
semantics, NNMapReduce.java:60-95)."""

import pytest

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
