"""k-nearest-neighbors via cell-ring expansion + windowed rank.

Reference semantics: NNMapReduce partitions space into grid cells with
an expanded neighborhood, then keeps a bounded top-K neighbor list per
entry (analytics/mapreduce/.../nn/NNMapReduce.java:60-165,
DefaultNeighborList.java:17; partitioner
analytics/api/.../partitioner/OrthodromicDistancePartitioner.java).

Engine plan: query points are few (a query set), so their ring-expanded
candidate cells form a small broadcast dimension; candidates equi-join
on cell, exact squared distance is a native integer expression, and
``row_number() over (partition by query order by dist, id)`` takes the
top k — the Window.partitionBy analog called for by SURVEY.md §2.3.

Correct-by-construction ring bound: if ring radius w covers distance
d_w = w * cell_span, then once a query has ≥ k candidates within d_w in
the ring, no point outside the ring can be closer — the expansion stops
(same guarantee as the reference's maxDistance-bounded neighborhoods).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geowave_spark import WORLD_X_U
from geowave_spark.index.native import cell_col
from geowave_spark.index.zorder import cell_of_point, kring


def knn(
    spark: SparkSession,
    points: DataFrame,
    queries: list[tuple[int, int, int]],  # (query_id, qx_u, qy_u)
    k: int,
    res: int = 8,
    point_key: str = "event_id",
    max_ring: int | None = None,
) -> DataFrame:
    """Exact kNN of each query point, planar metric on µdeg ints.

    Returns (query_id, point_key, dist2, rank) — dist2 is the exact
    integer squared distance (deterministic, oracle-matchable); ties
    break by id (documented rule, FIXTURES.md §4).
    """
    cell_span = WORLD_X_U >> res
    n_side = 1 << res
    if max_ring is None:
        max_ring = n_side  # full-domain fallback (exactness guarantee)

    pts = points.withColumn("_cell", cell_col(F.col("x_u"), F.col("y_u"), res))

    ring = 1
    while True:
        cand_rows = []
        for qid, qx, qy in queries:
            c = cell_of_point(qx, qy, res)
            for cc in kring(c, res, ring):
                cand_rows.append((int(qid), int(qx), int(qy), int(cc)))
        qdf = F.broadcast(
            spark.createDataFrame(cand_rows, "query_id long, qx long, qy long, _cell long")
        )
        j = pts.join(qdf, "_cell", "inner")
        dx = F.col("x_u") - F.col("qx")
        dy = F.col("y_u") - F.col("qy")
        cand = j.withColumn("dist2", dx * dx + dy * dy)

        # a candidate at dist ≤ (ring)*cell_span is provably closer than
        # anything outside the ring (ring+1 boundary ≥ ring*cell_span away)
        safe_d = ring * cell_span
        counts = {
            r["query_id"]: r["n"]
            for r in cand.where(F.col("dist2") <= safe_d * safe_d)
            .groupBy("query_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if all(counts.get(q[0], 0) >= k for q in queries) or ring >= max_ring:
            w = Window.partitionBy("query_id").orderBy("dist2", point_key)
            return (
                cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", point_key, "dist2", "rank")
            )
        ring *= 2


def knn_brute(
    spark: SparkSession,
    points: DataFrame,
    queries: list[tuple[int, int, int]],
    k: int,
    point_key: str = "event_id",
) -> DataFrame:
    """Brute-force oracle twin (cross join), for tests and small inputs."""
    qdf = F.broadcast(
        spark.createDataFrame(
            [(int(q), int(x), int(y)) for q, x, y in queries],
            "query_id long, qx long, qy long",
        )
    )
    dx = F.col("x_u") - F.col("qx")
    dy = F.col("y_u") - F.col("qy")
    w = Window.partitionBy("query_id").orderBy("dist2", point_key)
    return (
        points.crossJoin(qdf)
        .withColumn("dist2", dx * dx + dy * dy)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", point_key, "dist2", "rank")
    )
