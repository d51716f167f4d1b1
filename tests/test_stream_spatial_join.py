"""Streaming indexed spatial join == batch box_point_join, pair-for-pair.

The stream side replays the events fixture through a file source in
multiple micro-batches (maxFilesPerTrigger=1); the static side is the
customer extent table. The joined pair set must equal the batch
operator's output exactly — same keys, same count, no duplicates —
proving the stream-static plan reuses the batch index semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geowave_spark.operators.spatial_join import box_point_join
from geowave_spark.sources.testgeo import customer_boxes, events_points
from geowave_spark.streaming.ingest import stream_spatial_join


def test_stream_spatial_join_matches_batch(spark, sf_dir, tmp_path):
    pts = events_points(spark, sf_dir).limit(4000)
    boxes = customer_boxes(spark, sf_dir)

    expected = {
        (r["event_id"], r["c_custkey"])
        for r in box_point_join(pts, boxes).collect()
    }
    assert expected  # fixture sanity: the join is non-trivial

    src = str(tmp_path / "src")
    # two files -> at least two micro-batches with maxFilesPerTrigger=1
    pts.where(F.col("event_id") % 2 == 0).write.parquet(src + "/a.parquet")
    pts.where(F.col("event_id") % 2 == 1).write.parquet(src + "/b.parquet")

    stream = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    joined = stream_spatial_join(stream, boxes)
    q = (
        joined.writeStream.format("memory")
        .queryName("stream_sj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got_rows = spark.sql("SELECT event_id, c_custkey FROM stream_sj").collect()
    got = {(r["event_id"], r["c_custkey"]) for r in got_rows}
    assert len(got_rows) == len(got)  # no duplicate pairs across batches
    assert got == expected


def test_stream_distance_join_matches_batch(spark, sf_dir, tmp_path):
    from geowave_spark.operators.distance_join import point_distance_join
    from geowave_spark.streaming.ingest import stream_distance_join

    radius = 1_500_000  # 1.5 deg
    pts = events_points(spark, sf_dir).limit(3000)
    right = (
        events_points(spark, sf_dir)
        .where(F.col("event_id") % 7 == 0)
        .limit(300)
        .select(F.col("event_id").alias("c_custkey"), "x_u", "y_u")
    )

    expected = {
        (r["event_id"], r["c_custkey"], r["dist2"])
        for r in point_distance_join(pts, right, radius).collect()
    }
    assert expected

    src = str(tmp_path / "dsrc")
    pts.where(F.col("event_id") % 2 == 0).write.parquet(src + "/a.parquet")
    pts.where(F.col("event_id") % 2 == 1).write.parquet(src + "/b.parquet")

    stream = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        stream_distance_join(stream, right, radius)
        .writeStream.format("memory")
        .queryName("stream_dj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT event_id, c_custkey, dist2 FROM stream_dj").collect()
    got = {(r["event_id"], r["c_custkey"], r["dist2"]) for r in rows}
    assert len(rows) == len(got)
    assert got == expected


def test_stream_spatial_join_semi_anti_match_batch(spark, sf_dir, tmp_path):
    pts = events_points(spark, sf_dir).limit(2500)
    boxes = customer_boxes(spark, sf_dir)

    exp_semi = {r["event_id"] for r in box_point_join(pts, boxes, how="leftsemi").collect()}
    exp_anti = {r["event_id"] for r in box_point_join(pts, boxes, how="leftanti").collect()}
    assert exp_semi and exp_anti

    src = str(tmp_path / "sa_src")
    pts.where(F.col("event_id") % 2 == 0).write.parquet(src + "/a.parquet")
    pts.where(F.col("event_id") % 2 == 1).write.parquet(src + "/b.parquet")

    for how, expected in (("leftsemi", exp_semi), ("leftanti", exp_anti)):
        stream = (
            spark.readStream.schema(pts.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        name = f"stream_{how}"
        q = (
            stream_spatial_join(stream, boxes, how=how)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(f"SELECT event_id FROM {name}").collect()
        got = {r["event_id"] for r in rows}
        assert len(rows) == len(got)  # each point emitted once
        assert got == expected
