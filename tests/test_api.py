"""DataStore facade: the reference's top-level API surface end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from geowave_spark.api import DataStore
from geowave_spark.sources.testgeo import customer_boxes, events_points


def _store(spark, sf_dir):
    ds = DataStore(spark)
    ds.add_type("pts", events_points(spark, sf_dir))
    ds.add_type("boxes", customer_boxes(spark, sf_dir), indexed=False)
    return ds


def test_query_bbox_time_where(spark, sf_dir):
    ds = _store(spark, sf_dir)
    base = events_points(spark, sf_dir)
    bbox = (-60_000_000, -40_000_000, 70_000_000, 55_000_000)
    got = ds.query(
        "pts",
        bbox=bbox,
        time=("2024-01-05", "2024-01-20"),
        where="event_type = 'click'",
    )
    want = base.where(
        F.col("x_u").between(bbox[0], bbox[2])
        & F.col("y_u").between(bbox[1], bbox[3])
        & (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
        & (F.col("event_type") == "click")
    )
    assert got.count() == want.count() > 0


def test_query_polygon(spark, sf_dir):
    from geowave_spark.geom.wkb import polygon as mkpoly

    ds = _store(spark, sf_dir)
    poly = mkpoly(
        [[-50_000_000, -30_000_000], [60_000_000, -40_000_000], [0, 60_000_000]]
    )
    got = ds.query("pts", polygon=poly)
    assert 0 < got.count() < events_points(spark, sf_dir).count()


def test_sql_over_registered_views(spark, sf_dir):
    ds = _store(spark, sf_dir)
    row = ds.sql(
        "SELECT count(*) AS n FROM pts WHERE x_u BETWEEN -10000000 AND 10000000"
    ).first()
    want = (
        events_points(spark, sf_dir)
        .where(F.col("x_u").between(-10_000_000, 10_000_000))
        .count()
    )
    assert row.n == want


def test_aggregate_and_binned(spark, sf_dir):
    ds = _store(spark, sf_dir)
    tot = ds.aggregate("pts", [F.count("*").alias("n")]).first()
    assert tot.n == events_points(spark, sf_dir).count()
    binned = ds.aggregate("pts", [F.count("*").alias("n")], bin_res=4)
    assert binned.agg(F.sum("n")).first()[0] == tot.n


def test_spatial_join_and_nn(spark, sf_dir):
    ds = _store(spark, sf_dir)
    j = ds.spatial_join("pts", "boxes")
    assert j.count() > 0
    nn = ds.nn_join("pts", 2_000_000, 3, left_filter=F.col("event_id") % 50 == 0)
    assert nn.groupBy("a_id").count().agg(F.max("count")).first()[0] <= 3


def test_datastore_xz_join_and_extent_query(spark, sf_dir):
    from geowave_spark.api import DataStore
    from geowave_spark.sources.testgeo import customer_boxes, events_points

    ds = DataStore(spark)
    ds.add_type("pts_xz", events_points(spark, sf_dir))
    ds.add_type("boxes_xz", customer_boxes(spark, sf_dir), indexed=False)

    j = ds.xz_join("pts_xz", "boxes_xz")
    ref = ds.spatial_join("pts_xz", "boxes_xz")
    assert j.count() == ref.count()
    assert j.exceptAll(ref.select("event_id", "c_custkey")).count() == 0

    bbox = (-60_000_000, -40_000_000, 70_000_000, 55_000_000)
    e = ds.extent_query("boxes_xz", bbox)
    from pyspark.sql import functions as F

    brute = customer_boxes(spark, sf_dir).where(
        (F.col("x_lo") <= bbox[2]) & (F.col("x_hi") >= bbox[0])
        & (F.col("y_lo") <= bbox[3]) & (F.col("y_hi") >= bbox[1])
    )
    assert e.count() == brute.count()


def test_datastore_delete(spark, sf_dir):
    from geowave_spark.api import DataStore
    from geowave_spark.sources.testgeo import events_points

    ds = DataStore(spark)
    pts = events_points(spark, sf_dir)
    ds.add_type("pts_del", pts)
    total = pts.count()
    bbox = (-60_000_000, -40_000_000, 70_000_000, 55_000_000)
    in_box = ds.query("pts_del", bbox=bbox).count()
    removed = ds.delete("pts_del", bbox=bbox)
    assert removed == in_box > 0
    assert ds.type("pts_del").count() == total - removed
    # view refreshed for the SQL path
    assert ds.sql("SELECT count(*) AS n FROM pts_del").first().n == total - removed
    # deleted region now empty
    assert ds.query("pts_del", bbox=bbox).count() == 0


def test_datastore_round3_surfaces(spark):
    """Facade coverage for the round-3 additions: attribute index,
    thumbnails, embeddings, pyramid."""
    import numpy as np

    from geowave_spark.api import DataStore
    from geowave_spark.operators.tiling import pick_level, tile_cut_and_merge
    from geowave_spark.sources.images import images_table
    from geowave_spark.sources.testgeo import events_points

    ds = DataStore(spark)
    ds.add_type("ev", events_points(spark, "/root/testdata/sf0.001"), indexed=False)
    idx = ds.attribute_index("ev", "user_id")
    lo, hi = 1, 5
    got = idx.where(F.col("user_id").between(lo, hi)).count()
    want = ds.type("ev").where(F.col("user_id").between(lo, hi)).count()
    assert got == want

    imgs = images_table(spark, 24, w=32, h=32, partitions=2)
    ds.add_type("imgs", imgs, indexed=False)
    th = ds.thumbnails("imgs", 8, 8).collect()
    assert len(th) == 24 and all(r.w == 8 and r.h == 8 for r in th)
    emb = ds.image_embeddings("imgs").collect()
    assert len(emb) == 24
    assert all(abs(float(np.dot(r.embedding, r.embedding)) - 1.0) < 1e-9 for r in emb)

    level = pick_level(1_200_000, 32, 32)
    tiles = tile_cut_and_merge(imgs, 600_000, tile_size=32, level=level)
    pyr = ds.build_pyramid(tiles, level, level - 2, 32)
    levels = {r.level for r in pyr.select("level").distinct().collect()}
    assert levels == {level, level - 1, level - 2}


def test_delete_rejects_key_shared_with_unmatched_rows(spark):
    """Regression: key uniqueness was validated over the MATCHED rows
    only, but the anti-join deletes by key equality against the whole
    table — a key value shared with an unmatched row silently deleted
    that row too and the returned count was wrong. Now it raises and
    removes nothing."""
    import pytest as _pytest

    from geowave_spark.api import DataStore

    ds = DataStore(spark)
    rows = [(1, 0, 0, "in"), (1, 150_000_000, 0, "out"), (2, 1000, 0, "in")]
    df = spark.createDataFrame(rows, "id LONG, x_u LONG, y_u LONG, tag STRING")
    ds.add_type("dup_del", df)
    with _pytest.raises(ValueError, match="not unique over the table"):
        ds.delete("dup_del", bbox=(-1_000_000, -1_000_000, 2_000_000, 1_000_000), key="id")
    assert ds.type("dup_del").count() == 3  # nothing removed


def test_snapshot_type_queries_follow_new_commits(spark, sf_dir, tmp_path):
    """Regression: query/cql/aggregate on a snapshot-backed type read
    the frame frozen at add_snapshot_type and missed every commit made
    after registration (while gwql's metadata path saw them). _frame
    now refreshes on snapshot-id change."""
    from pyspark.sql import functions as F

    from geowave_spark.api import DataStore
    from geowave_spark.sources.icetable import IceTable
    from geowave_spark.sources.testgeo import events_points

    t = IceTable(str(tmp_path / "ev"))
    pts = events_points(spark, sf_dir)
    t.commit_write(pts, mode="overwrite", stats_cols=["x_u", "y_u"])
    ds = DataStore(spark)
    ds.add_snapshot_type("ev_live", t)
    n0 = ds.query("ev_live").count()
    extra = pts.limit(5).withColumn("event_id", F.col("event_id") + F.lit(99_000_000))
    t.commit_write(extra, mode="append", stats_cols=["x_u", "y_u"])
    assert ds.query("ev_live").count() == n0 + 5
    assert ds.cql("ev_live", "value >= 0 OR value < 0").count() == n0 + 5
    assert ds.type("ev_live").count() == n0 + 5


def test_cql_bbox_crosses_dateline(spark):
    """Regression: the ECQL/GWQL BBOX constraint path used the plain
    BETWEEN range, so a dateline-crossing box (x0 > x1) silently
    matched zero rows; it now splits into the two sargable sub-ranges
    like DataStore.query always did."""
    from geowave_spark.api import DataStore

    ds = DataStore(spark)
    rows = [
        (1, 175_000_000, 0),    # in the +180 strip
        (2, -175_000_000, 0),   # in the -180 strip
        (3, 0, 0),              # outside the wrapped box
    ]
    ds.add_type("dl_pts", spark.createDataFrame(rows, "event_id LONG, x_u LONG, y_u LONG"))
    got = sorted(
        r["event_id"]
        for r in ds.cql(
            "dl_pts",
            "BBOX(geom, 170000000, -10000000, -170000000, 10000000)",
        ).collect()
    )
    assert got == [1, 2]
    got2 = sorted(
        r["event_id"]
        for r in ds.gwql(
            "SELECT event_id FROM dl_pts "
            "WHERE BBOX(geom, 170000000, -10000000, -170000000, 10000000)"
        ).collect()
    )
    assert got2 == [1, 2]
