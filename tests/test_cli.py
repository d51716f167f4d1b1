"""CLI tests (geowave_spark/cli.py vs the reference's command groups)."""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

import pytest

from geowave_spark import cli
from geowave_spark.sources import formats as FM

SF = "/root/testdata/sf0.001"


def run(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(argv)
    return rc, buf.getvalue()


@pytest.fixture(scope="module")
def store(tmp_path_factory, spark):
    """Ingest the gdelt + tdrive fixture formats into a CLI store."""
    src = FM.formats_fixture_dir(SF)
    store = str(tmp_path_factory.mktemp("cli_store"))
    rc, out = run(
        ["ingest", "localtogw", src, store, "--formats", "gdelt,tdrive"]
    )
    assert rc == 0, out
    return store


def test_ingest_listplugins():
    rc, out = run(["ingest", "listplugins"])
    assert rc == 0
    assert set(out.split()) == set(FM.FORMATS)


def test_ingest_and_type_list(store):
    rc, out = run(["type", "list", store])
    assert rc == 0
    lines = dict(
        (ln.split("\t")[0], ln) for ln in out.strip().splitlines()
    )
    # superset, not equality: later CLI tests land analytic output
    # types in this shared store
    assert {"gdelt", "tdrive"} <= set(lines)
    assert "978 rows" in lines["gdelt"]  # skip rules applied at ingest
    assert "1000 rows" in lines["tdrive"]
    manifest = json.load(open(os.path.join(store, "types.json")))
    assert manifest["gdelt"]["rows"] == 978


def test_type_describe(store):
    rc, out = run(["type", "describe", store, "gdelt"])
    assert rc == 0
    schema = dict(ln.split("\t") for ln in out.strip().splitlines())
    assert schema["eventid"] == "int" and schema["x_u"] == "bigint"
    rc, _ = run(["type", "describe", store, "nope"])
    assert rc == 1


def test_query_select_console_and_csv(store):
    stmt = "SELECT eventid, x_u, y_u FROM gdelt WHERE eventid < 50 LIMIT 5"
    rc, out = run(["query", store, stmt])
    assert rc == 0 and "(5 rows)" in out
    rc, out = run(["query", store, stmt, "--format", "csv"])
    assert rc == 0
    assert out.splitlines()[0] == "eventid,x_u,y_u"
    assert len(out.strip().splitlines()) == 6


def test_query_spatial_predicate(store):
    """BBOX over the ingested micro-degree keys — the GWQL spatial
    surface works against CLI-ingested format data unchanged."""
    rc, out = run(
        [
            "query",
            store,
            "SELECT eventid FROM gdelt "
            "WHERE BBOX(geom, -10000000, -10000000, 10000000, 10000000)",
            "--format",
            "csv",
        ]
    )
    assert rc == 0
    n = len(out.strip().splitlines()) - 1
    assert 0 < n < 978  # a real spatial subset


def test_stat_list(store):
    rc, out = run(["stat", "list", store, "--type", "gdelt"])
    assert rc == 0
    assert "gdelt: COUNT = 978" in out
    assert "gdelt.eventid: FIELD_MIN_MAX" in out


def test_query_delete_persists(store, spark):
    """GWQL DELETE through the CLI rewrites the stored type (the
    in-memory anti-join keys on the unique leading column)."""
    rc, out = run(["query", store, "DELETE FROM gdelt WHERE eventid < 50"])
    assert rc == 0 and "deleted" in out
    rc, out = run(
        [
            "query",
            store,
            "SELECT eventid FROM gdelt WHERE eventid < 50",
            "--format",
            "csv",
        ]
    )
    assert len(out.strip().splitlines()) == 1  # header only — durably gone
    manifest = json.load(open(os.path.join(store, "types.json")))
    df = spark.read.parquet(os.path.join(store, "gdelt"))
    assert manifest["gdelt"]["rows"] == df.count() < 978


def test_type_rm(store):
    rc, out = run(["type", "rm", store, "gdelt"])
    assert rc == 0
    rc, out = run(["type", "list", store])
    assert "gdelt" not in out


def test_export_avro_roundtrip(store, spark, tmp_path):
    """export → read_avro is the identity on the parsed rows
    (ingest ∘ export round trip through the from-scratch codec)."""
    out = str(tmp_path / "tdrive.avro")
    rc, msg = run(["export", store, "tdrive", "--out", out])
    assert rc == 0 and "exported 1000 rows" in msg
    from geowave_spark.sources.avro import avro_read, read_avro

    schema, recs = avro_read(open(out, "rb").read())
    assert len(recs) == 1000
    names = [f["name"] for f in schema["fields"]]
    assert names[:2] == ["taxiid", "pointinstance"]
    # spot-check against the stored parquet (timestamps = epoch micros)
    import os

    df = (
        spark.read.parquet(os.path.join(store, "tdrive"))
        .orderBy("taxiid", "pointinstance")
        .limit(1)
        .collect()[0]
    )
    first = min(recs, key=lambda r: (r["taxiid"], r["pointinstance"]))
    assert first["taxiid"] == df["taxiid"]
    assert first["x_u"] == df["x_u"]
    assert first["Timestamp"] == int(df["Timestamp"].timestamp() * 1e6)
    # and the Spark reader loads the exported container distributed
    back = read_avro(spark, out)
    assert back.count() == 1000


def test_export_geojson_with_cql(store, spark, tmp_path):
    out = str(tmp_path / "t.geojson")
    rc, msg = run(
        ["export", store, "tdrive", "--format", "geojson", "--out", out,
         "--cql", "taxiid < 5.0"]
    )
    assert rc == 0
    from geowave_spark.sources import formats as FM

    df = FM.read_geojson(spark, str(tmp_path)).toPandas()
    import os

    want = (
        spark.read.parquet(os.path.join(store, "tdrive"))
        .where("taxiid < 5.0")
        .count()
    )
    assert 0 < len(df) == want < 1000
    assert (df["gtype"] == "Point").all()
    assert (df["props"].map(lambda p: float(p["taxiid"]) < 5)).all()


def test_analytic_kde_and_kmeans(store):
    rc, msg = run(
        ["analytic", "kde", store, "tdrive", "--out-type", "heat", "--level", "6"]
    )
    assert rc == 0 and "rows into type 'heat'" in msg
    rc, out = run(["type", "list", store])
    assert "heat" in out and "analytic:kde" in out
    rc, msg = run(
        ["analytic", "kmeans", store, "tdrive", "--out-type", "km", "--k", "4"]
    )
    assert rc == 0 and msg.count("center ") == 4
    rc, out = run(["query", store, "SELECT count(*) AS n FROM km",
                   "--format", "csv"])
    assert rc == 0
    # clustered output keeps every input row
    assert out.strip().splitlines()[1] == "1000"


def test_analytic_nn_and_dbscan(tmp_path_factory, spark):
    """nn/dbscan verbs over a fresh gdelt store (unique eventid key)."""
    src = FM.formats_fixture_dir(SF)
    st = str(tmp_path_factory.mktemp("an_store"))
    rc, _ = run(["ingest", "localtogw", src, st, "--formats", "gdelt"])
    assert rc == 0
    rc, msg = run(
        ["analytic", "nn", st, "gdelt", "--out-type", "nn3",
         "--max-dist-u", "4000000", "--k", "3", "--key", "eventid"]
    )
    assert rc == 0 and "rows into type 'nn3'" in msg
    nn = spark.read.parquet(os.path.join(st, "nn3")).toPandas()
    assert set(nn.columns) >= {"a_id", "b_id", "rank"}
    assert (nn.groupby("a_id")["rank"].max() <= 3).all()
    rc, msg = run(
        ["analytic", "dbscan", st, "gdelt", "--out-type", "clusters",
         "--eps-u", "1500000", "--min-pts", "3", "--key", "eventid"]
    )
    assert rc == 0
    cl = spark.read.parquet(os.path.join(st, "clusters")).toPandas()
    assert {"cluster", "is_core"} <= set(cl.columns)
    assert cl["cluster"].notna().any()  # the hotspot clusters exist


def test_export_shapefile_roundtrip(store, spark, tmp_path):
    """export --format shapefile → read_shapefile recovers every point
    and its attributes through the from-scratch .shp/.dbf codec."""
    out = str(tmp_path / "td.shp")
    rc, msg = run(
        ["export", store, "tdrive", "--format", "shapefile", "--out", out,
         "--cql", "taxiid < 2.0"]
    )
    assert rc == 0
    from geowave_spark.sources.shapefile import read_shapefile

    df = read_shapefile(spark, str(tmp_path)).toPandas()
    want = (
        spark.read.parquet(os.path.join(store, "tdrive"))
        .where("taxiid < 2.0")
        .toPandas()
    )
    assert len(df) == len(want) > 0
    assert (df["shape_type"] == 1).all()
    # attributes survive (dBase numeric text)
    taxis = sorted({float(a["taxiid"]) for a in df["attrs"]})
    assert taxis == sorted(want["taxiid"].unique())
    # geometry: decode one point and match a stored row
    from geowave_spark.geom.wkb import wkb_loads

    g = wkb_loads(bytes(df["geometry"].iloc[0]))
    x = g.parts[0][0][0]
    assert any(abs(want["Longitude"] - x) < 1e-9)
