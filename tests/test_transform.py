"""WGS84 ↔ spherical Web-Mercator closed-form reprojection
(geom/transform.py) — the engine's stand-in for the reference's
GeoTools crsTransform (core/geotime/.../util/GeometryUtils.java),
scoped to the two CRSs the engine's stores index."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geowave_spark.geom.transform import (
    R_MAJOR_M,
    merc_x_mm,
    merc_y_mm,
    reproject_3857_to_4326,
    reproject_4326_to_3857,
    wgs_x_u,
    wgs_y_u,
)
from geowave_spark.sources.testgeo import events_points


def test_known_anchor_points(spark):
    """Published anchor values of the spherical mercator: the domain
    edge x(180°) = pi*R; y(0) = 0; y(85.051128...°) ~ pi*R (the web
    map square)."""
    df = spark.range(1).select(
        merc_x_mm(F.lit(180_000_000)).alias("xe"),
        merc_y_mm(F.lit(0)).alias("y0"),
        merc_y_mm(F.lit(85_051_129)).alias("ysq"),
        merc_x_mm(F.lit(-180_000_000)).alias("xw"),
    )
    r = df.first()
    edge = math.pi * R_MAJOR_M * 1000.0
    assert abs(r["xe"] - edge) < 1
    assert r["xw"] == -r["xe"]
    assert r["y0"] == 0
    assert abs(r["ysq"] - edge) < 2_000  # within 2 m of the square edge


def test_round_trip_is_mm_exact(spark, sf_dir):
    """4326 -> 3857 -> 4326 over the full fixture: the round trip must
    land within ±1 µdeg of the original (mm quantization is ~9e-6 µdeg
    of longitude at the equator, so anything beyond ±1 is a formula
    error, not rounding)."""
    pts = events_points(spark, sf_dir)
    rt = reproject_3857_to_4326(
        reproject_4326_to_3857(pts).select(
            "event_id",
            F.col("x_u").alias("ox"),
            F.col("y_u").alias("oy"),
            "x_mm",
            "y_mm",
        )
    )
    bad = rt.where(
        (F.abs(F.col("x_u") - F.col("ox")) > 1)
        | (F.abs(F.col("y_u") - F.col("oy")) > 1)
    ).count()
    assert bad == 0


def test_inverse_formulas_match_forward(spark):
    """wgs_*_u are the algebraic inverses: feeding exact forward
    outputs back recovers the inputs (spot grid incl. high latitude
    and both hemispheres)."""
    rows = [
        (i, x, y)
        for i, (x, y) in enumerate(
            [
                (0, 0),
                (123_456_789, 45_000_000),
                (-123_456_789, -45_000_000),
                (179_999_999, 84_999_999),
                (-179_999_999, -84_999_999),
                (1, -1),
            ]
        )
    ]
    df = spark.createDataFrame(rows, "i LONG, x_u LONG, y_u LONG")
    rt = df.select(
        "i",
        "x_u",
        "y_u",
        wgs_x_u(merc_x_mm(F.col("x_u"))).alias("rx"),
        wgs_y_u(merc_y_mm(F.col("y_u"))).alias("ry"),
    )
    for r in rt.collect():
        assert abs(r["rx"] - r["x_u"]) <= 1 and abs(r["ry"] - r["y_u"]) <= 1


def test_reproject_feeds_custom_crs_index(spark, sf_dir):
    """Composition with the custom-CRS index: reprojected events land
    inside the WEB_MERCATOR_MM domain and take valid cell ids — the
    ingest-reproject-then-index flow."""
    from geowave_spark.index.crs import CRS_RES, WEB_MERCATOR_MM, cell_col_crs

    pts = reproject_4326_to_3857(events_points(spark, sf_dir))
    dom = pts.agg(
        F.min("x_mm"), F.max("x_mm"), F.min("y_mm"), F.max("y_mm")
    ).first()
    assert dom[0] >= WEB_MERCATOR_MM.x_lo and dom[1] <= WEB_MERCATOR_MM.x_hi
    assert dom[2] >= WEB_MERCATOR_MM.y_lo and dom[3] <= WEB_MERCATOR_MM.y_hi
    n_side = 1 << CRS_RES
    cells = pts.select(
        cell_col_crs(F.col("x_mm"), F.col("y_mm"), CRS_RES, WEB_MERCATOR_MM).alias("c")
    )
    mn, mx = cells.agg(F.min("c"), F.max("c")).first()
    assert 0 <= mn and mx < n_side * n_side
