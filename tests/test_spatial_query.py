"""End-to-end range/polygon query vs brute-force oracle (pandas).

Oracle style mirrors the reference's golden-output comparison: count +
id-set equality (AbstractGeoWaveBasicVectorIT.java:94-131 /
TestUtils.java:459-491 hashed-centroid sets)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.geom.predicates import points_in_polygon
from geowave_spark.geom.wkb import polygon
from geowave_spark.index.native import cell_col
from geowave_spark.operators.spatial_query import (
    bbox_query,
    polygon_query,
    with_cell,
)
from geowave_spark.sources.testgeo import events_points, xy_numpy

BBOX = (-60_000_000, -40_000_000, 70_000_000, 55_000_000)
# convex pentagon in micro-degrees
PENTA_U = [
    (-50_000_000, -30_000_000),
    (60_000_000, -40_000_000),
    (75_000_000, 20_000_000),
    (0, 60_000_000),
    (-65_000_000, 15_000_000),
]


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return events_points(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def oracle_pdf(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    x, y = xy_numpy(ev["event_id"].to_numpy())
    ev["x_u"], ev["y_u"] = x, y
    return ev


def test_spark_xy_matches_numpy(points, oracle_pdf):
    got = points.select("event_id", "x_u", "y_u").toPandas().sort_values("event_id")
    exp = oracle_pdf[["event_id", "x_u", "y_u"]].sort_values("event_id")
    assert np.array_equal(got["x_u"].to_numpy(), exp["x_u"].to_numpy())
    assert np.array_equal(got["y_u"].to_numpy(), exp["y_u"].to_numpy())


def test_native_cell_matches_python(points, spark):
    from geowave_spark.index.zorder import cells_of_points

    pdf = points.select("x_u", "y_u", cell_col(F.col("x_u"), F.col("y_u"), 16).alias("cell")).toPandas()
    exp = cells_of_points(pdf["x_u"].to_numpy(), pdf["y_u"].to_numpy(), 16)
    assert np.array_equal(pdf["cell"].to_numpy(), exp)


def test_bbox_query_vs_oracle(points, oracle_pdf):
    x0, y0, x1, y1 = BBOX
    got = set(
        r["event_id"] for r in bbox_query(points, x0, y0, x1, y1).select("event_id").collect()
    )
    m = (
        oracle_pdf["x_u"].between(x0, x1) & oracle_pdf["y_u"].between(y0, y1)
    )
    exp = set(oracle_pdf.loc[m, "event_id"])
    assert got == exp and len(got) > 10


def test_bbox_query_with_cell_pruning(points, oracle_pdf):
    """Indexed variant (cell column + SFC range predicate) returns the
    identical row set."""
    x0, y0, x1, y1 = BBOX
    indexed = with_cell(points, 12)
    got = set(
        r["event_id"]
        for r in bbox_query(indexed, x0, y0, x1, y1, cell_col_name="cell", res=12)
        .select("event_id")
        .collect()
    )
    m = oracle_pdf["x_u"].between(x0, x1) & oracle_pdf["y_u"].between(y0, y1)
    assert got == set(oracle_pdf.loc[m, "event_id"])


def test_polygon_query_vs_oracle(points, oracle_pdf):
    poly = polygon([[x, y] for x, y in PENTA_U])
    got = set(
        r["event_id"] for r in polygon_query(points, poly).select("event_id").collect()
    )
    mask = points_in_polygon(
        oracle_pdf["x_u"].to_numpy(dtype="float64"),
        oracle_pdf["y_u"].to_numpy(dtype="float64"),
        poly,
    )
    exp = set(oracle_pdf.loc[mask, "event_id"])
    assert got == exp and len(got) > 10


def test_polygon_query_empty_region(points):
    # a polygon in the unpopulated corner near the pole
    poly = polygon([[-179_000_000, 86_000_000], [-178_000_000, 86_000_000], [-178_000_000, 87_000_000]])
    assert polygon_query(points, poly).count() == 0


def test_dateline_crossing_bbox(spark, sf_dir):
    """Antimeridian-crossing box: x from 150E wrapping to -150W
    (LongitudeDefinition bin-split semantics)."""
    from geowave_spark.operators.spatial_query import (
        bbox_query_dateline,
        dateline_split,
    )
    from geowave_spark.sources.testgeo import events_points
    from pyspark.sql import functions as F

    assert dateline_split(10, 20) == [(10, 20)]
    assert dateline_split(150_000_000, -150_000_000) == [
        (150_000_000, 180_000_000),
        (-180_000_000, -150_000_000),
    ]

    pts = events_points(spark, sf_dir)
    got = bbox_query_dateline(
        pts, 150_000_000, -60_000_000, -150_000_000, 60_000_000
    )
    want = pts.where(
        ((F.col("x_u") >= 150_000_000) | (F.col("x_u") <= -150_000_000))
        & F.col("y_u").between(-60_000_000, 60_000_000)
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_subsample_at_resolution(spark, sf_dir):
    """One min-key representative per occupied cell; cells unique;
    every input point's cell is represented (the scan-skip semantics
    of MAX_RESOLUTION_SUBSAMPLING_PER_DIMENSION, key-ordered)."""
    from geowave_spark.index.native import grid_coord_col
    from geowave_spark.operators.spatial_query import subsample_at_resolution
    from geowave_spark.sources.testgeo import events_points

    pts = events_points(spark, sf_dir)
    res = 5
    sub = subsample_at_resolution(pts, res).collect()
    cells = [(r.gx, r.gy) for r in sub]
    assert len(cells) == len(set(cells))
    grid = pts.select(
        grid_coord_col(F.col("x_u"), res).alias("gx"),
        grid_coord_col(F.col("y_u"), res).alias("gy"),
        "event_id",
    ).collect()
    by_cell = {}
    for r in grid:
        k = (r.gx, r.gy)
        by_cell[k] = min(by_cell.get(k, r.event_id), r.event_id)
    assert {(r.gx, r.gy): r.event_id for r in sub} == by_cell
