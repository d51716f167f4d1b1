"""DBSCAN vs a driver-side reference implementation on small data."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geowave_spark.operators.dbscan import dbscan, eps_pairs
from geowave_spark.sources.testgeo import events_points


def _reference_dbscan(xy: dict, eps: int, min_pts: int):
    """Textbook DBSCAN (BFS expansion), python, for the oracle."""
    ids = sorted(xy)
    eps2 = eps * eps

    def neigh(i):
        xi, yi = xy[i]
        return [
            j for j in ids if j != i and (xy[j][0] - xi) ** 2 + (xy[j][1] - yi) ** 2 <= eps2
        ]

    nb = {i: neigh(i) for i in ids}
    core = {i for i in ids if len(nb[i]) >= min_pts - 1}
    # components over core-core edges, labeled by min core id
    label = {}
    for seed in sorted(core):
        if seed in label:
            continue
        comp = {seed}
        stack = [seed]
        while stack:
            cur = stack.pop()
            for j in nb[cur]:
                if j in core and j not in comp:
                    comp.add(j)
                    stack.append(j)
        m = min(comp)
        for i in comp:
            label[i] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], True)
        else:
            cores_near = [label[j] for j in nb[i] if j in core]
            out[i] = (min(cores_near) if cores_near else None, False)
    return out


def test_eps_pairs_symmetric(spark, sf_dir):
    pts = events_points(spark, sf_dir).limit(300)
    p = eps_pairs(pts, 5_000_000)
    fwd = {(r.a_id, r.b_id) for r in p.collect()}
    assert all((b, a) in fwd for a, b in fwd)


def test_dbscan_matches_reference(spark, sf_dir):
    pts = events_points(spark, sf_dir).where(F.col("event_id") < 400)
    rows = pts.select("event_id", "x_u", "y_u").collect()
    xy = {r.event_id: (r.x_u, r.y_u) for r in rows}
    eps, min_pts = 8_000_000, 4

    want = _reference_dbscan(xy, eps, min_pts)
    got = {
        r.event_id: (r.cluster, r.is_core)
        for r in dbscan(pts, eps, min_pts).collect()
    }
    assert got == want
    # sanity: some clusters and some noise exist at this eps
    n_clusters = len({c for c, _ in want.values() if c is not None})
    n_noise = sum(1 for c, _ in want.values() if c is None)
    assert n_clusters >= 1 and n_noise >= 1


def test_min_pts_1_isolated_point_is_singleton_cluster(spark):
    """Regression: cores were derived from the pair list, so an
    isolated point (no pairs) could never test its degree and came
    back as noise — standard DBSCAN with min_pts=1 (neighbor count
    inclusive of self) makes every point a core of its own cluster."""
    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 100_000_000, 0), (3, 100_001_000, 0)],
        "event_id LONG, x_u LONG, y_u LONG",
    )
    out = {r["event_id"]: r for r in dbscan(pts, eps_u=10_000, min_pts=1).collect()}
    assert out[1]["is_core"] and out[1]["cluster"] == 1  # isolated singleton
    assert out[2]["cluster"] == out[3]["cluster"] == 2  # nearby pair merges
    # min_pts=2: the isolated point is noise again
    out2 = {r["event_id"]: r for r in dbscan(pts, eps_u=10_000, min_pts=2).collect()}
    assert out2[1]["cluster"] is None and not out2[1]["is_core"]
