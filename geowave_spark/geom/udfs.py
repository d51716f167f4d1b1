"""Spark SQL geometry function registry.

Parity with the reference's UDF surface
(analytics/spark/.../udf/UDFRegistrySPI.java:14-27 /
GeomFunctionRegistry.java): GeomContains, GeomCovers, GeomCrosses,
GeomDisjoint, GeomEquals, GeomIntersects, GeomOverlaps, GeomTouches,
GeomWithin, GeomWithinDistance, GeomDistance, GeomFromWKT — each an
Arrow-batched pandas UDF over WKB binary columns (the reference's are
row-at-a-time JTS UDF2s; these are vectorized per batch).

Keep these out of hot paths when a native expression exists (bbox
refinement, point-in-polygon over coordinate columns) — they are the
general-geometry fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, BinaryType

from geowave_spark.geom import predicates as P
from geowave_spark.geom.wkb import linestring, point, polygon, wkb_dumps, wkb_loads


def _pair_pred(fn):
    def run(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.zeros(len(a), dtype=bool)
        for i in range(len(a)):
            ga = wkb_loads(bytes(a.iloc[i]))
            gb = wkb_loads(bytes(b.iloc[i]))
            out[i] = fn(ga, gb)
        return pd.Series(out)

    return run


def geom_from_wkt(wkt: str) -> bytes:
    """Tiny WKT reader (POINT / LINESTRING / POLYGON, no holes-in-text) —
    GeomFromWKT analog (udf/GeomFromWKT.java)."""
    s = wkt.strip()
    up = s.upper()

    def coords(body: str):
        return [[float(v) for v in pt.split()] for pt in body.split(",")]

    if up.startswith("POINT"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        x, y = (float(v) for v in body.split())
        return wkb_dumps(point(x, y))
    if up.startswith("LINESTRING"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return wkb_dumps(linestring(coords(body)))
    if up.startswith("POLYGON"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        rings = []
        depth = 0
        cur = ""
        for ch in inner:
            if ch == "(":
                depth += 1
                cur = ""
            elif ch == ")":
                depth -= 1
                rings.append(coords(cur))
            elif depth > 0:
                cur += ch
        return wkb_dumps(polygon(rings[0], holes=rings[1:]))
    raise ValueError(f"unsupported WKT: {wkt[:40]}")


def register_geom_functions(spark: SparkSession) -> None:
    """Register the Geom* SQL functions on a session."""
    for name, fn in [
        ("GeomIntersects", P.intersects),
        ("GeomDisjoint", P.disjoint),
        ("GeomContains", P.contains),
        ("GeomCovers", P.contains),  # covers ≡ contains under our boundary rules
        ("GeomWithin", P.within),
        ("GeomTouches", P.touches),
        ("GeomCrosses", P.crosses),
        ("GeomOverlaps", P.overlaps),
        ("GeomEquals", P.equals),
    ]:
        spark.udf.register(name, F.pandas_udf(_pair_pred(fn), BooleanType()))

    def dist(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                P.distance(wkb_loads(bytes(a.iloc[i])), wkb_loads(bytes(b.iloc[i])))
                for i in range(len(a))
            ]
        )

    spark.udf.register("GeomDistance", F.pandas_udf(dist, DoubleType()))

    def within_distance(a: pd.Series, b: pd.Series, r: pd.Series) -> pd.Series:
        return pd.Series(
            [
                P.dwithin(
                    wkb_loads(bytes(a.iloc[i])), wkb_loads(bytes(b.iloc[i])), float(r.iloc[i])
                )
                for i in range(len(a))
            ]
        )

    spark.udf.register("GeomWithinDistance", F.pandas_udf(within_distance, BooleanType()))

    def from_wkt(w: pd.Series) -> pd.Series:
        return pd.Series([geom_from_wkt(s) for s in w])

    spark.udf.register("GeomFromWKT", F.pandas_udf(from_wkt, BinaryType()))
