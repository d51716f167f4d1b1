"""Session-level SQL function registration.

``register_all(spark)`` installs the engine's full SQL-callable
surface on a session, after which every reference query shape runs as
plain ``spark.sql`` text:

- the 12 Geom* geometry functions over WKB columns
  (GeomFunctionRegistry parity — delegated to geowave_spark.geom.udfs);
- GWQL predicate functions the reference parses specially
  (SpatialPredicates.java:22-250): BBOX / BBOXLOOSE over coordinate
  columns — "loose" applies only the coarse constraint and skips exact
  refinement, which for an axis-aligned bbox over point coordinates is
  the same predicate widened to the cell grid;
- text predicates strStartsWith / strEndsWith / strContains
  (core/store/.../gwql/function/predicate/TextPredicates.java:19-90);
- temporal helpers TBIN_YEAR/MONTH/DAY/HOUR (TemporalBinningStrategy
  bins) and TOVERLAPS (TimeOverlaps).

GWQL's remaining surface (ABS, CONCAT, + - * /, :: casts — see
GWQLParseHelper.java:74-129) needs no registration: it is native Spark
SQL. Registered names are plain functions, so they survive into any
spark.sql() string; the scalar ones registered here are implemented as
native Column expressions wrapped by Spark's SQL-UDF bridge only where
a UDF is unavoidable (geometry).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from geowave_spark.geom.udfs import register_geom_functions


def register_all(spark: SparkSession) -> None:
    register_geom_functions(spark)

    # The GWQL text-predicate names are Spark SQL UDFs (RETURN <expr>):
    # Catalyst inlines the body into the caller's plan, so they stay
    # inside whole-stage codegen — no Python boundary, same plan as the
    # native Column-API twins below.
    for name, body in (
        ("strStartsWith", "s IS NOT NULL AND startswith(s, p)"),
        ("strEndsWith", "s IS NOT NULL AND endswith(s, p)"),
        ("strContains", "s IS NOT NULL AND contains(s, p)"),
    ):
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(s STRING, p STRING) "
            f"RETURNS BOOLEAN RETURN {body}"
        )


# ------------------------------------------------------ Column-API twins
# (the fast path: same names, native expressions, used by operators)


def str_starts_with(c, p):  # noqa: ANN001 - Column in, Column out
    return F.col(c).startswith(p) if isinstance(c, str) else c.startswith(p)


def str_ends_with(c, p):
    return F.col(c).endswith(p) if isinstance(c, str) else c.endswith(p)


def str_contains(c, p):
    return F.col(c).contains(p) if isinstance(c, str) else c.contains(p)


def bbox(x, y, x0: int, y0: int, x1: int, y1: int):
    """BBOX(x, y, box) — exact form (SpatialPredicates BBOX)."""
    return x.between(x0, x1) & y.between(y0, y1)


def bbox_loose(x, y, x0: int, y0: int, x1: int, y1: int, res: int):
    """BBOXLOOSE — coarse-constraint-only form: the bbox widened to the
    enclosing cell boundaries at ``res`` (skips exact refinement, may
    return extra rows near the edge — SpatialPredicates.java 'loose').
    Delegates the widening to spatial_query.loose_bounds so the two
    BBOXLOOSE implementations can never diverge (the bound is ceil-div;
    WORLD_X_U is not divisible by 2^res beyond res 9)."""
    from geowave_spark.operators.spatial_query import loose_bounds

    bx_lo, bx_hi = loose_bounds(x0, x1, res)
    by_lo, by_hi = loose_bounds(y0, y1, res)
    return x.between(bx_lo, bx_hi) & y.between(by_lo, by_hi)
