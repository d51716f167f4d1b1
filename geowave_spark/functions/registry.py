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

    # Spark has no SQL-macro DDL, so the GWQL text-predicate *names* are
    # registered as scalar python UDFs purely for SQL-text compatibility;
    # hot paths use the native Column-API twins below instead.
    spark.udf.register("strStartsWith", lambda s, p: s is not None and s.startswith(p), "boolean")
    spark.udf.register("strEndsWith", lambda s, p: s is not None and s.endswith(p), "boolean")
    spark.udf.register("strContains", lambda s, p: s is not None and p in s, "boolean")


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
    return extra rows near the edge — SpatialPredicates.java 'loose')."""
    from geowave_spark import LAT_OFF_U, LON_OFF_U, WORLD_X_U

    n = 1 << res
    span = WORLD_X_U

    def widen_lo(v: int, off: int) -> int:
        g = (v + off) * n // span
        return g * span // n - off

    def widen_hi(v: int, off: int) -> int:
        g = (v + off) * n // span
        return (g + 1) * span // n - off - 1

    return x.between(widen_lo(x0, LON_OFF_U), widen_hi(x1, LON_OFF_U)) & y.between(
        widen_lo(y0, LAT_OFF_U), widen_hi(y1, LAT_OFF_U)
    )
