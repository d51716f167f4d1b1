"""geowave_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Recreates the query semantics of rfecher/geowave (multi-dimensional SFC
indexing, bbox/polygon range decomposition, exact geometric refinement,
spatial join, kNN, raster tiling/merge/KDE) as idiomatic Spark DataFrame
operators. Reference semantics are cited per-module as
``/root/reference/<path>:<line>``; no reference code is copied — the
execution strategy is Spark-first (Catalyst plans, native column
expressions for the hot path, Arrow-batched pandas UDFs for geometry).

Coordinate convention
---------------------
Canonical coordinates are **integer micro-degrees** (``x_u = lon * 1e6``,
``y_u = lat * 1e6`` as BIGINT) so that index assignment, refinement and
the DuckDB correctness oracles are bit-exact across engines. Geometry
payload columns are WKB binary (the reference's own PySpark convention:
analytics/pyspark/src/main/python/geowave_pyspark/types.py:16-33).
"""

__version__ = "0.1.0"

X_SCALE = 1_000_000  # micro-degrees per degree
WORLD_X_U = 360_000_000  # full longitude span in micro-degrees
WORLD_Y_U = 360_000_000  # we index lat on the same +-180 domain for squareness
LON_OFF_U = 180_000_000
LAT_OFF_U = 180_000_000

MAX_RES = 31  # bits per dimension; 2*31 = 62-bit Morton key fits a signed long
