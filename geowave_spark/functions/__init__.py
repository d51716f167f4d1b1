"""SQL function surface (the GWQL-collapse layer).

The reference exposes two function surfaces: 12 Geom* Spark SQL UDFs
(analytics/spark/.../udf/UDFRegistrySPI.java:14-27) and the GWQL
scalar/predicate functions (core/store/.../gwql/function/*;
core/geotime/.../gwql/SpatialPredicates.java:22-250). In this engine
GWQL collapses into ``spark.sql`` — ABS/CONCAT/arithmetic/casts are
native Spark, and the spatial/temporal/text predicates are registered
here so a user can write them directly in SQL text.
"""

from geowave_spark.functions.registry import register_all

__all__ = ["register_all"]
