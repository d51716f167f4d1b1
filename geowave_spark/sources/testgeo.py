"""Deterministic geo-coordinate derivation over the driver's testdata.

The sandbox testdata (TPC-H-ish tables, TESTDATA.md) carries no spatial
columns, so the engine derives **integer micro-degree** coordinates from
stable keys with pure integer arithmetic. The same formulas exist three
ways — Spark Column, ANSI-SQL text (DuckDB oracle), numpy — and are
bit-exact across all three, which is what makes the driver's
value-hash correctness gate meaningful for spatial operators.

Knuth multiplicative hashing (public domain constant 2654435761) gives
a uniform scatter; a deliberate 20%% "hotspot" mode concentrates rows
into 5 dense clusters to exercise skew handling (FIXTURES.md §1; the
salting analog of core/index/.../simple/HashKeyIndexStrategy.java:44-70).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 2654435761  # Knuth multiplicative hash constant
K2 = 2246822519  # xxhash prime (public)
LON_SPAN = 360_000_000
LAT_SPAN = 170_000_000  # keep clear of the poles: [-85, 85]
HOT_N = 5
HOT_RADIUS_U = 500_000  # 0.5 degrees

# hotspot centers (micro-degrees), fixed
HOT_CX = [-73_950_000, 2_350_000, 139_700_000, -118_250_000, 77_200_000]
HOT_CY = [40_700_000, 48_850_000, 35_650_000, 34_050_000, 28_600_000]


def _scatter_exprs(key: str) -> tuple[str, str]:
    """SQL text for the uniform scatter of a BIGINT key column."""
    x = f"((({key} * {K1}) % {LON_SPAN}) + {LON_SPAN}) % {LON_SPAN} - {LON_SPAN // 2}"
    y = f"((({key} * {K2}) % {LAT_SPAN}) + {LAT_SPAN}) % {LAT_SPAN} - {LAT_SPAN // 2}"
    return x, y


def _hot_exprs(key: str) -> tuple[str, str]:
    """SQL text: rows with key%5==0 snap near one of 5 hotspot centers.
    The cluster index is (key//5)%5 — NOT key%5, which is always 0 for
    the selected keys and would degenerate all hot rows into a single
    cluster."""
    hx = f"CASE (({key} // 5) % {HOT_N})"
    hy = f"CASE (({key} // 5) % {HOT_N})"
    for i in range(HOT_N):
        hx += f" WHEN {i} THEN {HOT_CX[i]}"
        hy += f" WHEN {i} THEN {HOT_CY[i]}"
    hx += " END"
    hy += " END"
    jx = f"(({key} * {K2}) % {2 * HOT_RADIUS_U}) - {HOT_RADIUS_U}"
    jy = f"(({key} * {K1}) % {2 * HOT_RADIUS_U}) - {HOT_RADIUS_U}"
    # keys are non-negative in testdata so the jitter mod stays in range
    return f"({hx} + {jx})", f"({hy} + {jy})"


def xy_sql(key: str) -> tuple[str, str]:
    """(x_u, y_u) SQL expressions for a non-negative BIGINT key column.

    key % 5 == 0 → hotspot cluster member (20%% of rows, skew fixture);
    otherwise uniform scatter.
    """
    sx, sy = _scatter_exprs(key)
    hx, hy = _hot_exprs(key)
    x = f"(CASE WHEN ({key} % 5) = 0 THEN {hx} ELSE {sx} END)"
    y = f"(CASE WHEN ({key} % 5) = 0 THEN {hy} ELSE {sy} END)"
    return x, y


def xy_cols(key: Column) -> tuple[Column, Column]:
    """Same derivation as Spark Columns (pure JVM integer arithmetic)."""
    key = key.cast("long")
    sx = F.pmod(key * F.lit(K1), F.lit(LON_SPAN)) - F.lit(LON_SPAN // 2)
    sy = F.pmod(key * F.lit(K2), F.lit(LAT_SPAN)) - F.lit(LAT_SPAN // 2)
    m = F.pmod(F.call_function("div", key, F.lit(5)), F.lit(HOT_N)).cast("int")
    hx_c = F.element_at(F.array(*[F.lit(v) for v in HOT_CX]), m + 1)
    hy_c = F.element_at(F.array(*[F.lit(v) for v in HOT_CY]), m + 1)
    hx = hx_c + (key * F.lit(K2)) % F.lit(2 * HOT_RADIUS_U) - F.lit(HOT_RADIUS_U)
    hy = hy_c + (key * F.lit(K1)) % F.lit(2 * HOT_RADIUS_U) - F.lit(HOT_RADIUS_U)
    is_hot = F.pmod(key, F.lit(5)) == 0
    return (
        F.when(is_hot, hx).otherwise(sx).alias("x_u"),
        F.when(is_hot, hy).otherwise(sy).alias("y_u"),
    )


def xy_numpy(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    key = key.astype(np.int64)
    sx = (key * K1) % LON_SPAN - LON_SPAN // 2
    sy = (key * K2) % LAT_SPAN - LAT_SPAN // 2
    m = (key // 5) % HOT_N
    hx = np.take(HOT_CX, m) + (key * K2) % (2 * HOT_RADIUS_U) - HOT_RADIUS_U
    hy = np.take(HOT_CY, m) + (key * K1) % (2 * HOT_RADIUS_U) - HOT_RADIUS_U
    hot = key % 5 == 0
    return np.where(hot, hx, sx), np.where(hot, hy, sy)


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's canonical point table: events + derived (x_u, y_u)."""
    x, y = xy_cols(F.col("event_id"))
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value", x, y
    )


def events_points_sql(sf_dir: str) -> str:
    """DuckDB FROM-clause subquery equivalent of events_points."""
    x, y = xy_sql("event_id")
    return (
        f"(SELECT event_id, ts, user_id, event_type, value, "
        f"{x} AS x_u, {y} AS y_u FROM events)"
    )


def customer_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-side fixture: one axis-aligned box per customer, centered
    at the derived point, half-width 0.2°–2.2° from the key (regions
    analog of FIXTURES.md §2)."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    x, y = xy_cols(F.col("c_custkey"))
    hw = (F.pmod(F.col("c_custkey").cast("long") * F.lit(K1), F.lit(2_000_000)) + F.lit(200_000)).alias("hw_u")
    return df.select("c_custkey", "c_mktsegment", x, y, hw).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("x_u") - F.col("hw_u")).alias("x_lo"),
        (F.col("y_u") - F.col("hw_u")).alias("y_lo"),
        (F.col("x_u") + F.col("hw_u")).alias("x_hi"),
        (F.col("y_u") + F.col("hw_u")).alias("y_hi"),
    )


OCT_R_MOD = 3_000_000
OCT_R_MIN = 500_000


def supplier_octagons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex-polygon-side fixture: one octagon per supplier — center at
    the derived point, radius 0.5°–3.5° from the key, diagonal offset
    a = r*707//1000 (integer cos45 approximation, keeps every vertex and
    every half-plane test in exact BIGINT arithmetic)."""
    df = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    x, y = xy_cols(F.col("s_suppkey"))
    r = (
        F.pmod(F.col("s_suppkey").cast("long") * F.lit(K2), F.lit(OCT_R_MOD))
        + F.lit(OCT_R_MIN)
    ).alias("r")
    out = df.select("s_suppkey", x, y, r)
    return out.select(
        "s_suppkey",
        F.col("x_u").alias("cx"),
        F.col("y_u").alias("cy"),
        "r",
        F.call_function("div", F.col("r") * 707, F.lit(1000)).alias("a"),
    )


def supplier_octagons_sql(sf_dir: str) -> str:
    x, y = xy_sql("s_suppkey")
    r = f"(((s_suppkey * {K2}) % {OCT_R_MOD}) + {OCT_R_MIN})"
    return (
        f"(SELECT s_suppkey, {x} AS cx, {y} AS cy, {r} AS r, "
        f"({r} * 707) // 1000 AS a FROM supplier)"
    )


def octagon_vertices(cx, cy, r, a):
    """CCW vertex list (expressions or ints) starting due east."""
    return [
        (cx + r, cy),
        (cx + a, cy + a),
        (cx, cy + r),
        (cx - a, cy + a),
        (cx - r, cy),
        (cx - a, cy - a),
        (cx, cy - r),
        (cx + a, cy - a),
    ]


def octagon_vertices_sql(cx: str, cy: str, r: str, a: str) -> list[tuple[str, str]]:
    """SQL-text twin of octagon_vertices (string expressions)."""
    return [
        (f"({cx} + {r})", cy),
        (f"({cx} + {a})", f"({cy} + {a})"),
        (cx, f"({cy} + {r})"),
        (f"({cx} - {a})", f"({cy} + {a})"),
        (f"({cx} - {r})", cy),
        (f"({cx} - {a})", f"({cy} - {a})"),
        (cx, f"({cy} - {r})"),
        (f"({cx} + {a})", f"({cy} - {a})"),
    ]


def customer_boxes_sql(sf_dir: str) -> str:
    x, y = xy_sql("c_custkey")
    hw = f"(((c_custkey * {K1}) % 2000000) + 200000)"
    return (
        f"(SELECT c_custkey, c_mktsegment, "
        f"{x} - {hw} AS x_lo, {y} - {hw} AS y_lo, "
        f"{x} + {hw} AS x_hi, {y} + {hw} AS y_hi FROM customer)"
    )
