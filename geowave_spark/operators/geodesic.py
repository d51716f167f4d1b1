"""Geodesic (great-circle) distance semantics — the orthodromic option.

The reference's NN/kNN partitioner measures great-circle meters
(analytics/api/src/main/java/org/locationtech/geowave/analytic/
partitioner/OrthodromicDistancePartitioner.java; its neighborhood cells
are sized from an orthodromic distance, so a radius-in-meters query at
high latitude admits different rows than a planar-degrees one). The
engine's default metric is exact planar integer micro-degrees
(operators/knn.py); this module adds the geodesic option:

- ``haversine_m`` — great-circle meters between two µdeg points on the
  mean sphere (R = 6371008.8 m), as a native Column expression (sin/
  cos/asin stay inside whole-stage codegen; no Python in the hot
  path). The longitude difference enters through sin(Δλ/2), so the
  formula is dateline-wrap-correct by construction.
- ``knn_geodesic`` — exact kNN under the haversine metric via the same
  cell-ring expansion as planar knn(), with two geodesic corrections:
  candidate rings WRAP across the antimeridian (a nearest neighbor may
  sit on the other side of ±180°), and the ring-sufficiency gate uses
  a latitude-corrected safe radius (at high latitude a lon-cell is
  narrow in meters, so the same ring guarantees a smaller geodesic
  radius — the "cell-ring widened by latitude-corrected radii"
  requirement).
- ``dwithin_geodesic_col`` — radius-in-meters predicate for the
  DWITHIN/BEYOND surface.

Exactness contract: distances are IEEE doubles through libm trig; the
engine guarantees exact *candidate completeness* (integer ring logic)
and deterministic ordering ties broken by id. Two engines computing
the same closed-form haversine agree on ordering unless two distinct
points are within ~1 ulp of equidistant — not observable on the
hash-scattered fixtures (and tie-broken identically when truly equal).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geowave_spark.index.native import cell_col
from geowave_spark.index.zorder import cell_of_point

EARTH_R_M = 6371008.8  # IUGG mean earth radius, meters


def haversine_m(qx: Column, qy: Column, x: Column, y: Column) -> Column:
    """Great-circle meters between (qx, qy) and (x, y) µdeg points."""
    lat1 = F.radians(qy / F.lit(1e6))
    lat2 = F.radians(y / F.lit(1e6))
    dlat = F.radians((y - qy) / F.lit(2e6))
    dlon = F.radians((x - qx) / F.lit(2e6))
    a = F.pow(F.sin(dlat), F.lit(2.0)) + F.cos(lat1) * F.cos(lat2) * F.pow(
        F.sin(dlon), F.lit(2.0)
    )
    return F.lit(2.0 * EARTH_R_M) * F.asin(F.least(F.sqrt(a), F.lit(1.0)))


def haversine_m_sql(qx: str, qy: str, x: str, y: str) -> str:
    """DuckDB twin of haversine_m (same closed form)."""
    lat1 = f"radians({qy} / 1e6)"
    lat2 = f"radians({y} / 1e6)"
    dlat = f"radians(({y} - {qy}) / 2e6)"
    dlon = f"radians(({x} - {qx}) / 2e6)"
    a = (
        f"pow(sin({dlat}), 2.0) + cos({lat1}) * cos({lat2}) * "
        f"pow(sin({dlon}), 2.0)"
    )
    return f"2.0 * {EARTH_R_M} * asin(least(sqrt({a}), 1.0))"


def dwithin_geodesic_col(
    qx: Column, qy: Column, x: Column, y: Column, radius_m: float
) -> Column:
    """Great-circle DWITHIN: distance ≤ radius meters (BEYOND = ~)."""
    return haversine_m(qx, qy, x, y) <= F.lit(float(radius_m))


def kring_wrap(cell: int, res: int, ring: int) -> list[int]:
    """Cells within Chebyshev ``ring`` of ``cell`` — longitude WRAPS
    across the antimeridian (cyclic gx), latitude clamps at the domain
    edge: a great-circle neighbor may sit across ±180°, which the
    planar ring (clamped both axes) would miss. Delegates to the one
    ring enumerator (zorder.kring with wrap_x) so the two neighborhood
    shapes cannot drift apart."""
    from geowave_spark.index.zorder import kring

    return kring(cell, res, ring, wrap_x=True)


def safe_geo_radius_m(lat_q_deg: float, ring: int, res: int) -> float:
    """Guaranteed geodesic coverage of a ``ring``-cell neighborhood
    around a query at latitude ``lat_q_deg``: every point OUTSIDE the
    ring is provably farther than this many meters, so once a query
    holds ≥ k candidates within it, the exact top-k is in hand.

    A point outside the ring differs from the query by ≥ ring·span in
    latitude (meridional distance ≥ R·Δφ) OR in true angular longitude
    (the ring wraps, so cyclic cell distance ≥ ring+1 ⇒ angular lon
    separation ≥ ring·span); in the lon case both latitudes lie within
    the ring's lat band, bounding cos φ from below — the
    latitude-corrected radius. The guarantee is the min of the two
    escape routes; at extreme latitude the lon bound degrades toward 0
    and the ring ladder simply widens further (correctness preserved,
    the documented pole-adjacent cost)."""
    span_deg = 360.0 / (1 << res)
    d_deg = ring * span_deg
    vertical = EARTH_R_M * math.radians(d_deg)
    phi_bound = min(abs(lat_q_deg) + d_deg, 90.0)
    half = math.radians(min(d_deg, 180.0)) / 2.0
    horiz_sin = max(math.cos(math.radians(phi_bound)), 0.0) * math.sin(half)
    horizontal = 2.0 * EARTH_R_M * math.asin(min(horiz_sin, 1.0))
    return min(vertical, horizontal)


def knn_geodesic(
    spark: SparkSession,
    points: DataFrame,
    queries: list[tuple[int, int, int]],  # (query_id, qx_u, qy_u)
    k: int,
    res: int = 8,
    point_key: str = "event_id",
    max_ring: int | None = None,
) -> DataFrame:
    """Exact kNN under the great-circle metric (haversine meters on the
    mean sphere) — the OrthodromicDistancePartitioner semantics for the
    knn surface. Same ring-ladder plan as planar knn(): candidate cells
    broadcast, equi-join on cell, windowed rank; the differences are
    the wrap-aware ring, the haversine distance expression (native
    codegen), and the latitude-corrected sufficiency gate.

    Returns (query_id, point_key, rank) — rank by (haversine, id). The
    float distance itself is intentionally NOT an output column: ranks
    are integer-exact across engines, meters are only libm-exact.
    """
    n_side = 1 << res
    if max_ring is None:
        max_ring = n_side

    pts = points.withColumn(
        "_cell", cell_col(F.col("x_u"), F.col("y_u"), res)
    ).persist()

    n_pts = pts.count()
    density = max(n_pts / float(4**res), 1e-12)
    ring = 1
    while (2 * ring + 1) ** 2 * density < 2 * k and ring < max_ring:
        ring *= 2

    while True:
        cand_rows = []
        for qid, qx, qy in queries:
            c = cell_of_point(qx, qy, res)
            for cc in kring_wrap(c, res, ring):
                cand_rows.append((int(qid), int(qx), int(qy), int(cc)))
        qdf = F.broadcast(
            spark.createDataFrame(
                cand_rows, "query_id long, qx long, qy long, _cell long"
            )
        )
        j = pts.join(qdf, "_cell", "inner")
        cand = j.withColumn(
            "hav_m",
            haversine_m(F.col("qx"), F.col("qy"), F.col("x_u"), F.col("y_u")),
        )

        # per-query latitude-corrected safe radius for THIS ring
        safe = {
            q[0]: safe_geo_radius_m(q[2] / 1e6, ring, res) for q in queries
        }
        safe_df = F.broadcast(
            spark.createDataFrame(
                [(int(q), float(d)) for q, d in safe.items()],
                "query_id long, safe_m double",
            )
        )
        counts = {
            r["query_id"]: r["n"]
            for r in cand.join(safe_df, "query_id")
            .where(F.col("hav_m") <= F.col("safe_m"))
            .groupBy("query_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if all(counts.get(q[0], 0) >= k for q in queries) or ring >= max_ring:
            w = Window.partitionBy("query_id").orderBy("hav_m", point_key)
            out = (
                cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", point_key, "rank")
            )
            # materialize the small result, then release the keyed
            # table (same leak-avoidance as planar knn / knn_join)
            out = out.localCheckpoint(eager=True)
            pts.unpersist()
            return out
        ring *= 2


def nn_self_join_geodesic(
    points: DataFrame,
    max_dist_m: float,
    k: int,
    key: str = "event_id",
    left_filter: Column | None = None,
    broadcast_candidates: bool = True,
    explode_side: str = "auto",
    prune_offset: int | None = None,
) -> DataFrame:
    """All-pairs NN self-join with a radius in METERS — the geodesic
    twin of nn_join.nn_self_join, completing the orthodromic option
    across the NN surface (knn_geodesic / dwithin_geodesic_col / this).

    Same one-shuffle shape as the planar join (one side keyed by its
    own cell, the other exploded to a covering neighborhood, equi-join,
    exact refine, per-query window top-k) with the two geodesic
    corrections baked into the NEIGHBORHOOD: the resolution is
    picked so one cell's LATITUDE span covers max_dist (±1 row of
    cells suffices vertically — meridians don't shrink), while the
    LONGITUDE half-width is PER-ROW: kx(φ) = floor(D / (R·cosφ_worst)
    / span) + 1 cells, where φ_worst is the row's |lat| widened by the
    lat reach D/R — at high latitude a lon-cell is narrower in meters,
    so the ring widens exactly there instead of globally (the
    OrthodromicDistancePartitioner's latitude-aware neighborhood).
    Longitude neighbors WRAP across the antimeridian (pmod), latitude
    clamps. A pair can match at most one join key (single own cell ×
    array_distinct neighborhood cells), so no dedupe stage exists.

    `explode_side` picks which side carries the ring duplication:
    φ_worst bounds EITHER endpoint's latitude (it widens the row's
    |lat| by the full reach), so ring(q) ∋ cell(b) ⇔ ring(b) ∋ cell(q)
    and the pair set is identical either way — duplication should ride
    the SMALLER side. 'auto' explodes the filtered query side when
    `left_filter` is set (it is the small side by construction:
    ~|Q|·(2kx+3) built rows instead of ~|P|·(2kx+3)) and the candidate
    side otherwise; 'left'/'right' force it.

    ``prune_offset`` exposes the planar join's dense-cell distance-bound
    prune (see nn_join.nn_self_join) under the haversine metric. It
    defaults OFF here, unlike the planar join: measured at sf0.1 (both
    the uniform fixture and a planted 600 km hotspot holding the whole
    corpus) the pre-pass never paid for itself, because the geodesic
    join's cost is dominated by the haversine refine over the coarse
    candidates — which the bound filter runs AFTER — not by the top-k
    sort the prune shrinks. Pass 5 for workloads where a few cells hold
    millions of rows each and the sort genuinely dominates.

    Returns (a_id, b_id, rank) — rank by (haversine, b_id); the float
    meters never leave the plan (integer-exact across engines)."""
    dist_lat_deg = math.degrees(float(max_dist_m) / EARTH_R_M)
    dist_lat_u = max(int(math.ceil(dist_lat_deg * 1e6)), 1)
    from geowave_spark.operators.nn_join import res_for_distance

    res = res_for_distance(dist_lat_u)
    n_side = 1 << res
    span_deg = 360.0 / n_side

    from geowave_spark import LAT_OFF_U, LON_OFF_U
    from geowave_spark.index.native import grid_coord_col

    def packed(gx, gy):
        return F.shiftleft(gx, 32).bitwiseOR(gy)

    def clamp_y(g):
        return F.least(F.greatest(g, F.lit(0)), F.lit(n_side - 1))

    # per-row longitude half-width in cells (latitude-corrected ring);
    # unresolved refs — bind against whichever side carries the explode
    phi_worst = F.least(
        F.abs(F.col("y_u")) / F.lit(1e6) + F.lit(dist_lat_deg), F.lit(89.9999)
    )
    lon_deg_needed = F.lit(dist_lat_deg) / F.greatest(
        F.cos(F.radians(phi_worst)), F.lit(1e-9)
    )
    kx = F.least(
        F.floor(lon_deg_needed / F.lit(span_deg)).cast("int") + F.lit(1),
        F.lit(n_side // 2),
    )
    gx0 = grid_coord_col(F.col("x_u"), res, LON_OFF_U)
    gy0 = grid_coord_col(F.col("y_u"), res, LAT_OFF_U)
    ring = F.array_distinct(
        F.flatten(
            F.array(
                *[
                    F.transform(
                        F.sequence(-kx, kx),
                        lambda dx: packed(
                            F.pmod(gx0 + dx, F.lit(n_side)), clamp_y(gy0 + F.lit(dy))
                        ),
                    )
                    for dy in (-1, 0, 1)
                ]
            )
        )
    )
    own = packed(gx0, gy0)

    side = explode_side
    if side == "auto":
        side = "left" if left_filter is not None else "right"
    if side not in ("left", "right"):
        raise ValueError(f"explode_side must be auto/left/right, got {side!r}")

    q = points if left_filter is None else points.where(left_filter)
    a_cell = F.explode(ring) if side == "left" else own
    b_cell = own if side == "left" else F.explode(ring)
    left = q.select(
        F.col(key).alias("a_id"),
        F.col("x_u").alias("ax"),
        F.col("y_u").alias("ay"),
        a_cell.alias("_cell"),
    )
    right = points.select(
        F.col(key).alias("b_id"),
        F.col("x_u").alias("bx"),
        F.col("y_u").alias("by"),
        b_cell.alias("_cell"),
    )
    # spread the STREAM side across the cluster before the broadcast
    # probe: a broadcast join inherits the stream side's partitioning,
    # and a single parquet file lands in one input split — without this
    # the whole probe + haversine refine runs as ONE task regardless of
    # which side carries the ring duplication (same hazard the planar
    # nn_self_join guards against at nn_join.py:143)
    # the explicit count matters: the rows are narrow (id + 2 coords)
    # so AQE's byte-targeted coalescing would fold the shuffle down to
    # ~2 partitions, serializing the CPU-heavy haversine refine — a
    # user-numbered repartition is exempt from coalescing
    n_tasks = points.sparkSession.sparkContext.defaultParallelism
    if side == "left":
        right = right.repartition(n_tasks, "b_id")
        if broadcast_candidates:
            left = F.broadcast(left)
    else:
        left = left.repartition(n_tasks, "a_id")
        if broadcast_candidates:
            right = F.broadcast(right)

    hav = haversine_m(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    cand = (
        left.join(right, "_cell")
        .where(F.col("a_id") != F.col("b_id"))
        .withColumn("_hav", hav)
        .where(F.col("_hav") <= F.lit(float(max_dist_m)))
        .select("a_id", "_hav", "b_id")
    )

    if prune_offset:
        # dense-cell distance-bound prune, the geodesic twin of
        # nn_join.nn_self_join's pre-pass: join queries to candidates in
        # a 3×3 neighborhood at a resolution ``prune_offset`` levels
        # FINER and take the k-th smallest haversine found there as a
        # per-query upper bound on the true k-th-NN distance. The bound
        # is valid for ANY candidate subset (a subset's k-th smallest ≥
        # the full set's), so the fine ring needs no radius coverage —
        # the planar _ring_exploded (clamped, unwrapped) is reused
        # as-is: clamping near the dateline only shrinks the subset,
        # weakening but never invalidating the bound. Queries with < k
        # fine candidates fall back to max_dist (no prune — exactly the
        # sparse queries whose coarse candidate sets are small anyway).
        from geowave_spark.operators.nn_join import _ring_exploded

        fres = min(res + prune_offset, 30)
        max_m = F.lit(float(max_dist_m))
        fleft = q.select(
            F.col(key).alias("a_id"),
            F.col("x_u").alias("ax"),
            F.col("y_u").alias("ay"),
            cell_col(F.col("x_u"), F.col("y_u"), fres).alias("_fcell"),
        ).repartition("a_id")
        fright = _ring_exploded(points, fres, key).withColumnRenamed(
            "_cell", "_fcell"
        )
        if broadcast_candidates:
            fright = F.broadcast(fright)
        bounds = (
            fleft.join(fright, "_fcell")
            .where(F.col("a_id") != F.col("b_id"))
            .withColumn("_fhav", hav)
            .where(F.col("_fhav") <= max_m)
            .groupBy("a_id")
            .agg(
                F.coalesce(
                    F.try_element_at(
                        F.array_sort(F.collect_list("_fhav")), F.lit(k)
                    ),
                    max_m,
                ).alias("_bound")
            )
        )
        # one narrow row per query point — broadcast in the same size
        # regime as the candidate side, shuffle-join beyond it
        if broadcast_candidates:
            bounds = F.broadcast(bounds)
        cand = (
            cand.join(bounds, "a_id", "left")
            .where(F.col("_hav") <= F.coalesce(F.col("_bound"), max_m))
            .select("a_id", "_hav", "b_id")
        )

    w = Window.partitionBy("a_id").orderBy("_hav", "b_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("a_id", "b_id", "rank")
    )


def knn_geodesic_brute(
    spark: SparkSession,
    points: DataFrame,
    queries: list[tuple[int, int, int]],
    k: int,
    point_key: str = "event_id",
) -> DataFrame:
    """Brute-force oracle twin (cross join) for tests."""
    qdf = F.broadcast(
        spark.createDataFrame(
            [(int(q), int(x), int(y)) for q, x, y in queries],
            "query_id long, qx long, qy long",
        )
    )
    w = Window.partitionBy("query_id").orderBy("hav_m", point_key)
    return (
        points.crossJoin(qdf)
        .withColumn(
            "hav_m",
            haversine_m(F.col("qx"), F.col("qy"), F.col("x_u"), F.col("y_u")),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", point_key, "rank")
    )
