"""XZ-order extent indexing — exactly ONE key per extent, no duplication.

Parity target: GeoWave's default spatial index stores *extents* on an
XZ-order curve while points go on a full-precision curve
(XZHierarchicalIndexStrategy,
core/index/src/main/java/org/locationtech/geowave/core/index/sfc/xz/XZHierarchicalIndexStrategy.java:79-109;
curve: sfc/xz/XZOrderSFC.java). The XZ idea (Boehm et al., "XZ-Ordering:
A Space-Filling Curve for Objects with Spatial Extension", SSD'99): an
extent is keyed by the cell of its lower-left corner at the finest
resolution where the 2x-"enlarged" cell (the 2x2 block of cells anchored
there) still covers the whole extent. One key per extent — unlike the
tiered strategy, which duplicates an entry across decomposed cell ranges
(TieredSFCIndexStrategy.decomposeRangesForEntry:392-407).

Why this matters at 100 TB: the tiling scheme of
operators/spatial_join.boxes_with_cells explodes each extent to ≤4
cells, and a generic polyfill explodes big extents to *many* cells —
write amplification on the stored side. XZ keeps the extent table at
one row per extent (storage = input size, no dedupe ever needed) and
moves bounded duplication to the probe side: a point probes exactly
4 anchor candidates per resolution present. Queries stay sargable:
the coarse constraint is a per-resolution (res, ax, ay) range predicate
that Catalyst pushes into the parquet scan.

Key rule (integer-exact, matches the DuckDB-oracle arithmetic):
  fit(r): gx(x_hi, r) <= gx(x_lo, r) + 1  AND  gy(y_hi, r) <= gy(y_lo, r) + 1
  res    = max { r <= r_max : fit(r) }     (fit is monotone: finer ⇒ tighter,
                                            r=0 always fits — one world cell)
  key    = (res, ax, ay) with ax = gx(x_lo, res), ay = gy(y_lo, res)

Coverage invariant: the enlarged cell [ax, ax+2) x [ay, ay+2) at ``res``
contains the extent's bbox, so any geometry intersecting the extent
intersects the enlarged cell — the basis of both the query and the join
candidate enumeration below.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geowave_spark import LAT_OFF_U, LON_OFF_U
from geowave_spark.index.native import grid_coord_col
from geowave_spark.index.zorder import grid_coord

R_MAX_DEFAULT = 12  # finest XZ resolution (4096x4096 enlarged-cell grid)


def _shr(g: Column, sh: Column) -> Column:
    """Variable right-shift (exact floor-div by 2^sh for the nonnegative
    grid coords used here). A single ShiftRight expression — NOT a
    literal-array element_at lookup: under ANSI mode each element_at
    carries an out-of-range error branch in codegen, and Catalyst
    re-inlines the whole derived-key tree at every reference, which
    previously blew the generated filter past the JVM's 64 KB method
    limit (whole-stage codegen fell back to interpreted)."""
    return F.call_function("shiftright", g, sh)


def _min_fit_shift(g0: Column, g1: Column) -> Column:
    """Smallest sh with (g1 >> sh) <= (g0 >> sh) + 1, in closed form.

    fit(sh) ⟺ (g1 - g0) + (g0 mod 2^sh) < 2^(sh+1), so sh is necessarily
    ≥ floor(log2(span)) and floor(log2(span)) + 1 always suffices — one
    candidate + one alignment check instead of a 13-branch when-chain
    (which Catalyst would inline into every downstream predicate branch,
    exploding the expression tree and codegen time). log2 on ints
    < 2^29 is exact in double."""
    span = g1 - g0
    shc = F.when(span <= 1, F.lit(0)).otherwise(
        F.floor(F.log2(span.cast("double"))).cast("int")
    )
    fits = _shr(g1, shc) <= _shr(g0, shc) + 1
    return F.when(fits, shc).otherwise(shc + 1)


def xz_keys(
    boxes: DataFrame,
    r_max: int = R_MAX_DEFAULT,
    cols: tuple[str, str, str, str] = ("x_lo", "y_lo", "x_hi", "y_hi"),
) -> DataFrame:
    """Append the XZ key columns (res, ax, ay) — one row per extent,
    pure JVM codegen. Grid coords are computed once at r_max and
    coarsened by one exact floor-div; res = r_max - max(sh_x, sh_y)
    with per-axis minimal shifts from the closed form above."""
    x_lo, y_lo, x_hi, y_hi = (F.col(c) for c in cols)

    def staged(df: DataFrame, **exprs: Column) -> DataFrame:
        # One-element inline(array(struct(...))) = a Generate node: each
        # expression is evaluated ONCE and downstream plans (and the
        # next stage) reference plain attributes. Plain withColumn
        # projections would be collapsed/pushed-through by Catalyst,
        # re-inlining each derivation at every reference — over an
        # expression-defined input that blew the generated filter past
        # the JVM's 64 KB method limit (codegen fell back to
        # interpreted). The Generate itself stays inside whole-stage
        # codegen, so the barrier costs nothing at runtime.
        return df.select(
            "*",
            F.inline(F.array(F.struct(*[c.alias(n) for n, c in exprs.items()]))),
        )

    df = staged(
        boxes,
        _gx0=grid_coord_col(x_lo, r_max, LON_OFF_U),
        _gx1=grid_coord_col(x_hi, r_max, LON_OFF_U),
        _gy0=grid_coord_col(y_lo, r_max, LAT_OFF_U),
        _gy1=grid_coord_col(y_hi, r_max, LAT_OFF_U),
    )
    df = staged(
        df,
        _sh=F.greatest(
            _min_fit_shift(F.col("_gx0"), F.col("_gx1")),
            _min_fit_shift(F.col("_gy0"), F.col("_gy1")),
        ),
    )
    df = staged(
        df,
        res=F.lit(r_max) - F.col("_sh"),
        ax=_shr(F.col("_gx0"), F.col("_sh")),
        ay=_shr(F.col("_gy0"), F.col("_sh")),
    )
    return df.drop("_gx0", "_gx1", "_gy0", "_gy1", "_sh")


def xz_query_predicate(
    qx0: int, qy0: int, qx1: int, qy1: int, r_max: int = R_MAX_DEFAULT
) -> Column:
    """Coarse XZ constraint for a query bbox: per resolution, the anchors
    whose enlarged cell can intersect the query — ax in
    [gx(qx0)-1, gx(qx1)], ay in [gy(qy0)-1, gy(qy1)]. A disjunction of
    per-res BETWEEN ranges (sargable → parquet row-group pruning on a
    table laid out by (res, ax, ay); the getQueryRanges analog,
    TieredSFCIndexStrategy.java:109-145, with ranges enumerated
    driver-side like the reference's decomposition)."""
    conds = []
    for r in range(r_max + 1):
        conds.append(
            (F.col("res") == r)
            & F.col("ax").between(int(grid_coord(qx0, r)) - 1, int(grid_coord(qx1, r)))
            & F.col("ay").between(int(grid_coord(qy0, r)) - 1, int(grid_coord(qy1, r)))
        )
    return reduce(or_, conds)


def _xz_query_predicate_compact(
    qx0: int, qy0: int, qx1: int, qy1: int, r_max: int = R_MAX_DEFAULT
) -> Column:
    """Same constraint as xz_query_predicate but phrased at the r_max
    grid — used when (res, ax, ay) are derived expressions rather than
    stored columns (no pushdown is possible on derived columns anyway,
    and the 13-branch disjunction would inline the key expressions 13x).

    Per axis, with sh = r_max - res and gq = the query bounds' r_max
    grid coords (constants): ax <= gx(qx1, res) ⟺ ax<<sh <= gq1, and
    ax >= gx(qx0, res) - 1 ⟺ (ax+2)<<sh > gq0 (exact for nonnegative
    ints). Two shifts and two comparisons per axis — no element_at
    (whose ANSI out-of-range error branch per reference helped push the
    previous form past the 64 KB codegen limit)."""
    sh = F.lit(r_max) - F.col("res")
    gqx0, gqx1 = int(grid_coord(qx0, r_max)), int(grid_coord(qx1, r_max))
    gqy0, gqy1 = int(grid_coord(qy0, r_max)), int(grid_coord(qy1, r_max))

    def shl(g: Column) -> Column:
        return F.call_function("shiftleft", g, sh)

    return (
        (shl(F.col("ax")) <= gqx1)
        & (shl(F.col("ax") + 2) > gqx0)
        & (shl(F.col("ay")) <= gqy1)
        & (shl(F.col("ay") + 2) > gqy0)
    )


def xz_extent_query(
    boxes: DataFrame,
    qx0: int,
    qy0: int,
    qx1: int,
    qy1: int,
    r_max: int = R_MAX_DEFAULT,
    keyed: bool = False,
) -> DataFrame:
    """Extents intersecting the query bbox: coarse XZ key ranges, then
    exact bbox-intersect refinement (native comparisons). ``keyed=True``
    skips re-deriving keys when ``boxes`` already carries (res, ax, ay)
    — the stored-table path."""
    if keyed:
        b = boxes
        coarse = xz_query_predicate(qx0, qy0, qx1, qy1, r_max)  # sargable
    else:
        b = xz_keys(boxes, r_max)
        coarse = _xz_query_predicate_compact(qx0, qy0, qx1, qy1, r_max)
    return b.where(coarse).where(
        (F.col("x_lo") <= qx1)
        & (F.col("x_hi") >= qx0)
        & (F.col("y_lo") <= qy1)
        & (F.col("y_hi") >= qy0)
    )


def xz_box_point_join(
    points: DataFrame,
    boxes: DataFrame,
    how: str = "inner",
    point_key: str = "event_id",
    box_key: str = "c_custkey",
    r_max: int = R_MAX_DEFAULT,
    broadcast_boxes: bool | None = None,
) -> DataFrame:
    """Point-in-extent join through the XZ index: the extent side stays
    ONE row per extent; each point probes the 4 anchor candidates
    (gx-dx, gy-dy), dx,dy in {0,1}, at every resolution actually present
    on the extent side (tiny distinct-res dimension, broadcast — the
    tier-occupancy pruning analog of TierIndexMetaData:543-642).

    A (point, box) pair can match at most once by construction (one res
    per box; the 4 probe anchors at that res are distinct), so no dedupe
    stage exists — same argument as box_point_join's no-DedupeFilter
    note. Output forms: 'inner' pairs, 'leftsemi'/'leftanti' per-side
    (TieredSpatialJoin.java:362-378)."""
    b = xz_keys(boxes, r_max)
    if broadcast_boxes is None or broadcast_boxes:
        b = F.broadcast(b)
    res_dim = b.select("res").distinct()

    pts = points.withColumn(
        "_pgx", grid_coord_col(F.col("x_u"), r_max, LON_OFF_U)
    ).withColumn("_pgy", grid_coord_col(F.col("y_u"), r_max, LAT_OFF_U))
    keyed = pts.crossJoin(F.broadcast(res_dim.withColumnRenamed("res", "_pres")))
    sh = F.lit(r_max) - F.col("_pres")
    keyed = (
        keyed.withColumn("_gx", _shr(F.col("_pgx"), sh))
        .withColumn("_gy", _shr(F.col("_pgy"), sh))
        .withColumn("_dx", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(0), F.lit(1))))
    )

    j = keyed.join(
        b,
        (F.col("_pres") == b["res"])
        & (F.col("_gx") - F.col("_dx") == b["ax"])
        & (F.col("_gy") - F.col("_dy") == b["ay"]),
        "inner",
    ).where(
        F.col("x_u").between(F.col("x_lo"), F.col("x_hi"))
        & F.col("y_u").between(F.col("y_lo"), F.col("y_hi"))
    )
    matched = j.select(point_key, box_key)

    if how == "inner":
        return matched
    if how in ("leftsemi", "leftanti"):
        return points.join(matched.select(point_key), point_key, how)
    raise ValueError(how)
