"""Aspect-ratio bucketed batch assembly — the batching step of an
image-training pipeline over a variable-size corpus.

Diffusion / VLM training batches must share one pixel shape, so
web-scale image pipelines (a) snap every image to the nearest
aspect-ratio bucket from a fixed ladder, then (b) pack each bucket's
images into fixed-size batches, dropping the per-bucket remainder.
Both steps here are deterministic functions of the row id, so any
shard or re-run reproduces identical batches (the resumability stance
of operators/sampling.py).

Exactness: the bucket argmin compares |w/h - bw/bh| as
``abs(w*bh - h*bw) / (h*bh)`` — integer products (exact in double)
followed by one correctly-rounded IEEE division — so the DuckDB
oracle reproduces the assignment bit-for-bit with no transcendental
(log-space) scoring to drift across engines.

Scale shape: bucket assignment is a pure codegen expression (the
constant ladder unrolls into an array_min over (score, bucket)
structs — no join, no window, no shuffle). Packing shuffles once on
(bucket, shard): ``shards`` splits every
bucket's window into independent hash-sharded partitions, because at
10^12 rows a handful of global per-bucket windows would serialize the
sort — per-(bucket, shard) batch ids keep every partition's packing
local and the whole stage embarrassingly parallel. Batches never span
shards, which training does not care about (any partition of the
corpus into fixed-size same-bucket batches is valid).

Reference scope: the reference has no training-batch surface; this is
the LLM-pipeline extension the brief's training-data section calls
for (nearest analog: RasterDataAdapter's fixed tile grid — the same
"snap variable inputs to a fixed shape ladder" move, applied to batch
geometry instead of tile geometry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.operators.dedup import _h64

# default ladder spans tall 1:7 panels through wide 9:1 strips —
# chosen to bracket the var-dims fixture (16..144 x 16..112)
BUCKETS_DEFAULT = [
    (16, 112),
    (16, 64),
    (32, 48),
    (32, 32),
    (48, 32),
    (64, 16),
    (112, 16),
]


def aspect_bucket_assign(
    df: DataFrame,
    buckets: list[tuple[int, int]] | None = None,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Snap every image to the nearest-aspect bucket (exact integer
    scoring, ties to the narrowest bucket). Adds bucket_w / bucket_h."""
    buckets = BUCKETS_DEFAULT if buckets is None else buckets
    if not buckets:
        raise ValueError("need at least one bucket")
    # the ladder is a compile-time constant, so the argmin is a pure
    # expression: array_min over (score, bw, bh) structs (lexicographic
    # struct comparison = ORDER BY score, bw, bh LIMIT 1). Zero joins,
    # zero windows, zero shuffles — stays in whole-stage codegen.
    entries = [
        F.struct(
            (
                F.abs(F.col(w_col) * bh - F.col(h_col) * bw)
                / (F.col(h_col) * bh).cast("double")
            ).alias("s"),
            F.lit(bw).alias("bucket_w"),
            F.lit(bh).alias("bucket_h"),
        )
        for bw, bh in buckets
    ]
    best = F.array_min(F.array(*entries))
    return df.withColumn("bucket_w", best["bucket_w"]).withColumn(
        "bucket_h", best["bucket_h"]
    )


def pack_batches(
    assigned: DataFrame,
    batch_size: int,
    shards: int = 1,
    id_col: str = "image_id",
    salt: int = 13,
) -> DataFrame:
    """Pack bucket-assigned images into complete fixed-size batches.

    Within each (bucket, shard) the draw order is the salted portable
    hash (dedup._h64) of the id — an unbiased deterministic shuffle —
    and rows beyond the last complete batch are dropped (training
    discards ragged remainders). Returns one row per kept image:
    (id, bucket_w, bucket_h, shard, batch_idx, slot)."""
    if batch_size <= 0 or shards <= 0:
        raise ValueError(f"need batch_size > 0 and shards > 0, got {batch_size=} {shards=}")
    key = _h64(F.col(id_col).cast("string"), salt)
    shard = F.pmod(_h64(F.col(id_col).cast("string"), salt + 1), F.lit(shards))
    part = ["bucket_w", "bucket_h", "_shard"]
    w = Window.partitionBy(*part).orderBy(key.asc(), F.col(id_col).asc())
    out = (
        assigned.withColumn("_shard", shard)
        .withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_n", F.count("*").over(Window.partitionBy(*part)))
    )
    return (
        out.where(F.col("_rn") < F.col("_n") - F.col("_n") % batch_size)
        .select(
            id_col,
            "bucket_w",
            "bucket_h",
            F.col("_shard").cast("int").alias("shard"),
            (F.col("_rn") / batch_size).cast("int").alias("batch_idx"),
            F.pmod(F.col("_rn"), F.lit(batch_size)).cast("int").alias("slot"),
        )
    )


def aspect_batches_sql(
    n: int,
    batch_size: int,
    shards: int = 1,
    buckets: list[tuple[int, int]] | None = None,
    dims_sql: tuple[str, str] = ("16 * (1 + (i * 7) % 9)", "16 * (1 + (i * 13) % 7)"),
    salt: int = 13,
) -> str:
    """DuckDB twin over the arithmetic var-dims fixture: re-derives
    dims from the id, re-runs the integer bucket argmin, the md5 draw
    order, and the complete-batch filter."""
    buckets = BUCKETS_DEFAULT if buckets is None else buckets
    bvals = ", ".join(f"({bw}, {bh})" for bw, bh in buckets)
    h = (
        "CAST(concat('0x', substr(md5(concat('s{s}:', image_id)), 1, 15)) "
        "AS BIGINT)"
    )
    return (
        f"WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS i), "
        f"imgs AS (SELECT printf('img%012d', i) AS image_id, "
        f"{dims_sql[0]} AS w, {dims_sql[1]} AS h FROM ids), "
        f"b(bucket_w, bucket_h) AS (VALUES {bvals}), "
        "asg AS (SELECT * FROM ("
        "SELECT imgs.*, b.bucket_w, b.bucket_h, row_number() OVER ("
        "PARTITION BY image_id ORDER BY "
        "abs(w * bucket_h - h * bucket_w) / CAST(h * bucket_h AS DOUBLE) ASC, "
        "bucket_w ASC, bucket_h ASC) AS rk FROM imgs, b) WHERE rk = 1), "
        "sh AS (SELECT image_id, bucket_w, bucket_h, "
        f"{h.format(s=salt + 1)} % {shards} AS shard, "
        f"{h.format(s=salt)} AS draw FROM asg), "
        "rn AS (SELECT image_id, bucket_w, bucket_h, shard, "
        "row_number() OVER (PARTITION BY bucket_w, bucket_h, shard "
        "ORDER BY draw ASC, image_id ASC) - 1 AS rn, "
        "count(*) OVER (PARTITION BY bucket_w, bucket_h, shard) AS n FROM sh) "
        "SELECT image_id, bucket_w, bucket_h, CAST(shard AS INT) AS shard, "
        f"CAST(rn // {batch_size} AS INT) AS batch_idx, "
        f"CAST(rn % {batch_size} AS INT) AS slot "
        f"FROM rn WHERE rn < n - n % {batch_size}"
    )
