"""Aspect-ratio bucketed batch assembly (operators/batching.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators.batching import (
    BUCKETS_DEFAULT,
    aspect_batches_sql,
    aspect_bucket_assign,
    pack_batches,
)
from geowave_spark.sources.images import images_table_var, var_dims


@pytest.fixture(scope="module")
def imgs(spark):
    return images_table_var(spark, 200, partitions=4).select("image_id", "w", "h")


def test_bucket_assign_exact_and_total(spark, imgs):
    out = aspect_bucket_assign(imgs).collect()
    assert len(out) == 200  # exactly one bucket per image
    for r in out:
        # exact-aspect sizes snap to their own bucket
        if (r["w"], r["h"]) in BUCKETS_DEFAULT:
            assert (r["bucket_w"], r["bucket_h"]) == (r["w"], r["h"])
        # assigned bucket minimizes |w/h - bw/bh| over the ladder
        best = min(
            abs(r["w"] / r["h"] - bw / bh) for bw, bh in BUCKETS_DEFAULT
        )
        got = abs(r["w"] / r["h"] - r["bucket_w"] / r["bucket_h"])
        assert got <= best + 1e-12


def test_pack_batches_complete_and_uniform(imgs):
    out = pack_batches(aspect_bucket_assign(imgs), batch_size=8, shards=2).cache()
    rows = out.collect()
    assert 0 < len(rows) <= 200 and len(rows) % 8 == 0
    per = {}
    for r in rows:
        key = (r["bucket_w"], r["bucket_h"], r["shard"], r["batch_idx"])
        per.setdefault(key, []).append(r["slot"])
    for key, slots in per.items():
        assert sorted(slots) == list(range(8))  # every batch full, slots dense
    # deterministic re-run reproduces the identical layout
    again = {
        (r["image_id"], r["shard"], r["batch_idx"], r["slot"])
        for r in pack_batches(
            aspect_bucket_assign(imgs), batch_size=8, shards=2
        ).collect()
    }
    assert again == {
        (r["image_id"], r["shard"], r["batch_idx"], r["slot"]) for r in rows
    }
    out.unpersist()


def test_pack_batches_shard_stability(imgs):
    """Shard split is a pure per-row hash: every image keeps its shard
    when packed with more shards of input (batches may renumber, the
    shard routing may not)."""
    a = {
        r["image_id"]: r["shard"]
        for r in pack_batches(aspect_bucket_assign(imgs), 4, shards=3).collect()
    }
    half = imgs.where(F.substring("image_id", 4, 12).cast("long") % 2 == 0)
    b = {
        r["image_id"]: r["shard"]
        for r in pack_batches(aspect_bucket_assign(half), 4, shards=3).collect()
    }
    assert b and all(a[k] == v for k, v in b.items() if k in a)


def test_matches_duckdb_twin(spark):
    imgs = images_table_var(spark, 150, partitions=4).select("image_id", "w", "h")
    got = {
        tuple(r)
        for r in pack_batches(
            aspect_bucket_assign(imgs), batch_size=8, shards=2
        ).collect()
    }
    con = duckdb.connect()
    exp = {tuple(r) for r in con.sql(aspect_batches_sql(150, 8, 2)).fetchall()}
    assert got == exp and len(got) > 0


def test_var_dims_match_generated_table(spark):
    rows = images_table_var(spark, 60, partitions=2).select(
        "image_id", "w", "h"
    ).collect()
    for r in rows:
        i = int(r["image_id"][3:])
        assert (r["w"], r["h"]) == var_dims(i)


def test_bad_args_raise(imgs):
    with pytest.raises(ValueError):
        aspect_bucket_assign(imgs, buckets=[])
    with pytest.raises(ValueError):
        pack_batches(aspect_bucket_assign(imgs), 0)


def test_bucket_assign_tie_breaks_to_narrowest(spark):
    """w/h exactly between two ladder aspects → deterministic tie to
    the smaller bucket_w (both engines order (score, bw, bh))."""
    df = spark.createDataFrame(
        [("t1", 32, 32)], "image_id string, w int, h int"
    )
    # ladder with two buckets equidistant from aspect 1.0 in the
    # exact integer metric: |32*1-32*2|/(32*1)=1 vs |32*2-32*1|/(32*2)=0.5
    # -> (2,1) wins on score; use a symmetric pair instead for a true tie
    out = aspect_bucket_assign(
        df, buckets=[(2, 1), (1, 2), (1, 1)]
    ).collect()[0]
    assert (out["bucket_w"], out["bucket_h"]) == (1, 1)
    # remove the exact match: (1,2) scores |32*2-32|/ (32*2)=0.5,
    # (2,1) scores |32-64|/32 = 1.0 -> (1,2) wins (not a tie; checks
    # the asymmetric metric is applied consistently with the oracle)
    out = aspect_bucket_assign(df, buckets=[(2, 1), (1, 2)]).collect()[0]
    assert (out["bucket_w"], out["bucket_h"]) == (1, 2)


def test_pack_batches_keeps_max_complete_batches(spark):
    """Kept rows per (bucket, shard) = floor(group/B)*B — the maximum
    number of complete batches, never more, never fewer."""
    import pandas as pd

    df = spark.createDataFrame(
        [(f"id{i:04d}", 10 + (i % 3), 10) for i in range(97)],
        "image_id string, w int, h int",
    )
    assigned = aspect_bucket_assign(df, buckets=[(1, 1)])
    out = pack_batches(assigned, batch_size=5, shards=3).toPandas()
    sizes = (
        assigned.withColumn("_s", F.lit(0))  # recount via the same draw
        .count()
    )
    assert sizes == 97
    grp = out.groupby(["bucket_w", "bucket_h", "shard"]).size()
    assert all(g % 5 == 0 for g in grp)
    # reconstruct each shard's input size from the op's own shard hash
    from geowave_spark.operators.dedup import _h64

    shard_of = {
        r["image_id"]: r["shard"]
        for r in df.select(
            "image_id",
            F.pmod(_h64(F.col("image_id").cast("string"), 14), F.lit(3))
            .cast("int")
            .alias("shard"),
        ).collect()
    }
    input_per_shard = pd.Series(list(shard_of.values())).value_counts()
    for shard, n_in in input_per_shard.items():
        kept = int(grp.get((1, 1, shard), 0))
        assert kept == (n_in // 5) * 5
