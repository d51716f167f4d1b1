"""Sequence packing (operators/packing.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators.packing import pack_sequences, pack_sequences_sql
from geowave_spark.operators.text import token_count

CAP = 256


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    docs = token_count(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return pack_sequences(docs, CAP, n_buckets=16).cache()


def test_every_doc_packed_once(packed, spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert packed.count() == n
    assert packed.select("doc_id").distinct().count() == n


def test_bins_respect_capacity(packed):
    over = (
        packed.groupBy("bucket", "bin_id")
        .agg(F.sum("n_tok").alias("fill"))
        .where(F.col("fill") > CAP)
    )
    assert over.count() == 0


def test_offsets_are_contiguous(packed):
    """Within a bin, offsets must be the exclusive prefix sums of the
    id-ordered token counts (no gaps, no overlap)."""
    from pyspark.sql import Window

    w = Window.partitionBy("bucket", "bin_id").orderBy("doc_id")
    chk = packed.withColumn(
        "want_off",
        F.coalesce(F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    )
    assert chk.where(F.col("offset") != F.col("want_off")).count() == 0


def test_packing_efficiency(packed):
    """Greedy next-fit on ~54-token docs must fill bins reasonably —
    every non-final bin holds more than half its capacity."""
    fills = (
        packed.groupBy("bucket", "bin_id")
        .agg(F.sum("n_tok").alias("fill"), F.max("bin_id").alias("b"))
    )
    last = packed.groupBy("bucket").agg(F.max("bin_id").alias("last_bin"))
    nonfinal = fills.join(last, "bucket").where(F.col("bin_id") < F.col("last_bin"))
    assert nonfinal.where(F.col("fill") <= CAP // 2).count() == 0


def test_matches_duckdb_recursive_fold(packed, sf_dir):
    got = {
        (r["doc_id"], r["bucket"], r["bin_id"], r["offset"], r["n_tok"])
        for r in packed.collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = set(map(tuple, con.sql(pack_sequences_sql("documents", CAP)).fetchall()))
    assert got == exp and len(got) > 0


def test_oversized_doc_is_clamped_and_isolated(spark):
    rows = [(1, 10), (2, 500), (3, 20)]
    df = spark.createDataFrame(rows, "doc_id LONG, n_tokens INT")
    out = {r["doc_id"]: r for r in pack_sequences(df, 100, n_buckets=1).collect()}
    assert out[2]["n_tok"] == 100  # clamped to capacity
    # next-fit: doc 2 cannot share with doc 1 (10 + 100 > 100)
    assert out[2]["bin_id"] == out[1]["bin_id"] + 1
    assert out[3]["bin_id"] == out[2]["bin_id"] + 1


def test_bad_capacity_raises(spark):
    with pytest.raises(ValueError):
        pack_sequences(spark.range(1).withColumn("n_tokens", F.lit(1)), 0)


def test_default_bucket_count_derives_from_corpus_size(spark):
    """With n_buckets unset, the bucket count scales with the corpus
    (ceil(n / target_per_bucket)) so per-bucket pandas groups stay
    bounded — a default-argument call must never load 1/16th of a
    100 TB corpus as one group."""
    from geowave_spark.operators.packing import pack_sequences

    def docs(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"), (F.col("id") % 90 + 10).alias("n_tokens")
        )

    small = pack_sequences(docs(300), 256, target_per_bucket=100)
    big = pack_sequences(docs(1200), 256, target_per_bucket=100)
    n_small = small.select("bucket").distinct().count()
    n_big = big.select("bucket").distinct().count()
    assert n_small == 3 and n_big == 12
    # hash bucketing keeps every group within ~2x the target
    worst = big.groupBy("bucket").count().agg(F.max("count")).first()[0]
    assert worst <= 200
    # derived layout is deterministic: same corpus -> same assignment
    again = pack_sequences(docs(1200), 256, target_per_bucket=100)
    assert big.exceptAll(again).count() == 0
