"""SemDeDup — cluster-scoped semantic dedup (operators/similarity.py).

Exactness on the planted fixture (testgeo.semdedup_planted, analytic
duplicate structure) and structural invariants + Lloyd-trained path on
the real embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators.similarity import semdedup
from geowave_spark.sources.testgeo import (
    SEMDEDUP_DIM,
    SEMDEDUP_K,
    semdedup_planted,
)


def _basis_centroids():
    return np.eye(SEMDEDUP_K, SEMDEDUP_DIM)


def test_planted_groups_exact(spark):
    out = (
        semdedup(semdedup_planted(spark, 960), centroids=_basis_centroids())
        .toPandas()
        .sort_values("vec_id")
    )
    i = out["vec_id"].to_numpy()
    assert len(out) == 960
    assert (out["cluster"].to_numpy() == i % 8).all()
    assert (out["rep_id"].to_numpy() == (i % 8) + 8 * ((i // 8) % 6)).all()


def test_threshold_above_one_yields_singletons(spark):
    out = semdedup(
        semdedup_planted(spark, 96),
        centroids=_basis_centroids(),
        threshold_x1000=1001,
    ).toPandas()
    assert (out["rep_id"] == out["vec_id"]).all()


def test_reps_are_fixed_points_on_real_embeddings(spark, sf_dir):
    """Default Lloyd-trained centroids over the real corpus: every
    vector labeled once, representatives are their own reps, and
    rep_id ≤ vec_id (min-label components)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semdedup(emb, threshold_x1000=990, nlist=8).cache()
    n = emb.count()
    assert out.count() == n
    assert out.where(F.col("rep_id") > F.col("vec_id")).count() == 0
    reps = out.select(F.col("rep_id").alias("vec_id")).distinct()
    self_rows = out.join(reps, "vec_id").where(
        F.col("rep_id") != F.col("vec_id")
    )
    assert self_rows.count() == 0
    out.unpersist()


def test_planted_near_dups_collapse(spark):
    """Scaled copies of the same direction land in one group even
    through the Lloyd-trained path (centroids=None)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, [float(x) for x in v]))
        rows.append((i * 2 + 1, [float(x) for x in v * 1.7]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = semdedup(df, threshold_x1000=999, nlist=4, train_rows=80).toPandas()
    got = dict(zip(out["vec_id"], out["rep_id"]))
    assert all(got[2 * i + 1] == got[2 * i] == 2 * i for i in range(40))


def test_zero_norm_vectors_stay_singletons(spark):
    """cosine is undefined for zero vectors: 0 >= tau*0*0 is true, so
    without the norm guard every zero vector in a cluster collapses
    into one group. They must come out as singletons instead."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = semdedup(df, threshold_x1000=900, centroids=np.eye(2)).toPandas()
    got = dict(zip(out["vec_id"], out["rep_id"]))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_default_nlist_derives_from_corpus_size(spark):
    """With nlist unset, the cluster count scales with the corpus
    (ceil(n / target_per_cluster), clamped to [16, train_rows]) so the
    O(n^2/k) within-cluster pair join stays bounded with default args."""
    rng = np.random.default_rng(3)

    def corpus(n):
        vecs = rng.normal(size=(n, 8))
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id LONG, embedding ARRAY<FLOAT>",
        )

    small = semdedup(corpus(64), threshold_x1000=999, target_per_cluster=4)
    big = semdedup(corpus(256), threshold_x1000=999, target_per_cluster=4)
    # 64/4 = 16 clusters, 256/4 = 64 clusters (both above the floor)
    assert small.select("cluster").distinct().count() <= 16
    assert big.select("cluster").distinct().count() <= 64
    assert big.select(F.max("cluster")).first()[0] >= 16  # actually scaled up
    assert big.count() == 256


def test_nearest_centroid_arrow_path_matches_native(spark):
    """Above _NATIVE_NLIST_MAX the assignment switches from inlined
    codegen to one Arrow-batched matmul — both paths must produce the
    same argmax with the same min-index tie rule."""
    from geowave_spark.operators.similarity import nearest_centroid

    rng = np.random.default_rng(11)
    cents = rng.normal(size=(70, 6))
    vecs = rng.normal(size=(50, 6))
    # duplicate centroid 0 at index 69: ties must pick the lower index
    cents[69] = cents[0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = (
        df.select("vec_id", nearest_centroid(F.col("embedding"), cents).alias("c"))
        .toPandas()
        .sort_values("vec_id")["c"]
        .to_numpy()
    )
    # float32 storage: expectation computed from the same float32 values
    exp = np.argmax(vecs.astype(np.float32).astype(np.float64) @ cents.T, axis=1)
    assert (got == exp).all() and (got != 69).all()
