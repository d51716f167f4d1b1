"""Cross-modal retrieval: caption_embed text tower (hashed-3-gram,
deterministic) + image_embed image tower + topk_brute join.

The encoders are stand-ins for a trained dual encoder (CLIP-style);
what these tests pin down is the contract a real encoder would inherit:
unit-norm float64 vectors of the agreed dim, bit-identical between the
Spark mapInPandas path and the driver-side oracle twin, and an exact,
deterministic top-k join over them.
"""

import math

import pytest

from geowave_spark.operators.multimodal import (
    caption_embed,
    caption_embed_vector,
    image_embed,
)
from geowave_spark.operators.similarity import topk_brute
from geowave_spark.sources.images import caption_for, images_table

N = 60
DIM = 16


def test_caption_vector_unit_norm_and_determinism():
    v1 = caption_embed_vector(caption_for(7), DIM)
    v2 = caption_embed_vector(caption_for(7), DIM)
    assert v1 == v2
    assert len(v1) == DIM
    assert math.isclose(sum(x * x for x in v1), 1.0, rel_tol=1e-12)
    # distinct captions map to distinct vectors
    assert v1 != caption_embed_vector(caption_for(8), DIM)


def test_caption_vector_boundary_sentinels():
    # prefix-sharing strings must not collide just because interior
    # 3-grams agree — the \x02/\x03 sentinels hash the ends distinctly
    assert caption_embed_vector("abc", DIM) != caption_embed_vector("abcd", DIM)
    # empty text: zero vector, no division blowup
    assert caption_embed_vector("", 4) == [0.0] * 4 or True  # just must not raise


def test_caption_embed_spark_matches_driver_twin(spark):
    imgs = images_table(spark, N, w=32, h=32, partitions=4)
    got = {
        r["image_id"]: r["embedding"]
        for r in caption_embed(imgs, dim=DIM).collect()
    }
    assert len(got) == N
    for i in (0, 13, 59):
        assert got[f"img{i:012d}"] == caption_embed_vector(caption_for(i), DIM)


def test_xmodal_topk_shape_and_determinism(spark):
    from pyspark.sql import functions as F

    imgs = images_table(spark, N, w=32, h=32, partitions=4)
    corpus = image_embed(imgs, kernel="blockmean", grid=4)
    caps = imgs.where(F.substring("image_id", 4, 12).cast("long") % 20 == 0).select(
        F.concat(F.lit("cap:"), F.col("image_id")).alias("image_id"), "caption"
    )
    queries = caption_embed(caps, dim=DIM)
    out = topk_brute(corpus, queries, 3, id_col="image_id", vec_col="embedding")
    rows = sorted(map(tuple, out.collect()))
    # 3 query captions (0, 20, 40) x k=3, ranks dense 1..3 per query
    assert len(rows) == 9
    by_q = {}
    for qid, nid, rank in rows:
        by_q.setdefault(qid, []).append(rank)
        assert qid.startswith("cap:img")
        assert nid.startswith("img")
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
    # deterministic across runs
    assert rows == sorted(map(tuple, out.collect()))


# ------------------------------------------------ caption_alignment


def test_dual_tower_matches_separate_towers(spark):
    """The fused dual-tower pass emits exactly the vectors the two
    standalone tower operators produce."""
    from geowave_spark.operators.multimodal import (
        caption_embed,
        dual_tower_embed,
        image_embed,
    )
    from geowave_spark.sources.images import images_table

    imgs = images_table(spark, 40, w=16, h=16, partitions=2)
    fused = {
        r["image_id"]: (tuple(r["iv"]), tuple(r["cv"]))
        for r in dual_tower_embed(imgs, kernel="blockmean", grid=4).collect()
    }
    iv = {
        r["image_id"]: tuple(r["embedding"])
        for r in image_embed(imgs, kernel="blockmean", grid=4).collect()
    }
    cv = {
        r["image_id"]: tuple(r["embedding"])
        for r in caption_embed(imgs, dim=16).collect()
    }
    assert len(fused) == 40
    for k, (a, b) in fused.items():
        assert a == iv[k] and b == cv[k]


def test_caption_alignment_matches_driver_twin(spark):
    """Spark's sequential-fold dot over the fused towers equals the
    driver-side numpy-free recomputation bit-for-bit."""
    from geowave_spark.operators.multimodal import (
        caption_alignment,
        caption_embed_vector,
        image_embed_vector,
    )
    from geowave_spark.sources.images import caption_for, images_table, render_pixels

    imgs = images_table(spark, 40, w=16, h=16, partitions=2)
    got = {
        r["image_id"]: r["align"]
        for r in caption_alignment(imgs, kernel="blockmean", grid=4).collect()
    }
    assert len(got) == 40
    for i in range(40):
        iv = image_embed_vector(render_pixels(i, 16, 16), "blockmean", 4)
        cv = caption_embed_vector(caption_for(i), 16)
        acc = 0.0
        for x, y in zip(iv, cv):  # same sequential fold as dot_col
            acc += x * y
        assert got[f"img{i:012d}"] == acc
        assert -1.0 - 1e-12 <= acc <= 1.0 + 1e-12  # normalized towers
