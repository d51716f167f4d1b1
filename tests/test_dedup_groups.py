"""connected_components / near_dup_groups: min-label propagation over
the LSH near-dup pair graph → canonical doc per duplicate cluster."""

from pyspark.sql import functions as F

from geowave_spark.operators.dedup import connected_components, near_dup_groups


def _labels(spark, pairs, nodes=None, max_iters=20):
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long") if nodes else None
    out = connected_components(pdf, nodes=ndf, max_iters=max_iters)
    return {r["node"]: r["label"] for r in out.collect()}


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (diameter 3: needs >1 propagation round) + pair 10-11
    got = _labels(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_isolated_nodes_are_singletons(spark):
    got = _labels(spark, [(5, 6)], nodes=[5, 6, 7, 8])
    assert got == {5: 5, 6: 5, 7: 7, 8: 8}


def test_label_is_component_min_regardless_of_edge_direction(spark):
    # edges given "backwards" (big, small) — symmetrization must fix it
    got = _labels(spark, [(9, 3), (3, 7), (20, 9)])
    assert set(got.values()) == {3}


def test_near_dup_groups_matches_pairs_closure(spark):
    from geowave_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(num_hashes=4, bands=2, jaccard_threshold=0.5)
    groups = {
        r["doc_id"]: r["canonical_id"]
        for r in near_dup_groups(docs, **kw).collect()
    }
    assert len(groups) == docs.count()  # every doc labeled
    # every verified pair must land in the same component
    for r in minhash_lsh_pairs(docs, **kw).collect():
        assert groups[r["doc_a"]] == groups[r["doc_b"]]
    # canonical ids are component minima: canonical maps to itself
    assert all(groups[c] == c for c in set(groups.values()))


def test_connected_components_nonconvergence_raises(spark):
    """A chain longer than max_iters rounds must fail loudly, never
    return split components (two canonical ids for one group)."""
    import pytest

    from geowave_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a LONG, doc_b LONG"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=3).collect()
    # and with enough rounds the same chain converges to one label
    out = connected_components(chain, max_iters=40).collect()
    assert {r["label"] for r in out} == {0}


def test_contamination_flags_exact_overlap(spark):
    """Planted case: training doc 10 shares a 3-gram with the benchmark,
    doc 11 does not; counts are DISTINCT matched grams per doc."""
    from geowave_spark.operators.dedup import contamination

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id LONG, text STRING"
    )
    train = spark.createDataFrame(
        [
            (10, "a b the quick brown fox c"),   # grams: 'the quick brown','quick brown fox'
            (11, "totally different words here"),
            (12, "the quick brown the quick brown"),  # duplicate gram counted once
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r["n_overlap"] for r in contamination(train, bench).collect()}
    assert got == {10: 2, 12: 1}


def test_contamination_plan_broadcasts_benchmark(spark, sf_dir):
    from geowave_spark.operators.dedup import contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        contamination(docs.limit(400), docs.limit(20))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_star_fallback_converges_on_long_chain(spark):
    """A 10k-node chain has diameter 10k: min-label propagation alone
    would burn max_iters and raise; the large-star/small-star fallback
    (Kiveris et al. SoCC'14) must label the whole chain with node 0 in
    O(log n) rounds."""
    from geowave_spark.operators.dedup import connected_components

    n = 10_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    out = connected_components(chain, max_iters=12, star_fallback_after=3)
    assert out.count() == n
    assert out.where(F.col("label") != 0).count() == 0


def test_star_components_match_propagation_on_random_graph(spark):
    """Both algorithms must produce identical (node, label) maps —
    validated on a random graph with several components plus isolated
    vertices."""
    import random

    from geowave_spark.operators.dedup import connected_components

    rng = random.Random(42)
    edges = []
    # 5 blocks of 40 nodes; edges only within a block (sparse, so some
    # blocks split into several true components — fine, both algorithms
    # see the same graph)
    for b in range(5):
        base = b * 40
        for _ in range(50):
            u, v = rng.sample(range(base, base + 40), 2)
            edges.append((u, v))
    pairs = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    nodes = spark.range(220).select(F.col("id").alias("doc_id"))
    prop = connected_components(
        pairs, nodes=nodes, max_iters=40, star_fallback_after=40
    )
    star = connected_components(
        pairs, nodes=nodes, max_iters=40, star_fallback_after=0
    )
    a = {(r["node"], r["label"]) for r in prop.collect()}
    b = {(r["node"], r["label"]) for r in star.collect()}
    assert a == b and len(a) == 220
