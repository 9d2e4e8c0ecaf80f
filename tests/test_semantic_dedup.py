"""SemDeDup semantic dedup: planted paraphrase-group recovery, the paper's
keep rule (lowest centroid-cosine survives, min-id tiebreak), exact-dup
safety across any clustering, cell-cap star augmentation, determinism, and
cache hygiene (composes connected_components, which pins internally)."""

import pytest
from pyspark.sql import functions as F

from ape_dts_spark.operators.semantic_dedup import semantic_dedup, semantic_dedup_pairs

DIM = 8


def _vec(base, scale=1.0, jitter=None):
    v = [x * scale for x in base]
    if jitter:
        for d, j in jitter.items():
            v[d] += j
    return v


def _corpus(spark):
    """Three semantic groups in distinct directions + two singletons.

    Group A: 4 near-parallel vectors (paraphrases — cos ~0.999+);
    group B: 3, including two EXACT duplicates; group C: 2.  Directions are
    orthogonal so cross-group cosine is ~0 and k-means separates them.
    """
    a = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    c = [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    d = [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0]
    e = [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
    rows = [
        # group A (ids 0-3): same direction, varying length + tiny rotation
        (0, _vec(a, 1.0)),
        (1, _vec(a, 2.0, {1: 0.02})),
        (2, _vec(a, 0.5, {2: 0.01})),
        (3, _vec(a, 3.0, {3: 0.03})),
        # group B (ids 10-12): 11 and 12 are byte-identical
        (10, _vec(b, 1.0, {0: 0.02})),
        (11, _vec(b, 1.5)),
        (12, _vec(b, 1.5)),
        # group C (ids 20-21)
        (20, _vec(c, 1.0)),
        (21, _vec(c, 1.2, {0: 0.01})),
        # singletons (ids 30, 40): unique directions
        (30, _vec(d, 1.0)),
        (40, _vec(e, 1.0)),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_recovers_planted_groups(spark):
    corpus = _corpus(spark)
    survivors, drops = semantic_dedup(corpus, k=5, tau=0.99, iters=6, seed=3)
    drop_ids = {r["doc_id"] for r in drops.collect()}
    surv_ids = {r["vec_id"] for r in survivors.collect()}
    # one survivor per group + both singletons = 5 survivors, 6 drops
    assert len(surv_ids) == 5 and len(drop_ids) == 6
    assert surv_ids | drop_ids == {0, 1, 2, 3, 10, 11, 12, 20, 21, 30, 40}
    # singletons never dropped
    assert {30, 40} <= surv_ids
    # exactly one survivor from each planted group
    for group in ({0, 1, 2, 3}, {10, 11, 12}, {20, 21}):
        assert len(surv_ids & group) == 1


def test_keep_rule_lowest_centroid_cos_and_min_id_tiebreak(spark):
    corpus = _corpus(spark)
    survivors, drops = semantic_dedup(corpus, k=5, tau=0.99, iters=6, seed=3)
    kept_by_cluster = {
        r["cluster_id"]: r["keeper"] for r in drops.select("cluster_id", "keeper").collect()
    }
    # group B's keeper: ids 11/12 are identical (same centroid_cos) and id 10
    # is rotated AWAY from the centroid => 10 has the lower centroid cosine
    # unless the centroid lands on 10's side; whichever member survives, the
    # keeper must be a group member and ties must resolve to the smaller id
    b_cluster = [cid for cid, k in kept_by_cluster.items() if k in (10, 11, 12)]
    assert len(b_cluster) == 1
    keeper = kept_by_cluster[b_cluster[0]]
    if keeper in (11, 12):
        assert keeper == 11  # identical vectors -> min id wins
    # every dropped row names a keeper that actually survived
    surv_ids = {r["vec_id"] for r in survivors.collect()}
    for r in drops.collect():
        assert r["keeper"] in surv_ids and r["doc_id"] not in surv_ids


def test_exact_duplicates_always_pair(spark):
    """Identical vectors share a cell under ANY trained centroids, so the
    pair survives blocking at every k."""
    corpus = _corpus(spark)
    for k in (2, 3, 5):
        pairs = semantic_dedup_pairs(corpus, k=k, tau=0.999999, iters=3, seed=11)
        got = {(r["a"], r["b"]) for r in pairs.collect()}
        assert (11, 12) in got, f"exact dup pair lost at k={k}"


def test_cell_cap_star_augmentation(spark):
    """An oversized cell is capped to O(cap^2 + n) pairs while exact dups
    still collapse into one component via the anchor."""
    n = 300
    vec = [1.0, 0.5] + [0.0] * (DIM - 2)
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in vec]).alias("embedding"),
    )
    pairs = semantic_dedup_pairs(corpus, k=2, tau=0.99, iters=2, seed=5, max_cell=20)
    n_pairs = pairs.count()
    assert n_pairs <= (20 * 19) // 2 + n  # core all-pairs + star edges
    survivors, drops = semantic_dedup(corpus, k=2, tau=0.99, iters=2, seed=5, max_cell=20)
    assert survivors.count() == 1 and drops.count() == n - 1


def test_deterministic_across_runs(spark):
    corpus = _corpus(spark)
    s1, d1 = semantic_dedup(corpus, k=4, tau=0.99, iters=5, seed=7)
    s2, d2 = semantic_dedup(corpus, k=4, tau=0.99, iters=5, seed=7)
    assert sorted(r["vec_id"] for r in s1.collect()) == sorted(
        r["vec_id"] for r in s2.collect()
    )
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))


def test_precomputed_centroids_skip_training(spark):
    """Passing a trained quantizer reuses it verbatim (the IVF-sharing path)."""
    corpus = _corpus(spark)
    from ape_dts_spark.operators.semantic_dedup import semantic_centroids

    cents = semantic_centroids(corpus, k=5, iters=6, seed=3)
    s_direct, _ = semantic_dedup(corpus, tau=0.99, centroids=cents)
    s_trained, _ = semantic_dedup(corpus, k=5, tau=0.99, iters=6, seed=3)
    assert sorted(r["vec_id"] for r in s_direct.collect()) == sorted(
        r["vec_id"] for r in s_trained.collect()
    )


def test_leaves_no_pinned_cache(spark):
    corpus = _corpus(spark)
    cm = spark._jsparkSession.sharedState().cacheManager()
    semantic_dedup(corpus, k=4, tau=0.99, iters=3, seed=7)[1].count()
    assert cm.isEmpty()


def test_empty_corpus_passes_through(spark):
    """Empty input (every doc dropped upstream) short-circuits instead of
    crashing on len(None) in kmeans (r5 ADVICE): survivors == input, empty
    drop list, and the pipeline's semantic stage is a no-op."""
    from ape_dts_spark.operators.kmeans import kmeans

    corpus = _corpus(spark).limit(0)
    assigned, cents, inertia = kmeans(corpus, k=4, id_col="vec_id", vec_col="embedding")
    assert assigned.count() == 0 and cents == [] and inertia == 0.0
    survivors, drops = semantic_dedup(corpus, k=4, tau=0.99)
    assert survivors.count() == 0 and drops.count() == 0
    assert [f for f in drops.columns] == ["doc_id", "cluster_id", "keeper", "centroid_cos"]


def test_pipeline_semantic_stage_on_fully_dropped_corpus(spark):
    """corpus_pipeline(semantic_tau=...) whose earlier stages drop EVERY doc
    must return an empty frame, not raise (r5 ADVICE)."""
    from pyspark.sql import functions as F

    from ape_dts_spark.pipelines import corpus_pipeline

    docs = spark.createDataFrame(
        [(1, "https://a.example.com/x", "tiny"), (2, "https://b.example.com/y", "words few")],
        "doc_id long, url string, text string",
    )
    out = corpus_pipeline(docs, min_words=50, semantic_tau=0.9, semantic_k=2)
    assert out.count() == 0
