"""Lloyd's k-means: planted-cluster recovery, inertia improvement over the
seed-only assignment, determinism, and empty-cell survival."""

import pytest
from pyspark.sql import functions as F

from ape_dts_spark.operators.kmeans import kmeans


def _clustered(spark, per=30):
    """3 tight clusters around orthogonal-ish corners of a 4-dim cube."""
    centers = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 10.0]]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for j in range(per):
            # deterministic jitter in [-0.5, 0.5): no RNG, engine-stable
            jit = [(((vid * 31 + d * 17) % 100) / 100.0) - 0.5 for d in range(4)]
            rows.append((vid, [c[d] + jit[d] for d in range(4)], ci))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, true_label int"
    )


def test_recovers_planted_clusters(spark):
    df = _clustered(spark)
    assigned, cents, inertia = kmeans(df, k=3, iters=10, seed=1)
    # every true cluster maps to exactly one learned cell and vice versa
    m = assigned.join(df.select("vec_id", "true_label"), "vec_id")
    grid = m.groupBy("true_label", "cell").count().collect()
    by_label = {}
    for r in grid:
        by_label.setdefault(r["true_label"], []).append(r["count"])
    assert all(len(v) == 1 and v[0] == 30 for v in by_label.values())
    cells = {r["cell"] for r in m.select("cell").distinct().collect()}
    assert len(cells) == 3
    # tight clusters -> tiny inertia (jitter bounded by 0.25 per dim)
    assert inertia < 90 * 4 * 0.25 + 1e-6


def test_iterations_improve_on_seed_assignment(spark):
    df = _clustered(spark)
    _, _, inertia0 = kmeans(df, k=3, iters=0, seed=1)
    _, _, inertiaN = kmeans(df, k=3, iters=10, seed=1)
    assert inertiaN <= inertia0 + 1e-9


def test_deterministic_across_runs(spark):
    df = _clustered(spark, per=10)
    a1, c1, i1 = kmeans(df, k=3, iters=5, seed=7)
    a2, c2, i2 = kmeans(df, k=3, iters=5, seed=7)
    assert c1 == c2
    assert i1 == pytest.approx(i2, rel=1e-12)
    r1 = {(r["vec_id"], r["cell"]) for r in a1.collect()}
    r2 = {(r["vec_id"], r["cell"]) for r in a2.collect()}
    assert r1 == r2


def test_empty_cells_keep_previous_centroid(spark):
    # k=5 over 3 tight clusters: at least 2 cells go empty at some point;
    # the run must still converge with 5 centroids intact
    df = _clustered(spark, per=10)
    _, cents, _ = kmeans(df, k=5, iters=5, seed=3)
    assert len(cents) == 5
    assert [c for c, _ in cents] == [0, 1, 2, 3, 4]


def test_assignment_plan_is_pure_projection(spark):
    """The assign step must be a broadcast-literal projection — no join, no
    shuffle, no Python."""
    df = _clustered(spark, per=5)
    from ape_dts_spark.operators.kmeans import _assign

    cents = [(0, [0.0] * 4), (1, [10.0, 10.0, 0.0, 0.0])]
    plan = _assign(df, cents, "vec_id", "embedding")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_real_embeddings_smoke(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents, inertia = kmeans(emb, k=8, iters=3)
    n = emb.count()
    assert assigned.count() == n
    assert len(cents) == 8 and len(cents[0][1]) == 64
    assert inertia > 0


def test_trained_centroids_drive_ivf_topk(spark):
    """The FAISS path: kmeans-train the quantizer, build the IVF index on
    it, and probe — the planted near-duplicate vector must be recovered
    from its (correct) cell."""
    from ape_dts_spark.operators.kmeans import centroids_df
    from ape_dts_spark.operators.similarity import ivf_topk

    df = _clustered(spark)
    _, cents, _ = kmeans(df, k=3, iters=5, seed=1)
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = ivf_topk(
        df, queries, n_probe=1, k=3, centroids=centroids_df(spark, cents)
    ).collect()
    assert len(top) == 3
    # neighbors must come from vec 0's own planted cluster (ids 0..29)
    assert all(r["neighbor_id"] < 30 for r in top)
    assert top[0]["cos_sim"] > 0.99
