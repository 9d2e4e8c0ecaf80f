"""SemDeDup-style semantic deduplication over embedding columns.

Near-duplicate *meaning* (not near-duplicate bytes): paraphrases, template
re-renders and boilerplate variants that survive MinHash/SimHash because
their token sets differ, but whose embeddings sit within a tight cosine
ball.  The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):

  1. L2-NORMALIZE the embeddings and k-means them into k cells (the paper
     clusters unit vectors so Euclidean cells = cosine cells; clustering
     raw lengths would split a paraphrase group whose members differ only
     in magnitude).  Training reuses `operators.kmeans` (Lloyd's over the
     same hash-seeded `ivf_assign` centroids the ANN index trains from).
  2. WITHIN each cell, score all pairs; unit-dot >= tau (== cosine of the
     originals) marks a semantic duplicate — the cell bound keeps this
     sub-quadratic (O(sum |cell|^2), |cell| ~ n/k, vs O(n^2) global).
  3. group duplicates (connected components over the tau-graph) and keep
     ONE member per group — the member with the LOWEST cosine to its cell
     centroid (the paper's keep rule: retain the most atypical exemplar,
     preserving tail diversity), ties broken by min id.

Scale shape: the only joins are a cell equi-join (bounded fan-out) and the
component machinery of `dedup_clusters` (contraction + pointer jumping,
driver fast path under 100k pairs).  Normalization, assignment and the
distance-to-centroid all live in one narrow projection — no extra pass.
`max_cell` star-augments oversized cells exactly like
`similarity.embedding_near_dup_pairs` caps megabuckets: the first
`max_cell` members (by id) pair all-to-all, every excess member pairs only
with the cell's min-id anchor — O(cap^2 + |cell|) per cell while
exact-duplicate recall survives (identical vectors score 1.0 against the
anchor and collapse through connected components).

Recall caveat (inherent to the published method, documented not hidden):
a tau-similar pair whose members fall in DIFFERENT cells is not scored.
Identical vectors always share a cell (nearest-centroid over identical
unit vectors is deterministic, ties broken by cell id), so exact
duplicates are never lost.

k-means is iterative => no single-statement SQL oracle; verified by
planted-paraphrase-group recovery, keep-rule, determinism and cap tests
(`tests/test_semantic_dedup.py`).  Reference parity: the reference engine
(ape-dts) has no semantic dedup — this is part of the training-data
pipeline surface built on the same corpus tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ape_dts_spark.operators.dedup_clusters import connected_components
from ape_dts_spark.operators.kmeans import _assign, kmeans
from ape_dts_spark.operators.similarity import _dot, _norm


def _unit_frame(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, _u): L2-normalized embedding, double elements.  All-zero vectors
    stay all-zero (no NaNs): they dot to 0 with everything, below any tau,
    so they are natural singletons."""
    n = _norm(F.col(vec_col))
    unit = F.when(
        n > 0, F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0.0)))
    return corpus.select(F.col(id_col), unit.alias("_u"))


def semantic_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[tuple[int, list[float]]]:
    """Train the cosine-space coarse quantizer: Lloyd's k-means over the
    L2-normalized corpus.  The return shape feeds `semantic_dedup(...,
    centroids=)` (and is reusable across incremental runs)."""
    units = _unit_frame(corpus, id_col, vec_col)
    _, centroids, _ = kmeans(units, k=k, iters=iters, id_col=id_col, vec_col="_u", seed=seed)
    return centroids


def semantic_dedup_pairs(
    corpus: DataFrame,
    k: int = 16,
    tau: float = 0.95,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[tuple[int, list[float]]] | None = None,
    max_cell: int | None = 4096,
) -> DataFrame:
    """Semantic-duplicate pairs: (a, b, cos_sim, cell) with cos_sim >= tau,
    a < b, both members assigned to `cell`.

    Pass `centroids` (the `semantic_centroids` return shape — UNIT-space
    centroids) to reuse a trained quantizer and skip training here.
    """
    if centroids is None:
        centroids = semantic_centroids(
            corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
        )
    if not centroids:
        # empty corpus (kmeans short-circuits with no centroids): no pairs.
        # A literal-free empty frame — the _assign/centroid expressions
        # cannot even be constructed over zero centroids (r5 ADVICE).
        return corpus.select(
            F.col(id_col).alias("a"),
            F.col(id_col).alias("b"),
            F.lit(0.0).alias("cos_sim"),
            F.lit(0).cast("int").alias("cell"),
        ).limit(0)
    units = _unit_frame(corpus, id_col, vec_col)
    assigned = _assign(units, centroids, id_col, "_u")
    if max_cell is not None:
        # NOTE (scale limit, r5 ADVICE): the cap ranks with row_number over
        # Window.partitionBy(cell), which co-locates an entire oversized
        # cell on one task before the filter — the excess branch needs
        # ranks ABOVE the cap, so Catalyst's WindowGroupLimit partial pass
        # cannot prune it.  A megacell (10^7+ members in one cosine cell)
        # will straggle here.  The membership rule (cap-lowest ids form
        # the core, min id anchors the excess) is part of this operator's
        # pinned behavior, so the shuffle-friendly groupBy rewrite of
        # text_dedup._drop_hot_keys does not apply verbatim; documented as
        # a known limit instead of silently changing the kept set.
        wb = Window.partitionBy("cell").orderBy(F.col(id_col).asc())
        assigned = assigned.withColumn("_rn", F.row_number().over(wb))
        core = assigned.filter(F.col("_rn") <= max_cell)
        excess = assigned.filter(F.col("_rn") > max_cell)
    else:
        core, excess = assigned, None

    def _side(df: DataFrame, n: str) -> DataFrame:
        return df.select(
            F.col("cell"), F.col(id_col).alias(n), F.col("_u").alias(f"_u{n}")
        )

    pairs = (
        _side(core, "a")
        .join(_side(core, "b"), "cell")
        .filter(F.col("a") < F.col("b"))
    )
    if excess is not None:
        anchors = _side(core.filter(F.col("_rn") == 1), "a")
        pairs = pairs.unionByName(
            _side(excess, "b").join(anchors, "cell").select(*pairs.columns)
        )
    # unit dot == cosine of the original vectors; zero vectors dot to 0
    sim = _dot(F.col("_ua"), F.col("_ub"))
    return (
        pairs.select("a", "b", sim.alias("cos_sim"), "cell")
        .filter(F.col("cos_sim") >= tau)
    )


def semantic_dedup(
    corpus: DataFrame,
    k: int = 16,
    tau: float = 0.95,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[tuple[int, list[float]]] | None = None,
    max_cell: int | None = 4096,
) -> tuple[DataFrame, DataFrame]:
    """(survivors, drop_list).

    drop_list: (doc_id, cluster_id, keeper, centroid_cos) — one row per
    DROPPED member of each semantic-duplicate group, with the group's kept
    exemplar.  survivors: the input rows minus the drop list (one exemplar
    per group + every singleton), original columns intact.

    Keep rule (the paper's): within a group, the member with the lowest
    cosine to its cell centroid survives; ties (identical vectors) keep the
    min id.  centroid_cos is exposed on the drop list for audit.
    """
    if centroids is None:
        centroids = semantic_centroids(
            corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
        )
    if not centroids:
        # empty corpus: every (zero) row survives, nothing dropped — the
        # stage passes through instead of crashing downstream (r5 ADVICE)
        drop_list = corpus.select(
            F.col(id_col).alias("doc_id"),
            F.col(id_col).alias("cluster_id"),
            F.col(id_col).alias("keeper"),
            F.lit(0.0).alias("centroid_cos"),
        ).limit(0)
        return corpus, drop_list
    pairs = semantic_dedup_pairs(
        corpus,
        tau=tau,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centroids,
        max_cell=max_cell,
    )
    comps = connected_components(pairs)
    # cosine(u, c) recovered from the assignment's own squared distance:
    # sq_l2(u, c) = |u|^2 + |c|^2 - 2 u.c with |u| = 1, so
    # u.c = (1 + |c|^2 - _d) / 2 — one narrow projection, no second pass
    cent_norm2 = F.create_map(
        *[
            lit
            for c, v in centroids
            for lit in (F.lit(int(c)), F.lit(float(sum(x * x for x in v))))
        ]
    )[F.col("cell")]
    units = _unit_frame(corpus, id_col, vec_col)
    assigned = _assign(units, centroids, id_col, "_u")
    nonzero = F.aggregate(F.col("_u"), F.lit(0.0), lambda a, x: a + x * x) > 0
    ccos = F.when(
        nonzero & (cent_norm2 > 0),
        (1.0 + cent_norm2 - F.col("_d")) / (2.0 * F.sqrt(cent_norm2)),
    ).otherwise(F.lit(0.0))
    scored = assigned.select(F.col(id_col).alias("doc_id"), ccos.alias("centroid_cos"))
    members = comps.join(scored, "doc_id")
    wk = Window.partitionBy("cluster_id").orderBy(
        F.col("centroid_cos").asc(), F.col("doc_id").asc()
    )
    ranked = members.withColumn("_rk", F.row_number().over(wk))
    keepers = ranked.filter(F.col("_rk") == 1).select(
        "cluster_id", F.col("doc_id").alias("keeper")
    )
    drop_list = (
        ranked.filter(F.col("_rk") > 1)
        .join(keepers, "cluster_id")
        .select("doc_id", "cluster_id", "keeper", "centroid_cos")
    )
    survivors = corpus.join(
        drop_list.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )
    return survivors, drop_list
