"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k as the exact baseline, plus two sub-quadratic
scale paths: random-hyperplane LSH bucketing and a coarse-quantizer IVF
(k-means-lite via deterministic seeded centroids).  Dot products run
JVM-side via `aggregate(zip_with(...))` — no Python in the scan loop.

At 10^10-vector scale the broadcast side is the (small) query set; the
corpus is never shuffled for brute-force scoring, and LSH/IVF restrict
scoring to matching buckets/cells only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast BEFORE multiplying: float*float->float loses bits vs double math,
    # and external oracles (duckdb) compute in double
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _cos_pre(a, b, na, nb):
    """cosine with PRE-COMPUTED norms — bit-identical to cosine_sim (same
    double product in the denominator) but evaluated per-row instead of
    per-pair.  In the top-k scorers each side's norm is computed once in the
    side's own projection (below the join), cutting ~2/3 of the scoring
    FLOPs on the |Q| x corpus hot path.

    Degenerate (all-zero) vectors score 0.0, not NaN: 0/0 = NaN, and Spark
    sorts NaN ABOVE every double in descending order, so without the guard
    a single zero vector in the corpus would rank as the TOP-1 neighbor of
    every query (review finding).  Fixture corpora carry no zero vectors,
    so board-oracle values are unchanged; the guard only reroutes the
    undefined case."""
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set against
    the corpus, score JVM-side, keep k by window.  Output:
    (query_id, neighbor_id, cos_sim, rank)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qv"),
            _norm(F.col(vec_col)).alias("_qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    scored = q.crossJoin(c).filter(F.col(query_id_col) != F.col("neighbor_id"))
    scored = scored.select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        _cos_pre(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_tables: int = 3,
    planes_per_table: int = 4,
    seed: int = 42,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cos_sim) with
    cos_sim >= threshold and a < b.

    Blocking is similarity-preserving LSH OR-amplification: ``n_tables``
    independent hash tables of ``planes_per_table`` random hyperplanes each;
    a pair is scored iff it collides in at least one table.  For
    cos >= 0.95 (angle <= 18deg) a single plane agrees with p ~ 0.9, so
    recall ~ 1 - (1 - p^m)^L ~ 0.96 at m=4, L=3 — and identical vectors
    collide in EVERY table, so exact dups are never lost.  (The previous
    id-mod blocking was not similarity-preserving: it silently dropped
    ~(1 - 1/mod) of true pairs.)  The per-table bucket equi-join bounds the
    shuffle; scoring is JVM-side (aggregate/zip_with), norms precomputed
    once per side.  Planes are hash-derived (no RNG state), so SQL oracles
    reproduce the buckets bit-for-bit.

    ``max_bucket`` caps the per-bucket all-pairs join: in an oversized
    bucket (the 10^4-identical-vectors case — a dedup operator's hottest
    input), only the first ``max_bucket`` members (by id) pair all-to-all;
    every EXCESS member pairs with the bucket's min-id anchor instead
    (star augmentation).  Per-bucket work drops from O(M^2) to
    O(cap^2 + M) while cluster-level recall survives for exactly the case
    that creates megabuckets — (near-)identical vectors score ~1.0 against
    the anchor, so downstream connected-components still collapses the
    whole set.  Deterministic (id order); None disables.  The sf-dir
    oracle mirrors the uncapped semantics: its bucket sizes never reach
    the cap (the skew unit test covers the capped branch).
    """
    tables = [random_hyperplanes(dim, planes_per_table, seed + t) for t in range(n_tables)]
    from ape_dts_spark.operators.text_dedup import _spread

    base = _spread(df).select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    buckets = F.array(*[lsh_bucket(F.col("_v"), pl) for pl in tables])
    exploded = base.select(
        F.col(id_col), F.col("_v"), F.col("_n"), F.posexplode(buckets).alias("_tbl", "_bkt")
    )
    excess = None
    if max_bucket is not None:
        wb = Window.partitionBy("_tbl", "_bkt").orderBy(F.col(id_col).asc())
        exploded = exploded.withColumn("_rn", F.row_number().over(wb))
        core = exploded.filter(F.col("_rn") <= max_bucket)
        excess = exploded.filter(F.col("_rn") > max_bucket)
    else:
        core = exploded
    left = core.select(
        F.col(id_col).alias("a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"),
        "_tbl", "_bkt",
    )
    right = core.select(
        F.col(id_col).alias("b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
        "_tbl", "_bkt",
    )
    pairs = (
        left.join(right, ["_tbl", "_bkt"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "_va", "_na", "_vb", "_nb")
    )
    if excess is not None:
        anchors = core.filter(F.col("_rn") == 1).select(
            "_tbl", "_bkt",
            F.col(id_col).alias("a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"),
        )
        star = (
            excess.select(
                "_tbl", "_bkt",
                F.col(id_col).alias("b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
            )
            .join(anchors, ["_tbl", "_bkt"])
            .select("a", "b", "_va", "_na", "_vb", "_nb")
        )
        pairs = pairs.union(star)
    sim = (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias("cos_sim")
    # same pair from several tables yields the identical sim value -> distinct
    return pairs.select("a", "b", sim).filter(F.col("cos_sim") >= threshold).distinct()


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes: plane[p][d] in
    {-1..1} from md5(seed#p#d) (first 12 hex chars mod 1999).

    md5-derived (not an affine integer mix): the round-2 affine formula made
    CONSECUTIVE planes nearly-identical phase shifts of one cyclic sequence
    (measured: every true-neighbor bucket sat at an EVEN hamming distance —
    sign bits flipped in pairs), which capped single- and multi-probe recall
    alike.  A cryptographic mix decorrelates planes, and any SQL engine with
    md5 reproduces every coefficient bit-for-bit (oracle `_plane_sql`)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}#{p}#{d}".encode()).hexdigest()[:12], 16)
            row.append(((h % 1999) / 999.5) - 1.0)
        planes.append(row)
    return planes


def lsh_dots(vec_col, planes: list[list[float]]):
    """Per-plane dot products as an array<double> (left-fold order, so SQL
    oracles reproduce each value bit-for-bit)."""
    return F.array(*[_dot(vec_col, F.array(*[F.lit(x) for x in p])) for p in planes])


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit signature of a vector against the hyperplanes -> long bucket."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = _dot(vec_col, F.array(*[F.lit(x) for x in plane]))
        sig = sig + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def _probe_buckets(dots_col, n_planes: int, n_probe: int):
    """The query's own bucket plus its (n_probe-1) nearest 1-bit-flip
    neighbors — "nearest" = flipping the planes with the smallest |dot|
    margin first (the multi-probe LSH heuristic: a vector near a hyperplane
    is the one whose true neighbors straddle it).  Deterministic: margin
    ties break on plane index.  All probe buckets are distinct (distinct
    single-bit flips), so no downstream pair dedup is needed."""
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        bucket = bucket + F.when(
            F.element_at(dots_col, i + 1) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    margins = F.array(
        *[
            F.struct(
                F.abs(F.element_at(dots_col, i + 1)).alias("m"),
                F.lit(i).cast("int").alias("i"),
            )
            for i in range(n_planes)
        ]
    )
    ordered = F.array_sort(margins)  # struct sort: by margin, then plane idx
    flips = F.slice(F.transform(ordered, lambda s: s["i"]), 1, n_probe - 1)
    pow2 = F.array(*[F.lit(1 << j).cast("long") for j in range(n_planes)])
    flipped = F.transform(flips, lambda j: bucket.bitwiseXOR(F.element_at(pow2, j + 1)))
    return F.concat(F.array(bucket), flipped)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket(s).

    Recall/cost tradeoff via n_planes (fewer planes = bigger buckets) and
    n_probe (probe the n_probe nearest buckets — own bucket + smallest-
    margin 1-bit flips).  Single-probe LSH has a known recall cliff at
    scale: a query near a hyperplane loses every neighbor across it;
    multi-probe recovers those at n_probe x join cost, the standard
    recall lever when shrinking buckets (more planes) for speed.  The join
    stays an equi-join on bucket -> shuffle bounded by bucket sizes, the
    scale path when the query set is too large to broadcast."""
    planes = random_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    if n_probe <= 1:
        q = queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qv"),
            _norm(F.col(vec_col)).alias("_qn"),
            lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
        )
    else:
        q = queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qv"),
            _norm(F.col(vec_col)).alias("_qn"),
            F.explode(
                _probe_buckets(lsh_dots(F.col(vec_col), planes), n_planes, n_probe)
            ).alias("_bucket"),
        )
    scored = (
        q.join(c, "_bucket")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            F.col(query_id_col),
            F.col("neighbor_id"),
            _cos_pre(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Coarse quantizer: deterministic seeded centroids = the embeddings of
    hash-picked corpus rows; assign each vector to its nearest centroid.
    Returns (assignments, centroids).  An IVF probe then scores only the
    query's nearest cell(s) — the classic sub-linear ANN layout.

    Pass `centroids` — a (cell, centroid) frame, e.g. Lloyd's-refined ones
    from `operators.kmeans.centroids_df` — to skip the seeded pick and
    build the index on a TRAINED quantizer (the FAISS IVF training path);
    `n_cells`/`seed` are ignored then."""
    if centroids is not None:
        picked = centroids.select("cell", F.col("centroid"))
        cents = F.broadcast(picked)
        assigned = (
            corpus.crossJoin(cents)
            .select(
                F.col(id_col),
                F.col(vec_col),
                F.col("cell"),
                cosine_sim(F.col(vec_col), F.col("centroid")).alias("_sim"),
            )
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.col("_sim").desc(), F.col("cell").asc()
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(id_col, vec_col, "cell")
        )
        return assigned, picked
    # md5-derived pick rank (not xxhash64): any SQL engine reproduces the
    # centroid choice bit-for-bit, so IVF results are oracle-checkable
    rank_hash = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col(id_col).cast("string"), F.lit(seed))), 1, 12
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1_000_000),
    )
    picked = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("_r", rank_hash)
        .orderBy("_r", id_col)
        .limit(n_cells)
        # deterministic cell ids: row_number over the already-LIMITed n_cells
        # rows (tiny single-partition window), not monotonically_increasing_id
        # which depends on physical partition layout
        .withColumn(
            "cell",
            (F.row_number().over(Window.orderBy("_r", id_col)) - 1).cast("int"),
        )
        .select("cell", F.col(vec_col).alias("centroid"))
    )
    cents = F.broadcast(picked)
    assigned = (
        corpus.crossJoin(cents)
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cell"),
            cosine_sim(F.col(vec_col), F.col("centroid")).alias("_sim"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("cell").asc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "cell")
    )
    return assigned, picked


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    seed: int = 42,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-probed approximate top-k: score only corpus vectors whose cell is
    among the query's `n_probe` nearest centroids (the classic FAISS IVF
    layout, expressed as two broadcast joins + one cell equi-join).

    Scale shape at 10^10 vectors: the corpus is partitioned once by `cell`
    (a shuffle bounded by cell sizes; centroids are a broadcast), queries
    fan out to n_probe cells, and scoring touches n_probe/n_cells of the
    corpus.  Recall rises with n_probe at linear cost.  `centroids`
    overrides the seeded quantizer with a trained one (see `ivf_assign`).
    """
    assigned, cents = ivf_assign(corpus, n_cells, id_col, vec_col, seed, centroids)
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            F.col(query_id_col),
            F.col("_qv"),
            F.col("_qn"),
            F.col("cell"),
            # centroid norm recompute is fine here: |cents| = n_cells, tiny
            cosine_sim(F.col("_qv"), F.col("centroid")).alias("_csim"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("_csim").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("_rn") <= n_probe)
        .select(query_id_col, "_qv", "_qn", "cell")
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
        "cell",
    )
    scored = (
        probes.join(c, "cell")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            F.col(query_id_col),
            F.col("neighbor_id"),
            _cos_pre(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid, one row per (label, dim): (label, dim, n_vecs,
    centroid).  posexplode keeps the dimension index JVM-side; the shuffle
    key (label, dim) has cardinality |labels| x dim — tiny and uniform, so
    the agg scales as a pure map-side-combine pass over 10^10 vectors.
    Building block for IVF training audits and per-cluster drift checks."""
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    return ex.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # + 0.0 normalizes IEEE negative zero (an engine emitting -0.0 would
        # hash-differ from +0.0 despite comparing equal)
        (F.round(F.avg(F.col("v").cast("double")), 3) + F.lit(0.0)).alias("centroid"),
    )


def embedding_norm_stats(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label L2-norm profile — the standard embedding-table health
    check (collapsed vectors, scale drift).  Norms are per-row sequential
    folds (deterministic, engine-portable); min/max are order-independent;
    avg is rounded below double-accumulation noise."""
    norms = emb.select(F.col(label_col).alias("label"), _norm(F.col(vec_col)).alias("nrm"))
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.round(F.avg("nrm"), 3).alias("avg_norm"),
    )


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: 4x less memory per
    corpus vector for ANN serving (the standard faiss-SQ8 layout).

    -> (id, qvec array<byte>, scale float): v_i ~= q_i * scale with
    scale = max|v_i| / 127 and q_i = round-half-up(v_i / scale) in
    [-127, 127].  Pure array expressions (aggregate for the max, transform
    for the codes) — zero shuffle, deterministic (no RNG, no data-dependent
    calibration set).  All-zero vectors get scale 0 and all-zero codes.
    """
    v = F.col(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    code = F.transform(
        v,
        lambda x: F.when(F.col("scale") == 0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(x.cast("double") / F.col("scale"), 0).cast("int")),
            )
        )
        .cast("byte"),
    )
    return (
        emb.withColumn("scale", amax / F.lit(127.0))
        .withColumn("qvec", code)
        .select(F.col(id_col), F.col("qvec"), F.col("scale").cast("float"))
    )


def dequantize_embeddings(
    q: DataFrame, id_col: str = "vec_id", qvec_col: str = "qvec", scale_col: str = "scale"
) -> DataFrame:
    """Inverse of quantize_embeddings: (id, embedding array<float>)."""
    rec = F.transform(
        F.col(qvec_col), lambda c: (c.cast("double") * F.col(scale_col)).cast("float")
    )
    return q.select(F.col(id_col), rec.alias("embedding"))


def quantization_error_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One-row audit of the int8 quantization: worst and mean absolute
    reconstruction error across the corpus, plus the theoretical bound
    (max scale / 2 — round-half quantization can be off by half a step).
    Used to decide whether SQ8 is safe for a given embedding table before
    swapping it into the ANN path."""
    qz = quantize_embeddings(emb, id_col, vec_col)
    joined = emb.join(qz, id_col)
    err = F.zip_with(
        F.col(vec_col),
        F.col("qvec"),
        lambda x, c: F.abs(x.cast("double") - c.cast("double") * F.col("scale")),
    )
    per_vec = joined.select(
        F.aggregate(err, F.lit(0.0), lambda a, x: F.greatest(a, x)).alias("max_err"),
        (
            F.aggregate(err, F.lit(0.0), lambda a, x: a + x)
            / F.greatest(F.size(F.col(vec_col)), F.lit(1))
        ).alias("mean_err"),
        (F.col("scale").cast("double") / 2).alias("half_step"),
    )
    return per_vec.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.max("max_err"), 6).alias("worst_abs_err"),
        F.round(F.avg("mean_err"), 6).alias("mean_abs_err"),
        F.round(F.max("half_step"), 6).alias("max_half_step"),
    )


def brute_force_topk_quantized(
    qcorpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact-shape cosine top-k over an int8-QUANTIZED corpus (the output of
    quantize_embeddings: (id, qvec, scale)) — the 4x-memory ANN serving
    path.  dot(q, scale*code) = scale * dot(q, code), so the per-pair work
    is an integer-weighted fold; queries stay float and broadcast.  Scores
    are approximate within the reconstruction bound audited by
    quantization_error_stats; ranking quality vs the float path is pinned
    by test_quantized_topk_recall.  Output: (query_id, neighbor_id,
    cos_sim, rank) — same schema as brute_force_topk."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qv"),
            _norm(F.col(vec_col)).alias("_qn"),
        )
    )
    # int-code norm precomputed ONCE per corpus row (below the join), same
    # pattern as brute_force_topk's _cn — recomputing it per (query, row)
    # pair doubles the hot-path FLOPs
    cnorm_int = F.sqrt(
        F.aggregate(
            F.col("qvec"),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    c = qcorpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("_cc"),
        F.col("scale").cast("double").alias("_cs"),
        cnorm_int.alias("_cn"),
    )
    pair = q.crossJoin(c).filter(F.col(query_id_col) != F.col("neighbor_id"))
    dot_int = F.aggregate(
        F.zip_with(
            F.col("_qv"), F.col("_cc"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # scale cancels in cosine: (s*dot_int) / (qn * s*cnorm_int) — but keep it
    # so zero-vectors (scale 0) score NULL-safe 0 via the when guard
    cos = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0) & (F.col("_cs") > 0),
        dot_int / (F.col("_qn") * F.col("_cn")),
    ).otherwise(F.lit(0.0))
    scored = pair.select(
        F.col(query_id_col), F.col("neighbor_id"), cos.alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
