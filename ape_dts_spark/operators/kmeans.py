"""Lloyd's k-means over embedding columns — the IVF *training* path.

`similarity.ivf_assign` seeds its coarse quantizer with hash-picked corpus
rows ("k-means-lite"): deterministic and oracle-able, but the cells are
only as balanced as luck allows.  This module adds the real thing — a few
rounds of Lloyd's iterations refining those same seeds — which is exactly
how FAISS trains an IVF index (coarse quantizer = k-means centroids).

Spark shape per iteration (the classic scalable formulation):

* **assign**: centroids are k×dim floats — a broadcast; nearest-centroid
  is an `array_sort(transform(...))[0]` over the broadcast struct array,
  one narrow projection, no shuffle.
* **update**: new centroid = per-dimension mean of the assigned vectors —
  ONE map-side-combined `groupBy(cell).agg(avg(vec[d]) for d)` (dim static
  per corpus, so the agg is a flat column list; partial aggregation
  reduces every partition to k rows before the exchange).
* the k×dim result is collected to the driver (bounded: k·dim doubles)
  to become the next broadcast — the standard iterate-on-driver k-means
  loop every distributed implementation uses (Spark MLlib included).

Empty cells keep their previous centroid (FAISS behavior).  Convergence
stops early when max centroid shift < `tol` (squared-L2).

Determinism: seeded by `ivf_assign`'s md5 pick, and every iteration's
averages are order-independent up to float summation error — across runs
on the same data the assignments are stable (ties broken by cell id).
Iterative => no SQL oracle; verified by planted-cluster recovery,
monotone inertia, and determinism tests (`tests/test_kmeans.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ape_dts_spark.operators.similarity import ivf_assign


def _sq_l2(vec_col, cent_col):
    """Squared L2 distance between two float arrays (JVM fold)."""
    return F.aggregate(
        F.zip_with(vec_col, cent_col, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(corpus: DataFrame, centroids: list[tuple[int, list[float]]],
            id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cell): nearest centroid per row from a broadcast literal —
    a single projection, no join, no shuffle.

    The literal array puts k·dim constants in the plan: ideal for coarse
    quantizers (k <= a few thousand).  For huge k, assign via the
    broadcast JOIN path instead (`similarity.ivf_assign(centroids=...)`),
    which ships the centroid table as a broadcast relation rather than
    plan text — same result, k·|corpus| scored pairs either way."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(c)).alias("cell"),
                F.array(*[F.lit(float(v)) for v in vec]).alias("centroid"),
            )
            for c, vec in centroids
        ]
    )
    best = F.array_sort(
        F.transform(
            cent_arr,
            lambda s: F.struct(
                _sq_l2(F.col(vec_col), s["centroid"]).alias("d"),
                s["cell"].alias("cell"),
            ),
        )
    )[0]
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        best["cell"].alias("cell"),
        best["d"].alias("_d"),
    )


def kmeans(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[tuple[int, list[float]]], float]:
    """Returns (assignments, centroids, inertia).

    assignments: (id_col, vec_col, cell); centroids: [(cell, [floats])]
    driver-side (k·dim bounded — feed them to `ivf_assign`-style probes or
    persist as a table); inertia: sum of squared distances at the final
    assignment (the quantity Lloyd's monotonically decreases)."""
    head = corpus.select(vec_col).first()
    if head is None:
        # empty corpus (e.g. upstream pipeline stages dropped every doc):
        # no centroids to train, no rows to assign — return the typed empty
        # shapes instead of crashing on len(None) (r5 ADVICE)
        empty = corpus.select(
            F.col(id_col), F.col(vec_col), F.lit(0).cast("int").alias("cell")
        ).limit(0)
        return empty, [], 0.0
    dim = len(head[0])
    seeds = ivf_assign(corpus, n_cells=k, id_col=id_col, vec_col=vec_col, seed=seed)[1]
    centroids = [
        (int(r["cell"]), [float(x) for x in r["centroid"]]) for r in seeds.collect()
    ]
    for _ in range(max(iters, 0)):
        assigned = _assign(corpus, centroids, id_col, vec_col)
        means = (
            assigned.groupBy("cell")
            .agg(*[F.avg(F.col(vec_col)[d]).alias(f"_m{d}") for d in range(dim)])
            .collect()
        )
        new = dict(centroids)
        for r in means:  # empty cells keep their previous centroid
            new[int(r["cell"])] = [float(r[f"_m{d}"]) for d in range(dim)]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(new[c], old))
            for c, old in centroids
        )
        centroids = sorted(new.items())
        if shift < tol:
            break
    assigned = _assign(corpus, centroids, id_col, vec_col)
    inertia = assigned.agg(F.sum("_d")).first()[0] or 0.0
    return assigned.drop("_d"), centroids, float(inertia)


def centroids_df(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """The driver-side centroid list as a (cell, centroid) frame — the shape
    `similarity.ivf_assign(..., centroids=)` consumes."""
    return spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "cell int, centroid array<float>",
    )
