"""Duplicate-cluster resolution: candidate pairs -> connected components.

LSH/SimHash emit *pairwise* candidates; a dedup keep-list needs *clusters*
(A~B and B~C must collapse to one keeper even when A,C never paired).  This
is connected components over the candidate-pair graph, computed with
iterative min-label propagation — the same alternating-shuffle scheme
GraphFrames/"large-star small-star" (Kiveris et al., CC in MapReduce) use:

    label(v) := v
    repeat: label(v) := min(label(v), min over neighbors u of label(u))

Each round is one edge shuffle (edges join labels on src, groupBy dst)
followed by full path compression of the label forest (pointer doubling on
the small label frame only).  With compression, hooking merges every live
root with its minimum neighboring root, so rounds needed = O(log n) for any
graph/id layout; dup clusters are near-cliques coming out of LSH band
buckets, so in practice 2-3 rounds.  A `max_iters` cap plus
`localCheckpoint` every round keeps lineage bounded; the per-round driver
check is a single Observation read (bounded metadata, not data).

At 10^10 docs the edge list is bounded by the LSH bucket cap (max_bucket^2
per bucket), labels are (node, long) pairs — both shuffle-light compared to
the document payloads, which never enter this graph.

Reference parity: ape-dts has no cluster step (its dedup is keyed LWW);
this is a training-data-pipeline operator in the Spark-first surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 20,
    driver_max_pairs: int = 1_000_000,
) -> DataFrame:
    """(a, b) undirected edges -> (doc_id, cluster_id = min id reachable).

    Only nodes that appear in at least one pair are returned (singletons
    are their own cluster trivially and would bloat the output).
    Deterministic: pure min-fixpoint, no randomness.

    Graph contraction with root-level hooking + full path compression (the
    Shiloach-Vishkin shape).  Each round: (1) hook — every live root r takes
    parent(r) = min(r, roots adjacent to r in the CONTRACTED graph); hooking
    roots rather than relabeling individual nodes is what merges a whole
    class in one move (per-node relabeling degrades to one-hop propagation
    on scrambled-id chains); (2) fully pointer-double the parent forest
    until idempotent (root frame only — never the edges; each jump halves
    forest depth); (3) fold the mapping into the global node labels and
    rewrite the edge list into the new label space, dropping self-edges and
    duplicates.  Termination is EXACT: the contracted edge list is empty iff
    no edge joins two distinct roots — no fixpoint heuristics.

    Round bound: adjacent surviving roots cannot both be local minima, so a
    chain of live roots at least halves per round — max_iters=20 covers
    chain components of ~2^20 nodes for ANY id layout, and the near-clique
    LSH shape finishes in 2-3 rounds.  The edge list SHRINKS every round
    (contraction), so round cost falls as the loop proceeds; the inner
    compression loop's convergence certificate is an Observation on the
    label sum, which strictly shrinks until idempotent.
    """
    from pyspark.sql import Observation

    spark = pairs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # ONE bounded probe action decides the strategy AND (in the common case)
    # already delivers the data: collect at most driver_max_pairs+1 rows.
    # If the list fits, those rows ARE the complete pair list — no separate
    # count job, no persist, no second pass over the expensive LSH pipeline
    # (r5 ran persist + count + collect = two executions' worth of job
    # overhead for graphs that end on the driver anyway).  Arrow toPandas
    # keeps the transfer columnar (2 longs/pair: 16 MB at the 1M bound —
    # collect()'s Row objects would be ~20x that in driver heap), and the
    # 1M default reflects where the crossover actually is: the distributed
    # loop costs several jobs x several rounds (~7 s on a 150k-edge graph
    # at 8x bench scale, r6 measurement) while driver union-find folds a
    # million pairs in ~1 s.  Above the bound the contraction loop remains
    # the scale path.
    head = pairs.select(a_col, b_col).limit(driver_max_pairs + 1).toPandas()
    if len(head) == 0:
        # short-circuit: with no pairs there is nothing to propagate, and an
        # all-empty loop would never satisfy the sum-based convergence test
        # (the Observation over zero rows yields NULL every round)
        return pairs.select(
            F.col(a_col).alias("doc_id"), F.col(a_col).alias("cluster_id")
        ).limit(0)
    if len(head) <= driver_max_pairs:
        # Small-graph strategy (the broadcast-join-threshold idiom): the
        # iterative loop pays ~1s of job/scheduling overhead PER ROUND,
        # which dwarfs union-find on a graph this size.  LSH's bucket caps
        # make huge pair lists rare, but when they happen the distributed
        # loop below is auto-selected, so the operator stays a scale path.
        return _driver_union_find(spark, pairs, head, a_col, b_col)
    # big graph: the loop reads `pairs` several times (node set, initial
    # edge list) — pin the pair list so the expensive upstream (the LSH
    # candidate pipeline) runs once more at most, not per-branch
    pairs = pairs.persist()
    nodes = (
        pairs.select(F.col(a_col).alias("n"))
        .union(pairs.select(F.col(b_col).alias("n")))
        .distinct()
    )
    # global labels: node -> current root id (starts as identity)
    labels = nodes.select(F.col("n").alias("node"), F.col("n").alias("label")).persist()
    # contracted edge list IN LABEL SPACE (pairs are distinct with a<b, so
    # this starts canonical); shrinks every round as clusters merge
    edges = (
        pairs.select(F.col(a_col).alias("p"), F.col(b_col).alias("q"))
        .repartition(n_part, "p")
        .localCheckpoint()
    )

    def _sum_col(c):
        # decimal(38,0): the sum of ~10^9 64-bit ids overflows a long
        return F.sum(F.col(c).cast("decimal(38,0)")).alias("s")

    converged = False
    for _ in range(max_iters):
        if edges.isEmpty():
            # no edge joins two distinct roots -> labels are final.  Exact
            # termination, no fixpoint heuristics.
            converged = True
            break
        # hook AT ROOT LEVEL: for every live root r, parent(r) = min(r,
        # min root adjacent to r in the contracted graph).  Hooking roots
        # (not individual nodes) is what merges a whole class in one move —
        # per-node relabeling would degrade to one-hop propagation again.
        sym = edges.union(edges.select(F.col("q").alias("p"), F.col("p").alias("q")))
        m = (
            sym.groupBy(F.col("p").alias("rnode"))
            .agg(F.min("q").alias("rlabel"))
            .select("rnode", F.least("rnode", "rlabel").alias("rlabel"))
            .localCheckpoint()
        )
        # full path compression of the parent forest (root frame only — the
        # edges never enter this loop).  A local-min root appears only as a
        # target, not a key, so resolve misses to identity via left join.
        # Each jump halves the forest depth -> O(log depth) iterations; sums
        # only shrink, equal sums == idempotent.  64 is a safety valve far
        # above log2 of any feasible root count.
        cur_sum = None
        for _ in range(64):
            jobs = Observation()
            parent = m.select(
                F.col("rnode").alias("p_node"), F.col("rlabel").alias("p_label")
            )
            m2 = (
                m.join(parent, m.rlabel == parent.p_node, "left")
                .select(
                    "rnode", F.coalesce("p_label", "rlabel").alias("rlabel")
                )
                .observe(jobs, _sum_col("rlabel"))
                .localCheckpoint()
            )
            nxt_sum = jobs.get["s"]
            if cur_sum is not None and nxt_sum == cur_sum:
                break  # idempotent — fully compressed (jumps only shrink)
            m, cur_sum = m2, nxt_sum
        # fold the round's root mapping into the global labels
        new_labels = (
            labels.join(m, labels.label == m.rnode, "left")
            .select("node", F.coalesce("rlabel", "label").alias("label"))
            .persist()
        )
        new_labels.count()  # materialize before dropping the old generation
        labels.unpersist()
        labels = new_labels
        # contract: rewrite edges into the new label space, drop self-edges,
        # canonicalize (lo, hi), dedup.  The surviving edge count at least
        # halves on chain graphs (adjacent roots cannot both be local
        # minima), so max_iters=20 covers chains of ~2^20 nodes; near-clique
        # LSH graphs finish in 2-3 rounds.
        mp = m.select(F.col("rnode").alias("k1"), F.col("rlabel").alias("v1"))
        mq = m.select(F.col("rnode").alias("k2"), F.col("rlabel").alias("v2"))
        edges = (
            edges.join(mp, edges.p == mp.k1, "left")
            .join(mq, edges.q == mq.k2, "left")
            .select(
                F.coalesce("v1", "p").alias("np"), F.coalesce("v2", "q").alias("nq")
            )
            .where(F.col("np") != F.col("nq"))
            .select(
                F.least("np", "nq").alias("p"), F.greatest("np", "nq").alias("q")
            )
            .distinct()
            .localCheckpoint()
        )
    pairs.unpersist()
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).localCheckpoint()
    labels.unpersist()
    if not converged:
        # contraction did not drain the edge list within max_iters — chain
        # components beyond ~2^max_iters nodes (or an adversarial id layout
        # on a pathological graph).  Clusters may be split; surface it
        # instead of silently diverging from the oracle.
        import warnings

        warnings.warn(
            f"connected_components: contraction not converged after "
            f"max_iters={max_iters} rounds — clusters may be split; "
            f"raise max_iters for extreme chain graphs",
            stacklevel=2,
        )
    return out


def _driver_union_find(spark, pairs: DataFrame, rows, a_col: str, b_col: str) -> DataFrame:
    """Union-find with path compression over a BOUNDED collected pair list —
    the small-graph arm of connected_components.  Same fixpoint as the
    distributed loop: every node labeled with the min id reachable.
    ``rows`` is the already-collected pair list (the strategy probe's
    result) — a pandas frame (Arrow probe) or any iterable of 2-item
    row-likes; ``pairs`` is only consulted for the id column's type."""
    parent: dict = {}
    nodes: set = set()

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    if hasattr(rows, "itertuples"):  # pandas frame -> plain python values
        rows = (
            (a.item() if hasattr(a, "item") else a, b.item() if hasattr(b, "item") else b)
            for a, b in rows.itertuples(index=False, name=None)
        )
    for row in rows:
        a, b = row[0], row[1]
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id, so roots are exactly the distributed labels
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = sorted((n, find(n)) for n in nodes)
    id_type = pairs.schema[a_col].dataType
    schema = T.StructType(
        [T.StructField("doc_id", id_type), T.StructField("cluster_id", id_type)]
    )
    return spark.createDataFrame(out, schema)


def cluster_keep_list(components: DataFrame) -> DataFrame:
    """One keeper (min doc_id) per cluster + member count — the dedup
    decision table joined back against the corpus to drop losers."""
    return components.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("doc_id").alias("keeper"),
    )
