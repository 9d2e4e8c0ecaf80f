"""Duplicate-cluster resolution: candidate pairs -> connected components.

LSH/SimHash emit *pairwise* candidates; a dedup keep-list needs *clusters*
(A~B and B~C must collapse to one keeper even when A,C never paired).  This
is connected components over the candidate-pair graph, computed with
iterative min-label propagation — the same alternating-shuffle scheme
GraphFrames/"large-star small-star" (Kiveris et al., CC in MapReduce) use:

    label(v) := v
    repeat: label(v) := min(label(v), min over neighbors u of label(u))

Each round is ONE shuffle (edges join labels on src, groupBy dst).  Rounds
needed = graph diameter; dup clusters are near-cliques coming out of LSH
band buckets (every member shares a bucket with most others), so diameter
is tiny (2-3) even when cluster membership is huge.  A `max_iters` cap plus
`localCheckpoint` every round keeps lineage bounded; the per-round driver
check is a single count (bounded metadata, not data).

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
    driver_max_pairs: int = 100_000,
) -> DataFrame:
    """(a, b) undirected edges -> (doc_id, cluster_id = min id reachable).

    Only nodes that appear in at least one pair are returned (singletons
    are their own cluster trivially and would bloat the output).
    Deterministic: pure min-fixpoint, no randomness.

    Cost per round = exactly ONE Spark job — self-loop edges make
    min(own, neighbors) a single aggregation with no separate left-join,
    and the convergence probe rides the same job as an Observation on the
    label sum, which is strictly decreasing until the fixpoint (labels only
    ever shrink), so an unchanged sum == converged.  Edges are persisted
    pre-partitioned on the join key so each round reshuffles only the
    (small) label frame, not the edge list.

    Each round ALSO pointer-jumps: label(v) := label(label(v)) after the
    neighbor-min (the hash-to-min / pointer-doubling move of the MapReduce
    CC literature, same family as Kiveris et al.'s large-star/small-star).
    Plain neighbor-min needs diameter rounds — a chain of 60 docs (page
    series, rolling near-dups) would blow the round cap; the jump spreads
    the min label along ~2^r-hop paths, so convergence is O(log diameter)
    while the near-clique LSH shape keeps its 2-3 rounds.  The jump join
    touches only the label frame (one row per node, two small columns) —
    per-round cost stays edge-join-bound — and since the jump only ever
    SHRINKS labels, the strictly-decreasing-sum convergence proof is
    unchanged.
    """
    from pyspark.sql import Observation

    spark = pairs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # the edge union reads `pairs` several times (forward, reversed, and the
    # node set for self-loops) — pin the pair list first so an expensive
    # upstream (the LSH candidate pipeline) runs ONCE, not per-branch
    pairs = pairs.persist()
    n_pairs = pairs.count()
    if n_pairs == 0:
        # short-circuit: with no pairs there is nothing to propagate, and an
        # all-empty loop would never satisfy the sum-based convergence test
        # (the Observation over zero rows yields NULL every round)
        out = pairs.select(
            F.col(a_col).alias("doc_id"), F.col(a_col).alias("cluster_id")
        ).limit(0)
        pairs.unpersist()
        return out
    if n_pairs <= driver_max_pairs:
        # Small-graph strategy (the broadcast-join-threshold idiom): the
        # iterative loop pays ~1s of job/scheduling overhead PER ROUND,
        # which dwarfs union-find on a graph this size.  The collect is
        # BOUNDED by driver_max_pairs (a few MB) — LSH's bucket caps make
        # huge pair lists rare, but when they happen the distributed loop
        # below is auto-selected, so the operator stays a scale path.
        return _driver_union_find(spark, pairs, a_col, b_col)
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    nodes = fwd.select("src").union(rev.select("src")).distinct()
    self_loops = nodes.select("src", F.col("src").alias("dst"))
    # pairs are distinct with a<b, so the three parts cannot collide — no
    # distinct() needed on the union (saves an edge shuffle)
    edges = fwd.union(rev).union(self_loops).repartition(n_part, "src").persist()
    labels = nodes.select(F.col("src").alias("node"), F.col("src").alias("label"))

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        obs = Observation()
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label(v) := label(label(v)).  Every node has a row
        # (self-loops), and labels are node ids, so the inner join hits
        # exactly once; the parent's label is already <= the child's label,
        # so no extra min is needed.
        parent = nbr_min.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = (
            nbr_min.join(parent, nbr_min.label == parent.p_node)
            .select(F.col("node"), F.col("p_label").alias("label"))
            # decimal(38,0): the sum of ~10^9 64-bit ids overflows a long
            .observe(obs, F.sum(F.col("label").cast("decimal(38,0)")).alias("s"))
            .localCheckpoint()  # eager: runs the round's one job + truncates lineage
        )
        labels = new_labels
        cur_sum = obs.get["s"]
        if prev_sum is not None and cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    pairs.unpersist()
    if not converged:
        # the fixpoint may NOT be reached: a graph with diameter > max_iters
        # (long chains, not the near-clique LSH shape) would silently return
        # split clusters — surface it instead of diverging from the oracle
        import warnings

        warnings.warn(
            f"connected_components: label propagation not provably converged "
            f"after max_iters={max_iters} rounds — clusters may be split; "
            f"raise max_iters for long-chain graphs",
            stacklevel=2,
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def _driver_union_find(spark, pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Union-find with path compression over a BOUNDED collected pair list —
    the small-graph arm of connected_components.  Same fixpoint as the
    distributed loop: every node labeled with the min id reachable."""
    parent: dict = {}
    nodes: set = set()

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in pairs.select(a_col, b_col).collect():
        a, b = row[0], row[1]
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id, so roots are exactly the distributed labels
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted((n, find(n)) for n in nodes)
    id_type = pairs.schema[a_col].dataType
    schema = T.StructType(
        [T.StructField("doc_id", id_type), T.StructField("cluster_id", id_type)]
    )
    pairs.unpersist()
    return spark.createDataFrame(rows, schema)


def cluster_keep_list(components: DataFrame) -> DataFrame:
    """One keeper (min doc_id) per cluster + member count — the dedup
    decision table joined back against the corpus to drop losers."""
    return components.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("doc_id").alias("keeper"),
    )
