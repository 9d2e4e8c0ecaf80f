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


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 20,
) -> DataFrame:
    """(a, b) undirected edges -> (doc_id, cluster_id = min id reachable).

    Only nodes that appear in at least one pair are returned (singletons
    are their own cluster trivially and would bloat the output).
    Deterministic: pure min-fixpoint, no randomness.
    """
    # pairs are distinct with a<b, so the forward and swapped halves cannot
    # collide — no distinct() needed on the union (saves an edge shuffle)
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .persist()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    changed = 1
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # the fixpoint was NOT reached: a graph with diameter > max_iters
        # (long chains, not the near-clique LSH shape) would silently return
        # split clusters — surface it instead of diverging from the oracle
        import warnings

        warnings.warn(
            f"connected_components: label propagation still changing after "
            f"max_iters={max_iters} rounds — clusters may be split; raise "
            f"max_iters for long-chain graphs",
            stacklevel=2,
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def cluster_keep_list(components: DataFrame) -> DataFrame:
    """One keeper (min doc_id) per cluster + member count — the dedup
    decision table joined back against the corpus to drop losers."""
    return components.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("doc_id").alias("keeper"),
    )
