"""The end-to-end training-corpus pipeline, composed from the operator
library — what a user runs AFTER the CDC engine has landed the crawl in the
lake.

One call chains the canonical web-corpus curation sequence over a
`documents`-shaped frame:

    url canonicalization -> per-domain quota -> exact dedup ->
    near-dup removal (MinHash+LSH clusters, keep lowest id) ->
    quality filter -> train/eval decontamination -> deterministic split

Every stage is one of the library's tested operators (each individually
oracle- or property-checked); this module only sequences them and carries
an audit column, so the pipeline inherits the operators' scale shapes:
no stage funnels a hot domain/key into one task, the near-dup path is the
banded LSH (sub-quadratic), and decontamination is an eval-normalized
coverage join (eval sets are benchmark-sized).  Laziness caveat: with
``near_dup=True`` (the default) the connected-components stage is
iterative and MATERIALIZES the pipeline up to near-dup during the
corpus_pipeline() call itself (the survivors are locally checkpointed so
the sink action reuses that pass instead of recomputing — blocks are
reclaimed automatically when the returned frame is GC'd, so repeated runs
in one session do not accumulate cache); with near_dup=False the
composition is fully lazy until the sink.

Determinism: every stage keys its decisions on content hashes and ids, so
the same corpus in produces byte-identical survivor sets and split labels
across runs, partitionings, and cluster sizes — the reproducibility bar the
engine's CDC side (byte-identical text per url) already meets.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ape_dts_spark.operators.dedup_clusters import cluster_keep_list, connected_components
from ape_dts_spark.operators.ngram_lm import ppl_filter
from ape_dts_spark.operators.text_analysis import (
    deterministic_split,
    line_dedup,
    quality_filter,
)
from ape_dts_spark.operators.text_dedup import (
    contaminated_train_docs,
    dedup_exact,
    lsh_candidate_pairs,
    minhash_signatures_fused,
)
from ape_dts_spark.operators.url_tools import canonicalize_url, domain_cap


@dataclass
class CorpusPipelineReport:
    """Stage-by-stage survivor counts (one count() per stage — call
    `corpus_pipeline(..., with_report=True)` only when auditing; the
    counts force extra actions)."""

    stages: dict[str, int] = field(default_factory=dict)


def corpus_pipeline(
    docs: DataFrame,
    evalset: DataFrame | None = None,
    id_col: str = "doc_id",
    url_col: str = "url",
    text_col: str = "text",
    domain_cap_n: int | None = 100_000,
    line_dedup_max_docs: int | None = None,
    near_dup: bool = True,
    shingle_k: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    semantic_tau: float | None = None,
    semantic_k: int = 64,
    semantic_dim: int = 256,
    min_words: int = 60,
    ppl_band: tuple[float, float] | None = None,
    contamination_threshold: float = 0.5,
    split_weights: dict[str, float] | None = None,
    with_report: bool = False,
) -> DataFrame | tuple[DataFrame, CorpusPipelineReport]:
    """Curate a raw documents frame into a training corpus.

    Returns the surviving rows with all input columns plus:
      * ``url_canonical`` — the dedup/merge identity
      * ``split``         — train/val/test label (deterministic_split)

    Stages (each optional knob disables its stage):
      1. canonicalize urls; drop rows whose canonical url duplicates an
         earlier one (lowest id wins) — crawl re-fetch collapse
      2. ``domain_cap_n``: per-registered-domain quota (WindowGroupLimit)
      2b. ``line_dedup_max_docs``: CCNet-style line-level boilerplate
          removal BEFORE document-level dedup (stripping shared banners
          first is what lets near-identical pages become exact/near dups);
          replaces the text column with the cleaned text.  Off by default.
      3. exact content dedup (lowest id per md5)
      4. ``near_dup``: MinHash+LSH candidate pairs -> connected components
         -> keep the lowest id per near-dup cluster
      4b. ``semantic_tau``: SemDeDup stage — hashing-TF embeddings
          (``text_embed.tf_hash_embedding``, dim=``semantic_dim``) ->
          ``semantic_dedup`` with k=``semantic_k`` cosine cells; drops
          paraphrase/template variants whose token MULTISETS (not sets)
          nearly coincide but that survive shingle-based LSH.  Off by
          default (it adds a k-means training pass over the survivors).
      5. ``min_words``: C4/Gopher-style quality filter (keep==true)
      5b. ``ppl_band``: CCNet-style perplexity band over a self-trained
          bigram LM (operators/ngram_lm.py); docs outside [lo, hi] — and
          docs too short to score — are dropped.  Off by default.
      6. ``evalset``: drop train docs that CONTAIN >= threshold of any
         eval doc's shingles (eval-side coverage via
         contaminated_train_docs — catches a short benchmark item embedded
         verbatim in a long page, which a train-side fraction would miss)
      7. split assignment (never drops rows)
    """
    report = CorpusPipelineReport()

    def _note(name: str, df: DataFrame) -> DataFrame:
        if with_report:
            report.stages[name] = df.count()
        return df

    out = docs.withColumn("url_canonical", canonicalize_url(F.col(url_col)))
    # one survivor per canonical url (re-crawls of the same page);
    # row_number()==1 -> WindowGroupLimit, so a hot url pre-trims map-side
    w = Window.partitionBy("url_canonical").orderBy(F.col(id_col).asc())
    out = (
        out.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") == 1).drop("_r")
    )
    out = _note("url_unique", out)

    if domain_cap_n is not None:
        out = _note(
            "domain_capped", domain_cap(out, domain_cap_n, url_col=url_col, id_col=id_col)
        )

    if line_dedup_max_docs is not None:
        cleaned = line_dedup(
            out, id_col, text_col, max_line_docs=line_dedup_max_docs
        ).select(id_col, "text_clean")
        out = _note(
            "line_deduped",
            out.drop(text_col)
            .join(cleaned, id_col)
            .withColumnRenamed("text_clean", text_col),
        )

    out = _note("exact_deduped", dedup_exact(out, id_col, text_col))

    if near_dup:
        # connected_components is ITERATIVE — it materializes the pair list
        # (persist + count) during this call, forcing everything upstream.
        # Checkpoint the survivors first so that forced pass is reused by
        # the sink action instead of recomputing canonicalize/cap/dedup
        # twice.  localCheckpoint (not persist): persist() pins the blocks
        # in the CacheManager for the application lifetime unless the
        # CALLER unpersists — repeated pipeline runs in one session
        # accumulate cached partitions.  A checkpoint's blocks are owned by
        # the RDD reference, so the ContextCleaner reclaims them once the
        # returned frame is garbage-collected; eager=False keeps the
        # materialization timing identical (first action = the CC stage).
        out = out.localCheckpoint(eager=False)
        sig = minhash_signatures_fused(
            out, id_col, text_col, k=shingle_k, num_hashes=num_hashes
        )
        pairs = lsh_candidate_pairs(sig, id_col, num_hashes=num_hashes, bands=bands)
        comp = connected_components(pairs)
        keep = cluster_keep_list(comp)
        drop = comp.join(keep, "cluster_id").filter(
            F.col("doc_id") != F.col("keeper")
        ).select(F.col("doc_id").alias(id_col))
        out = _note("near_dup_removed", out.join(drop, id_col, "left_anti"))

    if semantic_tau is not None:
        from ape_dts_spark.operators.semantic_dedup import semantic_dedup
        from ape_dts_spark.operators.text_embed import tf_hash_embedding

        # the k-means trainer iterates (driver-side centroid loop forcing
        # the upstream per round) — checkpoint the survivors first so each
        # iteration re-reads a materialized frame, not the whole pipeline
        out = out.localCheckpoint(eager=False)
        emb = tf_hash_embedding(out, id_col=id_col, text_col=text_col, dim=semantic_dim)
        _, sem_drops = semantic_dedup(
            emb, k=semantic_k, tau=semantic_tau, id_col=id_col, vec_col="embedding"
        )
        out = _note(
            "semantic_dedup_removed",
            out.join(
                sem_drops.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
            ),
        )

    if min_words:
        keepers = quality_filter(out, id_col, text_col, min_words=min_words).filter(
            "keep"
        ).select(id_col)
        out = _note("quality_kept", out.join(keepers, id_col, "left_semi"))

    if ppl_band is not None:
        # CCNet-style LM band: score survivors under a bigram LM
        # self-trained on THIS corpus (in-corpus statistic — boilerplate
        # scores low, gibberish high) and keep the [lo, hi] band.  Pass a
        # pre-trained model via operators.ngram_lm directly when scoring
        # against a trusted reference corpus instead.
        lo, hi = ppl_band
        out = _note(
            "ppl_band_kept",
            ppl_filter(out, lo=lo, hi=hi, id_col=id_col, text_col=text_col),
        )

    if evalset is not None:
        # eval-side coverage: drop any train doc CONTAINING >= threshold of
        # some eval doc's shingles.  (A train-side fraction would dilute a
        # short benchmark item embedded in a long page to ~0 and miss it —
        # that audit direction lives in `decontaminate`.)
        contaminated = contaminated_train_docs(
            out,
            evalset,
            id_col=id_col,
            text_col=text_col,
            k=shingle_k,
            threshold=contamination_threshold,
        ).select(id_col)
        out = _note("decontaminated", out.join(contaminated, id_col, "left_anti"))

    out = deterministic_split(out, split_weights or {"train": 0.98, "val": 0.01, "test": 0.01}, id_col)
    return (out, report) if with_report else out
