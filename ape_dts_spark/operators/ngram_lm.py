"""CCNet-style n-gram LM perplexity scoring/filtering — pure DataFrame ops.

The curation pipelines of CCNet / RedPajama / FineWeb score every crawled
page against a language model trained on a trusted corpus and keep (or
bucket by) a perplexity band: boilerplate and gibberish score high, natural
prose scores low.  The production versions use a KenLM 5-gram model; that
binary format and its libs aren't available (and a UDF calling one would be
the slow path anyway), so this module implements the same statistic as a
**Spark-native add-one-smoothed bigram LM**: training is two
`explode -> groupBy` count jobs (map-side combine collapses hot n-grams
per task), scoring is two hash joins plus one per-doc aggregation — all
JVM-side codegen, no Python in the hot path.

    p(w2 | w1) = (count(w1 w2) + 1) / (context(w1) + V)
    ppl(doc)   = exp( - mean over the doc's bigrams of ln p(w2|w1) )

where `context(w1)` = number of training bigrams starting with `w1` and
`V` = distinct-token vocabulary size of the training corpus.  Docs with
fewer than two tokens have no bigrams and are omitted from the scored
frame (callers decide their fate; `ppl_filter(keep_unscored=...)`).

Tokenization is the dedup family's `_norm_words` (lowercase, whitespace
split) so LM evidence and minhash/simhash evidence read the same words,
and so the DuckDB oracle (`string_split_regex(lower(trim(text)), '\\s+')`)
mirrors it exactly.

Scale shape at 10^10 docs: the bigram explode is the same volume as the
minhash shingle path (already the engine's proven pattern); the two count
tables are orders smaller than the corpus after map-side combine; scoring
joins on (w1,w2)/(w1) are shuffled hash joins — stop-word contexts are hot
keys, but joins (unlike windows) AQE-skew-split, and Spark auto-broadcasts
the count tables outright when the vocabulary fits the broadcast threshold.
No stage funnels a hot key into one task.

Reference analog: none in ape-dts (a CDC engine); this extends the
repo's training-data curation family (SURVEY §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ape_dts_spark.operators.text_dedup import _norm_words


def _tokens(text_col):
    """Non-empty normalized words — MUST stay the dedup family's view."""
    return F.filter(_norm_words(F.col(text_col)), lambda w: F.length(w) > 0)


def _bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, bigram): id_col, w1, w2.  Docs with <2 tokens
    contribute nothing.  zip_with over two shifted slices stays inside one
    narrow codegen projection — no (doc, position) row ever materializes."""
    ts = _tokens(text_col)
    # docs with <2 tokens (incl. empty/NULL text) yield size 0 or 1 —
    # clamp the slice length at 0 so they produce zero bigrams, not an
    # INVALID_PARAMETER_VALUE error
    n = F.greatest(F.size(ts) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(ts, 1, n),
        F.slice(ts, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # the pair array is inlined INTO the explode in one select: aliasing it
    # in a lower Project and exploding the column triggers
    # InferFiltersFromGenerate + predicate pushdown, which re-evaluates the
    # whole interpreted zip_with expression below any upstream exchange on
    # the un-spread input (see word_shingles in text_dedup.py; measured ~8x
    # on sf0.1).  The explicit size guard is redundant for an inner explode
    # (an empty/NULL array emits no rows).
    return docs.select(F.col(id_col), F.explode(pairs).alias("_g")).select(
        id_col, F.col("_g.w1").alias("w1"), F.col("_g.w2").alias("w2")
    )


@dataclass
class BigramLM:
    """Trained model: two count frames + the vocab size (a scalar).

    `counts`/`contexts` are lazy DataFrames — persist them (or write them
    out) when scoring many batches against one model; `vocab_size` is the
    single eagerly-computed number (bounded driver traffic)."""

    counts: DataFrame  # (w1, w2, c)
    contexts: DataFrame  # (w1, cc)
    vocab_size: int


def bigram_lm(train_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> BigramLM:
    """Train the add-one bigram LM.  Two shuffles (both map-side combined)
    plus one count-distinct action for V."""
    big = _bigrams(train_docs, id_col, text_col)
    counts = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    contexts = counts.groupBy("w1").agg(F.sum("c").alias("cc"))
    vocab = (
        train_docs.select(F.explode(_tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w"))
        .first()[0]
    )
    return BigramLM(counts=counts, contexts=contexts, vocab_size=int(vocab or 0))


def perplexity(
    docs: DataFrame,
    lm: BigramLM | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 2,
) -> DataFrame:
    """(id_col, n_bigrams, ppl) per doc with >=1 bigram.

    `lm=None` self-trains on `docs` (the in-corpus statistic: a doc's
    perplexity under its own corpus — boilerplate scores low, gibberish
    high); pass a model trained on a trusted corpus for CCNet semantics.
    `ppl` is rounded (default 2 dp) so the value is engine-portable:
    ln/exp on identical doubles agree across engines, only the float
    summation order differs, and rounding absorbs that."""
    if lm is None:
        lm = bigram_lm(docs, id_col, text_col)
    big = _bigrams(docs, id_col, text_col)
    denom = F.coalesce(F.col("cc"), F.lit(0)).cast("double") + F.lit(float(lm.vocab_size))
    logp = F.log((F.coalesce(F.col("c"), F.lit(0)).cast("double") + 1.0) / denom)
    return (
        big.join(lm.counts, ["w1", "w2"], "left")
        .join(lm.contexts, ["w1"], "left")
        .select(F.col(id_col), logp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.exp(-F.sum("_lp") / F.count(F.lit(1))), round_to).alias("ppl"),
        )
    )


def ppl_filter(
    docs: DataFrame,
    lo: float = 0.0,
    hi: float = float("inf"),
    lm: BigramLM | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_unscored: bool = False,
) -> DataFrame:
    """Keep docs whose perplexity lies in [lo, hi] — the CCNet band filter.

    `keep_unscored` decides docs with <2 tokens (no bigrams, hence no
    score); CCNet drops them, so the default does too."""
    scored = perplexity(docs, lm=lm, id_col=id_col, text_col=text_col)
    inband = scored.filter((F.col("ppl") >= lo) & (F.col("ppl") <= hi)).select(id_col)
    kept = docs.join(inband, id_col, "left_semi")
    if keep_unscored:
        unscored = docs.join(scored.select(id_col), id_col, "left_anti")
        kept = kept.unionByName(unscored)
    return kept
