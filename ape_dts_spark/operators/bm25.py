"""BM25 relevance scoring over the corpus — retrieval for data curation.

Training-data pipelines use lexical retrieval in several places: pulling
candidate documents for a decontamination audit, mining domain-specific
subsets ("find docs about X"), and building weak labels for quality
classifiers.  BM25 (Robertson-Spärck Jones) is the standard statistic;
this is the Okapi form with the usual k1/b defaults:

    idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )          # Lucene form
    score(d,q) = sum over q's terms t of
        idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*|d|/avgdl))

Spark shape: document stats (per-doc term frequencies, doc lengths, df)
are the same explode -> map-side-combined groupBy pattern as the LM /
embedding family; the query is a handful of terms — a broadcast semi-join
prunes the corpus to docs containing at least one query term BEFORE any
scoring math, so a selective query touches a sliver of the posting rows.
All JVM codegen; floats only in the final scalar (rounded for engine
portability).

Tokenization is the family's `_norm_words` view (lowercase, whitespace),
so BM25 evidence, LM evidence, and dedup shingles read the same words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ape_dts_spark.operators.ngram_lm import _tokens


def bm25_score(
    docs: DataFrame,
    query: str | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """(id_col, score) for every doc matching >= 1 query term, BM25-scored.

    `query` is a raw string (tokenized with the family tokenizer) or a
    pre-split term list; duplicate query terms count once (standard bag-of-
    words query).  N and avgdl are corpus constants computed in one tiny
    aggregate (bounded driver traffic)."""
    if isinstance(query, str):
        terms = sorted({w for w in query.lower().split() if w})
    else:
        terms = sorted({w.lower() for w in query if w})
    if not terms:
        raise ValueError("bm25_score: empty query")

    toks = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("w"))
    lens = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
    if n_docs == 0:
        return docs.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)

    # posting rows for query terms only: the filter prunes the exploded
    # token stream map-side (a literal IN over <= |query| strings)
    tf = (
        toks.filter(F.col("w").isin(terms))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    per_term = (
        tf.join(df_, "w")
        .join(lens, id_col)
        .select(
            F.col(id_col),
            (idf * F.col("tf") * F.lit(k1 + 1.0) / norm).alias("_s"),
        )
    )
    return per_term.groupBy(id_col).agg(
        F.round(F.sum("_s"), round_to).alias("score")
    )
