"""Text analysis for training-data pipelines — all JVM-side built-ins.

Language ID (stopword-marker heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting.  Every function is a pure Column expression -> whole-stage
codegen, no UDFs, deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ape_dts_spark.operators.text_dedup import _spread

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

# tiny marker lexicons per language — deterministic n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def _words(col):
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (runs of letters/digits/
    punctuation as separate tokens — the standard pretokenizer split)."""
    ws = F.size(F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0))
    # RE2-safe pretokenizer (no lookarounds): letter/digit runs and single
    # punctuation marks each count as one token
    bpe_ish = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))
    return docs.select(
        F.col(id_col),
        ws.cast("long").alias("n_tokens_ws"),
        bpe_ish.cast("long").alias("n_tokens_bpe"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher/C4-style cheap quality signals + a composite score in [0,1]."""
    words = F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    punct_chars = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct_chars / n_chars).otherwise(F.lit(0.0))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.2
        + alpha_ratio * 0.2
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.2
    )
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: count marker hits per language, take
    the argmax — ties broken by the lexicographically LATEST language code
    (fr > es > en > de), 'und' if nothing hits.  The DuckDB oracle encodes
    the same tie-break (its CASE tests codes in descending order)."""
    words = _words(F.col(text_col))

    def _hits(markers):
        # NB: the HOF lambda must be single-arg — a second (default) arg would
        # be interpreted by Spark as the element-index parameter
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    scores = [
        F.struct(_hits(markers).alias("hits"), F.lit(lang).alias("lang"))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # argmax: descending struct sort = highest hits first, ties -> latest code
    arr = F.sort_array(F.array(*scores), asc=False)
    best = arr[0]
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return docs.select(F.col(id_col), pred.alias("pred_lang"), best["hits"].cast("long").alias("marker_hits"))


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 60,
    min_stop_ratio: float = 0.03,
    max_punct_ratio: float = 0.2,
    min_alpha_ratio: float = 0.5,
) -> DataFrame:
    """C4/Gopher-style keep/drop decision over the quality signals.

    -> (id, keep, drop_reason): first failing rule wins, in a fixed order
    (too_short -> low_stopword -> high_punct -> low_alpha), reason NULL for
    keepers.  Built on quality_score's ROUNDED signals so the decision is
    bit-reproducible across engines; pure Column expressions on top of the
    same single-pass scan."""
    q = quality_score(docs, id_col, text_col)
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("stopword_ratio") < min_stop_ratio, F.lit("low_stopword"))
        .when(F.col("punct_ratio") > max_punct_ratio, F.lit("high_punct"))
        .when(F.col("alpha_ratio") < min_alpha_ratio, F.lit("low_alpha"))
        .otherwise(F.lit(None).cast("string"))
    )
    return q.select(
        F.col(id_col),
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document.

    - ttr: type-token ratio (distinct words / words) — low = repetitive
    - top_word_frac: share of the single most frequent word
    - dup_bigram_frac: share of bigram occurrences that are repeats

    ttr and dup_bigram_frac are pure array expressions (size vs
    size∘array_distinct) — zero shuffle, whole-stage codegen.  top_word_frac
    needs a per-(doc, word) count: one explode + two aggs, partitioned by
    doc_id so it scales linearly with the corpus (no global state).
    """
    words = F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0)
    n = F.size(words)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
    )
    base = _spread(docs).select(
        F.col(id_col),
        words.alias("_w"),
        n.alias("_n"),
        F.size(F.array_distinct(words)).alias("_types"),
        F.size(bigrams).alias("_nb"),
        F.size(F.array_distinct(bigrams)).alias("_db"),
    )
    top = (
        base.select(F.col(id_col), F.explode("_w").alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("_top"))
    )
    return (
        base.join(top, id_col)
        .select(
            F.col(id_col),
            F.col("_n").cast("long").alias("n_words"),
            F.round(F.col("_types") / F.col("_n"), 4).alias("ttr"),
            F.round(F.col("_top") / F.col("_n"), 4).alias("top_word_frac"),
            F.round((F.col("_nb") - F.col("_db")) / F.col("_nb"), 4).alias("dup_bigram_frac"),
        )
    )


def length_histogram(
    docs: DataFrame, lang_col: str = "lang", chars_col: str = "n_chars", width: int = 50
) -> DataFrame:
    """Corpus length profile: (lang, bucket_lo, n_docs, avg_chars) — the
    standard pre-training length-distribution audit.  One partial-agg
    shuffle on (lang, bucket); avg over exact integer sums so it is
    engine-portable bit-for-bit."""
    bucket = (F.floor(F.col(chars_col) / width) * width).cast("long")
    return (
        docs.groupBy(F.col(lang_col).alias("lang"), bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(chars_col), 2).alias("avg_chars"),
        )
    )


def corpus_ngram_topk(
    docs: DataFrame, text_col: str = "text", k: int = 2, topn: int = 20
) -> DataFrame:
    """Corpus-wide top-N k-gram frequency (the boilerplate/contamination
    scan).  Map-side: per-doc k-gram arrays (codegen).  One shuffle:
    groupBy(ngram) with partial aggregation, then a global top-N — the
    ordering key (count desc, ngram asc) is total, so the cut is
    deterministic.  At 10^10 docs the groupBy output is vocabulary-sized
    (<< corpus) and the top-N is a single reduce of per-partition heads."""
    words = F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0)
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
    )
    return (
        _spread(docs).select(F.explode(grams).alias("ngram"))
        .filter(F.length("ngram") > 0)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(topn)
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprints: full-text digest, normalized digest (case/space
    insensitive), and a head fingerprint over the first 8 words — the cheap
    building blocks of URL-level / doc-level dedup cascades."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    head = F.concat_ws(" ", F.slice(_words(F.col(text_col)), 1, 8))
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("digest"),
        F.md5(F.trim(norm)).alias("digest_norm"),
        F.md5(head).alias("digest_head"),
    )
