"""Document deduplication for large-scale training-data pipelines.

Exact + near-duplicate detection over a `documents(doc_id, text, ...)`
table, expressed with built-in JVM-side functions wherever possible so the
hot path stays inside whole-stage codegen:

* exact:      hash-groupBy on a content digest (md5) — one shuffle.
* minhash+LSH: word-shingle -> K minhashes (md5-based, deterministic and
  engine-portable) -> band buckets -> candidate pairs via bucket self-join
  -> verified Jaccard.  The band join only pairs documents sharing a
  band signature, which is what makes this sub-quadratic at 10^10 docs.
* simhash:    per-token 64-bit signatures folded into a weighted bitwise
  majority fingerprint; near-dups = small hamming distance within
  prefix buckets.
* n-gram Jaccard: shingle-set overlap via explode + self-join on shingle,
  group by pair — exact verification path for small candidate sets.

All hashes are deterministic (md5 / xxhash64 of content only) so results
are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_words(col):
    return F.split(F.lower(F.trim(col)), r"\s+")


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (digest, n_docs, doc_ids, keeper)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id document per distinct content (the classic pass)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def word_shingles(docs: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document (JVM-side: split + transform + explode)."""
    words = _norm_words(F.col(text_col))
    n = F.size(words)
    idxs = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle_at = F.transform(
        idxs, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))
    )
    return (
        docs.select(F.col(id_col), F.array_distinct(shingle_at).alias("shingles"))
        .select(F.col(id_col), F.explode("shingles").alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """K deterministic minhashes per doc: min over md5(shingle || seed).

    md5 is used (not xxhash64) so an external SQL engine can reproduce the
    signature bit-for-bit — lexicographic min over hex digests.
    """
    mins = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Band the signature and self-join per band bucket -> candidate pairs.

    Each band's signature is the concat of its rows; docs agreeing on any
    band become a candidate pair.  Output: (a, b) with a < b, distinct.
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("sig")))
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets for pairs sharing >=1 shingle.

    inter(a,b) counted by the shingle self-join; union = |A|+|B|-inter.
    Quadratic in the worst case — use after LSH blocking at scale; exact on
    its own for small corpora / verification.
    """
    sh = word_shingles(docs, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit simhash fingerprint: per distinct word, xxhash64 -> +-1 votes
    per bit, summed; fingerprint bit b = 1 iff the vote is positive.

    Pure built-in expressions (explode + bitwise ops + aggregate), no UDF.
    """
    words = docs.select(
        F.col(id_col), F.explode(F.array_distinct(_norm_words(F.col(text_col)))).alias("w")
    ).filter(F.length("w") > 0)
    h = F.xxhash64(F.col("w"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = words.groupBy(id_col).agg(*votes)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dups(
    fps: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, prefix_bits: int = 16
) -> DataFrame:
    """Near-dup pairs = same high-prefix bucket AND hamming(simhash) <= k.

    Prefix bucketing bounds the self-join (standard simhash blocking); at
    scale you'd run 4 rotations to guarantee recall — exposed via
    `prefix_bits` so callers can compose rotations.
    """
    bucket = F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    b = fps.select(F.col(id_col), F.col("simhash"), bucket.alias("bucket"))
    l, r = b.alias("l"), b.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
