"""Hashing-trick TF document embeddings — text -> array<float>, no model.

The ANN / quantization / embedding-near-dup family (`similarity.py`)
consumes an ``array<float>`` column; real corpora get it from a neural
encoder, which isn't available here (and whose inference belongs outside
the engine anyway).  The classical model-free stand-in is the **hashing
trick** (feature hashing, Weinberger et al. 2009; sklearn
``HashingVectorizer``): bucket = md5(word) mod dim, value = term
frequency, L2-normalized.  Deterministic, engine-portable (the md5-slot
arithmetic is the split/sample family's), and it preserves exactly the
structure near-dup detection needs — near-identical token multisets map
to near-identical vectors, so cosine similarity works unchanged.

Two forms:

* ``tf_hash_sparse`` — long form ``(id, bucket, tf, weight)``: one row
  per non-zero bucket.  This is the oracle-able form (plain SQL grouping)
  and the storage-efficient one (a 10^10-doc corpus stores O(tokens)
  rows, not dim floats/doc).
* ``tf_hash_embedding`` — dense ``(id, embedding array<float>)`` built
  from the sparse form with ``map_from_entries`` + one ``transform`` over
  ``sequence(0, dim-1)`` — a narrow projection after the same single
  groupBy shuffle; feeds ``similarity.brute_force_topk`` /
  ``quantize_embeddings`` / ``embedding_near_dups`` directly.

Scale shape: one explode (the corpus token stream — same volume as the
minhash shingle path) into one map-side-combined groupBy(id, bucket);
the dense build is per-row array construction, no extra shuffle.  No
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ape_dts_spark.operators.ngram_lm import _tokens


def _bucket(word_col, dim: int):
    """md5-slot bucket in [0, dim) — mirrors DuckDB
    ``('0x' || substr(md5(word), 1, 12))::BIGINT % dim`` exactly."""
    return F.pmod(
        F.conv(F.substring(F.md5(word_col), 1, 12), 16, 10).cast("long"),
        F.lit(dim),
    ).cast("int")


def tf_hash_sparse(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """(id, bucket, tf, weight) — weight = tf / l2_norm(doc), rounded.

    Docs with no tokens produce no rows (their vector is all-zero and has
    no norm)."""
    toks = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("_w"))
    tf = toks.groupBy(id_col, _bucket(F.col("_w"), dim).alias("bucket")).agg(
        F.count(F.lit(1)).alias("tf")
    )
    # per-doc L2 norm via a second small aggregation joined back: a window
    # over id_col would funnel each doc onto one task anyway (fine — docs
    # are tiny), but groupBy+join keeps the pattern consistent with the
    # repo's no-window-count rule and reuses the same hash partitioning.
    norms = tf.groupBy(id_col).agg(F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("_n"))
    return tf.join(norms, id_col).select(
        id_col,
        "bucket",
        "tf",
        F.round(F.col("tf") / F.col("_n"), round_to).alias("weight"),
    )


def tf_hash_embedding(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
) -> DataFrame:
    """(id, embedding: array<float>) — the dense L2-normalized vector.

    Built from the sparse form: collect each doc's (bucket -> weight) map
    (bounded: <= dim entries), then densify with one transform over
    sequence(0, dim-1).  Unrounded weights (full double precision) so
    downstream cosine math matches the float path bit-for-bit."""
    toks = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("_w"))
    tf = toks.groupBy(id_col, _bucket(F.col("_w"), dim).alias("bucket")).agg(
        F.count(F.lit(1)).alias("tf")
    )
    dense = tf.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("tf").cast("double")))
        ).alias("_m"),
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("_n"),
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.coalesce(F.col("_m")[i], F.lit(0.0)) / F.col("_n")).cast("float"),
    )
    return dense.select(id_col, emb.alias("embedding"))
