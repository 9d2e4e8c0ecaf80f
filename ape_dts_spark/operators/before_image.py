"""True before-images for change events (reference RowData fidelity).

The reference's RowData carries real before/after images per event
(dt-common/src/meta/row_data.rs:19-26): the binlog hands the extractor the
prior row values for updates/deletes.  A lake-side engine consuming an
after-image-only stream must *reconstruct* them, and can — exactly — from
the two places the prior value can live:

* earlier in the same batch: event i's before-image is event i-1's
  after-image for the same key (a `lag()` window over (key, lsn)); if the
  previous event was a delete the row was absent, so before = NULL;
* the table itself: the FIRST event per key in a batch takes its
  before-image from the current committed table state (bucket-pruned
  lookup), or NULL if the key never existed (a true insert).

Scale shape: one window over (key) — shared with the LWW dedup's bucket
layout when the input carries the table's bucket column — plus one
bucket-pruned equi-join against the table limited to the buckets the batch
actually touches.  No driver-side iteration; the only collect is the
bounded distinct-bucket list (≤ bucket_count values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def attach_before_images(
    spark: SparkSession,
    pages,
    batch: DataFrame,
    key_col: str = "url",
    lsn_col: str = "lsn",
    op_col: str = "op",
    payload_cols: list[str] | None = None,
    before_col: str = "before",
) -> DataFrame:
    """Add a `before` struct column (NULL = row absent) to an LSN-ordered
    change batch, reconstructed from in-batch history + committed table state.

    `pages` is a LakeTable; payload_cols defaults to the columns present in
    both the batch and the table schema (minus key/op/lsn bookkeeping).
    """
    tbl_cols = set(pages.schema.names())
    payload_cols = payload_cols or [
        c
        for c in batch.columns
        if c in tbl_cols and c not in (key_col, op_col, lsn_col, "_bucket")
    ]

    w = Window.partitionBy(key_col).orderBy(lsn_col)
    rn = F.row_number().over(w)
    prev_op = F.lag(F.col(op_col)).over(w)
    in_batch_before = F.when(
        prev_op == "delete", F.lit(None)
    ).otherwise(F.struct(*[F.lag(F.col(c)).over(w).alias(c) for c in payload_cols]))
    lagged = batch.withColumn("_rn", rn).withColumn("_prev", in_batch_before)

    # committed state, pruned to the buckets this batch touches (bounded
    # driver list: at most bucket_count values)
    bcol = pages.bucket_expr(F.col(key_col))
    buckets = sorted(
        r[0] for r in batch.select(bcol.alias("b")).distinct().collect()
    )
    state = pages.read(spark, buckets=buckets)
    state_cols = [c for c in payload_cols if c in state.columns]
    state = state.select(
        F.col(pages.manifest.bucket_key).alias(key_col),
        F.struct(*[F.col(c).alias(c) for c in state_cols]).alias("_tbl_before"),
    )

    joined = lagged.join(state, on=key_col, how="left")
    before = F.when(F.col("_rn") == 1, F.col("_tbl_before")).otherwise(F.col("_prev"))
    return joined.withColumn(before_col, before).drop("_rn", "_prev", "_tbl_before")
