"""MERGE INTO — bucket-pruned copy-on-write upsert/delete apply.

The single operator that replaces the reference's whole sink layer: batched
DELETE + batched INSERT/REPLACE + serial UPDATE with retry fallbacks
(reference dt-connector/src/sinker/mysql/mysql_sinker.rs:42-247,
rdb_query_builder.rs:122-351) and the foxlake lake-merge two-phase push
(sinker/foxlake/foxlake_merger.rs:49-118 — `MERGE INTO ... DEDUPLICATION=
'SOURCE'`), which is the reference's own lake-sink precedent for this shape.

Scale design (10^10 rows / 100 TB target):
* The target table is bucket(N, url)-partitioned.  The merge source is
  assigned the same bucket transform, so only **affected buckets** are read
  and rewritten — write amplification is O(touched buckets), not O(table).
* Target-side scan is file-pruned via the manifest (no task ever opens an
  unaffected bucket's files).
* The "join" is expressed as union + per-key LWW window partitioned by the
  bucket-aligned key, so the only shuffle is one hash exchange of
  (target-affected ∪ source) on the key — no separate join shuffle, and
  pre-merge salting + AQE skew handling bound hot-url skew.
* Idempotence: every surviving row stores `last_lsn`; replaying an already
  applied slice makes the stored row win/tie the LWW window, so the rewrite
  is a value-identical no-op.  This is the reference's REPLACE-based
  idempotence (docs/en/config.md:30) made exact.
* Row counts come from the Observation API (metrics piggyback on the write
  job — no extra count() pass over the data).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ape_dts_spark.lake.table import BUCKET_COL, LakeTable, spark_type
from ape_dts_spark.operators.dedup import lww_dedup

OP_COL = "op"
LSN_COL = "lsn"
LAST_LSN_COL = "last_lsn"


@dataclass
class MergeStats:
    affected_buckets: list[int]
    source_rows: int
    output_rows: int
    deleted_rows: int
    new_version: int
    wall_ms: int
    skipped: bool = False


def merge_into(
    spark: SparkSession,
    table: LakeTable,
    changes: DataFrame,
    properties: dict[str, str] | None = None,
    dedup_source: bool = True,
) -> MergeStats:
    """Apply a keyed change batch (op in insert|update|delete, lsn-ordered).

    `changes` columns: the table's payload columns (current schema, minus
    `last_lsn`; missing payload columns are null-padded) + `op` + `lsn`.
    insert/update are both upserts (reference REPLACE semantics,
    docs/en/config.md:30); delete removes the row.  One committed snapshot
    per call.
    """
    key = table.manifest.bucket_key
    t0 = time.monotonic()

    src = lww_dedup(changes, [key], LSN_COL) if dedup_source else changes
    src = src.withColumn(BUCKET_COL, table.bucket_expr())

    # Bucket pruning: which of the N buckets does this batch touch?  A tiny
    # collect (<= bucket_count ints) — the lake analog of partition pruning.
    affected = sorted(r[0] for r in src.select(BUCKET_COL).distinct().collect())
    if not affected:
        return MergeStats([], 0, 0, 0, table.version, int((time.monotonic() - t0) * 1000), True)

    types = {f["name"]: f["type"] for f in table.schema.fields}
    payload_cols = [f["name"] for f in table.schema.fields if f["name"] != LAST_LSN_COL]

    target = table.read(spark, buckets=affected)
    t_side = target.select(
        *[F.col(c) for c in payload_cols],
        F.col(LAST_LSN_COL).alias("_order"),
        F.lit(0).alias("_src"),
        F.lit("upsert").alias("_op"),
    )
    s_side = src.select(
        *[
            (
                F.col(c).cast(spark_type(types[c]))
                if c in src.columns
                else F.lit(None).cast(spark_type(types[c]))
            ).alias(c)
            for c in payload_cols
        ],
        F.col(LSN_COL).cast("long").alias("_order"),
        F.lit(1).alias("_src"),
        F.when(F.col(OP_COL) == "delete", F.lit("delete")).otherwise(F.lit("upsert")).alias("_op"),
    )

    obs_src = Observation()
    s_side = s_side.observe(obs_src, F.count(F.lit(1)).alias("rows"))

    merged = lww_dedup(
        t_side.unionByName(s_side),
        [key],
        order_col="_order",
        tiebreak_cols=["_src"],
        two_phase=False,  # source already deduped; target has 1 row/key
    )
    obs_out = Observation()
    merged = merged.observe(
        obs_out,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("_op") == "delete", 1).otherwise(0)).alias("deletes"),
    )
    survivors = (
        merged.filter(F.col("_op") != "delete")
        .withColumn(LAST_LSN_COL, F.col("_order"))
        .withColumn(BUCKET_COL, table.bucket_expr())
        .drop("_order", "_src", "_op")
    )

    new_version = table.overwrite_buckets(survivors, affected, properties=properties)

    out = obs_out.get
    return MergeStats(
        affected_buckets=affected,
        source_rows=int(obs_src.get["rows"]),
        output_rows=int(out["rows"]) - int(out["deletes"] or 0),
        deleted_rows=int(out["deletes"] or 0),
        new_version=new_version,
        wall_ms=int((time.monotonic() - t0) * 1000),
    )
