"""Change-batch compaction — the Spark expression of the reference's RdbMerger.

The reference folds each ordered DML batch into per-key last-write maps with
delete/insert ordering and serial fallbacks (reference
dt-parallelizer/src/rdb_merger.rs:49-122, merge_parallelizer.rs:53-191).
Under an atomic MERGE sink all of that collapses to: keep the event with the
highest LSN per key ("last write wins"), because MERGE applies deletes,
updates and inserts in one transaction.  The reference's unmerged/collision/
NULL-key escape hatches disappear by construction (64-bit LSN total order, no
hash collisions on the key itself, NULL keys quarantined before merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Salt fan-out for the two-phase dedup. A url with a burst of B events first
# reduces to <= SALT_BUCKETS candidates map-side, so the final per-url window
# group is bounded — the analog of the reference's partition_parallelizer
# hash-lane split plus the north rule's hot-key salting.
DEFAULT_SALT = 16


def lww_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_col: str = "lsn",
    tiebreak_cols: list[str] | None = None,
    two_phase: bool = True,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Keep exactly one row per key: the one with the highest (order, tiebreak).

    Two-phase mode pre-reduces within (key, salt) partitions before the final
    per-key window — a map-side combine that bounds skew when single keys
    receive large event bursts (hot urls at 10^10-event scale).
    """
    order_exprs = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak_cols or [])]

    if two_phase and salt > 1:
        salt_col = F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt))
        w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_exprs)
        df = (
            df.withColumn("_salt", salt_col)
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
            .drop("_salt", "_rn")
        )

    w = Window.partitionBy(*key_cols).orderBy(*order_exprs)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def lww_dedup_bucket_aligned(
    df: DataFrame,
    key_cols: list[str],
    order_col: str = "lsn",
    bucket_col: str = "_bucket",
    tiebreak_cols: list[str] | None = None,
    key_salt: int = 1,
) -> DataFrame:
    """LWW dedup that shares its shuffle with the sink's bucket layout.

    `df` must already carry `bucket_col` = the target table's bucket
    transform (a function of the key, so all events of a key land in one
    bucket).  One hash shuffle on the bucket column + a sort by
    (key asc, order desc) within each bucket; the first row of every key
    run is the survivor, marked with a single `lag` comparison.

    Because the output's physical partitioning is hashpartitioning(bucket),
    the subsequent bucket-partitioned delta write needs NO further exchange
    — the whole merge prep is ONE shuffle (vs window-on-key + repartition-
    on-bucket = two to three).

    ``key_salt`` raises parallelism beyond bucket_count without changing
    the table layout: the window partitions by (bucket, hash(key) % S), so
    every key's rows still share a lane (dedup stays exact) but each bucket
    splits into S lanes — bucket_count x S concurrent tasks for the dedup /
    downstream UDF / write, and S files per bucket at the sink (the
    files-per-bucket knob: at 10^10 rows you want both a bounded bucket
    count for the layout AND write parallelism ~ executor count).
    """
    order_exprs = (
        [F.col(k).asc() for k in key_cols]
        + [F.col(order_col).desc()]
        + [F.col(c).desc() for c in (tiebreak_cols or [])]
    )
    part_cols = [bucket_col]
    if key_salt > 1:
        df = df.withColumn(
            "_ksalt", F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(key_salt))
        )
        part_cols.append("_ksalt")
    w = Window.partitionBy(*part_cols).orderBy(*order_exprs)
    key_struct = F.struct(*[F.col(k) for k in key_cols])
    prev = F.lag(key_struct).over(w)
    out = (
        df.withColumn("_is_first", prev.isNull() | (prev != key_struct))
        .filter(F.col("_is_first"))
        .drop("_is_first")
    )
    return out.drop("_ksalt") if key_salt > 1 else out


def split_updates(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Update -> Delete(before) + Insert(after) for append-only change-log sinks.

    Mirrors reference row_data.rs:71-82 (split_update_row_data); the MERGE path
    never needs this — it exists for change-feed outputs (Kafka-style sinks).
    Expects `before_*` columns for the before-image where available.
    """
    non_updates = df.filter(F.col(op_col) != "update")
    updates = df.filter(F.col(op_col) == "update")
    before_cols = [c for c in df.columns if c.startswith("before_")]
    as_delete = updates
    for bc in before_cols:
        as_delete = as_delete.withColumn(bc[len("before_") :], F.col(bc))
    as_delete = as_delete.withColumn(op_col, F.lit("delete"))
    as_insert = updates.withColumn(op_col, F.lit("insert"))
    return non_updates.unionByName(as_delete).unionByName(as_insert)


def split_key_change_updates(
    df: DataFrame, key_col: str = "url", before_key_col: str = "before_url", op_col: str = "op"
) -> DataFrame:
    """An update whose key changed becomes delete(old key) + insert(new key).

    The reference treats a PK/UK-changing update as unbatchable and falls back
    to serial apply (rdb_merger.rs:124-134, partition_parallelizer.rs:32-82).
    With an atomic MERGE we can instead split it into two independent keyed
    events (same lsn, different keys) that flow through the normal LWW+MERGE
    path — the sequential replay oracle applies the same rule.
    """
    if before_key_col not in df.columns:
        return df
    is_key_change = (
        (F.col(op_col) == "update")
        & F.col(before_key_col).isNotNull()
        & (F.col(before_key_col) != F.col(key_col))
    )

    # Single-pass explode (a filter+union-of-3 shape re-scans the source
    # three times; at 100 TB the batch scan is the dominant read cost).
    def mk(overrides: dict) -> F.Column:
        return F.struct(*[overrides.get(c, F.col(c)).alias(c) for c in df.columns])

    events = F.when(
        is_key_change,
        F.array(
            mk({key_col: F.col(before_key_col), op_col: F.lit("delete")}),
            mk({op_col: F.lit("insert")}),
        ),
    ).otherwise(F.array(mk({})))
    return df.select(F.explode(events).alias("_e")).select("_e.*")


def reverse_ops(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Insert<->Delete swap for reverse/undo streams (reference row_data.rs:54-69).

    The reference's reverse also swaps before/after images for updates; this
    stream carries after-images plus `before_*` key columns only, so the
    update reversal here swaps each `before_X` column with `X` (a reversed
    key-changing update points back at the old key).  Full-payload
    before-images are not modeled (see generator.py docstring) — a reversed
    update keeps its after-image payload, documented limitation."""
    out = df.withColumn(
        op_col,
        F.when(F.col(op_col) == "insert", F.lit("delete"))
        .when(F.col(op_col) == "delete", F.lit("insert"))
        .otherwise(F.col(op_col)),
    )
    is_upd = F.col(op_col) == "update"
    for bc in [c for c in df.columns if c.startswith("before_")]:
        cur = bc[len("before_") :]
        if cur in df.columns:
            swap_when = is_upd & F.col(bc).isNotNull()
            out = out.withColumns(
                {
                    cur: F.when(swap_when, F.col(bc)).otherwise(F.col(cur)),
                    bc: F.when(swap_when, F.col(cur)).otherwise(F.col(bc)),
                }
            )
    return out


def quarantine_null_keys(df: DataFrame, key_cols: list[str]) -> tuple[DataFrame, DataFrame]:
    """NULL in a key column disables safe merging in the reference
    (row_data.rs:186-196 NULL->0 hash rule, rdb_merger.rs:68-72 serial demotion).
    We quarantine such rows instead of merging them (url is NOT NULL by contract)."""
    cond = None
    for k in key_cols:
        c = F.col(k).isNull()
        cond = c if cond is None else (cond | c)
    return df.filter(~cond), df.filter(cond)
