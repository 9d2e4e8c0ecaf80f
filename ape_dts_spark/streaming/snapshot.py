"""Chunked snapshot seed load with resume-by-chunk.

Reference: dt-connector/src/extractor/resumer/snapshot_resumer.rs — the
snapshot extractor records per-table/per-chunk progress in position.log and
skips finished ranges on restart, so a killed multi-hour seed load resumes
where it stopped instead of restarting from zero.

Spark-first expression: the seed frame is split into ``n_chunks``
deterministic hash chunks of the table's bucket key; each chunk is one
atomic LakeTable.append whose manifest **atomically** carries the updated
done-chunk set in the table properties.  A crash between commits loses at
most the in-flight chunk; resume re-reads the property and skips every
committed chunk — no duplicate rows, no lost rows (the chunk predicate is a
pure function of the key, identical across restarts).

At 10^10 rows each chunk is a full scan of the seed source restricted by
the chunk predicate; with a parquet source the predicate prunes row groups,
and n_chunks bounds both the replay-loss window and the per-commit size —
the same trade the reference makes with its keyset ranges
(mysql_snapshot_extractor.rs:229-421).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ape_dts_spark.lake.table import LakeTable

PROGRESS_KEY = "snapshot_done_chunks"
TOTAL_KEY = "snapshot_total_chunks"


def done_chunks(table: LakeTable, progress_key: str = PROGRESS_KEY) -> set[int]:
    raw = table.manifest.properties.get(progress_key, "")
    return {int(x) for x in raw.split(",") if x != ""}


def snapshot_complete(table: LakeTable) -> bool:
    total = table.manifest.properties.get(TOTAL_KEY)
    return total is not None and len(done_chunks(table)) >= int(total)


def snapshot_load(
    spark: SparkSession,
    table: LakeTable,
    seed_df: DataFrame,
    n_chunks: int = 16,
    chunk_key: str | None = None,
    crash_hook=None,
) -> dict:
    """Load (or resume loading) the snapshot seed into `table` chunk by chunk.

    Returns {"chunks_total", "chunks_loaded_now", "chunks_skipped"}.
    `chunk_key` defaults to the table's bucket key.  `crash_hook(stage, i)`
    is the test seam (raise to simulate a kill after chunk i committed).
    """
    if n_chunks < 1:
        raise ValueError("n_chunks must be >= 1")
    key = chunk_key or table.manifest.bucket_key
    if key is None:
        raise ValueError("chunked load needs a chunk_key (table has no bucket key)")
    table.refresh()
    prev_total = table.manifest.properties.get(TOTAL_KEY)
    if prev_total is not None and int(prev_total) != n_chunks:
        raise ValueError(
            f"resume with n_chunks={n_chunks} but the interrupted load used "
            f"{prev_total}; chunk predicates would not line up"
        )
    done = done_chunks(table)
    chunk_expr = F.pmod(F.xxhash64(F.col(key)), F.lit(n_chunks)).cast("int")
    loaded = 0
    for i in range(n_chunks):
        if i in done:
            continue
        part = seed_df.filter(chunk_expr == i)
        done.add(i)
        table.append(
            part,
            properties={
                PROGRESS_KEY: ",".join(str(x) for x in sorted(done)),
                TOTAL_KEY: str(n_chunks),
            },
        )
        loaded += 1
        if crash_hook is not None:
            crash_hook("post_chunk", i)
    return {
        "chunks_total": n_chunks,
        "chunks_loaded_now": loaded,
        "chunks_skipped": n_chunks - loaded,
    }
