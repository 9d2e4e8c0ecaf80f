"""Structured Streaming tail: files arriving -> foreachBatch MERGE, resumable."""

import os

import pandas as pd
from pyspark.sql import functions as F

from ape_dts_spark.functions.extract_text import extract_text_udf
from ape_dts_spark.lake.table import LakeTable
from ape_dts_spark.sources.generator import PAGES_COLS, gen_changes, gen_pages_seed
from ape_dts_spark.streaming.driver import EngineConfig
from ape_dts_spark.streaming.stream import start_stream
from tests.oracle import oracle_replay

N_SEED, N_EVENTS = 200, 600


def test_streaming_tail_converges_to_oracle(spark, tmp_path):
    changes_dir = str(tmp_path / "changes")
    # two arrival waves: files landing over time, as a real tail would see
    all_changes = gen_changes(spark, N_EVENTS, N_SEED, seed=42)
    all_changes.filter(F.col("lsn") <= 300).coalesce(2).write.mode("append").parquet(changes_dir)

    pages_path = str(tmp_path / "pages")
    t = LakeTable.create(pages_path, PAGES_COLS, bucket_key="url", bucket_count=8)
    t.append(
        gen_pages_seed(spark, N_SEED, seed=42).withColumn("text", extract_text_udf(F.col("html")))
    )
    cfg = EngineConfig(
        job_id="stream1",
        pages_path=pages_path,
        changes_path=changes_dir,
        batch_lsn_width=10**9,
    )
    q = start_stream(spark, cfg, available_now=True, max_files_per_trigger=1)
    q.awaitTermination(120)

    # second wave lands; a fresh availableNow query resumes from the
    # streaming checkpoint and consumes only the new files
    all_changes.filter(F.col("lsn") > 300).coalesce(2).write.mode("append").parquet(changes_dir)
    q2 = start_stream(spark, cfg, available_now=True, max_files_per_trigger=1)
    q2.awaitTermination(120)

    got = t.refresh().read(spark).toPandas().sort_values("url").reset_index(drop=True)
    want = oracle_replay(
        gen_pages_seed(spark, N_SEED, seed=42).toPandas(),
        pd.read_parquet(changes_dir),
        [],
    )
    assert list(got["url"]) == list(want["url"])
    assert list(got["last_lsn"]) == list(want["last_lsn"])
    for u, g, w in zip(got["url"], got["text"], want["text"]):
        assert g == w, f"text mismatch for {u}"


def test_rate_monitor_windowed_counts(spark, tmp_path):
    """Watermarked tumbling-window counters over a streamed change dir match
    the batch groupBy over the same data (append mode, availableNow)."""
    from ape_dts_spark.streaming.monitor import rate_monitor_frame, start_rate_monitor

    changes_dir = str(tmp_path / "mon_changes")
    ch = gen_changes(spark, 2000, 500, seed=7)
    ch.write.parquet(changes_dir)

    out = str(tmp_path / "mon_out")
    q = start_rate_monitor(
        spark,
        changes_dir,
        out_path=out,
        checkpoint_dir=str(tmp_path / "mon_ckpt"),
        window_duration="30 seconds",
        watermark_delay="10 seconds",
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expect = rate_monitor_frame(spark.read.parquet(changes_dir), window_duration="30 seconds")
    # availableNow + watermark: the tail windows past the final watermark
    # stay open (unemitted) — every EMITTED window must match batch exactly
    exp = {
        (r.window_start, r.op): (r.n_events, r.n_bytes) for r in expect.collect()
    }
    rows = got.collect()
    assert len(rows) > 0
    for r in rows:
        assert exp[(r.window_start, r.op)] == (r.n_events, r.n_bytes)


def test_stale_event_guard_drops_replayed_lsns(spark, tmp_path):
    """Cross-batch state: batch 1 applies lsn<=100 per key; a replayed batch
    carrying lsn<=100 events is filtered to only the genuinely new ones."""
    import time

    from ape_dts_spark.streaming.stateful import stale_event_guard

    src = str(tmp_path / "guard_src")
    out_dir = str(tmp_path / "guard_out")
    ckpt = str(tmp_path / "guard_ckpt")
    os.makedirs(src)

    b1 = spark.createDataFrame(
        [("u1", 10), ("u1", 100), ("u2", 50)], ["url", "lsn"]
    )
    b1.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    guarded = stale_event_guard(stream, key_col="url", lsn_col="lsn")

    def run_available(batch_writer_tag):
        q = (
            guarded.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available("b1")
    got1 = {(r.url, r.lsn) for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {("u1", 10), ("u1", 100), ("u2", 50)}

    # replay: u1 re-delivers 90/100 (stale) plus 120 (new); u2 only stale
    b2 = spark.createDataFrame(
        [("u1", 90), ("u1", 100), ("u1", 120), ("u2", 40)], ["url", "lsn"]
    )
    time.sleep(1.1)  # distinct file mtime for the file-source log
    b2.coalesce(1).write.mode("append").parquet(src)
    run_available("b2")
    got2 = {(r.url, r.lsn) for r in spark.read.parquet(out_dir).collect()}
    assert got2 == got1 | {("u1", 120)}


def test_streaming_tail_with_stale_guard_converges(spark, tmp_path):
    """Same two-wave tail, stale_guard=True, with wave 2 REPLAYING all of
    wave 1's files plus the new events (an at-least-once upstream): the
    stateful guard drops the stale lsns and the final table still equals
    the sequential oracle."""
    changes_dir = str(tmp_path / "sg_changes")
    all_changes = gen_changes(spark, N_EVENTS, N_SEED, seed=42)
    all_changes.filter(F.col("lsn") <= 300).coalesce(1).write.mode("append").parquet(changes_dir)

    pages_path = str(tmp_path / "sg_pages")
    t = LakeTable.create(pages_path, PAGES_COLS, bucket_key="url", bucket_count=8)
    t.append(
        gen_pages_seed(spark, N_SEED, seed=42).withColumn("text", extract_text_udf(F.col("html")))
    )
    cfg = EngineConfig(
        job_id="stream_sg",
        pages_path=pages_path,
        changes_path=changes_dir,
        batch_lsn_width=10**9,
    )
    q = start_stream(spark, cfg, available_now=True, stale_guard=True)
    q.awaitTermination(120)

    # wave 2: a NEW file that re-delivers wave 1 (stale) plus the tail
    import time

    time.sleep(1.1)
    all_changes.coalesce(1).write.mode("append").parquet(changes_dir)
    q2 = start_stream(spark, cfg, available_now=True, stale_guard=True)
    q2.awaitTermination(180)

    got = t.refresh().read(spark).toPandas().sort_values("url").reset_index(drop=True)
    want = oracle_replay(
        gen_pages_seed(spark, N_SEED, seed=42).toPandas(),
        pd.DataFrame(all_changes.toPandas()),
        [],
    )
    assert list(got["url"]) == list(want["url"])
    assert list(got["last_lsn"]) == list(want["last_lsn"])
