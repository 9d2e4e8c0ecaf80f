"""Structured Streaming tail: files arriving -> foreachBatch MERGE, resumable."""

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
