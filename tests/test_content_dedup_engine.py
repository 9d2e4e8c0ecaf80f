"""Ingest-time content dedup wired into the CDC engine: inserts whose
extracted text the ContentIndex has seen are dropped before the MERGE;
updates/deletes pass through; the index survives engine restarts; the
knob is off by default."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ape_dts_spark.functions.extract_text import extract_text_udf
from ape_dts_spark.lake.table import LakeTable
from ape_dts_spark.sources.generator import PAGES_COLS, gen_pages_seed
from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig

H1 = b"<html><body>alpha beta gamma delta content</body></html>"
H2 = b"<html><body>completely different page words here</body></html>"
H3 = b"<html><body>third distinct body for the resume run</body></html>"

_SCHEMA = (
    "lsn long, op string, url string, before_url string, warc_ts timestamp,"
    " html binary, lang string, fetch_status int, tx_id long, origin string"
)


def _ev(lsn, op, url, html):
    return (
        lsn,
        op,
        url,
        None,
        datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=lsn),
        html,
        "en" if html is not None else None,
        200 if html is not None else None,
        lsn // 2,
        "node1",
    )


def _setup(spark, tmp_path, events, **cfg_kw):
    pages = LakeTable.create(str(tmp_path / "pages"), PAGES_COLS, bucket_key="url", bucket_count=4)
    seed = gen_pages_seed(spark, 4, seed=7).withColumn("text", extract_text_udf(F.col("html")))
    pages.append(seed)
    spark.createDataFrame(events, _SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "changes")
    )
    cfg = EngineConfig(
        job_id="cd1",
        pages_path=pages.path,
        changes_path=str(tmp_path / "changes"),
        batch_lsn_width=2,
        **cfg_kw,
    )
    return pages, cfg


EVENTS = [
    # batch 1 (lsn 1-2): first sighting of H1; a distinct page H2
    _ev(1, "insert", "https://a.com/1", H1),
    _ev(2, "insert", "https://a.com/2", H2),
    # batch 2 (lsn 3-4): H1 re-crawled under a NEW url -> content dup;
    # an update re-serving H1 on an existing url -> must pass through
    _ev(3, "insert", "https://a.com/3", H1),
    _ev(4, "update", "https://a.com/2", H1),
    # batch 3 (lsn 5-6): another H2 re-crawl -> dup; a delete passes through
    _ev(5, "insert", "https://a.com/5", H2),
    _ev(6, "delete", "https://a.com/1", None),
]


def test_content_dups_dropped_updates_and_deletes_pass(spark, tmp_path):
    pages, cfg = _setup(
        spark, tmp_path, EVENTS, content_index_path=str(tmp_path / "cidx")
    )
    eng = CdcEngine(spark, cfg)
    eng.run()
    final = {
        r["url"]: r["text"] for r in pages.refresh().read(spark).collect()
    }
    assert "https://a.com/3" not in final  # H1 re-crawl dropped
    assert "https://a.com/5" not in final  # H2 re-crawl dropped
    assert "https://a.com/1" not in final  # deleted
    # the update re-serving H1 applied (key identity governs updates)
    h1_text = extract_text_udf.func(pd.Series([H1])).iloc[0]
    assert final["https://a.com/2"] == h1_text
    # per-batch drop counters
    assert [b["content_dups"] for b in eng.batch_log] == [0, 1, 1]
    assert eng._cidx.stats()["total_keys"] == 2  # H1, H2 first sightings


def test_off_by_default_applies_everything(spark, tmp_path):
    pages, cfg = _setup(spark, tmp_path, EVENTS)
    CdcEngine(spark, cfg).run()
    urls = {r["url"] for r in pages.refresh().read(spark).collect()}
    assert {"https://a.com/3", "https://a.com/5"} <= urls


def test_index_survives_restart(spark, tmp_path):
    pages, cfg = _setup(
        spark, tmp_path, EVENTS, content_index_path=str(tmp_path / "cidx")
    )
    CdcEngine(spark, cfg).run()
    # extend the stream: one fresh page (H3) and one stale re-crawl (H1)
    more = EVENTS + [
        _ev(7, "insert", "https://a.com/7", H3),
        _ev(8, "insert", "https://a.com/8", H1),
    ]
    spark.createDataFrame(more, _SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "changes")
    )
    eng2 = CdcEngine(spark, cfg)
    eng2.run()
    final = {r["url"] for r in pages.refresh().read(spark).collect()}
    assert "https://a.com/7" in final  # fresh content ingested
    assert "https://a.com/8" not in final  # dup vs the FIRST run's index
    assert eng2._cidx.stats()["total_keys"] == 3  # H1, H2, H3


def test_requires_text_column(spark, tmp_path):
    pages, cfg = _setup(
        spark,
        tmp_path,
        EVENTS,
        content_index_path=str(tmp_path / "cidx"),
        extract_text=False,
    )
    with pytest.raises(ValueError, match="text"):
        CdcEngine(spark, cfg).run()
    # the validation raise fires AFTER the batch pins the prepared frame —
    # the finally must release it or the session's CacheManager keeps the
    # frame forever (r5 leak: broke the pipeline cache-hygiene test when
    # this file ran first in the shared-session suite)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_ini_exposes_content_index_knobs():
    from ape_dts_spark.config import load_task_config

    cfg = load_task_config(
        """
[extractor]
changes_path = /tmp/ch
[sinker]
pages_path = /tmp/pg
content_index_path = /tmp/cidx
content_index_buckets = 32
""",
        is_text=True,
    )
    assert cfg.content_index_path == "/tmp/cidx"
    assert cfg.content_index_buckets == 32
    # and absent -> off
    cfg2 = load_task_config(
        "[extractor]\nchanges_path=/tmp/ch\n[sinker]\npages_path=/tmp/pg\n",
        is_text=True,
    )
    assert cfg2.content_index_path is None
