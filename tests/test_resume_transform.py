"""Snapshot resume-by-chunk, pluggable transform hook, sampled check."""

import pytest
from pyspark.sql import functions as F

from ape_dts_spark.config import load_task_config
from ape_dts_spark.lake.table import LakeTable
from ape_dts_spark.operators.checker import check
from ape_dts_spark.sources.generator import PAGES_COLS, gen_changes, gen_pages_seed
from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig, resolve_transform
from ape_dts_spark.streaming.snapshot import (
    done_chunks,
    snapshot_complete,
    snapshot_load,
)
from tests.oracle import oracle_replay


class _KillAfterChunk:
    def __init__(self, n):
        self.n, self.seen = n, 0

    def __call__(self, stage, i):
        self.seen += 1
        if self.seen >= self.n:
            raise RuntimeError(f"injected kill after chunk {i}")


def test_snapshot_load_kill_and_resume_skips_done_chunks(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "p"), PAGES_COLS, bucket_key="url", bucket_count=8)
    seed = gen_pages_seed(spark, 400, seed=7)
    with pytest.raises(RuntimeError, match="injected kill"):
        snapshot_load(spark, t, seed, n_chunks=8, crash_hook=_KillAfterChunk(3))
    t.refresh()
    assert len(done_chunks(t)) == 3
    assert not snapshot_complete(t)
    partial = t.read(spark).count()
    assert 0 < partial < 400
    # resume: loads only the remaining 5 chunks
    res = snapshot_load(spark, t, seed, n_chunks=8)
    assert res == {"chunks_total": 8, "chunks_loaded_now": 5, "chunks_skipped": 3}
    assert snapshot_complete(t)
    got = t.read(spark)
    assert got.count() == 400  # no lost rows, no duplicates
    assert got.select("url").distinct().count() == 400
    # mismatched chunking on resume is rejected (predicates wouldn't line up)
    t2 = LakeTable.create(str(tmp_path / "p2"), PAGES_COLS, bucket_key="url", bucket_count=8)
    with pytest.raises(RuntimeError, match="injected kill"):
        snapshot_load(spark, t2, seed, n_chunks=8, crash_hook=_KillAfterChunk(1))
    with pytest.raises(ValueError, match="chunk predicates"):
        snapshot_load(spark, t2, seed, n_chunks=4)


def test_transform_hook_e2e_through_ini_config(spark, tmp_path):
    """Custom vectorized transform (value rewrite + row drop) plugged via the
    [processor] ini section, end-to-end vs the pandas oracle with the same
    transform applied."""
    n_seed, n_events = 120, 500
    changes = str(tmp_path / "changes")
    gen_changes(spark, n_events, n_seed, seed=5).write.parquet(changes)
    pages_path = str(tmp_path / "pages")
    t = LakeTable.create(pages_path, PAGES_COLS, bucket_key="url", bucket_count=4)
    t.append(gen_pages_seed(spark, n_seed, seed=5))

    ini = f"""
[extractor]
changes_path={changes}
batch_lsn_width=200
[sinker]
pages_path={pages_path}
[pipeline]
job_id=tr1
[processor]
transform=tests.transforms:upper_lang_drop_fr
"""
    cfg = load_task_config(ini, is_text=True)
    cfg.extract_text = False
    eng = CdcEngine(spark, cfg)
    eng.run()

    # oracle: same transform applied to the change stream in pandas
    seed_pd = gen_pages_seed(spark, n_seed, seed=5).toPandas()
    ch_pd = spark.read.parquet(changes).toPandas()
    ch_pd["lang"] = ch_pd["lang"].str.upper()
    ch_pd = ch_pd[(ch_pd["lang"].isna()) | (ch_pd["lang"] != "FR")]
    want = oracle_replay(seed_pd, ch_pd)
    got = t.refresh().read(spark).toPandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["last_lsn"]) == list(want["last_lsn"])
    langs = set(got["lang"].dropna())
    assert "FR" not in langs  # dropped rows never applied
    assert any(x.isupper() for x in langs)  # transformed change rows landed

    with pytest.raises(ValueError, match="transform must be callable"):
        resolve_transform("not-a-spec")


def test_sampled_check_subset_and_exactness(spark, tmp_path):
    src = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # drop every 13th key, corrupt every 17th
    tgt = src.filter(F.pmod("k", F.lit(13)) != 0).withColumn(
        "v", F.when(F.pmod("k", F.lit(17)) == 0, F.col("v") + 1).otherwise(F.col("v"))
    )
    full = check(src, tgt, ["k"], ["v"])
    sampled = check(src, tgt, ["k"], ["v"], sample_interval=5)
    n_full, n_samp = full.count(), sampled.count()
    assert 0 < n_samp < n_full
    # within the sample, classification identical to the full check
    f = {r["k"]: r["check_result"] for r in full.collect()}
    for r in sampled.collect():
        assert f[r["k"]] == r["check_result"]
    # sample is deterministic
    again = {r["k"] for r in check(src, tgt, ["k"], ["v"], sample_interval=5).collect()}
    assert again == {r["k"] for r in sampled.collect()}


def test_start_lsn_gates_fresh_jobs_only(spark, tmp_path):
    """[extractor] start_lsn (reference binlog-position resume): a FRESH job
    begins the tail strictly after the configured lsn; once a checkpoint
    exists, the checkpoint wins and start_lsn never rewinds or re-gates."""
    n_seed, n_events = 80, 400
    changes = str(tmp_path / "changes")
    gen_changes(spark, n_events, n_seed, seed=3).write.parquet(changes)
    pages_path = str(tmp_path / "pages")
    t = LakeTable.create(pages_path, PAGES_COLS, bucket_key="url", bucket_count=4)
    t.append(gen_pages_seed(spark, n_seed, seed=3))

    from ape_dts_spark.config import load_task_config

    ini = f"""
[extractor]
changes_path={changes}
batch_lsn_width=100
start_lsn=200
[sinker]
pages_path={pages_path}
[pipeline]
job_id=sl1
"""
    cfg = load_task_config(ini, is_text=True)
    assert cfg.start_lsn == 200
    cfg.extract_text = False
    s1 = CdcEngine(spark, cfg).run()
    assert s1["events"] == n_events - 200  # only lsn 201..400 applied
    got = t.refresh().read(spark)
    # no row carries a pre-start lsn except the untouched seed (last_lsn 0)
    assert got.filter((F.col("last_lsn") > 0) & (F.col("last_lsn") <= 200)).count() == 0
    # an established job ignores start_lsn (even a HIGHER one): nothing replays
    cfg.start_lsn = 390
    s2 = CdcEngine(spark, cfg).run()
    assert s2["batches"] == 0
