"""ContentIndex — incremental content dedup against a historical corpus.

Oracle: the operator's contract is EXACT md5-content membership, so DuckDB
mirrors it with a plain semi/anti-join on md5(text); the bloom sidecar is
an optimization that must never change the output.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from ape_dts_spark.operators.incremental_dedup import (
    BITS_PER_KEY,
    ContentIndex,
    _build_segment,
    _check_segment,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )


def test_dedup_batch_matches_duckdb_oracle(spark, tmp_path):
    docs = _docs(spark)
    hist = docs.filter("CAST(url AS BIGINT) % 2 = 0")
    batch = docs.filter("CAST(url AS BIGINT) % 3 = 0")  # overlaps on mult of 6

    idx = ContentIndex.create(str(tmp_path / "idx"), n_buckets=8)
    idx.append(hist)
    idx = ContentIndex.load(str(tmp_path / "idx"))
    fresh, dups = idx.dedup_batch(spark, batch)
    got_fresh = {r["url"] for r in fresh.collect()}
    got_dups = {r["url"] for r in dups.collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT CAST(doc_id AS VARCHAR) url, text "
        f"FROM read_parquet('{SF}/documents.parquet')"
    )
    want_dups = {
        r[0]
        for r in con.execute(
            """
        SELECT b.url FROM docs b
        WHERE CAST(b.url AS BIGINT) % 3 = 0
          AND md5(b.text) IN (SELECT md5(h.text) FROM docs h
                              WHERE CAST(h.url AS BIGINT) % 2 = 0)
        """
        ).fetchall()
    }
    want_all = {
        r[0]
        for r in con.execute(
            "SELECT url FROM docs WHERE CAST(url AS BIGINT) % 3 = 0"
        ).fetchall()
    }
    assert got_dups == want_dups and want_dups
    assert got_fresh == want_all - want_dups and got_fresh
    # fresh/dups partition the batch: disjoint and exhaustive
    assert not (got_fresh & got_dups)
    # fresh rows keep the batch's columns plus the audit hash
    assert set(fresh.columns) == {"url", "text", "h"}


def test_append_is_incremental_and_idempotent_recheck(spark, tmp_path):
    docs = _docs(spark)
    idx = ContentIndex.create(str(tmp_path / "idx"), n_buckets=4)

    # empty index: everything is fresh
    batch = docs.filter("CAST(url AS BIGINT) % 5 = 0")
    fresh, dups = idx.dedup_batch(spark, batch)
    assert dups.count() == 0 and fresh.count() == batch.count()

    # index the batch, re-present it: every row (and every other doc with
    # identical text) now reports duplicate
    idx.append(batch)
    fresh2, dups2 = idx.dedup_batch(spark, batch)
    assert fresh2.count() == 0 and dups2.count() == batch.count()

    # a second disjoint-content append only adds keys
    before = idx.stats()["total_keys"]
    more = docs.filter("CAST(url AS BIGINT) % 5 = 1")
    f3, _ = idx.dedup_batch(spark, more)
    idx.append(f3)
    assert idx.stats()["total_keys"] >= before


def test_rebuild_blooms_folds_segments_without_changing_results(spark, tmp_path):
    docs = _docs(spark)
    idx = ContentIndex.create(str(tmp_path / "idx"), n_buckets=4)
    idx.append(docs.filter("CAST(url AS BIGINT) % 4 = 0"))
    idx.append(docs.filter("CAST(url AS BIGINT) % 4 = 1"))
    assert idx.stats()["max_segments_per_bucket"] == 2

    batch = docs.filter("CAST(url AS BIGINT) % 2 = 0")
    before = {r["url"] for r in idx.dedup_batch(spark, batch)[1].collect()}
    idx.rebuild_blooms(spark)
    assert idx.stats()["max_segments_per_bucket"] == 1
    after = {r["url"] for r in idx.dedup_batch(spark, batch)[1].collect()}
    assert before == after and before


def test_bloom_segment_no_false_negatives_and_low_fpr():
    import numpy as np

    rng_h1 = np.arange(1, 20_001, dtype=np.int64) * 1_000_003 % (1 << 60)
    rng_h2 = (np.arange(1, 20_001, dtype=np.int64) * 998_244_353 % (1 << 60)) * 2 + 1
    blob = _build_segment(rng_h1[:10_000], rng_h2[:10_000])
    assert len(blob) * 8 >= 10_000 * BITS_PER_KEY
    # members: never a false negative
    assert _check_segment(blob, rng_h1[:10_000], rng_h2[:10_000]).all()
    # non-members: FPR well under 1%
    fpr = _check_segment(blob, rng_h1[10_000:], rng_h2[10_000:]).mean()
    assert fpr < 0.01


def test_create_refuses_existing_index(tmp_path):
    ContentIndex.create(str(tmp_path / "idx"))
    with pytest.raises(FileExistsError):
        ContentIndex.create(str(tmp_path / "idx"))


def test_compact_folds_files_and_preserves_membership(spark, tmp_path):
    docs = _docs(spark)
    idx = ContentIndex.create(str(tmp_path / "cidx"), n_buckets=4)
    for m in (2, 3):  # overlapping appends -> duplicate hash generations
        idx.append(docs.filter(f"CAST(url AS BIGINT) % {m} = 0"))
    pre = idx.stats()
    assert pre["max_segments_per_bucket"] > 1
    batch = docs.filter("CAST(url AS BIGINT) % 5 = 0")
    _, pre_dups = idx.dedup_batch(spark, batch)
    pre_set = {r["url"] for r in pre_dups.collect()}

    v = idx.compact(spark)
    post = idx.stats()
    assert post["max_segments_per_bucket"] == 1
    assert post["version"] == v
    # duplicate generations collapsed to distinct hashes
    import duckdb
    con = duckdb.connect()
    want = con.execute(
        f"SELECT count(DISTINCT md5(text)) FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE doc_id % 2 = 0 OR doc_id % 3 = 0"
    ).fetchone()[0]
    assert post["total_keys"] == want
    _, post_dups = idx.dedup_batch(spark, batch)
    assert {r["url"] for r in post_dups.collect()} == pre_set

    # vacuum(keep_last=1) unlinks the superseded pre-compact generation's
    # data+bloom files and manifests, and membership is unchanged (r5
    # ADVICE: without GC the sidecar grows O(index x compaction count))
    import os

    data_before = set(os.listdir(tmp_path / "cidx" / "data"))
    removed = idx.vacuum(keep_last=1)
    assert removed > 0
    data_after = set(os.listdir(tmp_path / "cidx" / "data"))
    assert data_after < data_before
    live = {os.path.basename(p) for ps in idx.manifest["files"].values() for p in ps}
    assert live <= data_after
    manifests = [
        f for f in os.listdir(tmp_path / "cidx" / "_meta") if f.startswith("manifest_v")
    ]
    assert manifests == [f"manifest_v{idx.manifest['version']}.json"]
    _, vac_dups = idx.dedup_batch(spark, batch)
    assert {r["url"] for r in vac_dups.collect()} == pre_set
    assert idx.vacuum(keep_last=1) == 0  # idempotent
