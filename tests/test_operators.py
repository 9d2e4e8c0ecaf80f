"""Unit tests: checker, filters/router/config, text ops, similarity, multimodal."""

import pytest
from pyspark.sql import functions as F

from ape_dts_spark.config import load_task_config
from ape_dts_spark.operators.checker import check, revise
from ape_dts_spark.operators.filters import ChangeFilter, Router, TableFilter, wildcard_match
from ape_dts_spark.operators.multimodal import frame_sample_plan, media_metadata
from ape_dts_spark.operators.similarity import brute_force_topk, lsh_topk
from ape_dts_spark.operators.text_analysis import language_id, quality_score, token_stats
from ape_dts_spark.operators.text_dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
    word_shingles,
)

SF = "/root/testdata/sf0.001"


def test_checker_classifies_miss_diff_extra(spark):
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    tgt = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    out = {r["k"]: (r["check_result"], list(r["diff_cols"])) for r in check(src, tgt, ["k"]).collect()}
    assert out[1] == ("match", [])
    assert out[2] == ("diff", ["v"])
    assert out[3] == ("miss", [])
    assert out[4][0] == "extra"
    # revise restricts the change stream to miss/diff keys
    rev = revise(src, check(src, tgt, ["k"]), ["k"])
    assert sorted(r["k"] for r in rev.collect()) == [2, 3]


def test_wildcard_match_reference_semantics():
    # reference rdb_filter.rs wildcard dialect: * ? with escapes
    assert wildcard_match("web_*", "web_pages")
    assert wildcard_match("t?", "t1")
    assert not wildcard_match("t?", "t12")
    assert wildcard_match(r"a\*b", "a*b")
    assert not wildcard_match(r"a\*b", "aXb")
    tf = TableFilter(do_tbs=["web_*"], ignore_tbs=["web_tmp*"])
    assert tf.matches("web_pages") and not tf.matches("web_tmp_1") and not tf.matches("other")


def test_change_filter_and_router(spark):
    df = spark.createDataFrame(
        [(1, "insert", "node1", 5.0), (2, "delete", "node1", 6.0), (3, "insert", "node2", 7.0)],
        "lsn long, op string, origin string, v double",
    )
    f = ChangeFilter(do_events=["insert"], do_origins=["node1"], where_condition="v > 4")
    assert [r["lsn"] for r in f.apply(df, ts_col="v").collect()] == [1]
    r = Router(col_map={"v": "value"})
    assert "value" in r.route_cols(df).columns
    assert r.reverse().col_map == {"value": "v"}


def test_config_ini_roundtrip(tmp_path):
    ini = """
[extractor]
extract_type=cdc
changes_path=/x/changes
ddl_path=/x/ddl
batch_lsn_width=5000

[filter]
do_events=insert,update
where_condition=lang = 'en'
ignore_cols=tx_id

[router]
col_map=lang:language

[sinker]
pages_path=/x/pages
merge_mode=cow
compact_ratio=0.25

[pipeline]
job_id=t1

[parallelizer]
parallel_type=rdb_merge
salt=8
"""
    cfg = load_task_config(ini, is_text=True)
    assert cfg.job_id == "t1"
    assert cfg.changes_path == "/x/changes" and cfg.pages_path == "/x/pages"
    assert cfg.batch_lsn_width == 5000 and cfg.salt == 8
    assert cfg.merge_mode == "cow" and cfg.compact_ratio == 0.25
    assert cfg.filter.do_events == ["insert", "update"]
    assert cfg.filter.where_condition == "lang = 'en'"
    assert cfg.router.col_map == {"lang": "language"}


def test_text_dedup_finds_planted_duplicates(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    all_docs = docs.unionByName(planted)
    ex = exact_duplicates(all_docs)
    assert ex.count() == 5
    sh = word_shingles(all_docs, "doc_id", "text", k=5)
    sig = minhash_signatures(sh, num_hashes=8)
    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sig, num_hashes=8, bands=4).collect()}
    for i in range(5):
        assert (i, i + 1000) in pairs  # identical docs always collide in LSH
    jac = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(all_docs, threshold=0.99).collect()
    }
    for i in range(5):
        assert jac[(i, i + 1000)] == pytest.approx(1.0)
    fps = simhash(all_docs)
    nd = {(r["a"], r["b"]) for r in simhash_near_dups(fps, max_hamming=0).collect()}
    for i in range(5):
        assert (i, i + 1000) in nd


def test_text_analysis_shapes(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"), (2, "xyzzy! plugh?"), (3, "")],
        "doc_id long, text string",
    )
    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert ts[1]["n_tokens_ws"] == 8
    assert ts[2]["n_tokens_bpe"] == 4  # xyzzy ! plugh ?
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert 0 <= q[1]["quality_score"] <= 1
    assert q[1]["stopword_ratio"] > 0 and q[2]["stopword_ratio"] == 0
    li = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert li[1] == "en" and li[2] == "und"


def test_similarity_topk_exact_vs_lsh(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = brute_force_topk(emb, q, k=3)
    rows = exact.collect()
    assert len(rows) == 9
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for qid, rr in by_q.items():
        sims = [s for _, s in sorted(rr)]
        assert sims == sorted(sims, reverse=True)  # ranked by similarity
    # LSH returns a subset-quality result with the same schema
    approx = lsh_topk(emb, q, dim=64, k=3, n_planes=4)
    assert set(approx.columns) == set(exact.columns)
    assert approx.count() > 0


def test_multimodal_stub_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, b"hello media bytes"), (2, None), (3, b"")], "doc_id long, payload binary"
    )
    meta = {r["doc_id"]: r for r in media_metadata(docs).collect()}
    assert meta[1]["n_bytes"] == 17 and meta[1]["decode_ok"]
    assert meta[1]["width"] >= 64 and meta[1]["n_frames"] >= 1
    assert not meta[2]["decode_ok"] and not meta[3]["decode_ok"]
    # deterministic across runs
    meta2 = {r["doc_id"]: r for r in media_metadata(docs).collect()}
    assert meta[1] == meta2[1]
    plan = frame_sample_plan(media_metadata(docs))
    assert plan.count() >= 1
