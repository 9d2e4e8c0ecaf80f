"""End-to-end corpus-curation pipeline: the operator library composed the
way a training-data user would run it (canonicalize -> domain cap -> exact
dedup -> near-dup clusters -> quality -> decontaminate -> split)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ape_dts_spark.pipelines import corpus_pipeline

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def raw_docs(spark):
    """sf0.001 documents + planted hazards: exact dups, a re-crawled url
    variant, and near-dup (prefix-copy) docs."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.concat(
            F.lit("https://www.example"),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".com/art/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    exact = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 50_000).alias("doc_id"), "url", "text"
    )
    # same page re-crawled under a messy url spelling
    recrawl = docs.filter(F.col("doc_id") == 5).select(
        (F.col("doc_id") + 60_000).alias("doc_id"),
        F.concat(F.upper(F.substring("url", 1, 5)), F.expr("substring(url, 6)"), F.lit("#frag")).alias("url"),
        F.concat(F.col("text"), F.lit(" trailing-fetch-noise")).alias("text"),
    )
    return docs.unionByName(exact).unionByName(recrawl)


def test_corpus_pipeline_end_to_end(spark, raw_docs):
    # eval item 1: verbatim copy of train doc 7's text (equal length)
    # eval item 2: a SHORT benchmark question embedded verbatim inside the
    # much longer train doc 9 — the containment shape a train-side overlap
    # fraction would dilute to ~0 and miss (review finding)
    doc9_text = raw_docs.filter(F.col("doc_id") == 9).collect()[0]["text"]
    snippet = " ".join(doc9_text.split()[:12])
    evalset = (
        raw_docs.filter(F.col("doc_id") == 7)
        .select((F.col("doc_id") + 90_000).alias("doc_id"), "url", "text")
        .unionByName(
            spark.createDataFrame(
                [(90_001, "https://bench.org/q1", snippet)],
                "doc_id long, url string, text string",
            )
        )
    )
    out, report = corpus_pipeline(
        raw_docs,
        evalset=evalset,
        min_words=5,
        domain_cap_n=10_000,
        with_report=True,
    )
    rows = out.collect()
    got_ids = {r["doc_id"] for r in rows}

    # exact dups dropped (keeper = lowest id), planted copies gone
    for planted in (50_000, 50_001, 50_002):
        assert planted not in got_ids
    assert {0, 1, 2} & got_ids == {0, 1, 2}
    # the re-crawled messy-url variant of doc 5: canonical url collides ->
    # lowest id (the original) survives
    assert 60_005 not in got_ids and 5 in got_ids
    # decontamination dropped the train doc whose text the eval doc copies
    assert 7 not in got_ids
    # ...AND the long train doc that merely CONTAINS the short eval snippet
    assert 9 not in got_ids
    assert 8 in got_ids  # uninvolved docs survive
    # audit: counts are monotone non-increasing through dropping stages
    order = [
        "url_unique", "domain_capped", "exact_deduped",
        "near_dup_removed", "quality_kept", "decontaminated",
    ]
    counts = [report.stages[s] for s in order]
    assert counts == sorted(counts, reverse=True)
    # split column present, only expected labels, assignment deterministic
    labels = {r["split"] for r in rows}
    assert labels <= {"train", "val", "test"}
    again = {
        (r["doc_id"], r["split"])
        for r in corpus_pipeline(
            raw_docs, evalset=evalset, min_words=5, domain_cap_n=10_000
        ).collect()
    }
    assert {(r["doc_id"], r["split"]) for r in rows} == again
    # all input columns survive plus the two pipeline columns
    assert set(out.columns) == {"doc_id", "url", "text", "url_canonical", "split"}


def test_corpus_pipeline_leaves_no_pinned_cache(spark, raw_docs):
    """Repeated pipeline runs in one session must not accumulate cached
    partitions (r4 leak: the near-dup arm persist()ed the survivor frame
    into the CacheManager forever).  localCheckpoint blocks are owned by
    the RDD reference, so nothing may remain REGISTERED in the
    CacheManager after the run, and checkpoint blocks must be reclaimable
    (GC'able) once the result reference drops."""
    import gc

    jsparkSession = spark._jsparkSession
    assert jsparkSession.sharedState().cacheManager().isEmpty()
    for _ in range(2):
        out = corpus_pipeline(raw_docs, min_words=0, domain_cap_n=None)
        assert out.count() > 0
        # the deterministic leak signal: persist() registers in the
        # CacheManager and stays; the checkpoint-based pipeline never does
        assert jsparkSession.sharedState().cacheManager().isEmpty()
        del out
    gc.collect()


def test_corpus_pipeline_line_dedup_stage(spark, raw_docs):
    """Optional CCNet line-dedup stage: a corpus-wide banner line must be
    stripped from every surviving document before document-level dedup."""
    banner = "subscribe to our newsletter today"
    docs = raw_docs.withColumn("text", F.concat(F.col("text"), F.lit("\n" + banner)))
    out = corpus_pipeline(
        docs, min_words=0, domain_cap_n=None, line_dedup_max_docs=5, near_dup=False
    )
    texts = [r["text"] for r in out.select("text").collect()]
    assert texts and all(banner not in t for t in texts)
    # the planted exact dups (doc_id<3 copies) still collapse post-clean
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not ids & {50_000, 50_001, 50_002}


def test_corpus_pipeline_ppl_band_stage(spark):
    """Optional CCNet perplexity-band stage: in a corpus dominated by one
    sentence pattern, a gibberish doc (all one-off bigrams in one-off
    contexts) scores far above the band and is dropped, the pattern docs
    survive, and a too-short-to-score doc is dropped too."""
    rows = [
        (i, f"https://www.ok.com/{i}", f"the cat sat on the mat row{i}")
        for i in range(20)
    ]
    rows.append((70_000, "https://www.gib.com/x", "zq xv qqk lmnop vwx yz qzl wvx kqj"))
    rows.append((70_001, "https://www.gib.com/y", "word"))
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    from ape_dts_spark.operators.ngram_lm import perplexity

    scored = {r["doc_id"]: r["ppl"] for r in perplexity(docs).collect()}
    cut = (max(p for i, p in scored.items() if i < 70_000) + scored[70_000]) / 2
    assert scored[70_000] > cut
    out = corpus_pipeline(
        docs, min_words=0, domain_cap_n=None, near_dup=False, ppl_band=(0.0, cut)
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 70_000 not in ids and 70_001 not in ids
    assert set(range(20)) <= ids


def test_corpus_pipeline_semantic_stage(spark):
    """SemDeDup stage: a word-order PERMUTATION of a doc has an identical
    TF vector (cos 1.0) but different shingles — shingle-LSH near-dup
    misses it, the semantic stage drops it (keep rule retains one)."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
        "nu xi omicron pi rho sigma tau upsilon"
    )
    permuted = " ".join(reversed(base.split()))
    rows = [
        (1, "https://www.a.com/1", base),
        (2, "https://www.a.com/2", permuted),  # same multiset, shuffled order
        (3, "https://www.a.com/3", "totally different words about spark plans here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    # without the stage both survive (shingle sets disjoint => no LSH pair)
    out0 = corpus_pipeline(docs, min_words=0, domain_cap_n=None)
    assert {r["doc_id"] for r in out0.collect()} == {1, 2, 3}
    out1, rep = corpus_pipeline(
        docs,
        min_words=0,
        domain_cap_n=None,
        semantic_tau=0.99,
        semantic_k=2,
        with_report=True,
    )
    ids = {r["doc_id"] for r in out1.collect()}
    assert 3 in ids and len(ids & {1, 2}) == 1  # one of the pair dropped
    assert rep.stages["semantic_dedup_removed"] == 2
    # composed stage must not pin cache either
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
