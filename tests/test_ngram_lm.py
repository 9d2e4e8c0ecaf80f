"""ngram_lm: add-one bigram perplexity — hand-computed values, filter
semantics, cross-corpus scoring, and the engine-portability contract
(the board's text_ppl_filter oracle mirrors these exact semantics)."""

import math

import pytest
from pyspark.sql import functions as F

from ape_dts_spark.operators.ngram_lm import bigram_lm, perplexity, ppl_filter


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_perplexity_matches_hand_computation(spark):
    # corpus: "a b a b" and "a c".  tokens: a,b,a,b,a,c
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> ctx(a)=3, ctx(b)=1; V=3
    docs = _docs(spark, [(1, "a b a b"), (2, "a c")])
    out = {r["doc_id"]: r for r in perplexity(docs, round_to=6).collect()}

    def p(c, cc):
        return (c + 1.0) / (cc + 3.0)

    lp1 = math.log(p(2, 3)) + math.log(p(1, 1)) + math.log(p(2, 3))  # ab ba ab
    ppl1 = math.exp(-lp1 / 3)
    lp2 = math.log(p(1, 3))  # ac
    ppl2 = math.exp(-lp2 / 1)
    assert out[1]["n_bigrams"] == 3
    assert out[2]["n_bigrams"] == 1
    assert out[1]["ppl"] == pytest.approx(ppl1, abs=1e-6)
    assert out[2]["ppl"] == pytest.approx(ppl2, abs=1e-6)


def test_short_docs_are_unscored_and_tokenizer_is_dedup_norm(spark):
    docs = _docs(
        spark,
        [(1, "one"), (2, ""), (3, None), (4, "  Two   WORDS  "), (5, "two words")],
    )
    out = perplexity(docs).collect()
    # only docs 4 and 5 have >= 2 tokens; normalization (lower/trim/split
    # on any whitespace run) makes them the same bigram
    assert sorted(r["doc_id"] for r in out) == [4, 5]
    assert len({r["ppl"] for r in out}) == 1


def test_repetitive_text_scores_lower_than_unseen_mix(spark):
    # in-corpus statistic: the doc made of the corpus's dominant bigram
    # scores lower perplexity than the doc full of one-off bigrams
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "zq xv qqk lmnop vwx yz"))
    out = {r["doc_id"]: r["ppl"] for r in perplexity(_docs(spark, rows)).collect()}
    assert out[0] < out[100]


def test_cross_corpus_scoring_handles_unseen_grams(spark):
    train = _docs(spark, [(1, "a b a b a b")])
    lm = bigram_lm(train)
    assert lm.vocab_size == 2
    # scored corpus has bigrams never seen in training: c=0, cc=0 path
    scored = perplexity(_docs(spark, [(9, "x y z")]), lm=lm, round_to=6)
    row = scored.collect()[0]
    # p = (0+1)/(0+2) = 0.5 for both bigrams -> ppl = 2
    assert row["ppl"] == pytest.approx(2.0, abs=1e-6)


def test_ppl_filter_band_and_keep_unscored(spark):
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "zq xv qqk lmnop vwx yz"))
    rows.append((200, "single"))
    docs = _docs(spark, rows)
    scored = {r["doc_id"]: r["ppl"] for r in perplexity(docs).collect()}
    cut = (scored[0] + scored[100]) / 2
    kept = ppl_filter(docs, hi=cut)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in ids and 100 not in ids and 200 not in ids
    # unscored (no bigrams) docs survive only with keep_unscored=True,
    # carrying the full input schema
    kept2 = ppl_filter(docs, hi=cut, keep_unscored=True)
    ids2 = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    assert ids2 == ids | {200}
    assert kept2.columns == docs.columns


def test_scoring_plan_has_no_python_udf(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "b c d")])
    plan = perplexity(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
