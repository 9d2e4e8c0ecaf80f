"""BM25: hand-computed scores, ranking semantics, DuckDB oracle mirror."""

import math

import duckdb
import pytest

from ape_dts_spark.operators.bm25 import bm25_score

SF = "/root/testdata/sf0.001"


def test_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_score(docs, "apple banana", round_to=8).collect()}
    # N=3, avgdl=(3+2+3)/3=8/3; df(apple)=1, df(banana)=2
    k1, b = 1.2, 0.75
    avgdl = 8 / 3

    def s(tf, df, dl):
        idf = math.log((3 - df + 0.5) / (df + 0.5) + 1)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[1] == pytest.approx(s(2, 1, 3) + s(1, 2, 3), abs=1e-6)
    assert out[2] == pytest.approx(s(1, 2, 2), abs=1e-6)
    assert 3 not in out  # no query term -> no row


def test_ranking_prefers_rare_term_and_short_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "needle common common common common common common common"),
            (2, "needle common"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_score(docs, ["needle"]).collect()}
    # same tf for the rare term: the shorter doc wins (length normalization)
    assert out[2] > out[1]
    assert 3 not in out


def test_query_term_dedup_and_validation(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    a = bm25_score(docs, "a a a b").collect()
    b_ = bm25_score(docs, ["a", "b"]).collect()
    assert a == b_
    with pytest.raises(ValueError):
        bm25_score(docs, [])


def test_matches_duckdb_oracle(spark):
    sp = (
        bm25_score(
            spark.read.parquet(f"{SF}/documents.parquet"), "data training model"
        )
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    dk = con.execute(r"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
                   string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS w
          FROM documents
        ), lens AS (
          SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
        ), c AS (
          SELECT count(*) AS n, avg(dl) AS avgdl FROM lens
        ), tf AS (
          SELECT doc_id, w, count(*) AS tf FROM toks
          WHERE w IN ('data', 'training', 'model') GROUP BY 1, 2
        ), dfreq AS (
          SELECT w, count(*) AS df FROM tf GROUP BY 1
        )
        SELECT tf.doc_id AS doc_id,
               round(sum(
                 ln((c.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                 * tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / c.avgdl))
               ), 4) AS score
        FROM tf JOIN dfreq USING (w) JOIN lens USING (doc_id) CROSS JOIN c
        GROUP BY tf.doc_id
        ORDER BY doc_id
    """).df()
    assert len(sp) == len(dk) and len(sp) > 0
    assert (sp.doc_id.values == dk.doc_id.values).all()
    assert (abs(sp.score.values - dk.score.values) < 1e-9).all()
