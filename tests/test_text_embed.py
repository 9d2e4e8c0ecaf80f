"""Hashing-trick TF embeddings: DuckDB oracle mirror for the sparse form,
sparse<->dense consistency, and the end-to-end text -> embed -> ANN loop."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from ape_dts_spark.operators.similarity import brute_force_topk
from ape_dts_spark.operators.text_embed import tf_hash_embedding, tf_hash_sparse

SF = "/root/testdata/sf0.001"


def test_sparse_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sp = (
        tf_hash_sparse(docs, dim=64)
        .orderBy("doc_id", "bucket")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    dk = con.execute(r"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x <> '') AS ts
          FROM documents
        ), w AS (
          SELECT doc_id, unnest(ts) AS word FROM tok
        ), b AS (
          SELECT doc_id,
                 ('0x' || substr(md5(word), 1, 12))::BIGINT % 64 AS bucket,
                 count(*) AS tf
          FROM w GROUP BY 1, 2
        ), n AS (
          SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM b GROUP BY 1
        )
        SELECT b.doc_id, b.bucket::INT AS bucket, b.tf,
               round(b.tf / n.nrm, 6) AS weight
        FROM b JOIN n USING (doc_id)
        ORDER BY doc_id, bucket
    """).df()
    assert len(sp) == len(dk)
    assert (sp.doc_id.values == dk.doc_id.values).all()
    assert (sp.bucket.values == dk.bucket.values).all()
    assert (sp.tf.values == dk.tf.values).all()
    assert (abs(sp.weight.values - dk.weight.values) < 1e-9).all()


def test_dense_is_consistent_with_sparse_and_l2_normalized(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "z z z"), (3, "")],
        "doc_id long, text string",
    )
    dense = {r["doc_id"]: r["embedding"] for r in tf_hash_embedding(docs, dim=16).collect()}
    sparse = tf_hash_sparse(docs, dim=16, round_to=9).collect()
    # doc 3 has no tokens -> no vector in either form
    assert set(dense) == {1, 2}
    for did, vec in dense.items():
        assert len(vec) == 16
        assert math.isclose(sum(v * v for v in vec), 1.0, rel_tol=1e-5)
    for r in sparse:
        assert dense[r["doc_id"]][r["bucket"]] == pytest.approx(r["weight"], abs=1e-6)


def test_embed_then_ann_finds_planted_near_dup(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    planted = docs.filter(F.col("doc_id") == 7).select(
        F.lit(9_999).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny suffix")).alias("text"),
    )
    emb = tf_hash_embedding(
        docs.select("doc_id", "text").unionByName(planted), dim=128
    )
    queries = emb.filter(F.col("doc_id") == 9_999).select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(
        emb.filter(F.col("doc_id") != 9_999),
        queries,
        id_col="doc_id",
        k=1,
    ).collect()
    assert top[0]["neighbor_id"] == 7
    assert top[0]["cos_sim"] > 0.99


def test_embedding_plan_has_no_python_udf(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = tf_hash_embedding(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
