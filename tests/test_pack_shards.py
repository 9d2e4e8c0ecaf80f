"""pack_shards: greedy token-budget packing in hash sub-streams —
prefix-sum invariants, determinism, DuckDB oracle mirror."""

import duckdb
from pyspark.sql import functions as F

from ape_dts_spark.operators.text_analysis import pack_shards

SF = "/root/testdata/sf0.001"


def test_shard_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_shards(docs, budget=500, n_streams=4).toPandas()
    assert len(out) == docs.count()
    for stream, grp in out.groupby("stream"):
        shards = sorted(grp.shard.unique())
        # contiguous shard ids from 0
        assert shards == list(range(len(shards)))
        totals = grp.groupby("shard").n_tokens.sum()
        maxdoc = grp.n_tokens.max()
        # greedy straddle bound: every shard stays under budget + one doc
        assert (totals < 500 + maxdoc).all()
        # every non-final shard is "full": its cumulative prefix crossed
        # the next budget boundary
        cum = 0
        for s in shards[:-1]:
            cum += totals[s]
            assert cum >= (s + 1) * 500


def test_deterministic_and_tokens_col_override(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = pack_shards(docs, budget=300, n_streams=8).collect()
    b = pack_shards(docs, budget=300, n_streams=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    pre = docs.select("doc_id", "text", F.lit(7).cast("long").alias("toks"))
    out = pack_shards(pre, budget=70, n_streams=1, tokens_col="toks").toPandas()
    # constant 7-token docs, budget 70 -> exactly 10 docs per shard
    assert (out.groupby("shard").size().iloc[:-1] == 10).all()


def test_matches_duckdb_oracle(spark):
    sp = (
        pack_shards(
            spark.read.parquet(f"{SF}/documents.parquet"), budget=400, n_streams=4
        )
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    dk = con.execute(r"""
        WITH d AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> ''))::BIGINT AS n_tokens,
                 ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                   % 1000000 AS slot
          FROM documents
        ), s AS (
          SELECT doc_id, n_tokens, (slot % 4)::INT AS stream,
                 coalesce(sum(n_tokens) OVER (
                   PARTITION BY slot % 4 ORDER BY slot, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
          FROM d
        )
        SELECT doc_id, n_tokens, stream, (prefix // 400)::INT AS shard
        FROM s ORDER BY doc_id
    """).df()
    assert (sp.doc_id.values == dk.doc_id.values).all()
    assert (sp.n_tokens.values == dk.n_tokens.values).all()
    assert (sp.stream.values == dk.stream.values).all()
    assert (sp.shard.values == dk.shard.values).all()
