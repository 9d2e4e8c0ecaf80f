"""Round-5 regression tests.

1. The frequency-cap guards (lsh max_bucket, jaccard/decontaminate
   max_doc_freq) must NOT be window counts: count() OVER (PARTITION BY
   hot_key) gets no partial aggregation and cannot be AQE-skew-split, so
   the megakey the cap exists to drop first lands whole on one task.  The
   groupBy + left_anti form is identical in output; these tests pin both
   the plan shape (no Window node) and the row-level equivalence.
2. _byte_string parses Spark size-conf suffixes (ADVICE r4: digit-stripping
   turned '128m' into 128 bytes).
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from ape_dts_spark.operators.text_dedup import (
    _byte_string,
    _drop_hot_keys,
    contaminated_train_docs,
    decontaminate,
    lsh_candidate_pairs,
    minhash_signatures_fused,
    ngram_jaccard_pairs,
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "the quick brown fox jumps over the lazy dog again and again"


def test_drop_hot_keys_equals_window_form(spark):
    """groupBy+anti must keep/drop exactly the rows the window form did."""
    rows = [(i, "hot") for i in range(50)] + [(i + 100, f"k{i % 7}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {tuple(r) for r in _drop_hot_keys(df, ["key"], 10).collect()}
    w = Window.partitionBy("key")
    want = {
        tuple(r)
        for r in df.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= 10)
        .drop("_n")
        .collect()
    }
    assert got == want and len(got) == 30


def test_frequency_caps_have_no_window_node(spark):
    """None of the four capped operators may plan a Window for the cap."""
    docs = _docs(spark, [(i, BOILER + f" doc {i}") for i in range(6)])
    sig = minhash_signatures_fused(docs, num_hashes=8)
    plans = {
        "lsh": _physical(lsh_candidate_pairs(sig, num_hashes=8, bands=4, max_bucket=3)),
        "jaccard": _physical(ngram_jaccard_pairs(docs, k=3, threshold=0.1, max_doc_freq=3)),
        "decon": _physical(decontaminate(docs, docs, k=3, max_doc_freq=3)),
        "train_drop": _physical(contaminated_train_docs(docs, docs, k=3, max_doc_freq=3)),
    }
    for name, plan in plans.items():
        assert "Window" not in plan, f"{name} cap regressed to a window:\n{plan}"
        assert "LeftAnti" in plan or "partial_count" in plan.lower() or "partial" in plan, name


def test_lsh_cap_drops_megabucket_identically(spark):
    """Planted megabucket: 20 byte-identical docs (one band bucket of 20)
    plus a 2-doc near-pair.  cap=8 must drop the megabucket's pairs whole
    and keep the small bucket's pair — same rows as the (removed) window
    form, which the DuckDB oracle still mirrors."""
    mega = [(i, BOILER) for i in range(20)]
    pairX = [(100, "alpha beta gamma delta epsilon zeta"), (101, "alpha beta gamma delta epsilon zeta")]
    sig = minhash_signatures_fused(_docs(spark, mega + pairX), num_hashes=8)
    capped = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(sig, num_hashes=8, bands=4, max_bucket=8).collect()
    }
    assert capped == {(100, 101)}
    uncapped = lsh_candidate_pairs(sig, num_hashes=8, bands=4, max_bucket=None).count()
    assert uncapped == 20 * 19 // 2 + 1


def test_decontaminate_cap_fused_into_vocab_agg(spark):
    """With the cap, the train vocab is ONE groupBy (doc-freq filter fused);
    a stop-shingle in every train doc must not count as contamination."""
    train = _docs(spark, [(i, f"unique text number {i} " + BOILER) for i in range(10)])
    evalset = _docs(spark, [(1, BOILER)])
    rep = decontaminate(train, evalset, k=3, threshold=0.5, max_doc_freq=5).collect()[0]
    assert rep["n_matched"] == 0 and not rep["contaminated"]
    exact = decontaminate(train, evalset, k=3, threshold=0.5, max_doc_freq=None).collect()[0]
    assert exact["contaminated"]


def test_byte_string_suffixes():
    assert _byte_string("134217728") == 134217728
    assert _byte_string("128m") == 128 * 1024 * 1024
    assert _byte_string("128MB") == 128 * 1024 * 1024
    assert _byte_string("1g") == 1 << 30
    assert _byte_string("512k") == 512 * 1024
    assert _byte_string("64b") == 64
    assert _byte_string("2t") == 2 << 40
    assert _byte_string("garbage") == 134217728
    assert _byte_string("12x") == 134217728
    assert _byte_string("") == 134217728


def test_infer_changes_schema_widen_long_double_restart(spark, tmp_path):
    """ADVICE r4 (medium): a widen_column long->double mid-stream leaves
    mixed int64/double footers.  mergeSchema throws; the fallback must
    promote the sampled footer type to the SINK's type for every pair
    widen_column allows (_WIDEN_OK), long->double included — the literal
    promote set missed it and the restart crash-looped on post-DDL files."""
    from pyspark.sql import types as T

    from ape_dts_spark.lake.table import LakeTable
    from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig

    cols = [
        ("url", "string", False),
        ("score", "double", True),  # sink already widened long -> double
        ("last_lsn", "long", True),
    ]
    LakeTable.create(str(tmp_path / "pages"), cols, bucket_key="url", bucket_count=2)
    ch = str(tmp_path / "changes")
    pre = spark.createDataFrame(
        [(1, "insert", "u1", 100)], "lsn long, op string, url string, score long"
    )
    post = spark.createDataFrame(
        [(2, "insert", "u2", 1.5)], "lsn long, op string, url string, score double"
    )
    pre.write.parquet(ch, mode="append")
    post.write.parquet(ch, mode="append")

    eng = CdcEngine(
        spark, EngineConfig(job_id="j", pages_path=str(tmp_path / "pages"), changes_path=ch)
    )
    eng._ddls = []
    df = eng._changes()
    assert dict((f.name, f.dataType) for f in df.schema.fields)["score"] == T.DoubleType()
    rows = {r["url"]: r["score"] for r in df.collect()}
    assert rows == {"u1": 100.0, "u2": 1.5}
    # live tail: a file appended AFTER inference must be picked up by the
    # cached grouped reader (the file list is re-listed per call, not frozen)
    spark.createDataFrame(
        [(3, "insert", "u3", 250)], "lsn long, op string, url string, score long"
    ).write.parquet(ch, mode="append")
    rows2 = {r["url"]: r["score"] for r in eng._changes().collect()}
    assert rows2 == {"u1": 100.0, "u2": 1.5, "u3": 250.0}


def test_infer_changes_schema_widen_int_long_single_scan(spark, tmp_path):
    """int->long mixed footers ARE reader-promotable: the fallback must
    return ONE explicit read schema (single scan over the dir, no per-group
    union) with the sink's widened type."""
    from pyspark.sql import types as T

    from ape_dts_spark.lake.table import LakeTable
    from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig

    cols = [("url", "string", False), ("n", "long", True), ("last_lsn", "long", True)]
    LakeTable.create(str(tmp_path / "pages"), cols, bucket_key="url", bucket_count=2)
    ch = str(tmp_path / "changes")
    spark.createDataFrame(
        [(1, "insert", "u1", 7)], "lsn long, op string, url string, n int"
    ).write.parquet(ch, mode="append")
    spark.createDataFrame(
        [(2, "insert", "u2", 9)], "lsn long, op string, url string, n long"
    ).write.parquet(ch, mode="append")
    eng = CdcEngine(
        spark, EngineConfig(job_id="j", pages_path=str(tmp_path / "pages"), changes_path=ch)
    )
    eng._ddls = []
    sch = eng._infer_changes_schema()
    assert isinstance(sch, T.StructType)  # single-scan fast path
    assert dict((f.name, f.dataType) for f in sch.fields)["n"] == T.LongType()
    rows = {r["url"]: r["n"] for r in eng._changes().collect()}
    assert rows == {"u1": 7, "u2": 9}


def test_lake_create_refuses_unrelated_directory(spark, tmp_path):
    """ADVICE r4: create() must not adopt a pre-existing directory holding
    unrelated content; a crashed half-made layout (bare _meta/data, no
    committed manifest) stays resumable."""
    import os

    import pytest

    from ape_dts_spark.lake.table import LakeTable

    cols = [("url", "string", False)]
    # unrelated content -> loud failure
    bad = tmp_path / "existing"
    bad.mkdir()
    (bad / "precious.txt").write_text("not a table")
    with pytest.raises(FileExistsError, match="refusing to adopt"):
        LakeTable.create(str(bad), cols)
    assert (bad / "precious.txt").read_text() == "not a table"
    # resumable half-made layout -> adopted
    half = tmp_path / "half"
    os.makedirs(half / "_meta")
    os.makedirs(half / "data")
    t = LakeTable.create(str(half), cols)
    assert t.manifest.version == 0
    # committed table -> still the original already-committed error
    with pytest.raises(FileExistsError, match="already committed"):
        LakeTable.create(str(half), cols)


def test_psl_wildcard_and_exception_rules(spark):
    """*.ck wildcard: any label under ck is a public suffix, so the
    registered domain is the last THREE labels and a bare 2-label host has
    no registrable domain; !www.ck exception: registrable as-is.  Checked
    on BOTH engines from the same snapshot literals."""
    import duckdb
    import pandas as pd

    from ape_dts_spark.operators.url_tools import (
        registered_domain_from_host,
        registered_domain_sql,
    )

    cases = {
        "foo.bar.ck": "foo.bar.ck",   # bar.ck is a suffix (wildcard)
        "x.foo.bar.ck": "foo.bar.ck",
        "bar.ck": "",                 # a public suffix itself
        "ck": "",
        "www.ck": "www.ck",           # exception: registrable as-is
        "a.www.ck": "www.ck",
        "shop.er": "",                # *.er, no exception
        "b.shop.er": "b.shop.er",
        "news.fk": "",
        "a.news.fk": "a.news.fk",
        "foo.co.uk": "foo.co.uk",     # plain rules unaffected
        "plain.com": "plain.com",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select("host", registered_domain_from_host(F.col("host")).alias("d")).collect()
    }
    assert got == cases
    con = duckdb.connect()
    con.register("hosts", pd.DataFrame({"host": list(cases)}))
    sql = f"SELECT host, {registered_domain_sql('host')} AS d FROM hosts"
    want = dict(con.execute(sql).fetchall())
    assert want == cases
