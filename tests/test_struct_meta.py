"""Struct extractor / sinker tests (reference struct_fetcher + struct sinkers)."""

import duckdb

from ape_dts_spark.operators.struct_meta import (
    create_lake_table_like,
    render_create_table,
    table_struct,
)

SF = "/root/testdata/sf0.001"


def test_table_struct_matches_duckdb_catalog(spark):
    """Extraction parity vs an independent catalog reader (DuckDB DESCRIBE)."""
    got = {
        (r["ordinal"], r["col_name"], r["col_type"])
        for r in table_struct(spark, f"{SF}/orders.parquet", "orders").collect()
    }
    con = duckdb.connect()
    norm = {
        "BIGINT": "bigint", "INTEGER": "int", "VARCHAR": "string",
        "DOUBLE": "double", "TIMESTAMP": "timestamp", "TIMESTAMP_NS": "timestamp",
        "FLOAT[]": "array<float>",
    }
    want = {
        (i + 1, r[0], norm[r[1]])
        for i, r in enumerate(
            con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SF}/orders.parquet')"
            ).fetchall()
        )
    }
    assert got == want


def test_render_create_table(spark):
    sql = render_create_table(
        spark, f"{SF}/documents.parquet", "documents", key_cols=["doc_id"]
    )
    assert sql.startswith("CREATE TABLE IF NOT EXISTS `documents`")
    assert "`doc_id` BIGINT" in sql
    assert "`text` STRING" in sql
    assert "PRIMARY KEY (`doc_id`)" in sql


def test_create_lake_table_like_roundtrip(spark, tmp_path):
    """Struct sinker: CREATE TABLE replay onto the lake, then data lands."""
    t = create_lake_table_like(
        str(tmp_path / "docs"), spark, f"{SF}/documents.parquet",
        bucket_key="doc_id", bucket_count=2,
    )
    assert [f["name"] for f in t.schema.fields][:2] == ["doc_id", "text"]
    src = spark.read.parquet(f"{SF}/documents.parquet")
    t.append(src)
    assert t.read(spark).count() == src.count()
