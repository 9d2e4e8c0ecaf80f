"""Struct (schema) extraction + DDL rendering — the reference's struct
extractor / struct sinker pair, Spark-first.

Reference: the struct extractors fetch table definitions from the source
catalog (dt-connector/src/meta_fetcher/pg/pg_struct_fetcher.rs — ~1,100
lines of catalog SQL; mysql equivalent alongside) and struct sinkers replay
them as CREATE TABLE on the target (dt-connector/src/sinker/base_struct_sinker.rs).
In a lake engine the parquet/manifest footer IS the catalog, so extraction
is a metadata read; rendering targets either SQL text (struct migration via
the to_sql surface) or LakeTable.create (lake-native struct sink).

Type names are normalized to an engine-neutral vocabulary (bigint, int,
string, double, float, timestamp, date, boolean, binary, array<T>) so the
extracted struct is comparable across engines — that normalization is the
value-convertor layer of the reference's struct path (col_type mapping
tables in struct/struct_column.rs) collapsed to what a lake target needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_NORM = {
    "long": "bigint",
    "bigint": "bigint",
    "integer": "int",
    "int": "int",
    "short": "smallint",
    "smallint": "smallint",
    "byte": "tinyint",
    "tinyint": "tinyint",
    "string": "string",
    "varchar": "string",
    "double": "double",
    "float": "float",
    "real": "float",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "timestamp_ltz": "timestamp",
}


def normalize_type(dt: T.DataType) -> str:
    """Engine-neutral type name for a Spark DataType."""
    if isinstance(dt, T.ArrayType):
        return f"array<{normalize_type(dt.elementType)}>"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    s = dt.simpleString()
    return _NORM.get(s, s)


def table_struct(spark: SparkSession, path: str, tb_name: str) -> DataFrame:
    """Extract one table's struct as rows (tb, ordinal, col_name, col_type).

    Metadata-only: reads the parquet footer (one driver fetch), never the
    data — the analog of the reference's information_schema queries.
    """
    schema = spark.read.parquet(path).schema
    rows = [
        (tb_name, i + 1, f.name, normalize_type(f.dataType))
        for i, f in enumerate(schema.fields)
    ]
    return spark.createDataFrame(
        rows, "tb string, ordinal int, col_name string, col_type string"
    )


def tables_struct(spark: SparkSession, tables: dict[str, str]) -> DataFrame:
    """Extract structs for {tb_name: parquet_path} — one metadata row set."""
    out = None
    for tb, path in sorted(tables.items()):
        df = table_struct(spark, path, tb)
        out = df if out is None else out.unionByName(df)
    return out


def render_create_table(
    spark: SparkSession, path: str, tb_name: str, key_cols: list[str] | None = None
) -> str:
    """Render CREATE TABLE DDL text from a parquet footer (struct sinker's
    to_sql spelling, reference base_struct_sinker.rs + rdb_query_builder)."""
    schema = spark.read.parquet(path).schema
    cols = ",\n  ".join(
        f"`{f.name}` {normalize_type(f.dataType).upper()}" for f in schema.fields
    )
    pk = f",\n  PRIMARY KEY ({', '.join(f'`{c}`' for c in key_cols)})" if key_cols else ""
    return f"CREATE TABLE IF NOT EXISTS `{tb_name}` (\n  {cols}{pk}\n);"


def create_lake_table_like(
    path: str, spark: SparkSession, src_path: str, bucket_key: str | None = None,
    bucket_count: int = 16,
):
    """Lake-native struct sink: create a LakeTable with the source's struct
    (the CREATE TABLE replay, targeting the lake instead of a SQL DB)."""
    from ape_dts_spark.lake.table import LakeTable

    schema = spark.read.parquet(src_path).schema
    cols = [(f.name, normalize_type(f.dataType), f.nullable) for f in schema.fields]
    if bucket_key:
        return LakeTable.create(path, cols, bucket_key=bucket_key, bucket_count=bucket_count)
    return LakeTable.create(path, cols)
