from ape_dts_spark.lake.table import LakeTable, TableSchema

__all__ = ["LakeTable", "TableSchema"]
