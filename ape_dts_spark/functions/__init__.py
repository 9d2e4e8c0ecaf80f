from ape_dts_spark.functions.extract_text import extract_text_series, extract_text_udf

__all__ = ["extract_text_series", "extract_text_udf"]
