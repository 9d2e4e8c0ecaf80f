from ape_dts_spark.plans.inspect import explain_str, pushed_filters, scan_columns, wholestage_spans

__all__ = ["explain_str", "pushed_filters", "scan_columns", "wholestage_spans"]
