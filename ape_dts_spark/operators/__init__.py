from ape_dts_spark.operators.dedup import lww_dedup, reverse_ops, split_key_change_updates, split_updates
from ape_dts_spark.operators.merge import merge_into

__all__ = [
    "lww_dedup",
    "split_updates",
    "split_key_change_updates",
    "reverse_ops",
    "merge_into",
]
