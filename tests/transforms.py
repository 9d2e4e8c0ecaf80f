"""Test fixture for the pluggable transform hook (Lua-processor analog)."""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upper_lang_drop_fr(df: DataFrame) -> DataFrame:
    """Uppercase lang and DROP French rows (the Lua row_type='' idiom)."""
    out = df.withColumn("lang", F.upper(F.col("lang")))
    return out.filter(F.col("lang").isNull() | (F.col("lang") != "FR"))
