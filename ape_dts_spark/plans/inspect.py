"""Physical-plan inspection helpers — the engine's "did Catalyst do what we
expect" toolkit, used by tests to assert that:

* LSN-slice predicates and user where-conditions are PUSHED into the
  parquet scan (PushedFilters), so a batch never reads outside its slice;
* column pruning reaches the scan (ReadSchema excludes e.g. `html` when a
  query never touches it);
* the hot path stays inside WholeStageCodegen spans.

The reference hand-implements pushdown/pruning in its extractors
(base_extractor.rs:190-205, rdb_query_builder.rs:411-432); here they are
optimizer-provided, and these helpers make that verifiable rather than
assumed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    # Plan strings are truncated at spark.sql.debug.maxToStringFields (25) by
    # default, which can clip the PushedFilters/ReadSchema lines we parse.
    spark = df.sparkSession
    key = "spark.sql.debug.maxToStringFields"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "10000")
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        body = m.group(1).strip()
        # split on top-level commas only — filter args contain commas too,
        # e.g. GreaterThan(lsn,100)
        depth, cur = 0, []
        for ch in body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                if "".join(cur).strip():
                    out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if "".join(cur).strip():
            out.append("".join(cur).strip())
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists, one per file scan (column-pruning evidence)."""
    txt = explain_str(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan —
    the engine's shuffles-per-batch budget check."""
    txt = explain_str(df, "simple")
    final = txt.split("== Initial Plan ==")[0]
    return len(re.findall(r"\bExchange\b", final))


def wholestage_spans(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen spans in the physical plan.

    Under AQE the codegen `*(n)` markers only appear in the *final* plan,
    which exists after execution — so by default we materialize the plan
    with a noop write first.
    """
    if execute:
        # must run through the df's OWN QueryExecution (a write wraps it in a
        # fresh one and the AQE final plan would never land on this df)
        df.collect()
    txt = explain_str(df, "simple")
    final = txt.split("== Initial Plan ==")[0]
    spans = {m for m in re.findall(r"\*\((\d+)\)", final)}
    spans |= {m for m in re.findall(r"WholeStageCodegen \((\d+)\)", final)}
    return len(spans)
