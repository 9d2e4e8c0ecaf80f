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


def _balanced_span(txt: str, start: int, open_ch: str, close_ch: str) -> str:
    """Body of a bracketed span starting just AFTER its opening bracket,
    up to the MATCHING close — nested brackets of the same kind stay inside
    (a `[^\\]]*` regex stops at the first ']' inside a value, e.g.
    `In(lang, [en,de])`, truncating everything after it)."""
    depth, i = 1, start
    while i < len(txt) and depth:
        c = txt[i]
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
        i += 1
    return txt[start : i - 1]


def _split_top(body: str, pairs: str = "()[]") -> list[str]:
    """Split on commas at nesting depth 0 only — filter args and
    parameterized types carry commas too, e.g. GreaterThan(lsn,100),
    decimal(10,2)."""
    opens, closes = pairs[0::2], pairs[1::2]
    out, cur, depth = [], [], 0
    for ch in body:
        if ch in opens:
            depth += 1
        elif ch in closes:
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


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    txt = explain_str(df)
    out: list[str] = []
    marker = "PushedFilters: ["
    pos = txt.find(marker)
    while pos >= 0:
        body = _balanced_span(txt, pos + len(marker), "[", "]")
        out.extend(_split_top(body, "()[]"))
        pos = txt.find(marker, pos + len(marker))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists, one per file scan (column-pruning evidence).

    Angle-bracket balanced so nested/parameterized types survive:
    `struct<x:struct<y:int>,html:binary>` is two columns [x, html], not a
    truncated-at-first-'>' fragment; `decimal(10,2)` is not split at its
    comma."""
    txt = explain_str(df)
    scans = []
    marker = "ReadSchema: struct<"
    pos = txt.find(marker)
    while pos >= 0:
        body = _balanced_span(txt, pos + len(marker), "<", ">")
        cols = [entry.split(":", 1)[0].strip() for entry in _split_top(body, "()<>")]
        scans.append(cols)
        pos = txt.find(marker, pos + len(marker))
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
        # fresh one and the AQE final plan would never land on this df) — but
        # JVM-side: executedPlan().execute() runs the adaptive plan to
        # completion and finalizes it without ever shipping a row to the
        # Python driver (df.collect() materializes EVERY row driver-side
        # just to flip isFinalPlan, OOMing on any real input).
        try:
            df._jdf.queryExecution().executedPlan().execute().count()
        except Exception:
            df.collect()
    txt = explain_str(df, "simple")
    final = txt.split("== Initial Plan ==")[0]
    spans = {m for m in re.findall(r"\*\((\d+)\)", final)}
    spans |= {m for m in re.findall(r"WholeStageCodegen \((\d+)\)", final)}
    return len(spans)
