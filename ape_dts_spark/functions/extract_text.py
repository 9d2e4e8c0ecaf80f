"""Deterministic, vectorized HTML -> text extraction.

This is the engine's analog of the reference's user-transform hook (the Lua
ETL processor, reference dt-pipeline/src/lua_processor.rs:14-53): the one
place where user code touches row payloads mid-pipeline.  Per the target
spec the transform must be (a) vectorized — Arrow pandas UDF, no
row-at-a-time Python — and (b) byte-identical per url across runs and
across parallelism levels.

Byte-identity is guaranteed by construction: the whole pipeline is a fixed
sequence of compiled-regex substitutions applied with pandas' vectorized
``Series.str.replace`` — no locale, no external parser library, no
dictionary iteration order.  The same function is used by the engine
(inside a pandas UDF) and by the test oracle (plain pandas), so the
contract "engine text == oracle text, bytewise" is checked end-to-end.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Order matters and is part of the contract — do not reorder.  Passes are
# fused where equivalent: the chain is memory-bandwidth-bound (each
# .str.replace rewrites the whole batch), so fewer passes = proportional
# speedup on the hot path.
# pass 1: comments + script/style blocks vanish (one alternation scan)
_DROP_RE = re.compile(r"(?is)<!--.*?-->|<(script|style)\b[^>]*>.*?</\1\s*>")
# pass 2: block-level tags become newlines so structure survives stripping
_BLOCK_RE = re.compile(
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|article|section)\b[^>]*/?>"
)
# pass 3: every remaining tag vanishes
_TAG_RE = re.compile(r"(?s)<[^>]*>")
# pass 4: closed entity set, single scan (no rescanning => no double-unescape)
_ENT_RE = re.compile(r"&(?:amp|lt|gt|quot|nbsp|#39);")
_ENT_MAP = {"&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'", "&nbsp;": " ", "&amp;": "&"}
# pass 5: horizontal whitespace runs -> single space
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")
# pass 6: newline runs (with their surrounding single spaces) -> one newline
_NL_RE = re.compile(r" ?(?:\n ?)+")


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized html(bytes|str) -> text(str). Null/empty -> empty string."""
    s = html.map(
        lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or ""),
        na_action=None,
    ).fillna("")
    s = s.str.replace(_DROP_RE, "", regex=True)
    s = s.str.replace(_BLOCK_RE, "\n", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    s = s.str.replace(_ENT_RE, lambda m: _ENT_MAP[m.group()], regex=True)
    s = s.str.replace(_HSPACE_RE, " ", regex=True)
    s = s.str.replace(_NL_RE, "\n", regex=True)
    return s.str.strip().fillna("")


def extract_text(html: bytes | str | None) -> str:
    """Scalar convenience wrapper (oracle-side single value)."""
    return extract_text_series(pd.Series([html]))[0]


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:  # pragma: no cover - executed on executors
    return extract_text_series(html)
