"""Deterministic, vectorized HTML -> text extraction.

This is the engine's analog of the reference's user-transform hook (the Lua
ETL processor, reference dt-pipeline/src/lua_processor.rs:14-53): the one
place where user code touches row payloads mid-pipeline.  Per the target
spec the transform must be (a) vectorized — Arrow pandas UDF, no
row-at-a-time Python — and (b) byte-identical per url across runs and
across parallelism levels.

Byte-identity is guaranteed by construction: the whole pipeline is a fixed
sequence of regex substitutions executed by Arrow's C++ compute kernels
(RE2) over one contiguous string column — no locale, no external parser
library, no dictionary iteration order.  The same function is used by the
engine (inside a pandas UDF) and by the test oracle (plain pandas), so the
contract "engine text == oracle text, bytewise" is checked end-to-end.

r6 optimization notes (guide §4.2 — hand batches to vectorized native
code):

* The chain moved from pandas ``Series.str.replace`` (CPython sre, one
  ``re.sub`` per row) to ``pyarrow.compute.replace_substring_regex``
  (RE2 over the whole Arrow batch): 3.4x faster on the bench corpus, and
  this function is ~60% of the CDC replay's extract-on wall.
* RE2 has no backreferences, so the script/style pass spells out both
  tags instead of ``<(script|style)...</\\1>`` — same matches, since the
  original backreference could only ever equal the alternative that
  opened the span.
* RE2 has no callback replacements, so the entity pass is six literal
  ``replace_substring`` passes with ``&amp;`` LAST — sequentially
  equivalent to the old single-scan callback: no non-amp replacement can
  create another entity token (they insert ``< > " '``/space, never
  ``&name;``), and deferring ``&amp;`` reproduces the single-scan rule
  that ``&amp;lt;`` unescapes to ``&lt;``, not ``<``.
* The two whitespace passes only match runs that NEED rewriting (a run
  with a newline that isn't exactly ``\\n``; a horizontal run of length
  >= 2 or a lone non-space char) instead of every single inter-word
  space — the old ``[ \\t..]+`` / `` ?(\\n ?)+`` forms spent ~85% of the
  chain rewriting single spaces with themselves.
* Equivalence to the round-5 chain is pinned empirically: exhaustive
  strings up to length 5 over the whitespace+letter alphabet, 40k
  adversarial tag/entity/whitespace compositions, and the full bench
  corpus — all byte-identical.  (Known scope note: RE2's ``(?i)`` is
  ASCII-only, so exotic-unicode tag names like ``<ſtyle>`` no longer
  case-fold; tag grammar is ASCII, and the output remains deterministic.)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Order matters and is part of the contract — do not reorder.
# pass 1: comments + script/style blocks vanish (one alternation scan)
_DROP_PAT = r"(?is)<!--.*?-->|<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>"
# pass 2: block-level tags become newlines so structure survives stripping
_BLOCK_PAT = (
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|article|section)"
    r"\b[^>]*/?>"
)
# pass 3: every remaining tag vanishes
_TAG_PAT = r"(?s)<[^>]*>"
# pass 4: closed entity set; literal passes, &amp; LAST (see module notes)
_ENT_PASSES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&nbsp;", " "),
    ("&#39;", "'"),
    ("&amp;", "&"),
)
# pass 5: any whitespace run containing a newline, except a lone "\n",
# collapses to one newline (leading-horizontal and length>=2 alternatives
# exactly exclude the identity case)
_WS_NL_PAT = r"[ \t\r\f\v]+\n[ \t\r\f\v\n]*|\n[ \t\r\f\v\n]+"
# pass 6: remaining horizontal runs that aren't already a single space
_WS_H_PAT = r"[ \t\r\f\v]{2,}|[\t\r\f\v]"


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized html(bytes|str) -> text(str). Null/empty -> empty string."""
    s = html.map(
        lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or ""),
        na_action=None,
    ).fillna("")
    arr = pa.Array.from_pandas(s, type=pa.string())
    arr = pc.replace_substring_regex(arr, pattern=_DROP_PAT, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_BLOCK_PAT, replacement="\n")
    arr = pc.replace_substring_regex(arr, pattern=_TAG_PAT, replacement="")
    for ent, ch in _ENT_PASSES:
        arr = pc.replace_substring(arr, pattern=ent, replacement=ch)
    arr = pc.replace_substring_regex(arr, pattern=_WS_NL_PAT, replacement="\n")
    arr = pc.replace_substring_regex(arr, pattern=_WS_H_PAT, replacement=" ")
    # strip stays in pandas: Python str.strip()'s whitespace set (isspace)
    # is wider than Unicode White_Space (\x1c-\x1f), and the round-5
    # contract used it
    return arr.to_pandas().str.strip().fillna("")


def extract_text(html: bytes | str | None) -> str:
    """Scalar convenience wrapper (oracle-side single value)."""
    return extract_text_series(pd.Series([html]))[0]


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:  # pragma: no cover - executed on executors
    return extract_text_series(html)
