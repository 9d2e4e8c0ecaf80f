"""Property-based tests (hypothesis) for the engine's portability contracts.

These pin the *algebraic* properties the rest of the suite checks only on
fixtures: scalar/vector extraction agreement, URL canonicalization
idempotence, and exact-integer rounding equal to true rational
round-half-up.  Deterministic profile: fixed seeds via derandomize, no
deadline (Spark warmup skews wall time).
"""

from __future__ import annotations

from fractions import Fraction

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ape_dts_spark.functions.extract_text import extract_text, extract_text_series

PROP = settings(
    max_examples=50,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# HTML-ish soup: tags, entities, text, whitespace — stress the regex chain
_html_atom = st.sampled_from(
    [
        "<p>", "</p>", "<div class='x'>", "</div>", "<script>var x=1;</script>",
        "<!-- c -->", "<br/>", "&amp;", "&lt;", "&nbsp;", "&#39;", "plain",
        "words here", "\n", "\t", "  ", "<span>", "</span>", "<b", ">", "<",
        "&", "mixed <i>inline</i> text", "<style>a{}</style>", "é ü 漢",
    ]
)
_html = st.lists(_html_atom, min_size=0, max_size=30).map("".join)


@PROP
@given(_html.map(lambda s: [s]) | st.lists(_html, min_size=0, max_size=8))
def test_extract_vector_equals_scalar(htmls):
    """The vectorized Series path and the scalar oracle must agree bytewise
    on arbitrary html soup — the engine/oracle byte-identity contract."""
    got = extract_text_series(pd.Series(htmls, dtype="object")).tolist()
    want = [extract_text(h) for h in htmls]
    assert got == want


@PROP
@given(_html)
def test_extract_bytes_equals_str(html):
    """bytes input decodes utf-8 and extracts identically to str input."""
    assert extract_text(html.encode("utf-8")) == extract_text(html)


@given(
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=1, max_value=10**12),
)
@PROP
def test_round4_div_is_true_rational_round_half_up(num, den):
    """_round4_div's integer formula == round-half-up on the true rational
    at 4 digits — the portability property the skew_ratio bug class broke.
    Checked exactly (no floats): the engine's integer numerator
    (20000*num + den) div (2*den) must equal floor(q*10^4 + 1/2) on the
    true rational q.  Cross-engine agreement of the same formula is
    covered by the driver oracles."""
    import math

    k = (20000 * num + den) // (2 * den)
    q = Fraction(num, den)
    assert k == math.floor(q * 10000 + Fraction(1, 2))


# ---- Spark-backed properties (one DataFrame per example; cheap plans) ----

_urlish = st.builds(
    lambda scheme, host, port, path, q, frag: f"{scheme}://{host}{port}{path}{q}{frag}",
    st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
    st.sampled_from(
        ["Example.COM", "a.b.co.uk", "x.org", "sub.domain.com.au", "h"]
    ),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/Path/To", "/p?","/p/"]),
    st.sampled_from(["", "?", "?a=1&B=2"]),
    st.sampled_from(["", "#frag", "#"]),
)


@pytest.fixture(scope="module")
def _canon(spark):
    from pyspark.sql import functions as F

    from ape_dts_spark.operators.url_tools import canonicalize_url

    def run(urls: list[str]) -> list[str]:
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [
            r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
        ]

    return run


@settings(max_examples=25, derandomize=True, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_urlish, min_size=1, max_size=16, unique=True))
def test_canonicalize_idempotent(_canon, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u): the merge key must
    be a fixed point, or re-ingesting already-canonical urls would shatter
    page identity."""
    once = _canon(urls)
    twice = _canon(once)
    assert twice == once


_pii_atom = st.sampled_from(
    [
        "1", "23", "456", "7890", ".", " ", "-", "+", "(", ")", "@", "a",
        "bc.de", "x.com", ".com", "192.168.1.1", "@b.co", "<", ">", "\n",
        "000000000", "call +1 (555) 123-4567", "id 123456789",
        "9" * 15, "-456-456", "555-000-1234",  # mid-run entry hazards
    ]
)


@PROP
@given(st.lists(_pii_atom, min_size=0, max_size=12).map("".join))
def test_pii_scrub_idempotent(text):
    """scrub(scrub(x)) == scrub(x): replacement tokens must not mint new
    matches (e.g. a word boundary in front of a digit tail).  Checked with
    Python re over the SAME literals the Column chain and the DuckDB oracle
    run — all three engines agree on these RE2-safe patterns, which the
    driver oracle pins end-to-end.  This property caught PHONE_RE matching
    a 14-digit prefix of longer runs (fixed with trailing \\b)."""
    import re

    from ape_dts_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    def scrub(t: str) -> str:
        t = re.sub(EMAIL_RE, "<EMAIL>", t)
        t = re.sub(IPV4_RE, "<IP>", t)
        t = re.sub(PHONE_RE, "<PHONE>", t)
        return t

    once = scrub(text)
    assert scrub(once) == once


_avro_scalar = (
    st.none()
    | st.booleans()
    | st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)
    | st.floats(allow_nan=False)
    | st.text(max_size=40)
    | st.binary(max_size=40)
)
_avro_map = st.none() | st.dictionaries(st.text(max_size=12), _avro_scalar, max_size=6)


@PROP
@given(
    st.text(max_size=20),
    st.text(max_size=20),
    st.sampled_from(["insert", "update", "delete", "ddl", ""]),
    _avro_map,
    _avro_map,
    _avro_map,
    st.none()
    | st.lists(
        st.tuples(st.text(max_size=10), st.text(max_size=10), st.text(max_size=10)),
        max_size=5,
    ),
)
def test_avro_record_roundtrip(schema, tb, op, before, after, extra, fields):
    """decode(encode(r)) == r for arbitrary envelope content (unicode
    names, every scalar union branch, empty/None maps)."""
    from ape_dts_spark.functions.avro_codec import decode_record, encode_record

    buf = encode_record(schema, tb, op, before=before, after=after, extra=extra, fields=fields)
    got = decode_record(buf)
    assert got["schema"] == schema and got["tb"] == tb and got["operation"] == op
    assert got["before"] == before and got["after"] == after and got["extra"] == extra
    want_fields = [tuple(f) for f in fields] if fields else None
    assert got["fields"] == want_fields


@PROP
@given(st.binary(max_size=200))
def test_avro_decode_rejects_garbage_loudly(blob):
    """decode_record on arbitrary bytes must either return a record or
    raise ValueError/UnicodeDecodeError — never hang, move the parse
    position backward, or surface a random internal exception.  (This
    property motivated the negative/overrun length guards: a crafted
    negative varint length used to regress the position.)"""
    from ape_dts_spark.functions.avro_codec import decode_record

    try:
        decode_record(blob)
    except (ValueError, UnicodeDecodeError):
        pass


@PROP
@given(st.binary(max_size=60))
def test_avro_decode_truncation_is_loud(blob):
    """Every strict prefix of a valid record must fail loudly (no silent
    truncated parse): build a real record, chop it, decode."""
    from ape_dts_spark.functions.avro_codec import decode_record, encode_record

    buf = encode_record("s", "tb", "insert", after={"k": blob}, extra={"position": 7})
    for cut in range(len(buf)):
        with pytest.raises((ValueError, UnicodeDecodeError)):
            decode_record(buf[:cut])


def test_registered_domain_fixed_point(spark):
    """domain(domain(h)) == domain(h), and the domain is always a dot-suffix
    of the host (or '' for hosts with no registrable domain) — the grouping
    axis must be stable under re-derivation or per-domain caps would drift."""
    from pyspark.sql import functions as F

    from ape_dts_spark.operators.url_tools import registered_domain_from_host

    hosts = [
        "example.com", "www.example.com", "a.b.c.example.com", "foo.co.uk",
        "www.foo.co.uk", "co.uk", "uk", "localhost", "news.com.au",
        "sub.news.com.au", "district.k12.ca.us", "x.district.k12.ca.us",
        "com", "a.blogspot.com", "h",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = df.select(
        "host",
        registered_domain_from_host(F.col("host")).alias("d1"),
        registered_domain_from_host(
            registered_domain_from_host(F.col("host"))
        ).alias("d2"),
    ).collect()
    for r in out:
        assert r["d2"] == r["d1"], r
        assert r["d1"] == "" or r["host"] == r["d1"] or r["host"].endswith("." + r["d1"]), r


_ini_atom = st.sampled_from(
    [
        "[extractor]", "[sinker]", "[filter]", "[router]", "[pipeline]",
        "[parallelizer]", "extract_type=cdc", "extract_type=",
        "changes_path=/x", "pages_path=/y", "batch_lsn_width=abc",
        "batch_lsn_width=5000", "salt=-3", "salt=", "do_events=insert,,",
        "col_map=a:b,c", "col_map=::", "compact_ratio=nan", "max_rps=1e3",
        "=x", "[[weird]", "key with space = v", "%percent%", "\t",
        "merge_mode=cow", "feed_format=avro", "unknown_key=1", "",
    ]
)


@PROP
@given(st.lists(_ini_atom, min_size=0, max_size=15).map("\n".join))
def test_task_config_parse_is_total(txt):
    """load_task_config on arbitrary ini soup either parses or raises one
    of the documented error classes — never an internal TypeError/
    AttributeError that would mask a config mistake as an engine bug."""
    import configparser

    from ape_dts_spark.config import load_task_config

    try:
        load_task_config(txt, is_text=True)
    except (ValueError, KeyError, configparser.Error):
        pass
