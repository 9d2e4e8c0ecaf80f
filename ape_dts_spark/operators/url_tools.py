"""URL canonicalization + domain extraction — pure Column expressions.

A web-text ingest engine keys everything on `url` (the north-rule MERGE key,
the dedup identity, the hot-domain skew axis), and raw crawl URLs arrive
messy: mixed-case schemes/hosts, explicit default ports, fragments, bare
query separators, root-slash variants.  Canonicalizing BEFORE keying is what
keeps one logical page from shattering into several merge keys (reference
analog: ape-dts routes/filters on exact table/key names only — URL identity
is a web-pipeline addition, like the text/dedup operator family).

Every pass is an RE2-safe regexp chain (no lookarounds, no UDF): runs inside
whole-stage codegen on Spark and reproduces bit-for-bit on any SQL engine
with regexp_replace/regexp_extract (the driver's DuckDB oracle does).

Canonical form (documented, deliberately conservative):
  1. trim surrounding whitespace
  2. strip the fragment (`#...`)
  3. lowercase the `scheme://authority` prefix (path/query stay case-sensitive)
  4. strip explicit DEFAULT ports only (`http://h:80` -> `http://h`,
     `https://h:443` -> `https://h`; `http://h:443` is NOT default, kept)
  5. drop a bare trailing `?` (only when it is the url's sole `?`; a
     trailing `?` that ends a non-empty query string is data and stays)
  6. drop the root-path trailing slash (`https://h/` -> `https://h`)
Duplicate-slash collapsing and query-param reordering are intentionally NOT
done: both change meaning on real servers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# '#' must terminate the authority too: url_host runs on the RAW url (only
# url_canonical strips fragments), so a pathless 'https://h#frag' would
# otherwise leak the fragment into the host and mis-key domain grouping.
_SCHEME_AUTH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def canonicalize_url(url_col):
    """Canonical URL as a Column (see module docstring for the exact form)."""
    u = F.trim(url_col)
    u = F.regexp_replace(u, r"#.*$", "")
    auth = F.lower(F.regexp_extract(u, f"({_SCHEME_AUTH})", 1))
    rest = F.regexp_replace(u, _SCHEME_AUTH, "")
    auth = F.regexp_replace(auth, r"^(http://[^/:]+):80$", "$1")
    auth = F.regexp_replace(auth, r"^(https://[^/:]+):443$", "$1")
    out = F.concat(auth, rest)
    # strip the trailing '?' only when it is the url's ONLY '?' (a bare
    # query separator).  A bare `\?$` is not idempotent: '/p??' (path /p,
    # query '?') would lose one '?' per pass, so re-canonicalizing an
    # already-canonical url would keep changing the merge key (found by
    # the hypothesis fixed-point property, tests/test_properties.py).
    out = F.regexp_replace(out, r"^([^?]*)\?$", "$1")
    return F.regexp_replace(out, r"^([a-z][a-z0-9+.-]*://[^/?]+)/$", "$1")


def url_host(url_col):
    """Lowercased host (userinfo and port stripped)."""
    return F.lower(F.regexp_extract(F.trim(url_col), _HOST, 1))


# label-suffix extractors shared by the Column and SQL spellings: group 1 is
# the last N dot-separated labels; regexp_extract returns '' when the host
# has fewer labels (both engines), which drives the edge cases below.
_LAST = {
    1: r"([^.]+)$",
    2: r"([^.]+\.[^.]+)$",
    3: r"([^.]+\.[^.]+\.[^.]+)$",
    4: r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$",
}


def registered_domain_from_host(host_col):
    """Public-suffix-aware registered domain of a (lowercased) host Column.

    Resolution against the checked-in PSL snapshot (`psl_snapshot`; see that
    module for scope), most-specific rule first — the PSL's own precedence:

    1. exception rules (`!www.ck`): the named 2-label host is registrable
       as-is -> last TWO labels;
    2. listed 3-label suffixes -> last FOUR labels;
    3. listed 2-label suffixes -> last THREE labels;
    4. TLD wildcards (`*.ck`: any label under the TLD is a suffix)
       -> last THREE labels;
    5. default: every TLD is implicitly a suffix -> last TWO labels.

    Membership is a literal IN over the snapshot — whole-stage codegen, no
    join/UDF, identical on any SQL engine (`registered_domain_sql` emits the
    same literals for the DuckDB oracle).

    Edge cases (from regexp_extract's '' on no-match): a host that IS a
    public suffix (e.g. 'co.uk', or 'bar.ck' under the wildcard) has no
    registrable domain -> ''; a dotless host -> '' (unchanged from the
    pre-PSL behavior).
    """
    from ape_dts_spark.operators.psl_snapshot import (
        PSL_2LABEL,
        PSL_3LABEL,
        PSL_EXCEPTION_2LABEL,
        PSL_WILDCARD_TLD,
    )

    last1 = F.regexp_extract(host_col, _LAST[1], 1)
    last2 = F.regexp_extract(host_col, _LAST[2], 1)
    last3 = F.regexp_extract(host_col, _LAST[3], 1)
    last4 = F.regexp_extract(host_col, _LAST[4], 1)
    return (
        F.when(last2.isin(*PSL_EXCEPTION_2LABEL), last2)
        .when(last3.isin(*PSL_3LABEL), last4)
        .when(last2.isin(*PSL_2LABEL), last3)
        .when(last1.isin(*PSL_WILDCARD_TLD), last3)
        .otherwise(last2)
    )


def registered_domain(url_col):
    """PSL-aware registered domain — the skew/grouping axis for hot-domain
    salting and per-domain crawl caps (see registered_domain_from_host)."""
    return registered_domain_from_host(url_host(url_col))


def registered_domain_sql(host_sql: str) -> str:
    """The DuckDB/ANSI spelling of registered_domain_from_host over the SQL
    expression `host_sql`, with the SAME psl_snapshot literals embedded —
    generated from one source of truth so the engines cannot drift."""
    from ape_dts_spark.operators.psl_snapshot import (
        PSL_2LABEL,
        PSL_3LABEL,
        PSL_EXCEPTION_2LABEL,
        PSL_WILDCARD_TLD,
    )

    def _in(values: tuple[str, ...]) -> str:
        return ", ".join(f"'{v}'" for v in values)

    # DuckDB single-quoted literals keep backslashes verbatim — embed the
    # patterns as-is (no doubling)
    l1, l2, l3, l4 = _LAST[1], _LAST[2], _LAST[3], _LAST[4]
    return (
        f"CASE WHEN regexp_extract({host_sql}, '{l2}', 1) IN ({_in(PSL_EXCEPTION_2LABEL)}) "
        f"THEN regexp_extract({host_sql}, '{l2}', 1) "
        f"WHEN regexp_extract({host_sql}, '{l3}', 1) IN ({_in(PSL_3LABEL)}) "
        f"THEN regexp_extract({host_sql}, '{l4}', 1) "
        f"WHEN regexp_extract({host_sql}, '{l2}', 1) IN ({_in(PSL_2LABEL)}) "
        f"THEN regexp_extract({host_sql}, '{l3}', 1) "
        f"WHEN regexp_extract({host_sql}, '{l1}', 1) IN ({_in(PSL_WILDCARD_TLD)}) "
        f"THEN regexp_extract({host_sql}, '{l3}', 1) "
        f"ELSE regexp_extract({host_sql}, '{l2}', 1) END"
    )


def canonicalize_urls(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """-> (id, url_canonical, host, domain) for a URL-carrying frame."""
    return docs.select(
        F.col(id_col),
        canonicalize_url(F.col(url_col)).alias("url_canonical"),
        url_host(F.col(url_col)).alias("host"),
        registered_domain(F.col(url_col)).alias("domain"),
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain — the standard
    web-corpus per-domain quota (stops boilerplate-heavy megadomains from
    dominating a training mix).  Selection is deterministic AND
    engine-portable: the kept docs are the cap-lowest by (md5-slot(url),
    id) within the domain — the same md5 ranking any SQL engine reproduces
    (('0x' || substr(md5(url),1,12))::BIGINT), which is what lets the
    driver oracle value-check the exact kept set, not just the counts.
    (md5 costs ~2x xxhash64 per row; one short-string hash per doc is noise
    next to the text processing around it.)

    Scale shape: this is deliberately the PLAIN window + rank filter.  A
    megadomain does NOT funnel into one task, because Catalyst rewrites a
    ``row_number() <= k`` filter into WindowGroupLimit with a PARTIAL pass
    before the Exchange: every map task keeps only its own cap-lowest per
    domain, so the post-shuffle exact pass sees at most (map tasks x cap)
    rows per domain — the classic two-phase salted-ranking trick, done
    natively by the optimizer with ONE shuffle.  A hand-rolled two-phase
    variant was measured strictly slower (two shuffles for the same bound;
    `BENCH/domain_cap_skew_r4.json`).  The plan shape (Partial+Final
    WindowGroupLimit) is pinned by test_domain_cap_plan_uses_group_limit —
    if a refactor breaks the rewrite, the skew guard visibly regresses.
    Output = input columns.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    # grouping key fallback chain: registered domain, else the bare host
    # (dotless intranet/localhost urls have no registrable domain — cap
    # those per-host), else the url itself (unparseable urls form
    # singleton groups, i.e. are exempt).  Without the fallback every
    # no-domain doc lands under the single key '' and unrelated documents
    # silently share one quota (review finding).
    dom = registered_domain(F.col(url_col))
    host = url_host(F.col(url_col))
    # an IPv4 host has no registrable domain either (its last two octets
    # are not a "domain" — 10.1.3.4 and 99.9.3.4 must not share a quota):
    # group those per-host too
    is_ip = host.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")
    key = (
        F.when((dom != "") & ~is_ip, dom)
        .when(host != "", host)
        .otherwise(F.col(url_col))
    )
    url_slot = F.conv(F.substring(F.md5(F.col(url_col)), 1, 12), 16, 10).cast("long")
    w = Window.partitionBy("_dom").orderBy(url_slot.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_dom", key)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap)
        .drop("_dom", "_r")
    )
