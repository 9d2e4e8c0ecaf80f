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
  5. drop a bare trailing `?`
  6. drop the root-path trailing slash (`https://h/` -> `https://h`)
Duplicate-slash collapsing and query-param reordering are intentionally NOT
done: both change meaning on real servers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEME_AUTH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*"
_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?]*@)?([^/:?]+)"


def canonicalize_url(url_col):
    """Canonical URL as a Column (see module docstring for the exact form)."""
    u = F.trim(url_col)
    u = F.regexp_replace(u, r"#.*$", "")
    auth = F.lower(F.regexp_extract(u, f"({_SCHEME_AUTH})", 1))
    rest = F.regexp_replace(u, _SCHEME_AUTH, "")
    auth = F.regexp_replace(auth, r"^(http://[^/:]+):80$", "$1")
    auth = F.regexp_replace(auth, r"^(https://[^/:]+):443$", "$1")
    out = F.concat(auth, rest)
    out = F.regexp_replace(out, r"\?$", "")
    return F.regexp_replace(out, r"^([a-z][a-z0-9+.-]*://[^/?]+)/$", "$1")


def url_host(url_col):
    """Lowercased host (userinfo and port stripped)."""
    return F.lower(F.regexp_extract(F.trim(url_col), _HOST, 1))


def registered_domain(url_col):
    """Last two host labels — the skew/grouping axis for hot-domain salting.
    (A public-suffix list would refine co.uk-style hosts; two labels is the
    deterministic, dependency-free approximation both engines reproduce.)"""
    return F.regexp_extract(url_host(url_col), r"([^.]+\.[^.]+)$", 1)


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
