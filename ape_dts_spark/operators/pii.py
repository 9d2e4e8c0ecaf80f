"""PII scrubbing for training-data pipelines — pure Column expressions.

Redacts emails, phone-like digit runs, and IPv4 addresses from a text
column, and reports per-document hit counts (the audit trail a data-
governance pass needs).  Patterns are RE2-safe (no lookarounds) so the
same regexes run on Spark (Java regex) and DuckDB/RE2 oracles.

This runs in the extraction path at 10^10 scale: chained regexp_replace
stays inside whole-stage codegen — no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Phone shapes, most-specific first (both Java regex and RE2 use leftmost-
# first alternation, so ordering is part of the cross-engine contract):
#   1. +cc with separated groups:  +1 (555) 123-4567, +44 20 7946 0958
#   2. bare international:         +14155551234  (8-14 digits after +)
#   3. punctuated groups:          555-000-1234, (555).123.4567
#   4. bare digit run:             9-12 digits, word-bounded
# Space-only separated digit pairs ('1914 1918', ID lists) and short runs
# are NOT matched — the round-2 pattern redacted any >=9-char digit/space
# run, which was lossy for ordinary numeric text.
# Every alternative ends with \b: a phone number is never a PREFIX of a
# longer digit run.  Without it, '+' + 23 digits matched only its first 14
# and the replacement token minted a word boundary in front of the digit
# tail, so a SECOND scrub redacted more than the first (scrubbing wasn't a
# fixed point; found by the hypothesis idempotence property).  The bare
# international range is {8,15} — E.164 allows 15 digits, and with the \b
# a {8,14} upper bound would leave a maximal-length number fully
# unredacted instead of partially redacted (review finding).  \b after a
# digit behaves identically in Java regex and RE2, so the cross-engine
# contract is unchanged.
# The punctuated-group shape is split into a paren form and a WORD-BOUNDED
# bare form: the old `\(?[0-9]{3,4}\)?...` could start mid-digit-run
# ('999999999999999-456-456' matched from its 12th digit), and the
# replacement token then minted a boundary for the leftover prefix — the
# same non-idempotence class as the missing trailing \b.
PHONE_RE = (
    r"\+[0-9]{1,3}[ .-]?\(?[0-9]{1,4}\)?([ .-][0-9]{2,5}){1,4}\b"
    r"|\+[0-9]{8,15}\b"
    r"|\([0-9]{3,4}\)[.-][0-9]{3,4}[.-][0-9]{3,5}\b"
    r"|\b[0-9]{3,4}[.-][0-9]{3,4}[.-][0-9]{3,5}\b"
    r"|\b[0-9]{9,12}\b"
)
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
    ip_token: str = "<IP>",
) -> DataFrame:
    """-> (id, text_scrubbed, n_emails, n_phones, n_ips).

    Replacement (and count) order is email -> ip -> phone, each counted on
    the text AFTER the previous pass, so an IP's digit runs are never
    double-counted as a phone number."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace(t, EMAIL_RE, email_token)
    n_ips = F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
    after_ip = F.regexp_replace(after_email, IPV4_RE, ip_token)
    n_phones = F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
    scrubbed = F.regexp_replace(after_ip, PHONE_RE, phone_token)
    return docs.select(
        F.col(id_col),
        scrubbed.alias("text_scrubbed"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ips.cast("long").alias("n_ips"),
    )
