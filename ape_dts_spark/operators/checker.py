"""Data check / revise — source-vs-target consistency verification.

Reference: the check sink (dt-connector/src/sinker/mysql/mysql_checker.rs:
118-158, base_checker.rs:21-83) SELECTs target rows by pk batch and
hash-joins them in memory against source rows, emitting `miss` (absent on
target) and `diff` (value mismatch, with per-column detail) logs; the
revise path (mysql_check_extractor.rs:50-60) re-reads those logs and
re-applies the affected keys.

Spark-first: one full-outer join on the key classifies every row in a
single distributed pass — no per-batch point SELECTs, no driver-side hash
maps.  Revise = left-semi join of the change stream against the miss/diff
keys, re-driven through the normal MERGE path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_predicate(key_cols: list[str], sample_interval: int):
    """Deterministic 1-in-N key sample: md5 of the concatenated key, first
    12 hex chars as an integer, mod N == 0.  A pure function of the key, so
    source and target select the SAME keys (miss/diff classification stays
    exact within the sample), and md5-based so an external SQL oracle
    reproduces the choice bit-for-bit."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", *[F.col(k).cast("string") for k in key_cols])), 1, 12
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(sample_interval)) == 0


def default_compare_cols(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    exclude: tuple[str, ...] = (),
) -> list[str]:
    """Columns compared when none are configured: present on BOTH sides,
    minus the key and any engine bookkeeping columns (`exclude`, e.g.
    last_lsn whose values differ by construction)."""
    skip = set(key_cols) | set(exclude)
    tcols = set(target.columns)
    return [c for c in source.columns if c in tcols and c not in skip]


def check(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    sample_interval: int = 1,
) -> DataFrame:
    """Full-outer-join consistency check.

    Returns one row per key with `check_result` in:
      'match' | 'diff' | 'miss' (in source, absent on target) |
      'extra' (on target, absent in source)
    plus `diff_cols` — the list of mismatching column names (reference emits
    per-column diff detail in its diff log).

    sample_interval > 1 checks a deterministic 1-in-N key sample on BOTH
    sides (reference mysql_snapshot_extractor.rs:47,200 `sample_interval`)
    — checking a 10^10-row table end-to-end is not viable; a keyed sample
    bounds the join while keeping miss/diff semantics exact within it.
    """
    if compare_cols is None:
        compare_cols = default_compare_cols(source, target, key_cols)
    if sample_interval > 1:
        pred = sample_predicate(key_cols, sample_interval)
        source = source.filter(pred)
        target = target.filter(pred)
    s = source.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        *[F.col(c).alias(f"_s_{c}") for c in compare_cols],
        F.lit(1).alias("_in_s"),
    )
    t = target.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        *[F.col(c).alias(f"_t_{c}") for c in compare_cols],
        F.lit(1).alias("_in_t"),
    )
    j = s.join(t, on=[f"_k_{k}" for k in key_cols], how="full_outer")
    mism = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_s_{c}").eqNullSafe(F.col(f"_t_{c}")), F.lit(c)
                ).otherwise(F.lit(None))
                for c in compare_cols
            ]
        )
    )
    result = (
        F.when(F.col("_in_t").isNull(), F.lit("miss"))
        .when(F.col("_in_s").isNull(), F.lit("extra"))
        .when(F.size(mism) > 0, F.lit("diff"))
        .otherwise(F.lit("match"))
    )
    return j.select(
        *[F.col(f"_k_{k}").alias(k) for k in key_cols],
        result.alias("check_result"),
        F.when(
            F.col("_in_s").isNotNull() & F.col("_in_t").isNotNull(), mism
        ).otherwise(F.array().cast("array<string>")).alias("diff_cols"),
    )


def revise_keys(check_df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys needing re-apply (the reference's check-log re-extraction input)."""
    return check_df.filter(F.col("check_result").isin("miss", "diff")).select(*key_cols)


def revise(changes: DataFrame, check_df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Restrict the change stream to miss/diff keys (left-semi) for re-MERGE."""
    keys = revise_keys(check_df, key_cols)
    return changes.join(F.broadcast(keys), on=key_cols, how="left_semi")


def review(
    source: DataFrame,
    target: DataFrame,
    prior_check: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """The reference's `review` task type (check -> revise -> review flow,
    docs/en/snapshot/review_data.md; check_log re-read in
    mysql_check_extractor.rs:50-60): after a revise pass, re-check ONLY the
    keys the prior check flagged, confirming the revise fixed them.

    Scale shape: the re-check is a left-semi prune of both sides to the
    flagged keys (broadcast — the flagged set is small by construction)
    followed by the same single full-outer-join classification as check().
    """
    keys = revise_keys(prior_check, key_cols)
    s = source.join(F.broadcast(keys), on=key_cols, how="left_semi")
    t = target.join(F.broadcast(keys), on=key_cols, how="left_semi")
    return check(s, t, key_cols, compare_cols=compare_cols)
