"""RdbFilter / RdbRouter analogs — declarative event filtering and routing.

Reference: dt-common/src/rdb_filter.rs (do/ignore tables with */? wildcards,
do_events, ignore_cols, where_conditions pushed into the source SELECT at
base_extractor.rs:190-205) and dt-connector/src/rdb_router.rs (schema/table/
column renames applied to every extracted row).

Spark-first expression: every rule becomes a Catalyst predicate or
projection on the change-stream DataFrame, so table filters, op filters,
time gates and user where-conditions are all pushed down into the parquet/
lake scan by the optimizer — the reference pushes only `where_conditions`
manually; we get all of them for free.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wildcard_match(pattern: str, name: str) -> bool:
    """`*`/`?` wildcard table matching with escape support — reference
    rdb_filter.rs:190-211 (match_token).  Case-sensitive exact semantics."""
    # translate the reference's wildcard dialect (* ? with \ escapes) to regex
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return re.fullmatch("".join(out), name) is not None


@dataclass
class ChangeFilter:
    """Declarative filter over the change stream (applied pre-merge)."""

    do_events: list[str] = field(default_factory=lambda: ["insert", "update", "delete"])
    do_origins: list[str] | None = None  # data-marker loop prevention (two_way.md)
    # drop-list form of the data marker: a node excludes ITS OWN id (and
    # keeps user-born NULL-origin rows) without enumerating every peer
    ignore_origins: list[str] | None = None
    start_time_utc: str | None = None  # time gate on event time (time_filter.rs)
    end_time_utc: str | None = None
    where_condition: str | None = None  # SQL predicate, pushed down by Catalyst
    ignore_cols: list[str] = field(default_factory=list)

    def apply(self, df: DataFrame, op_col: str = "op", ts_col: str = "warc_ts") -> DataFrame:
        if set(self.do_events) != {"insert", "update", "delete"}:
            df = df.filter(F.col(op_col).isin(self.do_events))
        if self.do_origins is not None and "origin" in df.columns:
            df = df.filter(F.col("origin").isin(self.do_origins))
        if self.ignore_origins and "origin" in df.columns:
            df = df.filter(
                F.col("origin").isNull() | ~F.col("origin").isin(self.ignore_origins)
            )
        if self.start_time_utc:
            df = df.filter(F.col(ts_col) >= F.lit(self.start_time_utc).cast("timestamp"))
        if self.end_time_utc:
            df = df.filter(F.col(ts_col) < F.lit(self.end_time_utc).cast("timestamp"))
        if self.where_condition:
            df = df.filter(self.where_condition)
        if self.ignore_cols:
            df = df.drop(*self.ignore_cols)
        return df


@dataclass
class TableFilter:
    """do/ignore table selection with wildcards (multi-table deployments)."""

    do_tbs: list[str] = field(default_factory=lambda: ["*"])
    ignore_tbs: list[str] = field(default_factory=list)

    def matches(self, tb: str) -> bool:
        if any(wildcard_match(p, tb) for p in self.ignore_tbs):
            return False
        return any(wildcard_match(p, tb) for p in self.do_tbs)


@dataclass
class Router:
    """Column/table rename routing (reference rdb_router.rs:24-80)."""

    col_map: dict[str, str] = field(default_factory=dict)  # source col -> target col
    tb_map: dict[str, str] = field(default_factory=dict)

    def route_cols(self, df: DataFrame) -> DataFrame:
        # Simultaneous mapping in ONE projection — sequential
        # withColumnRenamed cascades on overlapping maps (e.g.
        # {a->b, b->c} would rename a's data twice and conflate columns,
        # matching neither the reference's per-column map semantics nor
        # user intent).  Collisions are config errors, surfaced eagerly.
        if not self.col_map:
            return df
        targets = [self.col_map.get(c, c) for c in df.columns]
        dupes = {t for t in targets if targets.count(t) > 1}
        if dupes:
            raise ValueError(f"col_map routes multiple columns to {sorted(dupes)}")
        return df.select(
            *[F.col(c).alias(t) for c, t in zip(df.columns, targets)]
        )

    def route_tb(self, tb: str) -> str:
        return self.tb_map.get(tb, tb)

    def reverse(self) -> "Router":
        return Router(
            col_map={v: k for k, v in self.col_map.items()},
            tb_map={v: k for k, v in self.tb_map.items()},
        )
