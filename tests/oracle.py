"""Sequential-replay oracle — the ground truth for final-table equality.

Mirrors the reference's test strategy (replay src_test.sql, compare every
row of every table — /root/reference/dt-tests/README.md, per-column compare
at dt-tests/tests/test_runner/rdb_test_runner.rs:624-706): a naive pandas
loop applies every change event in strict LSN order to an in-memory dict,
with exactly the engine's documented semantics:

* insert/update are both whole-row upserts (REPLACE semantics);
* delete removes the row;
* an update whose before_url != url is delete(before_url)+insert(url);
* a change at lsn == ddl.lsn applies BEFORE the DDL (barrier rule);
* add_column: events at lsn <= ddl.lsn never contribute the column;
* rename_column: the stored column is renamed; later events carrying the
  old source-column name keep routing into it;
* widen_column: values unchanged (representation-only);
* drop_column: the column disappears from the table; later events still
  carrying it contribute nothing;
* truncate_table: all rows removed, schema preserved;
* text = extract_text(html), byte-identical by construction.
"""

from __future__ import annotations

import json

import pandas as pd

from ape_dts_spark.functions.extract_text import extract_text


def oracle_replay(
    seed_pd: pd.DataFrame,
    changes_pd: pd.DataFrame,
    ddls: list[dict] | None = None,
    do_events: set[str] | None = None,
) -> pd.DataFrame:
    """Returns the expected final pages table as a pandas DataFrame."""
    ddls = sorted(ddls or [], key=lambda d: d["lsn"])
    # schema state: ordered payload columns + source-name routing
    cols = ["url", "warc_ts", "html", "text", "lang"]
    route = {c: c for c in cols}  # source event column -> current table column

    state: dict[str, dict] = {}
    for _, r in seed_pd.iterrows():
        state[r["url"]] = {
            "url": r["url"],
            "warc_ts": r["warc_ts"],
            "html": r["html"],
            "text": extract_text(r["html"]),
            "lang": r["lang"],
            "last_lsn": 0,
        }

    def apply_ddl(d):
        nonlocal cols
        p = json.loads(d["payload"])
        if d["ddl_type"] == "add_column":
            cols.append(p["col"])
            route[p["col"]] = p["col"]
        elif d["ddl_type"] == "rename_column":
            cols = [p["to"] if c == p["from"] else c for c in cols]
            # events still carry the old name; keep routing old -> new
            for src, dst in list(route.items()):
                if dst == p["from"]:
                    route[src] = p["to"]
            # stored rows migrate to the new column name (the engine reads old
            # files through field-id mapping, so values survive a rename)
            for r in state.values():
                if p["from"] in r:
                    r[p["to"]] = r.pop(p["from"])
        elif d["ddl_type"] == "widen_column":
            pass
        elif d["ddl_type"] == "drop_column":
            cols = [c for c in cols if c != p["col"]]
            for src, dst in list(route.items()):
                if dst == p["col"]:
                    del route[src]  # later events carrying it route nowhere
        elif d["ddl_type"] == "truncate_table":
            state.clear()
        else:
            raise ValueError(d["ddl_type"])

    events = changes_pd.sort_values("lsn").to_dict("records")
    di = 0
    for ev in events:
        # barrier: DDLs strictly below this event's lsn fire first
        while di < len(ddls) and ddls[di]["lsn"] < ev["lsn"]:
            apply_ddl(ddls[di])
            di += 1
        if do_events is not None and ev["op"] not in do_events:
            continue
        op, url = ev["op"], ev["url"]
        before_url = ev.get("before_url")
        if op == "update" and isinstance(before_url, str) and before_url != url:
            state.pop(before_url, None)
            op = "insert"
        if op == "delete":
            state.pop(url, None)
            continue
        row = {"url": url, "last_lsn": ev["lsn"]}
        for src_col, tbl_col in route.items():
            if tbl_col in ("url", "text"):
                continue
            if src_col in ev:
                row[tbl_col] = ev[src_col]
        row["text"] = extract_text(ev.get("html"))
        state[url] = row
    while di < len(ddls):
        apply_ddl(ddls[di])
        di += 1

    out_cols = cols + ["last_lsn"]
    recs = []
    for url in sorted(state):
        r = state[url]
        recs.append({c: r.get(c) for c in out_cols})
    return pd.DataFrame(recs, columns=out_cols)
