"""A/B/C probe: CDC replay throughput with the opt-in ingest dedup stages —
baseline (no index) vs exact ContentIndex vs exact + NearDupIndex — on a
multi-batch change stream whose inserts are ~30% exact re-crawls and ~20%
NEAR re-crawls (a pool body with a small injected paragraph) of a 300-body
content pool.

Unlike the first content_dedup_probe run (single batch -> the index was
empty while the only batch was filtered, 0 drops), this stream replays in
5 batches, so pool re-crawls in later batches are dropped against content
indexed by earlier ones — the probe exercises the filter's real work, not
just its plumbing overhead.

Writes BENCH/ingest_dedup_probe_r5.json: events/sec per arm (interleaved
reps), overhead ratios vs baseline, exact/near drop counts, final row
counts, and the parallel write-bandwidth canary per run so a host throttle
window can't masquerade as stage cost.

Usage: python scripts/ingest_dedup_probe.py [n_events] [n_seed]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ape_dts_spark.functions.extract_text import extract_text_udf  # noqa: E402
from ape_dts_spark.lake.table import LakeTable  # noqa: E402
from ape_dts_spark.session import get_spark  # noqa: E402
from ape_dts_spark.sources import generator as g  # noqa: E402
from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig  # noqa: E402
from bench import write_bw_canary  # noqa: E402

SEED = 42
POOL = 300  # distinct bodies the re-crawled inserts draw from
N_BATCHES = 5


def _changes(spark, n_events: int, n_seed: int):
    df = spark.range(n_events).select((F.col("id") + 1).alias("lsn"))
    h = g._h(F.col("lsn"), SEED, 11)
    r = F.pmod(h, F.lit(10))
    op = (
        F.when(r < 8, F.lit("insert"))
        .when(r < 9, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    url_id = F.when(
        op == "insert", F.lit(n_seed) + F.col("lsn")
    ).otherwise(F.pmod(g._h(F.col("lsn"), SEED, 13), F.lit(n_seed))).cast("long")
    # insert content classes: ~30% exact pool re-crawl, ~20% NEAR pool
    # re-crawl (pool body + tiny lsn-salted paragraph), rest unique
    cls = F.pmod(g._h(F.col("lsn"), SEED, 17), F.lit(10))
    pool_h = F.pmod(h, F.lit(POOL))
    content_h = F.when((op == "insert") & (cls < 5), pool_h).otherwise(h)
    base_html = g._html(content_h).cast("string")
    near = (op == "insert") & (cls >= 3) & (cls < 5)
    html = F.when(
        near,
        F.regexp_replace(
            base_html,
            "</body>",
            F.concat(
                F.lit("<p>near variant marker "),
                F.pmod(F.col("lsn"), F.lit(7)).cast("string"),
                F.lit(" extra</p></body>"),
            ),
        ),
    ).otherwise(base_html)
    return df.select(
        F.col("lsn"),
        op.alias("op"),
        g._url(url_id, SEED).alias("url"),
        F.lit(None).cast("string").alias("before_url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn")).alias("warc_ts"),
        F.when(op == "delete", F.lit(None).cast("binary"))
        .otherwise(html.cast("binary"))
        .alias("html"),
        F.when(op == "delete", F.lit(None).cast("string"))
        .otherwise(g._lang(url_id, SEED))
        .alias("lang"),
        F.when(op == "delete", F.lit(None).cast("int"))
        .otherwise(F.lit(200))
        .alias("fetch_status"),
        F.floor(F.col("lsn") / 50).alias("tx_id"),
        F.lit("node1").alias("origin"),
    )


ARMS = ("baseline", "exact", "exact+near")


def _run(spark, base: str, changes_path: str, n_seed: int, n_events: int, arm: str) -> dict:
    work = os.path.join(base, arm.replace("+", "_"))
    os.makedirs(work, exist_ok=True)
    pages = LakeTable.create(
        os.path.join(work, "pages"), g.PAGES_COLS, bucket_key="url", bucket_count=16
    )
    seed = g.gen_pages_seed(spark, n_seed, seed=SEED).withColumn(
        "text", extract_text_udf(F.col("html"))
    )
    pages.append(seed)
    cfg = EngineConfig(
        job_id="probe",
        pages_path=pages.path,
        changes_path=changes_path,
        batch_lsn_width=max(1, n_events // N_BATCHES),
        content_index_path=os.path.join(work, "cidx") if arm != "baseline" else None,
        near_dup_index_path=os.path.join(work, "ndidx") if arm == "exact+near" else None,
        near_dup_threshold=0.8,
    )
    bw0 = write_bw_canary()
    eng = CdcEngine(spark, cfg)
    t0 = time.monotonic()
    eng.run()
    wall = time.monotonic() - t0
    bw1 = write_bw_canary()
    return {
        "arm": arm,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(eng.metrics["record_count"] / wall, 1),
        "content_dups_dropped": sum(b.get("content_dups", 0) for b in eng.batch_log),
        "near_dups_dropped": sum(b.get("near_dups", 0) for b in eng.batch_log),
        "final_rows": pages.refresh().read(spark).count(),
        "index_keys": eng._cidx.stats()["total_keys"] if eng._cidx else None,
        "neardup_docs": eng._ndidx.stats()["total_docs"] if eng._ndidx else None,
        "canary_wgbps": [bw0, bw1],
        "batch_log": eng.batch_log,
    }


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000
    spark = get_spark("ingest-dedup-probe", master="local[32]", shuffle_partitions=32)
    base = "/tmp/ingest_dedup_probe"
    shutil.rmtree(base, ignore_errors=True)
    changes_path = os.path.join(base, "changes")
    _changes(spark, n_events, n_seed).write.parquet(changes_path)

    # interleave arms so a drifting host hits all of them equally
    runs = []
    for rep in range(2):
        for arm in ARMS:
            shutil.rmtree(os.path.join(base, arm.replace("+", "_")), ignore_errors=True)
            r = _run(spark, base, changes_path, n_seed, n_events, arm)
            r["rep"] = rep
            runs.append(r)
            print(json.dumps({k: r[k] for k in r if k != "batch_log"}))

    best = {a: max(r["events_per_sec"] for r in runs if r["arm"] == a) for a in ARMS}
    out = {
        "n_events": n_events,
        "n_seed": n_seed,
        "n_batches": N_BATCHES,
        "pool": POOL,
        "insert_classes": {"exact_recrawl": 0.3, "near_recrawl": 0.2, "unique": 0.5},
        "best_events_per_sec": best,
        "overhead_ratio_vs_baseline": {
            a: round(best[a] / best["baseline"], 3) for a in ARMS[1:]
        },
        "runs": runs,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "ingest_dedup_probe_r5.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
