"""A/B probe: CDC replay throughput with vs without the opt-in ingest
content-dedup stage (EngineConfig.content_index_path), on a change stream
whose inserts are ~30% re-crawled content (a 500-body content pool).

Writes BENCH/content_dedup_probe_r5.json:
  events/sec for baseline and content-dedup runs, the overhead ratio, the
  number of content dups dropped, final row counts (the dedup run's table
  is smaller by the drops), and the parallel write-bandwidth canary per
  run so a host throttle window can't masquerade as stage cost.

Usage: python scripts/content_dedup_probe.py [n_events] [n_seed]
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
POOL = 500  # distinct bodies the duplicate inserts draw from
DUP_FRac = 3  # ~3/10 of inserts are pool re-crawls


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
    # ~30% of inserts re-crawl one of POOL bodies; everything else unique
    dup = F.pmod(g._h(F.col("lsn"), SEED, 17), F.lit(10)) < DUP_FRac
    content_h = F.when(
        (op == "insert") & dup, F.pmod(h, F.lit(POOL))
    ).otherwise(h)
    return df.select(
        F.col("lsn"),
        op.alias("op"),
        g._url(url_id, SEED).alias("url"),
        F.lit(None).cast("string").alias("before_url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn")).alias("warc_ts"),
        F.when(op == "delete", F.lit(None).cast("binary"))
        .otherwise(g._html(content_h))
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


def _run(spark, base: str, changes_path: str, n_seed: int, with_index: bool) -> dict:
    work = os.path.join(base, "with_idx" if with_index else "baseline")
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
        batch_lsn_width=50_000,
        content_index_path=os.path.join(work, "cidx") if with_index else None,
    )
    bw0 = write_bw_canary()
    eng = CdcEngine(spark, cfg)
    t0 = time.monotonic()
    eng.run()
    wall = time.monotonic() - t0
    bw1 = write_bw_canary()
    drops = sum(b.get("content_dups", 0) for b in eng.batch_log)
    return {
        "with_index": with_index,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(eng.metrics["record_count"] / wall, 1),
        "content_dups_dropped": drops,
        "final_rows": pages.refresh().read(spark).count(),
        "index_keys": eng._cidx.stats()["total_keys"] if with_index else None,
        "canary_wgbps": [bw0, bw1],
        "batch_log": eng.batch_log,
    }


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("content-dedup-probe", master="local[32]", shuffle_partitions=32)
    base = "/tmp/content_dedup_probe"
    shutil.rmtree(base, ignore_errors=True)
    changes_path = os.path.join(base, "changes")
    _changes(spark, n_events, n_seed).write.parquet(changes_path)

    # interleave A/B/A/B so a drifting host hits both arms equally
    runs = []
    for rep in range(2):
        for with_index in (False, True):
            shutil.rmtree(os.path.join(base, "with_idx" if with_index else "baseline"),
                          ignore_errors=True)
            r = _run(spark, base, changes_path, n_seed, with_index)
            r["rep"] = rep
            runs.append(r)
            print(json.dumps({k: r[k] for k in r if k != "batch_log"}))

    best = {
        w: max(r["events_per_sec"] for r in runs if r["with_index"] is w)
        for w in (False, True)
    }
    out = {
        "n_events": n_events,
        "n_seed": n_seed,
        "dup_insert_fraction": DUP_FRac / 10,
        "pool": POOL,
        "best_events_per_sec": {"baseline": best[False], "content_dedup": best[True]},
        "overhead_ratio": round(best[True] / best[False], 3),
        "runs": runs,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "content_dedup_probe_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
