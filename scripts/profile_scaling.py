"""Per-stage scaling profile of the north-rule CDC job (extraction on/off).

Runs the identical job at two core counts and prints a stage-by-stage wall
breakdown (prep / merge spark-write / merge driver-move / compact /
bookkeep), so the scaling gap can be attributed to a specific stage instead
of asserted.  Monkeypatches LakeTable._stage_write to split the Spark write
from the driver-serial file-move loop.

Usage: python scripts/profile_scaling.py [mult] [levels] [extract]
  mult:    event multiplier over sf0.1's events count (default 10 => 2M)
  levels:  comma core counts (default 4,16)
  extract: 0|1 (default 0 = JVM-only path, the weak scaler)
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
from ape_dts_spark.sources.generator import PAGES_COLS, gen_changes, gen_ddl_events, gen_pages_seed  # noqa: E402
from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig  # noqa: E402

STAGE_TIMES: dict[str, float] = {}


def _patch_stage_write():
    """Split stage-write timing into Spark write vs driver-serial file moves
    by wrapping the REAL implementations (no re-implementation: an inlined
    copy of _stage_write drifts the moment the engine grows a parameter —
    it already had, twice — and then the whole profile crashes or lies).

    `_emit_staged` is the one driver-serial seam (listdir + move + footer
    read), so: driver_move = time inside it, spark_write = the rest of
    `_stage_write`."""
    orig_sw = LakeTable._stage_write
    orig_em = LakeTable._emit_staged

    def timed_sw(self, *args, **kwargs):
        t0 = time.monotonic()
        try:
            return orig_sw(self, *args, **kwargs)
        finally:
            STAGE_TIMES["stage_write_total"] = STAGE_TIMES.get(
                "stage_write_total", 0.0
            ) + (time.monotonic() - t0)

    def timed_em(self, *args, **kwargs):
        t0 = time.monotonic()
        try:
            return orig_em(self, *args, **kwargs)
        finally:
            STAGE_TIMES["driver_move"] = STAGE_TIMES.get("driver_move", 0.0) + (
                time.monotonic() - t0
            )

    LakeTable._stage_write = timed_sw
    LakeTable._emit_staged = timed_em
    return orig_sw


def run_level(cores: int, workdir: str, paths: dict, n_seed: int, extract: bool) -> dict:
    global STAGE_TIMES
    STAGE_TIMES = {}
    # Pin the whole process tree (driver, JVM, forked Python UDF workers all
    # inherit) to exactly `cores` CPUs: local[N] alone caps JVM task threads
    # but NOT the Python workers, which silently overflow onto extra cores
    # and inflate the small level's throughput (understating efficiency).
    if os.environ.get("PROF_PIN", "1") == "1":
        os.sched_setaffinity(0, set(range(cores)))
    spark = get_spark(f"prof-{cores}", master=f"local[{cores}]", shuffle_partitions=64)
    pages_path = os.path.join(workdir, f"pages_prof{cores}")
    for suffix in ("", "_checkpoints", "_lineage"):
        shutil.rmtree(pages_path + suffix, ignore_errors=True)
    t = LakeTable.create(pages_path, PAGES_COLS, bucket_key="url", bucket_count=64)
    seed = gen_pages_seed(spark, n_seed, seed=42)
    if extract:
        seed = seed.withColumn("text", extract_text_udf(F.col("html")))
    t.append(seed)
    STAGE_TIMES = {}  # don't count the seed load
    cfg = EngineConfig(
        job_id=f"prof{cores}",
        pages_path=pages_path,
        changes_path=paths["changes"],
        ddl_path=paths["ddl"],
        batch_lsn_width=max(n_seed // 2, 1000),
        extract_text=extract,
        files_per_bucket=int(os.environ.get("PROF_SALT", "1")),
    )
    eng = CdcEngine(spark, cfg)
    t0 = time.monotonic()
    summary = eng.run()
    wall = time.monotonic() - t0
    stages = {
        "prep": sum(b["prep_s"] for b in eng.batch_log),
        "merge": sum(b["merge_s"] for b in eng.batch_log),
        "compact": sum(b["compact_s"] for b in eng.batch_log),
        "bookkeep": sum(b["bookkeep_s"] for b in eng.batch_log),
    }
    stages.update({k: round(v, 2) for k, v in STAGE_TIMES.items()})
    if "stage_write_total" in stages:
        stages["spark_write"] = round(
            stages["stage_write_total"] - stages.get("driver_move", 0.0), 2
        )
    out = {
        "cores": cores,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(summary["events"] / wall, 1),
        "batches": summary["batches"],
        "stages": {k: round(v, 2) for k, v in stages.items()},
        "batch_log": eng.batch_log,
    }
    spark.stop()
    if os.environ.get("PROF_PIN", "1") == "1":
        os.sched_setaffinity(0, set(range(os.cpu_count())))
    return out


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    levels = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "4,16").split(",")]
    extract = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    workdir = os.environ.get("BENCH_WORKDIR", "/tmp/apedts-prof")
    os.makedirs(workdir, exist_ok=True)

    spark = get_spark("prof-gen", master="local[16]", shuffle_partitions=32)
    n_ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet").count()
    n_seed, n_events = n_ev * mult // 2, n_ev * mult
    changes_path = os.path.join(workdir, f"changes_{mult}")
    ddl_path = os.path.join(workdir, f"ddl_{mult}")
    if not os.path.exists(changes_path):
        gen_changes(spark, n_events, n_seed, seed=42).write.parquet(changes_path)
        gen_ddl_events(spark, n_events).write.parquet(ddl_path)
    spark.stop()
    paths = {"changes": changes_path, "ddl": ddl_path}

    _patch_stage_write()
    results = [run_level(c, workdir, paths, n_seed, extract) for c in levels]
    for r in results:
        print(json.dumps(r))
    if len(results) == 2:
        lo, hi = results
        ratio = hi["cores"] / lo["cores"]
        eff = (hi["events_per_sec"] / lo["events_per_sec"]) / ratio
        per_stage = {
            k: round(lo["stages"].get(k, 0.0) / max(hi["stages"].get(k, 1e-9), 1e-9), 2)
            for k in lo["stages"]
        }
        print(json.dumps({"efficiency": round(eff, 3), "stage_speedups": per_stage}))


if __name__ == "__main__":
    main()
