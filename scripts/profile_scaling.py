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

import ape_dts_spark.lake.table as table_mod  # noqa: E402
from ape_dts_spark.functions.extract_text import extract_text_udf  # noqa: E402
from ape_dts_spark.lake.table import LakeTable  # noqa: E402
from ape_dts_spark.session import get_spark  # noqa: E402
from ape_dts_spark.sources.generator import PAGES_COLS, gen_changes, gen_ddl_events, gen_pages_seed  # noqa: E402
from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig  # noqa: E402

STAGE_TIMES: dict[str, float] = {}


def _patch_stage_write():
    orig_write = table_mod.DataFrame.write  # not used; we patch methods below

    orig = LakeTable._stage_write

    def timed(self, df, with_bucket_col, kind="base", pre_clustered=False):
        t0 = time.monotonic()
        staging = os.path.join(self.path, f"_staging-{__import__('uuid').uuid4().hex}")
        if with_bucket_col and not pre_clustered:
            df = df.repartition(self.manifest.bucket_count, F.col(table_mod.BUCKET_COL))
        writer = df.write.mode("overwrite")
        if with_bucket_col:
            writer = writer.partitionBy(table_mod.BUCKET_COL)
        writer.parquet(staging)
        t1 = time.monotonic()
        STAGE_TIMES["spark_write"] = STAGE_TIMES.get("spark_write", 0.0) + (t1 - t0)
        # now the driver-serial part: reuse the original implementation's move
        # loop by calling orig on a pre-written staging?  Simpler: inline move.
        entries = []
        nv = self.manifest.version + 1
        import uuid as _uuid

        try:
            if with_bucket_col:
                for d in sorted(os.listdir(staging)):
                    if not d.startswith(f"{table_mod.BUCKET_COL}="):
                        continue
                    bucket = int(d.split("=", 1)[1])
                    for i, fn in enumerate(sorted(os.listdir(os.path.join(staging, d)))):
                        if not fn.endswith(".parquet"):
                            continue
                        rel = f"data/v{nv}-{kind[0]}{bucket}-{i}-{_uuid.uuid4().hex[:8]}.parquet"
                        dst = os.path.join(self.path, rel)
                        shutil.move(os.path.join(staging, d, fn), dst)
                        entries.append(
                            {"path": rel, "bucket": bucket,
                             "schema_version": self.manifest.current_schema,
                             "rows": None, "kind": kind,
                             "bytes": os.path.getsize(dst)}
                        )
            else:
                for i, fn in enumerate(sorted(os.listdir(staging))):
                    if not fn.endswith(".parquet"):
                        continue
                    rel = f"data/v{nv}-{kind[0]}0-{i}-{_uuid.uuid4().hex[:8]}.parquet"
                    dst = os.path.join(self.path, rel)
                    shutil.move(os.path.join(staging, fn), dst)
                    entries.append(
                        {"path": rel, "bucket": 0,
                         "schema_version": self.manifest.current_schema,
                         "rows": None, "kind": kind,
                         "bytes": os.path.getsize(dst)}
                    )
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        STAGE_TIMES["driver_move"] = STAGE_TIMES.get("driver_move", 0.0) + (
            time.monotonic() - t1
        )
        return entries

    LakeTable._stage_write = timed
    return orig


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
