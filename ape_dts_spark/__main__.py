"""Task entrypoint — the `ape-dts task_config.ini` analog, spark-submit-able.

Run modes (reference task types, dt-main/src/main.rs dispatch):

    python -m ape_dts_spark task_config.ini                 # local run
    spark-submit --py-files ape_dts_spark.zip \
        scripts/run_task.py task_config.ini                 # cluster run

The ini layout mirrors the reference's section names (see config.py).  The
task type comes from `[extractor] extract_type`:

    snapshot          chunked, resume-by-chunk seed load from snapshot_path
    cdc               checkpointed LSN-sliced replay of changes_path
    snapshot_and_cdc  seed load then tail — the reference's full-sync flow

On a cluster the SparkSession is owned by spark-submit (builder
.getOrCreate() picks up the submitted master/conf); locally we default to
local[$SPARK_GRAFT_CPUS].  Emits ONE summary JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def _get_session(master: str | None) -> SparkSession:
    from ape_dts_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if master is None:
        # under spark-submit the builder carries the submitted conf; only
        # fall back to the local default when nothing was configured
        import os

        if "SPARK_SUBMIT_OPTS" in os.environ or os.environ.get("SPARK_CONF_DIR"):
            return SparkSession.builder.getOrCreate()
    return get_spark("ape-dts-spark-task", master=master)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ape_dts_spark")
    ap.add_argument("config", help="task_config.ini (reference section layout)")
    ap.add_argument("--master", default=None, help="override Spark master (local runs)")
    ap.add_argument(
        "--task",
        default=None,
        choices=["snapshot", "cdc", "snapshot_and_cdc"],
        help="override [extractor] extract_type",
    )
    ap.add_argument("--max-batches", type=int, default=None)
    args = ap.parse_args(argv)

    import configparser

    from ape_dts_spark.config import load_task_config
    from ape_dts_spark.lake.table import LakeTable
    from ape_dts_spark.sources.generator import PAGES_COLS
    from ape_dts_spark.streaming.driver import CdcEngine
    from ape_dts_spark.streaming.snapshot import snapshot_complete, snapshot_load

    cp = configparser.ConfigParser()
    cp.read(args.config)
    ext = cp["extractor"] if cp.has_section("extractor") else {}
    snk = cp["sinker"] if cp.has_section("sinker") else {}
    task = args.task or ext.get("extract_type", "cdc")
    cfg = load_task_config(args.config)

    spark = _get_session(args.master)
    summary: dict = {"task": task, "job_id": cfg.job_id}

    if not LakeTable.exists(cfg.pages_path):
        LakeTable.create(
            cfg.pages_path,
            PAGES_COLS,
            bucket_key=cfg.key_col,
            bucket_count=int(snk.get("bucket_count", "16")),
        )

    if task in ("snapshot", "snapshot_and_cdc"):
        snapshot_path = ext.get("snapshot_path")
        if not snapshot_path:
            print("error: snapshot task needs [extractor] snapshot_path", file=sys.stderr)
            return 2
        table = LakeTable.load(cfg.pages_path)
        if snapshot_complete(table):
            summary["snapshot"] = {"skipped": "already complete"}
        else:
            seed = spark.read.parquet(snapshot_path)
            summary["snapshot"] = snapshot_load(
                spark, table, seed, n_chunks=int(ext.get("snapshot_chunks", "16"))
            )

    if task in ("cdc", "snapshot_and_cdc"):
        eng = CdcEngine(spark, cfg)
        run = eng.run(max_batches=args.max_batches)
        summary["cdc"] = {
            "events": run["events"],
            "batches": run["batches"],
            "hwm": run.get("hwm"),
            "metrics": run.get("metrics"),
        }

    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
