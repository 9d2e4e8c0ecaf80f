"""Endurance probe: a LONG change tail in many micro-batches.

Validates what the short scaling cells cannot: that per-batch cost stays
flat over a growing table (manifest segments stay O(tail), bounded
compaction amortizes, no driver-side accumulation) — the property that
decides whether the engine survives a 10^10-event tail.

Usage: python scripts/endurance_run.py <workdir> <n_seed> <n_events> <cores> <n_batches>
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir, n_seed, n_events, cores, n_batches = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
    )
    os.sched_setaffinity(0, set(range(cores)))
    from pyspark.sql import functions as F

    from ape_dts_spark.functions.extract_text import extract_text_udf
    from ape_dts_spark.lake.table import LakeTable
    from ape_dts_spark.session import get_spark
    from ape_dts_spark.sources.generator import PAGES_COLS, gen_changes, gen_ddl_events, gen_pages_seed
    from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig

    s = get_spark(f"endurance-{cores}", master=f"local[{cores}]", shuffle_partitions=64,
                  extra_conf={"spark.local.dir": f"/dev/shm/spark-endu"})
    os.makedirs(workdir, exist_ok=True)
    # fixture is keyed on (n_seed, n_events) via meta.json — a bare
    # "changes/ exists" check silently reuses a differently-sized stream
    # (batch_lsn_width is computed from the REQUESTED n_events, so a stale
    # fixture measures a 10x-smaller workload with no error).  meta.json is
    # written LAST so a crash mid-generation can never leave a workdir that
    # passes the check while missing the ddl file.
    meta_p = f"{workdir}/meta.json"
    fresh = False
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            m = json.load(f)
        fresh = m.get("n_seed") == n_seed and m.get("n_events") == n_events
    if not fresh:
        if os.path.exists(meta_p):
            os.remove(meta_p)
        for d in ("changes", "ddl"):
            shutil.rmtree(f"{workdir}/{d}", ignore_errors=True)
        gen_changes(s, n_events, n_seed, seed=42).repartition(128).write.parquet(f"{workdir}/changes")
        gen_ddl_events(s, n_events).write.parquet(f"{workdir}/ddl")
        with open(meta_p, "w") as f:
            json.dump({"n_seed": n_seed, "n_events": n_events}, f)
    pp = f"{workdir}/pages"
    for sfx in ("", "_checkpoints", "_lineage"):
        shutil.rmtree(pp + sfx, ignore_errors=True)
    t = LakeTable.create(pp, PAGES_COLS, bucket_key="url", bucket_count=64)
    t.append(gen_pages_seed(s, n_seed, seed=42).withColumn("text", extract_text_udf(F.col("html"))))
    # per-batch host-state canary (r4 verdict: the 10M run had a transient
    # 16/23/26s merge bump at batches 9-11 that recovered fully — consistent
    # with a hypervisor write-throttle window, but un-attributable without a
    # per-batch bandwidth sample).  A small parallel tmpfs write after each
    # checkpoint stamps the batch with the host's momentary write bandwidth:
    # a slow batch with a low canary is the PLATFORM window; a slow batch
    # with a healthy canary is the engine and should be flagged.
    from bench import write_bw_canary

    bw_by_batch: dict[int, float] = {}
    canary_cost = [0.0]

    def _canary_hook(stage, batch_id):
        if stage == "post_checkpoint":
            tc = time.monotonic()
            bw_by_batch[batch_id] = write_bw_canary(procs=2, mb_each=128)
            canary_cost[0] += time.monotonic() - tc

    cfg = EngineConfig(job_id="endurance", pages_path=pp, changes_path=f"{workdir}/changes",
                       ddl_path=f"{workdir}/ddl", batch_lsn_width=n_events // n_batches,
                       crash_hook=_canary_hook)
    eng = CdcEngine(s, cfg)
    t0 = time.monotonic()
    summ = eng.run()
    # engine throughput excludes the canary's own write time (~0.1s/batch)
    wall = time.monotonic() - t0 - canary_cost[0]
    n_files = len(t.refresh().manifest.files)
    for entry in eng.batch_log:
        entry["canary_wgbps"] = bw_by_batch.get(entry["batch_id"])
    print(json.dumps({
        "events": summ["events"], "batches": summ["batches"],
        "wall_sec": round(wall, 1), "events_per_sec": round(summ["events"] / wall, 1),
        "canary_cost_sec": round(canary_cost[0], 1),
        "final_rows": t.read(s).count(), "live_data_files": n_files,
        "batch_log": eng.batch_log,
    }))
    s.stop()


if __name__ == "__main__":
    main()
