"""Round-4 delta-write path probe: payload shuffle vs no-shuffle vs Arrow.

Round-3 measured (BENCH/arrow_write_probe_r3.json + BASELINE.md addendum 2)
that moving the parquet ENCODE to pyarrow does not reliably beat the JVM
writer.  The remaining candidate lever for the CDC write path is the
payload SHUFFLE: the current sink repartitions full rows (html included)
onto the bucket column before partitionBy-writing one file set per bucket
— one all-to-all pass of payload bytes through the JVM shuffle machinery,
which this host scales at ~0.5 while Python/Arrow work scales at ~0.86.

    variant shuffle   : repartition(BUCKETS, _bucket) -> partitionBy write
                        (the engine's current single-Exchange path)
    variant noshuffle : partitionBy write straight from the input
                        partitions — zero payload shuffle; each task write
                        covers all buckets it sees (Spark inserts a local
                        sort on the partition col), so the cost moved from
                        network/exchange to more, smaller files
                        (input_partitions x buckets worst case — the
                        files_per_bucket manifest model already admits >1
                        file per bucket)
    variant arrow     : round-3's pyarrow encode variant, re-run so ONE
                        artifact carries the full matrix (the r3 artifact
                        only recorded run 2 of 3)

Every cell is a fresh pinned subprocess (a reused JVM keeps its launch
affinity); the parallel write-bandwidth canary runs BEFORE the JVM starts
(a canary beside a live multi-GB heap reads reclaim pressure, not the
host — see BENCH/BASELINE.md round-2 addendum).  Results append as JSON
lines so partial runs still leave evidence.

Usage: python scripts/write_path_probe.py [--runs 3] [--out FILE]
       python scripts/write_path_probe.py --cell shuffle 4
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# payload builder and the shuffle/arrow writers are arrow_write_probe's —
# ONE spelling, so a writer fix (e.g. dropping _bucket from the written
# files) applies to the r3 and r4 artifacts alike instead of silently
# measuring two drifted variants
from arrow_write_probe import (  # noqa: E402
    BUCKETS,
    build_payload,
    run_arrow,
    run_jvm as run_shuffle,
)

VARIANTS = ("shuffle", "noshuffle", "arrow")
CORE_LEVELS = (4, 16)


def run_noshuffle(df, out_dir: str) -> None:
    # no Exchange: payload bytes go scan -> (local sort on _bucket) -> file
    df.write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)


RUNNERS = {"shuffle": run_shuffle, "noshuffle": run_noshuffle, "arrow": run_arrow}


def cell(variant: str, cores: int) -> None:
    os.sched_setaffinity(0, set(range(cores)))
    import bench

    canary = bench.write_bw_canary()  # pre-JVM, per memory/BASELINE addendum
    from ape_dts_spark.session import get_spark

    spark = get_spark(f"wpp-{variant}-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=BUCKETS)
    df = build_payload(spark).persist()
    df.count()
    out = tempfile.mkdtemp(prefix=f"wpp-{variant}-")
    fn = RUNNERS[variant]
    fn(df, os.path.join(out, "warm"))
    walls = []
    for r in range(3):
        tgt = os.path.join(out, f"r{r}")
        t0 = time.monotonic()
        fn(df, tgt)
        walls.append(round(time.monotonic() - t0, 2))
    files = mb = 0
    for dp, _, fs in os.walk(os.path.join(out, "r0")):
        for f in fs:
            if f.endswith(".parquet"):
                files += 1
                mb += os.path.getsize(os.path.join(dp, f))
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"variant": variant, "cores": cores, "walls": walls,
                      "best": min(walls), "mb": round(mb / 1e6, 1),
                      "files": files, "canary_gbps": canary}))
    spark.stop()


def main():
    if "--cell" in sys.argv:
        i = sys.argv.index("--cell")
        cell(sys.argv[i + 1], int(sys.argv[i + 2]))
        return
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3
    out_path = (
        sys.argv[sys.argv.index("--out") + 1]
        if "--out" in sys.argv
        else "BENCH/write_path_probe_r4.json"
    )
    all_rows = []
    with open(out_path, "a") as sink:
        for run in range(1, runs + 1):
            for variant in VARIANTS:
                for cores in CORE_LEVELS:
                    out = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--cell", variant, str(cores)],
                        check=True, capture_output=True, text=True,
                    ).stdout.strip().splitlines()[-1]
                    row = json.loads(out)
                    row["run"] = run
                    all_rows.append(row)
                    sink.write(json.dumps(row) + "\n")
                    sink.flush()
                    print(json.dumps(row), flush=True)
        summary = {}
        for variant in VARIANTS:
            per_run = []
            for run in range(1, runs + 1):
                lo = next(r for r in all_rows
                          if r["variant"] == variant and r["cores"] == 4
                          and r["run"] == run)
                hi = next(r for r in all_rows
                          if r["variant"] == variant and r["cores"] == 16
                          and r["run"] == run)
                per_run.append({
                    "run": run, "best_4c": lo["best"], "best_16c": hi["best"],
                    "efficiency_4_to_16": round(lo["best"] / hi["best"] / 4, 3),
                    "canaries": [lo["canary_gbps"], hi["canary_gbps"]],
                })
            summary[variant] = per_run
        line = json.dumps({"metric": "delta_write_scaling_r4", "runs": runs,
                           "summary": summary})
        sink.write(line + "\n")
        print(line)


if __name__ == "__main__":
    main()
