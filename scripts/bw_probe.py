"""JVM-stage scaling probe (4 vs 16 pinned cores, one subprocess per cell).

The Spark-free mp_extract_probe shows the HOST scales parallel Python
extraction at ~0.86 efficiency 4->16, so the host is not the ceiling; this
probe isolates which JVM-side stage of the payload pipeline is:

  A. parquet scan + cheap agg over html        (decode + bus)
  B. scan -> hash exchange -> sorted parquet   (the merge stage, minus UDF)
  C. cache-resident integer hashing            (pure JVM CPU reference)

Each (cell, rep) is its own subprocess so the JVM is freshly launched under
the right CPU-affinity mask (a reused py4j JVM keeps its launch-time mask).

Usage: python scripts/bw_probe.py [reps]          # orchestrate
       python scripts/bw_probe.py cell <cores>    # one cell (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHANGES = os.environ.get("BW_CHANGES", "/tmp/apedts-probe2/changes")
LEVELS = [4, 16]


def run_cell(cores: int) -> None:
    os.sched_setaffinity(0, set(range(cores)))
    from pyspark.sql import functions as F

    from ape_dts_spark.session import get_spark

    spark = get_spark(
        f"bw-{cores}", master=f"local[{cores}]", shuffle_partitions=64,
        extra_conf={"spark.local.dir": f"/dev/shm/spark-bw-{cores}"},
    )
    ch = spark.read.parquet(CHANGES)
    ch.count()  # warm footer/OS cache
    out = {}

    t0 = time.monotonic()
    ch.select(F.sum(F.bit_count(F.xxhash64("html"))).alias("h")).collect()
    out["A_scan_hash"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    (
        ch.select("lsn", "url", "html")
        .repartition(64, F.pmod(F.xxhash64("url"), F.lit(64)))
        .sortWithinPartitions("url", "lsn")
        .write.mode("overwrite")
        .parquet(f"/dev/shm/spark-bw-{cores}-out")
    )
    out["B_shuffle_sort_write"] = round(time.monotonic() - t0, 2)
    import shutil

    shutil.rmtree(f"/dev/shm/spark-bw-{cores}-out", ignore_errors=True)

    t0 = time.monotonic()
    spark.range(6_000_000_000, numPartitions=64).select(
        F.sum(F.bit_count(F.xxhash64(F.col("id")))).alias("h")
    ).collect()
    out["C_cpu_hash"] = round(time.monotonic() - t0, 2)

    print(json.dumps({"cores": cores, **out}))
    spark.stop()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cells: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for _ in range(reps):
        for c in LEVELS:  # interleaved
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "cell", str(c)],
                check=True, capture_output=True, text=True,
                env=dict(os.environ, BW_CHANGES=CHANGES),
            ).stdout.strip().splitlines()[-1]
            cells[c].append(json.loads(out))
            print(out, flush=True)
    summary = {}
    for probe in ("A_scan_hash", "B_shuffle_sort_write", "C_cpu_hash"):
        med = {c: statistics.median(r[probe] for r in cells[c]) for c in LEVELS}
        speedup = med[LEVELS[0]] / med[LEVELS[1]]
        summary[probe] = {
            "sec_median": med,
            "speedup_4_to_16": round(speedup, 2),
            "efficiency": round(speedup / (LEVELS[1] / LEVELS[0]), 3),
        }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cell":
        run_cell(int(sys.argv[2]))
    else:
        main()
