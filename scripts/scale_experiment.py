"""Interleaved A/B scaling experiment: isolates which stage shapes anti-scale
with cores on this host.  One subprocess per cell; cells interleaved across
reps to average out hypervisor noise; reports wall + JVM CPU per cell.

Usage: python scripts/scale_experiment.py <changes_dir> [reps]
"""

import json
import os
import resource
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cell(changes, cores, workload):
    from pyspark.sql import functions as F

    from ape_dts_spark.session import get_spark

    s = get_spark(
        f"x{cores}", master=f"local[{cores}]", shuffle_partitions=cores,
        extra_conf={"spark.local.dir": f"/dev/shm/spark-local-{cores}"},
    )
    df = s.read.parquet(changes)
    df.count()  # warm: scan + page cache + codegen

    t0 = time.monotonic()
    if workload == "agg":
        df.groupBy("op").agg(F.sum(F.length("html"))).collect()
    elif workload == "shufw":
        df.repartition(64, F.pmod(F.xxhash64("url"), F.lit(64))).write.mode(
            "overwrite"
        ).parquet("/dev/shm/xout")
    elif workload == "window":
        from pyspark.sql import Window

        w = Window.partitionBy(
            F.pmod(F.xxhash64("url"), F.lit(64))
        ).orderBy(F.col("url").asc(), F.col("lsn").desc())
        df.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        ).select(F.count(F.lit(1))).collect()
    elif workload == "sort":
        df.repartition(64, F.pmod(F.xxhash64("url"), F.lit(64))).sortWithinPartitions(
            "url", F.col("lsn").desc()
        ).write.mode("overwrite").parquet("/dev/shm/xout")
    wall = time.monotonic() - t0
    s.stop()
    # the shufw/sort cells leave a full payload copy in tmpfs (RAM) — freeing
    # it here keeps headroom for later cells' spark.local.dir and canaries
    shutil.rmtree("/dev/shm/xout", ignore_errors=True)
    time.sleep(0.5)
    cpu = resource.getrusage(resource.RUSAGE_CHILDREN)
    print(json.dumps({"wall": round(wall, 2), "jvm_cpu": round(cpu.ru_utime + cpu.ru_stime, 1)}))


def main():
    changes = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    workloads = ["agg", "shufw", "sort", "window"]
    cells = [(w, c) for w in workloads for c in (8, 32)]
    acc: dict = {}
    for rep in range(reps):
        for w, c in cells:
            p = subprocess.run(
                [sys.executable, __file__, "cell", changes, str(c), w],
                capture_output=True, text=True,
            )
            if p.returncode != 0 or not p.stdout.strip():
                # surface the cell's actual failure instead of an opaque
                # IndexError on empty stdout with stderr discarded
                sys.stderr.write(p.stderr[-4000:])
                raise RuntimeError(f"cell {w} c{c} failed (rc={p.returncode})")
            r = json.loads(p.stdout.strip().splitlines()[-1])
            acc.setdefault((w, c), []).append(r)
            print(f"rep{rep} {w} c{c}: wall={r['wall']}s jvm_cpu={r['jvm_cpu']}s", flush=True)
    print("\n=== medians (wall s) ===")
    for w in workloads:
        med = {}
        for c in (8, 32):
            walls = sorted(x["wall"] for x in acc[(w, c)])
            med[c] = walls[len(walls) // 2]
        sp = med[8] / med[32] if med[32] else 0
        print(f"{w}: c8={med[8]}s c32={med[32]}s speedup={sp:.2f}x eff={sp/4:.2f}")


if __name__ == "__main__":
    if sys.argv[1] == "cell":
        run_cell(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
