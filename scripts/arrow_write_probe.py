"""Scaling lever probe: JVM parquet writer vs Arrow/Python parquet writer.

Round-2 forensics bounded this host: payload-streaming JVM stages scale at
~0.45-0.50 from 4 -> 16 cores while Python/Arrow work scales at ~0.86 (see
BENCH/BASELINE.md).  The CDC delta write is the biggest payload-streaming
stage left, so the candidate lever is moving its parquet ENCODE (zstd +
encoding, the byte-heavy part) out of the JVM writer into pyarrow inside
`mapInPandas` — the shuffle stays JVM-side, the bytes-to-disk work moves to
the component that scales.

This probe measures exactly that stage both ways at pinned 4 and 16 cores
(fresh subprocess per level — a reused JVM keeps its launch affinity mask):

  variant jvm   : df.repartition(bucket).write.partitionBy(bucket).parquet
  variant arrow : same repartition -> mapInPandas(pyarrow.write_table zstd)

Output: one JSON line per (variant, cores) with wall seconds + MB written,
then a summary with each variant's 4->16 scaling efficiency.

Usage: python scripts/arrow_write_probe.py            # full matrix
       python scripts/arrow_write_probe.py --cell jvm 4   # one pinned cell
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

N_ROWS = 200_000
BUCKETS = 32


def build_payload(spark):
    from pyspark.sql import functions as F

    from ape_dts_spark.sources.generator import gen_pages_seed

    df = gen_pages_seed(spark, N_ROWS, seed=3).select(
        "url", "warc_ts", "html", "lang", F.lit(0).cast("long").alias("last_lsn")
    )
    return df.withColumn(
        "_bucket", F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).cast("int")
    )


def run_jvm(df, out_dir: str) -> None:
    (
        df.repartition(BUCKETS, "_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(out_dir)
    )


def run_arrow(df, out_dir: str) -> None:
    """Repartition by bucket JVM-side, encode+write parquet in the Python
    workers with pyarrow (zstd, matching the session codec)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_parts(batches):
        import uuid as _uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        tables = [pa.Table.from_pandas(b, preserve_index=False) for b in batches]
        if tables:
            t = pa.concat_tables(tables)
            path = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.parquet")
            pq.write_table(t, path, compression="zstd")
            yield pd.DataFrame({"rows": [t.num_rows]})
        else:
            yield pd.DataFrame({"rows": [0]})

    n = (
        df.repartition(BUCKETS, "_bucket")
        .mapInPandas(write_parts, "rows long")
        .groupBy()
        .sum("rows")
        .collect()[0][0]
    )
    assert n == N_ROWS, f"arrow writer lost rows: {n} != {N_ROWS}"


def cell(variant: str, cores: int) -> None:
    os.sched_setaffinity(0, set(range(cores)))
    from ape_dts_spark.session import get_spark

    spark = get_spark(f"awp-{variant}-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=BUCKETS)
    df = build_payload(spark).persist()
    df.count()  # materialize input so the timed region is write-only-ish
    out = tempfile.mkdtemp(prefix=f"awp-{variant}-")
    fn = run_jvm if variant == "jvm" else run_arrow
    fn(df, os.path.join(out, "warm"))  # warm codegen / worker pool
    walls = []
    for r in range(3):
        tgt = os.path.join(out, f"r{r}")
        t0 = time.monotonic()
        fn(df, tgt)
        walls.append(round(time.monotonic() - t0, 2))
    mb = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(os.path.join(out, "r0"))
        for f in fs
    ) / 1e6
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"variant": variant, "cores": cores, "walls": walls,
                      "best": min(walls), "mb": round(mb, 1)}))
    spark.stop()


def main():
    if "--cell" in sys.argv:
        i = sys.argv.index("--cell")
        cell(sys.argv[i + 1], int(sys.argv[i + 2]))
        return
    results = {}
    for variant in ("jvm", "arrow"):
        for cores in (4, 16):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cell", variant, str(cores)],
                check=True, capture_output=True, text=True,
            ).stdout.strip().splitlines()[-1]
            row = json.loads(out)
            results[(variant, cores)] = row
            print(out, flush=True)
    summary = {}
    for variant in ("jvm", "arrow"):
        eff = (results[(variant, 4)]["best"] / results[(variant, 16)]["best"]) / 4
        summary[variant] = {
            "best_4c": results[(variant, 4)]["best"],
            "best_16c": results[(variant, 16)]["best"],
            "efficiency_4_to_16": round(eff, 3),
        }
    print(json.dumps({"metric": "delta_write_scaling", "summary": summary}))


if __name__ == "__main__":
    main()
