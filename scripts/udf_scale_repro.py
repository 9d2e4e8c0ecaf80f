"""Minimal repro: pandas-UDF (html->text) throughput at 4 vs 16 cores.

Each cell: read the probe changes parquet (limit N rows), run the extract
UDF, count non-empty results (forces full evaluation, no write).  Knobs via
env: OMP1=1 sets OMP_NUM_THREADS=1, ARROWB sets arrow batch size.

Usage: python scripts/udf_scale_repro.py cell <changes> <cores> <n>
       python scripts/udf_scale_repro.py all <changes> <n>
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cell(changes, cores, n):
    from pyspark.sql import functions as F

    from ape_dts_spark.functions.extract_text import extract_text_udf
    from ape_dts_spark.session import get_spark

    conf = {"spark.local.dir": f"/dev/shm/spark-local-{cores}"}
    if os.environ.get("ARROWB"):
        conf["spark.sql.execution.arrow.maxRecordsPerBatch"] = os.environ["ARROWB"]
    if os.environ.get("NOREUSE"):
        conf["spark.python.worker.reuse"] = "false"
    s = get_spark(f"u{cores}", master=f"local[{cores}]", shuffle_partitions=64,
                  extra_conf=conf)
    df = (
        s.read.parquet(changes)
        .filter(F.col("op") != "delete")
        .filter(F.col("lsn") <= int(n))
        .select("lsn", "html")
        .repartition(64)
    )
    df.count()  # warm scan
    # warm the python workers + JIT
    df.limit(2000).select(extract_text_udf("html").alias("t")).filter(
        F.length("t") > 0
    ).count()
    t0 = time.monotonic()
    got = df.select(extract_text_udf("html").alias("t")).filter(F.length("t") > 0).count()
    wall = time.monotonic() - t0
    print(json.dumps({"cores": cores, "rows": got, "wall": round(wall, 2),
                      "docs_per_sec": round(got / wall, 0)}))
    s.stop()


def main(changes, n):
    variants = [
        ("base", {}),
        ("omp1", {"OMP_NUM_THREADS": "1"}),
        ("arrow2k", {"ARROWB": "2048"}),
        ("omp1+arrow2k", {"OMP_NUM_THREADS": "1", "ARROWB": "2048"}),
    ]
    for name, env in variants:
        for cores in (4, 16):
            e = dict(os.environ)
            e.update(env)
            p = subprocess.run(
                [sys.executable, __file__, "cell", changes, str(cores), str(n)],
                capture_output=True, text=True, env=e,
            )
            out = p.stdout.strip().splitlines()
            if p.returncode != 0 or not out:
                # a dead cell must surface its traceback, not print
                # "None docs/s" and silently hole the A/B matrix
                sys.stderr.write(p.stderr[-4000:])
                raise RuntimeError(f"cell {name} c{cores} failed (rc={p.returncode})")
            r = json.loads(out[-1])
            print(f"{name} c{cores}: {r.get('docs_per_sec')} docs/s ({r.get('wall')}s)",
                  flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "cell":
        cell(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        main(sys.argv[2], sys.argv[3])
