"""N-vs-4N scaling evidence for the CURATION pipeline (corpus_pipeline),
extending the north-rule protocol beyond the CDC tail: same pinned
fresh-subprocess cells (4 vs 16 cores), same input, interleaved reps,
per-cell write-bandwidth canary.

The dedup family is hash-CPU-bound (md5 shingling in fused projections),
not payload-write-bound, so it should scale closer to the extraction
stage's ~0.86 than the JVM write path's ~0.5 on this host.

Usage:
  python scripts/pipeline_scaling_probe.py prepare <workdir> <n_docs>
  python scripts/pipeline_scaling_probe.py run <workdir> <cores>   # one cell
  python scripts/pipeline_scaling_probe.py all <workdir> <n_docs>  # orchestrate
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3
LEVELS = (4, 16)


def prepare(workdir: str, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from ape_dts_spark.session import get_spark

    meta_p = f"{workdir}/meta.json"
    if os.path.exists(meta_p) and json.load(open(meta_p)).get("n_docs") == n_docs:
        return
    if os.path.exists(meta_p):
        os.remove(meta_p)
    shutil.rmtree(f"{workdir}/docs", ignore_errors=True)
    s = get_spark("gen", master="local[32]", shuffle_partitions=32)
    base = s.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    copies = max(1, -(-n_docs // n_base))
    parts = []
    for i in range(copies):
        # vary text per copy except every 7th copy: planted exact/near dups
        suffix = F.lit("") if i % 7 == 0 else F.concat(F.lit(" v"), F.lit(str(i)))
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * n_base)).alias("doc_id"),
                F.concat(F.col("text"), suffix).alias("text"),
            )
        )
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    docs = docs.filter(F.col("doc_id") < n_docs).select(
        "doc_id",
        F.concat(
            F.lit("https://www.example"),
            (F.col("doc_id") % 997).cast("string"),
            F.lit(".com/art/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    # enough files that scan splits exceed the largest core level
    docs.repartition(64).write.parquet(f"{workdir}/docs")
    with open(meta_p, "w") as f:
        json.dump({"n_docs": n_docs}, f)
    s.stop()


def run_cell(workdir: str, cores: int) -> None:
    if os.environ.get("PROBE_PIN", "1") == "1":
        allowed = sorted(os.sched_getaffinity(0))
        os.sched_setaffinity(0, set(allowed[:cores]))
    from ape_dts_spark.pipelines import corpus_pipeline
    from ape_dts_spark.session import get_spark

    extra = {
        "spark.local.dir": f"/dev/shm/spark-pipe-{cores}",
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    }
    # same env knobs as scaling_probe so protocol tweaks hit both probes
    if os.environ.get("PROBE_AQE_OFF"):
        extra["spark.sql.adaptive.enabled"] = "false"
    if os.environ.get("PROBE_EXTRA_CONF"):
        extra.update(json.loads(os.environ["PROBE_EXTRA_CONF"]))
    s = get_spark(
        f"pipe{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("PROBE_SHUF", "64")),
        extra_conf=extra,
    )
    s.sparkContext.setLogLevel("ERROR")
    docs = s.read.parquet(f"{workdir}/docs")
    n_in = docs.count()

    def one() -> tuple[float, int]:
        t0 = time.monotonic()
        out = corpus_pipeline(docs, min_words=5, domain_cap_n=1_000_000)
        n = out.count()
        wall = time.monotonic() - t0
        # corpus_pipeline persists an INTERNAL frame (pre-near-dup
        # survivors); clear the whole cache so reps don't accumulate
        s.catalog.clearCache()
        return wall, n

    one()  # warmup (JIT + codegen + shuffle dirs)
    walls, n_out = [], 0
    for _ in range(2):
        w, n_out = one()
        walls.append(round(w, 2))
    print(
        json.dumps(
            {
                "cores": cores,
                "walls_sec": walls,
                "best": min(walls),
                "docs_in": n_in,
                "docs_out": n_out,
                "docs_per_sec": round(n_in / min(walls), 1),
            }
        )
    )
    s.stop()


def orchestrate(workdir: str, n_docs: int) -> None:
    from bench import write_bw_canary

    prepare(workdir, n_docs)
    cells: dict[str, list] = {str(c): [] for c in LEVELS}
    canaries = []
    for rep in range(REPS):
        for cores in LEVELS:  # interleaved: host regime drift hits both levels
            canaries.append(round(write_bw_canary(), 2))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run", workdir, str(cores)],
                capture_output=True,
                text=True,
                check=True,
            )
            cell = json.loads(out.stdout.strip().splitlines()[-1])
            cells[str(cores)].append(cell)
    lo, hi = (str(c) for c in LEVELS)
    best_lo = max(c["docs_per_sec"] for c in cells[lo])
    best_hi = max(c["docs_per_sec"] for c in cells[hi])
    med = lambda xs: sorted(xs)[len(xs) // 2]
    med_lo = med([c["docs_per_sec"] for c in cells[lo]])
    med_hi = med([c["docs_per_sec"] for c in cells[hi]])
    ratio = LEVELS[1] / LEVELS[0]
    art = {
        "what": (
            f"corpus_pipeline (canonicalize->cap->exact dedup->LSH near-dup CC->quality->split) "
            f"scaling, pinned local[{LEVELS[0]}] vs local[{LEVELS[1]}], {REPS} interleaved reps "
            f"(2 measured runs per cell after warmup), tmpfs shuffle, fresh subprocess per cell"
        ),
        "n_docs": json.load(open(f"{workdir}/meta.json"))["n_docs"],
        "cells": cells,
        "canaries_gbps": canaries,
        "docs_per_sec": {lo: {"best": best_lo, "median": med_lo}, hi: {"best": best_hi, "median": med_hi}},
        "efficiency_best": round(best_hi / best_lo / ratio, 3),
        "efficiency_median": round(med_hi / med_lo / ratio, 3),
    }
    out_p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "pipeline_scaling_r4.json",
    )
    with open(out_p, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art["docs_per_sec"]))
    print("efficiency best/median:", art["efficiency_best"], art["efficiency_median"])


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "prepare":
        prepare(sys.argv[2], int(sys.argv[3]))
    elif cmd == "run":
        run_cell(sys.argv[2], int(sys.argv[3]))
    elif cmd == "all":
        orchestrate(sys.argv[2], int(sys.argv[3]))
    else:
        raise SystemExit(f"unknown command {cmd}")
