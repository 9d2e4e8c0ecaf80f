"""Clean scaling measurement: one subprocess per (cores, config) cell, with
an in-session warmup batch before the measured run.  Used to produce
BENCH/BASELINE.md numbers.

Usage:
  python scripts/scaling_probe.py prepare <workdir> <n_seed> <n_events>
  python scripts/scaling_probe.py run <workdir> <cores> <extract:0|1>  # one cell
  python scripts/scaling_probe.py all <workdir> <n_seed> <n_events>    # orchestrate
"""

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prepare(workdir, n_seed, n_events):
    from ape_dts_spark.session import get_spark
    from ape_dts_spark.sources.generator import gen_changes, gen_ddl_events

    from pyspark.sql import functions as F

    from ape_dts_spark.functions.extract_text import extract_text_udf
    from ape_dts_spark.lake.table import LakeTable
    from ape_dts_spark.sources.generator import PAGES_COLS, gen_pages_seed

    s = get_spark("gen", master="local[32]", shuffle_partitions=32)
    # fixture keyed on (n_seed, n_events): a bare existence check would
    # silently reuse a differently-sized stream on rerun.  meta.json is
    # removed first / written last so a crash mid-generation can't leave a
    # workdir that passes the check.
    meta_p = f"{workdir}/meta.json"
    fresh = False
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            m = json.load(f)
        fresh = m.get("n_seed") == n_seed and m.get("n_events") == n_events
    if not fresh:
        if os.path.exists(meta_p):
            os.remove(meta_p)
        for d in ("changes", "ddl", "pages_seed_e0", "pages_seed_e1"):
            shutil.rmtree(f"{workdir}/{d}", ignore_errors=True)
        # many files: scan-split parallelism must exceed the largest core
        # level at BOTH levels, or the scan stage caps the whole comparison
        gen_changes(s, n_events, n_seed, seed=42).repartition(128).write.parquet(
            f"{workdir}/changes"
        )
        gen_ddl_events(s, n_events).write.parquet(f"{workdir}/ddl")
        with open(meta_p, "w") as f:
            json.dump({"n_seed": n_seed, "n_events": n_events}, f)
    # seed pages tables built ONCE here (setup, not the measured CDC tail);
    # run cells copy the directory instead of re-extracting 10^6 seed rows
    for extract in (0, 1):
        sp = f"{workdir}/pages_seed_e{extract}"
        if os.path.exists(sp):
            continue
        t = LakeTable.create(sp, PAGES_COLS, bucket_key="url", bucket_count=64)
        seed = gen_pages_seed(s, n_seed, seed=42)
        if extract:
            seed = seed.withColumn("text", extract_text_udf(F.col("html")))
        t.append(seed)
    s.stop()


def run_cell(workdir, cores, extract):
    # Pin THIS subprocess (and therefore the JVM + forked Python UDF workers
    # it is about to launch) to exactly `cores` CPUs.  Without pinning,
    # local[N] caps the JVM task threads but the Python workers overflow
    # onto extra host cores, inflating the small level and understating
    # efficiency.  Must happen before the JVM starts; note that a JVM
    # re-used across SparkSessions in ONE process keeps its launch-time
    # mask, which is why each cell is a fresh subprocess.
    if os.environ.get("PROBE_PIN", "1") == "1":
        # pin within the ALLOWED set — CPUs 0..N-1 need not be in it
        # (cpuset containers, restricted masks); same form as bench.py's
        # scaling_cell and pipeline_scaling_probe so cells stay comparable
        allowed = sorted(os.sched_getaffinity(0))
        os.sched_setaffinity(0, set(allowed[:cores]))
    from pyspark.sql import functions as F

    from ape_dts_spark.functions.extract_text import extract_text_udf
    from ape_dts_spark.lake.table import LakeTable
    from ape_dts_spark.session import get_spark
    from ape_dts_spark.sources.generator import PAGES_COLS, gen_pages_seed
    from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig

    meta = json.load(open(f"{workdir}/meta.json"))
    n_seed, n_events = meta["n_seed"], meta["n_events"]
    # RAM-backed shuffle dir: the sandbox's single shared disk writes at
    # ~286 MB/s (measured), which caps BOTH parallelism levels identically; a
    # real N vs 4N cluster has per-executor disks.  tmpfs emulates that.
    # IDENTICAL config at both levels except the core count: same shuffle
    # partitioning (= bucket count, so plans are identical), same split
    # size (4 MB compressed ~= 40 MB of rows: >=32 splits per batch slice).
    extra = {
        "spark.local.dir": f"/dev/shm/spark-local-{cores}",
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    }
    if os.environ.get("PROBE_AQE_OFF"):
        extra["spark.sql.adaptive.enabled"] = "false"
    if os.environ.get("PROBE_EXTRA_CONF"):
        extra.update(json.loads(os.environ["PROBE_EXTRA_CONF"]))
    s = get_spark(
        f"cell{cores}", master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("PROBE_SHUF", "64")),
        extra_conf=extra,
    )

    def one_run(tag, warmup_frac=None):
        pp = f"{workdir}/pages_{tag}"
        for sfx in ("", "_checkpoints", "_lineage"):
            shutil.rmtree(pp + sfx, ignore_errors=True)
        shutil.copytree(f"{workdir}/pages_seed_e{extract}", pp)
        cfg = EngineConfig(
            job_id=tag, pages_path=pp, changes_path=f"{workdir}/changes",
            ddl_path=f"{workdir}/ddl", batch_lsn_width=n_events,
            extract_text=bool(extract),
        )
        eng = CdcEngine(s, cfg)
        t0 = time.monotonic()
        summ = eng.run(max_batches=1 if warmup_frac else None)
        wall = time.monotonic() - t0
        return summ, wall, eng

    def gc_ms():
        t = 0
        beans = s._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            t += beans.get(i).getCollectionTime()
        return t

    one_run(f"w{cores}e{extract}", warmup_frac=0.1)  # warmup: first batch only
    g0 = gc_ms()
    summ, wall, eng = one_run(f"m{cores}e{extract}")
    print(
        json.dumps(
            {
                "cores": cores,
                "extract": extract,
                "wall_sec": round(wall, 2),
                "gc_sec": round((gc_ms() - g0) / 1000, 1),
                "events": summ["events"],
                "events_per_sec": round(summ["events"] / wall, 1),
                "batch_log": eng.batch_log,
            }
        )
    )
    s.stop()


def orchestrate(workdir, n_seed, n_events):
    os.makedirs(workdir, exist_ok=True)
    subprocess.run(
        [sys.executable, __file__, "prepare", workdir, str(n_seed), str(n_events)],
        check=True, stderr=subprocess.DEVNULL,
    )
    # interleaved best-of-N: the sandbox host shows 2x+ run-to-run noise
    # (shared hypervisor); interleaving levels and keeping each level's best
    # run measures the engine, not the neighbor traffic.
    reps = int(os.environ.get("PROBE_REPS", "3"))
    # N vs 4N within PHYSICAL cores: this host exposes 32 hw threads over
    # ~16 physical cores; a pure-CPU process pool scales 4->16 at ~1.0
    # efficiency but 8->32 at only ~0.69 (SMT) — so 4 vs 16 is the honest
    # stand-in for "same job, 4x executors" (see BENCH/BASELINE.md).
    levels = tuple(int(x) for x in os.environ.get("PROBE_LEVELS", "4,16").split(","))
    def canary() -> float:
        """Single-thread fixed burn (M ops/s) — detects the host's invisible
        throttling windows (firecracker guests expose no steal time) so slow
        cells can be attributed to the platform, not the engine."""
        t0 = time.monotonic()
        s, n = 0, 3_000_000
        for i in range(n):
            s += i * i % 7
        return round(n / (time.monotonic() - t0) / 1e6, 1)

    # PARALLEL write-bandwidth canary (GB/s aggregate, tmpfs): the host
    # throttles aggregate parallel memory-write bandwidth in multi-minute
    # windows (measured 2026-08-17: the same raw 16-proc write test gave
    # 6.8 GB/s, then 12.6 GB/s 40 min later, CPU canary flat throughout).
    # The single-thread canary cannot see this — a lone writer stays under
    # even the throttled cap — so each cell records this parallel canary
    # too; reps landing in a throttled window are identifiable and the
    # per-level BEST is the engine-attributable number.  ONE spelling,
    # shared with the bench: a local copy had already dropped the OSError
    # guard and the result-queue drain (a full /dev/shm then reports a huge
    # bogus bandwidth — the exact opposite of the signal).
    from bench import write_bw_canary as bw_canary

    results: dict = {}
    all_runs: dict = {}
    for rep in range(reps):
        for extract in tuple(
            int(x) for x in os.environ.get("PROBE_EXTRACTS", "1,0").split(",")
        ):
            for cores in levels:
                c0 = canary()
                bw0 = bw_canary()
                out = subprocess.run(
                    [sys.executable, __file__, "run", workdir, str(cores), str(extract)],
                    check=True, capture_output=True, text=True,
                ).stdout.strip().splitlines()[-1]
                r = json.loads(out)
                r["canary_mops"] = c0
                r["canary_wgbps"] = bw0
                key = (extract, cores)
                all_runs.setdefault(key, []).append(r["events_per_sec"])
                if key not in results or r["events_per_sec"] > results[key]["events_per_sec"]:
                    results[key] = r
                print(f"rep{rep} extract={extract} cores={cores}: "
                      f"{r['events_per_sec']} ev/s ({r['wall_sec']}s) canary={c0}M "
                      f"wbw={bw0}GB/s", flush=True)
    lo, hi = levels[0], levels[-1]
    # Regression canary (r5, SURVEY §6 standing position): the 4->16 CDC
    # efficiency question is CLOSED — every structural lever was probed and
    # refuted with artifacts, and ~0.59-0.66 is the host's measured ceiling
    # for this payload-write-bound stage.  These are the same-window probe
    # baselines (BENCH/scaling_round4.json best values); a future round that
    # lands >0.05 BELOW its baseline indicates an ENGINE regression (a new
    # serial stage, a lost partial-agg), not host noise — alert loudly.
    _EFF_BASELINE = {1: 0.59, 0: 0.485}
    summary = {}
    for extract in tuple(
        int(x) for x in os.environ.get("PROBE_EXTRACTS", "1,0").split(",")
    ):
        cells = {}
        for c in levels:
            evs = sorted(all_runs[(extract, c)])
            cells[c] = {
                "best": evs[-1],
                "median": evs[len(evs) // 2],
                "all": evs,
            }
        eff_best = (cells[hi]["best"] / cells[lo]["best"]) / (hi / lo)
        eff_med = (cells[hi]["median"] / cells[lo]["median"]) / (hi / lo)
        base = _EFF_BASELINE.get(extract)
        alert = base is not None and eff_best < base - 0.05
        if alert:
            print(
                f"REGRESSION ALERT extract={extract}: efficiency_best "
                f"{eff_best:.3f} is >0.05 below the r4 same-window baseline "
                f"{base} — suspect an engine change, not the host",
                flush=True,
            )
        summary[f"extract{extract}"] = {
            "levels": {str(c): cells[c] for c in levels},
            "efficiency_best": round(eff_best, 3),
            "efficiency_median": round(eff_med, 3),
            "baseline_efficiency_best": base,
            "regression_alert": alert,
        }
        print(
            f"extract={extract}: eff {lo}->{hi} median={eff_med:.3f} best={eff_best:.3f} "
            f"(ev/s median {cells[lo]['median']:.0f} -> {cells[hi]['median']:.0f})",
            flush=True,
        )
    with open(f"{workdir}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    with open(f"{workdir}/results.json", "w") as f:
        json.dump({f"e{e}_c{c}": v for (e, c), v in results.items()}, f, indent=1)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "prepare":
        prepare(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    elif cmd == "run":
        run_cell(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    elif cmd == "all":
        orchestrate(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
