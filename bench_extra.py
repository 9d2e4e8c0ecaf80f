"""Round-6 measurement harness (guide §1) — NOT part of the frozen bench.

Times each headline bench query exactly the way bench.py does (``.count()``
on the returned frame, same session settings), optionally several reps, and
dumps ``.explain("formatted")`` for each query to plans/r06/.

Usage:
    python bench_extra.py [--reps N] [--plans SUFFIX] [--only q1,q2,...]

Output: one JSON line {"queries": {name: [sec, ...]}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ape_dts_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = 1
    plans_suffix = None
    only = None
    args = sys.argv[1:]
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    if "--plans" in args:
        plans_suffix = args[args.index("--plans") + 1]
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))

    import bench as benchmod
    import __spark_entry__ as entrymod

    spark = get_spark("bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    for name in benchmod.BENCH_QUERIES:
        if only is not None and name not in only:
            continue
        fn = qs.get(name) or benchmod._BENCH_EXTRAS[name]
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            times.append(round(time.monotonic() - t0, 3))
            _ = n
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        if plans_suffix:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{plans_suffix}.txt"), "w") as f:
                f.write(plan)
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps({"queries": out, "sf": sf_dir, "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
