"""Skew probe for the frequency-cap rewrite (r5, VERDICT item 1).

The dedup/decontamination family caps hot keys (LSH max_bucket, jaccard /
decontaminate max_doc_freq).  Through r4 the cap was
``count() OVER (PARTITION BY key)`` — a window aggregate gets NO partial
aggregation and cannot be AQE-skew-split, so the megakey the cap exists to
neutralize must first land WHOLE on one task before the filter drops it.
r5 ships ``_drop_hot_keys``: groupBy(key).count() (map-side combine reduces
the megakey to one row per map task) + left_anti join of the tiny over-cap
key list (AQE broadcasts it -> zero probe-side shuffle).

This probe plants a megakey and measures both forms on the same input:
identical output rows, wall time, and the plan shapes (the shipped form has
no Window node; its anti-join goes broadcast under AQE).

Run: python scripts/hot_key_cap_probe.py  ->  BENCH/hot_key_cap_probe_r5.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from ape_dts_spark.operators.text_dedup import _drop_hot_keys
from ape_dts_spark.session import get_spark

N_HOT = 20_000_000  # rows carrying the ONE hot key (boilerplate shingle)
N_TAIL = 2_000_000  # rows spread over many cold keys
CAP = 1000
REPS = 3


def window_form(df, cap):
    """The r4 form (kept here for the probe): every row of the hot key
    co-locates on one task before the filter discards it."""
    w = Window.partitionBy("key")
    return (
        df.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= cap)
        .drop("_n")
    )


def main() -> None:
    spark = get_spark(app_name="hot-key-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    hot = spark.range(N_HOT).select(
        F.col("id"), F.lit("the quick brown fox").alias("key")
    )
    tail = spark.range(N_TAIL).select(
        (F.col("id") + N_HOT).alias("id"),
        F.concat(F.lit("k"), (F.col("id") % 500_000).cast("string")).alias("key"),
    )
    path = "/tmp/hot_key_cap_probe.parquet"
    hot.unionByName(tail).repartition(32).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    shipped_plan = _drop_hot_keys(df, ["key"], CAP)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in shipped_plan, "cap regressed to a window"
    legacy_plan = window_form(df, CAP)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in legacy_plan

    # warmup both
    _drop_hot_keys(df, ["key"], CAP).count()
    window_form(df, CAP).count()

    walls = {"group_by_anti_join": [], "window_count": []}
    for _ in range(REPS):
        t0 = time.time()
        n_anti = _drop_hot_keys(df, ["key"], CAP).count()
        walls["group_by_anti_join"].append(round(time.time() - t0, 2))
        t0 = time.time()
        n_win = window_form(df, CAP).count()
        walls["window_count"].append(round(time.time() - t0, 2))

    same = (
        _drop_hot_keys(df, ["key"], CAP)
        .exceptAll(window_form(df, CAP))
        .unionByName(window_form(df, CAP).exceptAll(_drop_hot_keys(df, ["key"], CAP)))
        .count()
        == 0
    )
    # post-AQE plan of the executed shipped form: the over-cap key list must
    # have gone broadcast (no probe-side Exchange for the anti join)
    executed = _drop_hot_keys(df, ["key"], CAP)
    executed.count()
    final_plan = executed._jdf.queryExecution().executedPlan().toString()

    art = {
        "what": (
            f"frequency-cap skew probe: {N_HOT/1e6:.0f}M-row megakey + "
            f"{N_TAIL/1e6:.0f}M tail over 500k cold keys, cap={CAP}, "
            f"local[*], {REPS} reps after warmup"
        ),
        "rows": {"megakey": N_HOT, "tail": N_TAIL},
        "walls_sec": walls,
        "best_group_by_anti_join": min(walls["group_by_anti_join"]),
        "best_window_count": min(walls["window_count"]),
        "rows_kept": {"anti_join": n_anti, "window": n_win},
        "identical_output": bool(same),
        "shipped_plan_has_window": False,
        "shipped_final_plan_broadcast_anti": "BroadcastHashJoin" in final_plan,
        "conclusion": (
            "groupBy+anti computes the same drop with map-side partial "
            "aggregation (megakey -> one row per map task) and a broadcast "
            "anti-join; the window form must co-locate the whole megakey on "
            "one task first — the structural hazard at 10^10-doc scale"
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "hot_key_cap_probe_r5.json",
    )
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art))
    spark.stop()


if __name__ == "__main__":
    main()
