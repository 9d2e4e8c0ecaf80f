"""Spark-free host ceiling probe: parallel html->text extraction throughput
at N pinned processes, N in {4, 16}.

No JVM, no shuffle, no scheduler — just `cores` OS processes, each pinned
to its own CPU, running functions.extract_text over an identical workload.
Whatever efficiency THIS shows is the host's achievable ceiling for the
engine's dominant per-event compute; the e2e CDC job cannot scale better
than its dominant stage's host ceiling.  On a real cluster each executor
brings its own cores + memory bus, so this ceiling is a single-box
artifact, not an engine property.

Usage: python scripts/mp_extract_probe.py [reps] [docs_per_proc]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHANGES = os.environ.get("BW_CHANGES", "/tmp/apedts-probe2/changes")
LEVELS = [4, 16]


def _load_payloads(n: int) -> list[bytes]:
    import pyarrow.dataset as ds

    d = ds.dataset(CHANGES, format="parquet")
    tbl = d.head(n * 2, columns=["html"])
    out = [v.as_py() for v in tbl["html"] if v.is_valid][:n]
    assert len(out) == n, f"only {len(out)} payloads available"
    return out


def _worker(cpu: int, payloads: list[bytes], reps: int, q) -> None:
    os.sched_setaffinity(0, {cpu})
    from ape_dts_spark.functions.extract_text import extract_text

    # warm-up (regex compile, allocator)
    for h in payloads[:50]:
        extract_text(h)
    t0 = time.monotonic()
    n = 0
    for _ in range(reps):
        for h in payloads:
            extract_text(h)
            n += 1
    q.put((n, time.monotonic() - t0))


def run_level(cores: int, payloads: list[bytes], reps: int) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(i, payloads, reps, q)) for i in range(cores)
    ]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    tot = 0
    for _ in procs:
        n, _w = q.get()
        tot += n
    for p in procs:
        p.join()
    wall = time.monotonic() - t0
    return tot / wall


def main():
    outer_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    payloads = _load_payloads(n_docs)
    mb = sum(len(p) for p in payloads) / 1e6
    cells: dict[int, list[float]] = {c: [] for c in LEVELS}
    for _ in range(outer_reps):
        for c in LEVELS:  # interleaved
            cells[c].append(round(run_level(c, payloads, reps=2), 1))
    med = {c: statistics.median(v) for c, v in cells.items()}
    eff = (med[16] / med[4]) / 4
    print(
        json.dumps(
            {
                "probe": "mp_extract",
                "payload_mb": round(mb, 1),
                "docs_per_sec": {str(c): cells[c] for c in LEVELS},
                "median": {str(c): med[c] for c in LEVELS},
                "speedup_4_to_16": round(med[16] / med[4], 2),
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
