"""Pull-based change-feed consumer with ack tracking.

Reference: dt-pipeline/src/http_server_pipeline.rs:121-141 — ape-dts can run
as an HTTP server exposing `fetch_new` / `fetch_full` / `ack` so a consumer
pulls batches and acknowledges positions; unacked data is re-delivered after
a restart.  The transport (HTTP vs filesystem) is incidental; the contract
worth reproducing is **pull + explicit ack + replay-from-last-ack**.

This consumer reads the directory change feed written by
`change_feed.write_change_feed` (one parquet dir per topic, records carry a
strictly-increasing `lsn`) and tracks a durable ack position per
(consumer group, topic) in a small JSON file next to the feed:

    <feed>/_consumers/<group>.json   {"<topic>": {"acked_lsn": N}}

* `fetch(topic, max_records)` returns records with lsn > acked, in lsn
  order (pyarrow, no Spark job — a consumer poll must not cost a cluster
  job).
* `ack(topic, lsn)` durably advances the position (atomic tmp+rename).
* A crash between fetch and ack re-delivers — at-least-once, exactly the
  reference server's semantics (its ack persists position.log the same way).
"""

from __future__ import annotations

import json
import os
import uuid


class FeedConsumer:
    def __init__(self, feed_path: str, group: str = "default"):
        self.feed_path = feed_path
        self.group = group
        self._state_dir = os.path.join(feed_path, "_consumers")
        self._state_path = os.path.join(self._state_dir, f"{group}.json")

    # ------------------------------------------------------------ positions

    def _load(self) -> dict:
        if not os.path.exists(self._state_path):
            return {}
        with open(self._state_path) as fh:
            return json.load(fh)

    def acked_lsn(self, topic: str) -> int:
        return int(self._load().get(topic, {}).get("acked_lsn", 0))

    def ack(self, topic: str, lsn: int) -> None:
        """Durably advance the ack position (atomic tmp+rename); acking
        backwards is a no-op (idempotent replay)."""
        state = self._load()
        cur = int(state.get(topic, {}).get("acked_lsn", 0))
        if lsn <= cur:
            return
        state[topic] = {"acked_lsn": int(lsn)}
        os.makedirs(self._state_dir, exist_ok=True)
        tmp = os.path.join(self._state_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(state, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._state_path)

    # ------------------------------------------------------------ fetch

    def topics(self) -> list[str]:
        if not os.path.isdir(self.feed_path):
            return []
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(self.feed_path)
            if d.startswith("topic=")
        )

    def fetch(self, topic: str, max_records: int = 10_000) -> list[dict]:
        """Records with lsn > acked position, lsn-ascending, bounded.

        Driver-side pyarrow with an lsn predicate (row groups below the ack
        position are skipped via parquet statistics) — a consumer poll costs
        no Spark job.  Call `ack(topic, batch[-1]["lsn"])` after processing.
        """
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        tdir = os.path.join(self.feed_path, f"topic={topic}")
        if not os.path.isdir(tdir):
            return []
        lo = self.acked_lsn(topic)
        dataset = ds.dataset(tdir, format="parquet")
        tbl = dataset.to_table(filter=pc.field("lsn") > lo)
        tbl = tbl.sort_by("lsn")
        if tbl.num_rows > max_records:
            tbl = tbl.slice(0, max_records)
        return tbl.to_pylist()

    def fetch_full(self, topic: str, max_records: int = 10_000) -> list[dict]:
        """Replay from the beginning regardless of ack (reference fetch_full)."""
        import pyarrow.dataset as ds

        tdir = os.path.join(self.feed_path, f"topic={topic}")
        if not os.path.isdir(tdir):
            return []
        tbl = ds.dataset(tdir, format="parquet").to_table().sort_by("lsn")
        if tbl.num_rows > max_records:
            tbl = tbl.slice(0, max_records)
        return tbl.to_pylist()
