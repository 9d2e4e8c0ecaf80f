"""Text-log emitters — the reference's position.log / monitor.log surface.

The reference tails two rolling text files for ops tooling (log4rs.yaml:
position_appender/monitor_appender; written from
dt-pipeline/src/base_pipeline.rs:365-390 ``record_checkpoint`` and
dt-common/src/monitor/monitor.rs:49-82 ``flush``):

    position.log: ``<ts> | current_position | {json}``
                  ``<ts> | checkpoint_position | {json}``
    monitor.log:  ``<ts> | <name> | <description> | <counter> | agg=v | ...``

The engine's checkpoint/lineage LAKE tables are the richer, queryable
source of the same facts; this module is the FILE-TAIL parity layer on top
— a deployment whose runbooks ``tail -f position.log`` keeps working.  The
position payload is type-tagged JSON exactly like the reference's
``Position`` enum (dt-common/src/meta/position.rs:72-76 serializes with a
``"type"`` tag); the engine's native position type is ``LakeCdc`` with the
lsn/batch fields the lake tail actually has.

Pure driver-side appends — no Spark jobs; a batch writes a handful of
lines.  Rolling matches log4rs fixed_window: at ``max_bytes`` the live
file rotates to ``<stem>1.log`` (older files shift up, at most
``backup_count`` kept).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone


def _ts() -> str:
    # log4rs pattern {d(%Y-%m-%d %H:%M:%S.%6f)(utc)}
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")


def position_from_log(line: str) -> dict | None:
    """Parse one position.log line back into the position dict — the
    reference's Position::from_log (position.rs:87-103): everything between
    the first '{' and the last '}' is the JSON payload."""
    left, right = line.find("{"), line.rfind("}")
    if left < 0 or right < 0:
        return None
    try:
        return json.loads(line[left : right + 1])
    except ValueError:
        return None


class RollingTextLog:
    """Append-only text log with log4rs-style fixed-window size rolling:
    file.log -> file1.log -> ... -> file<backup_count>.log (dropped)."""

    def __init__(self, path: str, max_bytes: int = 1 << 20, backup_count: int = 10):
        self.path = path
        self.max_bytes = max_bytes
        self.backup_count = backup_count
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _roll(self) -> None:
        stem, ext = os.path.splitext(self.path)
        oldest = f"{stem}{self.backup_count}{ext}"
        if os.path.exists(oldest):
            os.remove(oldest)
        for i in range(self.backup_count - 1, 0, -1):
            src = f"{stem}{i}{ext}"
            if os.path.exists(src):
                os.replace(src, f"{stem}{i + 1}{ext}")
        if os.path.exists(self.path):
            os.replace(self.path, f"{stem}1{ext}")

    def write(self, message: str) -> None:
        if (
            self.max_bytes > 0
            and os.path.exists(self.path)
            and os.path.getsize(self.path) >= self.max_bytes
        ):
            self._roll()
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(f"{_ts()} | {message}\n")


class MonitorLogEmitter:
    """position.log + monitor.log pair for one task directory."""

    def __init__(self, log_dir: str, max_bytes: int = 1 << 20, backup_count: int = 10):
        self.position = RollingTextLog(
            os.path.join(log_dir, "position.log"), max_bytes, backup_count
        )
        # reference monitor.log rolls at 100x the position size
        self.monitor = RollingTextLog(
            os.path.join(log_dir, "monitor.log"), max_bytes * 100, backup_count
        )

    def log_position(self, kind: str, position: dict) -> None:
        """kind: "current_position" | "checkpoint_position" (base_pipeline.rs:
        377-378).  ``position`` is the type-tagged dict; key order is kept
        stable with "type" first, like the reference's serde output."""
        ordered = {"type": position.get("type", "LakeCdc")}
        ordered.update({k: v for k, v in position.items() if k != "type"})
        self.position.write(f"{kind} | {json.dumps(ordered, separators=(',', ':'))}")

    def log_counter(
        self, name: str, description: str, counter_type: str, aggregates: dict
    ) -> None:
        """One monitor.log line: pipes-joined name/description/counter plus
        ``agg=value`` pairs (monitor.rs:53-66 flush format)."""
        aggs = " | ".join(f"{k}={v}" for k, v in aggregates.items())
        self.monitor.write(f"{name} | {description} | {counter_type} | {aggs}")
