"""Custom stateful streaming operator: cross-batch stale-event guard.

Within one micro-batch, LWW dedup (operators/dedup.py) picks the max-lsn
row per url.  Across batches, an at-least-once upstream (reconnecting
binlog reader, replayed Kafka partition — reference resume path
`dt-connector/src/extractor/resumer/cdc_resumer.rs`) can re-deliver events
whose lsn is BELOW what a previous batch already applied.  The MERGE sink
is idempotent on (url, lsn) so correctness holds, but every stale event
still costs a merge probe.  This operator drops them before the sink using
per-key streaming state: state[url] = high-watermark lsn applied so far.

Spark-first expression: ``applyInPandasWithState`` over groupBy(url) —
Arrow-batched per-key state (no per-row Python), the canonical custom
stateful-operator pattern.  State size is O(distinct urls), partitioned
across executors by the groupBy hash; a processing-time timeout could bound
retention for keys gone cold (not enabled by default: a dropped state entry
only re-admits a stale event, which the idempotent sink absorbs).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stale_event_guard(
    changes: DataFrame,
    key_col: str = "url",
    lsn_col: str = "lsn",
) -> DataFrame:
    """Streaming frame -> same schema, rows with lsn <= applied hwm dropped.

    Emits, per key and micro-batch, only events strictly above the key's
    lsn high-watermark from every earlier batch, then advances the
    watermark to the batch max.  In-batch ordering is preserved (the
    downstream LWW window still decides the in-batch winner).
    """
    out_schema = changes.schema
    state_schema = T.StructType([T.StructField("hwm", T.LongType())])

    def guard(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hwm = state.get[0] if state.exists else -1
        mx = hwm
        for pdf in pdfs:
            fresh = pdf[pdf[lsn_col] > hwm]
            if len(fresh):
                m = int(fresh[lsn_col].max())
                if m > mx:
                    mx = m
                yield fresh
        if mx > hwm:
            state.update((mx,))

    return changes.groupBy(key_col).applyInPandasWithState(
        guard,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
