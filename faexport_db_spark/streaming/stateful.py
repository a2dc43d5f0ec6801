"""Custom stateful streaming operator: cross-batch first-seen filter.

The reference tracks ``seen_usernames`` in an in-process Python set so
each user is emitted once per ingest run (fa_indexer/main.py:85-93) —
unbounded driver memory, lost on restart. The streaming restatement is
``applyInPandasWithState``: per-key GroupState persisted in the state
store (checkpointed, partitioned by key, survives restarts), with a
processing-time timeout to bound state for keys never seen again.

Shape: input stream of (key, payload) → output only the FIRST row per
key ever observed across all micro-batches. This is the engine's
template for custom stateful ops the built-ins can't express
(dropDuplicates has no "emit the winning row with its payload +
timeout eviction" form).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, first_value string, batch_rows bigint"
STATE_SCHEMA = "seen boolean"
_IDLE_TIMEOUT_MS = 24 * 3600 * 1000


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = 0
    first: Any = None
    for pdf in pdfs:
        if len(pdf) and first is None:
            first = pdf["value"].iloc[0]
        rows += len(pdf)
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        # Key already emitted in an earlier batch. Re-arm the idle
        # timeout (it is absolute, not sliding, unless reset here) so a
        # key that stays active is never evicted and re-emitted — the
        # suppression is exactly-once for as long as the key keeps
        # appearing within the idle window.
        state.setTimeoutDuration(_IDLE_TIMEOUT_MS)
        return
    state.update((True,))
    state.setTimeoutDuration(_IDLE_TIMEOUT_MS)  # evict idle keys after a day
    yield pd.DataFrame(
        {"key": [key[0]], "first_value": [first], "batch_rows": [rows]}
    )


def first_seen(stream: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """Emit each key's first-observed row exactly once across batches.

    ``stream`` must be a streaming DataFrame with ``key``/``value``
    string columns (rename upstream). Use with ``outputMode("update")``.
    """
    from pyspark.sql import functions as F

    keyed = stream.select(
        F.col(key_col).alias("key"), F.col(value_col).alias("value")
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
