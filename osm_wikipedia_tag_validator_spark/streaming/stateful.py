"""Custom stateful streaming operator via applyInPandasWithState.

The reference's change-tracking semantics (T2: an element's stored
report is invalidated when a newer observation arrives —
`script.py:232-255`) as a continuous operator: per-key state holds the
latest observed snapshot + a change counter; each micro-batch emits a
row only when the key's payload actually changed (dedup-with-memory,
the streaming form of the MERGE loop in plans/incremental.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, ts timestamp, value double, n_changes int, prev_value double"
)
STATE_SCHEMA = "last_value double, n_changes int"


def _track_changes(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_value, n_changes = state.get
    else:
        last_value, n_changes = None, 0
    rows = []
    pdf = pd.concat(list(batches)).sort_values("ts")
    for r in pdf.itertuples(index=False):
        v = float(r.value)
        if last_value is None or v != last_value:
            n_changes += 1
            rows.append((key[0], r.ts, v, n_changes, last_value))
            last_value = v
    state.update((last_value, n_changes))
    if rows:
        yield pd.DataFrame(
            rows, columns=["user_id", "ts", "value", "n_changes", "prev_value"]
        )


def changed_values_stream(events: DataFrame) -> DataFrame:
    """events stream → one output row per ACTUAL value change per user.

    Arrow-batched stateful processing; state is per-key and survives
    across micro-batches (checkpointed by the engine)."""
    from pyspark.sql import functions as F

    typed = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    return typed.groupBy("user_id").applyInPandasWithState(
        _track_changes,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
