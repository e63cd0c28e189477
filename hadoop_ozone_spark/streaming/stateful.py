"""Custom stateful streaming operator: per-key running namespace state
via ``applyInPandasWithState``.

The reference's NSSummaryTask keeps per-directory mutable state
(childDir sets, counters) updated per event batch (NSSummaryTask.java:
82-230). Update-mode SQL aggregations cover the counter cases; the
*set-valued* state (childDir) needs arbitrary state — this is Spark's
``applyInPandasWithState`` (GroupState + Arrow batches), the engine's
escape hatch for custom stateful operators (SURVEY §2.9).

State per key-group: (live, size, last_seqno). Emits one row per group
per batch with the updated state. Timeout: none (namespace state is
permanent); a TTL'd variant would use GroupStateTimeout.ProcessingTimeTimeout.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("live", BooleanType()),
        StructField("data_size", LongType()),
        StructField("last_seqno", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("row_key", StringType()),
        StructField("live", BooleanType()),
        StructField("data_size", LongType()),
        StructField("last_seqno", LongType()),
    ]
)


def _update_key_state(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (row_key,) = key
    if state.exists:
        live, size, last_seqno = state.get
    else:
        live, size, last_seqno = False, 0, -1
    events = pd.concat(list(pdfs), ignore_index=True).sort_values("seqno")
    for _, ev in events.iterrows():
        if ev["seqno"] <= last_seqno:
            continue  # replay / out-of-order duplicate
        last_seqno = int(ev["seqno"])
        if ev["op"] == "DELETE":
            live, size = False, 0
        else:  # PUT / UPDATE
            live, size = True, int(ev["data_size"])
    state.update((live, size, last_seqno))
    yield pd.DataFrame(
        {
            "row_key": [row_key],
            "live": [live],
            "data_size": [size],
            "last_seqno": [last_seqno],
        }
    )


def stateful_latest_state(events: DataFrame) -> DataFrame:
    """Streaming per-key latest-state via arbitrary state — the
    streaming twin of operators/cdc.latest_state (same law, incremental
    execution; tests assert equivalence after replay)."""
    return events.groupBy("row_key").applyInPandasWithState(
        _update_key_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
