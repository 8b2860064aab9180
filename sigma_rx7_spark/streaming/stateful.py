"""Custom stateful streaming (SURVEY.md §2.9 T6): per-key state via
``applyInPandasWithState``.

The batch form of the reference's overlap rule tracks open medication
intervals per patient (reference README.md:3,9,23); the streaming form
keeps per-key running state. Here: per-user running (count, max value,
latest ts) over the events stream — the state-machine scaffold an
open-interval tracker plugs into.

Scale: state is partitioned by key across executors and checkpointed;
the Pandas UDF sees one key-group per call with Arrow transfer. With a
watermark, state for quiet keys is reclaimed via timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query
from .jobs import read_events_stream, run_to_memory

STATE_SCHEMA = "count LONG, max_value DOUBLE"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("max_value", T.DoubleType()),
])


def _update(key, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    count, max_value = state.get if state.exists else (0, float("-inf"))
    for pdf in pdfs:
        count += len(pdf)
        if len(pdf):
            max_value = max(max_value, float(pdf["value"].max()))
    state.update((count, max_value))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [count],
         "max_value": [max_value]})


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running stats as an arbitrary-stateful operator."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@query(
    "q_stream_stateful",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    tags=("T6", "streaming"),
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming vs batch oracle: the harness events
    table arrives as ONE file ⇒ one availableNow micro-batch ⇒ the final
    per-user state equals the batch aggregate exactly (count and max are
    order-insensitive)."""
    ev = read_events_stream(spark, sf_dir)
    return run_to_memory(
        running_user_stats(ev), "stream_stateful", output_mode="update")
