"""Streaming incremental MERGE: batch equivalence + batch-boundary
independence.

The foreachBatch upsert must (a) reproduce the one-shot batch MERGE when
the stream drains in a single batch (that equality is also the query's
DuckDB oracle), and (b) converge to the same VALUES regardless of how
the change stream is chopped into micro-batches — the property that
makes a crash/resume or a different trigger cadence harmless at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sigma_rx7_spark.io import load
from sigma_rx7_spark.operators.incremental import (
    MERGE_CUTOFF,
    latest_per_key,
    merge_upsert,
)
from sigma_rx7_spark.registry import load_all

KEYS = ["user_id", "event_type"]


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_stream_merge_equals_batch_merge(spark, sf_dir):
    streamed = load_all()["q_stream_merge"].fn(spark, sf_dir)
    batch = load_all()["q_merge_upsert"].fn(spark, sf_dir)
    cols = ["user_id", "event_type", "event_id", "value", "src"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_two_batch_split_converges_to_latest_per_key(spark, sf_dir):
    # Re-apply the merge loop by hand in two half-open ts windows; the
    # final (key -> value) state must equal latest-per-key over ALL
    # events, independent of the split point.
    ev = load(spark, sf_dir, "events").select(*KEYS, "event_id", "value",
                                              "ts")
    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")
    base = latest_per_key(
        ev.where(F.col("ts") < cutoff), KEYS, "ts", "event_id").drop("ts")
    changes = ev.where(F.col("ts") >= cutoff)
    split = changes.agg(
        F.percentile_approx("ts", 0.5, 10000).alias("m")).first()["m"]

    state = base
    for part in (
        changes.where(F.col("ts") <= F.lit(split)),
        changes.where(F.col("ts") > F.lit(split)),
    ):
        batch = latest_per_key(part, KEYS, "ts", "event_id").drop("ts")
        state = merge_upsert(state, batch, KEYS).drop("src") \
            .localCheckpoint(eager=True)

    oneshot = latest_per_key(ev, KEYS, "ts", "event_id").drop("ts")
    cols = ["user_id", "event_type", "event_id", "value"]
    assert _rows(state, cols) == _rows(oneshot, cols)
