"""Structured Streaming jobs (SURVEY.md §2.9 T1-T7).

The reference's "real-time" is request/response recomputation (reference
README.md:11,69-71); the Spark-native design expresses the same rule
queries incrementally over an event stream. Each job here reads the
harness ``events`` table *as a stream* (file source + availableNow
trigger), so the driver's batch harness can still verify it: availableNow
processes the full input and terminates, and the result must equal the
batch equivalent — which is exactly the oracle SQL attached to each query
(the batch-equivalence test of SURVEY.md §5.5, enforced by the driver's
own DuckDB comparison).

At scale the same code points at a Kafka/file-drop source with a real
watermark bounding state; nothing else changes — that is the point of the
Structured Streaming API.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load
from ..registry import query
from ..session import ensure_session_conf
from ..operators.incremental import MERGE_CUTOFF

# Physical schema of events.parquet (ts is INT64 nanos on disk; streaming
# file sources require an explicit schema).
_EVENTS_PHYSICAL = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 streaming source: the events table as an append stream with the
    same ns→µs timestamp conversion as the batch loader."""
    ensure_session_conf(spark)
    # The file source needs a directory; pathGlobFilter narrows it to the
    # events table inside the shared sf_dir.
    raw = (
        spark.readStream.schema(_EVENTS_PHYSICAL)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
    )


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame with availableNow into a memory sink
    and return the materialized result (T1 sink side, batch-verifiable)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_stream_hourly_counts",
    oracle="""
    SELECT
      date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("T1", "T2", "T3", "streaming"),
)
def q_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming aggregation with a watermark (T2+T3):
    events per (hour, type). availableNow ⇒ result equals the batch
    GROUP BY, which is the oracle."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type", "n_events", "sum_value",
        )
    )
    return run_to_memory(agg, "stream_hourly_counts")


@query(
    "q_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("T5", "streaming"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (T5): first-seen (user, type) pairs survive;
    projecting only the key columns makes the result order-independent
    and equal to batch DISTINCT."""
    ev = read_events_stream(spark, sf_dir)
    dedup = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"])
    return run_to_memory(dedup, "stream_dedup", output_mode="append")


@query(
    "q_stream_sessions",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ), marked AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000
                  OR LAG(ts_us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ), sessions AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """,
    tags=("T4", "streaming"),
)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (T4): 30-minute-gap sessionization per user — the
    encounter-sessionization shape. Oracle = the classic gaps-and-islands
    SQL; session_window.start equals MIN(ts) of the island."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start"))
            .alias("session_start_us"),
            "n_events",
        )
    )
    return run_to_memory(agg, "stream_sessions")


@query(
    "q_stream_static_join",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events
    JOIN customer ON user_id + 1 = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("T7", "streaming"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (T7): the event stream joined to the
    static customer dimension (the KB-table enrichment of README.md:8,
    streamed), then aggregated per segment."""
    ev = read_events_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer")
    joined = ev.join(
        F.broadcast(cust), ev.user_id + 1 == cust.c_custkey
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
        .alias("sum_value"),
    )
    return run_to_memory(agg, "stream_static_join")


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT a.user_id,
           a.event_id AS view_id,
           b.event_id AS purchase_id,
           epoch_us(CAST(b.ts AS TIMESTAMP))
             - epoch_us(CAST(a.ts AS TIMESTAMP)) AS gap_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
     AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP)
                                     + INTERVAL 1 HOUR
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    """,
    tags=("T8", "streaming"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (T8): views joined to same-user
    purchases within the following hour — the attribution/conversion
    shape, and the streaming form of the J3/J8 time-condition joins.

    Both sides carry a 2-hour watermark and the join has an event-time
    range bound, so Spark can expire buffered state: a view older than
    watermark - 1 hour can never match again and is dropped. State is
    therefore bounded by stream rate × 3 hours, independent of total
    history — the property that lets this run forever at 100 TB/day.
    availableNow ⇒ one micro-batch ⇒ equals the batch interval join
    (the DuckDB oracle)."""
    views = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("view_ts"))
        & (F.col("p_ts") <= F.col("view_ts") + F.expr("interval 1 hour")),
    )
    out = joined.select(
        "user_id", "view_id", "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )
    return run_to_memory(out, "stream_stream_join", output_mode="append")


# ---- Streaming incremental MERGE (T1 x M1) -------------------------------

def streaming_merge(base: DataFrame, change_stream: DataFrame,
                    keys: list[str], order_col: str,
                    tiebreak: str) -> DataFrame:
    """Apply a change STREAM onto a base snapshot with MERGE semantics:
    every micro-batch is deduped to latest-per-key and merged into the
    running state via ``operators.incremental.merge_upsert``; ``src``
    records the provenance of each key's CURRENT value ('base' =
    untouched, 'insert'/'update' = written by some batch).

    This is the foreachBatch upsert-sink pattern — what Structured
    Streaming pairs with Delta/Iceberg ``MERGE INTO`` at warehouse
    scale; here the target is an in-session relation,
    ``localCheckpoint``-materialized per batch so state lineage stays
    one-batch deep instead of replaying every batch since stream start
    (same discipline as the connected-components loop). State size is
    one row per live key, independent of stream history length.
    """
    from ..operators.incremental import latest_per_key, merge_upsert

    state = {"df": base.withColumn("src", F.lit("base"))
             .localCheckpoint(eager=True)}

    def apply_batch(bdf: DataFrame, _batch_id: int) -> None:
        if not bdf.head(1):
            return
        changes = latest_per_key(bdf, keys, order_col, tiebreak) \
            .drop(order_col)
        prev = state["df"]
        merged = merge_upsert(prev.drop("src"), changes, keys)
        # merge_upsert tags rows relative to THIS batch; keys it didn't
        # touch come back 'base' — restore their carried provenance.
        prev_src = prev.select(
            *keys, F.col("src").alias("_prev_src")).alias("p")
        m = merged.alias("m")
        cond = [F.col(f"m.{k}").eqNullSafe(F.col(f"p.{k}")) for k in keys]
        value_cols = [c for c in merged.columns if c not in (*keys, "src")]
        state["df"] = (
            m.join(prev_src, cond, "left")
            .select(
                *[F.col(f"m.{k}").alias(k) for k in keys],
                *[F.col(f"m.{v}").alias(v) for v in value_cols],
                F.when(F.col("m.src") == "base",
                       F.coalesce(F.col("p._prev_src"), F.lit("base")))
                .otherwise(F.col("m.src")).alias("src"),
            )
            .localCheckpoint(eager=True)
        )

    ckpt = tempfile.mkdtemp(prefix="merge_ckpt_")
    try:
        q = (
            change_stream.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return state["df"]


@query(
    "q_stream_merge",
    oracle=f"""
    WITH latest AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
      WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{MERGE_CUTOFF}'
    ), base AS (
      SELECT user_id, event_type, event_id, value, TRUE AS b_present
      FROM latest WHERE rn = 1
    ), chg_latest AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{MERGE_CUTOFF}'
    ), changes AS (
      SELECT user_id, event_type, event_id, value, TRUE AS c_present
      FROM chg_latest WHERE rn = 1
    )
    SELECT
      COALESCE(b.user_id, c.user_id) AS user_id,
      COALESCE(b.event_type, c.event_type) AS event_type,
      CASE WHEN c.c_present THEN c.event_id ELSE b.event_id END AS event_id,
      CASE WHEN c.c_present THEN c.value ELSE b.value END AS value,
      CASE WHEN c.c_present IS NULL THEN 'base'
           WHEN b.b_present IS NULL THEN 'insert'
           ELSE 'update' END AS src
    FROM base b
    FULL OUTER JOIN changes c
      ON b.user_id IS NOT DISTINCT FROM c.user_id
     AND b.event_type IS NOT DISTINCT FROM c.event_type
    """,
    tags=("T1", "M1", "streaming", "merge"),
)
def q_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert: the post-cutoff events arrive as a STREAM and
    are merged per micro-batch onto the pre-cutoff base snapshot — the
    incremental-refresh form of q_merge_upsert (same cutoff, same
    semantics, same oracle). availableNow drains the change file in one
    batch, so the driver-verified result equals the one-shot batch
    MERGE; the two-batch case (values converge to latest-per-key
    regardless of batch boundaries) is asserted in
    tests/test_streaming_merge.py."""
    from ..operators.incremental import latest_per_key

    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")
    keys = ["user_id", "event_type"]
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "value", "ts")
    base = latest_per_key(
        ev.where(F.col("ts") < cutoff), keys, "ts", "event_id").drop("ts")
    change_stream = (
        read_events_stream(spark, sf_dir)
        .where(F.col("ts") >= cutoff)
        .select("user_id", "event_type", "event_id", "value", "ts")
    )
    return streaming_merge(base, change_stream, keys, "ts", "event_id")
