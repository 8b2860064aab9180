"""Time-series resample / hypertable rollup (SURVEY.md §2.5 W4 family,
extended per the north-star custom-operator mandate).

The reference's "clinical history" queries (reference README.md:3) imply
regular-grid views over irregular event times; the general operator is
*resample with gap fill*: bucket events to a fixed grain, then emit every
grid bucket in each key's active range — including empty ones — so
downstream windows/exports see a dense series.

Spark-first: the dense grid is ``sequence(min_bucket, max_bucket,
interval)`` exploded per key — generated, never materialized as input —
then a left join from grid to the bucketed aggregate. Both shuffles key
on (user, bucket); at 100 TB the grid side is tiny relative to events
(one row per key-bucket, bounded by range/grain, independent of event
volume) and AQE picks the join strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


def resample_gapfill(events: DataFrame, key: str, ts: str, grain: str,
                     aggs: list, fill: dict) -> DataFrame:
    """Dense per-key time grid at ``grain`` with gap-filled aggregates.

    aggs: list of aggregate Columns over the bucketed events; fill: map
    of output column -> fill value for empty buckets.
    """
    bucketed = events.select(
        F.col(key), F.date_trunc(grain, F.col(ts)).alias("_bucket"),
        *[c for c in events.columns if c not in (key, ts)],
    )
    per_bucket = bucketed.groupBy(key, "_bucket").agg(*aggs)
    grid = (
        bucketed.groupBy(key)
        .agg(F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi"))
        .select(
            F.col(key),
            F.explode(F.sequence(
                "_lo", "_hi", F.expr(f"interval 1 {grain}")
            )).alias("_bucket"),
        )
    )
    out = grid.join(per_bucket, [key, "_bucket"], "left")
    for col, val in fill.items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(val)))
    return out


@query(
    "q_resample_gapfill",
    oracle="""
    WITH b AS (
      SELECT user_id,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
      FROM events
      GROUP BY 1, 2
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS bucket
      FROM (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
            FROM b GROUP BY user_id)
    )
    SELECT g.user_id,
           g.bucket AS hour_start,
           COALESCE(b.n, 0) AS n_events,
           COALESCE(b.sv, 0.0) AS sum_value
    FROM grid g
    LEFT JOIN b ON g.user_id = b.user_id AND g.bucket = b.bucket
    """,
    tags=("W4", "timeseries", "gapfill"),
)
def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with gap fill per user: every hour in each user's
    active range appears, empty hours as (0, 0.0) — the hypertable-
    rollup/dense-series operator. The grid is generated per key with
    ``sequence``, never read as input."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = resample_gapfill(
        ev, key="user_id", ts="ts", grain="hour",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("sum_value"),
        ],
        fill={"n_events": 0, "sum_value": 0.0},
    )
    return out.select(
        "user_id", F.col("_bucket").alias("hour_start"),
        "n_events", "sum_value",
    )


@query(
    "q_fill_forward",
    oracle="""
    SELECT
      user_id,
      event_id,
      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      LAST_VALUE(CASE WHEN event_type = 'view' THEN NULL ELSE value END
                 IGNORE NULLS)
        OVER (PARTITION BY user_id
              ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
              ROWS UNBOUNDED PRECEDING) AS value_filled
    FROM events
    """,
    tags=("W5", "timeseries", "locf"),
)
def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill / LOCF: carry the last observed value over gaps per
    key (here 'view' events are treated as missing observations) — the
    standard way a sparse clinical measurement becomes a dense covariate
    series (reference README.md:3 "clinical history"). One window, one
    shuffle; the (ts, event_id) tiebreak makes the fill total-ordered and
    therefore partition-count-independent."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    observed = F.when(F.col("event_type") != "view", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("user_id", "event_id",
                  F.unix_micros("ts").alias("ts_us"),
                  observed.alias("_obs"))
        .select("user_id", "event_id", "ts_us",
                F.last("_obs", ignorenulls=True).over(w)
                .alias("value_filled"))
    )


SESSION_GAP_MIN = 30  # inactivity gap that closes a session


@query(
    "q_sessionize_batch",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_us
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN prev_us IS NULL
                    OR ts_us - prev_us > {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM t
    ), numbered AS (
      SELECT user_id, event_id, ts_us,
             -- DuckDB windowed SUM(int) yields HUGEINT, which the harness
             -- canonicalizes as float64; cast to match Spark's bigint.
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id
               ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_idx
    """,
    tags=("W5", "timeseries", "sessionize"),
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): per-user sessions split at
    >30 min of inactivity — the encounter-grouping view of a visit/event
    history (reference README.md:3), and the batch mirror of the streaming
    ``session_window`` query (q_stream_sessions).

    One window pass (lag + running sum share the same (user, ts, id)
    ordering, so Catalyst plans ONE sort/shuffle) feeding one hash
    aggregate — no self-join, no driver logic. The (ts_us, event_id)
    tiebreak gives a total order, so session boundaries are identical at
    any partition count and in both engines."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    order_w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = F.lit(SESSION_GAP_MIN * 60 * 1_000_000)
    prev = F.lag("ts_us").over(order_w)
    new_session = F.when(
        prev.isNull() | (F.col("ts_us") - prev > gap_us), 1
    ).otherwise(0)
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.select(
        "user_id", "event_id", "ts_us", new_session.alias("new_session"))
    numbered = flagged.select(
        "user_id", "event_id", "ts_us",
        F.sum("new_session").over(run_w).alias("session_idx"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
