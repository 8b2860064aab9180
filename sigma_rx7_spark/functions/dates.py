"""Date/time functions (SURVEY.md §2.8 F3).

Reference capability: ages from birth dates, interval-overlap arithmetic,
"as of" date cuts (reference README.md:3,9). All built-in temporal
expressions; results are cast to engine-neutral types (DATE / BIGINT) per
the compat conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "q_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS INTEGER) AS order_year,
      CAST(month(o_orderdate) AS INTEGER) AS order_month,
      CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           AS BIGINT) AS days_since_epoch_start,
      CAST(o_orderdate AS DATE) + 30 AS due_date
    FROM orders
    """,
    tags=("F3",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal primitive family: year/month/quarter extraction, month
    truncation, day differences, date offsets (the age / as-of / interval
    arithmetic of README.md:3,9)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date")
        .alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint").alias("days_since_epoch_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


# ---- Timezone-aware reporting (local business dates) ---------------------

REPORT_ZONES = ("America/New_York", "Europe/Berlin", "Asia/Tokyo")


_TZ_UNION = " UNION ALL ".join(
    f"""SELECT '{z}' AS zone,
           CAST(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'
                AT TIME ZONE '{z}' AS DATE) AS local_date
        FROM events""" for z in REPORT_ZONES)


@query(
    "q_date_timezones",
    oracle=f"""
    SELECT zone,
           CAST(local_date AS DATE) AS local_date,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ({_TZ_UNION})
    GROUP BY zone, local_date
    """,
    tags=("F3", "timezone"),
)
def q_date_timezones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMEZONE-AWARE business dates: event counts per LOCAL calendar
    day in three reporting zones — the global-dashboard requirement
    where "daily" means the viewer's midnight, not UTC's, and where
    DST transitions shift the boundary twice a year (both engines
    resolve the same IANA zone rules, which is what the gate checks).
    Spark: ``from_utc_timestamp`` + date_trunc per zone over one scan
    (the explode of zones is a 3-row multiplier, not a re-read);
    storage stays UTC — the only sane contract at 100 TB, with zone
    conversion a presentation-layer projection."""
    ev = load(spark, sf_dir, "events").select("ts")
    zones = F.array(*[F.lit(z) for z in REPORT_ZONES])
    return (
        ev.select(F.explode(zones).alias("zone"), "ts")
        .select("zone",
                F.to_date(F.from_utc_timestamp("ts", F.col("zone")))
                .alias("local_date"))
        .groupBy("zone", "local_date")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
