"""SparkSession factory.

The reference app holds one long-lived embedded DuckDB connection
(reference README.md:7,20); the Spark-native equivalent is one long-lived
SparkSession with AQE enabled so Catalyst can re-plan joins/shuffles at
runtime — this is what makes the same code valid on local[32] and on a
1000-executor cluster.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

# Settings that must hold for correctness (cross-engine determinism):
#  - UTC session timezone: parquet timestamps compare identically to the
#    DuckDB oracle regardless of host zone.
#  - nanosAsLong: the harness `events` table stores TIMESTAMP(NANOS) which
#    Spark 4 refuses to read natively; we read the raw int64 and convert
#    (see io.load). Runtime-settable, so we also set it defensively on
#    sessions we did not create (the driver's).
_REQUIRED_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# Settings that matter for performance at scale but are safe defaults
# everywhere. AQE handles post-shuffle coalescing and skew-join splitting;
# the shuffle-partition count is a starting point AQE tunes down from.
_PERF_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
}


def get_spark(app_name: str = "sigma-rx7-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine session.

    Local test/bench runs size parallelism from ``SPARK_GRAFT_CPUS``
    (default: all cores); on a real cluster ``master`` comes from the
    environment and shuffle partitions should track cluster cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    n_shuffle = shuffle_partitions or int(os.environ.get(
        "SIGMA_SHUFFLE_PARTITIONS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    builder = builder.config("spark.ui.enabled", "false")
    # Keep stdout/stderr parseable for harnesses that tail-capture output
    # (the bench driver reads the last ~2000 bytes): no [Stage N:>] bars.
    builder = builder.config("spark.ui.showConsoleProgress", "false")
    builder = builder.config("spark.driver.memory",
                             os.environ.get("SIGMA_DRIVER_MEM", "8g"))
    for k, v in {**_REQUIRED_CONF, **_PERF_CONF}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_session_conf(spark)
    return spark


# Sessions already carrying _REQUIRED_CONF. Weak references: a stopped
# session is collectable, and a NEW session object (even at a reused
# address) is a distinct referent, so the guard can never mistake one
# session for another. Nothing in the repo mutates these two keys after
# setup (they are correctness pins, not tunables), so set-once is
# equivalent to set-per-call minus the per-load py4j round trips.
_CONFED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable required conf to ANY session (once).

    The driver harness constructs its own SparkSession; every query entry
    point calls this so correctness does not depend on who built the
    session. All keys here are SQL confs (safe to set post-startup).
    """
    if spark in _CONFED:
        return spark
    for k, v in _REQUIRED_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - immutable conf on odd builds
            pass
    _CONFED.add(spark)
    return spark
