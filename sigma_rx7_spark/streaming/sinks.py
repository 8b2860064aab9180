"""Streaming sinks (SURVEY.md §2.9 T1, sink side).

The memory sink in ``jobs.py`` serves the batch-equivalence harness; the
production-shaped sink is parquet-with-checkpoint: the checkpoint records
which source files/offsets each committed batch consumed, so a restart
resumes exactly where it stopped and re-running a finished stream writes
nothing twice (exactly-once file sink semantics — proven by the restart
test). At 100 TB this is the staging hand-off between the streaming tier
and the batch warehouse: same layout `io.write_table` produces, same
partition columns, readable mid-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_to_parquet(stream_df: DataFrame, path: str, checkpoint: str,
                      partition_by: tuple[str, ...] = ()) -> None:
    """Run an append-mode stream into a partitioned parquet directory
    with availableNow (process everything pending, then stop)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.start().awaitTermination()
