"""Spark 4 Python DataSource API (SURVEY.md §2.1, S15).

The reference ingests via Python loader scripts feeding DuckDB
(reference README.md:76 ``etl/loaders.py``); Spark 4's Python DataSource
API is the Spark-native form of "custom loader": a pure-Python source
that plugs into ``spark.read.format(...)`` with schema, partition
planning, and Arrow-batched row production — so bespoke feeds (vendor
APIs, proprietary dumps, object-store listings) join the engine as
first-class scans instead of driver-side collect-and-parallelize glue.

The demo source reads a parquet file through pyarrow — deliberately a
format Spark already has, so the DuckDB oracle can state the expected
result exactly and the correctness gate covers the full plumbing
(register → schema → partitions → per-partition Arrow batches →
DataFrame).

Scale posture:
- ``partitions()`` returns one InputPartition per parquet ROW GROUP —
  the same split granularity Spark's native reader uses, so a 100 TB
  directory fans out to thousands of independent tasks; each task reads
  only its row group (pyarrow ``read_row_group``), never the file.
- ``read()`` yields pyarrow RecordBatches: Arrow is the wire format
  between the Python worker and the JVM, so rows never serialize
  one-at-a-time (the same reason Pandas UDFs beat row UDFs ~10-100×).
- Column pruning is honored manually (``columns=`` on the row-group
  read) — the Python API has no Catalyst pushdown contract yet, so the
  source itself restricts IO; the docstring-visible lesson is that a
  Python source must do its own pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query

_DS_NAME = "arrowpq"
_DS_COLUMNS = ["doc_id", "lang", "source", "n_chars"]


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class _ArrowParquetReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def _files(self) -> list:
        """The physical parquet files behind ``path``: the path itself
        when it is a single file (the harness tables), or the part files
        inside when it is a Spark-written directory (any staged table —
        at warehouse scale a 'table path' is always a directory). The
        glob is RECURSIVE so a partitionBy-written layout (key=value/
        subdirectories) is served too; a directory that has entries but
        no readable parquet anywhere under it is an error, not an empty
        relation — the empty-file sentinel is reserved for genuinely
        empty stagings (only _SUCCESS/marker files)."""
        import glob
        import os

        if os.path.isdir(self.path):
            files = sorted(glob.glob(
                os.path.join(self.path, "**", "*.parquet"), recursive=True))
            if not files:
                entries = [e for e in os.listdir(self.path)
                           if not e.startswith((".", "_"))]
                if entries:
                    raise FileNotFoundError(
                        f"{self.path!r} contains {len(entries)} non-marker "
                        "entries but no *.parquet files anywhere under it — "
                        "refusing to serve it as an empty relation")
            return files
        return [self.path]

    def partitions(self):
        import pyarrow.parquet as pq

        parts = [
            _RowGroupPartition(f, g)
            for f in self._files()
            for g in range(pq.ParquetFile(f).num_row_groups)
        ]
        if not parts:
            # No files / zero row groups (an empty staging): Spark
            # rejects an empty partition list, so emit one sentinel
            # partition that reads nothing — the source returns a typed
            # empty relation.
            return [_RowGroupPartition(self.path, -1)]
        return parts

    def read(self, partition):
        import pyarrow.parquet as pq

        if partition.row_group < 0:  # empty-file sentinel
            return
        f = pq.ParquetFile(partition.path)
        table = f.read_row_group(partition.row_group, columns=_DS_COLUMNS)
        yield from table.to_batches()


class ArrowParquetDataSource(DataSource):
    """``format("arrowpq")``: parquet via pyarrow in Python workers,
    row-group-partitioned, Arrow-batched."""

    @classmethod
    def name(cls) -> str:
        return _DS_NAME

    def schema(self) -> str:
        return "doc_id bigint, lang string, source string, n_chars bigint"

    def reader(self, schema) -> DataSourceReader:
        return _ArrowParquetReader(self.options)


def register_arrowpq(spark: SparkSession) -> None:
    """Idempotent per-session registration (re-registering the same
    name is an error in some 4.x builds)."""
    if not getattr(spark, "_arrowpq_registered", False):
        spark.dataSource.register(ArrowParquetDataSource)
        spark._arrowpq_registered = True


@query(
    "q_source_pydatasource",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    GROUP BY lang, source
    """,
    tags=("S15", "source", "python-datasource"),
)
def q_source_pydatasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PYTHON DATASOURCE ROUND-TRIP (Spark 4 API, S15): read the
    documents table through the custom ``arrowpq`` source — Python
    worker + pyarrow row-group partitions + Arrow batch hand-off — and
    aggregate per (lang, source); the oracle states the same aggregate
    over the native table, so a green row proves the custom source
    delivered every row and column bit-identically through the Python
    boundary. Counts/sums are integer-exact; no quantization needed."""
    register_arrowpq(spark)
    docs = (
        spark.read.format(_DS_NAME)
        .option("path", f"{sf_dir.rstrip('/')}/documents.parquet")
        .load()
    )
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )
