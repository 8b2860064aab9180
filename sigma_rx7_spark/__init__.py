"""sigma_rx7_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference project ``pchj/sigma-rx7`` (see ``/root/reference/README.md``):
an ETL/ELT + rules pipeline over relational health-care-shaped data
(reference README.md:3,7-11), rebuilt on the Spark DataFrame/SQL stack so
Catalyst + Tungsten provide the optimization and execution that the
reference delegated to embedded DuckDB (README.md:7).

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, sane local defaults)
- ``io``         : schema registry + loaders for the harness tables
- ``compat``     : cross-engine (Spark vs DuckDB oracle) determinism helpers
- ``registry``   : query registry powering ``__spark_entry__.queries()``
- ``operators/`` : relational operator library (scans, joins, aggs, windows…)
- ``functions/`` : scalar-function families (string, date, score, json, text)
- ``llm/``       : LLM-data-pipeline operators (dedup, similarity, multimodal)
- ``domain/``    : the reference's clinical domain rules re-expressed on Spark
- ``streaming/`` : Structured Streaming surface (windows, watermark, state)
"""

__version__ = "0.1.0"
