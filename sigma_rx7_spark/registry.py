"""Query registry: the single source of truth behind ``__spark_entry__``.

Each operator family registers named queries with the DataFrame
implementation and (when SQL-expressible) the DuckDB oracle SQL *side by
side*, so the pair can never drift apart. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import.
_QUERY_MODULES = (
    "sigma_rx7_spark.operators.scans",
    "sigma_rx7_spark.operators.joins",
    "sigma_rx7_spark.operators.interval",
    "sigma_rx7_spark.operators.aggregates",
    "sigma_rx7_spark.operators.windows",
    "sigma_rx7_spark.operators.timeseries",
    "sigma_rx7_spark.operators.incremental",
    "sigma_rx7_spark.operators.sets",
    "sigma_rx7_spark.operators.subqueries",
    "sigma_rx7_spark.operators.graph",
    "sigma_rx7_spark.operators.linkage",
    "sigma_rx7_spark.operators.quality",
    "sigma_rx7_spark.operators.tpch",
    "sigma_rx7_spark.sources.formats",
    "sigma_rx7_spark.sources.layout",
    "sigma_rx7_spark.sources.pydatasource",
    "sigma_rx7_spark.functions.strings",
    "sigma_rx7_spark.functions.dates",
    "sigma_rx7_spark.functions.scoring",
    "sigma_rx7_spark.functions.json_ops",
    "sigma_rx7_spark.functions.text",
    "sigma_rx7_spark.llm.bpe",
    "sigma_rx7_spark.llm.dedup",
    "sigma_rx7_spark.llm.similarity",
    "sigma_rx7_spark.llm.sampling",
    "sigma_rx7_spark.llm.pipeline",
    "sigma_rx7_spark.llm.clustering",
    "sigma_rx7_spark.streaming.jobs",
    "sigma_rx7_spark.streaming.stateful",
    "sigma_rx7_spark.llm.multimodal",
    "sigma_rx7_spark.functions.udfs",
    "sigma_rx7_spark.domain.queries",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    # DuckDB-runnable ANSI SQL, a callable (sf_dir) -> SQL for oracles
    # that read sf-keyed staged artifacts, or None => rows-only check.
    oracle: str | Callable[[str], str] | None
    tags: tuple[str, ...] = field(default_factory=tuple)

    def oracle_for(self, sf_dir: str) -> str | None:
        """The oracle SQL specialized to ``sf_dir``. Static oracles
        return as-is; templated oracles substitute sf-keyed staged
        paths at retrieval time, so two sessions mirroring different
        scale factors never share (or clobber) one staged artifact."""
        if callable(self.oracle):
            return self.oracle(sf_dir)
        return self.oracle

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False

# External correctness harnesses check a fixed-size prefix of the registry
# (the driver verifies the first 50 entries of ``load_all()`` order), so
# ordering is part of the verification contract:
#   1. names in _CHECK_PRIORITY, in list order — queries whose oracle or
#      implementation changed recently, or that have never had an external
#      correctness row, rotate to the front so the next run proves them;
#   2. every other oracle-gated query, in registration (module) order;
#   3. rows-only queries (no oracle) last — an external checker can only
#      ever report "no oracle" for them, so they must not occupy checked
#      slots.
_CHECK_PRIORITY: tuple[str, ...] = (
    # Round 16 window (27 changed + 19 r5 cohort completion + 4 r6 =
    # 50). Composition: (a) every query whose execution path changed in
    # the r16 optimization round (results bit-identical by construction
    # and local mirrors, but the driver should re-prove them): the
    # quality-audit fold, the lazy-checkpoint adoptees, the Arrow/
    # fixed-point rewrites (exact cosine, covariance, blocked Jaccard
    # pair stage) and their composers, and the 13 streaming queries
    # whose trailing no-data micro-batch is now skipped; (b) the 19
    # REMAINING names of the r5 freshness cohort (rotation debt paid in
    # full — VERDICT r15 item 8); (c) the 4 oldest r6 names fill the
    # window.
    #
    # Pre-freeze discipline: before committing this list, run
    #   scripts/prefreeze_mirror.sh  (sf0.01 oracle mirror, this list)
    # changed this round — quality-audit fold (one pass per fact table)
    "q_quality_audit",
    # changed this round — lazy-checkpoint adoptees
    "q_agg_trimmed_mean",
    "q_ab_kruskal",
    "q_agg_spearman",
    "q_text_bpe_merges",
    "q_text_bpe_tokenize",
    "q_pipeline_token_budget",
    # changed this round — Arrow/fixed-point exact rewrites + composers
    "q_dedup_cosine",
    "q_dedup_recall_lsh",
    "q_embed_cov",
    "q_embed_pca_power",
    "q_dedup_clusters",
    # changed this round — trailing no-data micro-batch skipped
    "q_stream_hourly_distinct",
    "q_stream_hourly_distinct_approx",
    "q_stream_hourly_counts",
    "q_stream_sliding_counts",
    "q_stream_ohlc",
    "q_stream_topk",
    "q_stream_dedup_watermarked",
    "q_stream_srm",
    "q_stream_psi",
    "q_stream_anomaly",
    "q_stream_sessions",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_stream_funnel",
    "q_stream_attribution",
    # r5-cohort completion: the remaining 19 of the 49-name debt
    "q_cohort_retention_rate",
    "q_daily_autocorr",
    "q_usage_heatmap",
    "q_daily_runs_test",
    "q_session_length_dist",
    "q_mv_rollup_answer",
    "q_join_lateral_topk",
    "q_link_entities",
    "q_link_survivorship",
    "q_quality_freshness",
    "q_quality_psi",
    "q_anomaly_seasonal",
    "q_quality_sequence",
    "q_quality_benford",
    "q_quality_profile",
    "q_quality_temporal",
    "q_quality_reconcile",
    "q_sink_compaction",
    "q_domain_fhir_bundle",
    # r6 re-bank: oldest 4 fill the window
    "q_source_json_dlq",
    "q_sink_backfill",
    "q_audit_file_layout",
    "q_source_textlines",
)

# The external checker verifies exactly the first 50 load_all() entries;
# a 51st priority name would silently fall past the window and never get
# a correctness row. Fail loudly instead.
assert len(_CHECK_PRIORITY) <= 50, (
    f"_CHECK_PRIORITY has {len(_CHECK_PRIORITY)} entries; the driver "
    "window holds 50 — rotate out an already-proven query")


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags))
        return fn
    return deco


def _order_key(item: tuple[int, tuple[str, QuerySpec]]) -> tuple[int, int]:
    reg_pos, (name, spec) = item
    if name in _CHECK_PRIORITY:
        return (0, _CHECK_PRIORITY.index(name))
    return (1, reg_pos) if spec.oracle else (2, reg_pos)


def load_all() -> dict[str, QuerySpec]:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True
    ordered = sorted(enumerate(_REGISTRY.items()), key=_order_key)
    return dict(kv for _, kv in ordered)


def get(name: str) -> QuerySpec:
    return load_all()[name]
