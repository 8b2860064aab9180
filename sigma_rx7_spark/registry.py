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
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)

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
    # Round 4: everything in the round-3 list got its green row
    # (CORRECTNESS_r03.json: 50/50 — every oracle-gated query in the
    # repo now has a green driver row across r1-r3), so the r3 names
    # rotate out; new round-4 queries prove on first exposure, and the
    # remaining window slots backfill automatically with
    # registration-order oracle-gated queries.
    "q_domain_hl7_roundtrip",
    "q_domain_hl7_udtf",
    "q_dedup_cosine_lsh",
    "q_pipeline_canonical",
    "q_pipeline_pack",
    "q_sim_recall_ivf",
    "q_multimodal_fingerprint",
    "q_domain_allergy_alerts",
    "q_text_unigram_logprob",
    # Round-4 additions (no driver row yet) — prove on first exposure.
    "q_agg_corr",
    "q_agg_mode",
    "q_pipeline_chunk",
    "q_interp_linear",
    "q_domain_polypharmacy",
    "q_domain_adherence",
    "q_join_bucketed",
    "q_join_dpp",
    "q_embed_cov",
    "q_source_binaryfile",
    "q_window_ema",
    "q_domain_treatment_gap",
    "q_dedup_containment",
    "q_merge_agg_incremental",
    "q_agg_keyskew",
    "q_source_schema_merge",
    "q_agg_cube",
    "q_text_langid_trigram",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_sample_weighted",
    "q_agg_mad",
    "q_merge_snapshot_diff",
    "q_merge_scd2",
    "q_merge_cdc_apply",
    "q_quality_audit",
    "q_text_vocab",
    "q_agg_cooccurrence",
    "q_agg_histogram_eqdepth",
    "q_window_rolling_median",
    "q_dedup_semantic",
    "q_graph_reachability",
    "q_stream_sliding_counts",
    "q_source_pydatasource",
    "q_agg_kmv_distinct",
    "q_window_rolling_dau",
    "q_text_bigram_logprob",
    "q_stream_cdc_apply",
    "q_join_scd2_asof",
    "q_window_twap",
    # 50th slot: this session's capstone — IVF-PQ ANN with exact refine
    # (the remaining session additions queue for the round-5 rotation).
    "q_sim_topk_ivfpq",
    # Window full at 50. Implemented AFTER the cap and
    # awaiting round-5 rotation (locally mirror-proven at sf0.001 AND
    # sf0.01): q_agg_ols, q_agg_winsorized, q_agg_chisq, q_window_streak, q_text_keywords, q_text_pmi, q_sample_negatives, q_dedup_recall_lsh, q_ml_logreg_train, q_quality_freshness, q_agg_gini, q_agg_transpose, q_udf_sql, q_sink_compaction, q_join_lateral_topk, q_embed_pca_power, q_embed_pq, q_sample_budget, q_pipeline_quality_model, q_graph_sssp, q_text_source_overlap, q_text_perplexity_filter, q_text_zipf, q_pipeline_incremental_dedup, q_agg_kmv_setops, q_stream_ingest_dedup, q_source_json_dlq, q_quality_psi,
    # and from the round-4 continuation session:
    # q_domain_drug_eras, q_scan_zorder, q_scan_zorder_incremental,
    # q_link_entities, q_link_survivorship, q_text_bpe_merges,
    # q_text_heavyhitters, q_agg_exact_median, q_agg_exact_quantiles,
    # q_agg_state_merge, q_attribution_multitouch,
    # q_stream_attribution, q_pattern_sessions, q_sample_estimate,
    # q_anomaly_seasonal.
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
