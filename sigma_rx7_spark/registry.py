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
    # Round 9 window. The r8 window banked green for every name in it
    # (CORRECTNESS_r08 50/50), closing the cumulative ledger at 284/284
    # oracle-gated queries driver-proven — so this window's job is
    # FRESHNESS (r8 verdict item 1): new operators enter on first
    # exposure (the r5 practice), then every remaining slot re-banks
    # the stalest greens in `rotation_candidates.py --age` order.
    #
    # 25 slots: the round-9 additions (sequential/SRM/MDE/delta A/B
    # family, drawdown, rolling corr, Wasserstein drift, Gopher gate,
    # systematic sampler, target encoding, Bloom audit, forecast
    # backtest, WoW growth, profile drift, streaming SRM, media
    # payload dedup, calibration, paired t, ANOVA, streaming PSI,
    # moments, k-core, exact AUC, blocking audit, BH-FDR report).
    # 25 slots: the r2 cohort in age order (includes most of the 19
    # re-banks the r8 window displaced); the displaced r2 tail
    # (q_stream_hourly_counts, q_stream_dedup, q_stream_sessions, q_stream_static_join,
    # q_stream_stream_join, q_stream_merge,
    # q_stream_stateful, q_udf_score, q_udaf_weighted,
    # q_domain_recommendations) and the 4 oldest r3 greens return next
    # round.
    #
    # Pre-freeze discipline (documented r4→r5): before committing this
    # list, run the driver-scale mirror over it —
    #   scripts/prefreeze_mirror.sh  (sf0.01 oracle mirror, this list)
    # added in round 9 — first-exposure proof
    "q_ab_sequential",
    "q_ab_srm",
    "q_ab_power",
    "q_ab_delta",
    "q_window_drawdown",
    "q_window_rolling_corr",
    "q_drift_wasserstein",
    "q_text_gopher_rules",
    "q_sample_systematic",
    "q_feature_target_encode",
    "q_agg_bloom",
    "q_ts_forecast_backtest",
    "q_window_growth",
    "q_quality_profile_drift",
    "q_stream_srm",
    "q_multimodal_dedup",
    "q_ml_calibration",
    "q_ab_paired",
    "q_ab_anova",
    "q_stream_psi",
    "q_agg_moments",
    "q_graph_kcore",
    "q_ml_auc",
    "q_link_blocking_audit",
    "q_ab_fdr",
    # stalest driver-greens, oldest first (the full r2 cohort)
    "q_text_langid",
    "q_text_fingerprint",
    "q_text_tokens",
    "q_text_repetition",
    "q_text_ngrams",
    "q_text_tfidf",
    "q_text_entropy",
    "q_split_train_test",
    "q_sample_stratified",
    "q_sample_mixture",
    "q_sample_reservoir",
    "q_cluster_centroids",
    "q_cluster_assign",
    "q_cluster_kmeans_step",
    "q_sim_topk",
    "q_embed_quantize",
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_dedup_lsh_verified",
    "q_dedup_substring",
    "q_text_contamination",
    "q_dedup_cosine",
    "q_dedup_clusters",
    "q_pipeline_corpus_curation",
    "q_pipeline_near_dedup",
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
