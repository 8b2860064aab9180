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
    # Round 11 window, recomposed after the session-2 additions. The
    # r10 window banked green for every name in it (CORRECTNESS_r10
    # 50/50). Composition: (a) the 18 round-11 batch-1 additions and
    # (b) the 27 session-2 additions, all on first exposure; (c) the
    # five queries whose implementation changed this round (spearman,
    # link-pred, RFM, pagerank, the IVF staging stamp). First exposure
    # outranks re-banking: a never-checked oracle-gated query is a hole
    # in the correctness ledger, a stale green is not — ALL 31 displaced
    # r3-cohort names (q_agg_argmax .. q_domain_fhir_export, listed by
    # rotation_candidates.py --age) were instead re-proven by the
    # in-repo sf0.01 mirror this session (SCALE.md round-11 notes) and
    # head the r12 re-bank queue.
    #
    # Pre-freeze discipline: before committing this list, run
    #   scripts/prefreeze_mirror.sh  (sf0.01 oracle mirror, this list)
    # round-11 batch-1 additions — first-exposure proof
    "q_sim_knn_classify",
    "q_ml_score_drift",
    "q_ts_seasonal_strength",
    "q_ab_wilson",
    "q_text_langid_audit",
    "q_dedup_lsh_plan",
    "q_agg_kendall_tau",
    "q_agg_benford",
    "q_ab_trend",
    "q_agg_trimmed_mean",
    "q_graph_clustering",
    "q_graph_assortativity",
    "q_ts_acf",
    "q_ts_seasonality",
    "q_join_bloom_filtered",
    "q_drift_cvm",
    "q_ml_ks",
    "q_mv_join_maintenance",
    # round-11 session-2 additions — first-exposure proof
    "q_ab_cmh",
    "q_ab_kruskal",
    "q_drift_ad",
    "q_quality_fd",
    "q_quality_patterns",
    "q_ts_ljung_box",
    "q_ts_theil_sen",
    "q_ml_mcc",
    "q_ml_logloss",
    "q_text_ndcg",
    "q_graph_modularity",
    "q_feature_hashing",
    "q_join_band",
    "q_stream_funnel",
    "q_cluster_silhouette",
    "q_agg_hhi",
    "q_ts_hurst",
    "q_quality_checksum",
    "q_ab_fisher",
    "q_stream_ohlc",
    "q_sim_mips",
    "q_quality_dup_txn",
    "q_mv_distinct_maintenance",
    "q_ts_ewma_chart",
    "q_ab_jarque_bera",
    "q_quality_sentinels",
    "q_stream_hourly_distinct",
    # changed this round — re-proof
    "q_agg_spearman",
    "q_graph_link_prediction",
    "q_window_rfm",
    "q_graph_pagerank",
    "q_sim_index_incremental",
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
