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
    # Round 12 window. Composition (VERDICT r11 item 1 — the re-bank
    # round): (a) the 9 round-12 additions on first exposure; (b) the
    # 9 queries whose implementation or oracle changed this round
    # (ADVICE fixes: funnel/attribution/transitions chunk-order
    # concat, hourly-distinct within-watermark dedup, MCC kappa
    # guard, band-join eps-cells, Ljung-Box df gate; the planner-
    # derived SRP geometry + its composed recall audit); (c) ALL 31
    # displaced r3-cohort names (rotation_candidates.py --age) whose
    # newest external rows dated to r3, plus the stalest r4 name
    # (q_agg_corr) in the one spare slot. After this round no
    # registered query's latest external row is older than r4.
    #
    # Pre-freeze discipline: before committing this list, run
    #   scripts/prefreeze_mirror.sh  (sf0.01 oracle mirror, this list)
    # round-12 additions — first-exposure proof
    "q_graph_communities",
    "q_ts_periodogram",
    "q_ts_cross_corr",
    "q_agg_simpson",
    "q_quality_iqr",
    "q_sample_neyman",
    "q_dedup_minhash_error",
    "q_ml_operating_point",
    "q_join_range_bin",
    # changed this round — re-proof
    "q_stream_funnel",
    "q_stream_attribution",
    "q_stream_transitions",
    "q_stream_hourly_distinct",
    "q_ml_mcc",
    "q_join_band",
    "q_ts_ljung_box",
    "q_dedup_cosine_lsh",
    "q_dedup_recall_lsh",
    # r3-cohort re-bank (31 names, displaced by the r11 window)
    "q_agg_argmax",
    "q_agg_pivot",
    "q_agg_unpivot",
    "q_agg_collect",
    "q_agg_histogram",
    "q_agg_anomaly",
    "q_window_rank",
    "q_window_latest",
    "q_window_lag",
    "q_window_frame",
    "q_sort_topk",
    "q_window_distribution",
    "q_window_range_frame",
    "q_resample_gapfill",
    "q_fill_forward",
    "q_sessionize_batch",
    "q_rollup_timegrain",
    "q_cohort_retention",
    "q_funnel_steps",
    "q_merge_upsert",
    "q_set_union",
    "q_set_except",
    "q_set_intersect",
    "q_nested_export",
    "q_sim_topk_ivf",
    "q_sim_topk_ivf_staged",
    "q_dedup_simhash_md5",
    "q_dedup_simhash_pairs",
    "q_dedup_clusters_lsh",
    "q_udtf_sentences",
    "q_domain_fhir_export",
    # stalest r4 name in the spare slot
    "q_agg_corr",
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
