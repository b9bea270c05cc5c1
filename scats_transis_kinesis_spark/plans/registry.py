"""The query registry — the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 (and every extension
operator) registers here as a named query: a ``(spark, sf_dir) ->
DataFrame`` callable plus, where SQL-expressible, the equivalent DuckDB
oracle SQL.  ``__spark_entry__.py`` re-exports this registry.

Conventions that keep the oracle compare exact:

- Column names are aliased identically in the Spark plan and the SQL.
- Floating aggregates are ``round``-ed (the data carries 2-decimal
  values; rounding to 4 removes partial-aggregation FP noise without
  touching real information).
- Ordered/top-k queries always carry a deterministic key tiebreaker.
- Session timezone is UTC, matching DuckDB's UTC-naive timestamps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's correctness sample covers the FIRST 50 registry entries,
# so the surface order is curated and ROTATES per round: rounds 1-3
# drove 137 distinct queries green (zero reds anywhere in r1∪r2∪r3).
# Round 4 leads with the LAST 13 queries that have never appeared in
# any driver artifact (the BACKLOG rotation list: the pipeline_queries4
# batch added during round 3, dedup_clusters_minhash, plus the two
# round-3 holdouts dedup_embedding_cosine / dataset_split_train_test) —
# all pass the local gate, so this closes the driver-green union at
# 150/150.  The remaining 37 slots are a RE-verification pass: first
# the queries whose implementation CHANGED this round
# (pack_context_windows row-group-stats fold; the connected-components
# family after the alternating-star upgrade; mixture_materialize's
# overflow-safe draw is in the lead 13 already), then the most
# FP/canon-fragile prior greens (float aggregates, iterative ML,
# similarity scores) so rotation doesn't become fire-and-forget.
# Names listed here appear first (in this order); everything else
# follows in registration order.  Unknown names are ignored so the
# list can name queries added later in a round.
_PRIORITY: tuple[str, ...] = (
    # --- 13 never-driver-sampled (BACKLOG round-4 rotation list) ---
    "asof_click_next_purchase",
    "bm25_topk",
    "ngram_novelty_decay",
    "vocab_oov_rate",
    "emb_hard_negatives",
    "embedding_label_margin",
    "length_bucketed_batches",
    "mixture_epoch_plan",
    "mixture_materialize",
    "quality_calibrate_by_source",
    "dedup_clusters_minhash",
    "dedup_embedding_cosine",
    "dataset_split_train_test",
    # --- changed this round: must re-enter the window ---
    "pack_context_windows",
    "dedup_cluster_canonical",
    "dedup_clusters_embedding",
    # --- FP/canon-fragile re-verification fill ---
    "unigram_perplexity_score",
    "grouped_percentiles_approx",
    "grouped_percentiles",
    "quantiles_exact",
    "stats_correlation",
    "kmeans_embedding_clusters",
    "domain_shift_kl",
    "timeseries_similarity_topk",
    "text_tfidf_top_terms",
    "quality_logreg_score",
    "collocation_pmi",
    "bpe_merge_induction",
    "sim_topk_ivf",
    "sim_topk_vectorized",
    "dedup_embedding_lsh",
    "pagerank_nation_trade",
    "anomaly_zscore_hours",
    "embedding_int8_quantization",
    "q8_market_share",
    "q14_promo_revenue_ratio",
    "q6_forecast_revenue",
    "heavy_hitters_twopass",
    "weighted_sample_ares",
    "time_decay_user_scores",
    "rfm_customer_segments",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "fuzzy_match_blocked",
    "dedup_containment",
    "repeated_span_coverage",
    "boilerplate_shingle_prune",
    "phrase_search_positional",
    "table_profile",
    # --- positions 51+: round-4 additions, never driver-sampled — the
    # ROUND-5 rotation list (BACKLOG.md).  Round 5 moves these to the
    # front of the window; listing them here already pins the intended
    # order and keeps them adjacent in the registry surface.
    "decayed_hourly_traffic",
    "triangle_count_copurchase",
    "token_entropy_quality",
    "rrf_fusion_topk",
    "kneser_ney_bigram_lm",
    "event_path_trigrams",
    "lpa_community_labels",
    "skyline_pareto_orders",
    "entity_fuzzy_clusters",
    "association_rules_pairs",
    "winsorize_order_stats",
    "recursive_cte_hierarchy",
    "variant_json_extract",
    "hof_array_surface",
    "sketch_mergeability_audit",
    "theta_overlap_audit",
    "sensor_outage_islands",
    "weekly_growth_rates",
    "key_skew_audit",
    # (bm25_topk's scorer was also refactored this round, and the fixed
    # permutation modulus changed dedup_minhash_lsh /
    # dedup_clusters_minhash / dedup_containment values — all four
    # already sit inside the first-50 window above, so the driver
    # re-checks them this round.)
)


def _ordered() -> dict[str, QuerySpec]:
    head = [n for n in _PRIORITY if n in REGISTRY]
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    return {n: REGISTRY[n] for n in head + tail}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}


# Importing the query modules populates REGISTRY (kept at the bottom so
# the decorators see the helpers above).
from . import core_queries  # noqa: E402,F401
from . import relational_queries  # noqa: E402,F401
from . import relational_queries2  # noqa: E402,F401
from . import tpch_queries  # noqa: E402,F401
from . import parity_queries  # noqa: E402,F401
from . import extension_queries  # noqa: E402,F401
from . import extension_queries2  # noqa: E402,F401
from . import coverage_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import pipeline_queries2  # noqa: E402,F401
from . import pipeline_queries3  # noqa: E402,F401
from . import pipeline_queries4  # noqa: E402,F401
from . import pipeline_queries5  # noqa: E402,F401
