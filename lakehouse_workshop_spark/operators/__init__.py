"""Operator registry.

Each operator module registers named queries ``(spark, sf_dir) -> DataFrame``
and (where SQL-expressible) a DuckDB oracle SQL string under the same name.
``__spark_entry__`` exposes the merged registries to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
TIERS: dict[str, int] = {}

# Explicit driver-pass order for round 13. The driver's correctness pass
# verifies the first 50 registry entries per round, so coverage rotates.
# The ordering rule (enforced by tests/test_registry.py, rebuilt each
# round with tools/make_driver_order.py):
#   1. Positions 1-45: 45 of the 48 r09-latest rows — the cohort hits
#      the P=5 horizon at r14 (P = max(3, ceil(registry/window)+1) = 5
#      at 198 queries). The round started with all 48 + two r10
#      pre-rotations (blocklist_scrub, cms_heavy_hitters); each of the
#      five round-13 registrations displaced one — first the two
#      pre-rotations, then the r09 tail rows text_normalize,
#      train_val_test_split, unigram_lm_score. Those three r09 rows are
#      STALE at r14 and must lead the r14 window.
#   2. Positions 46-50: the five round-13 registrations.
DRIVER_ORDER: list[str] = [
    # -- 1-48: latest row r09, stale at r14 — the whole cohort -----------
    "ann_topk_lsh",
    "basket_part_pairs",
    "big_quantity_orders",
    "bigram_lm_score",
    "bpe_merge_candidates",
    "chunk_dedup",
    "click_attribution",
    "clv_temporal_holdout",
    "cohort_retention",
    "conversion_funnel",
    "corpus_clean",
    "corpus_quality_funnel",
    "cross_source_dup_matrix",
    "customer_ltv_deciles",
    "customer_order_distribution",
    "customer_order_gaps",
    "customer_spend_quartiles",
    "decontaminate",
    "dedup_incremental",
    "disjunctive_part_revenue",
    "doc_chunks",
    "docs_length_outliers",
    "embedding_label_centroids",
    "embedding_normalized",
    "hot_keys_events",
    "integrity_orphans",
    "local_supplier_volume",
    "merge_upsert_orders",
    "near_dup_clusters",
    "order_percentiles",
    "order_price_histogram",
    "pseudonymize_users",
    "repetition_ratio",
    "rolling_revenue_7d",
    "sales_cube",
    "session_window_batch",
    "shard_assignments",
    "shipping_priority",
    "stratified_sample",
    "streaming_click_to_purchase",
    "streaming_dedup",
    "streaming_enriched_counts",
    "streaming_sessionize_flushed",
    "streaming_windowed_counts",
    "streaming_windowed_counts_watermarked",
    # (text_normalize, train_val_test_split, unigram_lm_score: the three
    # r09 rows deferred to r14 — displaced by round-13 registrations;
    # NOT yet stale at r13)
    # -- 46-50: round-13 registrations (incremental + streaming semantic
    # dedup; the IVF split-decision layer and its executor; the
    # embedding-space drift monitor). They displaced the two r10
    # pre-rotations (blocklist_scrub, cms_heavy_hitters) and three r09
    # tail rows. ----------------------------------------------------------
    "semantic_dedup_incremental",
    "streaming_semantic_dedup",
    "ivf_split_plan",
    "ivf_rebalance",
    "embedding_cluster_drift",
]
# Baseline → production twin. Entries here are *labeled baselines*: exact
# but super-linear (quadratic self-joins, brute-force scans) — correct as
# ground truth, wrong as the operator a 100 TB pipeline schedules. The
# value names the registered sub-quadratic twin production should use.
SCALE_PATHS: dict[str, str] = {}


def query(
    name: str,
    oracle: str | None = None,
    scale_path: str | None = None,
    tier: int = 1,
) -> Callable[[QueryFn], QueryFn]:
    """Register a named operator query and optionally its DuckDB oracle SQL.

    ``scale_path`` marks this query as an exact-but-super-linear baseline
    and names the registered twin that holds its cost sub-quadratic at
    scale (exposed via :func:`all_scale_paths`).

    ``tier`` orders the registry the driver iterates: tier 1 is the
    reference-derived + first-wave surface, tier 2 the later extensions.
    The round-1 driver correctness pass stopped partway through the
    registry (50 of 57 rows), so whatever its budget is, the queries it
    must verify have to come first — within a tier, registration order is
    preserved.
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        TIERS[name] = tier
        if oracle is not None:
            ORACLES[name] = oracle
        if scale_path is not None:
            SCALE_PATHS[name] = scale_path
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    # Import for side effect of registration. Iteration order =
    # DRIVER_ORDER (the driver's 50-row correctness window), then any
    # remaining queries in registration order.
    from lakehouse_workshop_spark.operators import (  # noqa: F401
        relational,
        insights,
        completions,
        cdc,
        clv_queries,
        streaming_queries,
        llm_text,
        llm_pipeline,
        llm_dedup,
        llm_similarity,
        llm_multimodal,
        olap_extras,
        olap_tpch,
        llm_quality,
        llm_mixture,
        event_analytics,
        llm_ann_pq,
        profiling,
    )

    pos = {n: i for i, n in enumerate(DRIVER_ORDER)}
    unknown = [n for n in DRIVER_ORDER if n not in QUERIES]
    assert not unknown, f"DRIVER_ORDER names not registered: {unknown}"
    order = sorted(QUERIES, key=lambda n: pos.get(n, len(DRIVER_ORDER)))
    return {n: QUERIES[n] for n in order}  # stable within the tail


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLES)


def all_scale_paths() -> dict[str, str]:
    """Baseline-query → production-twin mapping (see ``SCALE_PATHS``)."""
    all_queries()
    paths = dict(SCALE_PATHS)
    missing = [t for t in paths.values() if t not in QUERIES]
    assert not missing, f"scale_path targets not registered: {missing}"
    return paths
