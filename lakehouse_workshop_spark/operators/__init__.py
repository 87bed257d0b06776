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

# Explicit driver-pass order for round 12. The driver's correctness pass
# verifies the first 50 registry entries per round, so coverage rotates.
# The ordering rule (enforced by tests/test_registry.py, rebuilt each
# round with tools/make_driver_order.py):
#   1. Positions 1-2: the two r07-latest rows displaced from the round-11
#      window — stale at r12 under the self-scaling period
#      P = max(3, ceil(registry/window)+1) (= 5 at 188 queries); they
#      MUST re-verify this round.
#   3. Positions 3-43: the full 41-row r08-latest cohort — every one of
#      them hits the P=5 horizon at r13, so deferring any would make the
#      r13 window unsatisfiable alongside new registrations.
#   4. Position 44: round-12 source edit (materialize_training_set_incremental
#      gains the LSH near-dedup + span-scrub stages _v2 has).
#   5. Positions 45-50: swap budget, seeded with r09 pre-rotations (the
#      48-row r09 cohort goes stale at r14); each round-12 registration
#      displaces one (the displaced entry returns to the rotation pool —
#      it is not yet stale).
DRIVER_ORDER: list[str] = [
    # -- 1-2: latest row r07, stale this round ---------------------------
    "top_customer_per_nation",
    "waiting_orders_blame",
    # -- 3-43: latest row r08, stale at r13 — the whole cohort ----------
    "clv_rfm_input",
    "contamination_by_benchmark",
    "copurchase_triangles",
    "count_distinct_customers",
    "count_distinct_customers_approx",
    "curriculum_stages",
    "customer_recast",
    "customers_by_status",
    "customers_ranked_by_spend",
    "daily_value_anomalies",
    "dedup_cluster_sizes",
    "distinct_parts",
    "domain_mixture_weights",
    "embedding_near_pairs",
    "embedding_near_pairs_lsh",
    "embedding_pca_spectrum",
    "frame_samples",
    "gapfill_daily_revenue",
    "gapfill_locf_revenue",
    "hll_distinct_rollup",
    "hourly_seasonality",
    "image_phash_dedup",
    "lang_source_mix",
    "latest_order_asof_event",
    "linestatus_priority_mix",
    "lsh_buckets",
    "monthly_sales",
    "multimodal_features",
    "ngram_containment_capped",
    "ngram_containment_pairs",
    "orders_in_1995",
    "profit_by_returnflag",
    "rfm_summary_grouped",
    "salted_join_event_nations",
    "source_token_kl",
    "streaming_cms_heavy_hitters",
    "token_entropy",
    "user_path_trigrams",
    "video_decode_stats",
    "video_frame_sample",
    "zipf_slope",
    # -- 44-45: round-12 source edits --------------------------------------
    "materialize_training_set_incremental",
    # interior rewritten explode->range-partitioned cumsum (r12: kills the
    # W/C row multiplier whose ~20 GB transient working set made the 100x
    # bench row fault-bound; see the function docstring)
    "range_join_error_purchases",
    # -- 46-48: round-12 registrations (near-dup provenance matrix,
    # per-source adaptive gate, IVF skew diagnostics) ---------------------
    "cross_source_near_dup_matrix",
    "source_quality_gate",
    "ivf_cluster_balance",
    # streaming twin of minhash_lsh_incremental (near-dup ingest gate)
    "streaming_lsh_ingest",
    # padding-waste accounting (doc-boundary vs concat-then-chunk packing)
    "packing_efficiency",
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
