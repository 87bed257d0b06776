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

# Explicit driver-pass order for round 7. The driver's correctness pass
# verifies the first 50 registry entries per round, so coverage rotates.
# The ordering rule (enforced by tests/test_registry.py, rebuilt each
# round with tools/make_driver_order.py):
#   1. Every query never yet driver-verified leads the window. That is
#      positions 1-15 here: the 15 queries registered late in round 6
#      (after that round's window had shipped) — the four decode-stats
#      queries, dup_span_stats, the five TPC-H shapes, pagerank, the two
#      SCD2 queries, snapshot_diff_orders, streaming_scd2_history. Their
#      one-round grace expires with the r07 run.
#   2. No query is stale for r07 under the self-scaling period
#      P = max(3, ceil(registry/window)+1) (= 4 at 150 queries), but the
#      41 queries whose latest row is r04 ALL go stale at r08 — more
#      than a whole window. Positions 16-50 pre-rotate 35 of them now so
#      r08 inherits only 6 stale rows (the simplest scan/agg shapes,
#      deferred deliberately) plus round-7's own new registrations.
#      Names absent from this list keep registration order.
DRIVER_ORDER: list[str] = [
    # -- 1-15: never driver-verified, registered in round 6 (grace up) ---
    "scd2_customer_history",
    "scd2_asof_lookup",
    "snapshot_diff_orders",
    "streaming_scd2_history",
    "dup_span_stats",
    "png_decode_stats",
    "audio_decode_stats",
    "image_resize_stats",
    "jpeg_decode_stats",
    "pricing_summary",
    "product_type_profit",
    "supplier_part_variety",
    "excess_shipped_suppliers",
    "waiting_orders_blame",
    "part_copurchase_pagerank",
    # -- 16-50: latest row r04, pre-rotated before they go stale at r08 --
    "rfm_summary",
    "corr_frequency_monetary",
    "order_value_buckets",
    "top10_orders",
    "frequency_bands",
    "customer_value_bands",
    "order_percentiles_approx",
    "revenue_by_nation",
    "top_customer_per_nation",
    "active_or_rich_customers",
    "sales_rollup",
    "orders_pivot_status",
    "sessionize_events",
    "churned_customers",
    "cumulative_monthly_revenue",
    "event_props_agg",
    "clv_distributed",
    "clv_segment_rollup",
    "text_stats",
    "doc_quality",
    "lang_id",
    "doc_fingerprint",
    "token_counts",
    "blocklist_scrub",
    "sequence_packing",
    "pii_redact",
    "dedup_exact",
    "dedup_keep_canonical",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "simhash_fingerprints",
    "cosine_topk",
    "ivf_topk_kmeans",
    "embedding_quantize_int8",
    "image_decode_stats",
    # deferred to lead r08 (simple stable scans/aggs): count_distinct_customers,
    # count_distinct_customers_approx, customers_by_status, distinct_parts,
    # orders_in_1995, customer_recast
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
