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

# Explicit driver-pass order for round 8. The driver's correctness pass
# verifies the first 50 registry entries per round, so coverage rotates.
# The ordering rule (enforced by tests/test_registry.py, rebuilt each
# round with tools/make_driver_order.py):
#   1. Every query never yet driver-verified leads the window. That is
#      positions 1-20 here: the 20 queries registered in round 7 (the
#      mixture/curriculum/bloom family, event analytics, IVF-PQ, PCA
#      spectrum, perceptual-hash image dedup, streaming bloom gate, the
#      two gap-fill spines, the Q12 analog and triangle counting). Their
#      one-round grace expired when CORRECTNESS_r07.json landed.
#   2. Positions 21-26: the 6 queries whose latest row is r04 (deferred
#      from the round-7 pre-rotation) — they go stale at r09 under the
#      self-scaling period P = max(3, ceil(registry/window)+1) (= 5 at
#      170 queries), so refresh them now.
#   3. Positions 27-50: r05-latest rows pre-rotated ahead of their r10
#      staleness (44 of them exist — more than a window minus the other
#      demand — so spreading them across r08/r09 keeps every future
#      window satisfiable). These slots are the swap budget for round-8
#      registrations: a new query takes the slot of an (unedited) r05
#      entry, which simply returns to the r09/r10 rotation pool.
#      Names absent from this list keep registration order.
DRIVER_ORDER: list[str] = [
    # -- 1-20: never driver-verified, registered in round 7 (grace up) --
    "domain_mixture_weights",
    "lang_source_mix",
    "token_entropy",
    "zipf_slope",
    "curriculum_stages",
    "bloom_dedup",
    "contamination_by_benchmark",
    "source_token_kl",
    "dedup_cluster_sizes",
    "streaming_bloom_dedup",
    "image_phash_dedup",
    "gapfill_daily_revenue",
    "gapfill_locf_revenue",
    "linestatus_priority_mix",
    "copurchase_triangles",
    "user_path_trigrams",
    "hourly_seasonality",
    "daily_value_anomalies",
    "ivf_pq_topk",
    "embedding_pca_spectrum",
    # -- registered in round 8 (atomic windowing: verified at birth) ----
    "exact_topk",
    "video_decode_stats",
    "video_frame_sample",
    "ivf_pq_topk_kmeans",
    "cms_heavy_hitters",
    "streaming_cms_heavy_hitters",
    "ngram_containment_pairs",
    "ngram_containment_capped",
    "salted_join_event_nations",
    "range_join_error_purchases",
    "hll_distinct_rollup",
    # -- round-8 source changes (hash drift re-verifies) ----------------
    "cosine_topk",
    # -- 21-26: latest row r04, stale at r09 — refresh now ---------------
    "count_distinct_customers",
    "count_distinct_customers_approx",
    "customers_by_status",
    "distinct_parts",
    "orders_in_1995",
    "customer_recast",
    # -- 27-50: latest row r05, pre-rotated before their r10 staleness --
    "monthly_sales",
    "profit_by_returnflag",
    "rfm_summary_grouped",
    "customers_ranked_by_spend",
    "latest_order_asof_event",
    "embedding_near_pairs",
    "lsh_buckets",
    "embedding_near_pairs_lsh",
    "ivf_topk",
    "multimodal_features",
    "frame_samples",
    "clv_rfm_input",
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
