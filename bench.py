"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) and prints ONE JSON line the driver records as BENCH_r{N}.json.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect) — the honest distributed cost, not a driver bottleneck.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: one per operator family — keep in sync as coverage widens.
HEADLINE = [
    "monthly_sales",
    "profit_by_returnflag",
    "rfm_summary_grouped",
    "customers_ranked_by_spend",
    "order_value_buckets",
    "count_distinct_customers",
    "revenue_by_nation",
    "top_customer_per_nation",
    "sessionize_events",
    "latest_order_asof_event",
    "dedup_exact",
    "dedup_keep_canonical",
    "text_stats",
    "tfidf_top_terms",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "cosine_topk",
    "embedding_near_pairs",
    "ann_topk_lsh",
    "ivf_topk",
    "multimodal_features",
    "frame_samples",
    "event_props_agg",
    "clv_distributed",
    "train_val_test_split",
    "shard_assignments",
    "merge_upsert_orders",
    "sales_cube",
    "customer_spend_quartiles",
    "conversion_funnel",
    "cohort_retention",
    "corpus_clean",
    "dedup_incremental",
    "near_dup_clusters",
    "shipping_priority",
    "local_supplier_volume",
    "rolling_revenue_7d",
    "customer_order_gaps",
    "doc_chunks",
    "repetition_ratio",
    "decontaminate",
    "embedding_normalized",
    "integrity_orphans",
    "hot_keys_events",
    "order_price_histogram",
    "sequence_packing",
    "blocklist_scrub",
    "embedding_quantize_int8",
    "image_decode_stats",
    "vocab_coverage",
    "chunk_dedup",
    "pii_redact",
    "semantic_dedup",
    "semantic_dedup_incremental",
    # round 5: TPC-H-shape module + corpus-quality module
    "promo_revenue_monthly",
    "late_shipment_priority",
    "volume_shipping",
    "market_share",
    "top_returned_customers",
    "nation_revenue_share",
    "min_cost_supplier",
    "big_quantity_orders",
    "dormant_rich_customers",
    "disjunctive_part_revenue",
    "source_balanced_sample",
    "unigram_lm_score",
    "docs_length_outliers",
    "embedding_label_centroids",
    "topic_assign",
    "corpus_quality_funnel",
    "click_attribution",
    "table_expectations",
    "weighted_sample_topk",
    "bigram_lm_score",
    "event_transitions",
    "basket_part_pairs",
    "embedding_component_variance",
    "lang_id_confusion",
    "customer_ltv_deciles",
    "supplier_concentration",
    # round 6: classifier gate + drift monitor + tokenizer primitive
    "quality_classifier_score",
    "token_dist_shift",
    "bpe_merge_candidates",
    "minhash_band_stats",
    "embedding_norm_outliers",
    # round 6: remaining canonical TPC-H shapes
    "forecast_revenue_discount",
    "customer_order_distribution",
    "top_revenue_supplier",
    "small_quantity_avg_yearly",
    # round 6: selection/novelty/incremental-ingest corpus ops
    "dsir_importance_weights",
    "ngram_novelty",
    "minhash_lsh_incremental",
    "clv_temporal_holdout",
    "cross_source_dup_matrix",
    # r12: near-dup provenance matrix (LSH pair stage + source rollup),
    # per-source adaptive quality gate, IVF skew diagnostics
    "cross_source_near_dup_matrix",
    "source_quality_gate",
    "ivf_cluster_balance",
    "ivf_split_plan",
    "ivf_rebalance",
    "embedding_cluster_drift",
    # r14: the drift consumer (a projection + window sums over the
    # drift rollup — expect ~ its parent's cost), the PSI score-drift
    # monitor (one scan + 10-group agg), and hybrid RRF retrieval — the
    # exact-brute-arm baseline (not probed at 10×: its vec arm is
    # cosine_topk's fold plan, already priced by that family's rows)
    # plus its registered scale path, the IVF-armed twin
    "drift_retrain_plan",
    "quality_score_psi",
    "hybrid_rank_fusion",
    "hybrid_rank_fusion_ivf",
    # r14: the near-dup canonicalizer (near_dup_clusters + a window over
    # cluster members + an anti-join) and the per-(source, lang)
    # fertility rollup (scan-speed agg)
    "near_dup_keep_canonical",
    "tokenizer_fertility",
    # r15: the drift family's last two decide stages — the PSI-driven
    # gate recalibration (classifier scan + one global rank window +
    # 10-row spine) and the fertility-driven token budget planner
    # (driver-trivial rollup over the fertility emission)
    "quality_gate_recalibrate",
    "token_budget_plan",
    # r16: the planner wired to domain_mixture_weights' target vector
    # (two tiny-rollup parents + a |sources|-row join — driver-trivial)
    # and its consumer, the one-round water-filling deficit rebalancer
    "token_budget_plan_mixture",
    "token_budget_rebalance",
    # r17: the budget chain's data terminal (corpus scan + broadcast
    # allocation join + epoch-capped explode) and its realized-fill audit
    "token_budget_materialize",
    "token_budget_fill_report",
    # r17: the chain's last mile (manifest cumsum -> token-balanced
    # shards), its O(batch) append twin, and the quality family's data
    # terminal (one shared scoring pass with its decision parent)
    "training_shard_manifest",
    "training_shard_append",
    "quality_gate_apply",
    "packing_efficiency",
    # round 6: real PNG + WAV codecs behind the decode seam
    "png_decode_stats",
    "audio_decode_stats",
    "image_resize_stats",
    "jpeg_decode_stats",
    # round 6: substring-grain dedup signal (Lee et al. 2022 span view)
    "dup_span_stats",
    # round 6: final five canonical TPC-H shapes (Q1, Q9, Q16, Q20, Q21)
    "pricing_summary",
    "product_type_profit",
    "supplier_part_variety",
    "excess_shipped_suppliers",
    "waiting_orders_blame",
    # round 6: link analysis over the co-purchase graph
    "part_copurchase_pagerank",
    # round 6: SCD Type-2 history build (the other half of the CDC story)
    "scd2_customer_history",
    "scd2_asof_lookup",
    "snapshot_diff_orders",
    # round 7: mixture/curation + ingest gate + corpus-shape stats
    "domain_mixture_weights",
    "lang_source_mix",
    "token_entropy",
    "zipf_slope",
    "curriculum_stages",
    "bloom_dedup",
    "contamination_by_benchmark",
    # round 7: event-stream analytics
    "user_path_trigrams",
    "hourly_seasonality",
    "daily_value_anomalies",
    # round 7: Q12 analog (completes the 22-shape canon) + triangles
    "linestatus_priority_mix",
    "copurchase_triangles",
    # round 7: product-quantized ANN + PCA spectrum contract
    "ivf_pq_topk",
    "embedding_pca_spectrum",
    # round 7: KL drift, dup histogram, gap-fills, perceptual-hash dedup
    "source_token_kl",
    "dedup_cluster_sizes",
    "gapfill_daily_revenue",
    "gapfill_locf_revenue",
    "image_phash_dedup",
    # round 8: BLAS exact search as a first-class query, MJPEG-AVI video
    # decode (real RIFF demux + per-frame JPEG), learned-centroid IVF-PQ
    "exact_topk",
    "video_decode_stats",
    "video_frame_sample",
    "ivf_pq_topk_kmeans",
    "cms_heavy_hitters",
    # exact containment stays out of the headline like the other labeled
    # quadratic baselines (ngram_jaccard_pairs, order_percentiles) — the
    # capped scale path is the measured form
    "ngram_containment_capped",
    "salted_join_event_nations",
    "range_join_error_purchases",
    "hll_distinct_rollup",
    # round 10: substring-grain scrub action, incremental ANN ingest, and
    # the end-to-end clean->dedup->decontaminate->BPE->pack composition
    "dup_span_scrub",
    "ivf_pq_incremental",
    "materialize_training_set",
    # round 10 stretch: OPQ-rotated IVF-PQ (expect ≈ ivf_pq_topk's row —
    # the rotation is one broadcast 64×64 matrix + in-buffer matmuls)
    "ivf_opq_topk",
    # round 11: the full curation chain (adds LSH near-dedup + span scrub
    # + bench-slice exclusion between v1's clean and decontaminate stages
    # — expect ≈ v1 + minhash_lsh_pairs + dup_span_scrub), and the
    # O(batch) ingest mirror (row prices the standing-state re-derivation
    # the registered emission performs, not deployment ingest — same
    # caveat as ivf_pq_incremental)
    "materialize_training_set_v2",
    "materialize_training_set_incremental",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Single-shot timings made round-over-round deltas half noise (r01→r02
# showed a ±20%-ish spread on sub-second queries, and one 1.8× "regression"
# no commit explained). Per-query N-rep MINIMUM is the fix: each query
# builds and forces its plan N times and the fastest rep is recorded.
# Median-of-3 (rounds 8) was still poisonable — when the recording run
# shares the box with anything (the r8 artifact recorded 15.5s on a query
# whose quiet median is ~3s, with 2 of 3 reps contended), the median IS a
# contended rep. Contention and GC can only ADD time, never remove it, so
# min-of-N is the robust estimator of the operator's quiet cost and the
# only aggregate a loaded box cannot inflate into a phantom regression;
# real regressions (a plan change, a new shuffle) slow every rep including
# the fastest, so they still show. Override with SPARK_GRAFT_BENCH_REPS=1
# for a quick smoke.
BENCH_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# Per-row rep overrides (r10 verdict ask #6): probe100x_exact_topk's
# recorded trail (16.9s r8 → 2.56s r9 → 8.66s r10) could not distinguish
# machine tax, variance, and regression at 3 reps — the r9 "recovery" was
# one lucky warm rep. 7 reps pins the estimator near the quiet steady
# state. (probe100x_ivf_topk's rep cap is gone with the row itself —
# retired r13, see PROBE100X_QUERIES.)
REPS_OVERRIDE = {
    "probe100x_exact_topk": 7,
    # pq's per-rep profile does not converge within 3 reps on a fresh
    # session (r11 taxed run [180.8, 79.0, 15.9]; r12 quiet runs
    # [45.6, 59.0, 38.4] / [43.8, 34.7, 44.5]) — 5 reps gives the
    # fault-reclaim cycle room to reach the quiet mode at least once
    "probe100x_ivf_pq_topk": 5,
}

# Per-row estimator overrides (r11 verdict ask #6): min-of-7 kept chasing
# exact_topk's declining tail (band revised 3 rounds running; r11 min 3.9s
# vs the 6-8s steady band) because the microVM's fault tax relaxes
# monotonically within a session — the LAST reps are the steady state, so
# median-of-last-3 estimates it without tail luck (r11 driver samples
# [13.6, 16.2, 11.5, 8.4, 7.1, 6.7, 3.9] → 6.74s, inside the band).
# Everything else stays min-of-N (contention only ADDS time).
ESTIMATOR_OVERRIDE = {
    "probe100x_exact_topk": "median_last3",
    # probe100x_ivf_pq_topk reverted to min-of-5 (r13 verdict "What's
    # wrong #2"): once the session warms, the row's profile is BIMODAL —
    # a ~15-17s quiet mode and a ~25s taxed mode (r13 driver samples
    # [24.7, 17.3, 25.0, 15.3, 24.9]) — so median_last3 records
    # whichever mode the last reps happened to land on (24.9s on the r13
    # driver, a phantom +5.8s regression on untouched code) while
    # min-of-5 landed inside the documented 15-17s band on both the
    # driver and builder same-HEAD runs. The tax only ADDS time; with 5
    # reps the quiet mode is reliably visited at least once, so min is
    # the honest statistic here. (median_last3 remains right for
    # exact_topk, whose profile declines monotonically rather than
    # flipping between modes.)
}


def _reclaim() -> None:
    """Drop leftover persisted blocks between timed reps.

    Every ``localCheckpoint`` pins MEMORY_AND_DISK blocks that are only
    freed when Python GC happens to collect the py4j proxy — over a
    73-query × 3-rep session hundreds of checkpointed RDDs accumulate
    and the late rows (the probe suite) get billed for the storage
    pressure the early rows left behind. Unpersisting is safe here
    because each rep rebuilds its plan from scratch (no live DataFrame
    needs the truncated lineage) and runs OUTSIDE the timed window, so
    reps measure the operator, not harness residue.
    """
    import gc

    from lakehouse_workshop_spark import get_spark

    gc.collect()
    sc = get_spark().sparkContext
    for rdd in list(sc._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)


def _timed(
    fn, reps: int = BENCH_REPS, estimator: str = "min"
) -> tuple[float, list[float]]:
    # Each rep must pay the query's full cost: the CLV memo would
    # otherwise hand reps 2..N a checkpointed result and the timing
    # would measure a cache read, not the operator.
    from lakehouse_workshop_spark.clv import pipeline as _clv

    samples = []
    for _ in range(reps):
        _clv._SCORED_CACHE.clear()
        _reclaim()
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    # min-of-N estimator (since r9): contention can only ADD time, so min
    # is the statistic a loaded box cannot inflate. The raw samples ride
    # along in the artifact so cross-round comparisons can re-derive any
    # other estimator (r9 ADVICE: the r8→r9 median→min switch conflated
    # estimator change with real deltas for one round). median_last3
    # (ESTIMATOR_OVERRIDE) serves rows whose within-session profile
    # declines monotonically — their steady state is the tail, not the
    # single luckiest rep.
    if estimator == "median_last3":
        import statistics

        est = statistics.median(samples[-3:])
    else:
        est = min(samples)
    return round(est, 3), [round(s, 3) for s in samples]


# --- 10× corpus probe ------------------------------------------------------
# The scale regression net for the dedup/similarity families: replicate the
# documents/embeddings corpus 10× with deterministic per-replica
# perturbations and re-run the corpus-bound queries. This probe (as a
# one-off) is what exposed 8-bit simhash banding going quadratic at 50k
# docs; running it per-round keeps that class of regression in the
# artifact. Disable with SPARK_GRAFT_PROBE10X=0.
PROBE_QUERIES = [
    "dedup_exact",
    "text_stats",
    "tfidf_top_terms",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "ann_topk_lsh",
    "ivf_topk",
    "multimodal_features",
    "corpus_clean",
    "dedup_incremental",
    "near_dup_clusters",
    "doc_chunks",
    "repetition_ratio",
    "decontaminate",
    "ngram_jaccard_pairs_capped",
    "ngram_containment_capped",
    "chunk_dedup",
    "pii_redact",
    "semantic_dedup",
    "semantic_dedup_incremental",
    # the split path only fires at probe scale (x~10 hot cluster) — the
    # 10x row is where this operator does real work; sf0.1 is identity
    "ivf_rebalance",
    "unigram_lm_score",
    "embedding_label_centroids",
    "bigram_lm_score",
    "quality_classifier_score",
    "minhash_band_stats",
    "dsir_importance_weights",
    "minhash_lsh_incremental",
    "dup_span_stats",
    # r6 plan rewrites — probe their scaling, not just their 1x wall:
    # topic_assign (broadcast-centroid matmul) and vocab_coverage
    # (top-k-then-rank) both replaced forms that grew with corpus size
    "topic_assign",
    "vocab_coverage",
    # r7 corpus-bound additions: entropy/zipf are token-shuffle-bound,
    # bloom is the distinct-position set build, contamination mirrors
    # decontaminate's join, ivf_pq probes the quantized candidate path
    "token_entropy",
    "zipf_slope",
    "bloom_dedup",
    "contamination_by_benchmark",
    "ivf_pq_topk",
    "source_token_kl",
    "image_phash_dedup",
    # r10: incremental ingest — the growth axis is the batch partition
    # (10% of vectors) re-encoding against a corpus-trained index; should
    # grow near-linearly in corpus size (one assign-encode pass + cid
    # rollup), well under the full-rebuild contract queries above
    "ivf_pq_incremental",
    # r10: span scrub (shingle-stats agg + token anti-join — near-linear;
    # the perturbed replicas change WHICH spans duplicate, so this also
    # guards the keep-first join's candidate growth) and the
    # clean→dedup→decontaminate→BPE→pack composition (every stage
    # near-linear; the probe pins that composing them stays so)
    "dup_span_scrub",
    "materialize_training_set",
    # r11: the full chain — its growth is bounded by its slowest stage
    # (the span scrub's shingle aggregation); the probe pins that the
    # composition inherits the stages' near-linearity rather than
    # multiplying it
    "materialize_training_set_v2",
    # r12: the ingest mirror gained the near-dedup stage — its growth
    # axis is the standing-signature re-derivation (corpus minhash, one
    # pass) + the batch band join; should stay near-linear in corpus
    "materialize_training_set_incremental",
    # r12: near-dup provenance rollup — the pair stage is
    # minhash_lsh_pairs' banded equi-join, so its growth should track
    # that row, plus a corpus-reduced source join
    "cross_source_near_dup_matrix",
    # r14: the near-dup canonicalizer composes near_dup_clusters (probed
    # above) with a cluster-member window + doc_id anti-join — the probe
    # pins that the decide->act composition inherits the cluster stage's
    # growth rather than adding a corpus-sized one
    "near_dup_keep_canonical",
    # r14: the drift consumer subsumes its parent rollup (two
    # broadcast-centroid matmul passes over the grown corpus + <=sqrt(n)
    # window sums) — one row prices the whole monitor->decision chain;
    # quality_score_psi is deliberately NOT probed (its scan/agg cost IS
    # quality_classifier_score's probed row; the PSI layer is 10 rows),
    # same rationale as the codec family
    "drift_retrain_plan",
    # r14: the fusion's production shape — at this decade BOTH twins
    # are lexical-arm-dominated (BENCH_SCALING r14 note), so this row
    # pins the twin's near-linear growth, not a same-decade vec-arm
    # win; the crossover analysis lives with the operator (the brute
    # twin stays un-probed by the cosine-family rationale above)
    "hybrid_rank_fusion_ivf",
    # r17: the budget chain's last mile — one row prices the whole
    # fertility->plan->rebalance->materialize->shard composition; its
    # only corpus-grain addition is the manifest cumsum (two-pass
    # range-partitioned on a uniform md5 key), which must stay
    # near-linear. quality_gate_apply is deliberately NOT probed: its
    # scan cost IS quality_classifier_score's probed row (the
    # quality_score_psi rationale) and the gate itself is a codegen
    # filter over the decision parent's checkpoint. training_shard_append
    # is deliberately NOT probed either: its registered emission is the
    # same materialize re-derivation this row prices plus a BATCH-sized
    # cumsum (strictly less shuffle than the full-manifest cumsum here).
    "training_shard_manifest",
    # (video_decode_stats is deliberately NOT probed: the codec family is
    # pure map work — no shuffle, no pair structure — so 10x corpus is
    # 10x map tasks by construction; a ~27s/rep probe row would buy no
    # scaling evidence the headline row doesn't already give)
]
PROBE_REPLICAS = 10

# 100× probe: timing-only extrapolation anchor — hash dedup and banded
# minhash (500k docs) plus the ANN-family flagship (200k vectors, whose
# perturbed-replica skew drives 22% of vectors into one cluster — exactly
# the stress the blockwise verdict exists for). Measured as the same
# 3-rep median as every other row since r8: the original single-shot
# rationale ("the point is the order of growth, not ±5%") was falsified
# by the record — unchanged code measured 8.8s (r6) / 11.5s (r7) / 15.3s
# (r8 single-shot confirm) on semantic_dedup, a ±40% cold-state spread
# that swamps any real growth signal; the 3-rep median lands on the
# steady state (~9.5s quiet) and makes round-over-round deltas
# attributable again. Tag carries "full" because this corpus includes
# embeddings (a cached docs-only corpus must not be reused).
PROBE100X_QUERIES = [
    "dedup_exact",
    "minhash_lsh_pairs",
    "semantic_dedup",
    # the r13 incremental gate at the decade that matters (180k standing +
    # 20k batch); funded by the retired ivf_topk wall budget
    "semantic_dedup_incremental",
    # ivf_topk's 100× wall-time row is RETIRED as of r13 (r12 verdict
    # "What's wrong #1"): under the documented 2–4× between-session host
    # spread on the 200k-vector corpus, neither min-of-2 (r12: recorded
    # 80.7s against the 40–50s steady band) nor min-of-3 (r11: [45.6,
    # 75.9, 42.3]) converges, so the number was phantom-regression bait
    # in every compare_bench. The operator still RUNS at 100× every
    # round inside _recall_probe — its quality signal (recall@10, the
    # thing the geometry-derived nprobe knob exists for) stays in the
    # artifact and is floored by tests/test_recall.py; PQ is the
    # documented operator at this decade and keeps its timed row.
    # plane-count scales ~log2(n) in-query, so bucket population (and
    # therefore wall) should stay near-flat 10x -> 100x — this anchor is
    # the evidence for that knob
    "ann_topk_lsh",
    # the PQ path is the one BUILT for this scale: candidates travel as
    # 8 codes, so its 100x growth should undercut ivf_topk's
    "ivf_pq_topk",
    # r8: isolates the BLAS exact arm that rides inside ivf_pq_topk's
    # row — the registered scale path consumers get instead of
    # cosine_topk's fold plan
    "exact_topk",
]
PROBE100X_REPLICAS = 100
PROBE100X_TAG = "probe100x_full"

# Events growth probe (r8 verdict ask #4): the round-8 sketch/join family
# runs on the events fact and was registered sub-second at sf0.1 with no
# growth row. 10× the event stream with +rep-second staggered timestamps —
# which densifies traffic-per-window 10×, the exact axis the range join's
# fan-out and the salted join's hot keys stress — and re-run the family.
# Expected growth: range join ≤ ~3× (interior cells are pre-aggregated, so
# only the 2 boundary cells see 10× rows per error against 10× errors);
# CMS/HLL near-linear (fixed-size sketch state); salted join near-linear
# (8-way salt splits the 10×-hotter keys).
PROBE_EVENTS_QUERIES = [
    "range_join_error_purchases",
    "cms_heavy_hitters",
    "hll_distinct_rollup",
    "salted_join_event_nations",
]

# 100× events probe (r9 verdict stretch #8): the range join's headline
# claim is CONSTANT per-error fan-out even when traffic-per-window is
# unbounded — the 10× row (3.6× growth, sublinear) supports it one
# decade out; this anchors the next decade (100× errors × 100×
# traffic-per-window: interior cells stay pre-aggregated, only the two
# boundary cells see 100× rows per error). Only the query the claim is
# about — the sketch/salt families are already near-linear by
# construction and not worth 100× bench minutes each round.
PROBE100X_EVENTS_QUERIES = [
    "range_join_error_purchases",
]

# SCD2 growth probe (r7 verdict ask #8): both history builds are
# driver-green but had no growth-path measurement. 10× the change-stream
# volume (every customer gets 10× versions — the per-key window's worst
# axis) and re-run the batch build and the streaming incremental
# maintenance; both should grow ≤ ~3× (one shuffle of the change stream
# on the dimension key + a per-key LEAD is near-linear in stream volume).
PROBE_SCD2_QUERIES = [
    "scd2_customer_history",
    "streaming_scd2_history",
]


def _probe_orders_dir(
    spark, sf_dir: str, replicas: int = PROBE_REPLICAS, tag: str = "probe10x_orders"
) -> str:
    """Materialize (once, cached in /tmp) a replicas× orders change
    stream: replica r of each order keeps its customer (so per-key
    version chains really are replicas× longer) under a fresh orderkey,
    with the order date staggered +r days so versions interleave rather
    than tie."""
    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/spark_graft_{tag}_v1_{base}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    rep = spark.range(replicas).select(F.col("id").cast("int").alias("rep"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        orders.crossJoin(rep)
        .select(
            (F.col("o_orderkey") * replicas + F.col("rep")).alias("o_orderkey"),
            F.date_add(F.col("o_orderdate"), F.col("rep")).alias("o_orderdate"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_orderdate")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return out

def _probe_events_dir(
    spark, sf_dir: str, replicas: int = PROBE_REPLICAS, tag: str = "probe10x_events"
) -> str:
    """Materialize (once, cached in /tmp) a replicas× event stream:
    replica r of each event fires r seconds later under a fresh event_id,
    keeping its user — so windows carry replicas× the traffic and hot
    users get replicas× hotter, while the overall time span is unchanged.
    The dimension tables the family's joins need (customer, nation) copy
    through unmodified."""
    import shutil

    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/spark_graft_{tag}_v1_{base}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    rep = spark.range(replicas).select(F.col("id").cast("int").alias("rep"))
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    (
        events.crossJoin(rep)
        .select(
            (F.col("event_id") * replicas + F.col("rep")).alias("event_id"),
            (F.col("ts") + F.make_dt_interval(secs=F.col("rep"))).alias("ts"),
            *[c for c in events.columns if c not in ("event_id", "ts")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    for dim in ("customer", "nation"):
        # the datagen currently writes single-file parquet for dims, but
        # events.parquet in the same dir is already directory-style — stay
        # robust to either layout (r9 ADVICE)
        src, dst = f"{sf_dir}/{dim}.parquet", f"{out}/{dim}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


# Replica perturbation: rep 0 keeps the original text; each other replica
# drops ~5% of tokens (deterministic in (doc_id, rep, position)) and
# carries a replica-tag token. Exact replicas would make every near-dup
# family's candidate structure degenerate (all-pairs within a replica
# group share ALL shingles) — token dropping makes banded-LSH recall and
# candidate growth realistic while keeping the corpus deterministic.
_PERTURB_TEXT = """
    array_join(
        filter(
            transform(split(text, ' '),
                      (t, i) -> CASE WHEN rep > 0
                                      AND pmod(hash(doc_id, rep, i), 20) = 0
                                     THEN NULL ELSE t END),
            t -> t IS NOT NULL),
        ' ')
"""


def _probe_dir(
    spark,
    sf_dir: str,
    replicas: int = PROBE_REPLICAS,
    tag: str = "probe10x",
    embeddings: bool = True,
) -> str:
    """Materialize (once, cached in /tmp) a replicas× corpus from sf_dir.

    Each original doc/vector yields `replicas` perturbed variants — near-dup
    but not identical (identical replicas would square the pair-family
    outputs and measure output explosion, not operator scaling). Written
    multi-partition so scans parallelize (the driver testdata is
    single-row-group).
    """
    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    # v2: perturbed replicas (5% token drop) — a perturbation-rule change
    # must invalidate the cached corpus, so the rule version is in the path.
    out = f"/tmp/spark_graft_{tag}_v2_{base}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    rep = spark.range(replicas).select(F.col("id").cast("int").alias("rep"))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
            F.concat(
                F.expr(_PERTURB_TEXT), F.lit(" rep"), F.col("rep").cast("string")
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )

    if embeddings:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        (
            emb.crossJoin(rep)
            .select(
                (F.col("vec_id") * replicas + F.col("rep")).alias("vec_id"),
                F.expr(
                    "transform(embedding, (x, i) -> "
                    "CAST(x + 0.003 * rep * ((i % 7) - 3) AS FLOAT))"
                ).alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/embeddings.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


# Measured-recall growth probe (r10 verdict ask #5): the r10 PQ fix and
# the r11 IVF fix were both found by MANUAL recall sweeps at SFs the
# driver never checks — constant search knobs decay coverage as the
# corpus grows while every latency row stays green. This records
# recall@10 (not latency) for the ANN family at the 10×/100× probe
# corpora in the bench artifact itself, so the next coverage-decay
# regression shows up as an artifact diff. Micro-averaged (hit pairs /
# exact pairs), the same statistic tests/test_recall.py floors.
RECALL_PROBE_FLOOR_HINT = 0.6  # context only; the pytest floors enforce


def _recall_probe(spark, probe_sf: str, tag: str) -> dict[str, float]:
    import lakehouse_workshop_spark.operators.llm_similarity as S
    from lakehouse_workshop_spark.operators.llm_ann_pq import (
        exact_topk_blas,
        ivf_pq_search,
    )

    exact = (
        exact_topk_blas(spark, probe_sf)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    searches = {
        "ivf_topk": lambda: S.ivf_topk(spark, probe_sf),
        "ivf_pq_topk": lambda: ivf_pq_search(spark, probe_sf),
        "ivf_opq_topk": lambda: ivf_pq_search(spark, probe_sf, rotate=True),
    }
    out = {}
    for name, fn in searches.items():
        hits = exact.join(
            fn().select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
        ).count()
        out[f"{tag}_{name}"] = round(hits / n_exact, 4)
    exact.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_workshop_spark import get_spark
    from lakehouse_workshop_spark.operators import all_queries

    spark = get_spark(app_name="lakehouse-workshop-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries] + [
        n for n in sorted(queries) if n.startswith("bench_") and n not in HEADLINE
    ]

    # Warm the JVM/codegen AND the Python worker pool once so timings
    # measure steady-state throughput (first pandas-UDF use otherwise pays
    # one fork+import per worker, and the first BLAS dgemm per worker
    # pays OpenBLAS's DYNAMIC_ARCH kernel init — measured ~10s across the
    # 32-worker pool at the 100× probe, dwarfing the matmul itself; a
    # long-lived executor amortizes both to zero, so neither belongs in a
    # steady-state rep).
    _force(queries[names[0]](spark, sf_dir))
    import pandas as _pd  # noqa: F401

    def _blas_warm_batch(it):
        import numpy as _np

        w = _np.ones((64, 64))
        for pdf in it:
            (w @ w).sum()
            yield pdf

    _force(
        spark.range(0, 256, 1, 32)
        .withColumnRenamed("id", "n")
        .mapInPandas(_blas_warm_batch, schema="n long")
    )

    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}

    def _record(key: str, fn) -> None:
        timings[key], raw[key] = _timed(
            fn,
            REPS_OVERRIDE.get(key, BENCH_REPS),
            ESTIMATOR_OVERRIDE.get(key, "min"),
        )

    for name in names:
        _record(name, lambda: _force(queries[name](spark, sf_dir)))

    recall: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_PROBE10X", "1") != "0":
        probe_sf = _probe_dir(spark, sf_dir)
        for name in PROBE_QUERIES:
            _record(f"probe10x_{name}", lambda: _force(queries[name](spark, probe_sf)))
        recall.update(_recall_probe(spark, probe_sf, "probe10x"))

        probe_orders = _probe_orders_dir(spark, sf_dir)
        for name in PROBE_SCD2_QUERIES:
            _record(
                f"probe10x_{name}", lambda: _force(queries[name](spark, probe_orders))
            )

        probe_events = _probe_events_dir(spark, sf_dir)
        for name in PROBE_EVENTS_QUERIES:
            _record(
                f"probe10x_{name}", lambda: _force(queries[name](spark, probe_events))
            )

    if os.environ.get("SPARK_GRAFT_PROBE100X", "1") != "0":
        probe100 = _probe_dir(
            spark, sf_dir, PROBE100X_REPLICAS, tag=PROBE100X_TAG, embeddings=True
        )
        for name in PROBE100X_QUERIES:
            _record(f"probe100x_{name}", lambda: _force(queries[name](spark, probe100)))
        recall.update(_recall_probe(spark, probe100, "probe100x"))

        probe_events100 = _probe_events_dir(
            spark, sf_dir, PROBE100X_REPLICAS, tag="probe100x_events"
        )
        for name in PROBE100X_EVENTS_QUERIES:
            _record(
                f"probe100x_{name}",
                lambda: _force(queries[name](spark, probe_events100)),
            )

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    headline_total = sum(v for k, v in timings.items() if not k.startswith("probe"))
    probe_total = sum(v for k, v in timings.items() if k.startswith("probe10x_"))
    probe100_total = sum(v for k, v in timings.items() if k.startswith("probe100x_"))
    # The driver's artifact of record keeps only the LAST 2,000 chars of
    # the emitted line. The r11 compact {name: min} map still didn't fit
    # (195 rows ≈ 9 KB; BENCH_r11.json "parsed": null — r11 verdict
    # "What's wrong #2"), so since r12 the line is SELF-SUFFICIENT BY
    # CONSTRUCTION: totals + the recall map + a bounded "queries" subset
    # (the largest round-over-round deltas vs the previous committed full
    # doc, trimmed until the whole line fits in 1,900 chars). The
    # COMPLETE document — every row, per-rep samples, recall — goes to
    # BENCH_FULL_LATEST.json beside this script, keyed to the line by
    # run_id; the round boundary commits it and the next builder stamps
    # it as BENCH_r{N}_full.json. tools/compare_bench.py follows the
    # full_doc/run_id reference, so cross-round comparisons see every
    # row from committed artifacts alone.
    full_path = Path(__file__).resolve().parent / "BENCH_FULL_LATEST.json"
    prev: dict[str, float] = {}
    try:
        prev_doc = json.loads(full_path.read_text())
        prev = {
            k: (min(v) if isinstance(v, list) else float(v))
            for k, v in prev_doc.get("queries", {}).items()
        }
    except (OSError, ValueError):
        pass
    run_id = f"run{int(time.time())}"
    by_delta = sorted(
        timings,
        key=lambda k: abs(timings[k] - prev[k]) if k in prev else timings[k],
        reverse=True,
    )
    doc = {
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "reps": BENCH_REPS,
        "estimator": "min",
        "estimator_override": ESTIMATOR_OVERRIDE,
        "run_id": run_id,
        "full_doc": "BENCH_FULL_LATEST.json",
        "n_rows": len(timings),
        # recall keys carry the recall_ prefix so a truncated tail can
        # never be misparsed as timing rows by tools/compare_bench.py
        "recall": {f"recall_{k}": v for k, v in recall.items()},
        "queries": {},
        "queries_note": "largest deltas vs previous full doc; all rows in full_doc",
        "probe10x_total": round(probe_total, 3),
        "probe100x_total": round(probe100_total, 3),
        "value": round(headline_total, 3),
        "sf": sf,
    }
    for name in by_delta:
        doc["queries"][name] = timings[name]
        if len(json.dumps(doc)) > 1900:
            del doc["queries"][name]
            break
    full = dict(doc)
    full["queries"] = timings
    full["reps_override"] = REPS_OVERRIDE
    full["samples"] = raw
    full_path.write_text(json.dumps(full, indent=1) + "\n")
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
