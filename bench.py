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
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


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
    # one fork+import per worker).
    _force(queries[names[0]](spark, sf_dir))
    import pandas as _pd  # noqa: F401

    def _noop_batch(it):
        for pdf in it:
            yield pdf

    _force(
        spark.range(0, 256, 1, 32)
        .withColumnRenamed("id", "n")
        .mapInPandas(_noop_batch, schema="n long")
    )

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        _force(queries[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
