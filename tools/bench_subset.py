"""A/B a session-config candidate over a query subset (guide §1 / §9).

Runs a fixed subset of registered queries (noop-forced, min-of-N) in ONE
fresh session built with extra conf from $SPARK_GRAFT_AB_CONF (JSON), and
prints a JSON line. Configs like the shuffle codec are JVM-level, so each
config variant must run in its own process; alternate A/B/A/B runs to
control for host drift.

Usage:
  SPARK_GRAFT_AB_CONF='{"spark.sql.join.preferSortMergeJoin":"false"}' \
      python tools/bench_subset.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Representative slow rows across families: (label, query, corpus)
# corpus: "sf" = sf0.1, "p10" = 10x probe corpus, "p10e" = 10x events
SUBSET = [
    ("monthly_sales", "monthly_sales", "sf"),
    ("shipping_priority", "shipping_priority", "sf"),
    ("part_copurchase_pagerank", "part_copurchase_pagerank", "sf"),
    ("ivf_pq_topk", "ivf_pq_topk", "sf"),
    ("materialize_training_set_v2", "materialize_training_set_v2", "sf"),
    ("near_dup_keep_canonical", "near_dup_keep_canonical", "sf"),
    ("p10_minhash_lsh_pairs", "minhash_lsh_pairs", "p10"),
    ("p10_ngram_containment_capped", "ngram_containment_capped", "p10"),
    ("p10_dup_span_scrub", "dup_span_scrub", "p10"),
    ("p10_near_dup_clusters", "near_dup_clusters", "p10"),
    ("p10_hybrid_rank_fusion_ivf", "hybrid_rank_fusion_ivf", "p10"),
    ("p10_ivf_topk", "ivf_topk", "p10"),
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    conf = json.loads(os.environ.get("SPARK_GRAFT_AB_CONF", "{}"))

    import bench
    from lakehouse_workshop_spark import get_spark
    from lakehouse_workshop_spark.operators import all_queries

    spark = get_spark(app_name="ab-subset", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    base = "/root/testdata/sf0.1"
    dirs = {"sf": base, "p10": bench._probe_dir(spark, base)}

    # Warm JVM + python pool + BLAS, as bench.py does.
    bench._force(queries["monthly_sales"](spark, base))
    import pandas as _pd  # noqa: F401

    def _blas_warm(it):
        import numpy as _np

        w = _np.ones((64, 64))
        for pdf in it:
            (w @ w).sum()
            yield pdf

    bench._force(
        spark.range(0, 256, 1, 32)
        .withColumnRenamed("id", "n")
        .mapInPandas(_blas_warm, schema="n long")
    )

    out = {}
    for label, name, corpus in SUBSET:
        spark.sparkContext.setJobDescription(label)
        out[label], _ = bench._timed(
            lambda: bench._force(queries[name](spark, dirs[corpus])), reps
        )
    out["__total__"] = round(sum(out.values()), 3)
    out["__conf__"] = conf
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
