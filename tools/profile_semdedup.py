"""One-off profiling harness for semantic_dedup at the 10x probe scale.

Times each stage of the pass separately so the expensive stage is measured,
not guessed. Not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lakehouse_workshop_spark import get_spark  # noqa: E402


def force(df):
    """Force FULL evaluation. Never time with .count(): Catalyst can
    eliminate provably-cardinality-neutral joins under COUNT (it did —
    and hid the 25s pair-join stage this file exists to measure)."""
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s -> {out}")
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    import bench

    probe = bench._probe_dir(spark, sf_dir)
    from lakehouse_workshop_spark.operators import llm_similarity as sim

    t("full semantic_dedup (cold)", lambda: force(sim.semantic_dedup(spark, probe)))
    t("full semantic_dedup (warm)", lambda: force(sim.semantic_dedup(spark, probe)))

    # Stage 1: assignment alone
    sim._emb_view(spark, probe)
    assigned = spark.sql(
        sim._semantic_assign_sql(sim._SPARK_PREP, sim._SPARK_COS, sim._IVF_CENTROIDS)
    )
    t("assignment only", lambda: force(assigned))
    chk = assigned.localCheckpoint(eager=False)
    t("assignment localCheckpoint materialize", lambda: force(chk))
    chk.createOrReplaceTempView("sem_assigned_prof")

    verdict = spark.sql(
        "WITH " + sim._semantic_verdict_body("sem_assigned_prof", sim._SPARK_COS)
    )
    t("verdict over checkpointed assigned", lambda: force(verdict))

    # cluster size distribution
    spark.sql(
        "SELECT COUNT(*) n, COUNT(DISTINCT cid) nc FROM sem_assigned_prof"
    ).show()
    spark.sql(
        "SELECT MAX(c) mx, AVG(c) avg FROM (SELECT cid, COUNT(*) c "
        "FROM sem_assigned_prof GROUP BY cid)"
    ).show()


if __name__ == "__main__":
    main()
