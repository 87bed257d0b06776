"""Plan-shape and semantics tests for the multi-join / window OLAP operators.

Value correctness is covered by the auto-parametrized oracle parity suite;
these tests pin the PHYSICAL plan properties the module's docstrings
promise (dimension joins broadcast, filters reach the scans, windows
stay partitioned / day-grain), which a parity check cannot see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_workshop_spark.operators import olap_extras as O


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_shipping_priority_plan_broadcasts_and_pushes(spark, sf_dir):
    df = O.shipping_priority(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # both date filters reach the parquet scans
    assert plan.count("PushedFilters: [IsNotNull") >= 2
    assert "TakeOrderedAndProject" in plan


def test_shipping_priority_top10_ordering(spark, sf_dir):
    rows = O.shipping_priority(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_local_supplier_volume_broadcasts_every_dim(spark, sf_dir):
    df = O.local_supplier_volume(spark, sf_dir)
    plan = _plan(df)
    # region/nation collapse into supplier's build side; supplier and
    # customer broadcast into the fact join — at least 3 broadcast joins,
    # never a cartesian product
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    out = {r.n_name for r in df.collect()}
    # only nations of the target region can appear (25 nations, 5 regions)
    assert 0 < len(out) <= 5


def test_rolling_revenue_7d_window_over_day_grain(spark, sf_dir):
    df = O.rolling_revenue_7d(spark, sf_dir)
    rows = {r.day.date().isoformat(): r for r in df.collect()}
    # a 7-day moving sum is always >= the single day's revenue and equals
    # it when the preceding 6 days are absent
    assert all(r.revenue_7d >= r.revenue - 1e-6 for r in rows.values())
    first = min(rows)
    assert abs(rows[first].revenue_7d - rows[first].revenue) < 1e-6


def test_customer_order_gaps_partitioned_window(spark, sf_dir):
    df = O.customer_order_gaps(spark, sf_dir)
    plan = _plan(df)
    # the lag window must be keyed by customer — an empty PARTITION BY
    # would serialize on one partition (Spark warns "No Partition Defined")
    assert "Window" in plan and "o_custkey" in plan.split("Window")[1][:200]
    bad = df.filter(
        (F.col("avg_gap_days") < 0) | (F.col("max_gap_days") < F.col("avg_gap_days") - 1e-9)
    )
    assert bad.count() == 0
