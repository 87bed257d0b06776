"""Unit tests for reference-derived relational operators (SURVEY.md §2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_workshop_spark.functions.exprs import case_bucket, dec_sum
from lakehouse_workshop_spark.operators import relational as R


def test_rfm_invariants(spark, sf_dir):
    """A4 algebra: frequency = count-1 >= 0, recency <= t-ish bounds."""
    rfm = R.rfm_summary(spark, sf_dir)
    bad = rfm.filter((F.col("frequency") < 0) | (F.col("recency") < 0)).count()
    assert bad == 0
    assert rfm.count() == rfm.select("customer_id").distinct().count()


def test_rfm_grouped_fanout(spark, sf_dir):
    groups = R.rfm_summary_grouped(spark, sf_dir).select("group_key").distinct()
    keys = [r.group_key for r in groups.collect()]
    assert min(keys) >= 1 and max(keys) <= 20
    assert len(keys) > 1, "fan-out must not reproduce the reference's %1 bug"


def test_case_bucket_total(spark, sf_dir):
    """P8: every row lands in exactly one band (no gaps in engine edges)."""
    df = R.order_value_buckets(spark, sf_dir)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert df.agg(F.sum("n_orders")).collect()[0][0] == n_orders
    assert df.filter(F.col("bucket") == "others").count() == 0


def test_case_bucket_gap_labels(spark):
    edges = [(0.0, 10.0, "low"), (20.0, 30.0, "high")]  # deliberate gap
    df = spark.createDataFrame([(5.0,), (15.0,), (25.0,)], ["x"])
    got = [r[0] for r in df.select(case_bucket("x", edges)).collect()]
    assert got == ["low", "others", "high"]


def test_dec_sum_partition_invariant(spark):
    """Decimal accumulation is partition-order-independent."""
    data = [(float(f"{i % 997}.{i % 100:02d}"),) for i in range(10_000)]
    df1 = spark.createDataFrame(data, ["x"]).repartition(1)
    df32 = spark.createDataFrame(data, ["x"]).repartition(32)
    v1 = df1.agg(dec_sum("x")).collect()[0][0]
    v32 = df32.agg(dec_sum("x")).collect()[0][0]
    assert v1 == v32


def test_top10_is_take_ordered(spark, sf_dir):
    """O4 should plan TakeOrderedAndProject, not a full global sort."""
    plan = R.top10_orders(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("seed,n", [(1, 1), (2, 7), (3, 500), (4, 4096)])
def test_global_row_number_equals_window_rank(spark, seed, n):
    """The two-pass distributed rank must agree with the textbook
    single-partition window on any total order — including sizes smaller
    than the partition count and non-contiguous keys."""
    from pyspark.sql import Window

    from lakehouse_workshop_spark.functions.exprs import global_row_number

    df = (
        spark.range(n)
        .selectExpr(
            f"id",
            f"CAST(conv(substring(md5(CAST(id + {seed} AS STRING)), 1, 8), 16, 10) AS BIGINT) AS v",
        )
    )
    two_pass = global_row_number(df, F.desc("v"), F.asc("id"), name="rk")
    reference = df.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("v"), F.asc("id")))
    )
    assert two_pass.exceptAll(reference).count() == 0
    assert two_pass.count() == n
