"""Reference-derived relational operators (SURVEY.md §2.2–2.5).

Every query here is the idiomatic-Spark re-expression of a reference operator,
run against the harness testdata (FIXTURES.md §B column mapping). Each carries
a DuckDB oracle. Determinism rules (see functions/exprs.py): money sums
accumulate in DECIMAL so results are partition-order-independent; grouping
keys are cast to explicit types so Spark and DuckDB schemas agree.

Scale posture: all of these are single-pass scan→partial-agg→shuffle→final-agg
plans (two-phase hash aggregation from Catalyst); filters and column pruning
reach the parquet scan. None of them collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_workshop_spark.catalog import load_table
from lakehouse_workshop_spark.functions.exprs import (
    case_bucket,
    dec_avg,
    dec_sum,
    global_row_number,
)
from lakehouse_workshop_spark.operators import query

# ---------------------------------------------------------------------------
# A3/O2/F1/F2 — the reference's flagship dashboard query
# (``DS_cust_lifetime_value.py:83-92``, ``SQL_CLV_Insights.py:33-42``):
# monthly actives / invoices / sales.
# ---------------------------------------------------------------------------


@query(
    "monthly_sales",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_sales
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct-customers / order-count / sales (ref ``DS:83-92``)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            dec_sum("o_totalprice").alias("total_sales"),
        )
        .orderBy("order_year", "order_month")
    )


@query(
    "monthly_sales_1997",
    oracle="""
    SELECT CAST(month(o_orderdate) AS INT) AS order_month,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_sales
    FROM orders
    WHERE year(o_orderdate) = 1997
    GROUP BY 1
    ORDER BY 1
    """,
)
def monthly_sales_1997(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 year-predicate variant (ref ``SQL_CLV_Insights.py:33-42`` WHERE year=2011).

    The year-equality is expressed as a half-open date range: Catalyst does
    not rewrite ``year(col) = k`` into a range, so the range form is what
    reaches the parquet scan as PushedFilters (row-group/partition skipping
    — the difference between a pruned read and a full scan at 100 TB).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy(F.month("o_orderdate").cast("int").alias("order_month"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            dec_sum("o_totalprice").alias("total_sales"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# A1/O1 — grouped SUM with descending sort on the aggregate
# (``DE_data_preparation.py:38-42``: SUM(profit_value) BY country).
# ---------------------------------------------------------------------------


@query(
    "profit_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)))
                AS DOUBLE) AS profit,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY profit DESC
    """,
)
def profit_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped profit sum + desc sort (ref ``DE_data_preparation.py:38-42``)."""
    li = load_table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            dec_sum(profit, scale=4).alias("profit"),
            F.count("*").alias("n_lines"),
        )
        .orderBy(F.desc("profit"))
    )


# ---------------------------------------------------------------------------
# A2 — exact COUNT(DISTINCT), global and grouped
# (``SQL_CLV_Insights.py:13``, ``DS:85,98``).
# ---------------------------------------------------------------------------


@query(
    "count_distinct_customers",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS n_customers FROM orders",
)
def count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact distinct-customer count (ref ``SQL_CLV_Insights.py:13``)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(F.countDistinct("o_custkey").alias("n_customers"))


@query(
    "count_distinct_customers_approx",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers_exact,
           TRUE AS approx_within_3pct
    FROM orders
    """,
)
def count_distinct_customers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2's 100 TB-scale variant: HyperLogLog++ sketch (rsd 1%).

    Exact COUNT(DISTINCT) expands to a two-phase agg whose shuffle carries
    every distinct key; the HLL sketch is constant-size per partition, so
    the shuffle is O(partitions) regardless of cardinality.

    The sketch estimate is engine-specific, so the value-checked emission
    is a bounded-error contract: exact and HLL counts computed in the same
    aggregation, the exact count emitted for hashing, and the sketch as
    the boolean ``|hll - exact| / exact <= 3%`` (3× the 1% rsd) that the
    oracle expects to be literal TRUE.
    """
    orders = load_table(spark, sf_dir, "orders")
    both = orders.agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("n_hll"),
    )
    return both.select(
        F.col("n_exact").alias("n_customers_exact"),
        (
            F.abs(F.col("n_hll") - F.col("n_exact")) / F.col("n_exact") <= F.lit(0.03)
        ).alias("approx_within_3pct"),
    )


@query(
    "customers_by_status",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY n_customers DESC, o_orderstatus
    """,
)
def customers_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact distinct count + desc sort (ref ``DS:97-102`` by-country)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("n_customers"), "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# A4/A5 — the RFM summary at the heart of the CLV pipeline
# (``DS_cust_lifetime_value.py:122-128`` and the GroupKey variant ``:428-435``).
# Reference semantics kept exactly: T = 51 - min(week), frequency = count-1.
# ---------------------------------------------------------------------------

RFM_ORACLE = """
    SELECT o_custkey AS customer_id,
           CAST(51 - MIN(weekofyear(o_orderdate)) AS INT) AS t,
           CAST(MAX(weekofyear(o_orderdate)) - MIN(weekofyear(o_orderdate)) AS INT)
               AS recency,
           COUNT(*) - 1 AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) / COUNT(o_totalprice)
               AS avg_profit
    FROM orders
    GROUP BY o_custkey
"""


@query("rfm_summary", oracle=RFM_ORACLE)
def rfm_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM-T aggregate (ref ``DS:122-128``).

    ``t = 51 - min(weekno)`` (hardcoded study window), ``frequency =
    count(*) - 1`` (repeat purchases) reproduce the reference exactly.
    """
    orders = load_table(spark, sf_dir, "orders")
    week = F.weekofyear("o_orderdate")
    return orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        (F.lit(51) - F.min(week)).cast("int").alias("t"),
        (F.max(week) - F.min(week)).cast("int").alias("recency"),
        (F.count("*") - 1).alias("frequency"),
        dec_avg("o_totalprice").alias("avg_profit"),
    )


@query(
    "rfm_summary_grouped",
    oracle="""
    SELECT o_custkey % 20 + 1 AS group_key,
           o_custkey AS customer_id,
           CAST(51 - MIN(weekofyear(o_orderdate)) AS INT) AS t,
           CAST(MAX(weekofyear(o_orderdate)) - MIN(weekofyear(o_orderdate)) AS INT)
               AS recency,
           COUNT(*) - 1 AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_profit
    FROM orders
    GROUP BY 1, 2
    """,
)
def rfm_summary_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + fan-out key for the grouped-map UDF (ref ``DS:428-435``).

    The reference's ``CustomerID % 1 + 1`` yields a single group (the bug noted
    at SURVEY §2.8 T3); the engine uses ``% 20 + 1`` — the intended "number
    1-20" fan-out (``DS:415``).
    """
    orders = load_table(spark, sf_dir, "orders")
    week = F.weekofyear("o_orderdate")
    return orders.groupBy(
        (F.col("o_custkey") % 20 + 1).alias("group_key"),
        F.col("o_custkey").alias("customer_id"),
    ).agg(
        (F.lit(51) - F.min(week)).cast("int").alias("t"),
        (F.max(week) - F.min(week)).cast("int").alias("recency"),
        (F.count("*") - 1).alias("frequency"),
        dec_sum("o_totalprice").alias("sum_profit"),
    )


# ---------------------------------------------------------------------------
# A6 — DISTINCT on a column pair (``DE_data_preparation.py:47``).
# ---------------------------------------------------------------------------


@query(
    "distinct_parts",
    oracle="SELECT DISTINCT p_brand, p_type FROM part",
)
def distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT Description, StockCode analogue (ref ``DE:47``)."""
    part = load_table(spark, sf_dir, "part")
    return part.select("p_brand", "p_type").distinct()


# ---------------------------------------------------------------------------
# A8 — Pearson correlation (Gamma-Gamma independence check, ``DS:287``).
# ---------------------------------------------------------------------------


@query(
    "corr_frequency_monetary",
    oracle=f"""
    SELECT ROUND(corr(frequency, avg_profit), 6) AS corr_freq_monetary
    FROM ({RFM_ORACLE})
    """,
)
def corr_frequency_monetary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr(FREQUENCY, AVG_MONETARY_VALUE) ≈ 0 check (ref ``DS:282-287``)."""
    rfm = rfm_summary(spark, sf_dir)
    return rfm.agg(F.round(F.corr("frequency", "avg_profit"), 6).alias("corr_freq_monetary"))


# ---------------------------------------------------------------------------
# P3 — predicate on a date extract (``DS:89``, ``SQL_CLV_Insights.py:39``).
# ---------------------------------------------------------------------------


@query(
    "orders_in_1995",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE year(o_orderdate) = 1995
    """,
)
def orders_in_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE year(invdate) = 2011 analogue (ref ``DS:89``).

    Expressed as a half-open date range (not ``F.year(col) == 1995``) so the
    predicate pushes into the parquet scan — see monthly_sales_1997.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


# ---------------------------------------------------------------------------
# P5/P6/P7 — cast-rename projection + synthetic row id
# (``DS_cust_lifetime_value.py:164-168``).
# ---------------------------------------------------------------------------


@query(
    "customer_recast",
    oracle="""
    SELECT CAST(c_custkey AS INT) AS customer_id,
           CAST(c_acctbal AS REAL) AS acct_balance,
           c_mktsegment AS segment,
           ROW_NUMBER() OVER (ORDER BY c_custkey) AS id
    FROM customer
    """,
)
def customer_recast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/rename/drop + row id (ref ``DS:164-168``).

    The reference uses ``monotonically_increasing_id()+1`` (partition-dependent);
    the oracle-checked form derives the id from a deterministic ordering.
    ``functions.exprs.row_id`` keeps the reference's cheap non-deterministic
    variant for pipeline use.
    """
    cust = load_table(spark, sf_dir, "customer")
    recast = cust.select(
        F.col("c_custkey").cast("int").alias("customer_id"),
        F.col("c_acctbal").cast("float").alias("acct_balance"),
        F.col("c_mktsegment").alias("segment"),
    )
    return global_row_number(recast, F.col("customer_id"), name="id")


# ---------------------------------------------------------------------------
# P8/A7 — CASE-banding + rollup over an inline subquery
# (``DS:373-383``, ``SQL_CLV_Insights.py:67-78``).
# ---------------------------------------------------------------------------

_PRICE_EDGES = [
    (0.0, 100_000.0, "0-100k"),
    (100_000.0, 200_000.0, "100k-200k"),
    (200_000.0, 350_000.0, "200k-350k"),
    (350_000.0, 1e18, "350k+"),
]

_PRICE_CASE_SQL = """
    CASE WHEN o_totalprice >= 0 AND o_totalprice < 100000 THEN '0-100k'
         WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN '100k-200k'
         WHEN o_totalprice >= 200000 AND o_totalprice < 350000 THEN '200k-350k'
         WHEN o_totalprice >= 350000 AND o_totalprice < 1e18 THEN '350k+'
         ELSE 'others' END
"""


@query(
    "order_value_buckets",
    oracle=f"""
    SELECT bucket, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_value
    FROM (SELECT o_totalprice, {_PRICE_CASE_SQL} AS bucket FROM orders)
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def order_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-band a numeric column, then COUNT/SUM per band over the derived
    subquery (ref ``DS:371-383``)."""
    orders = load_table(spark, sf_dir, "orders")
    banded = orders.select(
        "o_totalprice", case_bucket("o_totalprice", _PRICE_EDGES).alias("bucket")
    )
    return (
        banded.groupBy("bucket")
        .agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice").alias("total_value"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# O1/O3 — full sort on an aggregate; O4 — top-k.
# ---------------------------------------------------------------------------


@query(
    "customers_ranked_by_spend",
    oracle="""
    SELECT o_custkey AS customer_id,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_spend,
           ROW_NUMBER() OVER (
               ORDER BY SUM(CAST(o_totalprice AS DECIMAL(38,2))) DESC, o_custkey
           ) AS rank
    FROM orders
    GROUP BY o_custkey
    """,
)
def customers_ranked_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank every customer by total spend (ref ``DS:359-361`` PRED_CLV rank)."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        dec_sum("o_totalprice").alias("total_spend")
    )
    return global_row_number(
        spend, F.desc("total_spend"), F.asc("customer_id"), name="rank"
    )


@query(
    "top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k without a full sort — Spark plans TakeOrderedAndProject
    (ref pandas ``head`` top-k, ``DS:214,241``)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )
