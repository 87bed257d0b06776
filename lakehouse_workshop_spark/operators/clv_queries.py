"""CLV operator queries (SURVEY.md §2.6–2.7, M1–M6 / U1–U2).

``clv_rfm_input`` is SQL-expressible and oracle-checked. The model-fitting
queries are iterative MLE — genuinely non-SQL-expressible, so they are
declared without oracles (the driver records rows-only checks, as the
contract allows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_workshop_spark.clv.pipeline import distributed_clv, rfm_from_orders
from lakehouse_workshop_spark.operators import query


@query(
    "clv_rfm_input",
    oracle="""
    SELECT CAST(o_custkey % 20 + 1 AS INT) AS group_key,
           CAST(o_custkey AS INT) AS customer_id,
           COUNT(*) - 1 AS frequency,
           CAST(MAX(weekofyear(o_orderdate)) - MIN(weekofyear(o_orderdate)) AS REAL)
               AS recency,
           CAST(51 - MIN(weekofyear(o_orderdate)) AS REAL) AS age,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                / COUNT(o_totalprice) AS REAL) AS avg_monetary_value
    FROM orders
    GROUP BY 1, 2
    """,
)
def clv_rfm_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed pipeline's input aggregate (ref ``DS:428-435``).

    Lowercase aliases for the oracle gate; the pipeline itself keeps the
    reference's golden mixed-case schema (``DS:444-454``).
    """
    df = rfm_from_orders(spark, sf_dir)
    return df.select(
        df["GroupKey"].alias("group_key"),
        df["CustomerID"].alias("customer_id"),
        df["FREQUENCY"].alias("frequency"),
        df["RECENCY"].alias("recency"),
        df["AGE"].alias("age"),
        df["AVG_MONETARY_VALUE"].alias("avg_monetary_value"),
    )


@query("clv_distributed")
def clv_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full distributed CLV: per-group BG/NBD + Gamma-Gamma fit and score via
    ``applyInPandas`` (ref ``DS:462-494``). Rows-only check: iterative MLE."""
    return distributed_clv(spark, sf_dir)


@query("clv_segment_rollup")
def clv_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation rollup over the scored output (ref ``DS:387-398``):
    band PRED_CLV, count + sum per band. Rows-only (depends on fitted model)."""
    scored = distributed_clv(spark, sf_dir)
    bucket = (
        F.when(F.col("PRED_CLV") < 1000, "low")
        .when(F.col("PRED_CLV") < 10000, "mid")
        .when(F.col("PRED_CLV") < 100000, "high")
        .otherwise("whale")
    )
    return (
        scored.groupBy(bucket.alias("clv_band"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("PRED_CLV").cast("double").alias("total_pred_clv"),
        )
        .orderBy("clv_band")
    )
