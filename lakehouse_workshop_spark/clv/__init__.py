from lakehouse_workshop_spark.clv.pipeline import (
    LTV_RESULT_SCHEMA,
    clv_score_group,
    distributed_clv,
    driver_clv,
    rfm_from_orders,
)

__all__ = [
    "LTV_RESULT_SCHEMA",
    "clv_score_group",
    "distributed_clv",
    "driver_clv",
    "rfm_from_orders",
]
