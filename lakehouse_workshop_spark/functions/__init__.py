from lakehouse_workshop_spark.functions.exprs import (
    dec_sum,
    dec_avg,
    case_bucket,
    row_id,
)

__all__ = ["dec_sum", "dec_avg", "case_bucket", "row_id"]
