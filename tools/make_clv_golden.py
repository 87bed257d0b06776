"""Regenerate the CLV golden parquet fixture (the clv_distributed oracle).

The fit is deterministic (fixed penalizers, multi-start Nelder-Mead, no
RNG, within-group sort in ``clv_score_group``), so the rounded scored
output is a stable artifact: materialize it once, and the driver's DuckDB
oracle reads it back while Spark recomputes it live.

The fixture is the UNION of the scored outputs at sf0.001, sf0.01 and
sf0.1, each tagged with that sf's ``customer`` row count (``sf_tag``). The
oracle SQL filters ``sf_tag = (SELECT COUNT(*) FROM customer)`` against
the pre-registered views, so one static SQL string serves both the local
parity pytest (sf0.001) and the driver (sf0.01).

Run from the repo root after any intentional model/pipeline change:

    python tools/make_clv_golden.py

then re-run ``pytest tests/test_clv.py`` to confirm the pin.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    # r10: the full-parity sweep now runs at sf0.1 too — tagging the
    # fixture with its subset as well makes the CLV pair green at every
    # SF the sweep visits (the tag mechanism already adapts).
    "/root/testdata/sf0.1",
)


def main() -> None:
    from lakehouse_workshop_spark import get_spark
    from lakehouse_workshop_spark.operators.clv_queries import (
        CLV_GOLDEN_PATH,
        clv_scored_rounded,
    )

    spark = get_spark(app_name="make-clv-golden")
    parts = []
    for sf_dir in SF_DIRS:
        n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
        pdf = clv_scored_rounded(spark, sf_dir).toPandas()
        pdf = pdf.sort_values(["GroupKey", "CustomerID"]).reset_index(drop=True)
        pdf.insert(0, "sf_tag", pd.Series([n_cust] * len(pdf), dtype="int64"))
        print(f"{sf_dir}: {len(pdf)} rows, sf_tag={n_cust}")
        parts.append(pdf)
    out = pd.concat(parts, ignore_index=True)
    CLV_GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
    out.to_parquet(CLV_GOLDEN_PATH, index=False)
    print(f"wrote {len(out)} rows -> {CLV_GOLDEN_PATH}")
    print(out.dtypes)
    spark.stop()


if __name__ == "__main__":
    main()
