"""Golden-pipeline tests for the distributed CLV layer (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lakehouse_workshop_spark.clv.pipeline import (
    LTV_RESULT_SCHEMA,
    clv_score_group,
    distributed_clv,
    rfm_from_orders,
)


def test_golden_schema(spark, sf_dir):
    """Output schema equals the reference StructType (DS:444-454) exactly."""
    out = distributed_clv(spark, sf_dir)
    assert out.schema == LTV_RESULT_SCHEMA


def test_distributed_scores_every_customer(spark, sf_dir):
    rfm = rfm_from_orders(spark, sf_dir)
    out = distributed_clv(spark, sf_dir).cache()
    assert out.count() == rfm.count()
    stats = out.agg(
        F.min("PROB_ALIVE"), F.max("PROB_ALIVE"), F.min("PRED_VISITS"), F.min("PRED_CLV")
    ).collect()[0]
    assert 0.0 <= stats[0] and stats[1] <= 1.0
    assert stats[2] >= 0.0 and stats[3] >= 0.0
    out.unpersist()


def test_udf_body_standalone(spark, sf_dir):
    """U2: the grouped-map body runs on a local pandas sample (DS:498-503)."""
    sample = rfm_from_orders(spark, sf_dir, n_groups=1).toPandas()
    scored = clv_score_group(sample)
    assert len(scored) == len(sample)
    assert list(scored.columns) == [f.name for f in LTV_RESULT_SCHEMA.fields]
    assert np.isfinite(scored["PRED_CLV"].to_numpy()).all()


def test_fanout_partitions_cover_customers(spark, sf_dir):
    """T3 fix: GroupKey fan-out is a partition of the customer set."""
    rfm = rfm_from_orders(spark, sf_dir, n_groups=20)
    per_group = rfm.groupBy("GroupKey").count()
    assert per_group.count() == 20
    total = per_group.agg(F.sum("count")).collect()[0][0]
    assert total == rfm.count()


def test_clv_golden_fixture_reproduces(spark, sf_dir):
    """The golden parquet fixture (the clv_distributed DuckDB oracle) must
    be exactly reproducible by the live pipeline: deterministic fit
    (fixed penalizers, multi-start NM, no RNG, within-group sort in
    ``clv_score_group``) + 6-dp rounding. Drift here fails pytest before
    the driver's correctness pass ever compares against a stale fixture.

    Regenerate intentionally with ``python tools/make_clv_golden.py``.
    """
    import pandas as pd

    from lakehouse_workshop_spark.operators.clv_queries import (
        CLV_GOLDEN_PATH,
        clv_scored_rounded,
    )

    assert CLV_GOLDEN_PATH.exists(), "run tools/make_clv_golden.py"
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    golden = pd.read_parquet(CLV_GOLDEN_PATH)
    golden = (
        golden[golden["sf_tag"] == n_cust]
        .drop(columns=["sf_tag"])
        .sort_values(["GroupKey", "CustomerID"])
        .reset_index(drop=True)
    )
    assert len(golden) > 0, f"fixture has no subset for sf_tag={n_cust}"
    live = (
        clv_scored_rounded(spark, sf_dir)
        .toPandas()
        .sort_values(["GroupKey", "CustomerID"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(live, golden, check_exact=True)


def test_driver_and_distributed_agree_single_group(spark, sf_dir):
    """Entry-point-3a (collect-fit) and 3b (grouped-map) must agree: same
    math, same penalizers — tolerance covers float-order effects of the
    differing row order seen by the fitters."""
    from lakehouse_workshop_spark.clv.pipeline import driver_clv

    a = (
        driver_clv(spark, sf_dir)
        .toPandas()
        .sort_values("CustomerID")
        .reset_index(drop=True)
    )
    b = (
        distributed_clv(spark, sf_dir, n_groups=1)
        .toPandas()
        .sort_values("CustomerID")
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert (a["CustomerID"] == b["CustomerID"]).all()
    for col in ["PRED_VISITS", "PROB_ALIVE", "PROB_ALIVE_t", "PRED_CLV"]:
        assert np.allclose(a[col], b[col], rtol=1e-3, atol=1e-4), col


def test_clv_temporal_holdout_validation_harness(spark, sf_dir):
    """End-to-end run of the reference's documented 70/30 temporal
    validation (DS:512-513): fit BG/NBD on the train-window RFM and score
    against actual holdout orders. The synthetic corpus is memoryless
    (per-customer order counts are uniform, so holdout actuals are flat
    across predicted deciles) — model SKILL is pinned by the golden fits
    in test_models.py; this test pins the harness: the split table's
    invariants, a deterministic fit on it, and finite positive scores.
    """
    import numpy as np

    from lakehouse_workshop_spark.clv.pipeline import BGNBD_PENALIZER
    from lakehouse_workshop_spark.models.bgnbd import BetaGeoModel
    from lakehouse_workshop_spark.operators import all_queries

    pdf = all_queries()["clv_temporal_holdout"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["frequency"] >= 0).all()
    assert (pdf["holdout_orders"] >= 0).all()
    assert (pdf["recency"] <= pdf["age"] + 51).all()  # weekofyear domain
    assert pdf["customer_id"].is_unique

    x = pdf["frequency"].to_numpy(float)
    t_x = pdf["recency"].to_numpy(float)
    T = pdf["age"].to_numpy(float)
    fit1 = BetaGeoModel.fit(x, t_x, T, penalizer_coef=BGNBD_PENALIZER)
    fit2 = BetaGeoModel.fit(x, t_x, T, penalizer_coef=BGNBD_PENALIZER)
    assert (fit1.r, fit1.alpha, fit1.a, fit1.b) == (
        fit2.r,
        fit2.alpha,
        fit2.a,
        fit2.b,
    )  # deterministic, no RNG
    pred = fit1.conditional_expected_purchases(100.0, x, t_x, T)
    assert np.isfinite(pred).all() and (pred >= 0).all()
    # Predicted visits must not be degenerate (constant) — the fit used
    # the covariates.
    assert np.std(pred) > 0
