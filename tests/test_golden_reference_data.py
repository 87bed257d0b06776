"""Golden test on the reference's own shipped data.

``/root/reference/_data/Summary_2011.csv`` (2,945 real rows, one null
CustomerID) is the exact table the reference workshop fit with ``lifetimes``
(``DS_cust_lifetime_value.py:192-331``). Pinning the fitted parameters and
spot CLV scores on this data is the only guard against silent numeric drift
in the model implementations — synthetic fixtures can't catch a divergence
from the numbers the reference actually produced.

Pinned values were computed by this repo's models (numpy mirror of the
Fader/Hardie likelihoods, multi-start Nelder-Mead) and sanity-checked
against the lifetimes closed forms in ``tests/test_models.py``; tolerance
bands absorb optimizer-level noise, not model changes.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from lakehouse_workshop_spark.clv import pipeline as P
from lakehouse_workshop_spark.clv import workshop
from lakehouse_workshop_spark.clv.pipeline import LTV_RESULT_SCHEMA
from lakehouse_workshop_spark.models import BetaGeoModel, GammaGammaModel
from lakehouse_workshop_spark import catalog as cat

REF_CSV = "/root/reference/_data/Summary_2011.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CSV), reason="reference data not present"
)


@pytest.fixture(scope="module")
def summary_pdf() -> pd.DataFrame:
    return pd.read_csv(REF_CSV)


def test_shipped_csv_shape(summary_pdf):
    assert len(summary_pdf) == 2945
    assert list(summary_pdf.columns) == [
        "CustomerID", "T1", "recency1", "FREQUENCY", "profit",
    ]
    # exactly one null CustomerID row (kept by the reference — model inputs
    # are complete)
    assert int(summary_pdf["CustomerID"].isna().sum()) == 1
    assert not summary_pdf[["T1", "recency1", "FREQUENCY", "profit"]].isna().any().any()


def test_bgnbd_params_pinned_on_reference_data(summary_pdf):
    """BG/NBD MLE on the full 2,945-customer table (ref ``DS:192-193``)."""
    x = summary_pdf["FREQUENCY"].to_numpy(float)
    t_x = summary_pdf["recency1"].to_numpy(float)
    T = summary_pdf["T1"].to_numpy(float)
    bgf = BetaGeoModel.fit(x, t_x, T, penalizer_coef=P.BGNBD_PENALIZER)
    assert bgf.r == pytest.approx(2.08796, rel=1e-3)
    assert bgf.alpha == pytest.approx(15.02317, rel=1e-3)
    assert bgf.a == pytest.approx(0.0080077, rel=5e-3)
    assert bgf.b == pytest.approx(0.0922409, rel=5e-3)


def test_gammagamma_params_pinned_on_reference_data(summary_pdf):
    """Gamma-Gamma MLE on repeat customers (ref ``DS:476-478``, penalizer
    0.01 as in the distributed UDF)."""
    rep = summary_pdf["FREQUENCY"] > 1
    ggf = GammaGammaModel.fit(
        summary_pdf.loc[rep, "FREQUENCY"].to_numpy(float),
        summary_pdf.loc[rep, "profit"].to_numpy(float),
        penalizer_coef=P.GG_PENALIZER,
    )
    assert ggf.p == pytest.approx(2.51203, rel=1e-3)
    assert ggf.q == pytest.approx(1.53092, rel=1e-3)
    assert ggf.v == pytest.approx(2.22837, rel=1e-3)


def test_clv_spot_values_pinned_on_reference_data(summary_pdf):
    """Score every customer through the shared UDF body (single group — the
    reference's driver path fit the whole table, ``DS:192-331``) and pin
    spot values + the portfolio total."""
    inp = pd.DataFrame(
        {
            "GroupKey": np.ones(len(summary_pdf), dtype="int32"),
            "CustomerID": summary_pdf["CustomerID"].fillna(-1).astype("int32"),
            "FREQUENCY": summary_pdf["FREQUENCY"].astype("int64"),
            "RECENCY": summary_pdf["recency1"].to_numpy("float32"),
            "AGE": summary_pdf["T1"].to_numpy("float32"),
            "AVG_MONETARY_VALUE": summary_pdf["profit"].to_numpy("float32"),
        }
    )
    out = P.clv_score_group(inp).set_index("CustomerID")
    assert len(out) == 2945

    # (CustomerID, PRED_VISITS, PROB_ALIVE, PROB_ALIVE_t, PRED_CLV) — the
    # first two rows of the CSV plus two mid-table customers.
    pinned = {
        13261: (0.6165, 0.228084, 0.154144, 13.60),
        12471: (24.4437, 0.999542, 0.964565, 225.98),
        12347: (5.8186, 0.997243, 0.992208, 33.37),
        18287: (4.4204, 0.982827, 0.962991, 28.81),
    }
    for cid, (visits, alive, alive_t, clv) in pinned.items():
        row = out.loc[cid]
        assert float(row.PRED_VISITS) == pytest.approx(visits, rel=1e-3)
        assert float(row.PROB_ALIVE) == pytest.approx(alive, rel=1e-3)
        assert float(row.PROB_ALIVE_t) == pytest.approx(alive_t, rel=1e-3)
        assert float(row.PRED_CLV) == pytest.approx(clv, rel=2e-3)

    assert float(out.PRED_CLV.sum()) == pytest.approx(200_300.7, rel=1e-3)
    assert int((out.PRED_CLV < 0).sum()) == 0
    assert int(out.PRED_CLV.isna().sum()) == 0


def test_workshop_end_to_end_on_reference_data(spark):
    """DE → DS → SQL on the actual shipped CSV (distributed, 20 groups)."""
    dashboard = workshop.run_workshop(spark, REF_CSV, n_groups=20)
    try:
        ltv = cat.catalog_scan(spark, "customer_info.ltv_results")
        assert ltv.schema == LTV_RESULT_SCHEMA
        assert ltv.count() == 2945
        pdf = ltv.toPandas()
        assert pdf["PROB_ALIVE"].dropna().between(0, 1).all()
        bands = dashboard.toPandas()
        assert int(bands["n_customers"].sum()) == 2945
    finally:
        cat.drop_table(spark, "customer_info.ltv_results")
        cat.drop_table(spark, "customer_info.summary_2011")


def test_cond_exp_avg_profit_pinned_on_reference_data(summary_pdf):
    """M6 driver-path parity: the reference additionally emits
    COND_EXP_AVG_PROFT (``DS:316-325``); behind the flag the UDF body
    appends it to the golden schema. Pin spot values + portfolio total."""
    inp = pd.DataFrame(
        {
            "GroupKey": np.ones(len(summary_pdf), dtype="int32"),
            "CustomerID": summary_pdf["CustomerID"].fillna(-1).astype("int32"),
            "FREQUENCY": summary_pdf["FREQUENCY"].astype("int64"),
            "RECENCY": summary_pdf["recency1"].to_numpy("float32"),
            "AGE": summary_pdf["T1"].to_numpy("float32"),
            "AVG_MONETARY_VALUE": summary_pdf["profit"].to_numpy("float32"),
        }
    )
    out = P.clv_score_group(inp, include_cond_exp_avg_profit=True).set_index(
        "CustomerID"
    )
    assert list(out.columns)[-1] == "COND_EXP_AVG_PROFT"
    pinned = {13261: 23.493, 12471: 9.8451, 12347: 6.1075, 18287: 6.9407}
    for cid, v in pinned.items():
        assert float(out.loc[cid].COND_EXP_AVG_PROFT) == pytest.approx(v, rel=1e-3)
    assert float(out.COND_EXP_AVG_PROFT.sum()) == pytest.approx(41_404.1, rel=1e-3)
    # default body output is unchanged (golden schema, no extra column)
    assert "COND_EXP_AVG_PROFT" not in P.clv_score_group(inp).columns


def test_distributed_clv_profit_flag(spark):
    df = P.distributed_clv(
        spark, "/root/testdata/sf0.001", include_cond_exp_avg_profit=True
    )
    assert df.schema == P.LTV_RESULT_SCHEMA_WITH_PROFIT
    pdf = df.toPandas()
    assert pdf["COND_EXP_AVG_PROFT"].notna().all()
    # repeat customers' expected profit stays within sane bounds of the
    # observed monetary value
    assert (pdf["COND_EXP_AVG_PROFT"] > 0).all()
