"""Numerics tests: special functions + BG/NBD / Gamma-Gamma fits (M1–M6)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lakehouse_workshop_spark.models import BetaGeoModel, GammaGammaModel
from lakehouse_workshop_spark.models.special import hyp2f1, lgamma, nelder_mead


def test_lgamma_matches_stdlib():
    xs = [0.05, 0.5, 1.0, 1.5, 7.3, 100.0, 1e4]
    for x in xs:
        assert abs(float(lgamma(x)) - math.lgamma(x)) < 1e-10 * max(1, abs(math.lgamma(x)))


def test_hyp2f1_closed_form():
    # 2F1(1,1;2;z) = -ln(1-z)/z
    for z in [0.05, 0.3, 0.6, 0.9, 0.97]:
        got = float(hyp2f1(1.0, 1.0, 2.0, np.array([z])))
        want = -math.log(1 - z) / z
        assert abs(got - want) < 1e-9 * abs(want)


def test_nelder_mead_rosenbrock():
    fn = lambda p: (1 - p[0]) ** 2 + 100 * (p[1] - p[0] ** 2) ** 2
    x, fval = nelder_mead(fn, np.array([-1.2, 1.0]), max_iter=5000)
    assert np.allclose(x, [1.0, 1.0], atol=1e-3)


def _simulate_bgnbd(rng, n, r, alpha, a, b, T=52.0):
    lam = rng.gamma(r, 1 / alpha, n)
    pdrop = rng.beta(a, b, n)
    xs, txs = [], []
    for i in range(n):
        t, x, tx = 0.0, 0, 0.0
        while True:
            t += rng.exponential(1 / lam[i]) if lam[i] > 0 else 1e12
            if t > T:
                break
            x += 1
            tx = t
            if rng.random() < pdrop[i]:
                break
        xs.append(x)
        txs.append(tx)
    return np.array(xs, float), np.array(txs), np.full(n, T)


def test_bgnbd_parameter_recovery():
    rng = np.random.default_rng(7)
    x, t_x, T = _simulate_bgnbd(rng, 4000, r=0.25, alpha=4.0, a=0.8, b=2.4)
    mdl = BetaGeoModel.fit(x, t_x, T)
    assert mdl.r == pytest.approx(0.25, rel=0.35)
    assert mdl.alpha == pytest.approx(4.0, rel=0.35)
    # predictions behave: more recent + frequent -> more predicted visits
    hi = mdl.conditional_expected_purchases(52.0, np.array([10.0]), np.array([50.0]), np.array([52.0]))
    lo = mdl.conditional_expected_purchases(52.0, np.array([1.0]), np.array([5.0]), np.array([52.0]))
    assert hi[0] > lo[0]
    p = mdl.conditional_probability_alive(x, t_x, T)
    assert np.all((p >= 0) & (p <= 1))
    # never-repeat customers are alive with probability 1 under BG/NBD
    assert np.allclose(p[x == 0], 1.0)


def test_bgnbd_clv_positive_and_discounted():
    rng = np.random.default_rng(11)
    x, t_x, T = _simulate_bgnbd(rng, 1500, r=0.5, alpha=5.0, a=1.0, b=3.0)
    mdl = BetaGeoModel.fit(x, t_x, T)
    m = np.full_like(x, 100.0)
    clv_lo_rate = mdl.customer_lifetime_value(x, t_x, T, m, discount_rate=0.0056)
    clv_hi_rate = mdl.customer_lifetime_value(x, t_x, T, m, discount_rate=0.01)
    assert np.all(clv_lo_rate >= 0)
    assert np.all(clv_lo_rate >= clv_hi_rate)  # heavier discounting lowers CLV


def test_gammagamma_population_mean_recovery():
    rng = np.random.default_rng(13)
    p, q, v = 6.0, 4.0, 15.0
    x = rng.integers(1, 20, 3000).astype(float)
    nu = rng.gamma(q, 1 / v, 3000)
    m = np.array([rng.gamma(p * xi, 1 / nui) / xi for xi, nui in zip(x, nu)])
    gg = GammaGammaModel.fit(x, m)
    # (p, v) are weakly identified; the economically meaningful functional
    # p*v/(q-1) (population mean spend) must recover.
    assert gg.p * gg.v / (gg.q - 1) == pytest.approx(p * v / (q - 1), rel=0.1)
    cond = gg.conditional_expected_average_profit(x, m)
    assert np.all(cond > 0)
    # shrinkage: conditional estimate sits between observed and population mean
    pop = gg.p * gg.v / (gg.q - 1)
    between = ((cond >= np.minimum(m, pop) - 1e-6) & (cond <= np.maximum(m, pop) + 1e-6)).mean()
    assert between > 0.99
