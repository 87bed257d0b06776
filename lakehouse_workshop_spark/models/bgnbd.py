"""BG/NBD (Beta-Geometric / Negative-Binomial) purchase model.

Reimplements the model the reference fits through the ``lifetimes`` library
(``DS_cust_lifetime_value.py:192-264``, M1–M3 in SURVEY.md §2.7) from the
published Fader/Hardie formulas ("Counting Your Customers the Easy Way: An
Alternative to the Pareto/NBD Model", Marketing Science 2005, and the
companion note linked at ``DS_cust_lifetime_value.py:187``).

Inputs per customer: ``frequency`` x (repeat purchases), ``recency`` t_x
(time of last repeat purchase), ``T`` (age). All math is vectorized numpy —
inside ``applyInPandas`` this scores whole Arrow batches at once.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lakehouse_workshop_spark.models.special import hyp2f1, lgamma, nelder_mead


def _neg_log_likelihood(
    log_params: np.ndarray, x: np.ndarray, t_x: np.ndarray, T: np.ndarray, penalizer: float
) -> float:
    r, alpha, a, b = np.exp(np.clip(log_params, -15.0, 15.0))
    # x is small-integer frequency: compress to unique values so the three
    # data-dependent lgamma evaluations run over ~20 points, not the whole
    # group (bit-identical — same values, indexed back).
    ux, inv = np.unique(x, return_inverse=True)
    a1 = lgamma(r + ux)[inv] - lgamma(r) + r * np.log(alpha)
    a2 = lgamma(a + b) + lgamma(b + ux)[inv] - lgamma(b) - lgamma(a + b + ux)[inv]
    a3 = -(r + x) * np.log(alpha + T)
    with np.errstate(divide="ignore", invalid="ignore"):
        a4 = np.where(
            x > 0,
            np.log(a) - np.log(np.where(x > 0, b + x - 1.0, 1.0)) - (r + x) * np.log(alpha + t_x),
            -np.inf,
        )
    ll = a1 + a2 + np.logaddexp(a3, a4)
    penalty = penalizer * np.sum(np.exp(np.clip(log_params, -15.0, 15.0)) ** 2)
    return -np.mean(ll) + penalty


@dataclass
class BetaGeoModel:
    """Fitted BG/NBD parameters (r, alpha, a, b)."""

    r: float
    alpha: float
    a: float
    b: float

    @classmethod
    def fit(
        cls,
        frequency: np.ndarray,
        recency: np.ndarray,
        T: np.ndarray,
        *,
        penalizer_coef: float = 0.0001,
    ) -> "BetaGeoModel":
        """MLE fit (ref ``DS:192-193`` with ``penalizer_coef=0.0001``)."""
        x = np.asarray(frequency, float)
        t_x = np.asarray(recency, float)
        T = np.asarray(T, float)

        def obj(theta: np.ndarray) -> float:
            v = _neg_log_likelihood(theta, x, t_x, T, penalizer_coef)
            return v if np.isfinite(v) else 1e12

        best, best_f = None, np.inf
        # Deterministic multi-start: MLE surface has flat valleys.
        for start in ([0.1] * 4, [1.0] * 4, [0.5, 2.0, 0.5, 2.0]):
            theta, f = nelder_mead(obj, np.log(np.asarray(start)))
            if f < best_f:
                best, best_f = theta, f
        r, alpha, a, b = np.exp(best)
        return cls(r=float(r), alpha=float(alpha), a=float(a), b=float(b))

    # M2 — conditional expected purchases over the next ``t`` periods
    # (ref ``DS:204,238,473``: t=52.08 weeks).
    def conditional_expected_purchases(
        self, t: float, frequency: np.ndarray, recency: np.ndarray, T: np.ndarray
    ) -> np.ndarray:
        r, alpha, a, b = self.r, self.alpha, self.a, self.b
        x = np.asarray(frequency, float)
        t_x = np.asarray(recency, float)
        T = np.asarray(T, float)
        z = t / (alpha + T + t)
        hyp = hyp2f1(r + x, b + x, a + b + x - 1.0, z)
        numer = (
            (a + b + x - 1.0)
            / (a - 1.0)
            * (1.0 - np.power((alpha + T) / (alpha + T + t), r + x) * hyp)
        )
        denom = 1.0 + (x > 0) * (a / (b + x - 1.0)) * np.power(
            (alpha + T) / (alpha + t_x), r + x
        )
        return numer / denom

    # M3 — P(alive | x, t_x, T) (ref ``DS:240``).
    def conditional_probability_alive(
        self, frequency: np.ndarray, recency: np.ndarray, T: np.ndarray
    ) -> np.ndarray:
        r, alpha, a, b = self.r, self.alpha, self.a, self.b
        x = np.asarray(frequency, float)
        t_x = np.asarray(recency, float)
        T = np.asarray(T, float)
        odds = (x > 0) * (a / (b + x - 1.0)) * np.power((alpha + T) / (alpha + t_x), r + x)
        return 1.0 / (1.0 + odds)

    # M3 horizon variant — P(alive at age T+t given no further purchases)
    # (engine's reading of the reference's PROB_ALIVE_t at t=10, ``DS:253``).
    def probability_alive_at_horizon(
        self, t: float, frequency: np.ndarray, recency: np.ndarray, T: np.ndarray
    ) -> np.ndarray:
        return self.conditional_probability_alive(
            frequency, recency, np.asarray(T, float) + float(t)
        )

    # M5 — discounted CLV over ``time`` months at monthly ``discount_rate``
    # (ref ``DS:305-314,480-489``: freq='W', time=12, rate 0.0056/0.01).
    # Mirrors the lifetimes DCF: monthly increments of expected purchases,
    # each month's revenue = monetary * increment, discounted by month index.
    def customer_lifetime_value(
        self,
        frequency: np.ndarray,
        recency: np.ndarray,
        T: np.ndarray,
        monetary_value: np.ndarray,
        *,
        time: int = 12,
        discount_rate: float = 0.01,
        weeks_per_month: float = 4.345,
    ) -> np.ndarray:
        x = np.asarray(frequency, float)
        clv = np.zeros_like(x)
        prev = np.zeros_like(x)
        m = np.asarray(monetary_value, float)
        for month in range(1, int(time) + 1):
            horizon = month * weeks_per_month
            cum = self.conditional_expected_purchases(horizon, frequency, recency, T)
            clv = clv + m * (cum - prev) / (1.0 + discount_rate) ** month
            prev = cum
        return clv
