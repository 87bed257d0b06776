"""Vectorized special functions + derivative-free optimizer in pure numpy.

scipy is not available in this image, so the pieces the CLV models need are
implemented from their published forms:

- ``lgamma``: Lanczos approximation (g=7, n=9 — the classic Numerical-Recipes
  coefficient set), abs error ~1e-13 over the positive reals.
- ``hyp2f1``: Gauss hypergeometric series for 0 <= z < 1 (the only region the
  BG/NBD conditional-expectation formula visits: z = t/(alpha+T+t)), with the
  Euler transformation applied when z > 0.9 for convergence.
- ``nelder_mead``: standard simplex optimizer (what ``lifetimes`` uses via
  scipy) — enough for 3-4 parameter MLE fits.
"""

from __future__ import annotations

import numpy as np

_LANCZOS_G = 7.0
_LANCZOS_C = np.array(
    [
        0.99999999999980993,
        676.5203681218851,
        -1259.1392167224028,
        771.32342877765313,
        -176.61502916214059,
        12.507343278686905,
        -0.13857109526572012,
        9.9843695780195716e-6,
        1.5056327351493116e-7,
    ]
)
_HALF_LOG_2PI = 0.5 * np.log(2.0 * np.pi)


def lgamma(x: np.ndarray | float) -> np.ndarray:
    """log Γ(x) for x > 0, vectorized (Lanczos, g=7)."""
    x = np.asarray(x, dtype=np.float64)
    z = x - 1.0
    acc = np.full_like(z, _LANCZOS_C[0])
    for i in range(1, 9):
        acc = acc + _LANCZOS_C[i] / (z + i)
    t = z + _LANCZOS_G + 0.5
    return _HALF_LOG_2PI + (z + 0.5) * np.log(t) - t + np.log(acc)


def hyp2f1(a: float | np.ndarray, b: float | np.ndarray, c: float | np.ndarray, z: np.ndarray) -> np.ndarray:
    """Gauss 2F1(a, b; c; z) for 0 <= z < 1, vectorized over all args."""
    a, b, c, z = np.broadcast_arrays(
        np.asarray(a, float), np.asarray(b, float), np.asarray(c, float), np.asarray(z, float)
    )
    a, b, c, z = a.copy(), b.copy(), c.copy(), z.copy()
    # Euler transform where z is close to 1: 2F1(a,b;c;z) =
    # (1-z)^(c-a-b) 2F1(c-a, c-b; c; z).
    hard = z > 0.9
    prefac = np.ones_like(z)
    if hard.any():
        prefac = np.where(hard, np.power(1.0 - z, c - a - b), 1.0)
        a = np.where(hard, c - a, a)
        b = np.where(hard, c - b, b)
    term = np.ones_like(z)
    total = np.ones_like(z)
    for k in range(5000):
        term = term * (a + k) * (b + k) / ((c + k) * (k + 1.0)) * z
        total = total + term
        if np.all(np.abs(term) < 1e-13 * np.maximum(np.abs(total), 1e-300)):
            break
    return prefac * total


def nelder_mead(
    fn,
    x0: np.ndarray,
    *,
    max_iter: int = 2000,
    xatol: float = 1e-7,
    fatol: float = 1e-9,
) -> tuple[np.ndarray, float]:
    """Minimize ``fn`` from ``x0`` with the Nelder-Mead simplex method."""
    n = len(x0)
    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5
    simplex = [np.asarray(x0, float)]
    for i in range(n):
        p = np.asarray(x0, float).copy()
        p[i] = p[i] + (0.05 if p[i] != 0 else 0.00025)
        simplex.append(p)
    fvals = [fn(p) for p in simplex]

    for _ in range(max_iter):
        order = np.argsort(fvals)
        simplex = [simplex[i] for i in order]
        fvals = [fvals[i] for i in order]
        if (
            max(np.max(np.abs(simplex[0] - s)) for s in simplex[1:]) < xatol
            and abs(fvals[-1] - fvals[0]) < fatol
        ):
            break
        centroid = np.mean(simplex[:-1], axis=0)
        xr = centroid + alpha * (centroid - simplex[-1])
        fr = fn(xr)
        if fvals[0] <= fr < fvals[-2]:
            simplex[-1], fvals[-1] = xr, fr
        elif fr < fvals[0]:
            xe = centroid + gamma * (xr - centroid)
            fe = fn(xe)
            if fe < fr:
                simplex[-1], fvals[-1] = xe, fe
            else:
                simplex[-1], fvals[-1] = xr, fr
        else:
            xc = centroid + rho * (simplex[-1] - centroid)
            fc = fn(xc)
            if fc < fvals[-1]:
                simplex[-1], fvals[-1] = xc, fc
            else:
                best = simplex[0]
                simplex = [best] + [best + sigma * (s - best) for s in simplex[1:]]
                fvals = [fvals[0]] + [fn(s) for s in simplex[1:]]
    order = np.argsort(fvals)
    return simplex[order[0]], fvals[order[0]]
