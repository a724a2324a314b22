"""K12 long-term-mean phenology — scipy/R-free smoothing-spline seasonality.

Re-implements, from the published algorithm description (Melaas, Friedl &
Zhu 2013, "Detecting interannual variation in deciduous broadleaf forest
phenology using Landsat TM/ETM+ data", Remote Sens. Environ. 132:176-185)
and the public behavior of the reference's
`yatsm/phenology/longtermmean.py::LongTermMeanPhenology` [U], the one
reference capability previous rounds ruled out for a missing dependency:
upstream calls R's ``smooth.spline`` through rpy2 (absent in this sandbox,
like scipy).  The numerics here are our own: a natural cubic smoothing
spline in the Reinsch (1967) / Green & Silverman (1994, ch. 2-3) banded
formulation with GCV-selected smoothing — ``smooth.spline``'s published
algorithm — in ~80 lines of numpy, the same dependency-free route as
K9's own incomplete-beta F CDF.

Semantics (per url series, recast from per-pixel EVI to a crawl metric):

  1. POOL all years' observations by day-of-year ("long-term mean":
     interannual variation is averaged out; upstream pools EVI the same
     way before fitting).
  2. FIT a natural cubic smoothing spline to the per-DOY mean profile,
     weighted by per-DOY observation counts, smoothing chosen by
     generalized cross-validation over a fixed log-spaced grid
     (deterministic — no optimizer state).
  3. EXTRACT the reference's pheno record fields: peak/trough DOY and
     value, HALF-MAX transition days — the last upward crossing of
     (peak+trough)/2 before the peak ("spring"/green-up) and the first
     downward crossing after it ("autumn"/brown-down), crossings located
     on the dense integer-DOY evaluation of the spline — plus
     ``pheno_cor``, the count-weighted Pearson correlation between the
     fitted curve and the observed per-DOY means (upstream: correlation
     of spline prediction vs observations).

Differences vs upstream, documented: DOY is treated linearly (upstream
likewise fits over 1..365 without circular wraparound); years with
missing seasons simply contribute fewer DOYs; there is no EVI-specific
snow/ice screen (series_clean covers masking for crawl metrics).

Scale notes (100 TB design): the heavy reduction — per-(url, doy) counts
and sums over the raw table — happens in Spark as ONE map-side-combinable
aggregate, so the Arrow/Python stage receives AT MOST 366 rows per url
regardless of raw volume (a 10^12-row table enters Python as
n_urls x <=366 slim rows).  Per-group kernel cost is O(D^3) dense linear
algebra with D <= 366 — microseconds — embarrassingly parallel across
urls, the reference's own parallelism model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LAM_GRID = tuple(10.0 ** e for e in range(-6, 7))  # GCV grid, fixed


def _spline_matrices(x: np.ndarray):
    """Banded penalty pieces for knots x (strictly increasing, n >= 3):
    returns (delta, c) with delta the (n-2, n) second-difference map and
    c the (n-2, n-2) tridiagonal Gram matrix of the natural-spline
    second-derivative basis (Green & Silverman 1994 eq. 2.3-2.4)."""
    h = np.diff(x)
    n = x.size
    delta = np.zeros((n - 2, n))
    rows = np.arange(n - 2)
    delta[rows, rows] = 1.0 / h[:-1]
    delta[rows, rows + 1] = -1.0 / h[:-1] - 1.0 / h[1:]
    delta[rows, rows + 2] = 1.0 / h[1:]
    c = np.zeros((n - 2, n - 2))
    c[rows, rows] = (h[:-1] + h[1:]) / 3.0
    c[rows[:-1], rows[:-1] + 1] = h[1:-1] / 6.0
    c[rows[:-1] + 1, rows[:-1]] = h[1:-1] / 6.0
    return delta, c


def smooth_spline_fit(
    x: np.ndarray, y: np.ndarray, w: np.ndarray, lam: float | None = None
) -> tuple[np.ndarray, np.ndarray, float]:
    """Weighted natural cubic smoothing spline at distinct knots ``x``:
    minimizes  sum_i w_i (y_i - f(x_i))^2 + lam * integral f''(t)^2 dt.

    Solves (W + lam K) fhat = W y with K = delta' C^-1 delta (Reinsch
    1967); dense solve — knot count is <= 366 here, so banded machinery
    buys nothing.  ``lam=None`` picks lam from ``_LAM_GRID`` by GCV,
    GCV(lam) = n * RSS / (n - tr(S))^2 with S the smoother/hat matrix
    (Craven & Wahba 1979) — the criterion R's smooth.spline uses.

    Returns (fhat at knots, second derivatives gamma at ALL knots with
    natural zeros at the ends, chosen lam).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    n = x.size
    if n < 3:
        # degenerate: weighted least-squares line (the lam->inf limit)
        wm = w / w.sum()
        xb, yb = (wm * x).sum(), (wm * y).sum()
        vx = (wm * (x - xb) ** 2).sum()
        b = 0.0 if vx <= 0 else (wm * (x - xb) * (y - yb)).sum() / vx
        f = yb + b * (x - xb)
        return f, np.zeros(n), float("inf")
    delta, c = _spline_matrices(x)
    k = delta.T @ np.linalg.solve(c, delta)

    if lam is None:
        # Demmler-Reinsch (1975): ONE symmetric eigendecomposition of
        # B = W^-1/2 K W^-1/2 = U diag(g) U', then every lambda on the
        # GCV grid costs O(n^2) — fhat = W^-1/2 U [z/(1+lam*g)] with
        # z = U' W^1/2 y, and tr(S) = sum 1/(1+lam*g) is FREE.  The
        # naive loop paid two O(n^3) solves per lambda (the hat-trace
        # one against all n unit vectors); measured 24 urls x 13-point
        # grid at 365 knots: 3.45 s -> this form is ~15x cheaper.
        sw = np.sqrt(w)
        b = k / np.outer(sw, sw)
        g, u = np.linalg.eigh(b)
        g = np.maximum(g, 0.0)  # PSD up to roundoff
        z = u.T @ (sw * y)
        best = None
        for lam_ in _LAM_GRID:
            d = 1.0 / (1.0 + lam_ * g)
            fhat_ = (u @ (d * z)) / sw
            tr_s = float(d.sum())
            rss = float((w * (y - fhat_) ** 2).sum())
            gcv = n * rss / max(n - tr_s, 1e-9) ** 2
            if best is None or gcv < best[0]:
                best = (gcv, lam_, fhat_)
        _, lam, fhat = best
    else:
        fhat = np.linalg.solve(np.diag(w) + lam * k, w * y)
    gamma_int = np.linalg.solve(c, delta @ fhat)
    gamma = np.zeros(n)
    gamma[1:-1] = gamma_int
    return fhat, gamma, float(lam)


def spline_eval(
    x: np.ndarray, fhat: np.ndarray, gamma: np.ndarray, xq: np.ndarray
) -> np.ndarray:
    """Evaluate the natural cubic spline (values fhat, second derivatives
    gamma at knots x) at query points xq — textbook piecewise form
    f(t) = M_i (x_{i+1}-t)^3/6h + M_{i+1} (t-x_i)^3/6h
         + (f_i - M_i h^2/6)(x_{i+1}-t)/h + (f_{i+1} - M_{i+1} h^2/6)(t-x_i)/h,
    linear extrapolation outside the knot span (natural boundary)."""
    x = np.asarray(x, dtype=np.float64)
    xq = np.asarray(xq, dtype=np.float64)
    if x.size == 1:
        return np.full(xq.shape, fhat[0])
    i = np.clip(np.searchsorted(x, xq, side="right") - 1, 0, x.size - 2)
    h = x[i + 1] - x[i]
    lo, hi = x[i + 1] - xq, xq - x[i]
    out = (
        gamma[i] * lo**3 / (6 * h)
        + gamma[i + 1] * hi**3 / (6 * h)
        + (fhat[i] - gamma[i] * h**2 / 6) * lo / h
        + (fhat[i + 1] - gamma[i + 1] * h**2 / 6) * hi / h
    )
    # natural extrapolation: first-derivative-continuous straight lines
    left, right = xq < x[0], xq > x[-1]
    if left.any():
        d0 = (fhat[1] - fhat[0]) / (x[1] - x[0]) - (x[1] - x[0]) * gamma[1] / 6
        out[left] = fhat[0] + d0 * (xq[left] - x[0])
    if right.any():
        hl = x[-1] - x[-2]
        d1 = (fhat[-1] - fhat[-2]) / hl + hl * gamma[-2] / 6
        out[right] = fhat[-1] + d1 * (xq[right] - x[-1])
    return out


def _halfmax_doys(doys: np.ndarray, curve: np.ndarray):
    """Half-max transition days on the dense curve: (spring, autumn) =
    the last upward crossing of (peak+trough)/2 strictly before the peak
    and the first downward crossing after it; crossing day = the first
    dense DOY at/above (resp. below) half-max in its run.  None when the
    curve never crosses on that side (monotone season or flat series)."""
    ipk = int(np.argmax(curve))
    half = (curve[ipk] + curve.min()) / 2.0
    above = curve >= half
    spring = autumn = None
    # walk back from the peak to the start of its above-half run
    j = ipk
    while j > 0 and above[j - 1]:
        j -= 1
    if j > 0:  # run does not touch the left edge -> a real upward crossing
        spring = int(doys[j])
    k = ipk
    while k < curve.size - 1 and above[k + 1]:
        k += 1
    if k < curve.size - 1:
        autumn = int(doys[k + 1])
    return spring, autumn


PHENO_SCHEMA = (
    "url string, n_obs bigint, n_doy int, peak_doy int, trough_doy int, "
    "peak_x1e4 bigint, amp_x1e4 bigint, spring_doy int, autumn_doy int, "
    "cor_x1e4 bigint"
)


def longterm_pheno(
    obs: DataFrame,
    id_col: str = "url",
    ts_col: str = "ts",
    val_col: str = "val",
    lam: float | None = None,
    min_doys: int = 8,
) -> DataFrame:
    """Long-term-mean phenology per ``id_col`` series (module docstring).

    Outputs are quantized to 1e-4 units (floor after a 1e-9 nudge) so the
    driver's value-hash compare moves integers, not float dust; groups
    with fewer than ``min_doys`` distinct DOYs return null metrics
    (upstream likewise refuses to fit sparse pixels).
    """
    per_doy = (
        obs.select(
            F.col(id_col).alias("url"),
            F.dayofyear(F.col(ts_col)).alias("doy"),
            F.col(val_col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("url", "doy")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        pdf = pdf.sort_values("doy", kind="mergesort")
        doy = pdf["doy"].to_numpy(dtype=np.float64)
        n = pdf["n"].to_numpy(dtype=np.float64)
        ybar = pdf["s"].to_numpy(dtype=np.float64) / n
        n_obs = int(n.sum())
        row = {
            "url": url, "n_obs": n_obs, "n_doy": int(doy.size),
            "peak_doy": None, "trough_doy": None, "peak_x1e4": None,
            "amp_x1e4": None, "spring_doy": None, "autumn_doy": None,
            "cor_x1e4": None,
        }
        if doy.size >= min_doys:
            fhat, gamma, _ = smooth_spline_fit(doy, ybar, n, lam)
            dense_doy = np.arange(doy[0], doy[-1] + 1.0)
            curve = spline_eval(doy, fhat, gamma, dense_doy)
            ipk, itr = int(np.argmax(curve)), int(np.argmin(curve))
            q = lambda v: int(np.floor(v * 1e4 + 1e-9))  # noqa: E731
            spring, autumn = _halfmax_doys(dense_doy, curve)
            fit_at_obs = spline_eval(doy, fhat, gamma, doy)
            wm = n / n.sum()
            fb, yb = (wm * fit_at_obs).sum(), (wm * ybar).sum()
            sf = (wm * (fit_at_obs - fb) ** 2).sum() ** 0.5
            sy = (wm * (ybar - yb) ** 2).sum() ** 0.5
            cor = (
                None
                if sf * sy <= 1e-12
                else float((wm * (fit_at_obs - fb) * (ybar - yb)).sum() / (sf * sy))
            )
            row.update(
                peak_doy=int(dense_doy[ipk]), trough_doy=int(dense_doy[itr]),
                peak_x1e4=q(curve[ipk]), amp_x1e4=q(curve[ipk] - curve[itr]),
                spring_doy=spring, autumn_doy=autumn,
                cor_x1e4=None if cor is None else q(cor),
            )
        return pd.DataFrame([row])

    return per_doy.groupBy("url").applyInPandas(fit, PHENO_SCHEMA)
