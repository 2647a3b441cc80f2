"""Gap-fill regression (reference predict_missing_gvi.py:34-87).

The reference fits sklearn LinearRegression on rows with known GVI and
predicts the missing ones (single feature: mean NDVI). The engine does
the same with Spark built-ins: OLS slope/intercept via ``regr_slope`` /
``regr_intercept`` aggregates (closed form, one pass, partial+final
automatic — no iterative solver needed for one feature), then a
crossJoin of the 1-row fit onto the missing rows. Known rows keep their
value; output unions both (predict_missing_gvi.py:56-62).

For multi-feature fits, ``fit_ols_normal_equations`` solves X'X b = X'y
from a single aggregate pass over squared/cross terms (driver-side
solve of a (k+1)x(k+1) system — k is tiny).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gap_fill_linear(
    df: DataFrame, feature: str, target: str, flag: str = "missing"
) -> DataFrame:
    """df(point_id, flag, target, feature) -> + gvi_filled column where
    missing rows get intercept + slope * feature."""
    known = df.where(F.col(target).isNotNull())
    fit = known.agg(
        F.regr_slope(F.col(target), F.col(feature)).alias("_slope"),
        F.regr_intercept(F.col(target), F.col(feature)).alias("_icept"),
    )
    out = df.crossJoin(F.broadcast(fit))
    return out.withColumn(
        "gvi_filled",
        F.when(F.col(target).isNotNull(), F.col(target)).otherwise(
            F.col("_icept") + F.col("_slope") * F.col(feature)
        ),
    ).drop("_slope", "_icept")


def _bspline_basis(x: np.ndarray, knots: np.ndarray, degree: int = 3) -> np.ndarray:
    """Cox-de Boor B-spline basis matrix (pure NumPy)."""
    t = np.concatenate([[knots[0]] * degree, knots, [knots[-1]] * degree])
    n_basis = len(t) - degree - 1
    B = np.zeros((len(x), n_basis))
    # degree 0
    for j in range(len(t) - 1):
        left, right = t[j], t[j + 1]
        if j == len(t) - 2:
            B0 = (x >= left) & (x <= right)
        else:
            B0 = (x >= left) & (x < right)
        if j < n_basis:
            B[:, j] = B0.astype(float)
    # elevate degree
    Bk = B.copy()
    for k in range(1, degree + 1):
        Bk_new = np.zeros_like(Bk)
        for j in range(n_basis):
            denom1 = t[j + k] - t[j]
            denom2 = t[j + k + 1] - t[j + 1]
            term = np.zeros(len(x))
            if denom1 > 0:
                term += (x - t[j]) / denom1 * Bk[:, j]
            if denom2 > 0 and j + 1 < n_basis:
                term += (t[j + k + 1] - x) / denom2 * Bk[:, j + 1]
            Bk_new[:, j] = term
        Bk = Bk_new
    return Bk


class LinearGAM1D:
    """Minimal penalized B-spline GAM for one feature — the engine's
    analog of the reference's pygam LinearGAM(s(0, n_splines=25))
    .gridsearch(lam=logspace(-5,5,20)) (predict_missing_gvi.py:109-118).
    Second-difference penalty, GCV-selected lambda. Fits driver-side on
    the (small) known set; predictions broadcast back."""

    def __init__(self, n_splines: int = 25, degree: int = 3):
        self.n_splines = n_splines
        self.degree = degree
        self.coef_: np.ndarray | None = None
        self.lam_: float | None = None
        self.knots_: np.ndarray | None = None

    def _basis(self, x: np.ndarray) -> np.ndarray:
        xc = np.clip(x, self.knots_[0], self.knots_[-1])
        return _bspline_basis(xc, self.knots_, self.degree)

    def fit(self, x: np.ndarray, y: np.ndarray, lams: np.ndarray | None = None) -> "LinearGAM1D":
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if lams is None:
            lams = np.logspace(-5, 5, 20)
        n_interior = self.n_splines - self.degree + 1
        self.knots_ = np.quantile(x, np.linspace(0, 1, max(n_interior, 2)))
        self.knots_ = np.unique(self.knots_)
        B = self._basis(x)
        m = B.shape[1]
        D = np.diff(np.eye(m), n=2, axis=0)
        P = D.T @ D
        BtB = B.T @ B
        Bty = B.T @ y
        best = (np.inf, None, None)
        n = len(y)
        for lam in lams:
            A = BtB + lam * P
            try:
                coef = np.linalg.solve(A, Bty)
            except np.linalg.LinAlgError:
                continue
            fitted = B @ coef
            # GCV: n * rss / (n - tr(H))^2
            H_trace = np.trace(np.linalg.solve(A, BtB))
            rss = float(((y - fitted) ** 2).sum())
            gcv = n * rss / max((n - H_trace) ** 2, 1e-12)
            if gcv < best[0]:
                best = (gcv, coef, lam)
        self.coef_ = best[1]
        self.lam_ = best[2]
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        return self._basis(np.asarray(x, dtype=np.float64)) @ self.coef_


def gap_fill_gam(
    df: DataFrame, feature: str, target: str, n_splines: int = 25
) -> DataFrame:
    """GAM gap-fill: fit on known rows (collected — the known set is
    bounded), predict missing via a broadcast pandas UDF."""
    from pyspark.sql.types import DoubleType

    known = df.where(F.col(target).isNotNull()).select(feature, target).toPandas()
    gam = LinearGAM1D(n_splines=n_splines).fit(
        known[feature].to_numpy(), known[target].to_numpy()
    )
    knots = gam.knots_
    coef = gam.coef_
    degree = gam.degree

    @F.pandas_udf(DoubleType())
    def gam_predict(x: pd.Series) -> pd.Series:
        model = LinearGAM1D(n_splines=n_splines, degree=degree)
        model.knots_ = knots
        model.coef_ = coef
        return pd.Series(model.predict(x.to_numpy()))

    return df.withColumn(
        "gvi_filled",
        F.when(F.col(target).isNotNull(), F.col(target)).otherwise(
            gam_predict(F.col(feature))
        ),
    )


def fit_ols_normal_equations(df: DataFrame, features: list[str], target: str) -> np.ndarray:
    """Multi-feature OLS via one aggregate pass (X'X, X'y moments) and a
    driver-side solve. Returns [intercept, b1..bk]."""
    cols = ["__one"] + features
    d = df.where(F.col(target).isNotNull()).withColumn("__one", F.lit(1.0))
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"xx_{a}_{b}"))
        aggs.append(F.sum(F.col(a) * F.col(target)).alias(f"xy_{a}"))
    row = d.agg(*aggs).collect()[0].asDict()
    k = len(cols)
    xtx = np.zeros((k, k))
    xty = np.zeros(k)
    for i, a in enumerate(cols):
        for j in range(i, k):
            b = cols[j]
            xtx[i, j] = xtx[j, i] = row[f"xx_{a}_{b}"]
        xty[i] = row[f"xy_{a}"]
    return np.linalg.solve(xtx, xty)
