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
