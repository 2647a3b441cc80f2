"""Gap-fill regression: OLS vs NumPy lstsq oracle; GAM captures
non-linear structure that the linear fit cannot."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from streetview_naturevisibility_spark.operators.regression import (
    LinearGAM1D,
    fit_ols_normal_equations,
    gap_fill_gam,
    gap_fill_linear,
)


def _toy(spark, n=400, nonlinear=False, seed=11):
    rng = np.random.RandomState(seed)
    x = rng.rand(n)
    y = np.sin(x * 6.0) * 0.4 + 0.5 if nonlinear else 0.3 + 0.4 * x
    y = y + rng.randn(n) * 0.01
    missing = rng.rand(n) < 0.3
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64),
            "ndvi": x,
            "gvi": np.where(missing, np.nan, y),
            "missing": missing,
        }
    )
    return spark.createDataFrame(pdf), pdf, y


class TestLinear:
    def test_matches_numpy_lstsq(self, spark):
        df, pdf, y_true = _toy(spark)
        out = gap_fill_linear(df, "ndvi", "gvi").orderBy("point_id").toPandas()
        known = pdf[~pdf["missing"]]
        A = np.column_stack([np.ones(len(known)), known["ndvi"].to_numpy()])
        coef, *_ = np.linalg.lstsq(A, known["gvi"].to_numpy(), rcond=None)
        pred = coef[0] + coef[1] * pdf["ndvi"].to_numpy()
        expected = np.where(pdf["missing"], pred, pdf["gvi"])
        assert np.abs(out["gvi_filled"].to_numpy() - expected).max() < 1e-9

    def test_normal_equations_multifeature(self, spark):
        rng = np.random.RandomState(5)
        n = 500
        x1, x2 = rng.rand(n), rng.rand(n)
        y = 1.0 + 2.0 * x1 - 3.0 * x2 + rng.randn(n) * 1e-6
        df = spark.createDataFrame(pd.DataFrame({"x1": x1, "x2": x2, "y": y}))
        beta = fit_ols_normal_equations(df, ["x1", "x2"], "y")
        assert np.abs(beta - np.array([1.0, 2.0, -3.0])).max() < 1e-3


class TestGAM:
    def test_gam_beats_linear_on_nonlinear_signal(self, spark):
        df, pdf, y_true = _toy(spark, nonlinear=True)
        lin = gap_fill_linear(df, "ndvi", "gvi").orderBy("point_id").toPandas()
        gam = gap_fill_gam(df, "ndvi", "gvi").orderBy("point_id").toPandas()
        miss = pdf["missing"].to_numpy()
        lin_rmse = np.sqrt(((lin["gvi_filled"].to_numpy()[miss] - y_true[miss]) ** 2).mean())
        gam_rmse = np.sqrt(((gam["gvi_filled"].to_numpy()[miss] - y_true[miss]) ** 2).mean())
        assert gam_rmse < lin_rmse * 0.5
        assert gam_rmse < 0.05

    def test_gam_driver_side_fit_quality(self):
        rng = np.random.RandomState(3)
        x = rng.rand(800)
        y = np.cos(x * 5) + rng.randn(800) * 0.05
        gam = LinearGAM1D(n_splines=25).fit(x, y)
        pred = gam.predict(x)
        assert np.sqrt(((pred - np.cos(x * 5)) ** 2).mean()) < 0.05
        # smoothing lambda chosen by GCV from the reference's grid
        assert gam.lam_ is not None
