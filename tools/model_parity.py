"""GAM-vs-OLS quality parity table, mirroring the reference's published
comparison (README.md:503-523 / predict_missing_gvi.py:109-118: LinReg
RMSE 0.1707 / AIC -879.7 vs GAM RMSE 0.1640 / AIC -899.8 on its GVI
data — GAM wins on the nonlinear GVI~NDVI relationship).

This tool reproduces the head-to-head on a deterministic nonlinear
fixture (y = 0.5 + 0.4*sin(6x) + N(0, 0.01), 30% missing — the same
family as tests/test_regression._toy) using the engine's 5-fold CV
metric operators (gap_fill_cv_metrics: distributed closed-form
moment algebra; gam_cv_metrics: driver-side refit of the from-scratch
penalized-B-spline LinearGAM1D on the bounded known set).

Usage: python tools/model_parity.py   # prints the table + one JSON line
The pytest twin (tests/test_regression.py::TestCVMetrics) asserts
GAM avg_rmse < OLS avg_rmse on this fixture family.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from streetview_naturevisibility_spark.operators.regression import (
        gam_cv_metrics,
        gap_fill_cv_metrics,
    )
    from streetview_naturevisibility_spark.session import get_spark

    spark = get_spark(app_name="svnv-model-parity", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(11)
    n = 2000
    x = rng.rand(n)
    y = np.sin(x * 6.0) * 0.4 + 0.5 + rng.randn(n) * 0.01
    missing = rng.rand(n) < 0.3
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": np.arange(n, dtype=np.int64),
                "ndvi": x,
                "gvi": np.where(missing, np.nan, y),
            }
        )
    )

    lin = gap_fill_cv_metrics(df, "ndvi", "gvi", folds=5).collect()[0]
    gam = gam_cv_metrics(df, "ndvi", "gvi", folds=5)

    print("model     | 5-fold CV RMSE | CV R^2   | AIC")
    print("----------|----------------|----------|---------")
    print(
        f"LinReg    | {lin.avg_rmse:14.6f} | {lin.avg_r2:8.4f} | {lin.aic:9.2f}"
    )
    print(
        f"GAM       | {gam['avg_rmse']:14.6f} | {gam['avg_r2']:8.4f} | {gam['aic']:9.2f}"
    )
    print(
        json.dumps(
            {
                "metric": "model_parity_cv",
                "n": n,
                "linreg": {
                    "rmse": round(float(lin.avg_rmse), 6),
                    "r2": round(float(lin.avg_r2), 6),
                    "aic": round(float(lin.aic), 2),
                },
                "gam": {
                    "rmse": round(float(gam["avg_rmse"]), 6),
                    "r2": round(float(gam["avg_r2"]), 6),
                    "aic": round(float(gam["aic"]), 2),
                },
                "gam_beats_linreg": bool(gam["avg_rmse"] < lin.avg_rmse),
            }
        )
    )


if __name__ == "__main__":
    main()
