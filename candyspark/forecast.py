"""Time-series forecasting operator (SURVEY.md §2.12, M4).

The reference wraps Prophet (/root/reference/src/time_series.py:7-67) with a
reproducibility bug: the fit is anchored at ``pd.Timestamp.today()`` (:21),
not the data's dates, so weekday seasonality — and the golden forecast value
— depends on the day the author ran it (its own CI excludes the forecast from
value comparison). This rebuild:

- anchors fits at the series' TRUE dates;
- defaults to a deterministic linear-trend (ordinary least squares) model so
  tests can pin values; Prophet is used when importable (it is not in this
  environment) behind the same interface;
- keeps the single-series fit driver-side (N≈10 points — SURVEY.md §1.4) but
  exposes ``forecast_many`` as a ``groupBy(key).applyInPandas`` grouped-map
  for many-series workloads (the 100-TB-scale path: one fit per group,
  distributed).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - optional dependency
    from prophet import Prophet  # type: ignore

    HAVE_PROPHET = True
except Exception:  # pragma: no cover
    HAVE_PROPHET = False


def _linear_forecast(values: np.ndarray, horizon: int) -> np.ndarray:
    """OLS linear trend: deterministic fallback (and test anchor)."""
    n = len(values)
    if n == 0:
        return np.zeros(horizon)
    if n == 1:
        return np.repeat(values[0], horizon)
    x = np.arange(n, dtype=float)
    slope, intercept = np.polyfit(x, values.astype(float), 1)
    future = np.arange(n, n + horizon, dtype=float)
    return intercept + slope * future


def _prophet_forecast(
    dates: pd.Series, values: np.ndarray, horizon: int
) -> np.ndarray:  # pragma: no cover - env has no prophet
    model = Prophet()
    # Anchored at the TRUE dates (fixing reference src/time_series.py:21).
    model.fit(pd.DataFrame({"ds": pd.to_datetime(dates), "y": values}))
    future = model.make_future_dataframe(periods=horizon, include_history=False)
    return model.predict(future)["yhat"].to_numpy()


def forecast_series(
    dates: pd.Series, values: np.ndarray, horizon: int, method: str = "auto"
) -> np.ndarray:
    if method == "prophet" or (method == "auto" and HAVE_PROPHET):
        return _prophet_forecast(dates, values, horizon)
    return _linear_forecast(np.asarray(values, dtype=float), horizon)


def forecast_sales_and_profits(
    daily_summary: DataFrame, horizon: int = 1, method: str = "auto"
) -> DataFrame:
    """Reference ``forecast_sales_and_profits`` analogue
    (/root/reference/src/data_processor.py:616-642,702-767): forecast the
    next ``horizon`` days of total_sales / total_profit from the daily
    summary. Collects the tiny series driver-side (one row per day), then
    re-creates a DataFrame (S9)."""
    pdf = daily_summary.select("date", "total_sales", "total_profit").orderBy("date").toPandas()
    spark = daily_summary.sparkSession
    last = pd.to_datetime(pdf["date"].iloc[-1])
    dates = [
        (last + pd.Timedelta(days=i + 1)).date() for i in range(horizon)
    ]
    sales = forecast_series(pdf["date"], pdf["total_sales"].to_numpy(), horizon, method)
    profit = forecast_series(pdf["date"], pdf["total_profit"].to_numpy(), horizon, method)
    rows = [
        (d, round(float(s), 2), round(float(p), 2))
        for d, s, p in zip(dates, sales, profit)
    ]
    schema = T.StructType(
        [
            T.StructField("date", T.DateType()),
            T.StructField("forecasted_sales", T.DoubleType()),
            T.StructField("forecasted_profit", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def forecast_many(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    value_col: str,
    horizon: int = 1,
    method: str = "auto",
) -> DataFrame:
    """Many-series variant: one forecast per key group via applyInPandas —
    the distributed path when there are millions of series (per-product,
    per-region, ...). Each group's history must fit one task (time series are
    short relative to cluster memory)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [T.StructField(k, fields[k]) for k in key_cols]
        + [
            T.StructField("date", T.DateType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col)
        values = pdf[value_col].to_numpy(dtype=float)
        preds = forecast_series(pdf[date_col], values, horizon, method)
        last = pd.to_datetime(pdf[date_col].iloc[-1])
        out = pd.DataFrame(
            {
                "date": [(last + pd.Timedelta(days=i + 1)).date() for i in range(horizon)],
                "forecast": np.round(preds, 2),
            }
        )
        for k in key_cols:
            out[k] = pdf[k].iloc[0]
        return out[key_cols + ["date", "forecast"]]

    return df.groupBy(*key_cols).applyInPandas(kernel, schema=out_schema)


def next_dates(last_date: dt.date, horizon: int) -> list[dt.date]:
    return [last_date + dt.timedelta(days=i + 1) for i in range(horizon)]
