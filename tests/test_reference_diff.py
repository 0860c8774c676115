"""Differential tests against the REFERENCE xarray itself (importable
from /root/reference as a pure-Python package): run the same operation
through the reference's numpy engine and through this engine on the
same random inputs, and require matching values.

This is behavior-testing the reference (what to compute), not code
reuse — every implementation here is the repo's own Spark plan.
"""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/reference")
import xarray as xr  # noqa: E402  (the reference package)

from xarray_spark import XDataset  # noqa: E402

RNG = np.random.RandomState(7)
N = 60


@pytest.fixture(scope="module")
def series():
    vals = RNG.randn(N).round(6)
    vals[[5, 17, 18, 40]] = np.nan
    return vals


@pytest.fixture(scope="module")
def sds(spark, series):
    pdf = pd.DataFrame({"t": np.arange(N), "v": series})
    return XDataset(spark.createDataFrame(pdf), dims=["t"])


def _ours(ds):
    return ds.to_pandas().sort_values("t")["v"].to_numpy()


def _ref(series):
    return xr.DataArray(series, dims="t")


@pytest.mark.parametrize("agg", ["mean", "sum", "min", "max", "std", "var"])
@pytest.mark.parametrize("center", [False, True])
def test_rolling_matches_reference(sds, series, agg, center):
    got = _ours(getattr(sds.rolling(t=5, min_periods=2, center=center), agg)())
    exp = getattr(_ref(series).rolling(t=5, min_periods=2, center=center),
                  agg)().values
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-12, equal_nan=True)


@pytest.mark.parametrize("agg", ["mean", "sum", "min", "max", "std", "var"])
def test_coarsen_matches_reference(sds, series, agg):
    got = np.sort(_ours(getattr(sds.coarsen(t=7, boundary="trim"), agg)()))
    exp = np.sort(getattr(_ref(series).coarsen(t=7, boundary="trim"),
                          agg)().values)
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-12, equal_nan=True)


def test_rolling_exp_matches_reference(sds, series):
    # reference rolling_exp needs numbagg; fall back to pandas (the
    # kernels agree) when it's absent
    try:
        exp = _ref(series).rolling_exp(t=10, window_type="span").mean().values
    except ImportError:
        exp = pd.Series(series).ewm(span=10, min_periods=1).mean().to_numpy()
    got = _ours(sds.rolling_exp(t=10, window_type="span").mean())
    np.testing.assert_allclose(got[~np.isnan(exp)], exp[~np.isnan(exp)],
                               rtol=1e-9)


def test_interpolate_na_matches_reference(sds, series):
    # reference 'nearest' needs scipy (absent here); linear is its
    # numpy interpolator
    got = _ours(sds.interpolate_na("t", method="linear"))
    exp = _ref(series).interpolate_na("t", method="linear").values
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-12, equal_nan=True)


def test_interpolate_na_maxgap_matches_reference(spark):
    # the reference's max_gap path needs bottleneck (absent), so the
    # expected values replicate its documented semantics by hand: gaps
    # wider than max_gap (coordinate units, bounds included) stay null
    vals = np.array([1.0, np.nan, np.nan, np.nan, 5.0, np.nan, 7.0,
                     np.nan, np.nan, 10.0])
    pdf = pd.DataFrame({"t": np.arange(10.0), "v": vals})
    ds = XDataset(spark.createDataFrame(pdf), dims=["t"])
    got = _ours(ds.interpolate_na("t", method="linear", max_gap=2.0))
    exp = vals.copy()
    exp[5] = 6.0          # gap 5-7 has width 2.0 <= max_gap -> filled
    # gaps 0→4 (width 4) and 6→9 (width 3) stay null
    np.testing.assert_allclose(got, exp, equal_nan=True)


def test_ffill_bfill_matches_pandas(sds, series):
    # reference ffill/bfill delegate to bottleneck (absent); pandas has
    # identical push semantics
    got_f = _ours(sds.ffill("t"))
    exp_f = pd.Series(series).ffill().to_numpy()
    np.testing.assert_allclose(got_f, exp_f, equal_nan=True)
    got_b = _ours(sds.bfill("t", limit=1))
    exp_b = pd.Series(series).bfill(limit=1).to_numpy()
    np.testing.assert_allclose(got_b, exp_b, equal_nan=True)


def test_diff_cumsum_shift_match_reference(sds, series):
    np.testing.assert_allclose(
        np.sort(_ours(sds.diff("t"))), np.sort(_ref(series).diff("t").values),
        equal_nan=True)
    np.testing.assert_allclose(
        _ours(sds.cumsum("t")), _ref(series).cumsum("t").values,
        rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(
        _ours(sds.shift(t=3)), _ref(series).shift(t=3).values, equal_nan=True)


@pytest.mark.parametrize("q", [0.1, 0.5, 0.9])
@pytest.mark.parametrize("method", ["linear", "lower", "higher", "nearest",
                                    "midpoint"])
def test_quantile_methods_match_reference(sds, series, q, method):
    got = sds.quantile(q, dim="t", method=method).to_pandas()["v"].iloc[0]
    exp = float(_ref(series).quantile(q, dim="t", method=method, skipna=True))
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_rank_matches_pandas(sds, series):
    # reference rank delegates to bottleneck nanrankdata (absent);
    # pandas method='average' is the same estimator
    got = _ours(sds.rank("t"))
    exp = pd.Series(series).rank(method="average").to_numpy()
    np.testing.assert_allclose(got, exp, equal_nan=True)


def test_weighted_matches_reference(spark):
    vals = RNG.rand(30).round(6)
    wts = RNG.rand(30).round(6)
    ref = xr.DataArray(vals, dims="t").weighted(xr.DataArray(wts, dims="t"))
    pdf = pd.DataFrame({"t": np.arange(30), "v": vals, "w": wts})
    ds = XDataset(spark.createDataFrame(pdf), dims=["t"], coords={"w": ("t",)})
    w = ds.weighted("w")
    for agg in ("mean", "sum", "var", "std"):
        got = getattr(w, agg)().to_pandas()["v"].iloc[0]
        exp = float(getattr(ref, agg)())
        np.testing.assert_allclose(got, exp, rtol=1e-9)
    for q in (0.25, 0.5, 0.75):
        got = w.quantile(q).to_pandas()["v"].iloc[0]
        exp = float(ref.quantile(q))
        np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_groupby_matches_reference(spark):
    vals = RNG.randn(40).round(6)
    keys = RNG.randint(0, 4, 40)
    ref = xr.DataArray(vals, dims="t",
                       coords={"k": ("t", keys)}).groupby("k")
    pdf = pd.DataFrame({"t": np.arange(40), "v": vals, "k": keys})
    ds = XDataset(spark.createDataFrame(pdf), dims=["t"], coords={"k": ("t",)})
    for agg in ("mean", "sum", "min", "max", "median"):
        got = (getattr(ds.groupby("k"), agg)().to_pandas()
               .sort_values("k")["v"].to_numpy())
        exp = getattr(ref, agg)().values
        np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_resample_matches_reference(spark):
    times = pd.date_range("2001-01-01", periods=90, freq="D")
    vals = RNG.randn(90).round(6)
    ref = (xr.DataArray(vals, dims="time", coords={"time": times})
           .resample(time="MS").mean())
    pdf = pd.DataFrame({"time": times, "v": vals})
    ds = XDataset(spark.createDataFrame(pdf), dims=["time"])
    got = (ds.resample(time="MS").mean().to_pandas()
           .sort_values("time"))
    np.testing.assert_array_equal(got["time"].to_numpy(),
                                  ref["time"].values)
    np.testing.assert_allclose(got["v"].to_numpy(), ref.values, rtol=1e-9)


def test_pad_matches_reference(sds, series):
    for mode in ("edge", "reflect", "symmetric", "wrap"):
        got = (sds.pad(t=(2, 3), mode=mode).to_pandas()
               .sort_values("t")["v"].to_numpy())
        exp = _ref(series).pad(t=(2, 3), mode=mode).values
        np.testing.assert_allclose(got, exp, equal_nan=True)


def test_idxmax_argmax_match_reference(spark):
    vals = RNG.randn(25).round(6)
    ref = xr.DataArray(vals, dims="t", coords={"t": np.arange(25)})
    pdf = pd.DataFrame({"t": np.arange(25), "v": vals})
    ds = XDataset(spark.createDataFrame(pdf), dims=["t"])
    assert ds.idxmax("t").to_pandas()["v"].iloc[0] == int(ref.idxmax("t"))
    assert ds.argmax("t").to_pandas()["v"].iloc[0] == int(ref.argmax("t"))


def test_dt_fields_match_reference(spark):
    times = pd.date_range("1999-11-25 13:45:05", periods=50, freq="37h")
    ref = xr.DataArray(times, dims="i")
    pdf = pd.DataFrame({"i": np.arange(50), "v": times})
    from xarray_spark.dataset import XDataArray
    da = XDataArray(spark.createDataFrame(pdf), dims=["i"])
    for field in ("year", "month", "day", "hour", "minute", "second",
                  "dayofyear", "quarter", "days_in_month"):
        got = (getattr(da.dt, field).to_pandas().sort_values("i")["v"]
               .to_numpy().astype("int64"))
        exp = getattr(ref.dt, field).values.astype("int64")
        np.testing.assert_array_equal(got, exp, err_msg=field)
    got_name = (da.dt.day_name().to_pandas().sort_values("i")["v"].tolist())
    exp_name = ref.dt.strftime("%A").values.tolist()
    assert got_name == exp_name
