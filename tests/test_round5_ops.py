"""Round-5 operator tests: grouped histogram quantile, EncodedGroups,
bucket-aware window layout, and advisor-fix regressions."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spark import XDataset, set_options


@pytest.fixture(scope="module")
def gq_ds(spark):
    rng = np.random.RandomState(11)
    n = 4000
    g = rng.randint(0, 5, n)
    v = rng.randn(n).round(6)
    v[rng.choice(n, 60, replace=False)] = np.nan
    pdf = pd.DataFrame({"g": g, "i": np.arange(n), "v": v})
    return XDataset(spark.createDataFrame(pdf), dims=["g", "i"]), pdf


@pytest.mark.parametrize("method", [
    "linear", "lower", "higher", "nearest", "midpoint",
    "inverted_cdf", "averaged_inverted_cdf", "median_unbiased",
])
def test_grouped_hist_quantile_matches_numpy(gq_ds, method):
    ds, pdf = gq_ds
    qs = [0.1, 0.5, 0.9]
    with set_options(grouped_quantile_buffer_limit=10):
        got = (ds.quantile(qs, dim="i", method=method).to_pandas()
               .sort_values(["g", "quantile"]))
    for g, grp in pdf.groupby("g"):
        vals = grp["v"].dropna().to_numpy()
        exp = np.quantile(vals, qs, method=method)
        sub = got[got["g"] == g].sort_values("quantile")["v"].to_numpy()
        np.testing.assert_allclose(sub, exp, rtol=1e-9, atol=1e-12,
                                   err_msg=f"group {g} method {method}")


def test_grouped_hist_quantile_matches_buffer_path(gq_ds):
    ds, _ = gq_ds
    with set_options(grouped_quantile_buffer_limit=10):
        hist = (ds.quantile([0.25, 0.75], dim="i").to_pandas()
                .sort_values(["g", "quantile"])["v"].to_numpy())
    with set_options(grouped_quantile_buffer_limit=None):
        buf = (ds.quantile([0.25, 0.75], dim="i").to_pandas()
               .sort_values(["g", "quantile"])["v"].to_numpy())
    np.testing.assert_allclose(hist, buf, rtol=1e-9, atol=1e-12)


def test_grouped_hist_quantile_edge_groups(spark):
    """all-null group -> null; constant group -> the constant;
    +/-inf values occupy the sorted tails like numpy."""
    rows = []
    for i in range(50):
        rows.append(("nulls", i, None))
        rows.append(("const", i, 7.5))
        rows.append(("infs", i, float(i)))
    rows.append(("infs", 50, float("-inf")))
    rows.append(("infs", 51, float("inf")))
    pdf = spark.createDataFrame(rows, "g string, i long, v double")
    ds = XDataset(pdf, dims=["g", "i"])
    with set_options(grouped_quantile_buffer_limit=1):
        out = ds.quantile([0.0, 0.5, 1.0], dim="i").to_pandas()
    o = {(r["g"], r["quantile"]): r["v"] for _, r in out.iterrows()}
    assert all(np.isnan(o[("nulls", q)]) for q in (0.0, 0.5, 1.0))
    assert all(o[("const", q)] == 7.5 for q in (0.0, 0.5, 1.0))
    assert o[("infs", 0.0)] == float("-inf")
    assert o[("infs", 1.0)] == float("inf")
    arr = np.array([float(i) for i in range(50)] + [-np.inf, np.inf])
    np.testing.assert_allclose(o[("infs", 0.5)], np.quantile(arr, 0.5))


def test_groupby_quantile_and_median_hist(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        "t": np.arange(600), "k": np.arange(600) % 3,
        "v": rng.randn(600).round(6)})
    ds = XDataset(spark.createDataFrame(pdf), dims=["t"])
    with set_options(grouped_quantile_buffer_limit=10):
        got_q = ds.groupby("k").quantile(0.3).to_pandas().sort_values("k")
        got_m = ds.groupby("k").median().to_pandas().sort_values("k")
    for k, grp in pdf.groupby("k"):
        exp_q = np.quantile(grp["v"].to_numpy(), 0.3)
        exp_m = np.median(grp["v"].to_numpy())
        np.testing.assert_allclose(
            got_q[got_q["k"] == k]["v"].iloc[0], exp_q, rtol=1e-9)
        np.testing.assert_allclose(
            got_m[got_m["k"] == k]["v"].iloc[0], exp_m, rtol=1e-9)
