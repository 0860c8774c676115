"""Standing randomized differential fuzz: engine vs the reference
across op families on an adversarial value pool (NaN / ±inf / ±0 /
denormals / near-symmetric cancellation pairs / 1e15 outliers / ties).

Deterministic seed per run; `SPARK_GRAFT_FUZZ_TRIALS` scales the trial
count (default keeps the suite fast).  This harness found four of the
round-9 wave-47 pins before any external fuzz did: the rolling-var
series-shift poisoning, idxmax/argmax tie-breaking, all-NaN coarsen
block sums, and the non-finite weighted-variance matrix — keep it
green and occasionally crank the trials.
"""

import os
import sys
import warnings

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/reference")
import xarray as xr  # noqa: E402

from xarray_spark import XDataset  # noqa: E402

warnings.filterwarnings("ignore")

TRIALS = int(os.environ.get("SPARK_GRAFT_FUZZ_TRIALS", "8"))

POOL = np.array([0.0, -0.0, 1.0, -1.0, 3.5, -3.5, 1e6,
                 -999999.9999999999, 999999.9999999999, -1e6, 1e-300,
                 -1e-300, 2.5e5, -2.4999999999999997e5, np.nan, np.inf,
                 -np.inf, 5e-324, -5e-324, 1e15, 1e15 + 2.0])


def _draw(rng, n, nan_frac=0.2, inf_ok=True):
    pool = POOL if inf_ok else POOL[~np.isinf(POOL)]
    mix = rng.random(n) < 0.5
    vals = np.where(mix, rng.choice(pool, n), rng.normal(scale=10, size=n))
    vals[rng.random(n) < nan_frac] = np.nan
    return vals


def _close(a, b, rtol=1e-7, atol=1e-12):
    a, b = np.asarray(a, float), np.asarray(b, float)
    if a.shape != b.shape:
        return False
    return bool(np.all(np.isclose(a, b, rtol=rtol, atol=atol,
                                  equal_nan=True)))


def test_fuzz_reductions_and_windows(spark):
    rng = np.random.default_rng(20260816)
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(3, 25))
        vals = _draw(rng, n)
        keys = rng.integers(0, 3, n)
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "k": keys, "v": vals})),
            dims=["t"], coords={"k": ("t",)})
        ref = xr.DataArray(vals, dims="t",
                           coords={"t": range(n), "k": ("t", keys)})
        for op in ("sum", "mean", "min", "max", "prod", "std", "var",
                   "median"):
            g = getattr(eng["v"], op)().to_pandas()["v"].iloc[0]
            r = float(getattr(ref, op)().values)
            if not _close(g, r):
                fails.append((trial, op, g, r, vals.tolist()))
        for op in ("sum", "mean", "min", "max", "std", "var", "median"):
            g = (getattr(eng.groupby("k"), op)().to_pandas()
                 .sort_values("k")["v"].to_numpy())
            r = getattr(ref.groupby("k"), op)().values
            if not _close(g, r):
                fails.append((trial, f"gb_{op}", g.tolist(), r.tolist(),
                              vals.tolist()))
        wsz = int(rng.integers(2, 5))
        for op in ("sum", "mean", "min", "max", "std", "var", "median"):
            g = (getattr(eng.rolling({"t": wsz}), op)().to_pandas()
                 .sort_values("t")["v"].to_numpy())
            r = getattr(ref.rolling(t=wsz), op)().values
            if not _close(g, r):
                fails.append((trial, f"roll_{op}_{wsz}", g.tolist(),
                              r.tolist(), vals.tolist()))
        g = (eng["v"].cumsum("t").to_pandas().sort_values("t")["v"]
             .to_numpy())
        if not _close(g, ref.cumsum("t").values):
            fails.append((trial, "cumsum", g.tolist(), vals.tolist()))
    assert not fails, fails[:5]


def test_fuzz_weighted_args_interp_coarsen(spark):
    rng = np.random.default_rng(816)
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(4, 20))
        vals = _draw(rng, n)
        w = np.abs(rng.normal(1.0, 0.5, n)) + 0.01
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": range(n)})
        wda = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "w": w})), dims=["t"])["w"]
        refw = ref.weighted(xr.DataArray(w, dims="t"))
        for op in ("sum", "mean", "var", "std", "sum_of_weights"):
            g = getattr(eng.weighted(wda), op)().to_pandas()["v"].iloc[0]
            r = float(getattr(refw, op)().values)
            if not _close(g, r):
                fails.append((trial, f"w_{op}", g, r, vals.tolist()))
        for op in ("idxmin", "idxmax", "argmin", "argmax"):
            g = getattr(eng["v"], op)("t").to_pandas().iloc[0, -1]
            r = float(getattr(ref, op)("t").values)
            gv = float(g) if g is not None else np.nan
            if not (np.isnan(gv) and np.isnan(r)) and gv != r:
                fails.append((trial, op, gv, r, vals.tolist()))
        v2 = _draw(rng, n, nan_frac=0.4, inf_ok=False)
        eng2 = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": np.arange(n, dtype=float), "v": v2})),
            dims=["t"])
        ref2 = xr.DataArray(v2, dims="t",
                            coords={"t": np.arange(n, dtype=float)})
        g = (eng2.interpolate_na("t", method="linear").to_pandas()
             .sort_values("t")["v"].to_numpy())
        if not _close(g, ref2.interpolate_na("t", method="linear").values):
            fails.append((trial, "ina_linear", g.tolist(), v2.tolist()))
        wsz = int(rng.integers(2, 4))
        for op in ("mean", "sum", "var", "std", "median", "max"):
            g = (getattr(eng2.coarsen({"t": wsz}, boundary="trim"), op)()
                 .to_pandas().sort_values("t")["v"].to_numpy())
            r = getattr(ref2.coarsen(t=wsz, boundary="trim"), op)().values
            if not _close(g, r):
                fails.append((trial, f"co_{op}_{wsz}", g.tolist(),
                              r.tolist(), v2.tolist()))
        g = (eng2["v"].cumprod("t").to_pandas().sort_values("t")["v"]
             .to_numpy())
        if not _close(g, ref2.cumprod("t").values):
            fails.append((trial, "cumprod", g.tolist(), v2.tolist()))
    assert not fails, fails[:5]
