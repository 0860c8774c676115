"""Tests for wave 3: N-D rolling, multi-dim interp, interpolate_na
limit, densify, vectorized isel, DataArray-cond where, infer_freq,
CF decode."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from xarray_spark import XDataset
from xarray_spark.computation import infer_freq
from xarray_spark.dataset import XDataArray
from xarray_spark.io import decode_cf


def make_ds(spark, rows, dims, coords=None, data_vars=None):
    return XDataset(spark.createDataFrame(rows), dims, coords, data_vars)


@pytest.fixture(scope="module")
def grid(spark):
    rows = [
        {"x": x, "y": y, "v": float(x * 10 + y)}
        for x in range(4) for y in range(4)
    ]
    return make_ds(spark, rows, dims=["x", "y"])


def test_rolling_2d_sum(grid):
    out = grid.rolling(x=2, y=2, min_periods=1).sum()
    got = {(r["x"], r["y"]): r["v"] for r in out.df.collect()}
    # rectangle {(0,0),(0,1),(1,0),(1,1)} at corner (1,1): 0+1+10+11
    assert got[(1, 1)] == 22.0
    assert got[(0, 0)] == 0.0


def test_rolling_2d_values(grid):
    out = grid.rolling(x=2, y=2, min_periods=1).sum()
    got = {(r["x"], r["y"]): r["v"] for r in out.df.collect()}
    assert got[(3, 3)] == 22 + 23 + 32 + 33
    outm = grid.rolling(x=2, y=2, min_periods=1).mean()
    gm = {(r["x"], r["y"]): r["v"] for r in outm.df.collect()}
    assert gm[(1, 1)] == 22.0 / 4
    assert gm[(0, 0)] == 0.0  # single cell, min_periods=1
    # default min_periods = 4 masks edges
    outd = grid.rolling(x=2, y=2).mean()
    gd = {(r["x"], r["y"]): r["v"] for r in outd.df.collect()}
    assert gd[(0, 0)] is None and gd[(1, 1)] == 5.5


def test_rolling_2d_count_minmax(grid):
    cnt = grid.rolling(x=2, y=2, min_periods=1).count()
    gc = {(r["x"], r["y"]): r["v"] for r in cnt.df.collect()}
    assert gc[(0, 0)] == 1 and gc[(1, 0)] == 2 and gc[(2, 2)] == 4
    mx = grid.rolling(x=2, y=2, min_periods=1).max()
    assert {(r["x"], r["y"]): r["v"] for r in mx.df.collect()}[(1, 1)] == 11.0


def test_interp_2d_separable(spark):
    rows = [
        {"x": x, "y": y, "v": float(x + y)}
        for x in (0.0, 10.0) for y in (0.0, 10.0)
    ]
    d = make_ds(spark, rows, dims=["x", "y"])
    out = d.interp(x=[5.0], y=[5.0])
    assert out.df.collect()[0]["v"] == 10.0  # bilinear midpoint of plane x+y


def test_interpolate_na_limit(spark):
    rows = [
        {"t": 0, "v": 1.0},
        {"t": 1, "v": None},
        {"t": 2, "v": None},
        {"t": 3, "v": 4.0},
    ]
    d = make_ds(spark, rows, dims=["t"])
    got = {r["t"]: r["v"] for r in d.interpolate_na("t", limit=1).df.collect()}
    assert got[1] == 2.0 and got[2] is None


def test_densify(spark):
    rows = [{"x": 0, "y": 0, "v": 1.0}, {"x": 1, "y": 1, "v": 2.0}]
    d = make_ds(spark, rows, dims=["x", "y"])
    out = d.densify(fill_value=0.0)
    assert out.df.count() == 4
    got = {(r["x"], r["y"]): r["v"] for r in out.df.collect()}
    assert got[(0, 1)] == 0.0 and got[(1, 0)] == 0.0


def test_isel_points(spark):
    rows = [{"x": 10 * i, "y": j, "v": float(10 * i + j)} for i in range(3) for j in range(3)]
    d = make_ds(spark, rows, dims=["x", "y"])
    out = d.isel_points(x=[0, 2], y=[1, -1])
    assert out.dims[0] == "points"
    got = {r["points"]: r["v"] for r in out.df.collect()}
    assert got == {0: 1.0, 1: 22.0}  # (x=0,y=1)=1; (x=20,y=2)=22


def test_where_dataarray_cond(spark):
    rows = [{"t": t, "v": float(t)} for t in range(4)]
    d = make_ds(spark, rows, dims=["t"])
    cond_rows = [{"t": t, "keep": t % 2 == 0} for t in range(4)]
    cond = XDataArray(spark.createDataFrame(cond_rows), ["t"], {}, ["keep"])
    out = d.where(cond)
    got = {r["t"]: r["v"] for r in out.df.collect()}
    assert got == {0: 0.0, 1: None, 2: 2.0, 3: None}


def test_infer_freq(spark):
    rows = [{"t": dt.datetime(2024, 1, 1) + dt.timedelta(days=d), "v": 1.0} for d in range(10)]
    d = make_ds(spark, rows, dims=["t"])
    assert infer_freq(d, "t") == "D"
    rows6 = [{"t": dt.datetime(2024, 1, 1) + dt.timedelta(hours=6 * i), "v": 1.0} for i in range(10)]
    assert infer_freq(make_ds(spark, rows6, dims=["t"]), "t") == "6h"


def test_decode_cf(spark):
    df = spark.createDataFrame(
        [(0, -999, 86400)], "id int, temp int, t int"
    )
    out = decode_cf(df, {
        "temp": {"fill_value": -999, "scale_factor": 0.1, "add_offset": 273.15},
        "t": {"time_units": "seconds since 2000-01-01"},
    })
    r = out.collect()[0]
    assert r["temp"] is None
    assert r["t"] == dt.datetime(2000, 1, 2)
    out2 = decode_cf(df, {"temp": (None, 0.5, None)})
    assert out2.collect()[0]["temp"] == -499.5
