"""Unit tests for operators not (or only partially) covered by the
driver's oracle queries. Tiny in-memory frames; xarray semantics are the
spec (reference file:line cited per test)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from xarray_spark import (
    XDataset,
    align,
    broadcast,
    concat,
    merge,
    ufuncs,
)
from xarray_spark.dataset import XDataArray


def make_ds(spark, rows, dims, coords=None, data_vars=None):
    df = spark.createDataFrame(rows)
    return XDataset(df, dims, coords, data_vars)


@pytest.fixture(scope="module")
def ds(spark):
    rows = [
        {"x": x, "y": y, "v": float(10 * x + y), "w": float(x + y)}
        for x in range(4)
        for y in range(3)
    ]
    return make_ds(spark, rows, dims=["x", "y"])


# ---------------------------------------------------------------- selection


def test_sel_scalar_drops_dim(ds):
    out = ds.sel(x=2)
    assert out.dims == ("y",)
    got = {r["y"]: r["v"] for r in out.df.collect()}
    assert got == {0: 20.0, 1: 21.0, 2: 22.0}


def test_sel_list_and_slice(ds):
    assert ds.sel(x=[1, 3]).df.count() == 6
    # label slices inclusive both ends (xarray core/dataset.py:3018)
    assert ds.sel(x=slice(1, 2)).df.count() == 6


def test_isel_negative_and_step(ds):
    out = ds.isel(x=-1)
    assert {r["v"] for r in out.df.collect()} == {30.0, 31.0, 32.0}
    out2 = ds.isel(x=slice(0, 4, 2))
    assert {r["x"] for r in out2.df.collect()} == {0, 2}


def test_isel_list(ds):
    out = ds.isel(x=[0, -1])
    assert {r["x"] for r in out.df.collect()} == {0, 3}


def test_head_tail_thin(ds):
    assert ds.head(x=2).df.count() == 6
    assert {r["x"] for r in ds.tail(x=1).df.collect()} == {3}
    assert {r["x"] for r in ds.thin(x=2).df.collect()} == {0, 2}


def test_sel_nearest_scalar(ds):
    out = ds.sel(x=1.4, method="nearest")
    assert {r["v"] for r in out.df.collect()} == {10.0, 11.0, 12.0}


def test_drop_sel_drop_isel(ds):
    assert ds.drop_sel(x=[0]).df.count() == 9
    assert {r["x"] for r in ds.drop_isel(x=[0, -1]).df.collect()} == {1, 2}


def test_where_drop(ds):
    out = ds.where(F.col("v") >= 20, drop=True)
    assert set(r["x"] for r in out.df.collect()) == {2, 3}
    # masked (non-dropped) rows keep labels with null values
    out2 = ds.where(F.col("v") >= 20)
    n_null = out2.df.where(F.col("v").isNull()).count()
    assert n_null == 6 and out2.df.count() == 12


def test_drop_duplicates(spark):
    rows = [
        {"t": 1, "v": 1.0},
        {"t": 1, "v": 2.0},
        {"t": 2, "v": 3.0},
    ]
    d = make_ds(spark, rows, dims=["t"])
    assert d.drop_duplicates("t").df.count() == 2


# ---------------------------------------------------------------- reductions


def test_mean_over_one_dim(ds):
    out = ds.mean("y")
    got = {r["x"]: r["v"] for r in out.df.collect()}
    assert got == {0: 1.0, 1: 11.0, 2: 21.0, 3: 31.0}


def test_global_reduce(ds):
    row = ds.sum().df.collect()[0]
    assert row["v"] == sum(10 * x + y for x in range(4) for y in range(3))


def test_skipna_false_poisons(spark):
    rows = [{"t": 0, "v": 1.0}, {"t": 1, "v": None}, {"t": 2, "v": 3.0}]
    d = make_ds(spark, rows, dims=["t"])
    assert d.mean().df.collect()[0]["v"] == 2.0
    assert d.mean(skipna=False).df.collect()[0]["v"] is None


def test_sum_min_count(spark):
    rows = [{"t": 0, "v": 1.0}, {"t": 1, "v": None}]
    d = make_ds(spark, rows, dims=["t"])
    assert d.sum(min_count=2).df.collect()[0]["v"] is None
    assert d.sum(min_count=1).df.collect()[0]["v"] == 1.0


def test_std_ddof(spark):
    rows = [{"t": i, "v": float(v)} for i, v in enumerate([1, 2, 3, 4])]
    d = make_ds(spark, rows, dims=["t"])
    # xarray default ddof=0 (population)
    assert abs(d.std().df.collect()[0]["v"] - 1.118033988749895) < 1e-12
    assert abs(d.std(ddof=1).df.collect()[0]["v"] - 1.2909944487358056) < 1e-12


def test_argmax_idxmax(spark):
    rows = [{"t": t, "v": float(v)} for t, v in [(10, 1), (20, 5), (30, 3)]]
    d = make_ds(spark, rows, dims=["t"])
    assert d.idxmax("t").df.collect()[0]["v"] == 20
    assert d.argmax("t").df.collect()[0]["v"] == 1  # position, not label
    assert d.idxmin("t").df.collect()[0]["v"] == 10


def test_cumsum(ds):
    out = ds.cumsum("y")
    got = {(r["x"], r["y"]): r["v"] for r in out.df.collect()}
    assert got[(1, 2)] == 10.0 + 11.0 + 12.0


def test_count_all_any(spark):
    rows = [{"t": 0, "v": True}, {"t": 1, "v": False}, {"t": 2, "v": None}]
    d = make_ds(spark, rows, dims=["t"])
    assert d.count().df.collect()[0]["v"] == 2
    assert d.all().df.collect()[0]["v"] is False
    assert d.any().df.collect()[0]["v"] is True


# ---------------------------------------------------------------- window ops


def test_shift(spark):
    rows = [{"t": i, "v": float(i)} for i in range(4)]
    d = make_ds(spark, rows, dims=["t"])
    got = {r["t"]: r["v"] for r in d.shift(t=1).df.collect()}
    assert got == {0: None, 1: 0.0, 2: 1.0, 3: 2.0}


def test_roll(spark):
    rows = [{"t": i, "v": float(i)} for i in range(4)]
    d = make_ds(spark, rows, dims=["t"])
    got = {r["t"]: r["v"] for r in d.roll(t=1).df.collect()}
    # value at pos p moves to label at pos (p+1) % n
    assert got == {0: 3.0, 1: 0.0, 2: 1.0, 3: 2.0}


def test_rolling_center(spark):
    rows = [{"t": i, "v": float(i)} for i in range(5)]
    d = make_ds(spark, rows, dims=["t"])
    out = d.rolling(t=3, center=True, min_periods=1).mean()
    got = {r["t"]: r["v"] for r in out.df.collect()}
    assert got[0] == 0.5 and got[2] == 2.0 and got[4] == 3.5


def test_rolling_construct_and_reduce(spark):
    rows = [{"t": i, "v": float(i)} for i in range(4)]
    d = make_ds(spark, rows, dims=["t"])
    con = d.rolling(t=2).construct("w")
    assert con.dims == ("t", "w")
    arrs = {(r["t"], r["w"]): r["v"] for r in con.df.collect()}
    # aligned: current element last; first row front-padded with null
    assert arrs[(2, 0)] == 1.0 and arrs[(2, 1)] == 2.0
    assert arrs[(0, 0)] is None and arrs[(0, 1)] == 0.0
    assert len(arrs) == 8
    red = d.rolling(t=2).reduce(lambda a: float(a.sum()))
    got = {r["t"]: r["v"] for r in red.df.collect()}
    assert got == {0: None, 1: 1.0, 2: 3.0, 3: 5.0}


def test_coarsen(spark):
    rows = [{"t": i, "v": float(i)} for i in range(6)]
    d = make_ds(spark, rows, dims=["t"])
    out = d.coarsen(t=2).mean()
    assert sorted(r["v"] for r in out.df.collect()) == [0.5, 2.5, 4.5]


def test_diff_multi_dim_partition(ds):
    out = ds.diff("y")
    # every x keeps 2 rows (first y dropped), diff == 1
    rows = out.df.collect()
    assert len(rows) == 8 and all(r["v"] == 1.0 for r in rows)


# ---------------------------------------------------------------- missing


def test_bfill_limit(spark):
    rows = [{"t": 0, "v": None}, {"t": 1, "v": None}, {"t": 2, "v": 5.0}]
    d = make_ds(spark, rows, dims=["t"])
    got = {r["t"]: r["v"] for r in d.bfill("t", limit=1).df.collect()}
    assert got == {0: None, 1: 5.0, 2: 5.0}


def test_ffill_limit(spark):
    rows = [{"t": 0, "v": 1.0}, {"t": 1, "v": None}, {"t": 2, "v": None}]
    d = make_ds(spark, rows, dims=["t"])
    got = {r["t"]: r["v"] for r in d.ffill("t", limit=1).df.collect()}
    assert got == {0: 1.0, 1: 1.0, 2: None}


def test_dropna(spark):
    rows = [
        {"t": 0, "a": 1.0, "b": None},
        {"t": 1, "a": 2.0, "b": 2.0},
        {"t": 2, "a": None, "b": None},
    ]
    d = make_ds(spark, rows, dims=["t"])
    assert {r["t"] for r in d.dropna("t").df.collect()} == {1}
    assert {r["t"] for r in d.dropna("t", how="all").df.collect()} == {0, 1}
    assert {r["t"] for r in d.dropna("t", thresh=1).df.collect()} == {0, 1}


def test_fillna_dict_scalar(spark):
    df = spark.createDataFrame([(0, None, None)], "t int, a double, b double")
    d = XDataset(df, dims=["t"])
    r = d.fillna({"a": 1.0}).df.collect()[0]
    assert r["a"] == 1.0 and r["b"] is None
    r2 = d.fillna(9.0).df.collect()[0]
    assert r2["a"] == 9.0 and r2["b"] == 9.0


def test_interpolate_na_interior_only(spark):
    rows = [
        {"t": 0, "v": None},
        {"t": 1, "v": 1.0},
        {"t": 2, "v": None},
        {"t": 3, "v": 4.0},
        {"t": 4, "v": None},
    ]
    d = make_ds(spark, rows, dims=["t"])
    got = {r["t"]: r["v"] for r in d.interpolate_na("t").df.collect()}
    assert got[0] is None and got[2] == 2.5 and got[4] is None


def test_interp_new_grid(spark):
    rows = [{"t": 0.0, "v": 0.0}, {"t": 10.0, "v": 100.0}]
    d = make_ds(spark, rows, dims=["t"])
    out = d.interp(t=[2.5, 5.0])
    got = {r["t"]: r["v"] for r in out.df.collect()}
    assert got == {2.5: 25.0, 5.0: 50.0}


# ---------------------------------------------------------------- combine


def test_concat_new_dim(spark):
    a = make_ds(spark, [{"t": 0, "v": 1.0}], dims=["t"])
    b = make_ds(spark, [{"t": 0, "v": 2.0}], dims=["t"])
    out = concat([a, b], dim="run", labels=["a", "b"])
    assert out.dims == ("run", "t")
    got = {r["run"]: r["v"] for r in out.df.collect()}
    assert got == {"a": 1.0, "b": 2.0}


def test_merge_adds_variables(spark):
    a = make_ds(spark, [{"t": 0, "u": 1.0}], dims=["t"])
    b = make_ds(spark, [{"t": 0, "w": 2.0}], dims=["t"])
    out = merge([a, b])
    r = out.df.collect()[0]
    assert r["u"] == 1.0 and r["w"] == 2.0
    assert set(out.data_vars) == {"u", "w"}


def test_align_inner_outer(spark):
    a = make_ds(spark, [{"t": 0, "v": 1.0}, {"t": 1, "v": 2.0}], dims=["t"])
    b = make_ds(spark, [{"t": 1, "v": 3.0}, {"t": 2, "v": 4.0}], dims=["t"])
    ai, bi = align(a, b, join="inner")
    assert {r["t"] for r in ai.df.collect()} == {1}
    assert {r["t"] for r in bi.df.collect()} == {1}
    with pytest.raises(ValueError):
        align(a, b, join="exact")


def test_broadcast(spark):
    a = make_ds(spark, [{"x": 0, "v": 1.0}, {"x": 1, "v": 2.0}], dims=["x"])
    b = make_ds(spark, [{"y": 10, "w": 5.0}], dims=["y"])
    ab, bb = broadcast(a, b)
    assert set(ab.dims) == {"x", "y"} and ab.df.count() == 2
    assert set(bb.dims) == {"y", "x"} and bb.df.count() == 2


def test_binary_op_cross_dims(spark):
    a = make_ds(spark, [{"x": 0, "v": 1.0}, {"x": 1, "v": 2.0}], dims=["x"])
    b = make_ds(spark, [{"y": 0, "v": 10.0}, {"y": 1, "v": 20.0}], dims=["y"])
    out = a + b
    assert set(out.dims) == {"x", "y"}
    assert sorted(r["v"] for r in out.df.collect()) == [11.0, 12.0, 21.0, 22.0]


def test_combine_first(spark):
    a = make_ds(spark, [{"t": 0, "v": None}, {"t": 1, "v": 1.0}], dims=["t"])
    b = make_ds(spark, [{"t": 0, "v": 9.0}, {"t": 2, "v": 2.0}], dims=["t"])
    out = a.combine_first(b)
    got = {r["t"]: r["v"] for r in out.df.collect()}
    assert got == {0: 9.0, 1: 1.0, 2: 2.0}


# ---------------------------------------------------------------- reshape


def test_stack_unstack_roundtrip(ds):
    st = ds.stack(z=["x", "y"])
    assert st.dims == ("z",)
    back = st.unstack("z")
    assert set(back.dims) == {"x", "y"}
    assert back.df.count() == 12


def test_expand_dims(spark):
    d = make_ds(spark, [{"t": 0, "v": 1.0}], dims=["t"])
    out = d.expand_dims(run=["a", "b"])
    assert out.dims == ("run", "t") and out.df.count() == 2


def test_swap_dims(spark):
    rows = [{"t": 0, "year": 2000, "v": 1.0}, {"t": 1, "year": 2001, "v": 2.0}]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], coords={"year": ("t",)})
    out = d.swap_dims(t="year")
    assert out.dims == ("year",)


def test_to_dataarray_melt(spark):
    d = make_ds(spark, [{"t": 0, "a": 1.0, "b": 2.0}], dims=["t"])
    out = d.to_dataarray(dim="variable")
    got = {r["variable"]: r["value"] for r in out.df.collect()}
    assert got == {"a": 1.0, "b": 2.0}


def test_rename(ds):
    out = ds.rename(x="xx", v="vv")
    assert "xx" in out.dims and "vv" in out.data_vars


def test_transpose_metadata_only(ds):
    out = ds.transpose("y", "x")
    assert out.dims == ("y", "x")


# ---------------------------------------------------------------- computation


def test_dot(spark):
    df = spark.createDataFrame([{"i": i, "a": float(i), "b": 2.0} for i in range(3)])
    a = XDataArray(df, ["i"], {}, ["a"])
    b = XDataArray(df, ["i"], {}, ["b"])
    from xarray_spark import dot

    out = dot(a, b, dim="i")
    assert out.df.collect()[0][0] == 6.0  # 0*2 + 1*2 + 2*2


def test_cov(spark):
    df = spark.createDataFrame(
        [{"i": i, "a": float(i), "b": float(2 * i)} for i in range(4)]
    )
    a = XDataArray(df, ["i"], {}, ["a"])
    b = XDataArray(df, ["i"], {}, ["b"])
    from xarray_spark import cov

    # cov(x, 2x) ddof=1 over [0..3] = 2 * var_samp = 2 * 5/3
    assert abs(cov(a, b).df.collect()[0][0] - 10.0 / 3.0) < 1e-12


def test_polyval(spark):
    df = spark.createDataFrame([{"i": i, "x": float(i)} for i in range(3)])
    x = XDataArray(df, ["i"], {}, ["x"])
    from xarray_spark import polyval

    out = polyval(x, {0: 1.0, 1: 2.0})  # 1 + 2x
    got = sorted(r["polyval"] for r in out.df.collect())
    assert got == [1.0, 3.0, 5.0]


def test_differentiate(spark):
    rows = [{"t": float(t), "v": float(t * t)} for t in range(4)]
    d = make_ds(spark, rows, dims=["t"])
    got = {r["t"]: r["v"] for r in d.differentiate("t").df.collect()}
    # central differences of t^2: edges one-sided
    assert got == {0.0: 1.0, 1.0: 2.0, 2.0: 4.0, 3.0: 5.0}


def test_weighted_sum(spark):
    rows = [{"t": 0, "v": 1.0, "w": 2.0}, {"t": 1, "v": 3.0, "w": 0.5}]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], data_vars=["v"])
    out = d.weighted("w").sum()
    assert out.df.collect()[0]["v"] == 3.5


def test_apply_ufunc_grouped(spark):
    import pandas as pd

    rows = [{"g": g, "t": t, "v": float(t)} for g in range(2) for t in range(3)]
    d = XDataset(spark.createDataFrame(rows), dims=["g", "t"])
    from xarray_spark import apply_ufunc

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = apply_ufunc(demean, d, input_core_dims=[["t"]])
    vals = sorted(r["v"] for r in out.df.collect())
    assert vals == [-1.0, -1.0, 0.0, 0.0, 1.0, 1.0]


def test_reduce_udaf(spark):
    rows = [{"t": t, "v": float(t)} for t in range(4)]
    d = make_ds(spark, rows, dims=["t"])
    out = d.reduce(lambda a: float(a.max() - a.min()), "t")
    assert out.df.collect()[0]["v"] == 3.0


# ---------------------------------------------------------------- ufuncs/accessors


def test_ufuncs_on_dataset(spark):
    import math

    d = make_ds(spark, [{"t": 0, "v": 4.0}], dims=["t"])
    assert ufuncs.sqrt(d).df.collect()[0]["v"] == 2.0
    assert abs(ufuncs.exp(d).df.collect()[0]["v"] - math.exp(4.0)) < 1e-9


def test_str_accessor(spark):
    df = spark.createDataFrame([{"i": 0, "s": "Hello World"}])
    da = XDataArray(df, ["i"], {}, ["s"])
    assert da.str.lower().df.collect()[0]["s"] == "hello world"
    assert da.str.len().df.collect()[0]["s"] == 11
    assert da.str.contains("World").df.collect()[0]["s"] is True
    assert da.str.replace("World", "x").df.collect()[0]["s"] == "Hello x"


def test_dt_accessor(spark):
    df = spark.createDataFrame([{"i": 0, "ts": dt.datetime(2024, 2, 29, 13, 45)}])
    da = XDataArray(df, ["i"], {}, ["ts"])
    assert da.dt.year.df.collect()[0]["ts"] == 2024
    assert da.dt.is_leap_year.df.collect()[0]["ts"] is True
    assert da.dt.dayofweek.df.collect()[0]["ts"] == 3  # Thursday
    assert da.dt.season.df.collect()[0]["ts"] == "DJF"


def test_groupby_binary_op(spark):
    # group by a coord on dim t (the xarray transform pattern:
    # ds.groupby('b') - ds.groupby('b').mean(); core/groupby.py:883)
    rows = [{"t": t, "g": t % 2, "v": float(t)} for t in range(4)]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], coords={"g": ("t",)})
    g = d.groupby("g")
    out = g - g.mean()
    vals = {r["t"]: r["v"] for r in out.df.collect()}
    # group g=0: t∈{0,2} mean 1 → [-1, 1]; g=1: t∈{1,3} mean 2 → [-1, 1]
    assert vals == {0: -1.0, 1: -1.0, 2: 1.0, 3: 1.0}


def test_groupby_first_last(spark):
    rows = [
        {"t": 0, "g": "a", "v": None},
        {"t": 1, "g": "a", "v": 2.0},
        {"t": 2, "g": "a", "v": 3.0},
    ]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], coords={"g": ("t",)})
    assert d.groupby("g").first().df.collect()[0]["v"] == 2.0
    assert d.groupby("g").last().df.collect()[0]["v"] == 3.0


# ---------------------------------------------------------------- IO


def test_parquet_roundtrip(spark, tmp_path):
    rows = [{"t": 0, "v": 1.0}, {"t": 1, "v": 2.0}]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    path = str(tmp_path / "ds.parquet")
    d.to_parquet(path)
    from xarray_spark import open_dataset

    back = open_dataset(spark, path)
    assert back.dims == ("t",)
    assert {r["v"] for r in back.df.collect()} == {1.0, 2.0}
