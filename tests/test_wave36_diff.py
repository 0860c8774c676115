"""Differential wave 36: shared Dataset methods that had no
reference-differential coverage (found by a systematic grep of the
149-method shared surface): apply, conj/imag on real data, eval,
filter_by_attrs, get_index, interp_like, reindex_like,
rename_dims/rename_vars, reorder_levels, set_coords, to_array,
drop_indexes, drop_attrs, curvefit."""

import sys
import warnings

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/reference")
import xarray as xr  # noqa: E402

from xarray_spark import XDataset  # noqa: E402

warnings.filterwarnings("ignore")


def _pair(extra_attrs=None):
    vals = np.array([1.5, -2.0, 3.25, 0.0, 4.0])
    spec = dict(
        data_vars={"v": ("t", vals), "w": ("t", vals * 2)},
        coords={"t": np.arange(5.0), "k": ("t", [0, 0, 1, 1, 1])},
        attrs=dict(extra_attrs or {}),
    )
    return xr.Dataset(**spec), XDataset(**spec)


def _vals(o, var="v"):
    return np.asarray(o[var].values, dtype=float)


def test_apply_is_map_alias(spark):
    r, o = _pair()
    rr = r.map(lambda a: a * 2 + 1)
    oo = o.apply(lambda a: a * 2 + 1)
    assert np.allclose(_vals(oo), rr["v"].values)
    assert np.allclose(_vals(oo, "w"), rr["w"].values)


def test_conj_imag_real_on_real_data(spark):
    r, o = _pair()
    assert np.allclose(_vals(o.conj()), r.conj()["v"].values)
    assert np.allclose(_vals(o.conjugate()), r.conjugate()["v"].values)
    ri = np.imag(r["v"].values)
    oi = o["v"].imag
    oi_vals = oi.values if hasattr(oi, "values") else oi
    assert np.allclose(np.asarray(oi_vals, dtype=float), ri)


def test_eval_matches_reference(spark):
    r, o = _pair()
    rr = r.eval("z = v + w * 2")
    oo = o.eval("z = v + w * 2")
    assert np.allclose(_vals(oo, "z"), rr["z"].values)


def test_filter_by_attrs_matches_reference(spark):
    # tuple-form var attrs flow through the dict ctor on BOTH sides
    spec = dict(data_vars={
        "a": ("t", [1.0, 2.0], {"standard_name": "air_temperature"}),
        "b": ("t", [3.0, 4.0])}, coords={"t": [0, 1]})
    r = xr.Dataset(**spec)
    o = XDataset(**spec)
    assert dict(r["a"].attrs) == o.var_attrs("a")
    rf = r.filter_by_attrs(standard_name="air_temperature")
    of = o.filter_by_attrs(standard_name="air_temperature")
    assert list(rf.data_vars) == list(of.data_vars) == ["a"]
    # callable criteria too
    rc = r.filter_by_attrs(standard_name=lambda v: v is not None)
    oc = o.filter_by_attrs(standard_name=lambda v: v is not None)
    assert list(rc.data_vars) == list(oc.data_vars) == ["a"]


def test_get_index_matches_reference(spark):
    r, o = _pair()
    ri = r.get_index("t")
    oi = o.get_index("t")
    assert list(pd.Index(oi)) == list(ri)
    with pytest.raises(KeyError):
        r.get_index("zz")
    with pytest.raises(KeyError):
        o.get_index("zz")


def test_interp_like_matches_linear_closed_form(spark):
    # the reference's interp needs scipy (absent in this runtime) —
    # linear interpolation has a closed form to pin against instead
    r, o = _pair()
    tgt_spec = dict(data_vars={"u": ("t", [0.0, 0.0, 0.0])},
                    coords={"t": [0.5, 2.5, 3.5]})
    ot = XDataset(**tgt_spec)
    oo = o.interp_like(ot)
    ov = np.asarray(oo["v"].to_series().sort_index())
    src = np.array([1.5, -2.0, 3.25, 0.0, 4.0])
    expect = np.interp([0.5, 2.5, 3.5], np.arange(5.0), src)
    assert np.allclose(ov, expect)


def test_reindex_like_matches_reference(spark):
    r, o = _pair()
    tgt_spec = dict(data_vars={"u": ("t", [0.0, 0.0, 0.0])},
                    coords={"t": [1.0, 3.0, 9.0]})
    rt = xr.Dataset(**tgt_spec)
    ot = XDataset(**tgt_spec)
    rr = r.reindex_like(rt)
    oo = o.reindex_like(ot)
    ov = oo["v"].to_series().sort_index()
    rv = rr["v"].values
    assert np.allclose(ov.fillna(-999), np.nan_to_num(rv, nan=-999))
    rr2 = r.reindex_like(rt, method="nearest")
    oo2 = o.reindex_like(ot, method="nearest")
    assert np.allclose(np.asarray(oo2["v"].to_series().sort_index()),
                       rr2["v"].values)


def test_rename_dims_and_vars_match_reference(spark):
    r, o = _pair()
    rr = r.rename_dims({"t": "time"})
    oo = o.rename_dims({"t": "time"})
    assert "time" in rr.dims and oo.dims == ("time",)
    rr2 = r.rename_vars({"v": "val"})
    oo2 = o.rename_vars({"v": "val"})
    assert set(rr2.data_vars) == set(oo2.data_vars) == {"val", "w"}
    with pytest.raises(ValueError):
        r.rename_vars({"zz": "q"})
    with pytest.raises((KeyError, ValueError)):
        o.rename_vars({"zz": "q"})


def test_reorder_levels_matches_reference(spark):
    midx = pd.MultiIndex.from_product([[1, 2], ["a", "b"]],
                                      names=["one", "two"])
    rc = xr.Coordinates.from_pandas_multiindex(midx, "z")
    r = xr.Dataset({"v": ("z", [1.0, 2.0, 3.0, 4.0])}, coords=rc)
    from xarray_spark import Coordinates
    oc = Coordinates.from_pandas_multiindex(midx, "z")
    o = XDataset({"v": ("z", [1.0, 2.0, 3.0, 4.0])}, coords=oc)
    rr = r.reorder_levels(z=["two", "one"])
    oo = o.reorder_levels(z=["two", "one"])
    # same sel result after the level swap
    assert float(oo.sel(z=("b", 2))["v"].values[0]) == float(
        rr.sel(z=("b", 2))["v"])


def test_set_coords_and_reset_roundtrip(spark):
    r, o = _pair()
    rr = r.set_coords("w")
    oo = o.set_coords("w")
    assert set(rr.coords) >= {"w"} and "w" in oo.coords
    assert list(rr.data_vars) == ["v"] and list(oo.data_vars) == ["v"]
    rb = rr.reset_coords("w")
    ob = oo.reset_coords("w")
    assert "w" in rb.data_vars and "w" in ob.data_vars


def test_to_array_matches_to_dataarray(spark):
    r, o = _pair()
    rr = r.to_array(dim="variable")
    oo = o.to_array(dim="variable")
    rv = rr.to_series().sort_index()
    ov = oo.to_series().sort_index()
    assert np.allclose(np.asarray(ov), rv.values)


def test_drop_indexes_keeps_values(spark):
    r, o = _pair()
    rr = r.drop_indexes("t")
    oo = o.drop_indexes("t")
    assert "t" in rr.coords
    assert np.allclose(_vals(oo), rr["v"].values)


def test_drop_attrs_matches_reference(spark):
    r, o = _pair(extra_attrs={"title": "x", "n": 3})
    rr = r.drop_attrs()
    oo = o.drop_attrs()
    assert dict(rr.attrs) == {} and oo.attrs == {}


def test_curvefit_recovers_exact_exponential(spark):
    # the reference's curvefit needs scipy (absent in this runtime) —
    # exact synthetic data pins the fit instead: the optimizer must
    # recover the generating parameters
    t = np.arange(0.0, 8.0)
    y = 2.5 * np.exp(-0.35 * t)
    o = XDataset({"y": ("t", y)}, coords={"t": t})

    def f(x, a, b):
        return a * np.exp(-b * x)

    oo = o.curvefit("t", f, p0={"a": 1.0, "b": 0.1})
    op = oo.to_pandas().set_index("param")["y_curvefit_coefficients"]
    assert abs(op["a"] - 2.5) < 1e-5
    assert abs(op["b"] - 0.35) < 1e-5


class TestDataArraySmallSurface:
    """DataArray-only accessors that had no differential coverage:
    T, item, get_axis_num, to_index, to_masked_array."""

    def _pair(self):
        arr = np.arange(6.0).reshape(2, 3)
        r = xr.DataArray(arr, coords={"x": [1, 2], "y": [10, 20, 30]},
                         dims=("x", "y"), name="v")
        from xarray_spark import XDataArray
        o = XDataArray(arr, coords={"x": [1, 2], "y": [10, 20, 30]},
                       dims=("x", "y"), name="v")
        return r, o

    def test_transpose_T(self, spark):
        r, o = self._pair()
        assert o.T.dims == tuple(r.T.dims) == ("y", "x")
        assert np.allclose(np.asarray(o.T.to_numpy()), r.T.values)

    def test_item_scalar(self, spark):
        r, o = self._pair()
        rv = r.sel(x=2, y=20).item()
        ov = o.sel(x=2, y=20).item()
        assert ov == rv == 4.0

    def test_get_axis_num(self, spark):
        r, o = self._pair()
        assert o.get_axis_num("y") == r.get_axis_num("y") == 1
        assert o.get_axis_num("x") == r.get_axis_num("x") == 0

    def test_to_index_1d(self, spark):
        arr = np.array([3.0, 1.0, 2.0])
        r = xr.DataArray(arr, coords={"t": [5, 6, 7]}, dims="t", name="v")
        from xarray_spark import XDataArray
        o = XDataArray(arr, coords={"t": [5, 6, 7]}, dims="t", name="v")
        assert list(o.to_index()) == list(r.to_index())

    def test_to_masked_array(self, spark):
        arr = np.array([1.0, np.nan, 3.0])
        r = xr.DataArray(arr, dims="t", name="v")
        from xarray_spark import XDataArray
        o = XDataArray(arr, dims="t", name="v")
        rm = r.to_masked_array()
        om = o.to_masked_array()
        assert list(np.asarray(om.mask)) == list(np.asarray(rm.mask))
        assert np.allclose(np.asarray(om.filled(-1)), rm.filled(-1))

    def test_to_index_name_matches_reference(self, spark):
        arr = np.array([3.0, 1.0, 2.0])
        r = xr.DataArray(arr, coords={"t": [5, 6, 7]}, dims="t", name="v")
        from xarray_spark import XDataArray
        o = XDataArray(arr, coords={"t": [5, 6, 7]}, dims="t", name="v")
        assert o.to_index().name == r.to_index().name == "t"


class TestBroadcastVarReductions:
    """Vars built by the dict constructor on a dim SUBSET: reductions
    over dims the var lacks must leave it untouched (reference
    semantics), not aggregate the broadcast copies."""

    def _pair(self):
        arr = np.arange(6.0).reshape(2, 3)
        spec = dict(data_vars={"t": (("x", "y"), arr),
                               "u": ("x", [10.0, 20.0])},
                    coords={"x": [1, 2], "y": [7, 8, 9]})
        return xr.Dataset(**spec), XDataset(**spec)

    def test_sum_over_missing_dim_leaves_var(self, spark):
        r, o = self._pair()
        rr = r.sum("y")
        oo = o.sum("y")
        assert np.allclose(np.asarray(oo["u"].to_series().sort_index()),
                           rr["u"].values)          # NOT 3x inflated
        assert np.allclose(np.asarray(oo["t"].to_series().sort_index()),
                           rr["t"].values)

    def test_std_count_over_missing_dim(self, spark):
        r, o = self._pair()
        for m in ("std", "count", "mean", "max"):
            rr = getattr(r, m)("y")
            oo = getattr(o, m)("y")
            assert np.allclose(
                np.asarray(oo["u"].to_series().sort_index(), dtype=float),
                np.asarray(rr["u"].values, dtype=float)), m

    def test_reduce_over_own_dim_still_aggregates(self, spark):
        r, o = self._pair()
        rr = r.sum("x")
        oo = o.sum("x")
        assert np.allclose(np.asarray(oo["u"].to_series().sort_index()
                                      if oo["u"].dims else
                                      [float(oo["u"].values)]),
                           np.atleast_1d(rr["u"].values))

    def test_metadata_survives_replace_chain(self, spark):
        _, o = self._pair()
        o2 = o.assign_attrs(note="x").fillna(0.0)
        assert o2.var_dims.get("u") == ("x",)
        # renaming the dim invalidates the stale entry safely
        o3 = o.rename({"x": "x2"})
        rr = o3.sum("y")
        assert rr is not None  # falls back to span-all semantics

    def test_nan_element_and_ddof_match_reference(self, spark):
        spec = dict(data_vars={"t": (("x", "y"),
                                     np.arange(6.0).reshape(2, 3)),
                               "u": ("x", [10.0, np.nan])},
                    coords={"x": [1, 2], "y": [7, 8, 9]})
        r = xr.Dataset(**spec)
        o = XDataset(**spec)
        for call in (lambda d: d.sum("y"), lambda d: d.count("y"),
                     lambda d: d.std("y"), lambda d: d.std("y", ddof=1),
                     lambda d: d.all("y"), lambda d: d.any("y")):
            rv = np.asarray(call(r)["u"].values, dtype=float)
            ov = np.asarray(call(o)["u"].to_series().sort_index(),
                            dtype=float)
            both_nan = np.isnan(rv) & np.isnan(ov)
            assert ((rv == ov) | both_nan).all(), (rv, ov)


def test_accessor_obj_and_groupby_assign_coords(spark):
    o = XDataset({"v": ("t", [1.0, 2.0, 3.0, 4.0])},
                 coords={"t": [0, 1, 2, 3], "k": ("t", [0, 0, 1, 1])})
    assert o.rolling(t=2).obj is o
    assert o.coarsen(t=2).obj is o
    assert o.weighted("v").obj is o
    g = o.groupby("k")
    assert g.obj is o
    # reference: GroupBy.assign_coords applies per group; keys are
    # unchanged, so values round-trip and the new coord appears
    r = xr.Dataset({"v": ("t", [1.0, 2.0, 3.0, 4.0])},
                   coords={"t": [0, 1, 2, 3], "k": ("t", [0, 0, 1, 1])})
    rr = r.groupby("k").assign_coords(c2=99)
    oo = g.assign_coords(c2=99)
    assert "c2" in rr.coords and set(np.atleast_1d(rr["c2"].values)) == {99}
    p = oo.to_pandas().sort_values("t")
    assert "c2" in p.columns and set(p["c2"]) == {99}
    assert np.allclose(p["v"], [1.0, 2.0, 3.0, 4.0])


def test_cross_dims_binary_broadcast_matches_reference(spark):
    arr = np.arange(6.0).reshape(2, 3)
    r1 = xr.Dataset({"v": (("x", "y"), arr)},
                    coords={"x": [1, 2], "y": [7, 8, 9]})
    r2 = xr.Dataset({"v": ("x", [10.0, 20.0])}, coords={"x": [1, 2]})
    o1 = XDataset({"v": (("x", "y"), arr)},
                  coords={"x": [1, 2], "y": [7, 8, 9]})
    o2 = XDataset({"v": ("x", [10.0, 20.0])}, coords={"x": [1, 2]})
    for op in (lambda a, b: a + b, lambda a, b: a * b,
               lambda a, b: b - a):
        rv = op(r1, r2)["v"].values.ravel()
        ov = np.asarray(op(o1, o2)["v"].to_series().sort_index())
        assert np.allclose(rv, ov)


def test_groupby_over_2d_coord_matches_reference(spark):
    arr = np.arange(12.0).reshape(3, 4)
    spec = dict(data_vars={"v": (("x", "y"), arr)},
                coords={"x": [0, 1, 2], "y": [0, 1, 2, 3],
                        "band": ("x", ["a", "b", "a"])})
    r = xr.Dataset(**spec)
    o = XDataset(**spec)
    rr = r.groupby("band").mean()
    oo = o.groupby("band").mean()
    rv = rr["v"].to_series().sort_index()
    ov = oo["v"].to_series().sort_index()
    assert np.allclose(np.asarray(ov), rv.values)


def test_stack_unstack_expand_dims_through_ctor(spark):
    arr = np.arange(6.0).reshape(2, 3)
    spec = dict(data_vars={"v": (("x", "y"), arr)},
                coords={"x": [1, 2], "y": [7, 8, 9]})
    r = xr.Dataset(**spec)
    o = XDataset(**spec)
    rs = r.stack(z=("x", "y"))
    os_ = o.stack(z=("x", "y"))
    op = os_.df.toPandas().sort_values(["x", "y"])
    assert np.allclose(op["v"].to_numpy(), rs["v"].values)
    ru = rs.unstack("z")
    ou = os_.unstack("z")
    assert np.allclose(np.asarray(ou["v"].to_series().sort_index()),
                       ru["v"].values.ravel())
    re_ = r.expand_dims(w=[0, 1]).sum("w")
    oe = o.expand_dims(w=[0, 1]).sum("w")
    assert np.allclose(np.asarray(oe["v"].to_series().sort_index()),
                       re_["v"].values.ravel())
