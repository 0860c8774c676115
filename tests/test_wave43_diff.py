"""Differential wave 43 (round 8, second sweep): surfaces the
method-name grep showed unswept — str.cat operand forms (the engine
treated a plain string as a COLUMN NAME where the reference
broadcasts a literal, and rejected DataArray operands), polyfit w=
array-like weights (the reference's positional form), plus
regression pins for the probes that already matched (pad mode
matrix, sortby descending multi-key, reindex tolerance, coarsen
boundary, idxmin fill_value)."""

import sys
import warnings

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
import xarray as xr  # noqa: E402

from xarray_spark import XDataset  # noqa: E402

warnings.filterwarnings("ignore")


# --------------------------------------------------------------------- #
# str.cat operand forms
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def spair(spark):
    vals = ["ab", "cd", ""]
    return (XDataset({"s": ("t", vals)}, coords={"t": [0, 1, 2]}),
            xr.Dataset({"s": ("t", vals)}, coords={"t": [0, 1, 2]}))


def _col(o):
    return o.to_pandas().sort_values("t").iloc[:, -1].tolist()


class TestStrCat:
    def test_literal_operand(self, spair):
        o, r = spair
        assert _col(o["s"].str.cat("ZZ", sep="|")) == \
            r["s"].str.cat("ZZ", sep="|").values.tolist()

    def test_dataarray_operand(self, spair):
        o, r = spair
        assert _col(o["s"].str.cat(o["s"], sep="|")) == \
            r["s"].str.cat(r["s"], sep="|").values.tolist()

    def test_varargs_mixed(self, spair):
        o, r = spair
        assert _col(o["s"].str.cat(o["s"], "Q", sep="-")) == \
            r["s"].str.cat(r["s"], "Q", sep="-").values.tolist()

    def test_cross_frame_operand(self, spair, spark):
        o, _ = spair
        other = XDataset({"u": ("t", ["X", "Y", "Z"])},
                         coords={"t": [0, 1, 2]})
        assert _col(o["s"].str.cat(other["u"], sep="+")) == \
            ["ab+X", "cd+Y", "+Z"]


# --------------------------------------------------------------------- #
# polyfit w= forms
# --------------------------------------------------------------------- #

def _wfit():
    x = np.arange(8, dtype=float)
    y = 2.0 * x + 1.0
    y[-1] += 30.0  # outlier the weights must suppress
    w = np.array([1.0] * 7 + [0.0])
    return x, y, w


def test_polyfit_array_weights(spark):
    x, y, w = _wfit()
    r = xr.Dataset({"v": ("t", y)}, coords={"t": x})
    o = XDataset({"v": ("t", y.tolist())}, coords={"t": x.tolist()})
    ref = r.polyfit("t", 1, w=w)["v_polyfit_coefficients"].values
    got = (o.polyfit("t", 1, w=w.tolist()).to_pandas()
           .sort_values("degree", ascending=False)
           ["v_polyfit_coefficients"].to_numpy())
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_polyfit_dataarray_weights(spark):
    x, y, w = _wfit()
    o = XDataset({"v": ("t", y.tolist())}, coords={"t": x.tolist()})
    wda = XDataset({"wt": ("t", w.tolist())}, coords={"t": x.tolist()})
    got = (o.polyfit("t", 1, w=wda["wt"]).to_pandas()
           .sort_values("degree", ascending=False)
           ["v_polyfit_coefficients"].to_numpy())
    np.testing.assert_allclose(got, [2.0, 1.0], rtol=1e-9)


def test_polyfit_column_weights_still_work(spark):
    x, y, w = _wfit()
    o = XDataset({"v": ("t", y.tolist()), "wt": ("t", w.tolist())},
                 coords={"t": x.tolist()})
    got = (o.polyfit("t", 1, w="wt").to_pandas()
           .sort_values("degree", ascending=False)
           ["v_polyfit_coefficients"].to_numpy())
    np.testing.assert_allclose(got, [2.0, 1.0], rtol=1e-9)


# --------------------------------------------------------------------- #
# regression pins for the matched probes
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("mode", ["reflect", "edge", "wrap", "symmetric",
                                  "maximum", "mean"])
def test_pad_mode_matrix(spark, mode):
    r = xr.Dataset({"v": ("t", [1.0, -2.0, 3.0, np.nan])},
                   coords={"t": [0, 1, 2, 3]})
    o = XDataset({"v": ("t", [1.0, -2.0, 3.0, float("nan")])},
                 coords={"t": [0, 1, 2, 3]})
    ref = [None if isinstance(v, float) and np.isnan(v) else v
           for v in r.pad(t=1, mode=mode)["v"].values.tolist()]
    got = [None if isinstance(v, float) and np.isnan(v) else v
           for v in o.pad(t=1, mode=mode).to_pandas()
           .sort_values("t")["v"].tolist()]
    assert got == ref


def test_sortby_multikey_descending(spark):
    r = xr.Dataset({"a": ("t", [2.0, 1.0, 2.0]),
                    "b": ("t", [1.0, 2.0, 0.0])}, coords={"t": [0, 1, 2]})
    o = XDataset({"a": ("t", [2.0, 1.0, 2.0]),
                  "b": ("t", [1.0, 2.0, 0.0])}, coords={"t": [0, 1, 2]})
    assert o.sortby(["a", "b"], ascending=False).to_pandas()["t"].tolist() \
        == r.sortby(["a", "b"], ascending=False)["t"].values.tolist()


def test_reindex_nearest_tolerance(spark):
    r = xr.Dataset({"v": ("x", [1.0, 2.0, 3.0])},
                   coords={"x": [0.0, 1.0, 2.0]})
    o = XDataset({"v": ("x", [1.0, 2.0, 3.0])},
                 coords={"x": [0.0, 1.0, 2.0]})
    ref = r.reindex(x=[0.1, 0.9, 5.0], method="nearest",
                    tolerance=0.2)["v"].values
    got = (o.reindex(x=[0.1, 0.9, 5.0], method="nearest", tolerance=0.2)
           .to_pandas().sort_values("x")["v"].to_numpy())
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    m = ~np.isnan(ref)
    np.testing.assert_array_equal(got[m], ref[m])


@pytest.mark.parametrize("boundary", ["trim", "pad"])
def test_coarsen_boundary(spark, boundary):
    r = xr.Dataset({"v": ("t", [1.0, 2.0, 4.0, 8.0])},
                   coords={"t": [0, 1, 2, 3]})
    o = XDataset({"v": ("t", [1.0, 2.0, 4.0, 8.0])},
                 coords={"t": [0, 1, 2, 3]})
    ref = r.coarsen(t=3, boundary=boundary).mean()["v"].values.tolist()
    got = (o.coarsen(t=3, boundary=boundary).mean()
           .to_pandas().sort_values("t")["v"].tolist())
    assert got == pytest.approx(ref)


def test_idxmin_fill_value_all_nan_slice(spark):
    r = xr.Dataset({"v": (("k", "t"), [[1.0, 0.5], [np.nan, np.nan]])},
                   coords={"k": [0, 1], "t": [10, 20]})
    o = XDataset({"v": (("k", "t"),
                        [[1.0, 0.5], [float("nan"), float("nan")]])},
                 coords={"k": [0, 1], "t": [10, 20]})
    ref = r.idxmin("t", fill_value=-1)["v"].values.tolist()
    got = (o.idxmin("t", fill_value=-1).to_pandas()
           .sort_values("k")["v"].tolist())
    assert got == ref
