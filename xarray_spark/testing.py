"""Public assertion helpers (reference: xarray/testing/assertions.py) —
the API downstream test suites import as ``xarray.testing``.

Comparisons materialize both datasets (driver action, test-sized data)
and compare order-insensitively on the dim key columns.
"""

from __future__ import annotations

import math

from xarray_spark.dataset import XDataset


def _frames(a: XDataset, b: XDataset):
    cols = sorted(a.df.columns)
    if sorted(b.df.columns) != cols:
        raise AssertionError(
            f"column sets differ: {sorted(a.df.columns)} vs {sorted(b.df.columns)}")
    pa = a.df.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    pb = b.df.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    return pa, pb


def assert_equal(a: XDataset, b: XDataset) -> None:
    """Same dims/vars/values (attrs ignored) —
    xarray.testing.assert_equal."""
    if list(a.dims) != list(b.dims):
        raise AssertionError(f"dims differ: {list(a.dims)} vs {list(b.dims)}")
    pa, pb = _frames(a, b)
    if len(pa) != len(pb):
        raise AssertionError(f"row counts differ: {len(pa)} vs {len(pb)}")
    bad = (pa != pb) & ~(pa.isna() & pb.isna())
    if bad.to_numpy().any():
        col = bad.any()[bad.any()].index[0]
        i = bad[col].idxmax()
        raise AssertionError(
            f"values differ in {col!r} at row {i}: "
            f"{pa[col].iloc[i]!r} vs {pb[col].iloc[i]!r}")


def assert_identical(a: XDataset, b: XDataset) -> None:
    """assert_equal + attrs equality — xarray.testing.assert_identical."""
    if (a.attrs or {}) != (b.attrs or {}):
        raise AssertionError(f"attrs differ: {a.attrs} vs {b.attrs}")
    assert_equal(a, b)


def assert_allclose(a: XDataset, b: XDataset, rtol: float = 1e-05,
                    atol: float = 1e-08) -> None:
    """Float-tolerant comparison — xarray.testing.assert_allclose."""
    import numpy as np
    import pandas as pd
    if list(a.dims) != list(b.dims):
        raise AssertionError(f"dims differ: {list(a.dims)} vs {list(b.dims)}")
    pa, pb = _frames(a, b)
    if len(pa) != len(pb):
        raise AssertionError(f"row counts differ: {len(pa)} vs {len(pb)}")
    for c in pa.columns:
        if pd.api.types.is_float_dtype(pa[c]):
            x, y = pa[c].to_numpy(), pb[c].to_numpy()
            ok = np.isclose(x, y, rtol=rtol, atol=atol, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                raise AssertionError(
                    f"values not close in {c!r} at row {i}: {x[i]!r} vs {y[i]!r}")
        else:
            bad = (pa[c] != pb[c]) & ~(pa[c].isna() & pb[c].isna())
            if bad.any():
                i = bad.idxmax()
                raise AssertionError(
                    f"values differ in {c!r} at row {i}: "
                    f"{pa[c].iloc[i]!r} vs {pb[c].iloc[i]!r}")


def assert_isomorphic(a, b) -> None:
    """Same DataTree node structure — xarray.testing.assert_isomorphic."""
    if not a.isomorphic(b):
        raise AssertionError(
            f"trees not isomorphic: {sorted(a)} vs {sorted(b)}")
