"""Rolling / coarsen window operators (reference: xarray/computation/rolling.py).

``rolling(dim=w)`` maps to a Spark window frame
``rowsBetween(-(w-1)+shift, shift)`` partitioned by the complement dims
and ordered by the dim — the same sliding-window semantics as
``Variable.rolling_window`` (xarray/core/variable.py:2120) but executed
as one shuffle + codegen'd frame aggregation instead of a strided view.

``min_periods`` maps to ``when(count over frame >= k, agg)``
(xarray default: min_periods == window, i.e. incomplete edge windows
produce null — xarray/computation/rolling.py:147).
"""

from __future__ import annotations

from collections.abc import Mapping

import pandas as pd

from pyspark.sql import Column, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xarray_spark.dataset import XDataset


class XRolling:
    def __init__(self, ds: XDataset, windows: Mapping[str, int], min_periods: int | None, center: bool):
        if len(windows) != 1:
            raise NotImplementedError("rolling over exactly one dim")
        (self.dim, self.window), = windows.items()
        self.ds = ds
        self.center = center
        # window == -1 → cumulative (unbounded preceding)
        if self.window == -1:
            self.min_periods = min_periods if min_periods is not None else 1
        else:
            self.min_periods = min_periods if min_periods is not None else self.window

    def _frame(self):
        others = [d for d in self.ds.dims if d != self.dim]
        base = Window.partitionBy(*others).orderBy(self.dim)
        if self.window == -1:
            return base.rowsBetween(Window.unboundedPreceding, 0)
        if self.center:
            # xarray center: window extends (w-1)//2 after, rest before
            after = (self.window - 1) // 2
            before = self.window - 1 - after
            return base.rowsBetween(-before, after)
        return base.rowsBetween(-(self.window - 1), 0)

    def _apply(self, make) -> XDataset:
        w = self._frame()
        ds = self.ds
        exprs = []
        for c in ds.df.columns:
            if c in ds.data_vars:
                agg = make(c, w)
                if self.min_periods > 1:
                    agg = F.when(F.count(c).over(w) >= self.min_periods, agg)
                exprs.append(agg.alias(c))
            else:
                exprs.append(F.col(c))
        return ds._replace(df=ds.df.select(*exprs))

    def mean(self): return self._apply(lambda c, w: F.avg(c).over(w))
    def sum(self): return self._apply(lambda c, w: F.sum(c).over(w))
    def min(self): return self._apply(lambda c, w: F.min(c).over(w))
    def max(self): return self._apply(lambda c, w: F.max(c).over(w))
    def count(self): return self._apply(lambda c, w: F.count(c).over(w))
    def std(self, ddof=0):
        return self._apply(lambda c, w: (F.stddev_pop(c) if ddof == 0 else F.stddev_samp(c)).over(w))
    def var(self, ddof=0):
        return self._apply(lambda c, w: (F.var_pop(c) if ddof == 0 else F.var_samp(c)).over(w))
    def median(self):
        return self._apply(lambda c, w: F.expr(f"percentile({c}, 0.5)").over(w))

    def construct(self, window_dim: str) -> XDataset:
        """Materialize the window as an array column
        (xarray/computation/rolling.py:327 construct → view; here:
        collect_list over the frame)."""
        w = self._frame()
        ds = self.ds
        exprs = [
            F.collect_list(c).over(w).alias(c) if c in ds.data_vars else F.col(c)
            for c in ds.df.columns
        ]
        return ds._replace(df=ds.df.select(*exprs))

    def reduce(self, func, dtype: str = "double") -> XDataset:
        """Windowed UDAF (xarray/computation/rolling.py:477): build the
        window arrays then apply a vectorized pandas UDF per array."""
        constructed = self.construct("__w")
        min_periods = self.min_periods  # plain int: the udf closure must
        # not capture self (it holds the DataFrame -> SparkContext)

        @F.pandas_udf(dtype)
        def apply_fn(s: pd.Series) -> pd.Series:
            import numpy as np
            return s.map(lambda arr: func(np.asarray(arr)) if arr is not None and len(arr) >= min_periods else None)

        ds = constructed
        exprs = [
            apply_fn(F.col(c)).alias(c) if c in ds.data_vars else F.col(c)
            for c in ds.df.columns
        ]
        return ds._replace(df=ds.df.select(*exprs))


class XCoarsen:
    """Non-overlapping block windows (xarray/computation/rolling.py:1023).

    Maps to groupBy(floor(pos / size)) per coarsened dim; `pos` comes
    from the broadcast label table, so the fact table sees one hash
    aggregation, no sort.
    """

    def __init__(self, ds: XDataset, windows: Mapping[str, int], boundary: str = "exact"):
        self.ds = ds
        self.windows = dict(windows)
        self.boundary = boundary

    def _blocked(self) -> tuple[XDataset, list[str]]:
        ds = self.ds
        block_cols = []
        for dim, size in self.windows.items():
            labels = ds._dim_labels(dim)
            blocks = labels.select(
                F.col(dim),
                F.floor(F.col("__pos") / F.lit(size)).alias(f"__block_{dim}"),
                F.col("__size"),
            )
            if self.boundary == "trim":
                # drop the incomplete trailing block
                # (xarray/computation/rolling.py:1023 boundary='trim')
                blocks = blocks.where(
                    F.col(f"__block_{dim}") < F.floor(F.col("__size") / F.lit(size))
                )
            blocks = blocks.drop("__size")
            ds = ds._replace(df=ds.df.join(F.broadcast(blocks), on=dim, how="inner"))
            block_cols.append(f"__block_{dim}")
        return ds, block_cols

    def _agg(self, make, label_agg=F.min) -> XDataset:
        ds, block_cols = self._blocked()
        coarse_dims = list(self.windows)
        kept = [d for d in self.ds.dims if d not in coarse_dims]
        coords = self.ds._coords_on(kept)
        keys = block_cols + kept + list(coords)
        aggs = []
        for dim in coarse_dims:
            # new label for the block: mean for numeric labels, min otherwise
            dt = self.ds.df.schema[dim].dataType
            if isinstance(dt, (T.FloatType, T.DoubleType, T.IntegerType, T.LongType)):
                aggs.append(F.avg(dim).alias(dim))
            else:
                aggs.append(F.min(dim).alias(dim))
        for v in self.ds.data_vars:
            aggs.append(make(v).alias(v))
        df = ds.df.groupBy(*keys).agg(*aggs).drop(*block_cols)
        return XDataset(df, coarse_dims + kept, coords, self.ds.data_vars, self.ds.attrs)

    def mean(self): return self._agg(lambda v: F.avg(v))
    def sum(self): return self._agg(lambda v: F.sum(v))
    def min(self): return self._agg(lambda v: F.min(v))
    def max(self): return self._agg(lambda v: F.max(v))
    def count(self): return self._agg(lambda v: F.count(v))
    def std(self): return self._agg(lambda v: F.stddev_pop(v))
    def var(self): return self._agg(lambda v: F.var_pop(v))


class XRollingExp:
    """Exponentially-weighted moving ops (xarray/computation/rolling_exp.py:49).

    The EWM recursion y_t = (1-α)·y_{t-1} + α·x_t is inherently
    sequential per series — not a frame aggregate — so each complement-
    dim group runs as one Arrow batch through applyInPandas (pandas'
    compiled ewm kernel), mirroring the reference's numbagg path.
    At scale the groups are the parallel unit: fine for many series,
    degenerate for one giant series (same limit as the reference, where
    dask cannot chunk the scan dim either).
    """

    def __init__(self, ds: XDataset, windows: Mapping[str, float], window_type: str = "span"):
        (self.dim, self.window), = windows.items()
        self.window_type = window_type
        self.ds = ds

    def _ewm(self, agg: str) -> XDataset:
        ds = self.ds
        dim = self.dim
        others = [d for d in ds.dims if d != dim]
        varlist = list(ds.data_vars)
        kwargs = {self.window_type: self.window}
        out_schema = ds.df.schema

        def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(dim)
            ew = pdf[varlist].ewm(**kwargs, min_periods=1)
            pdf[varlist] = getattr(ew, agg)()
            return pdf

        if others:
            df = ds.df.groupBy(*others).applyInPandas(apply_fn, out_schema)
        else:
            df = ds.df.withColumn("__g", F.lit(0)).groupBy("__g").applyInPandas(
                lambda pdf: apply_fn(pdf.drop(columns="__g")), out_schema
            )
        return ds._replace(df=df)

    def mean(self) -> XDataset:
        return self._ewm("mean")

    def sum(self) -> XDataset:
        return self._ewm("sum")

    def std(self) -> XDataset:
        return self._ewm("std")

    def var(self) -> XDataset:
        return self._ewm("var")
