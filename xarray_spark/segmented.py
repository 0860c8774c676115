"""Segmented window execution — the global-series scale path.

A window over a dim with NO complement dims (one global series) maps to
``Window.partitionBy()`` — a single task, the one degenerate shape in
the engine (SCALE.md "known cliffs"; the reference hits the same wall:
dask cannot chunk a scan dim).  These operators break the series into
**label-range segments** (boundaries from an approxQuantile sample —
no global rank anywhere) and restore exactness:

- ``rolling_segmented``: each segment receives a HALO copy of the
  previous segment's last w-1 rows (overlap-stitch); windows compute
  locally per segment, halo output rows are dropped.  Result is
  row-for-row identical to the global frame.
- ``cumsum_segmented``: Blelloch two-phase scan — per-segment local
  cumsum, then the (tiny, n_segments-sized) per-segment totals get an
  exclusive prefix sum broadcast-joined back as offsets.  The same
  decomposition dask uses for push/cumreduction
  (xarray/core/duck_array_ops.py:872).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xarray_spark.dataset import XDataset
from xarray_spark._utils import to_double


def _with_segments(ds: XDataset, dim: str, n_segments: int):
    """Attach a __seg column from sampled label-range boundaries.

    approxQuantile runs one cheap pass (sampled sketch); the cut list is
    n_segments-sized on the driver.  Equal labels always land in the
    same segment, so segment edges never split a label's tie group
    differently than the global sort would.
    """
    dtype = ds.df.schema[dim].dataType
    x = to_double(F.col(dim), dtype)
    if n_segments <= 1:
        return ds.df.withColumn("__seg", F.lit(0)), x
    probe = ds.df.select(x.alias("__x")).where(F.col("__x").isNotNull())
    qs = [i / n_segments for i in range(1, n_segments)]
    cuts = sorted(set(probe.approxQuantile("__x", qs, 0.001)))
    seg = sum(((x > F.lit(c)).cast("int") for c in cuts), F.lit(0))
    return ds.df.withColumn("__seg", seg), x


def rolling_segmented(ds: XDataset, dim: str, window: int, agg: str = "mean",
                      min_periods: int | None = None,
                      n_segments: int = 64) -> XDataset:
    """Trailing rolling aggregate over a global series, segment-parallel.

    agg ∈ {mean, sum, min, max, count}.  Exact: every output row's frame
    [pos-w+1, pos] lies inside (segment ∪ halo) because the halo
    replicates the previous segment's last w-1 rows.
    """
    min_periods = window if min_periods is None else min_periods
    # the halo only reaches one segment back, so a frame must never span
    # more than two segments: clamp n_segments so the expected segment
    # size stays comfortably above the window (degenerates to the plain
    # global window when the series is small relative to the window)
    total = ds.df.count()
    n_segments = max(1, min(n_segments, total // max(window * 4, 1)))
    df, _x = _with_segments(ds, dim, n_segments)
    w_end = Window.partitionBy("__seg").orderBy(F.col(dim).desc())
    ranked = df.withColumn("__from_end", F.row_number().over(w_end))
    # both union branches read `ranked`; persist so the scan+rank subtree
    # computes once instead of per-branch
    ranked = ranked.persist()
    base = ranked.withColumn("__halo", F.lit(False))
    halo = (
        ranked.where(F.col("__from_end") <= window - 1)
        .withColumn("__seg", F.col("__seg") + 1)
        .withColumn("__halo", F.lit(True))
    )
    unioned = base.unionByName(halo).drop("__from_end")
    w = Window.partitionBy("__seg").orderBy(dim).rowsBetween(-(window - 1), 0)
    fn = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[agg]
    exprs = []
    for c in ds.df.columns:
        if c in ds.data_vars:
            # halo-completed segment starts behave exactly like the
            # interior of the global window; only the true series head
            # has short frames
            e = F.when(F.count(c).over(w) >= min_periods, fn(c).over(w))
            exprs.append(e.alias(c))
        else:
            exprs.append(F.col(c))
    out = unioned.select(*exprs, F.col("__halo")).where(~F.col("__halo")).drop("__halo")
    return ds._replace(df=out)


def cumsum_segmented(ds: XDataset, dim: str, n_segments: int = 64) -> XDataset:
    """Exact cumulative sum over a global series via a two-phase scan.

    Phase 1 aggregates per-segment totals from the RAW frame (cheap
    parallel scan, no window); phase 2 broadcast-joins the exclusive
    prefix offsets and runs ONE segment-partitioned window pass.  The
    windowed plan is never recomputed for the totals.
    """
    raw, _x = _with_segments(ds, dim, n_segments)
    totals = raw.groupBy("__seg").agg(
        *[F.sum(v).alias(f"__tot_{v}") for v in ds.data_vars]
    )
    w_pref = Window.orderBy("__seg").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.select(
        "__seg",
        *[
            F.coalesce(F.sum(f"__tot_{v}").over(w_pref), F.lit(0.0)).alias(f"__off_{v}")
            for v in ds.data_vars
        ],
    )
    joined = raw.join(F.broadcast(prefixes), on="__seg", how="left")
    w_local = Window.partitionBy("__seg").orderBy(dim).rowsBetween(
        Window.unboundedPreceding, 0
    )
    exprs = []
    for c in ds.df.columns:
        if c in ds.data_vars:
            exprs.append((F.sum(c).over(w_local) + F.col(f"__off_{c}")).alias(c))
        else:
            exprs.append(F.col(c))
    return ds._replace(df=joined.select(*exprs))


def ffill_segmented(ds: XDataset, dim: str, n_segments: int = 64) -> XDataset:
    """Forward-fill over a global series, segment-parallel.

    Per-segment local fill, then each segment's rows before its first
    valid value take the last valid value of any PRECEDING segment —
    computed on the (tiny) per-segment last-valid table with a prefix
    window, broadcast back.  Two narrow passes instead of one global
    scan; same two-phase shape as cumsum_segmented.
    """
    raw, _x = _with_segments(ds, dim, n_segments)
    w_local = Window.partitionBy("__seg").orderBy(dim).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # per-segment last valid value per var (tiny table)
    lasts = raw.groupBy("__seg").agg(
        *[F.max_by(v, F.when(F.col(v).isNotNull(), F.col(dim))).alias(f"__last_{v}")
          for v in ds.data_vars]
    )
    w_pref = Window.orderBy("__seg").rowsBetween(Window.unboundedPreceding, -1)
    carry = lasts.select(
        "__seg",
        *[F.last(f"__last_{v}", ignorenulls=True).over(w_pref).alias(f"__carry_{v}")
          for v in ds.data_vars],
    )
    joined = raw.join(F.broadcast(carry), on="__seg", how="left")
    exprs = []
    for c in ds.df.columns:
        if c in ds.data_vars:
            local = F.last(c, ignorenulls=True).over(w_local)
            exprs.append(F.coalesce(local, F.col(f"__carry_{c}")).alias(c))
        else:
            exprs.append(F.col(c))
    return ds._replace(df=joined.select(*exprs))
