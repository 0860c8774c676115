"""Segmented window execution — the global-series scale path.

A window over a dim with NO complement dims (one global series) maps to
``Window.partitionBy()`` — a single task, the one degenerate shape in
the engine (SCALE.md "known cliffs"; the reference hits the same wall:
dask cannot chunk a scan dim).  These operators break the series into
**label-range segments** (boundaries from an approxQuantile sample —
no global rank anywhere) and restore exactness:

- ``rolling_segmented``: each segment receives a HALO copy of the w-1
  rows immediately preceding it — CHAINED across as many earlier
  segments as needed (skew-safe for undersized/empty segments);
  windows compute locally per segment, halo output rows are dropped.
  Result is row-for-row identical to the global frame.
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
    """Attach a __seg column from equal-width label-range buckets.

    Fully LAZY: the min/max bounds come from a one-row aggregate
    broadcast-joined in-plan (``width_bucket``), so segmenting costs no
    driver action — unlike an approxQuantile sample.  Equal labels
    always land in the same segment, so segment edges never split a
    label's tie group differently than the global sort would.  Value
    skew can leave some buckets over-full or empty; every consumer in
    this module is exact regardless (rolling chains its halo, the scans
    carry per-segment totals), so skew costs parallelism only.
    """
    # the segment scaffold references ds.df repeatedly (bounds agg +
    # the main frame here; halo_union adds counts/base/cand branches)
    # and runtime exchange reuse does NOT fire across those branches
    # (measured round 12: executed plans show 0 ReusedExchange, 8
    # re-scans for a rolling-over-aggregate input).  A DERIVED input is
    # computed once behind a lazy localCheckpoint; fact-shaped inputs
    # pass through (see _utils.materialize_if_derived).
    from xarray_spark._utils import materialize_if_derived
    ds = ds._replace(df=materialize_if_derived(ds.df))
    dtype = ds.df.schema[dim].dataType
    x = to_double(F.col(dim), dtype)
    if n_segments <= 1:
        return ds.df.withColumn("__seg", F.lit(0)), x
    bounds = ds.df.agg(
        F.min(x).alias("__seg_lo"), F.max(x).alias("__seg_hi")
    )
    seg = (
        F.when(F.col("__seg_hi") <= F.col("__seg_lo"), F.lit(1))
        .otherwise(
            F.least(
                F.width_bucket(x, F.col("__seg_lo"), F.col("__seg_hi"), F.lit(n_segments)),
                F.lit(n_segments),
            )
        )
    )
    df = (
        ds.df.crossJoin(F.broadcast(bounds))
        .withColumn("__seg", seg)
        .drop("__seg_lo", "__seg_hi")
    )
    return df, x


def rolling_segmented(ds: XDataset, dim: str, window: int, agg: str = "mean",
                      min_periods: int | None = None,
                      n_segments: int = 64) -> XDataset:
    """Trailing rolling aggregate over a global series, segment-parallel.

    agg ∈ {mean, sum, min, max, count}.  Exact: every output row's frame
    [pos-w+1, pos] lies inside (segment ∪ halo) because the halo
    replicates the w-1 rows immediately preceding the segment, chained
    across earlier segments when the predecessors are undersized.
    """
    min_periods = window if min_periods is None else min_periods
    from xarray_spark._utils import nan_to_null
    ds = ds._replace(df=nan_to_null(ds.df, list(ds.data_vars), ds.df.schema))
    unioned = halo_union(ds, dim, window, n_segments)
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


def halo_union(ds: XDataset, dim: str, window: int, n_segments: int = 64):
    """Segment the series and replicate each segment's trailing w-1
    rows into the successors that need them (chained across undersized
    segments) — the shared scaffolding of every segmented trailing-
    window operator.  Returns ds.df's columns plus ``__seg`` (the
    partition key windows run inside) and ``__halo`` (True on
    replicated context rows, which consumers drop from the output)."""
    df, _x = _with_segments(ds, dim, n_segments)
    w_end = Window.partitionBy("__seg").orderBy(F.col(dim).desc())
    ranked = df.withColumn("__from_end", F.row_number().over(w_end))
    # Halo CHAINING: one of the last w-1 rows of segment s (distance r from
    # its end) must be replicated into every later segment t whose
    # intervening rows don't already cover the frame:
    #     gap(s, t) + r <= w-1,   gap = cum_{t-1} - cum_s
    # (cum = cumulative row count through a segment).  Undersized or empty
    # segments — skewed labels collapsing approxQuantile cuts — just let the
    # chain reach further back; correctness no longer depends on every
    # segment holding >= w-1 rows.  The (seg, cnt, cum) table is
    # n_segments-sized, so the pair table is tiny and broadcast.  All
    # branches below hang off the same __seg hash exchange, so the scan +
    # rank subtree is computed once (ReuseExchange) — no persist needed.
    counts = ranked.groupBy("__seg").agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy("__seg").rowsBetween(Window.unboundedPreceding, 0)
    cums = counts.select(
        "__seg",
        F.sum("__cnt").over(w_cum).alias("__cum"),
        (F.sum("__cnt").over(w_cum) - F.col("__cnt")).alias("__cum_prev"),
    )
    src = cums.select(F.col("__seg").alias("__s"), F.col("__cum").alias("__cum_s"))
    tgt = cums.select(F.col("__seg").alias("__t"), F.col("__cum_prev").alias("__cum_t_prev"))
    pairs = (
        src.crossJoin(tgt)
        .where(F.col("__t") > F.col("__s"))
        .select("__s", "__t", (F.col("__cum_t_prev") - F.col("__cum_s")).alias("__gap"))
        .where(F.col("__gap") <= window - 2)
    )
    base = ranked.withColumn("__halo", F.lit(False))
    cand = ranked.where(F.col("__from_end") <= window - 1)
    halo = (
        cand.join(
            F.broadcast(pairs),
            (cand["__seg"] == pairs["__s"])
            & (cand["__from_end"] + pairs["__gap"] <= window - 1),
        )
        .drop("__seg", "__s", "__gap")
        .withColumnRenamed("__t", "__seg")
        .withColumn("__halo", F.lit(True))
    )
    return base.unionByName(halo.select(*base.columns)).drop("__from_end")


def cumsum_segmented(ds: XDataset, dim: str, n_segments: int = 64) -> XDataset:
    """Exact cumulative sum over a global series via a two-phase scan.

    Phase 1 aggregates per-segment totals from the RAW frame (cheap
    parallel scan, no window); phase 2 broadcast-joins the exclusive
    prefix offsets and runs ONE segment-partitioned window pass.  The
    windowed plan is never recomputed for the totals.
    """
    from xarray_spark._utils import nan_to_null
    ds = ds._replace(df=nan_to_null(ds.df, list(ds.data_vars), ds.df.schema))
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
            # coalesce: a segment whose window so far holds only nulls
            # must contribute 0, not poison the offset (np.nancumsum)
            exprs.append((F.coalesce(F.sum(c).over(w_local), F.lit(0.0))
                          + F.col(f"__off_{c}")).alias(c))
        else:
            exprs.append(F.col(c))
    return ds._replace(df=joined.select(*exprs))


def bfill_segmented(ds: XDataset, dim: str, n_segments: int = 64) -> XDataset:
    """Backward-fill over a global series, segment-parallel — the mirror
    of ffill_segmented: per-segment local backfill, then rows after a
    segment's last valid value take the first valid value of any
    FOLLOWING segment (tiny per-segment first-valid table, suffix
    window, broadcast back)."""
    from xarray_spark._utils import nan_to_null
    ds = ds._replace(df=nan_to_null(ds.df, list(ds.data_vars), ds.df.schema))
    raw, _x = _with_segments(ds, dim, n_segments)
    w_local = Window.partitionBy("__seg").orderBy(dim).rowsBetween(
        0, Window.unboundedFollowing
    )
    firsts = raw.groupBy("__seg").agg(
        *[F.min_by(v, F.when(F.col(v).isNotNull(), F.col(dim))).alias(f"__first_{v}")
          for v in ds.data_vars]
    )
    w_suf = Window.orderBy(F.col("__seg").desc()).rowsBetween(Window.unboundedPreceding, -1)
    carry = firsts.select(
        "__seg",
        *[F.last(f"__first_{v}", ignorenulls=True).over(w_suf).alias(f"__carry_{v}")
          for v in ds.data_vars],
    )
    joined = raw.join(F.broadcast(carry), on="__seg", how="left")
    exprs = []
    for c in ds.df.columns:
        if c in ds.data_vars:
            local = F.first(c, ignorenulls=True).over(w_local)
            exprs.append(F.coalesce(local, F.col(f"__carry_{c}")).alias(c))
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
    from xarray_spark._utils import nan_to_null
    ds = ds._replace(df=nan_to_null(ds.df, list(ds.data_vars), ds.df.schema))
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


def ewm_alpha(window: float, window_type: str) -> float:
    """Smoothing factor α from the reference's window-type vocabulary
    (xarray/computation/rolling_exp.py:26 _get_alpha)."""
    import math
    if window_type == "alpha":
        return float(window)
    if window_type == "span":
        return 2.0 / (float(window) + 1.0)
    if window_type == "com":
        return 1.0 / (1.0 + float(window))
    if window_type == "halflife":
        return 1.0 - math.exp(-math.log(2.0) / float(window))
    raise ValueError(f"window_type {window_type!r}")


def ewm_segmented(ds: XDataset, dim: str, alpha: float, agg: str = "mean",
                  n_segments: int = 64) -> XDataset:
    """Exact EWM (adjust=True, ignore_na=False, min_periods=1) over a
    global series, segment-parallel — the scale path for the one shape
    where the pandas-kernel EWM degenerates to a single Arrow batch.

    The EWM numerator/denominator are linear recurrences
        N_i = (1-α)·N_{i-1} + x_i,   D_i = (1-α)·D_{i-1} + 1_{x_i≠null}
    so they admit the same two-phase decomposition as cumsum: phase 1
    computes per-segment LOCAL (N, D) arrays (block-scaled vectorized
    scan inside an applyInPandas — numerically safe because each block
    bounds the weight ratio at e^300, and contributions damped below
    that are < 1e-130 of the result); phase 2 chains the n_segments
    boundary states on the driver (a 64-row linear recurrence) and
    broadcast-joins the per-segment carry, decayed per row by
    (1-α)^(pos+1) — which underflows to exactly 0 deep inside a
    segment, as the mathematics says it should.

    mean = (N + carry_N·f) / (D + carry_D·f);  sum = N + carry_N·f.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    decay = 1.0 - float(alpha)
    varlist = list(ds.data_vars)
    raw, _x = _with_segments(ds, dim, n_segments)

    extra = [T.StructField("__p", T.LongType())]
    for v in varlist:
        extra += [T.StructField(f"__n_{v}", T.DoubleType()),
                  T.StructField(f"__d_{v}", T.DoubleType())]
    out_schema = T.StructType(list(raw.schema.fields) + extra)

    if decay <= 0.0:
        block = 1
    else:
        block = max(1, min(8192, int(300.0 / max(-math.log(decay), 1e-12))))

    def _scan(x: np.ndarray):
        n = len(x)
        val = np.nan_to_num(x, nan=0.0)
        ind = (~np.isnan(x)).astype("float64")
        if decay <= 0.0:
            return val, ind
        N = np.empty(n); D = np.empty(n)
        cN = cD = 0.0
        for s in range(0, n, block):
            e = min(s + block, n)
            k = e - s
            w = decay ** np.arange(k, dtype="float64")
            inv = 1.0 / w
            f = decay ** np.arange(1, k + 1, dtype="float64")
            N[s:e] = np.cumsum(val[s:e] * inv) * w + cN * f
            D[s:e] = np.cumsum(ind[s:e] * inv) * w + cD * f
            cN, cD = N[e - 1], D[e - 1]
        return N, D

    def phase1(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(dim).reset_index(drop=True)
        pdf["__p"] = np.arange(len(pdf), dtype="int64")
        for v in varlist:
            N, D = _scan(pdf[v].to_numpy("float64", na_value=np.nan))
            pdf[f"__n_{v}"] = N
            pdf[f"__d_{v}"] = D
        return pdf

    local = raw.groupBy("__seg").applyInPandas(phase1, out_schema)

    # boundary states: one row per segment — driver-sized by construction
    summary = (
        local.groupBy("__seg")
        .agg(
            F.max("__p").alias("__pmax"),
            *[F.max_by(f"__n_{v}", "__p").alias(f"__ne_{v}") for v in varlist],
            *[F.max_by(f"__d_{v}", "__p").alias(f"__de_{v}") for v in varlist],
        )
        .orderBy("__seg")
        .collect()
    )
    if not summary:
        # empty series: nothing to chain, nothing to fill
        return ds
    carry_rows = []
    g = {v: (0.0, 0.0) for v in varlist}
    for r in summary:
        carry_rows.append((r["__seg"],
                           *[g[v][0] for v in varlist],
                           *[g[v][1] for v in varlist]))
        dk = decay ** (r["__pmax"] + 1)
        g = {v: (r[f"__ne_{v}"] + g[v][0] * dk,
                 r[f"__de_{v}"] + g[v][1] * dk) for v in varlist}
    from xarray_spark._utils import local_df
    carry = local_df(
        ds.spark,
        carry_rows,
        ["__seg"] + [f"__cn_{v}" for v in varlist] + [f"__cd_{v}" for v in varlist],
    )

    joined = local.join(F.broadcast(carry), on="__seg", how="left")
    f_row = F.pow(F.lit(decay), F.col("__p") + 1)
    exprs = []
    for c in ds.df.columns:
        if c in ds.data_vars:
            num = F.col(f"__n_{c}") + F.col(f"__cn_{c}") * f_row
            den = F.col(f"__d_{c}") + F.col(f"__cd_{c}") * f_row
            if agg == "mean":
                exprs.append(F.when(den > 0, num / den).alias(c))
            elif agg == "sum":
                exprs.append(num.alias(c))
            else:
                raise ValueError(f"ewm agg {agg!r}")
        else:
            exprs.append(F.col(c))
    return ds._replace(df=joined.select(*exprs))
