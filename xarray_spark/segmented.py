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
    unioned = base.unionByName(halo.select(*base.columns)).drop("__from_end")
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


def bfill_segmented(ds: XDataset, dim: str, n_segments: int = 64) -> XDataset:
    """Backward-fill over a global series, segment-parallel — the mirror
    of ffill_segmented: per-segment local backfill, then rows after a
    segment's last valid value take the first valid value of any
    FOLLOWING segment (tiny per-segment first-valid table, suffix
    window, broadcast back)."""
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
