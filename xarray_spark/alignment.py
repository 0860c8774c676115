"""Alignment / reindex / broadcast (reference: xarray/structure/alignment.py).

xarray's ``align`` pipeline (find_matching_indexes → align_indexes →
reindex_all, xarray/structure/alignment.py:143-763) becomes, in long
form: per shared dim, join the (small) label tables with the requested
join type, then semi-join / left-join each fact table against the
aligned label set.  Label tables are broadcast — the fact tables are
never shuffled for alignment itself.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_spark.dataset import XDataset



def _label_presence(frames: Sequence[DataFrame], dim: str) -> DataFrame:
    """Fused label-set probe: ONE aggregation answering every label-set
    question align/concat ask — (dim, __hav) where __hav is the set of
    haver indices (position among the datasets that carry ``dim``)
    whose label table contains the label.

    Replaces the former per-join-type machinery (a pairwise exceptAll
    probe per dataset for 'exact', an n-1-deep join fan for
    inner/outer, and a per-dataset anti-join inside conform) with one
    union + groupBy over the per-dataset distincts; every downstream
    label set is a FILTER on this table (guide §2.3/§2.4: one pass,
    fewer exchanges).  Label tables are broadcast-sized by contract,
    so the collect_set per label is a few ints."""
    marked = None
    for i, t in enumerate(frames):
        m = (t.select(dim).where(F.col(dim).isNotNull()).distinct()
             .withColumn("__i", F.lit(i)))
        marked = m if marked is None else marked.unionByName(m)
    return marked.groupBy(dim).agg(F.collect_set("__i").alias("__hav"))


def _marker_label_pred(join: str, n_hav: int):
    """Column predicate selecting the joined label set from a
    _label_presence marker (None = every label, the 'outer' set)."""
    if join in ("inner", "exact"):
        return F.size("__hav") == n_hav
    if join == "left":
        return F.array_contains("__hav", 0)
    if join == "right":
        return F.array_contains("__hav", n_hav - 1)
    return None  # outer: the union label set


def _conform_to_labels(ds: XDataset, dim: str, labels: DataFrame,
                       fill_value=None, restrict: bool = True,
                       missing: DataFrame | None = None) -> XDataset:
    """Restrict ds to the label set AND materialize rows (null vars) for
    labels it lacks — reference align semantics, where an outer join
    introduces NaN slices.  Missing labels appear as other-combos ×
    missing-label rows (the interp()-style synthesis), so dim key
    columns are never null.  Both joins are broadcast-label-sized.
    ``restrict=False`` (join='outer') skips the restriction semi-join —
    a provable no-op there, since the union label set contains every
    dataset's labels.  ``missing`` (the label-set rows this dataset
    lacks) is normally pre-derived as a FILTER on the _label_presence
    marker; the anti-join fallback recomputes it from ds itself."""
    df = (ds.df.join(F.broadcast(labels), on=dim, how="left_semi")
          if restrict else ds.df)
    if missing is None:
        missing = labels.join(F.broadcast(ds.df.select(dim).distinct()),
                              on=dim, how="left_anti")
    others = [d for d in ds.dims if d != dim]
    if others:
        # coords functionally dependent on the OTHER dims stay populated
        # on synthesized rows (reference outer align keeps non-aligned
        # indexes' coords intact); only coords keyed on `dim` go null.
        dep_coords = [
            c for c, keys in ds.coords.items()
            if set(keys) <= set(others)
        ]
        combos = ds.df.select(*others, *dep_coords).distinct()
        new_rows = combos.crossJoin(F.broadcast(missing))
    else:
        new_rows = missing
    for c in ds.df.columns:
        if c not in new_rows.columns:
            # synthesized slices take fill_value for data vars (the
            # reference's align(fill_value=); default NaN ≙ null).
            # dict-like fill maps variable name -> fill (reference
            # dtypes.NA for unlisted vars ≙ null).
            fv = (fill_value.get(c) if isinstance(fill_value, Mapping)
                  else fill_value)
            fill = (F.lit(fv) if fv is not None
                    and c in ds.data_vars else F.lit(None))
            new_rows = new_rows.withColumn(
                c, fill.cast(ds.df.schema[c].dataType))
    return ds._replace(df=df.unionByName(new_rows.select(*ds.df.columns)))


def align(*datasets: XDataset, join: str = "inner",
          fill_value=None, exclude=None, _markers=None) -> tuple[XDataset, ...]:
    """N-way alignment (xarray/structure/alignment.py:678).

    join='outer'/'left'/'right': labels a dataset lacks materialize as
    null-variable rows (the long-form rendering of the reference's NaN
    slices) — one broadcast anti-join + union per dim, facts never
    shuffled.  ``fill_value`` fills those synthesized slices instead
    of missing (reference align(fill_value=)).

    join='override' (xarray/structure/alignment.py:196): the FIRST
    dataset's labels replace the others' positionally — indexes must
    have equal sizes.  Long form: join each other dataset's label table
    to the first's on position, then broadcast-remap the dim column.

    Null-label contract: NULL index labels do not participate in
    alignment label sets (consistent with ``_dim_labels`` throughout
    the engine) — 'exact' does not raise on a null-only difference and
    outer/left/right never synthesize a null-label slice.  This is an
    engine contract, intentionally narrower than pandas' NaN-as-label
    indexing.
    """
    if join == "override":
        return _align_override(datasets, exclude=exclude)
    # materialize DERIVED inputs once (round-12 optimization): align
    # references each dataset's plan several times per dim (label
    # distinct, restrict semi-join, missing anti-join, other-combos
    # distinct, the union) and the references COMPOUND across dims.
    # Reduction-shaped inputs (aggregates — the alignment norm) are
    # computed once behind a lazy localCheckpoint; fact-shaped plans
    # pass through untouched (see _utils.materialize_if_derived).
    from xarray_spark._utils import materialize_if_derived
    datasets = tuple(ds._replace(df=materialize_if_derived(ds.df))
                     for ds in datasets)
    # exclude= (reference align signature): named dims are NOT aligned —
    # each dataset keeps its own labels along them
    excl = ({exclude} if isinstance(exclude, str)
            else set(exclude or ()))
    # one _label_presence marker per shared dim answers every label-set
    # question (set equality, joined label set, per-dataset missing
    # labels) — markers stay un-checkpointed here: their re-references
    # run as parallel stages of the ONE final action (cheap), and a
    # checkpoint barrier measurably hurt cold runs (q117 +30%).  concat
    # pre-checkpoints its markers (its probes are sequential eager
    # jobs) and passes them via _markers.
    from collections import Counter
    counts = Counter(d for ds in datasets for d in ds.dims)
    shared = [d for d, n in counts.items() if n > 1 and d not in excl]
    havers = {d: [k for k, ds in enumerate(datasets) if d in ds.dims]
              for d in shared}
    markers: dict[str, DataFrame] = {}
    for dim in shared:
        m = (_markers or {}).get(dim)
        if m is None:
            m = _label_presence(
                [datasets[k].df for k in havers[dim]], dim)
        if join == "exact":
            if not m.where(F.size("__hav") != len(havers[dim])).isEmpty():
                from xarray_spark.errors import AlignmentError
                raise AlignmentError(
                    f"indexes along dimension {dim!r} are not equal")
        markers[dim] = m
    out = []
    for k, ds in enumerate(datasets):
        cur = ds
        restricted = False
        for dim, m in markers.items():
            if dim not in cur.dims:
                continue
            pred = _marker_label_pred(join, len(havers[dim]))
            labels = (m.where(pred) if pred is not None else m).select(dim)
            if join == "inner" or join == "exact":
                cur = cur._replace(df=cur.df.join(
                    F.broadcast(labels), on=dim, how="left_semi"))
            else:
                # the marker records each dataset's ORIGINAL label sets;
                # once a left/right conform has RESTRICTED this dataset
                # along an earlier dim, its label set along later dims
                # may have shrunk, so the marker-derived missing set is
                # stale — fall back to the anti-join against the current
                # (partially conformed) frame.  join='outer' never
                # restricts, so the marker stays exact for every dim.
                if restricted:
                    missing = None
                else:
                    bit = havers[dim].index(k)
                    miss_pred = ~F.array_contains("__hav", bit)
                    if pred is not None:
                        miss_pred = pred & miss_pred
                    missing = m.where(miss_pred).select(dim)
                cur = _conform_to_labels(cur, dim, labels, fill_value,
                                         restrict=(join != "outer"),
                                         missing=missing)
                restricted = restricted or (join != "outer")
        out.append(cur)
    return tuple(out)


def _align_override(datasets: Sequence[XDataset],
                    exclude=None) -> tuple[XDataset, ...]:
    """Positional label replacement: dataset k's labels on each shared
    dim are rewritten to the first dataset's label at the same ordinal.
    Sizes must match (ValueError otherwise — xarray parity).  The remap
    table is label-table-sized → broadcast join; facts never shuffle.
    ``exclude`` dims are left untouched (concat passes its concat dim —
    reference align(exclude=) semantics)."""
    from collections import Counter
    excl = ({exclude} if isinstance(exclude, str)
            else set(exclude or ()))
    counts = Counter(d for ds in datasets for d in ds.dims)
    shared = [d for d, n in counts.items() if n > 1 and d not in excl]
    first = datasets[0]
    out = [first]
    base_labels = {
        dim: first._dim_labels(dim).select(
            F.col(dim).alias("__new"), "__pos", "__size"
        )
        for dim in shared if dim in first.dims
    }
    for ds in datasets[1:]:
        df = ds.df
        for dim in shared:
            if dim not in ds.dims or dim not in base_labels:
                continue
            mine = ds._dim_labels(dim)
            remap = mine.join(base_labels[dim], on="__pos", how="full_outer")
            # any position present on one side only ⇒ size mismatch
            bad = remap.where(F.col(dim).isNull() | F.col("__new").isNull())
            if not bad.isEmpty():
                raise ValueError(
                    f"cannot align with join='override': index sizes differ "
                    f"along dimension {dim!r}"
                )
            remap = remap.select(dim, "__new")
            df = (
                df.join(F.broadcast(remap), on=dim, how="inner")
                .drop(dim)
                .withColumnRenamed("__new", dim)
                .select(*ds.df.columns)
            )
        out.append(ds._replace(df=df))
    return tuple(out)


def reindex(
    ds: XDataset,
    indexers: Mapping,
    method: str | None = None,
    tolerance: float | None = None,
    fill_value=None,
) -> XDataset:
    """Conform to new labels (xarray/core/dataset.py:3546).

    Left join FROM the new label table (so missing labels materialize as
    null rows), with optional as-of matching (nearest/ffill/bfill) done
    label-table-to-label-table — both sides tiny, broadcast.
    """
    spark = ds.spark
    out_df = ds.df
    for dim, labels in indexers.items():
        if isinstance(labels, XDataset):
            new_labels = labels.df.select(dim).distinct()
            lab_list = None
        elif hasattr(labels, "sparkSession"):  # DataFrame label table
            new_labels = labels.select(dim).distinct()
            lab_list = None
        else:
            lab_list = list(labels)
            from xarray_spark._utils import local_df
            new_labels = local_df(spark, [(l,) for l in lab_list], [dim])
        if method is not None:
            # map each new label to the best-matching existing label
            matched = _asof_label_map(ds, dim, new_labels, method, tolerance)
            # join data on matched old label, re-key to the new label;
            # __hit marks rows that found a match, so fill_value touches
            # only positions INTRODUCED by the reindex (xarray semantics:
            # genuine nulls at matched labels survive)
            fact = out_df.withColumnRenamed(dim, "__old").withColumn("__hit", F.lit(1))
            out_df = (
                F.broadcast(matched).join(fact, matched["__match"] == fact["__old"], "left")
                .drop("__match", "__old")
            )
        else:
            out_df = F.broadcast(new_labels).join(
                out_df.withColumn("__hit", F.lit(1)), on=dim, how="left"
            )
        if fill_value is not None:
            for v in ds.data_vars:
                out_df = out_df.withColumn(
                    v,
                    F.when(F.col("__hit").isNull(), F.lit(fill_value)).otherwise(F.col(v)),
                )
        out_df = out_df.drop("__hit")
    return ds._replace(df=out_df.select(*ds.df.columns))


def _asof_label_map(ds: XDataset, dim: str, new_labels: DataFrame, method: str, tolerance):
    """(new_label, matched_old_label) table via broadcast as-of match."""
    from pyspark.sql import Window
    from xarray_spark._utils import to_double
    dtype = ds.df.schema[dim].dataType
    old = ds.df.select(F.col(dim).alias("__lab")).distinct()
    j = new_labels.crossJoin(F.broadcast(old))
    lab, rq = F.col("__lab"), F.col(dim)
    lab_d, rq_d = to_double(lab, dtype), to_double(rq, dtype)
    if method in ("ffill", "pad"):
        j = j.where(lab <= rq)
        dist = rq_d - lab_d
    elif method in ("bfill", "backfill"):
        j = j.where(lab >= rq)
        dist = lab_d - rq_d
    elif method == "nearest":
        dist = F.abs(lab_d - rq_d)
    else:
        raise ValueError(method)
    if tolerance is not None:
        j = j.where(dist <= F.lit(float(tolerance)))
    # pandas get_indexer(method='nearest') breaks distance ties
    # toward the HIGHER label; pad/backfill ties are impossible
    tie = lab.desc() if method == "nearest" else lab.asc()
    w = Window.partitionBy(dim).orderBy(dist.asc(), tie)
    best = j.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    matched = new_labels.join(
        best.select(dim, F.col("__lab").alias("__match")), on=dim, how="left"
    )
    return matched


def sel_points_nearest(
    ds: XDataset,
    queries: Mapping[str, Sequence[float]],
    point_dim: str = "points",
    metric: str = "euclidean",
) -> XDataset:
    """N-D nearest-point selection over coordinate columns — the engine's
    NDPointIndex (xarray/indexes/nd_point_index.py:107, KD-tree nearest
    over irregular grids).

    Spark mapping (SURVEY §1.2): broadcast the (small) query-point table
    against the fact table, rank candidates by distance per query,
    keep rank 1.  The fact table streams once; the only shuffle is the
    per-query top-1 (query-count-sized).  For huge query sets, bucket
    both sides with a space-filling key first (same pattern as the LSH
    modules).
    """
    cols = list(queries)
    lens = {len(v) for v in queries.values()}
    if len(lens) != 1:
        raise ValueError("query coordinate arrays must have equal lengths")
    n, = lens
    from pyspark.sql import Window
    rows = [(i, *[float(queries[c][i]) for c in cols]) for i in range(n)]
    from xarray_spark._utils import local_df
    q = local_df(ds.spark, rows, [point_dim] + [f"__q_{c}" for c in cols])
    joined = ds.df.crossJoin(F.broadcast(q))
    if metric == "euclidean":
        dist = sum(
            ((F.col(c).cast("double") - F.col(f"__q_{c}")) ** 2 for c in cols),
            F.lit(0.0),
        )
    elif metric == "manhattan":
        dist = sum(
            (F.abs(F.col(c).cast("double") - F.col(f"__q_{c}")) for c in cols),
            F.lit(0.0),
        )
    else:
        raise ValueError(f"unknown metric {metric!r}")
    w = Window.partitionBy(point_dim).orderBy(
        dist.asc(), *[F.col(c).asc() for c in cols]
    )
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", *[f"__q_{c}" for c in cols])
    )
    coords = {**{k: (point_dim,) for k in ds.coords}, **{c: (point_dim,) for c in cols}}
    return XDataset(
        out.select(point_dim, *ds.df.columns),
        [point_dim], coords, ds.data_vars, ds.attrs,
    )


def broadcast(*datasets: XDataset) -> tuple[XDataset, ...]:
    """Give every dataset the union of dims by cross-joining the missing
    dims' label tables (xarray/structure/alignment.py:1176).  Dimension
    tables are small → broadcast cross joins."""
    all_dims: list[str] = []
    for ds in datasets:
        for d in ds.dims:
            if d not in all_dims:
                all_dims.append(d)
    owners = {d: next(ds for ds in datasets if d in ds.dims) for d in all_dims}
    out = []
    for ds in datasets:
        df = ds.df
        dims = list(ds.dims)
        for d in all_dims:
            if d not in ds.dims:
                labels = owners[d].df.select(d).distinct()
                df = df.crossJoin(F.broadcast(labels))
                dims.append(d)
        out.append(XDataset(df, dims, ds.coords, ds.data_vars, ds.attrs))
    return tuple(out)


def broadcast_like(ds: XDataset, other: XDataset) -> XDataset:
    """Expand ds to other's dims (xarray/core/dataset.py:3389)."""
    df = ds.df
    dims = list(ds.dims)
    for d in other.dims:
        if d not in ds.dims:
            labels = other.df.select(d).distinct()
            df = df.crossJoin(F.broadcast(labels))
            dims.append(d)
    return XDataset(df, dims, ds.coords, ds.data_vars, ds.attrs)


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str],
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with key salting for chronically skewed join keys.

    The big side gets a random salt per row; the small side is
    replicated ``salt`` times (explode of a literal range) so every
    (key, salt) bucket finds its match.  The shuffle key becomes
    (key, salt) — a hot key's rows spread over ``salt`` reducers instead
    of one.  AQE's skew-join splitting handles moderate skew on its own;
    this is the explicit tool for the pathological case (SCALE.md).
    Replication cost: |small| × salt rows — use only when small ≪ big.
    """
    on = list(on)
    b = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, on=on + ["__salt"], how=how)
    return out.drop("__salt")
