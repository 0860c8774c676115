"""concat / merge / combine (reference: xarray/structure/{concat,merge,combine}.py).

In long form:
- ``concat`` along an existing dim = unionByName (labels already
  distinguish the inputs); along a NEW dim = unionByName with a literal
  key per input (xarray/structure/concat.py:605 _dataset_concat).
- ``merge`` = full-outer equi-join on shared dim columns, one value
  column per variable, with conflict policies applied columnar
  (xarray/structure/merge.py:696 merge_core).
- ``combine_by_coords`` / ``combine_nested`` collapse to plain unions —
  the long form needs no tiling order (labels carry position).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_spark.dataset import XDataset
from xarray_spark.errors import MergeError


def _np():
    import numpy
    return numpy


def _attrs_equiv(a, b) -> bool:
    try:
        import numpy as np
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return bool(np.array_equal(a, b, equal_nan=True))
        return bool(a == b)
    except Exception:
        return False


def combine_attrs_fn(attrs_list: Sequence[dict], combine_attrs="override") -> dict:
    """Attrs-combination policies (xarray/structure/merge.py:545
    merge_attrs): drop / override / no_conflicts / drop_conflicts /
    identical, or a callable (attrs_list, context=None)."""
    attrs_list = [dict(a or {}) for a in attrs_list]
    if callable(combine_attrs):
        # the reference invokes callables with a keyword context
        # (structure/merge.py:643) — keyword-only signatures must work
        from xarray_spark import Context
        return combine_attrs(attrs_list, context=Context("combine_attrs"))
    if combine_attrs == "drop":
        return {}
    if combine_attrs == "override":
        return dict(attrs_list[0]) if attrs_list else {}
    if combine_attrs == "no_conflicts":
        out: dict = {}
        for a in attrs_list:
            for k, v in a.items():
                if k in out and not _attrs_equiv(out[k], v):
                    raise MergeError(
                        f"combine_attrs='no_conflicts': attr {k!r} has "
                        f"conflicting values {out[k]!r} vs {v!r}")
                out.setdefault(k, v)
        return out
    if combine_attrs == "drop_conflicts":
        out, dropped = {}, set()
        for a in attrs_list:
            for k, v in a.items():
                if k in dropped:
                    continue
                if k in out and not _attrs_equiv(out[k], v):
                    del out[k]
                    dropped.add(k)
                else:
                    out.setdefault(k, v)
        return out
    if combine_attrs == "identical":
        for a in attrs_list[1:]:
            if a != attrs_list[0]:
                raise MergeError(
                    "combine_attrs='identical': attrs differ")
        return dict(attrs_list[0]) if attrs_list else {}
    raise ValueError(f"unknown combine_attrs {combine_attrs!r}")


_CONCAT_DEFAULT = object()  # reference CombineKwargDefault old values

_CONCAT_COMPAT = ("identical", "equals", "broadcast_equals",
                  "no_conflicts", "override")


def _own_dims(o: XDataset, name: str) -> tuple:
    """A variable's own dims in the long form: coords carry theirs in
    the catalog; data vars span all dims unless the dict constructor
    recorded a narrower tuple in ``var_dims``."""
    if name in o.coords:
        return tuple(o.coords[name])
    return tuple(o.var_dims.get(name, o.dims))


def _has_var(o: XDataset, name: str) -> bool:
    return name in o.data_vars or name in o.coords


def _dedup_proj(o: XDataset, dims_key: tuple, names: Sequence[str]) -> DataFrame:
    """(dims_key, names) projection with the long form's broadcast
    copies removed — one row per dims_key tuple.  The var_dims contract
    makes every copy identical, so dropDuplicates is exact."""
    proj = o.df.select(*dims_key, *names)
    if set(dims_key) != set(o.dims):
        proj = (proj.dropDuplicates(list(dims_key)) if dims_key
                else proj.limit(1))
    return proj


def _probe_unequal(a: XDataset, b: XDataset, names: Sequence[str],
                   compat: str) -> set:
    """Eager cross-dataset equality probe for concat's 'different' mode
    and merged-variable compat checks (reference structure/concat.py:371
    _calc_concat_over; merge.py:174 unique_variable): ONE aggregation
    job per (dataset pair, dims-group) answering "is var elementwise
    equal (null-safe) between the two datasets" for every candidate in
    the group at once.  'identical' additionally compares var attrs
    (python-side); 'broadcast_equals' compares on the dims
    intersection (the long-form broadcast of the narrower variable)."""
    out: set = set()
    groups: dict[tuple, list] = {}
    for n in names:
        da, db = _own_dims(a, n), _own_dims(b, n)
        if (compat in ("equals", "identical")
                and set(da) != set(db)):
            out.add(n)  # 'equals'/'identical': dims must match too
            continue
        if compat == "identical" and a.var_attrs(n) != b.var_attrs(n):
            out.add(n)
            continue
        groups.setdefault(tuple(sorted(set(da) & set(db))), []).append(n)
    for key, grp in groups.items():
        ta = _dedup_proj(a, key, grp)
        tb = _dedup_proj(b, key, grp)
        for n in grp:
            tb = tb.withColumnRenamed(n, f"__b_{n}")
        j = (ta.join(tb, on=list(key), how="full_outer") if key
             else ta.crossJoin(tb))

        def _neq(n):
            if compat == "no_conflicts":
                # Variable.no_conflicts (core/variable.py:1920): only
                # values non-null on BOTH sides may disagree
                return (F.col(n).isNotNull()
                        & F.col(f"__b_{n}").isNotNull()
                        & (F.col(n) != F.col(f"__b_{n}")))
            return ~F.col(n).eqNullSafe(F.col(f"__b_{n}"))

        row = j.agg(*[
            F.max(_neq(n).cast("int")).alias(n) for n in grp
        ]).collect()[0]
        out.update(n for n in grp if row[n] == 1)
    return out


def _probe_unequal_many(objs: Sequence[XDataset], names: Sequence[str],
                        compat: str) -> set:
    """N-way form of :func:`_probe_unequal` — ONE aggregation job per
    dims-group regardless of dataset count (a 1000-file mf-concat with
    'different' must not run 999 sequential pair probes).  Union of the
    per-dataset deduplicated projections, then per-key distinct
    value-pattern counts: a variable is equal across ALL inputs iff
    every key tuple sees exactly one (null-pattern, value) pattern and
    no input misses a key that others answer non-null — exactly the
    pairwise full-outer eqNullSafe semantics.  compat='no_conflicts'
    counts distinct NON-null values only (the weak comparison)."""
    out: set = set()
    n = len(objs)
    groups: dict[tuple, list] = {}
    for nm in names:
        dims0 = set(_own_dims(objs[0], nm))
        if any(set(_own_dims(o, nm)) != dims0 for o in objs[1:]):
            # differing own-dims across inputs: rare — delegate to the
            # exact pairwise comparator for this one variable
            for o in objs[1:]:
                if _probe_unequal(objs[0], o, [nm], compat):
                    out.add(nm)
                    break
            continue
        if compat == "identical":
            a0 = objs[0].var_attrs(nm)
            if any(o.var_attrs(nm) != a0 for o in objs[1:]):
                out.add(nm)
                continue
        groups.setdefault(tuple(sorted(dims0)), []).append(nm)
    for key, grp in groups.items():
        u = None
        for o in objs:
            p = _dedup_proj(o, key, grp)
            u = p if u is None else u.unionByName(p)
        aggs = [F.count(F.lit(1)).alias("__cnt")]
        for nm in grp:
            if compat == "no_conflicts":
                aggs.append(F.size(F.collect_set(F.col(nm)))
                            .alias(f"__nv_{nm}"))
            else:
                aggs.append(F.size(F.collect_set(
                    F.struct(F.col(nm).isNull(), F.col(nm))))
                    .alias(f"__nv_{nm}"))
                aggs.append(F.max(F.col(nm).isNotNull().cast("int"))
                            .alias(f"__nn_{nm}"))
        per_key = (u.groupBy(*key).agg(*aggs) if key else u.agg(*aggs))
        conds = []
        for nm in grp:
            nv = F.col(f"__nv_{nm}")
            if compat == "no_conflicts":
                c = nv > 1
            else:
                # a key some input lacks counts as an aligned null
                # there — unequal unless every present value is null
                c = (nv > 1) | ((F.col("__cnt") < n)
                                & (F.col(f"__nn_{nm}") == 1))
            conds.append(F.max(c.cast("int")).alias(nm))
        row = per_key.agg(*conds).collect()[0]
        out.update(nm for nm in grp if row[nm] == 1)
    return out


def _probe_conflicts(a: XDataset, b: XDataset, names: Sequence[str]) -> set:
    """no_conflicts probe: values where BOTH sides are non-null must
    agree (xarray/core/variable.py:1920 Variable.no_conflicts)."""
    out: set = set()
    groups: dict[tuple, list] = {}
    for n in names:
        da, db = _own_dims(a, n), _own_dims(b, n)
        groups.setdefault(tuple(sorted(set(da) & set(db))), []).append(n)
    for key, grp in groups.items():
        ta = _dedup_proj(a, key, grp)
        tb = _dedup_proj(b, key, grp)
        for n in grp:
            tb = tb.withColumnRenamed(n, f"__b_{n}")
        j = (ta.join(tb, on=list(key), how="inner") if key
             else ta.crossJoin(tb))
        row = j.agg(*[
            F.max((F.col(n).isNotNull() & F.col(f"__b_{n}").isNotNull()
                   & (F.col(n) != F.col(f"__b_{n}"))).cast("int")).alias(n)
            for n in grp]).collect()[0]
        out.update(n for n in grp if row[n] == 1)
    return out


def concat(objs: Sequence[XDataset], dim, data_vars=_CONCAT_DEFAULT,
           coords="different", compat: str = "equals",
           positions=None, fill_value=None, join: str = "outer",
           combine_attrs="override", labels: Sequence | None = None,
           create_index_for_new_dim: bool = True) -> XDataset:
    """Concatenate datasets (xarray/structure/concat.py:92 concat,
    :605 _dataset_concat, :371 _calc_concat_over).

    Long-form plan shape:
    - concatenated variables ride ONE union of per-dataset projections
      (along an existing dim the labels already distinguish the inputs;
      along a new dim each input gets a literal label);
    - ``data_vars``/``coords`` ∈ {'all','minimal','different',list}
      decide which variables concatenate vs merge, exactly the
      reference's ``_calc_concat_over`` — 'different' is an EAGER
      equality probe (one null-safe full-outer aggregation per dataset
      pair, all candidate vars answered in the same job), matching the
      reference's eager compute;
    - merged variables that are verified equal across all inputs stay
      in the union (each input's own copy — provably identical);
      merged variables under compat='override'/'no_conflicts' or
      missing from some input are joined back from their source
      dataset's deduplicated (own-dims, value) projection;
    - non-concat dims are aligned first with ``join`` + ``fill_value``
      (reference passes both down to align).

    Defaults follow the reference's current (old-style) kwarg defaults:
    data_vars='all', coords='different', compat='equals', join='outer'.
    ``data_vars=None`` means 'minimal' when ``dim`` already exists and
    'all' otherwise (the reference's documented None semantics).

    Engine stances (documented divergences, all loud or unobservable):
    - existing-dim inputs are assumed label-disjoint (the long form
      keys rows by label; the reference permits duplicate index labels,
      which a keyed representation cannot express);
    - ``positions`` permutes ORDER along the concat dim. Label→value
      association is preserved by the reference (index and data take
      the same inverse permutation), so for labeled dims this is
      unobservable in long form; for a NEW dim without labels the
      positional labels are assigned from ``positions`` directly;
    - ``create_index_for_new_dim`` is accepted; the long form always
      carries the label column, so it has no representational effect.
    """
    objs = list(objs)
    if not objs:
        raise ValueError("must supply at least one object to concatenate")
    if compat not in _CONCAT_COMPAT:
        raise ValueError(
            f"compat={compat!r} invalid: must be one of {_CONCAT_COMPAT}")
    if not isinstance(dim, str):
        # reference _calc_concat_dim_index (structure/concat.py:344):
        # a Variable/DataArray names the dim via ITS dims and supplies
        # labels; a pd.Index via .name; a bare sequence falls back to
        # 'concat_dim'
        dims_attr = getattr(dim, "dims", None)
        if dims_attr is not None and len(dims_attr) == 1 \
                and hasattr(dim, "values"):
            labels = list(_np().asarray(dim.values))
            dim = dims_attr[0]
        elif hasattr(dim, "name"):
            labels = list(dim)
            dim = dim.name or "concat_dim"
        elif isinstance(dim, (list, tuple)) or hasattr(dim, "__len__"):
            labels = list(dim)
            dim = "concat_dim"

    # DataTree inputs: node-wise concat over isomorphic trees
    # (reference _datatree_concat, structure/concat.py:300)
    from xarray_spark.datatree import DataTree
    if len(objs) > 1 and all(isinstance(o, DataTree) for o in objs):
        paths0 = list(objs[0]._nodes)
        for o in objs[1:]:
            if list(o._nodes) != paths0:
                raise ValueError(
                    "All trees must be isomorphic to apply concat")
        out_tree = DataTree()
        for p in paths0:
            out_tree[p] = concat(
                [o._nodes[p] for o in objs], dim,
                data_vars=data_vars, coords=coords, compat=compat,
                positions=positions, fill_value=fill_value, join=join,
                combine_attrs=combine_attrs, labels=labels,
                create_index_for_new_dim=create_index_for_new_dim)
        return out_tree

    # DataArray inputs: the FIRST array's name wins — later arrays are
    # renamed to it (reference _dataarray_concat, structure/concat.py:
    # 884); compat='identical' instead requires identical names.
    from xarray_spark.dataset import XDataArray
    if len(objs) > 1 and all(isinstance(o, XDataArray) for o in objs):
        names = [o.data_vars[0] for o in objs]
        if len(set(names)) > 1:
            if compat == "identical":
                raise ValueError("array names not identical")
            objs = [o if n == names[0] else o.rename({n: names[0]})
                    for o, n in zip(objs, names)]

    first = objs[0]
    existing = any(dim in o.dims for o in objs)
    promote = False
    if not existing:
        # concat dim is a scalar coord / data var of the inputs: the
        # reference expand_dims route (structure/concat.py:668) — the
        # column already carries each dataset's label
        if any(dim in o.data_vars for o in objs):
            raise ValueError(
                f"cannot concatenate along {dim!r}: it is a data "
                "variable of the inputs — promote it to a coordinate "
                "first (set_coords)")
        havers_dim = [o for o in objs
                      if dim in o.coords and tuple(o.coords[dim]) == ()]
        if havers_dim:
            if len(havers_dim) != len(objs):
                raise NotImplementedError(
                    f"concat dim {dim!r} is a scalar coordinate in some "
                    "inputs but absent from others")
            promote = True

    # ---- resolve option defaults (reference CombineKwargDefault olds)
    dv_opt = "all" if data_vars is _CONCAT_DEFAULT else data_vars
    if dv_opt is None:
        dv_opt = "minimal" if (existing or promote) else "all"
    co_opt = coords
    newdim = not (existing or promote)

    if newdim and dv_opt == "minimal" and co_opt == "minimal":
        raise ValueError(
            "Cannot specify both data_vars='minimal' and coords='minimal' "
            "when concatenating over a new dimension.")
    for subset, opt in (("data_vars", dv_opt), ("coords", co_opt)):
        if opt == "different" and compat == "override":
            raise ValueError(
                f"Cannot specify both {subset}='different' and "
                "compat='override'.")

    # a name that is a coordinate in some inputs but a data var in
    # others (reference both_data_and_coords check)
    coord_union = set().union(*[set(o.coords) for o in objs]) - {dim}
    data_union = set().union(*[set(o.data_vars) for o in objs])
    both = coord_union & data_union
    if both:
        raise ValueError(
            f"{both!r} is a coordinate in some datasets but not others.")

    if compat == "identical":
        a0 = {k: v for k, v in first.attrs.items() if k != "__var__"}
        for o in objs[1:]:
            if {k: v for k, v in o.attrs.items() if k != "__var__"} != a0:
                raise ValueError("Dataset global attributes not equal.")

    if (existing or promote) and labels is not None:
        # concat(objs, dim=pd.Index(values, name=<existing dim>)): the
        # provided index REPLACES the concatenated labels positionally
        # (probe-confirmed; reference _calc_concat_dim_index builds a
        # fresh PandasIndex).  Positions follow each input's label sort
        # order (the engine's positional invariant), dataset order
        # across inputs; one tiny label-table job per input.
        import pandas as _pd
        labs_all = list(labels)
        off = 0
        relabeled = []
        for o in objs:
            lt = o._dim_labels(dim)
            size_row = lt.agg(F.max("__size").alias("s")).collect()
            size = int(size_row[0]["s"] or 0) if size_row else 0
            seg = labs_all[off:off + size]
            if len(seg) != size:
                raise ValueError(
                    f"{len(labs_all)} labels for a concatenated length "
                    "that exceeds them")
            off += size
            map_df = o.df.sparkSession.createDataFrame(
                _pd.DataFrame({"__pos": list(range(size)),
                               "__new": seg}))
            remap = (lt.join(F.broadcast(map_df), on="__pos")
                     .select(dim, "__new"))
            df = (o.df.join(F.broadcast(remap), on=dim, how="left")
                  .drop(dim).withColumnRenamed("__new", dim)
                  .select(*o.df.columns))
            relabeled.append(o._replace(df=df))
        if off != len(labs_all):
            raise ValueError(
                f"{len(labs_all)} labels for a concatenated length "
                f"of {off}")
        objs = relabeled
        first = objs[0]

    # ---- materialize DERIVED inputs once (round-12 optimization,
    # guide §2.4/§3.3): concat references each input's plan many times
    # (label probes, 'different'/compat probes, the union frame, the
    # joinback projections, missing-dim label tables).  When an input
    # is itself an aggregation/join, every reference used to re-execute
    # its full sub-plan — q142's final plan re-scanned the parquet
    # source 30×.  A lazy localCheckpoint computes it exactly once;
    # bare scans are left untouched (raw fact tables must never be
    # materialized at 100 TB — see _utils.materialize_if_derived).
    if len(objs) > 1:
        from xarray_spark._utils import materialize_if_derived
        objs = [o._replace(df=materialize_if_derived(o.df)) for o in objs]
        first = objs[0]

    # ---- align the non-concat dims (reference aligns with join +
    # fill_value, exclude=[dim] — structure/concat.py:644).  Label-set
    # equality is probed EAGERLY first (one label-table job per shared
    # dim — the reference's align is eager too): equal sets (the
    # file-chunk concat norm) skip the conform plan entirely, so the
    # default path stays a pure union with no extra joins.
    from collections import Counter
    counts = Counter(d for o in objs for d in set(o.dims) if d != dim)
    shared_other = [d for d, n in counts.items() if n > 1]
    if len(objs) > 1 and shared_other:
        from xarray_spark.alignment import _label_presence, align as _align
        need = []
        markers = {}
        for d in shared_other:
            # fused single-pass probe (round-12): ONE union+groupBy over
            # every haver's distinct labels yields the presence marker —
            # set equality falls out (a label missing from any haver),
            # and the SAME tiny table then feeds align's label sets and
            # per-dataset missing-label filters, so the conform plan
            # re-reads a checkpointed marker instead of re-deriving
            # label tables per dataset (guide §2.3/§2.4; the old form
            # probed pairwise and align re-joined the label sets).
            hav_frames = [o.df for o in objs if d in o.dims]
            marker = _label_presence(hav_frames, d)
            differ = not marker.where(
                F.size("__hav") != len(hav_frames)).isEmpty()
            if differ:
                if join == "exact":
                    from xarray_spark.errors import AlignmentError
                    raise AlignmentError(
                        f"indexes along dimension {d!r} are not equal")
                need.append(d)
                try:
                    # checkpoint ONLY the differ case: the marker is
                    # re-referenced per dataset inside align's conform,
                    # so one tiny materialized table beats n re-derives.
                    # Equal-set probes (the file-chunk concat norm)
                    # discard the marker — checkpointing there taxed
                    # q20 ~30% warm for nothing (measured this round).
                    marker = marker.localCheckpoint()
                except Exception:  # noqa: BLE001
                    pass  # keep lineage when checkpointing is unavailable
                markers[d] = marker
        if need:
            objs = list(_align(*objs, join=join, fill_value=fill_value,
                               exclude=[dim] + [d for d in shared_other
                                                if d not in need],
                               _markers=markers))
            first = objs[0]

    # ---- name universe, in first-appearance order
    all_data = list(dict.fromkeys(v for o in objs for v in o.data_vars))
    all_coords = list(dict.fromkeys(
        c for o in objs for c in o.coords if c != dim))

    def _first_haver(name: str) -> XDataset:
        for o in objs:
            if _has_var(o, name):
                return o
        raise KeyError(name)

    # ---- which variables concatenate (reference _calc_concat_over)
    concat_over: set = set()
    equals_known: dict = {}
    if existing:
        for o in objs:
            for name in (*o.data_vars, *o.coords):
                if dim in _own_dims(o, name):
                    concat_over.add(name)
    if promote:
        # reference expand_dims(dim) gives every data var the new dim
        concat_over.update(all_data)

    def _process(opt, subset: str) -> None:
        if subset == "data_vars":
            cands, pool = list(first.data_vars), all_data
        else:
            cands = [c for c in first.coords if c != dim]
            pool = all_coords
        if isinstance(opt, str):
            if opt == "different":
                probe: list = []
                for k in cands:
                    if k in concat_over:
                        continue
                    havers = [o for o in objs if _has_var(o, k)]
                    if len(havers) == 1:
                        # reference quirk (structure/concat.py:461): a
                        # candidate present in exactly one dataset stops
                        # the WHOLE probe loop — later candidates stay
                        # merged.  Observable (probe-confirmed), kept.
                        break
                    if len(havers) != len(objs):
                        raise ValueError(
                            f"{k!r} not present in all datasets and "
                            f"coords='different'. Either add {k!r} to "
                            "datasets where it is missing or specify "
                            "coords='minimal'.")
                    probe.append(k)
                if len(objs) > 2:
                    bad = _probe_unequal_many(objs, probe, compat)
                else:
                    bad = (_probe_unequal(first, objs[1], probe, compat)
                           if probe else set())
                concat_over.update(bad)
                for k in probe:
                    equals_known[k] = k not in bad
            elif opt == "all":
                concat_over.update(pool)
            elif opt == "minimal":
                pass
            else:
                raise ValueError(f"unexpected value for {subset}: {opt!r}")
        else:
            listed = list(opt)
            valid = (set(cands) | set(first.dims) if subset == "coords"
                     else set(cands))
            invalid = [k for k in listed if k not in valid]
            if invalid:
                if subset == "coords":
                    raise ValueError(
                        f"the variables {invalid} in coords are not found "
                        f"in the coordinates of the first dataset "
                        f"{tuple(cands)}")
                raise ValueError(
                    f"the variables {invalid} in data_vars are not found "
                    "in the data variables of the first dataset")
            concat_over.update(k for k in listed if k not in first.dims)

    _process(dv_opt, "data_vars")
    _process(co_opt, "coords")

    # ---- labels / positions for a new dim
    if positions is not None:
        pos = [list(p) for p in positions]
        if len(pos) != len(objs):
            raise ValueError(
                "positions must have one entry per object to concatenate")
        flat = [int(x) for p in pos for x in p]
        if sorted(flat) != list(range(len(flat))):
            raise ValueError(
                "positions must form a permutation of the concatenated "
                "positions")
        if newdim and any(len(p) != 1 for p in pos):
            raise ValueError(
                "each positions entry must have length 1 when "
                "concatenating along a new dimension")
    if newdim:
        if labels is not None:
            labs = list(labels)
            if len(labs) != len(objs):
                raise ValueError(
                    f"{len(labs)} labels for {len(objs)} datasets")
        elif positions is not None:
            labs = [int(p[0]) for p in pos]
        else:
            labs = list(range(len(objs)))

    # ---- output dims / catalog (union across inputs — the reference's
    # ensure_common_dims promote-shape: concat of v(x) and v(y) along a
    # new dim broadcasts both to (dim, x, y))
    rest = list(dict.fromkeys(
        [d for o in objs for d in o.dims if d != dim]))
    if newdim or promote:
        dims_out = [dim] + rest
    else:
        dims_out = list(dict.fromkeys(list(first.dims) + rest))

    concat_coords = [c for c in all_coords if c in concat_over]
    concat_data = [v for v in all_data if v in concat_over]
    merged_names = ([v for v in all_data if v not in concat_over]
                    + [c for c in all_coords if c not in concat_over])

    # ---- merged-variable compat verification (reference
    # merge_collected / unique_variable; `equals` dict reused from the
    # 'different' probe so nothing is compared twice)
    carry_in_union: set = set()
    joinback: list = []   # (name, mode) mode in {"first", "coalesce"}
    if merged_names:
        to_check = [n for n in merged_names
                    if equals_known.get(n) is not True
                    and sum(_has_var(o, n) for o in objs) > 1]
        if compat in ("equals", "identical", "broadcast_equals",
                      "no_conflicts"):
            byhav: dict = {}
            for n in to_check:
                hav = tuple(i for i, o in enumerate(objs)
                            if _has_var(o, n))
                byhav.setdefault(hav, []).append(n)
            for hav, ns in sorted(byhav.items()):
                sub = [objs[i] for i in hav]
                if len(sub) > 2:
                    bad = _probe_unequal_many(sub, ns, compat)
                elif compat == "no_conflicts":
                    bad = _probe_conflicts(sub[0], sub[1], ns)
                else:
                    bad = _probe_unequal(sub[0], sub[1], ns, compat)
                if bad:
                    hint = ("" if compat == "no_conflicts" else
                            " You can skip this check by specifying "
                            "compat='override'.")
                    raise MergeError(
                        f"conflicting values for variable "
                        f"{sorted(bad)[0]!r} on objects to be "
                        f"combined.{hint}")
            if compat != "no_conflicts":
                for n in to_check:
                    equals_known[n] = True
        for n in merged_names:
            havers = [o for o in objs if _has_var(o, n)]
            if compat == "no_conflicts" and len(havers) > 1:
                joinback.append((n, "coalesce"))
            elif len(havers) == len(objs) and equals_known.get(n) is True:
                # verified identical in every input: each input's own
                # copy can ride the union — no join-back needed
                carry_in_union.add(n)
            else:
                joinback.append((n, "first"))

    # ---- per-dataset concat frames → ONE union
    def _fv(name: str):
        if isinstance(fill_value, Mapping):
            return fill_value.get(name)
        return fill_value

    def _var_type(name: str):
        src = _first_haver(name)
        return src.df.schema[name].dataType

    union_cols = (dims_out + concat_coords
                  + [n for n in merged_names if n in carry_in_union]
                  + concat_data)

    frames = []
    for i, o in enumerate(objs):
        df = o.df
        # a dataset missing one of the output dims entirely: broadcast
        # its rows across that dim's labels (reference set_dims /
        # ensure_common_dims tiling, structure/concat.py:718)
        for d in dims_out:
            if d == dim and newdim:
                continue
            if d not in o.dims and d not in df.columns:
                lab_src = next(x for x in objs if d in x.dims)
                df = df.crossJoin(F.broadcast(
                    lab_src.df.select(d).where(F.col(d).isNotNull())
                    .distinct()))
        cols = []
        for c in union_cols:
            if c == dim and newdim:
                cols.append(F.lit(labs[i]).alias(dim))
            elif c in df.columns:
                cols.append(F.col(c))
            elif c in concat_coords or c in o.coords or c in coord_union:
                raise ValueError(
                    f"coordinate {c!r} not present in all datasets.")
            else:
                cols.append(F.lit(_fv(c)).cast(_var_type(c)).alias(c))
        frames.append(df.select(*cols))
    base = frames[0]
    for f in frames[1:]:
        base = base.unionByName(f)

    # ---- join merged variables back on their own dims
    jb_groups: dict = {}
    for n, mode in joinback:
        key = tuple(_own_dims(_first_haver(n), n))
        jb_groups.setdefault((key, mode), []).append(n)
    for (key, mode), ns in jb_groups.items():
        if mode == "first":
            srcs: dict = {}
            for n in ns:
                srcs.setdefault(id(_first_haver(n)), (_first_haver(n), []))[1].append(n)
            tables = [_dedup_proj(src, key, grp)
                      for src, grp in srcs.values()]
            tbl = tables[0]
            for t in tables[1:]:
                tbl = (tbl.join(t, on=list(key), how="full_outer") if key
                       else tbl.crossJoin(t))
        else:  # coalesce across havers, dataset order (no_conflicts)
            tbl = None
            for n in ns:
                havers = [o for o in objs if _has_var(o, n)]
                acc = _dedup_proj(havers[0], key, [n])
                for o in havers[1:]:
                    t = (_dedup_proj(o, key, [n])
                         .withColumnRenamed(n, f"__b_{n}"))
                    acc = (acc.join(t, on=list(key), how="full_outer")
                           if key else acc.crossJoin(t))
                    acc = acc.withColumn(
                        n, F.coalesce(F.col(n), F.col(f"__b_{n}"))
                    ).drop(f"__b_{n}")
                tbl = (acc if tbl is None else
                       (tbl.join(acc, on=list(key), how="full_outer")
                        if key else tbl.crossJoin(acc)))
        if key:
            base = base.join(tbl, on=list(key), how="left")
        else:
            base = base.crossJoin(F.broadcast(tbl))

    # ---- attrs: dataset-level + per-variable (reference merge_attrs /
    # concat_vars both honor combine_attrs)
    strip = [{k: v for k, v in o.attrs.items() if k != "__var__"}
             for o in objs]
    attrs = combine_attrs_fn(strip, combine_attrs)
    vat_out: dict = {}
    for name in (*all_data, *all_coords):
        per = [o.attrs.get("__var__", {}).get(name)
               for o in objs
               if _has_var(o, name) and name in o.attrs.get("__var__", {})]
        if per:
            vat_out[name] = combine_attrs_fn(per, combine_attrs)
    if vat_out:
        attrs["__var__"] = vat_out

    # ---- result catalog
    coords_out: dict = {}
    for c in all_coords:
        cd = tuple(_own_dims(_first_haver(c), c))
        if c in concat_over and dim not in cd:
            coords_out[c] = (dim,) + cd
        else:
            coords_out[c] = cd
    vd_out: dict = {}
    dims_out_t = tuple(dims_out)
    for v in all_data:
        if v in concat_over:
            # a concatenated var's dims = the UNION of its own dims
            # across inputs (reference ensure_common_dims
            # promote-shape), concat dim first
            od = tuple(dict.fromkeys(
                d for o in objs if _has_var(o, v)
                for d in _own_dims(o, v)))
            nd = od if dim in od else (dim,) + od
        else:
            # merged: the FIRST haver's variable wins wholesale
            nd = tuple(_own_dims(_first_haver(v), v))
        if nd != dims_out_t:
            vd_out[v] = nd

    out = XDataset(base, dims_out, coords_out, all_data, attrs)
    out.var_dims = vd_out
    return out


_VALID_COMPAT = ("identical", "equals", "broadcast_equals", "minimal",
                 "no_conflicts", "override")


def merge(objs: Sequence[XDataset], compat: str = "no_conflicts",
          join: str = "outer", fill_value=None,
          combine_attrs="override") -> XDataset:
    """Merge variables of multiple datasets (xarray/structure/merge.py:855).

    Full-outer join on shared dims; same-name variable conflicts resolved
    per ``compat`` (the reference's _VALID_COMPAT matrix, merge.py:106):
    - 'override': first wins, no checking.
    - 'no_conflicts': coalesce; values must agree where both non-null
      (xarray/core/variable.py:1920) — checked EAGERLY (one inner join
      on the shared labels per pair, label-table-shaped work).
    - 'equals': overlapping variables must be element-wise equal
      (same values AND same null pattern) — eager check, first kept.
    - 'identical': 'equals' + dataset attrs must match.
    - 'broadcast_equals': equal after broadcasting to the union of dims
      (a constant-along-t variable merges with its reduced form).
    - 'minimal': overlapping data vars are DROPPED from the result
      (keep only vars unique to one input), no equality requirement.

    ``fill_value`` fills ONLY alignment-introduced missing slices (a
    presence marker per side distinguishes "row absent" from "value
    null" — reference align semantics); pre-existing nulls stay null.
    ``combine_attrs`` follows merge_attrs (default 'override' = first
    dataset's attrs, the reference default).  ``join='exact'`` raises
    when any shared dim's label sets differ (alignment.py exact).
    """
    if compat not in _VALID_COMPAT:
        raise ValueError(f"compat {compat!r} not in {_VALID_COMPAT}")
    # reference merge accepts raw mappings (variable dicts) alongside
    # Dataset/DataArray objects (structure/merge.py:855 signature)
    objs = [o if isinstance(o, XDataset) else XDataset(dict(o))
            for o in objs]
    if len(objs) > 1:
        # merge references each input repeatedly (exact/compat probes +
        # the accumulated join); derived inputs compute once — same
        # rationale as concat (see _utils.materialize_if_derived)
        from xarray_spark._utils import materialize_if_derived
        objs = [o._replace(df=materialize_if_derived(o.df))
                for o in objs]
    exact = join == "exact"
    how = {"outer": "full_outer", "inner": "inner", "left": "left",
           "right": "right", "exact": "full_outer"}[join]
    acc = objs[0]
    if compat == "identical":
        a0 = dict(objs[0].attrs or {})
        for o in objs[1:]:
            if dict(o.attrs or {}) != a0:
                raise MergeError("merge(compat='identical'): attrs differ")
    for other in objs[1:]:
        shared = [d for d in acc.dims if d in other.dims]
        if exact:
            for d in shared:
                l = acc.df.select(d).distinct()
                r = other.df.select(d).distinct()
                if l.subtract(r).union(r.subtract(l)).take(1):
                    raise ValueError(
                        f"merge(join='exact'): indexes along dimension "
                        f"{d!r} are not equal")
        o_df = other.df
        overlap_vars = [v for v in other.data_vars if v in acc.data_vars]
        renames = {}
        for c in o_df.columns:
            if c in shared:
                continue
            if c in acc.df.columns:
                renames[c] = f"__m_{c}"
        for old, new in renames.items():
            o_df = o_df.withColumnRenamed(old, new)
        if overlap_vars and compat in ("equals", "identical", "broadcast_equals"):
            _assert_vars_equal(acc, other, overlap_vars, shared,
                               broadcast_first=(compat == "broadcast_equals"))
        elif overlap_vars and compat == "no_conflicts":
            assert_no_conflicts(acc, other)
        dropped = set(overlap_vars) if compat == "minimal" else set()
        acc_df = acc.df
        if fill_value is not None:
            # presence markers: fill ONLY alignment-introduced slices,
            # never a variable's own pre-existing nulls
            acc_df = acc_df.withColumn("__pl", F.lit(True))
            o_df = o_df.withColumn("__pr", F.lit(True))
        joined = acc_df.join(o_df, on=shared, how=how) if shared else acc_df.crossJoin(o_df)

        def _fillwrap(expr, marker):
            if fill_value is None:
                return expr
            return F.when(F.col(marker).isNull(),
                          F.lit(fill_value)).otherwise(expr)

        exprs = []
        for c in acc.df.columns:
            if c in dropped:
                continue
            if c in overlap_vars:
                if compat == "override":
                    # the reference picks the FIRST dataset's variable
                    # wholesale (merge.py:151): labels it lacks stay
                    # null after the union — no elementwise fallback
                    exprs.append(_fillwrap(F.col(c), "__pl").alias(c))
                else:
                    exprs.append(F.coalesce(F.col(c), F.col(f"__m_{c}")).alias(c))
            elif c in acc.data_vars:
                exprs.append(_fillwrap(F.col(c), "__pl").alias(c))
            else:
                exprs.append(F.col(c))
        new_vars = [v for v in other.data_vars if v not in acc.data_vars]
        for v in new_vars:
            exprs.append(_fillwrap(F.col(renames.get(v, v)), "__pr").alias(v))
        new_dims = list(acc.dims) + [d for d in other.dims if d not in acc.dims]
        for d in other.dims:
            if d not in acc.dims:
                exprs.append(F.col(renames.get(d, d)).alias(d))
        coords = dict(acc.coords)
        acc = XDataset(
            joined.select(*exprs),
            new_dims,
            coords,
            [v for v in acc.data_vars if v not in dropped] + new_vars,
            acc.attrs,
        )
    return acc._replace(
        attrs=combine_attrs_fn([o.attrs for o in objs], combine_attrs))


def _assert_vars_equal(a: XDataset, b: XDataset, overlap: Sequence[str],
                       shared: Sequence[str], broadcast_first: bool = False) -> None:
    """Eager per-variable equality for merge compat 'equals'/'identical'/
    'broadcast_equals': on the shared label domain, values must match
    INCLUDING the null pattern (unlike no_conflicts, which lets a null
    on one side coexist with a value on the other)."""
    if broadcast_first:
        from xarray_spark.alignment import broadcast as _bcast
        a, b = _bcast(a, b)
        shared = [d for d in a.dims if d in b.dims]
    o_df = b.df
    for v in overlap:
        o_df = o_df.withColumnRenamed(v, f"__b_{v}")
    # FULL OUTER: the reference compares after outer alignment, so a
    # label present on one side only is itself a conflict (the aligned
    # null differs from the other side's value — merge.py:174
    # unique_variable equals-after-align)
    j = a.df.select(*shared, *overlap).join(
        o_df.select(*shared, *[f"__b_{v}" for v in overlap]),
        on=list(shared), how="full_outer",
    )
    conds = [
        ~F.col(v).eqNullSafe(F.col(f"__b_{v}"))  # null-safe inequality
        for v in overlap
    ]
    bad = j.where(conds[0] if len(conds) == 1 else
                  F.greatest(*[c.cast("int") for c in conds]) == 1)
    if not bad.isEmpty():
        raise MergeError(
            "merge conflict: overlapping variables are not equal "
            f"(compat='{'broadcast_equals' if broadcast_first else 'equals'}')"
        )


def assert_no_conflicts(a: XDataset, b: XDataset) -> None:
    """Eager check for merge(compat='no_conflicts')
    (xarray/core/variable.py:1920): overlapping non-null values must agree."""
    shared = [d for d in a.dims if d in b.dims]
    overlap = [v for v in a.data_vars if v in b.data_vars]
    if not overlap:
        return
    o_df = b.df
    for v in overlap:
        o_df = o_df.withColumnRenamed(v, f"__b_{v}")
    j = a.df.join(o_df, on=shared, how="inner")
    conds = [
        F.col(v).isNotNull() & F.col(f"__b_{v}").isNotNull() & (F.col(v) != F.col(f"__b_{v}"))
        for v in overlap
    ]
    bad = j.where(conds[0] if len(conds) == 1 else F.greatest(*[c.cast("int") for c in conds]) == 1)
    if not bad.isEmpty():
        raise MergeError("merge conflict: overlapping values disagree")


def combine_by_coords(objs: Sequence[XDataset], compat: str = "no_conflicts",
                      data_vars="all", coords="different", fill_value=None,
                      join: str = "outer",
                      combine_attrs="no_conflicts") -> XDataset:
    """(xarray/structure/combine.py:798) — long form: union; labels
    carry the tile order, so the reference's coord-monotonic ordering
    inference is unnecessary.

    Non-default concat kwargs route through :func:`concat` along the
    ONE dim whose label sets differ across inputs (the mf-tile norm —
    decided by the same eager label probe concat uses); multi-dim
    tiling with non-default kwargs raises rather than guessing the
    reference's N-D inference (combine.py:88
    _infer_concat_order_from_coords)."""
    objs = list(objs)
    first = objs[0]
    if len(objs) == 1:
        return first
    attrs = combine_attrs_fn([o.attrs for o in objs], combine_attrs)
    plain = (compat == "no_conflicts" and data_vars == "all"
             and coords == "different" and fill_value is None
             and join == "outer")
    if plain:
        df = first.df
        for o in objs[1:]:
            df = df.unionByName(o.df, allowMissingColumns=True)
        return first._replace(df=df, attrs=attrs)
    differing = []
    for d in first.dims:
        tabs = [o.df.select(d).where(F.col(d).isNotNull()).distinct()
                for o in objs if d in o.dims]
        if len(tabs) < 2:
            continue
        for t in tabs[1:]:
            if not tabs[0].exceptAll(t).union(
                    t.exceptAll(tabs[0])).isEmpty():
                differing.append(d)
                break
    if len(differing) != 1:
        raise NotImplementedError(
            f"combine_by_coords with non-default kwargs needs exactly "
            f"one dim whose labels differ across inputs; found "
            f"{differing!r}")
    out = concat(objs, differing[0], data_vars=data_vars, coords=coords,
                 compat=compat, fill_value=fill_value, join=join,
                 combine_attrs=combine_attrs)
    return out._replace(attrs=attrs)


def combine_nested(objs, concat_dim, compat: str = "no_conflicts",
                   data_vars="all", coords="different", fill_value=None,
                   join: str = "outer",
                   combine_attrs="drop") -> XDataset:
    """(xarray/structure/combine.py:431 combine_nested / :217
    _combine_nd) — N-D hypercube combine.

    ``concat_dim`` is one entry per nesting depth (a bare value wraps
    to a 1-list): the OUTERMOST list level combines along
    ``concat_dim[0]``, inner levels along the later entries — so
    ``[[t1, t2], [t3, t4]]`` with ``concat_dim=['x', 'y']`` concats
    each inner pair along ``y`` then the two rows along ``x``, exactly
    the reference's tile order.  A ``None`` entry means MERGE at that
    level instead of concatenating.  The concat matrix kwargs forward
    to each concat; defaults are the reference's old-style
    (compat='no_conflicts', data_vars='all', coords='different',
    join='outer') and ``combine_attrs='drop'`` — the reference's
    combine_nested default, NOT concat's 'override'."""
    if isinstance(concat_dim, (str, type(None))) or hasattr(concat_dim, "name"):
        dims_list = [concat_dim]
    else:
        dims_list = list(concat_dim)

    def _depth(x):
        return 1 + max((_depth(y) for y in x), default=0) \
            if isinstance(x, (list, tuple)) else 0

    depth = _depth(objs)
    if depth != len(dims_list):
        raise ValueError(
            f"concat_dims has length {len(dims_list)} but the datasets "
            f"passed are nested in a {depth}-dimensional structure")

    def _combine(x, level):
        if not isinstance(x, (list, tuple)):
            return x
        items = [_combine(y, level + 1) for y in x]
        if len(items) == 1:
            return items[0]
        d = dims_list[level]
        if d is None:
            return merge(items, compat=compat, join=join,
                         fill_value=fill_value,
                         combine_attrs=combine_attrs)
        return concat(items, d, data_vars=data_vars, coords=coords,
                      compat=compat, fill_value=fill_value, join=join,
                      combine_attrs=combine_attrs)

    return _combine(objs, 0)
