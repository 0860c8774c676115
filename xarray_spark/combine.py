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

from collections.abc import Sequence

from pyspark.sql import functions as F

from xarray_spark.dataset import XDataset
from xarray_spark.errors import MergeError


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


def concat(objs: Sequence[XDataset], dim: str, labels: Sequence | None = None,
           fill_value=None, combine_attrs="override") -> XDataset:
    """Concatenate datasets (xarray/structure/concat.py:45).

    If ``dim`` is an existing dim in the inputs → plain union.
    If new → each input gets a literal label (0..n-1 or ``labels``).
    A variable absent from one input takes ``fill_value`` on that
    input's rows (default missing — the reference's dtypes.NA).
    """
    objs = list(objs)
    first = objs[0]
    all_vars = list(dict.fromkeys(v for o in objs for v in o.data_vars))
    if not isinstance(dim, str) and hasattr(dim, "name"):
        # the xarray idiom concat(objs, dim=pd.Index(values, name=...)):
        # the index names the new dim and supplies its labels
        labels = list(dim)
        dim = dim.name or "concat_dim"

    def _with_fill(o: XDataset):
        df = o.df
        if fill_value is not None:
            for v in all_vars:
                if v not in df.columns:
                    df = df.withColumn(v, F.lit(fill_value))
        return df

    attrs = combine_attrs_fn([o.attrs for o in objs], combine_attrs)
    if dim in first.dims:
        df = _with_fill(objs[0])
        for o in objs[1:]:
            df = df.unionByName(_with_fill(o), allowMissingColumns=True)
        return first._replace(df=df, data_vars=all_vars, attrs=attrs)
    labels = list(labels) if labels is not None else list(range(len(objs)))
    dfs = []
    for lab, o in zip(labels, objs):
        dfs.append(_with_fill(o).withColumn(dim, F.lit(lab)))
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d, allowMissingColumns=True)
    return XDataset(df, [dim] + list(first.dims), first.coords, all_vars, attrs)


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


def combine_by_coords(objs: Sequence[XDataset]) -> XDataset:
    """(xarray/structure/combine.py:798) — long form: union; labels carry
    the tile order."""
    first = objs[0]
    df = first.df
    for o in objs[1:]:
        df = df.unionByName(o.df, allowMissingColumns=True)
    return first._replace(df=df)


def combine_nested(objs, concat_dim: str) -> XDataset:
    """(xarray/structure/combine.py:431) — ordered union with per-tile
    literal labels when the dim is new."""
    flat: list[XDataset] = []

    def _flatten(x):
        if isinstance(x, XDataset):
            flat.append(x)
        else:
            for y in x:
                _flatten(y)
    _flatten(objs)
    return concat(flat, concat_dim)
