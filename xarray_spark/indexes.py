"""Custom index strategies — the engine's analogue of the reference's
``Index`` plugin API (xarray/core/indexes.py:39; registered via
``Dataset.set_xindex(..., index_cls)``, core/dataset.py:4995).

In the long-form engine an index is a QUERY STRATEGY, not a data
structure: the rows live in a DataFrame, so "indexing" means rewriting
a label request into the right Spark plan — a pushed-down predicate, a
broadcast as-of join, a nearest-point join — and Catalyst owns the
physical access path from there.  A strategy therefore implements one
method, :meth:`XIndex.sel`, taking the dataset and the label request
and returning the selected dataset (the engine's ``IndexSelResult`` —
reference core/indexing.py:58 — IS a dataset: there are no positional
indexers to hand back in a long-form plan).

Built-in equivalents are registered through the same hook so the
default paths are expressible as strategies too:

- :class:`PredicateIndex` — scalar/list/slice labels become pushed
  predicates (the default ``.sel`` path; the reference's PandasIndex
  analogue).
- :class:`NDPointIndex` — N-D nearest-point queries via the broadcast
  distance-rank join (reference xarray/indexes/nd_point_index.py:107,
  the KD-tree index; see alignment.sel_points_nearest).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any


class XIndex:
    """Base strategy for ``set_xindex(index_cls=...)``.

    Subclasses implement :meth:`sel`.  ``from_variables`` mirrors the
    reference's factory classmethod (core/indexes.py:67): it receives
    the coordinate names being indexed plus the ``**options`` passed to
    ``set_xindex``.
    """

    def __init__(self, coord_names: Sequence[str], **options: Any):
        self.coord_names = tuple(coord_names)
        self.options = options

    @classmethod
    def from_variables(cls, coord_names: Sequence[str],
                       **options: Any) -> "XIndex":
        return cls(coord_names, **options)

    def sel(self, ds, labels: Mapping[str, Any], method: str | None = None,
            tolerance: float | None = None):
        """Rewrite the label request into a plan; return the selected
        XDataset.  ``labels`` holds only this index's coords."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support .sel()")

    def __repr__(self):  # parity with the reference's index repr
        return f"{type(self).__name__}({', '.join(self.coord_names)})"


class PredicateIndex(XIndex):
    """The default label strategy: every request becomes a pushed
    predicate / broadcast label join — exactly what ``.sel`` does for
    unregistered coords, expressed through the plugin hook."""

    def sel(self, ds, labels, method=None, tolerance=None):
        out = ds
        for dim, value in labels.items():
            out = out._sel_one(dim, value, method, tolerance)
        return out


class NDPointIndex(XIndex):
    """N-D nearest-point selection (the reference's KD-tree
    NDPointIndex): queries on ALL of this index's coords at once
    resolve via the broadcast distance-rank join.  Options:
    ``point_dim`` (default 'points'), ``metric``
    ('euclidean'/'manhattan')."""

    def sel(self, ds, labels, method=None, tolerance=None):
        from xarray_spark.alignment import sel_points_nearest
        queries = {
            c: list(v) if isinstance(v, (list, tuple)) else [v]
            for c, v in labels.items()
        }
        return sel_points_nearest(
            ds, queries,
            point_dim=self.options.get("point_dim", "points"),
            metric=self.options.get("metric", "euclidean"),
        )
