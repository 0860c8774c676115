"""Coordinates — the reference's coordinate-mapping container
(xarray/core/coordinates.py:363 ``Coordinates``), re-expressed for the
long-form engine.

In the engine a coordinate is a COLUMN of the dataset's DataFrame, so
``Coordinates`` here is a lightweight driver-side mapping of
``name -> values`` (plus optional pandas-MultiIndex dims) that the
dict-style ``XDataset``/``XDataArray`` constructors consume.  The
reference's ``indexes`` argument has no engine equivalent — index
*strategies* are pluggable via ``set_xindex(index_cls=...)``
(indexes.py), while coordinate DATA lives in columns — so it is
accepted for API compatibility and validated to be consistent, nothing
more.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

__all__ = ["Coordinates"]


class Coordinates(Mapping):
    """Dict-like container of coordinate variables.

    Accepted values per name:

    - a 1-D array-like → a dimension coordinate named after itself;
    - a ``(dims, data)`` / ``(dims, data, attrs)`` tuple → a (possibly
      non-dim) coordinate on explicit dims;
    - a scalar → a 0-d coordinate.

    Use :meth:`from_pandas_multiindex` for stacked (multi-level) dims:
    the engine represents those as a struct-keyed dim column with one
    level coordinate per MultiIndex level (the same layout
    ``set_index([..])`` / ``stack()`` produce)."""

    def __init__(self, coords: Mapping[Any, Any] | None = None,
                 indexes: Mapping[Any, Any] | None = None) -> None:
        self._data: dict[Any, Any] = dict(coords or {})
        self._multi: dict[Any, Any] = {}  # dim -> pd.MultiIndex
        if indexes:
            unknown = [k for k in indexes
                       if k not in self._data and k not in self._multi]
            if unknown:
                raise ValueError(
                    f"indexes given for coords that do not exist: {unknown}")

    # ---- mapping protocol ------------------------------------------- #
    def __getitem__(self, key):
        if key in self._data:
            return self._data[key]
        if key in self._multi:
            return self._multi[key]
        raise KeyError(key)

    def __iter__(self):
        yield from self._data
        yield from self._multi

    def __len__(self):
        return len(self._data) + len(self._multi)

    def __repr__(self):
        names = list(self._data) + [f"{d} (multi)" for d in self._multi]
        return f"<xarray_spark.Coordinates {names}>"

    # ---- constructors ----------------------------------------------- #
    @classmethod
    def from_pandas_multiindex(cls, midx, dim) -> "Coordinates":
        """Wrap a ``pd.MultiIndex`` as the coordinates of a stacked dim
        (reference coordinates.py:437): the dim's key becomes a struct
        of the levels and each level becomes a coordinate on ``dim``."""
        import pandas as pd

        if not isinstance(midx, pd.MultiIndex):
            raise TypeError(
                f"from_pandas_multiindex expects a pandas.MultiIndex, "
                f"got {type(midx).__name__}")
        if any(n is None for n in midx.names):
            raise ValueError("all MultiIndex levels must be named")
        out = cls()
        out._multi[dim] = midx
        return out

    @classmethod
    def from_xindex(cls, index) -> "Coordinates":
        raise NotImplementedError(
            "from_xindex: engine indexes are plan strategies "
            "(set_xindex(index_cls=...)), not coordinate generators; "
            "build coordinate values directly instead")

    # ---- conversion / convenience ----------------------------------- #
    @property
    def dims(self) -> dict:
        return dict(self.sizes)

    @property
    def sizes(self) -> dict:
        import numpy as np

        out: dict[Any, int] = {}
        for name, v in self._data.items():
            if isinstance(v, tuple) and len(v) in (2, 3):
                dims = (v[0],) if isinstance(v[0], str) else tuple(v[0])
                arr = np.asarray(v[1])
                for d, s in zip(dims, arr.shape):
                    out.setdefault(d, s)
            else:
                arr = np.asarray(v)
                if arr.ndim == 1:
                    out.setdefault(name, arr.shape[0])
        for d, mi in self._multi.items():
            out.setdefault(d, len(mi))
        return out

    @property
    def variables(self) -> dict:
        """name -> values for every coordinate, MultiIndex levels
        included."""
        out = dict(self._data)
        for d, mi in self._multi.items():
            for name in mi.names:
                out[name] = (d, list(mi.get_level_values(name)))
        return out

    def keys(self):
        return list(iter(self))

    def to_dataset(self):
        """Coordinate-only XDataset (reference coordinates.py:633)."""
        from xarray_spark.dataset import XDataset

        return XDataset({}, coords=self)

    def to_index(self, ordered_dims=None):
        """pandas Index over the (product of the) dims."""
        import pandas as pd

        sizes = self.sizes
        dims = list(ordered_dims) if ordered_dims is not None else list(sizes)
        ixs = []
        for d in dims:
            if d in self._multi:
                ixs.append(self._multi[d])
            elif d in self._data:
                import numpy as np
                ixs.append(pd.Index(np.asarray(self._data[d]), name=d))
            else:
                ixs.append(pd.RangeIndex(sizes[d], name=d))
        if len(ixs) == 1:
            return ixs[0]
        out = ixs[0]
        for nxt in ixs[1:]:
            frame_a = out.to_frame(index=False)
            frame_b = nxt.to_frame(index=False)
            frame = frame_a.merge(frame_b, how="cross")
            out = pd.MultiIndex.from_frame(frame)
        return out

    def assign(self, coords=None, **kw) -> "Coordinates":
        new = Coordinates(dict(self._data))
        new._multi = dict(self._multi)
        new._data.update(dict(coords or {}), **kw)
        return new

    def copy(self) -> "Coordinates":
        return self.assign()

    def update(self, other) -> None:
        if isinstance(other, Coordinates):
            self._data.update(other._data)
            self._multi.update(other._multi)
        else:
            self._data.update(dict(other))

    def merge(self, other) -> "Coordinates":
        new = self.copy()
        new.update(other if other is not None else {})
        return new

    def equals(self, other) -> bool:
        if not isinstance(other, Coordinates):
            return False
        import numpy as np

        if set(self.keys()) != set(other.keys()):
            return False
        a, b = self.variables, other.variables
        for k in a:
            va = np.asarray(a[k][1] if isinstance(a[k], tuple) else a[k])
            vb = np.asarray(b[k][1] if isinstance(b[k], tuple) else b[k])
            if va.shape != vb.shape or not (va == vb).all():
                return False
        return True

    def identical(self, other) -> bool:
        return self.equals(other)
