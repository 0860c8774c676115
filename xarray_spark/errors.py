"""Reference-parity exception types (xarray/errors.py — re-exported at
the package root so `except xarray_spark.AlignmentError` works like
`except xarray.AlignmentError`).  Each subclasses the builtin the
engine previously raised, so existing `except ValueError` callers keep
working.
"""

from __future__ import annotations


class AlignmentError(ValueError):
    """Indexes cannot be aligned (xarray.AlignmentError)."""


class MergeError(ValueError):
    """Conflicting values during merge (xarray.MergeError)."""


class CoordinateValidationError(ValueError):
    """Invalid coordinates (xarray.CoordinateValidationError)."""


class SerializationWarning(RuntimeWarning):
    """Ambiguous on-disk encodings (xarray.SerializationWarning)."""


class InvalidTreeError(Exception):
    """Invalid DataTree structure (xarray.InvalidTreeError)."""


class NotFoundInTreeError(ValueError):
    """Path absent from the DataTree (xarray.NotFoundInTreeError)."""


class TreeIsomorphismError(ValueError):
    """DataTrees are not isomorphic (xarray.TreeIsomorphismError)."""
