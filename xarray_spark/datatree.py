"""DataTree — hierarchy of datasets (reference: xarray/core/datatree.py:462).

In the long-form engine a tree is a path-keyed dict of XDatasets (the
Spark mapping from SURVEY.md §1.1): each node holds one DataFrame; group
semantics (netCDF/Zarr groups) are directory-shaped parquet layouts.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Mapping

from xarray_spark.dataset import XDataset


class DataTree:
    """Mapping of '/'-separated paths → XDataset nodes."""

    def __init__(self, nodes: Mapping[str, XDataset] | None = None):
        self._nodes: dict[str, XDataset] = {}
        for path, ds in (nodes or {}).items():
            self[path] = ds

    @staticmethod
    def _norm(path: str) -> str:
        return "/" + path.strip("/")

    def __setitem__(self, path: str, ds: XDataset) -> None:
        self._nodes[self._norm(path)] = ds

    def __getitem__(self, path: str) -> XDataset:
        return self._nodes[self._norm(path)]

    def __contains__(self, path: str) -> bool:
        return self._norm(path) in self._nodes

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._nodes))

    def __len__(self) -> int:
        return len(self._nodes)

    @property
    def groups(self) -> tuple[str, ...]:
        return tuple(sorted(self._nodes))

    def subtree(self, prefix: str) -> "DataTree":
        """Nodes under a path prefix (xarray/core/treenode.py subtree
        iteration)."""
        p = self._norm(prefix)
        return DataTree({
            k[len(p):] or "/": v for k, v in self._nodes.items()
            if k == p or k.startswith(p + "/")
        })

    def map_over_datasets(self, func: Callable[[XDataset], XDataset]) -> "DataTree":
        """Apply a Dataset→Dataset transform at every node
        (xarray/core/datatree_mapping.py:16)."""
        return DataTree({k: func(v) for k, v in self._nodes.items()})

    def filter(self, filterfunc: Callable[[XDataset], bool]) -> "DataTree":
        """Keep nodes whose dataset satisfies the predicate
        (xarray/core/datatree.py:1403 DataTree.filter)."""
        return DataTree({k: v for k, v in self._nodes.items() if filterfunc(v)})

    def match(self, pattern: str) -> "DataTree":
        """Keep nodes whose path matches the Unix-style glob
        (xarray/core/datatree.py:1354 DataTree.match)."""
        import fnmatch
        return DataTree({
            k: v for k, v in self._nodes.items()
            if fnmatch.fnmatch(k, pattern) or fnmatch.fnmatch(k.lstrip("/"), pattern)
        })

    def prune(self) -> "DataTree":
        """Drop empty-dataset nodes (datatree prune convention: keep
        only nodes carrying data variables)."""
        return DataTree({k: v for k, v in self._nodes.items() if v.data_vars})

    def to_parquet(self, root: str) -> None:
        """One parquet dir per node under ``root`` (to_zarr group layout,
        xarray/core/datatree.py to_zarr analogue)."""
        for path, ds in self._nodes.items():
            ds.to_parquet(root.rstrip("/") + path)

    @staticmethod
    def open(spark, root: str, paths: list[str]) -> "DataTree":
        """Open a path-keyed tree written by to_parquet
        (xarray/backends/api.py:868 open_datatree analogue)."""
        from xarray_spark.io import open_dataset
        return DataTree({
            p: open_dataset(spark, root.rstrip("/") + DataTree._norm(p))
            for p in paths
        })
