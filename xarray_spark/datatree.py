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

    # ---------------------------------------------------------------- #
    # round-4 parity tail (reference core/datatree.py names)
    # ---------------------------------------------------------------- #

    @staticmethod
    def from_dict(nodes: Mapping[str, XDataset]) -> "DataTree":
        """Constructor parity (core/datatree.py:1135 from_dict)."""
        return DataTree(nodes)

    def to_dict(self) -> dict:
        return dict(self._nodes)

    def get(self, path: str, default=None):
        return self._nodes.get(self._norm(path), default)

    def assign(self, nodes: Mapping[str, XDataset]) -> "DataTree":
        """New tree with nodes added/replaced (core/datatree.py:1311)."""
        out = dict(self._nodes)
        for k, v in nodes.items():
            out[self._norm(k)] = v
        return DataTree(out)

    def drop_nodes(self, names, errors: str = "raise") -> "DataTree":
        """Remove nodes by path (core/datatree.py:1340)."""
        names = {self._norm(n) for n in
                 ([names] if isinstance(names, str) else names)}
        missing = names - set(self._nodes)
        if missing and errors == "raise":
            raise KeyError(f"nodes not present: {sorted(missing)}")
        return DataTree({k: v for k, v in self._nodes.items()
                         if k not in names})

    @property
    def dataset(self) -> XDataset | None:
        """The root node's dataset (core/datatree.py ds property)."""
        return self._nodes.get("/")

    ds = dataset

    @property
    def is_empty(self) -> bool:
        return not any(v.data_vars for v in self._nodes.values())

    @property
    def is_hollow(self) -> bool:
        """True when only leaves carry data (core/datatree.py:741)."""
        leaves = {k for k in self._nodes
                  if not any(o != k and o.startswith(k.rstrip("/") + "/")
                             for o in self._nodes)}
        return all(not v.data_vars for k, v in self._nodes.items()
                   if k not in leaves)

    def has_data(self, path: str = "/") -> bool:
        node = self.get(path)
        return bool(node is not None and node.data_vars)

    def isomorphic(self, other: "DataTree") -> bool:
        """Same node paths (core/datatree.py:1565)."""
        return set(self._nodes) == set(other._nodes)

    def equals(self, other: "DataTree") -> bool:
        """Isomorphic + node-wise dataset equality (core/datatree.py:1583)."""
        return self.isomorphic(other) and all(
            self._nodes[k].equals(other._nodes[k]) for k in self._nodes)

    def identical(self, other: "DataTree") -> bool:
        return self.isomorphic(other) and all(
            self._nodes[k].identical(other._nodes[k]) for k in self._nodes)

    def filter_like(self, other: "DataTree") -> "DataTree":
        """Keep only paths present in ``other`` (core/datatree.py:1432)."""
        return DataTree({k: v for k, v in self._nodes.items()
                         if k in other._nodes})

    def isel(self, indexers=None, **kw) -> "DataTree":
        """Map isel over every node that has all the requested dims
        (datatree inherited-selection convention)."""
        idx = {**(indexers or {}), **kw}
        return self.map_over_datasets(
            lambda d: d.isel({k: v for k, v in idx.items() if k in d.dims})
            if any(k in d.dims for k in idx) else d)

    def sel(self, indexers=None, **kw) -> "DataTree":
        idx = {**(indexers or {}), **kw}
        return self.map_over_datasets(
            lambda d: d.sel({k: v for k, v in idx.items() if k in d.dims})
            if any(k in d.dims for k in idx) else d)

    def persist(self) -> "DataTree":
        return self.map_over_datasets(lambda d: d.persist())

    def compute(self) -> dict:
        """Materialize every node (action) — path → row list."""
        return {k: v.compute() for k, v in self._nodes.items()}

    load = compute


def register_datatree_accessor(name: str):
    """Attach a cached custom namespace to DataTree
    (xarray.register_datatree_accessor parity — same pattern as the
    dataset/dataarray registrations in dataset.py)."""
    def wrap(cls):
        prop = property(lambda self: cls(self))
        setattr(DataTree, name, prop)
        return cls
    return wrap


def group_subtrees(*trees: "DataTree"):
    """Iterate matching (path, nodes-tuple) across isomorphic trees
    (xarray.group_subtrees): raises TreeIsomorphismError when the
    path sets differ."""
    from xarray_spark.errors import TreeIsomorphismError
    paths = [set(t.groups) for t in trees]
    if any(p != paths[0] for p in paths[1:]):
        raise TreeIsomorphismError(
            "trees are not isomorphic: node paths differ")
    for p in sorted(paths[0]):
        yield p, tuple(t[p] if p in t else None for t in trees)
