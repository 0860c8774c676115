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
        p = self._norm(path)
        self._check_alignment(p, ds)
        # existing descendants must stay aligned with the new ancestor
        for k, v in self._nodes.items():
            if k.startswith(p + "/") or (p == "/" and k != "/"):
                self._check_alignment(k, v, against=(p, ds))
        self._nodes[p] = ds

    def __getitem__(self, path: str) -> XDataset:
        return self._nodes[self._norm(path)]

    # ------------------------------------------------------------------ #
    # inherited coordinates (reference core/datatree.py: child nodes see
    # ancestor coordinates; conflicting indexes raise at tree build)
    # ------------------------------------------------------------------ #

    @staticmethod
    def _node_labels(ds: XDataset, dim: str) -> list:
        """The node's label list for one dim — label tables are small
        by the engine's core invariant, so this is metadata-scale."""
        rows = ds.df.select(dim).distinct().orderBy(dim).collect()
        return [r[dim] for r in rows]

    def _ancestor_labels(self, path: str, dim: str,
                         extra=None) -> list | None:
        """Labels of the NEAREST ancestor that defines ``dim``."""
        cur = self._parent_path(path)
        while cur is not None:
            node = self._nodes.get(cur)
            if extra is not None and cur == extra[0]:
                node = extra[1]
            if node is not None and dim in node.dims:
                return self._node_labels(node, dim)
            cur = self._parent_path(cur)
        return None

    def _check_alignment(self, path: str, ds: XDataset,
                         against=None) -> None:
        """Reference parity: a node whose dim labels conflict with an
        ancestor's is rejected ('group ... is not aligned with its
        parents').  Positional labels (0..n-1 of the same size) are
        the engine's 'no explicit coordinate' form and inherit
        instead."""
        for dim in ds.dims:
            anc = self._ancestor_labels(path, dim, extra=against)
            if anc is None:
                continue
            mine = self._node_labels(ds, dim)
            if mine == anc or mine == list(range(len(anc))):
                continue
            raise ValueError(
                f"group {path!r} is not aligned with its parents: "
                f"dim {dim!r} labels {mine[:5]}... != inherited "
                f"{anc[:5]}...")

    def to_dataset(self, path: str, inherit: bool = True) -> XDataset:
        """The node's dataset view (reference ``tree[path].ds`` /
        ``DataTree.to_dataset(inherit=)``): with ``inherit=True``
        (default), a dim whose labels are the positional default
        0..n-1 is relabeled by the nearest ancestor's labels for that
        dim; ``inherit=False`` returns the stored node untouched
        (reference keeps only local coords)."""
        p = self._norm(path)
        ds = self._nodes[p]
        if not inherit:
            return ds
        from pyspark.sql import functions as F
        out = ds
        for dim in ds.dims:
            anc = self._ancestor_labels(p, dim)
            if anc is None:
                continue
            mine = self._node_labels(ds, dim)
            if mine == anc:
                continue
            if mine == list(range(len(anc))):
                # positional labels -> inherit the ancestor's, by
                # position, through a broadcast literal mapping
                spark = ds.df.sparkSession
                from xarray_spark._utils import local_df
                mapping = local_df(
                    spark,
                    [(i, lab) for i, lab in enumerate(anc)],
                    ["__pos__", "__lab__"])
                df = (out.df.join(
                    F.broadcast(mapping),
                    out.df[dim] == F.col("__pos__"), "inner")
                    .drop(dim, "__pos__")
                    .withColumnRenamed("__lab__", dim))
                out = out._replace(df=df.select(*out.df.columns))
        return out


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

    # ------------------------------------------------------------------ #
    # tree navigation on the path-keyed model (reference treenode.py —
    # the node-object walk becomes path-string arithmetic, all metadata)
    # ------------------------------------------------------------------ #

    @staticmethod
    def _parent_path(path: str) -> str | None:
        p = path.rstrip("/")
        if p in ("", "/"):
            return None
        head = p.rsplit("/", 1)[0]
        return head or "/"

    def parent(self, path: str) -> str | None:
        """Parent path (reference DataTree.parent)."""
        return self._parent_path(self._norm(path))

    def children(self, path: str = "/") -> tuple[str, ...]:
        """Immediate child paths (reference DataTree.children)."""
        p = self._norm(path)
        base = "" if p == "/" else p
        seen = set()
        for k in self._nodes:
            if k != p and k.startswith(base + "/"):
                rest = k[len(base) + 1:]
                seen.add(base + "/" + rest.split("/", 1)[0])
        return tuple(sorted(seen))

    def siblings(self, path: str) -> tuple[str, ...]:
        par = self.parent(path)
        if par is None:
            return ()
        return tuple(c for c in self.children(par)
                     if c != self._norm(path))

    @property
    def leaves(self) -> tuple[str, ...]:
        """Paths with no children (reference DataTree.leaves)."""
        return tuple(p for p in self.groups if not self.children(p))

    def depth_of(self, path: str) -> int:
        p = self._norm(path)
        return 0 if p == "/" else p.count("/")

    @property
    def depth(self) -> int:
        """Max node depth (reference DataTree.depth)."""
        return max((self.depth_of(p) for p in self.groups), default=0)

    @property
    def width(self) -> int:
        """Node count at the ROOT's level — 1 by construction (the
        reference's width is a per-node property: "number of nodes at
        this level"; on the root that is always 1).  Use
        :meth:`width_at` for other levels."""
        return self.width_at("/")

    def width_at(self, path: str) -> int:
        """Number of nodes at ``path``'s level, cousins included
        (reference treenode.py:487 width semantics)."""
        lvl = self.depth_of(path)
        return sum(1 for p in self.groups if self.depth_of(p) == lvl)

    def is_leaf(self, path: str) -> bool:
        return not self.children(path)

    def is_root(self, path: str) -> bool:
        return self._norm(path) == "/"

    @property
    def root(self) -> str:
        return "/"

    def ancestors(self, path: str) -> tuple[str, ...]:
        out = []
        cur = self.parent(path)
        while cur is not None:
            out.append(cur)
            cur = self._parent_path(cur)
        return tuple(reversed(out))

    def find_common_ancestor(self, a: str, b: str) -> str:
        pa = [*self.ancestors(a), self._norm(a)]
        pb = set([*self.ancestors(b), self._norm(b)])
        common = [p for p in pa if p in pb]
        return common[-1] if common else "/"

    def relative_to(self, path: str, other: str) -> str:
        p, o = self._norm(path), self._norm(other)
        if p == o:
            return "."
        if not p.startswith(o.rstrip("/") + "/") and o != "/":
            raise ValueError(f"{path!r} is not inside {other!r}")
        return p[len(o.rstrip("/")) + 1:]

    def same_tree(self, other: "DataTree") -> bool:
        return self is other

    # dict-like views (reference DataTree mapping interface)
    def keys(self):
        return iter(self.groups)

    def items(self):
        return ((p, self._nodes[p]) for p in self.groups)

    def values(self):
        return (self._nodes[p] for p in self.groups)

    def copy(self) -> "DataTree":
        return DataTree(dict(self._nodes))

    def update(self, other) -> "DataTree":
        """New tree with ``other``'s nodes overriding (reference
        DataTree.update is mutating; the engine keeps trees immutable
        like every other operator)."""
        nodes = dict(self._nodes)
        src = other._nodes if isinstance(other, DataTree) else {
            self._norm(k): v for k, v in other.items()}
        nodes.update(src)
        return DataTree(nodes)

    def pipe(self, func, *args, **kw):
        return func(self, *args, **kw)

    # ------------------------------------------------------------------ #
    # dataset-op passthrough: reductions/transforms apply per node
    # (reference DataTree inherits the Dataset namespace and maps it
    # over the subtree — datatree_mapping.py)
    # ------------------------------------------------------------------ #

    def _map_method(self, name, *args, **kw):
        return self.map_over_datasets(
            lambda d: getattr(d, name)(*args, **kw))

    # arithmetic maps over every node (reference DataTree inherits the
    # typed-ops mixin, datatree.py); scalar/Column operands only — a
    # tree⊗tree op would need isomorphic alignment
    def _tree_binop(self, other, opname, reflexive=False):
        if isinstance(other, DataTree):
            if not self.isomorphic(other):
                raise ValueError("tree arithmetic needs isomorphic trees")
            out = DataTree()
            for p in self._nodes:
                a, b = self._nodes[p], other._nodes[p]
                out[p] = getattr(a, opname)(b)
            return out
        return self.map_over_datasets(lambda d: getattr(d, opname)(other))

    def __add__(self, o): return self._tree_binop(o, "__add__")
    def __sub__(self, o): return self._tree_binop(o, "__sub__")
    def __mul__(self, o): return self._tree_binop(o, "__mul__")
    def __truediv__(self, o): return self._tree_binop(o, "__truediv__")
    def __pow__(self, o): return self._tree_binop(o, "__pow__")
    def __radd__(self, o): return self.map_over_datasets(lambda d: d.__radd__(o))
    def __rmul__(self, o): return self.map_over_datasets(lambda d: d.__rmul__(o))
    def __rsub__(self, o): return self.map_over_datasets(lambda d: d.__rsub__(o))
    def __neg__(self): return self.map_over_datasets(lambda d: -d)

    def mean(self, *a, **k): return self._map_method("mean", *a, **k)
    def sum(self, *a, **k): return self._map_method("sum", *a, **k)
    def min(self, *a, **k): return self._map_method("min", *a, **k)
    def max(self, *a, **k): return self._map_method("max", *a, **k)
    def std(self, *a, **k): return self._map_method("std", *a, **k)
    def var(self, *a, **k): return self._map_method("var", *a, **k)
    def median(self, *a, **k): return self._map_method("median", *a, **k)
    def count(self, *a, **k): return self._map_method("count", *a, **k)
    def prod(self, *a, **k): return self._map_method("prod", *a, **k)
    def all(self, *a, **k): return self._map_method("all", *a, **k)
    def any(self, *a, **k): return self._map_method("any", *a, **k)
    def cumsum(self, *a, **k): return self._map_method("cumsum", *a, **k)
    def cumprod(self, *a, **k): return self._map_method("cumprod", *a, **k)
    def reduce(self, *a, **k): return self._map_method("reduce", *a, **k)
    def round(self, *a, **k): return self._map_method("round", *a, **k)
    def conj(self): return self._map_method("conj")
    def chunk(self, *a, **k): return self._map_method("chunk", *a, **k)

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
