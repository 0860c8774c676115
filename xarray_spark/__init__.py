"""xarray_spark — a PySpark-native engine with xarray's query semantics.

The reference (pydata/xarray) is an in-memory labeled N-d array library;
this engine re-expresses the same semantics over Spark DataFrames in the
**long form**: one row per index tuple, dimension columns as keys, data
variables as value columns (see SURVEY.md §1.4).  Every operator composes
a Catalyst plan; nothing executes until an action (`compute`, `to_pandas`,
`write`) — mirroring xarray's laziness (reference: xarray/core/dataset.py:531).

Design invariants
-----------------
- Dimension label tables are small relative to the fact table -> broadcast.
- Value columns use SQL NULL for missing; `skipna` maps to Spark's
  null-ignoring aggregates (reference NaN model: core/duck_array_ops.py:182).
- No driver-side loops over data; all operators are DataFrame transforms.
"""

from xarray_spark.dataset import XDataset, XDataArray
from xarray_spark.session import get_spark
from xarray_spark.io import (
    open_dataset,
    open_dataarray,
    load_dataset,
    load_dataarray,
    save_mfdataset,
    open_datatree,
    open_groups,
    open_mfdataset,
    from_pandas,
    from_dataframe,
    from_dict,
    from_series,
    decode_cf,
    guess_engine,
    list_engines,
    range_index,
    linspace_index,
    register_backend,
)
from xarray_spark.backends import (
    open_dataset_netcdf,
    open_mfdataset_netcdf,
    open_zarr,
    read_netcdf3,
    to_zarr,
    to_zarr_distributed,
    write_netcdf3,
)
from xarray_spark.combine import concat, merge, combine_by_coords, combine_nested
from xarray_spark.alignment import align, broadcast, salted_join, sel_points_nearest
from xarray_spark.computation import convert_calendar, interp_calendar, date_range_like, infer_freq
from xarray_spark.dataset import register_dataset_accessor, register_dataarray_accessor
from xarray_spark.datatree import DataTree
from xarray_spark.cftime import (
    cf_date_range,
    cf_field,
    cf_field_us,
    cf_ordinal,
    cf_ordinal_us,
    decode_cf_time_us,
)
from xarray_spark.groupby import salted_agg
from xarray_spark.segmented import (
    cumsum_segmented,
    ewm_segmented,
    ffill_segmented,
    rolling_segmented,
)
from xarray_spark.options import OPTIONS, get_options, set_options
from xarray_spark.computation import (
    apply_ufunc,
    cov,
    corr,
    cross,
    date_range,
    dot,
    full_like,
    ones_like,
    polyval,
    where,
    zeros_like,
)
from xarray_spark.datatree import DataTree
from xarray_spark import ufuncs
from xarray_spark.groupers import (
    UniqueGrouper,
    BinGrouper,
    TimeResampler,
    SeasonGrouper,
    EncodedGroups,
)

from xarray_spark.errors import (
    AlignmentError,
    MergeError,
    CoordinateValidationError,
    SerializationWarning,
    InvalidTreeError,
    NotFoundInTreeError,
    TreeIsomorphismError,
)
from xarray_spark.datatree import register_datatree_accessor, group_subtrees

#: reference sentinel for "reduce over every dim" (xarray.ALL_DIMS)
ALL_DIMS = ...

# migration-friendly class-name aliases (xarray.Dataset / xarray.DataArray)
Dataset = XDataset
DataArray = XDataArray

# reference top-level name parity
__version__ = "0.5.0"
cftime_range = cf_date_range


def map_over_datasets(func, tree):
    """Top-level DataTree map (reference __init__ export)."""
    return tree.map_over_datasets(func)


def load_datatree(spark, root, paths):
    """Open + materialize a DataTree (reference load_datatree)."""
    t = DataTree.open(spark, root, paths)
    return t.persist()


def show_versions(file=None):
    import sys
    import pyspark
    print(f"xarray_spark {__version__} / pyspark {pyspark.__version__} / "
          f"python {sys.version.split()[0]}", file=file)

from xarray_spark import testing  # noqa: E402  (public submodule)
from xarray_spark import indexes  # noqa: E402  (index strategy plugin API)
from xarray_spark.indexes import XIndex, PredicateIndex, NDPointIndex  # noqa: E402
from xarray_spark.coordinates import Coordinates  # noqa: E402
from xarray_spark.cftime import CFTimeIndex  # noqa: E402
from xarray_spark import coders  # noqa: E402

#: reference name for the index plugin base class — in this engine an
#: index is a plan strategy (indexes.py), registered the same way
#: (set_xindex(index_cls=...)).
Index = XIndex

__all__ = [
    "testing",
    "indexes",
    "XIndex",
    "PredicateIndex",
    "NDPointIndex",
    "Variable",
    "__version__",
    "show_versions",
    "load_datatree",
    "map_over_datasets",
    "cftime_range",
    "register_dataarray_accessor",
    "register_dataset_accessor",
    "XDataset",
    "XDataArray",
    "get_spark",
    "open_dataset",
    "open_datatree",
    "open_groups",
    "guess_engine",
    "list_engines",
    "register_backend",
    "open_dataset_netcdf",
    "open_mfdataset",
    "open_mfdataset_netcdf",
    "open_zarr",
    "read_netcdf3",
    "to_zarr",
    "to_zarr_distributed",
    "to_zarr_distributed",
    "write_netcdf3",
    "from_pandas",
    "from_series",
    "from_dataframe",
    "from_dict",
    "decode_cf",
    "range_index",
    "linspace_index",
    "concat",
    "merge",
    "combine_by_coords",
    "combine_nested",
    "align",
    "broadcast",
    "sel_points_nearest",
    "salted_agg",
    "salted_join",
    "rolling_segmented",
    "cumsum_segmented",
    "ffill_segmented",
    "OPTIONS",
    "get_options",
    "set_options",
    "open_dataarray",
    "load_dataset",
    "load_dataarray",
    "save_mfdataset",
    "map_blocks",
    "unify_chunks",
    "cf_date_range",
    "cf_field",
    "cf_field_us",
    "cf_ordinal_us",
    "decode_cf_time_us",
    "cf_ordinal",
    "convert_calendar",
    "interp_calendar",
    "date_range_like",
    "ewm_segmented",
    "infer_freq",
    "apply_ufunc",
    "cov",
    "corr",
    "cross",
    "date_range",
    "dot",
    "full_like",
    "ones_like",
    "zeros_like",
    "polyval",
    "where",
    "DataTree",
    "ufuncs",
    "UniqueGrouper",
    "BinGrouper",
    "TimeResampler",
    "SeasonGrouper",
    "EncodedGroups",
    "Dataset",
    "DataArray",
    "ALL_DIMS",
    "AlignmentError",
    "MergeError",
    "CoordinateValidationError",
    "SerializationWarning",
    "InvalidTreeError",
    "NotFoundInTreeError",
    "TreeIsomorphismError",
    "register_datatree_accessor",
    "group_subtrees",
    "Coordinates",
    "Context",
    "CFTimeIndex",
    "Index",
    "IndexVariable",
    "NamedArray",
    "coders",
]


def map_blocks(func, obj, schema=None):
    """Top-level map_blocks (xarray/core/parallel.py:186): dispatch to
    the dataset method."""
    return obj.map_blocks(func, schema)


def unify_chunks(*objects):
    """Top-level unify_chunks parity (xarray/core/dataset.py:8856):
    each Spark DataFrame owns its partitioning; alignment is
    per-operation, so this returns the inputs unchanged."""
    return objects


class Context:
    """Object carrying the information of a call — passed as the
    ``context`` keyword to user ``combine_attrs`` callables (reference
    xarray/core/options.py:109)."""

    def __init__(self, func):
        self.func = func

    def __repr__(self):
        return f"Context(func={self.func!r})"


def Variable(dims, data, attrs=None):
    """Constructor-compatible shim for xr.Variable (variable.py:268):
    the long-form engine has no standalone Variable — it resolves to a
    single-variable dataset via :func:`as_variable`."""
    return as_variable((dims, data, attrs) if attrs is not None
                       else (dims, data))


def IndexVariable(dims, data, attrs=None):
    """Constructor-compatible shim for xr.IndexVariable
    (variable.py:2972, a 1-D coordinate-backing Variable): same
    resolution as :func:`Variable` — in the long-form engine a
    coordinate is a column, and whether it is "indexed" is a plan
    strategy (indexes.py), not a container type."""
    return Variable(dims, data, attrs)


def NamedArray(dims, data, attrs=None):
    """Constructor-compatible shim for xr.NamedArray
    (namedarray/core.py:219, the dims+data base container): resolves
    like :func:`Variable`."""
    return Variable(dims, data, attrs)


def as_variable(obj, name=None):
    """Thin parity shim for xr.as_variable (xarray/core/variable.py:84):
    the long-form engine has no standalone Variable class — a variable
    IS a named column of a dataset — so array-likes resolve to a
    single-variable XDataset/XDataArray.

    Accepted: an XDataset/XDataArray (passes through, optionally
    renamed), or a ``(dims, data)`` / ``(dims, data, attrs)`` tuple of
    in-memory values (built via the active SparkSession)."""
    if isinstance(obj, XDataset):
        if name is not None and list(obj.data_vars) != [name]:
            return obj.rename({obj.data_vars[0]: name})
        return obj
    if isinstance(obj, tuple) and len(obj) in (2, 3):
        dims, data = obj[0], obj[1]
        attrs = obj[2] if len(obj) == 3 else None
        dims = [dims] if isinstance(dims, str) else list(dims)
        if len(dims) != 1:
            raise NotImplementedError(
                "as_variable tuple form supports 1-D data here; build "
                "multi-dim variables with XDataset.from_dataframe")
        import pandas as pd
        vname = name or "variable"
        pdf = pd.DataFrame({dims[0]: range(len(data)), vname: list(data)})
        ds = XDataset(get_spark().createDataFrame(pdf), dims=dims)
        if attrs:
            ds = ds.assign_attrs(**dict(attrs))
        return ds
    raise TypeError(f"cannot convert {type(obj)!r} to a variable")
