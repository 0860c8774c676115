"""Sources & sinks (reference: xarray/backends/api.py).

``open_dataset`` maps to a parquet scan + catalog sidecar; Catalyst
pushes predicates/column pruning into the scan (the engine analogue of
LazilyIndexedArray composition, xarray/core/indexing.py:713 — here it
is free).
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xarray_spark.dataset import XDataset


# --------------------------------------------------------------------- #
# backend plugin registry (xarray/backends/plugins.py: BACKEND_ENTRYPOINTS
# + guess_engine).  Third-party formats register an opener and an
# optional sniffer; open_dataset dispatches by name or by sniffing.
# --------------------------------------------------------------------- #

_BACKENDS: dict = {}


def register_backend(name: str, open_fn, guess_can_open=None) -> None:
    """Register a backend engine (xarray BackendEntrypoint analogue).

    ``open_fn(spark, path, variables=None, decoders=None) -> XDataset``;
    ``guess_can_open(path) -> bool`` lets ``open_dataset`` pick the
    engine from the path when none is given.
    """
    _BACKENDS[name] = {"open": open_fn, "guess": guess_can_open}


def list_engines() -> list[str]:
    """Registered engine names, parquet (the native scan) first."""
    return ["parquet"] + list(_BACKENDS)


def guess_engine(path: str) -> str:
    """First registered backend whose sniffer claims the path
    (xarray/backends/plugins.py:171 guess_engine); parquet otherwise."""
    for name, spec in _BACKENDS.items():
        g = spec.get("guess")
        try:
            if g is not None and g(path):
                return name
        except Exception:  # noqa: BLE001 - a broken sniffer must not block others
            continue
    return "parquet"


def _register_builtin_backends() -> None:
    def _open_nc(spark, path, variables=None, decoders=None):
        from xarray_spark.backends import open_dataset_netcdf
        return open_dataset_netcdf(spark, path, variables=variables, decoders=decoders)

    def _open_zarr(spark, path, variables=None, decoders=None):
        from xarray_spark.backends import open_zarr
        return open_zarr(spark, path, variables=variables)

    register_backend(
        "netcdf", _open_nc,
        lambda p: p.endswith((".nc", ".cdf", ".nc3")),
    )
    register_backend(
        "zarr", _open_zarr,
        lambda p: (p.endswith(".zarr")
                   or os.path.exists(os.path.join(p, ".zgroup"))
                   or os.path.exists(os.path.join(p, "zarr.json"))),
    )


_register_builtin_backends()


def open_dataset(
    spark: SparkSession,
    path: str,
    dims: Sequence[str] | None = None,
    coords: Mapping[str, Sequence[str]] | None = None,
    decoders: Mapping[str, object] | None = None,
    engine: str | None = None,
    variables: Sequence[str] | None = None,
) -> XDataset:
    """Lazy scan (xarray/backends/api.py:395).

    ``engine`` selects the backend: ``'parquet'`` (default), or
    ``'netcdf'`` / ``'zarr'`` (backends.py — pure-python classic-CDF and
    zarr-v2 readers; inferred from a ``.nc`` suffix or a ``.zgroup``
    marker when omitted).  For parquet, an ``_xschema.json`` sidecar
    (written by ``XDataset.to_parquet``) recovers dims/coords.
    ``decoders`` optionally applies CF-style decode expressions at scan
    time (mask/scale/offset — xarray/coding/variables.py:269,:493):
    ``{var: (fill_value, scale, offset)}`` →
    ``(when(col==fill, null) * scale + offset)``.
    """
    if engine is None:
        engine = guess_engine(path)
    if engine != "parquet":
        opener = _BACKENDS.get(engine)
        if opener is None:
            raise ValueError(
                f"unknown engine {engine!r}; registered: {list_engines()}"
            )
        return opener["open"](spark, path, variables=variables, decoders=decoders)
    df = spark.read.parquet(path)
    meta_path = os.path.join(path, "_xschema.json")
    data_vars = None
    attrs = None
    if dims is None and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        dims = meta["dims"]
        coords = {k: tuple(v) for k, v in meta.get("coords", {}).items()}
        data_vars = meta.get("data_vars")
        attrs = meta.get("attrs")
    if dims is None:
        raise ValueError("dims required (no _xschema.json sidecar found)")
    if decoders:
        df = decode_cf(df, decoders)
    return XDataset(df, dims, coords, data_vars, attrs)


# CF unit name → seconds (xarray/coding/times.py _STANDARD_CALENDAR units)
_CF_UNIT_SECONDS = {
    # full CF/udunits grain set (reference coding/times.py _netcdf_to_
    # numpy_timeunit): micro/milli below the second, weeks above the day
    "microseconds": 1e-6, "microsecond": 1e-6, "us": 1e-6,
    "milliseconds": 1e-3, "millisecond": 1e-3, "ms": 1e-3,
    "seconds": 1.0, "second": 1.0, "s": 1.0, "sec": 1.0, "secs": 1.0,
    "minutes": 60.0, "minute": 60.0, "min": 60.0, "mins": 60.0,
    "hours": 3600.0, "hour": 3600.0, "h": 3600.0, "hrs": 3600.0,
    "hr": 3600.0,
    "days": 86400.0, "day": 86400.0, "d": 86400.0,
    "weeks": 604800.0, "week": 604800.0,
}


def decode_cf(df: DataFrame, decoders: Mapping[str, object]) -> DataFrame:
    """Columnar CF decode chain applied at scan time — the engine's
    analogue of xarray's coder stack (conventions.py:498 decode_cf;
    CFMaskCoder coding/variables.py:269, CFScaleOffsetCoder :493,
    CFDatetimeCoder coding/times.py:1355).

    ``decoders[var]`` is either the legacy tuple ``(fill, scale,
    offset)`` or a dict with keys ``fill_value, scale_factor,
    add_offset, time_units`` (e.g. ``'seconds since 1970-01-01'``).
    All pure expressions: mask → ``when(col == fill, null)``,
    scale/offset → arithmetic, time → ``timestamp_seconds(col * unit +
    epoch)`` — they fuse into the scan's codegen stage, so decode is
    free at 100 TB (no second pass over the data).
    """
    for var, spec in decoders.items():
        if isinstance(spec, tuple):
            fill, scale, offset = spec
            time_units = unsigned = dtype = calendar = None
        else:
            fill = spec.get("fill_value")
            scale = spec.get("scale_factor")
            offset = spec.get("add_offset")
            time_units = spec.get("time_units")
            unsigned = spec.get("unsigned")       # CF _Unsigned attr
            dtype = spec.get("dtype")             # 'bool' → CFBoolCoder
            calendar = spec.get("calendar")       # non-real → cftime ordinal
        c = F.col(var)
        if unsigned:
            # netCDF-3 has no unsigned types: producers store u8/u16/u32
            # in the signed container with _Unsigned='true'
            # (coding/variables.py:768 UnsignedIntegerCoder) — reinterpret
            # negative values by adding 2^bits, JVM integer arithmetic
            bits = {"byte": 8, "tinyint": 8, "smallint": 16, "short": 16,
                    "int": 32, "integer": 32}.get(df.schema[var].dataType.simpleString(), 32)
            c = F.when(c < 0, c.cast("long") + F.lit(1 << bits)).otherwise(c.cast("long"))
        missing = (spec.get("missing_value")
                   if isinstance(spec, Mapping) else None)
        bool_sent = None
        if dtype == "bool":
            # Reference coder ORDER: CFMaskCoder runs BEFORE
            # BooleanCoder (conventions.decode_cf_variable), so a
            # _FillValue/missing_value sentinel becomes NaN and casts
            # to True REGARDLESS of its own truth value — verified
            # against the reference: [0,1,-1] FV=-1 -> [F,T,T] and
            # [0,1,0] FV=0 -> [T,T,T] (a falsy sentinel still decodes
            # True; round-9 ADVICE #5)
            if fill is not None:
                bool_sent = F.col(var) == F.lit(fill)
            if missing is not None:
                m = F.col(var) == F.lit(missing)
                bool_sent = m if bool_sent is None else (bool_sent | m)
            fill = missing = None
        if fill is not None:
            c = F.when(F.col(var) == F.lit(fill), F.lit(None)).otherwise(c)
        if missing is not None:
            # CFMaskCoder masks missing_value ALONGSIDE _FillValue —
            # both sentinels null out when present together
            c = F.when(F.col(var) == F.lit(missing), F.lit(None)) \
                 .otherwise(c)
        if scale is not None:
            c = c * F.lit(scale)
        if offset is not None:
            c = c + F.lit(offset)
        if dtype == "bool":
            # CFBoolCoder (coding/variables.py:732): i1 0/1 -> boolean;
            # masked sentinels decode True (NaN truthiness, see above)
            c = c.cast("int").cast("boolean")
            if bool_sent is not None:
                c = F.when(bool_sent, F.lit(True)).otherwise(c)
        # xarray.coders parity: a CFDatetimeCoder in the spec carries
        # the reference's use_cftime flag.  Real-calendar times are
        # timestamps in this engine BY DESIGN (Spark's range, year
        # 1-9999, already covers the pre-1678 dates use_cftime=True
        # exists for), so use_cftime=True only changes anything for
        # non-real calendars (ordinal path below); use_cftime=False on
        # a non-real calendar is unrepresentable and raises, as the
        # reference errors when asked for real datetimes it cannot
        # produce.
        coder = spec.get("coder") if isinstance(spec, dict) else None
        if coder is not None and time_units is not None:
            from xarray_spark.coders import CFDatetimeCoder
            if isinstance(coder, CFDatetimeCoder):
                real = calendar in (None, "standard", "gregorian",
                                    "proleptic_gregorian")
                if coder.use_cftime is False and not real:
                    raise ValueError(
                        f"{var!r}: use_cftime=False but calendar "
                        f"{calendar!r} is not representable as real "
                        "timestamps")
        if time_units is not None and calendar not in (None, "standard",
                                                       "gregorian",
                                                       "proleptic_gregorian"):
            from xarray_spark.cftime import decode_cf_time
            c = decode_cf_time(c, time_units, calendar)
        elif time_units is not None:
            unit, _, epoch = time_units.partition(" since ")
            secs = _CF_UNIT_SECONDS[unit.strip().lower()]
            c = F.timestamp_seconds(
                c.cast("double") * F.lit(secs)
                + F.unix_timestamp(F.lit(epoch.strip()).cast("timestamp"))
            )
        df = df.withColumn(var, c)
    return df


def open_mfdataset(
    spark: SparkSession,
    paths: Sequence[str],
    dims: Sequence[str],
    combine: str = "by_coords",
    concat_dim=None,
    preprocess=None,
    data_vars=None,
    coords=None,
    compat: str | None = None,
    join: str | None = None,
    combine_attrs="override",
    coords_map: Mapping[str, Sequence[str]] | None = None,
) -> XDataset:
    """Multi-file scan + combine (xarray/backends/api.py:1379).

    Default (combine='by_coords', no concat kwargs): ONE multi-path
    parquet read — the scale path; labels carry the tile order so no
    coordination is needed beyond the union, and a 10k-file dataset
    stays a single distributed scan.

    combine='nested' (or any of concat_dim / preprocess / data_vars /
    coords / compat / join given): each path opens as its own dataset,
    ``preprocess`` applies per file, and the results route through the
    full ``concat`` parameter matrix exactly as the reference's
    open_mfdataset forwards them (api.py:1516 _nested_combine /
    combine_by_coords; reference old-style defaults: compat=
    'no_conflicts', data_vars='all', coords='different', join='outer').
    This path plans per file — right for moderate file counts where
    per-file variables genuinely differ; keep the default for
    homogeneous file sets.

    ``coords_map`` is the engine's coord-catalog mapping (name → dims)
    applied to each opened dataset — the schema role the reference
    infers from the file metadata."""
    from xarray_spark.combine import _CONCAT_DEFAULT, concat
    paths = list(paths)
    parameterized = (combine == "nested" or concat_dim is not None
                     or preprocess is not None or data_vars is not None
                     or coords is not None or compat is not None
                     or join is not None)
    if not parameterized:
        df = spark.read.parquet(*paths)
        return XDataset(df, dims, coords_map)
    objs = []
    for p in paths:
        ds = XDataset(spark.read.parquet(p), dims, coords_map)
        if preprocess is not None:
            ds = preprocess(ds)
        objs.append(ds)
    dim = concat_dim if concat_dim is not None else list(dims)[0]
    return concat(
        objs, dim,
        data_vars=_CONCAT_DEFAULT if data_vars is None else data_vars,
        coords="different" if coords is None else coords,
        compat="no_conflicts" if compat is None else compat,
        join="outer" if join is None else join,
        combine_attrs=combine_attrs)


def from_pandas(spark: SparkSession, pdf, dims: Sequence[str],
                coords: Mapping[str, Sequence[str]] | None = None) -> XDataset:
    """pandas bridge (xarray/core/dataset.py:7455 from_dataframe) — the
    long form IS the dataframe form (identity-adjacent)."""
    return XDataset(spark.createDataFrame(pdf), dims, coords)


def from_dataframe(df: DataFrame, dims: Sequence[str],
                   coords: Mapping[str, Sequence[str]] | None = None) -> XDataset:
    return XDataset(df, dims, coords)


def from_series(spark: SparkSession, series, name: str | None = None):
    """pandas Series -> XDataArray (xarray/core/dataarray.py:3929
    from_series): the (multi)index levels become dims, the values the
    single data var."""
    pdf = series.rename(name or series.name or "value").reset_index()
    dims = list(pdf.columns[:-1])
    var = pdf.columns[-1]
    ds = XDataset(spark.createDataFrame(pdf), dims, data_vars=[var])
    return ds[var]


def from_dict(spark: SparkSession, d: Mapping) -> XDataset:
    """Inverse of XDataset.to_dict (xarray/core/dataset.py:7678).
    Accepts BOTH the reference's nested form (data_vars as
    name→{dims, data} mappings — what to_dict now emits) and the
    legacy engine catalog dump (flat ``data`` row list)."""
    dvars = d.get("data_vars")
    if isinstance(dvars, Mapping):
        spec = {name: (tuple(e["dims"]), e["data"])
                for name, e in dvars.items()}
        coords = {}
        for name, e in d.get("coords", {}).items():
            edims = tuple(e.get("dims", (name,)))
            coords[name] = (edims, e["data"]) if edims != (name,) \
                else e["data"]
        return XDataset(spec, coords=coords or None,
                        attrs=d.get("attrs"))
    df = spark.createDataFrame(d["data"])
    return XDataset(
        df, d["dims"],
        {k: tuple(v) for k, v in d.get("coords", {}).items()},
        dvars, d.get("attrs"),
    )


def range_index(spark: SparkSession, dim: str, start: float, stop: float,
                step: float = 1.0) -> DataFrame:
    """Affine generated coordinate — the RangeIndex mapping
    (xarray/indexes/range_index.py:144, arange :197): O(1) state
    (start/stop/step), labels materialized lazily by ``spark.range`` +
    a generated column; no stored coordinate data."""
    n = max(0, int(-(-(stop - start) // step)))  # ceil
    return spark.range(n).select(
        (F.lit(float(start)) + F.col("id") * F.lit(float(step))).alias(dim)
    )


def linspace_index(spark: SparkSession, dim: str, start: float, stop: float,
                   num: int = 50) -> DataFrame:
    """(xarray/indexes/range_index.py:296 linspace)."""
    step = (stop - start) / max(num - 1, 1)
    return spark.range(num).select(
        (F.lit(float(start)) + F.col("id") * F.lit(step)).alias(dim)
    )


def open_groups(spark: SparkSession, root: str) -> dict:
    """Discover and open every group under a hierarchical store
    (xarray/backends/api.py open_groups): returns ``{'/path': XDataset}``.

    Two store layouts:
    - a DataTree parquet root (``DataTree.to_parquet``): every
      subdirectory holding an ``_xschema.json`` sidecar is a group;
    - a zarr store (v2 ``.zgroup`` or v3 ``zarr.json``): every group
      directory whose children include arrays is a group.

    Only the store's directory tree is walked (metadata-sized work);
    each group opens as its own lazy scan.
    """
    import json as _json

    def _is_group(cur, files):
        if ".zgroup" in files:
            return True
        if "zarr.json" in files:
            with open(os.path.join(cur, "zarr.json")) as f:
                return _json.load(f).get("node_type") == "group"
        return False

    def _is_array(path):
        if os.path.exists(os.path.join(path, ".zarray")):
            return True
        zp = os.path.join(path, "zarr.json")
        if os.path.exists(zp):
            with open(zp) as f:
                return _json.load(f).get("node_type") == "array"
        return False

    root = root.rstrip("/")
    out: dict = {}
    if (os.path.exists(os.path.join(root, ".zgroup"))
            or os.path.exists(os.path.join(root, "zarr.json"))):
        for cur, dirs, files in os.walk(root):
            if not _is_group(cur, files):
                continue
            has_arrays = any(_is_array(os.path.join(cur, d)) for d in dirs)
            if not has_arrays:
                continue
            rel = "/" + os.path.relpath(cur, root).replace(os.sep, "/")
            rel = "/" if rel == "/." else rel
            from xarray_spark.backends import open_zarr
            out[rel] = open_zarr(spark, cur)
        return out
    for cur, _dirs, files in os.walk(root):
        if "_xschema.json" not in files:
            continue
        rel = "/" + os.path.relpath(cur, root).replace(os.sep, "/")
        rel = "/" if rel == "/." else rel
        out[rel] = open_dataset(spark, cur)
    return out


def open_datatree(spark: SparkSession, root: str):
    """Open a hierarchical store as a DataTree (xarray/backends/api.py:868)
    — ``open_groups`` + tree assembly."""
    from xarray_spark.datatree import DataTree
    return DataTree(open_groups(spark, root))


def open_dataarray(spark: SparkSession, path: str, **kw):
    """Single-variable open (xarray/backends/api.py:637)."""
    from xarray_spark.dataset import XDataArray
    ds = open_dataset(spark, path, **kw)
    if len(ds.data_vars) != 1:
        raise ValueError(
            f"open_dataarray expects exactly one data variable, found {ds.data_vars}"
        )
    return XDataArray(ds.df, ds.dims, ds.coords, ds.data_vars, ds.attrs)


def load_dataset(spark: SparkSession, path: str, **kw) -> XDataset:
    """Eager variant (xarray/backends/api.py:145): cache + materialize."""
    ds = open_dataset(spark, path, **kw)
    out = ds.persist()
    out.df.count()
    return out


def load_dataarray(spark: SparkSession, path: str, **kw):
    """Eager single-variable open (xarray/backends/api.py:221)."""
    da = open_dataarray(spark, path, **kw)
    out = da.persist()
    out.df.count()
    return out


def save_mfdataset(datasets, paths, mode: str = "overwrite") -> None:
    """Write many datasets to many paths (xarray/backends/api.py:1585
    save_mfdataset) — one parquet sink per dataset; Spark parallelizes
    within each write, the loop is metadata-paced."""
    if len(datasets) != len(paths):
        raise ValueError("save_mfdataset: len(datasets) != len(paths)")
    for ds, p in zip(datasets, paths):
        ds.to_parquet(p, mode=mode)
