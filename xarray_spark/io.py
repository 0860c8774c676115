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
        if path.endswith((".nc", ".cdf", ".nc3")):
            engine = "netcdf"
        elif path.endswith(".zarr") or os.path.exists(os.path.join(path, ".zgroup")):
            engine = "zarr"
    if engine == "netcdf":
        from xarray_spark.backends import open_dataset_netcdf
        return open_dataset_netcdf(spark, path, variables=variables, decoders=decoders)
    if engine == "zarr":
        from xarray_spark.backends import open_zarr
        return open_zarr(spark, path, variables=variables)
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
    "seconds": 1.0, "second": 1.0, "s": 1.0,
    "minutes": 60.0, "minute": 60.0, "min": 60.0,
    "hours": 3600.0, "hour": 3600.0, "h": 3600.0,
    "days": 86400.0, "day": 86400.0, "d": 86400.0,
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
            time_units = None
        else:
            fill = spec.get("fill_value")
            scale = spec.get("scale_factor")
            offset = spec.get("add_offset")
            time_units = spec.get("time_units")
        c = F.col(var)
        if fill is not None:
            c = F.when(F.col(var) == F.lit(fill), F.lit(None)).otherwise(c)
        if scale is not None:
            c = c * F.lit(scale)
        if offset is not None:
            c = c + F.lit(offset)
        if time_units is not None:
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
) -> XDataset:
    """Multi-file scan + combine (xarray/backends/api.py:1379) —
    a multi-path parquet read; labels carry the tile order so no
    coordination is needed beyond the union."""
    df = spark.read.parquet(*paths)
    return XDataset(df, dims)


def from_pandas(spark: SparkSession, pdf, dims: Sequence[str],
                coords: Mapping[str, Sequence[str]] | None = None) -> XDataset:
    """pandas bridge (xarray/core/dataset.py:7455 from_dataframe) — the
    long form IS the dataframe form (identity-adjacent)."""
    return XDataset(spark.createDataFrame(pdf), dims, coords)


def from_dataframe(df: DataFrame, dims: Sequence[str],
                   coords: Mapping[str, Sequence[str]] | None = None) -> XDataset:
    return XDataset(df, dims, coords)


def from_dict(spark: SparkSession, d: Mapping) -> XDataset:
    """Inverse of XDataset.to_dict (xarray/core/dataset.py:7678)."""
    df = spark.createDataFrame(d["data"])
    return XDataset(
        df, d["dims"],
        {k: tuple(v) for k, v in d.get("coords", {}).items()},
        d.get("data_vars"), d.get("attrs"),
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
