"""File-format backends: classic netCDF-3 and zarr v2 → long form.

The reference's front door is ``open_dataset("file.nc")``
(xarray/backends/api.py:395) with engine plugins for netCDF and zarr
(xarray/backends/zarr.py:1471).  This container has no netCDF4/h5py/zarr
libraries, so both formats are implemented here from their PUBLIC
on-disk specifications:

- **netCDF-3 "classic"** (CDF-1/CDF-2): a self-describing big-endian
  binary layout — header (dims, attrs, vars) + contiguous fixed-size
  data + interleaved record data.  Spec: the NetCDF "Classic Format
  Spec" published by Unidata.  Parsed with ``struct``/``numpy`` only.
- **zarr v2**: a directory store — ``.zarray`` JSON metadata per array,
  chunks as separately-compressed binary files.  Codecs supported:
  ``zlib``, ``gzip``, and uncompressed (blosc needs a C library the
  container lacks — raise cleanly).  xarray's dim-name convention
  (``_ARRAY_DIMENSIONS`` in ``.zattrs``) is honored.

Scale model
-----------
A classic netCDF file is a single-machine object by definition (CDF-1
caps offsets at 2 GiB; CDF-2 is still one file) — it is read on the
driver and parallelism comes from ``open_mfdataset_netcdf`` (one task
per FILE via mapInPandas).  A zarr store is chunked by design, so
``open_zarr`` reads CHUNK-parallel: a DataFrame of chunk indices is
``mapInPandas``-mapped to decoded long-form rows — each executor opens
only its chunk files (shared/object storage), the driver never holds
the array.
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from collections.abc import Mapping, Sequence

import numpy as np

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from xarray_spark.dataset import XDataset

# ---------------------------------------------------------------------- #
# netCDF-3 classic binary format
# ---------------------------------------------------------------------- #

_NC_BYTE, _NC_CHAR, _NC_SHORT, _NC_INT, _NC_FLOAT, _NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_NC_DTYPE = {
    _NC_BYTE: np.dtype(">i1"), _NC_CHAR: np.dtype("S1"),
    _NC_SHORT: np.dtype(">i2"), _NC_INT: np.dtype(">i4"),
    _NC_FLOAT: np.dtype(">f4"), _NC_DOUBLE: np.dtype(">f8"),
}
_NC_TYPE_OF = {
    np.dtype("int8"): _NC_BYTE, np.dtype("int16"): _NC_SHORT,
    np.dtype("int32"): _NC_INT, np.dtype("float32"): _NC_FLOAT,
    np.dtype("float64"): _NC_DOUBLE, np.dtype("int64"): _NC_DOUBLE,
}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def name(self) -> str:
        n = self.i4()
        s = self.take(n).decode("utf-8")
        self.take(_pad4(n) - n)
        return s

    def att_value(self):
        nc_type = self.i4()
        nelems = self.i4()
        sz = _NC_DTYPE[nc_type].itemsize * nelems
        raw = self.take(sz)
        self.take(_pad4(sz) - sz)
        if nc_type == _NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=_NC_DTYPE[nc_type]).tolist()

    def att_list(self) -> dict:
        tag = self.i4()
        n = self.i4()
        if tag == 0:
            return {}
        assert tag == _NC_ATTRIBUTE, f"bad attribute tag {tag}"
        return {self.name(): self.att_value() for _ in range(n)}


def read_netcdf3(path: str) -> dict:
    """Parse a classic netCDF-3 file into
    ``{dims: {name: size}, attrs, vars: {name: {dims, attrs, data}}}``
    with ``data`` as a native-endian numpy array."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    magic = r.take(3)
    if magic != b"CDF":
        raise ValueError(f"{path}: not a netCDF classic file (magic {magic!r})")
    version = r.take(1)[0]
    if version not in (1, 2):
        raise ValueError(f"{path}: netCDF-4/HDF5 or unknown version {version} "
                         "(only classic CDF-1/CDF-2 supported)")
    numrecs = r.i4()
    # dimensions
    tag, n = r.i4(), r.i4()
    dim_names, dim_sizes = [], []
    if tag == _NC_DIMENSION:
        for _ in range(n):
            dim_names.append(r.name())
            dim_sizes.append(r.i4())
    attrs = r.att_list()
    # variables
    tag, n = r.i4(), r.i4()
    out_vars: dict = {}
    rec_vars = []
    if tag == _NC_VARIABLE:
        for _ in range(n):
            vname = r.name()
            ndims = r.i4()
            dimids = [r.i4() for _ in range(ndims)]
            vattrs = r.att_list()
            nc_type = r.i4()
            vsize = r.i4()
            begin = r.i4() if version == 1 else r.i8()
            vdims = [dim_names[i] for i in dimids]
            shape = [dim_sizes[i] for i in dimids]
            is_rec = bool(shape) and shape[0] == 0
            spec = dict(dims=vdims, attrs=vattrs, nc_type=nc_type,
                        vsize=vsize, begin=begin, shape=shape, rec=is_rec)
            out_vars[vname] = spec
            if is_rec:
                rec_vars.append(vname)
    recsize = sum(out_vars[v]["vsize"] for v in rec_vars)
    for vname, spec in out_vars.items():
        dt = _NC_DTYPE[spec["nc_type"]]
        if not spec["rec"]:
            count = int(np.prod(spec["shape"])) if spec["shape"] else 1
            arr = np.frombuffer(buf, dtype=dt, count=count, offset=spec["begin"])
            arr = arr.reshape(spec["shape"])
        else:
            per_rec = int(np.prod(spec["shape"][1:])) if spec["shape"][1:] else 1
            rows = []
            for rec in range(numrecs):
                off = spec["begin"] + rec * recsize
                rows.append(np.frombuffer(buf, dtype=dt, count=per_rec, offset=off))
            arr = (np.stack(rows).reshape([numrecs] + spec["shape"][1:])
                   if rows else np.empty([0] + spec["shape"][1:], dtype=dt))
        spec["data"] = arr.astype(arr.dtype.newbyteorder("=")) if dt.kind != "S" else arr
        spec["shape"] = list(spec["data"].shape)
    dims = {nm: (numrecs if sz == 0 else sz) for nm, sz in zip(dim_names, dim_sizes)}
    return {
        "dims": dims,
        "attrs": attrs,
        "vars": {v: {"dims": s["dims"], "attrs": s["attrs"], "data": s["data"]}
                 for v, s in out_vars.items()},
    }


def write_netcdf3(path: str, dims: Mapping[str, int],
                  variables: Mapping[str, tuple], attrs: Mapping | None = None) -> None:
    """Write a classic CDF-1 file (all dims fixed-size, no record dim).

    ``variables``: name → (dim_names, numpy_array[, attrs]).
    """
    dim_names = list(dims)
    dim_index = {d: i for i, d in enumerate(dim_names)}
    body = bytearray()
    body += b"CDF\x01"
    body += struct.pack(">i", 0)  # numrecs

    def put_name(b, s):
        raw = s.encode("utf-8")
        b += struct.pack(">i", len(raw)) + raw + b"\x00" * (_pad4(len(raw)) - len(raw))

    def put_attrs(b, a):
        a = a or {}
        if not a:
            b += struct.pack(">ii", 0, 0)
            return
        b += struct.pack(">ii", _NC_ATTRIBUTE, len(a))
        for k, v in a.items():
            put_name(b, k)
            if isinstance(v, str):
                raw = v.encode("utf-8")
                b += struct.pack(">ii", _NC_CHAR, len(raw)) + raw
                b += b"\x00" * (_pad4(len(raw)) - len(raw))
            else:
                vals = np.asarray(v, dtype=">f8")
                b += struct.pack(">ii", _NC_DOUBLE, vals.size) + vals.tobytes()

    body += struct.pack(">ii", _NC_DIMENSION, len(dim_names))
    for d in dim_names:
        put_name(body, d)
        body += struct.pack(">i", int(dims[d]))
    put_attrs(body, attrs)

    specs = []
    for name, spec in variables.items():
        vdims, arr = spec[0], np.asarray(spec[1])
        vattrs = spec[2] if len(spec) > 2 else {}
        if arr.dtype not in _NC_TYPE_OF:
            arr = arr.astype("float64")
        nc_type = _NC_TYPE_OF[arr.dtype]
        arr = arr.astype(_NC_DTYPE[nc_type])
        vsize = _pad4(arr.nbytes)
        specs.append((name, list(vdims), vattrs, nc_type, vsize, arr))

    # var headers need begin offsets: compute header length first with
    # placeholder offsets (fixed width), then fill
    header = bytearray(body)
    header += struct.pack(">ii", _NC_VARIABLE, len(specs))
    var_blobs = []
    for name, vdims, vattrs, nc_type, vsize, arr in specs:
        b = bytearray()
        put_name(b, name)
        b += struct.pack(">i", len(vdims))
        for d in vdims:
            b += struct.pack(">i", dim_index[d])
        put_attrs(b, vattrs)
        b += struct.pack(">ii", nc_type, vsize)
        var_blobs.append(b)
    header_len = len(header) + sum(len(b) + 4 for b in var_blobs)
    offset = header_len
    out = bytearray(header)
    begins = []
    for (name, vdims, vattrs, nc_type, vsize, arr), b in zip(specs, var_blobs):
        begins.append(offset)
        out += b + struct.pack(">i", offset)
        offset += vsize
    for (_name, _d, _a, _t, vsize, arr) in specs:
        raw = arr.tobytes()
        out += raw + b"\x00" * (vsize - len(raw))
    with open(path, "wb") as f:
        f.write(bytes(out))


# ---------------------------------------------------------------------- #
# long-form conversion shared by both formats
# ---------------------------------------------------------------------- #

def _long_frame(dims: Sequence[str], coord_arrays: Mapping[str, np.ndarray],
                var_arrays: Mapping[str, np.ndarray]):
    """Dense hypercube → long-form pandas frame (one row per element).

    Coord columns expand via broadcast views flattened once (one copy
    per column) — ``np.indices`` + fancy-index would materialize an
    extra ndim×N int64 index block and a gather per column, ~2× the
    memory traffic on the chunk-decode hot path (open_zarr)."""
    import pandas as pd
    shape = [len(coord_arrays[d]) for d in dims]
    data = {}
    for i, d in enumerate(dims):
        arr = np.asarray(coord_arrays[d])
        view = [1] * len(shape)
        view[i] = shape[i]
        data[d] = np.broadcast_to(arr.reshape(view), shape).reshape(-1)
    for v, arr in var_arrays.items():
        data[v] = np.asarray(arr).reshape(-1)
    return pd.DataFrame(data)


def _select_var_group(all_vars: Mapping[str, dict], dims_of, variables=None):
    """Pick the data variables to load and their (shared) dim tuple.

    Coordinate variables (1-D, named after their dim) become labels;
    remaining vars must share one dim tuple (mixed-dim stores: pass
    ``variables=`` explicitly, one group per open)."""
    names = [v for v in all_vars if variables is None or v in variables]
    coords = {v for v in names if dims_of(v) == [v]}
    data_names = [v for v in names if v not in coords]
    if variables is not None:
        data_names = [v for v in variables if v in data_names]
    if not data_names:
        raise ValueError("no data variables to open")
    dim_tuples = {tuple(dims_of(v)) for v in data_names}
    if len(dim_tuples) != 1:
        raise NotImplementedError(
            f"variables span different dims {sorted(dim_tuples)}; open them "
            "in groups via variables=[...]")
    return data_names, list(dim_tuples.pop())


def open_dataset_netcdf(spark: SparkSession, path: str,
                        variables: Sequence[str] | None = None,
                        decoders: Mapping | None = None) -> XDataset:
    """Open a classic netCDF-3 file as a long-form XDataset
    (xarray/backends/api.py:395, engine='netcdf').

    Driver-side parse (one file = one machine by format design) →
    ``createDataFrame``; dims without a coordinate variable get 0-based
    positional labels.  CF decoding (mask/scale/offset/time units) is
    applied from variable attrs via io.decode_cf when present.
    """
    meta = read_netcdf3(path)
    dims_of = lambda v: meta["vars"][v]["dims"]  # noqa: E731
    data_names, dims = _select_var_group(meta["vars"], dims_of, variables)
    coord_arrays = {}
    for d in dims:
        if d in meta["vars"] and meta["vars"][d]["dims"] == [d]:
            coord_arrays[d] = meta["vars"][d]["data"]
        else:
            coord_arrays[d] = np.arange(meta["dims"][d])
    pdf = _long_frame(dims, coord_arrays, {v: meta["vars"][v]["data"] for v in data_names})
    df = spark.createDataFrame(pdf)
    auto = _cf_decoders_from_attrs(
        {v: meta["vars"][v]["attrs"] for v in data_names + dims
         if v in meta["vars"]})  # dims without a coord var have no attrs
    decoders = {**auto, **(decoders or {})}
    if decoders:
        from xarray_spark.io import decode_cf
        df = decode_cf(df, {k: v for k, v in decoders.items() if k in df.columns})
    return XDataset(df, dims, {}, data_names, dict(meta["attrs"]))


def open_mfdataset_netcdf(spark: SparkSession, paths: Sequence[str],
                          variables: Sequence[str] | None = None) -> XDataset:
    """Many classic netCDF files, one Spark task per file
    (xarray/backends/api.py:1379 open_mfdataset + parallel=True).

    The file list becomes a DataFrame; ``mapInPandas`` parses each file
    executor-side and emits its long-form rows — reads scale with the
    file count, the driver touches only the FIRST file (schema probe).
    """
    first = open_dataset_netcdf(spark, paths[0], variables)
    schema = first.df.schema
    dims, data_names = list(first.dims), list(first.data_vars)
    var_list = list(variables) if variables is not None else None

    def gen(batches):
        import pandas as pd  # noqa: F401
        for pdf in batches:
            for p in pdf["path"]:
                meta = read_netcdf3(p)
                coord_arrays = {}
                for d in dims:
                    if d in meta["vars"] and meta["vars"][d]["dims"] == [d]:
                        coord_arrays[d] = meta["vars"][d]["data"]
                    else:
                        coord_arrays[d] = np.arange(meta["dims"][d])
                yield _long_frame(
                    dims, coord_arrays,
                    {v: meta["vars"][v]["data"] for v in data_names},
                )

    files = spark.createDataFrame([(p,) for p in paths], ["path"]).repartition(len(paths))
    df = files.mapInPandas(gen, schema=schema)
    return XDataset(df, dims, {}, data_names, first.attrs)


def _cf_decoders_from_attrs(var_attrs: Mapping[str, Mapping]) -> dict:
    """CF attributes → io.decode_cf specs (mask/scale/offset + time
    units), mirroring xarray decode_cf defaults (conventions.py:498)."""
    out = {}
    for v, a in var_attrs.items():
        spec = {}
        if "_FillValue" in a:
            fv = a["_FillValue"]
            spec["fill_value"] = fv[0] if isinstance(fv, list) else fv
        if "scale_factor" in a:
            sf = a["scale_factor"]
            spec["scale_factor"] = sf[0] if isinstance(sf, list) else sf
        if "add_offset" in a:
            ao = a["add_offset"]
            spec["add_offset"] = ao[0] if isinstance(ao, list) else ao
        if "missing_value" in a:
            # reference CFMaskCoder masks missing_value alongside
            # _FillValue (coding/variables.py) — both can coexist
            mv = a["missing_value"]
            spec["missing_value"] = mv[0] if isinstance(mv, list) else mv
        if str(a.get("_Unsigned", "")).lower() == "true":
            spec["unsigned"] = True
        if str(a.get("dtype", "")).lower() == "bool":
            # CFBoolCoder (reference coding/variables.py:732) — i1 0/1
            # storage with attrs dtype='bool'
            spec["dtype"] = "bool"
        units = a.get("units")
        if isinstance(units, str) and " since " in units:
            spec["time_units"] = units
            cal = a.get("calendar")
            if isinstance(cal, str):
                spec["calendar"] = cal
        if spec:
            out[v] = spec
    return out


# ---------------------------------------------------------------------- #
# zarr v2 directory store
# ---------------------------------------------------------------------- #

def _zarr_decompress(raw: bytes, compressor) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid in ("zlib", "gzip"):
        # gzip chunks carry the gzip header; zlib the zlib header — both
        # handled by zlib with the widened wbits
        return zlib.decompress(raw, zlib.MAX_WBITS | 32) if cid == "gzip" \
            else zlib.decompress(raw)
    raise NotImplementedError(
        f"zarr compressor {cid!r} needs a native codec library not present "
        "in this environment (supported: zlib, gzip, uncompressed)")


def _zarr3_fill(v, dt: np.dtype):
    if isinstance(v, str) and dt.kind == "f":
        return {"NaN": np.nan, "Infinity": np.inf, "-Infinity": -np.inf}.get(v, float(v))
    return v


def _zarr_meta(store: str, name: str) -> tuple[dict, dict]:
    """Normalized array metadata for BOTH store layouts — zarr v2
    (``.zarray``/``.zattrs``) and zarr v3 (``zarr.json``, the format
    current xarray writes by default; spec at zarr-specs v3.0).

    Returns ``(zarray, zattrs)`` where zarray always carries the
    v2-shaped keys (shape/chunks/dtype/fill_value/compressor/
    dimension_separator) plus ``key_prefix`` ('' for v2, 'c<sep>' for
    the v3 'default' chunk-key encoding), and zattrs always exposes
    ``_ARRAY_DIMENSIONS`` (mapped from v3 ``dimension_names``)."""
    v3path = os.path.join(store, name, "zarr.json")
    if os.path.exists(v3path):
        with open(v3path) as f:
            z3 = json.load(f)
        if z3.get("node_type") != "array":
            raise ValueError(f"{v3path}: not an array node")
        dt = np.dtype(z3["data_type"])
        comp = None
        for codec in z3.get("codecs", []):
            cn = codec.get("name")
            if cn == "bytes":
                endian = codec.get("configuration", {}).get("endian", "little")
                dt = dt.newbyteorder("<" if endian == "little" else ">")
            elif cn in ("gzip", "zlib"):
                comp = {"id": cn,
                        "level": codec.get("configuration", {}).get("level", 1)}
            elif cn == "transpose" or cn is None:
                raise NotImplementedError(f"zarr v3 codec {codec!r}")
            else:
                raise NotImplementedError(
                    f"zarr v3 codec {cn!r} needs a native library not in "
                    "this environment (supported: bytes, gzip, zlib)")
        cke = z3.get("chunk_key_encoding", {"name": "default"})
        sep = cke.get("configuration", {}).get(
            "separator", "/" if cke.get("name") == "default" else ".")
        prefix = f"c{sep}" if cke.get("name", "default") == "default" else ""
        zarray = {
            "shape": z3["shape"],
            "chunks": z3["chunk_grid"]["configuration"]["chunk_shape"],
            "dtype": dt.str,
            "fill_value": _zarr3_fill(z3.get("fill_value"), dt),
            "compressor": comp,
            "dimension_separator": sep,
            "key_prefix": prefix,
        }
        zattrs = dict(z3.get("attributes", {}))
        if "dimension_names" in z3:
            zattrs["_ARRAY_DIMENSIONS"] = list(z3["dimension_names"])
        return zarray, zattrs
    with open(os.path.join(store, name, ".zarray")) as f:
        zarray = json.load(f)
    zarray.setdefault("key_prefix", "")
    zattrs = {}
    ap = os.path.join(store, name, ".zattrs")
    if os.path.exists(ap):
        with open(ap) as f:
            zattrs = json.load(f)
    return zarray, zattrs


def _zarr_chunk_key(zarray: dict, idx: tuple) -> str:
    sep = zarray.get("dimension_separator") or "."
    prefix = zarray.get("key_prefix", "")
    if not idx:
        return (prefix.rstrip(sep) or "0") if prefix else "0"
    return prefix + sep.join(str(i) for i in idx)


def read_zarr_array(store: str, name: str) -> np.ndarray:
    """Assemble one zarr v2 array driver-side (used for label-sized
    coordinate arrays; data vars stream chunk-parallel in open_zarr)."""
    zarray, _ = _zarr_meta(store, name)
    shape, chunks = zarray["shape"], zarray["chunks"]
    dt = np.dtype(zarray["dtype"])
    fill = zarray.get("fill_value")
    out = np.full(shape, fill if fill is not None else 0, dtype=dt)
    if not shape:
        return out
    grid = [(-(-s // c)) for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*grid):
        cpath = os.path.join(store, name, _zarr_chunk_key(zarray, idx))
        sel = tuple(slice(i * c, min((i + 1) * c, s))
                    for i, c, s in zip(idx, chunks, shape))
        if not os.path.exists(cpath):
            continue  # missing chunk = fill_value
        with open(cpath, "rb") as f:
            raw = _zarr_decompress(f.read(), zarray.get("compressor"))
        block = np.frombuffer(raw, dtype=dt).reshape(chunks)
        trim = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        out[sel] = block[trim]
    return out.astype(dt.newbyteorder("=")) if dt.kind in "iuf" else out


def _write_zarr_meta(store: str, name: str, shape: Sequence[int],
                     chunks: Sequence[int], dtype: np.dtype,
                     dims: Sequence[str], compressor: str | None,
                     zarr_format: int):
    """Write one array's metadata (v2 .zarray/.zattrs or v3 zarr.json);
    returns (normalized compressor dict | None, chunk-key function)."""
    adir = os.path.join(store, name)
    os.makedirs(adir, exist_ok=True)
    if zarr_format == 3:
        # v3 gzip codec (zlib isn't a registered v3 codec name)
        comp = {"id": "gzip", "level": 1} if compressor else None
        meta = {
            "zarr_format": 3, "node_type": "array",
            "shape": list(shape),
            "data_type": dtype.newbyteorder("=").name,
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": list(chunks)}},
            "chunk_key_encoding": {"name": "default",
                                   "configuration": {"separator": "/"}},
            "fill_value": 0 if dtype.kind in "iub" else "NaN",
            "codecs": [{"name": "bytes",
                        "configuration": {"endian": "little"}}]
                      + ([{"name": "gzip", "configuration": {"level": 1}}]
                         if comp else []),
            "dimension_names": list(dims),
            "attributes": {},
        }
        with open(os.path.join(adir, "zarr.json"), "w") as f:
            json.dump(meta, f)
        keyfn = lambda idx: "c/" + "/".join(str(i) for i in idx) if idx else "c"  # noqa: E731
    else:
        comp = {"id": "zlib", "level": 1} if compressor == "zlib" else None
        zarray = {
            "zarr_format": 2, "shape": list(shape), "chunks": list(chunks),
            "dtype": dtype.newbyteorder("<").str, "compressor": comp,
            "fill_value": None, "order": "C", "filters": None,
        }
        with open(os.path.join(adir, ".zarray"), "w") as f:
            json.dump(zarray, f)
        with open(os.path.join(adir, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": list(dims)}, f)
        keyfn = lambda idx: ".".join(str(i) for i in idx) if idx else "0"  # noqa: E731
    return comp, keyfn


def _zarr_chunk_bytes(block: np.ndarray, chunks: Sequence[int], comp) -> bytes:
    """Pad an edge block to the full chunk shape, serialize little-endian,
    compress per the normalized compressor dict."""
    le = block.astype(block.dtype.newbyteorder("<"))
    if le.shape != tuple(chunks) and chunks:
        padded = np.zeros(chunks, dtype=le.dtype)
        padded[tuple(slice(0, b) for b in le.shape)] = le
        le = padded
    raw = le.tobytes()
    if comp is not None:
        raw = (gzip_compress(raw, comp["level"])
               if comp["id"] == "gzip" else zlib.compress(raw, comp["level"]))
    return raw


def write_zarr_array(store: str, name: str, arr: np.ndarray,
                     dims: Sequence[str], chunks: Sequence[int] | None = None,
                     compressor: str | None = "zlib",
                     zarr_format: int = 2) -> None:
    arr = np.ascontiguousarray(arr)
    chunks = list(chunks) if chunks is not None else list(arr.shape)
    adir = os.path.join(store, name)
    comp, keyfn = _write_zarr_meta(store, name, arr.shape, chunks, arr.dtype,
                                   dims, compressor, zarr_format)
    le = arr.astype(arr.dtype.newbyteorder("<"))
    grid = [(-(-s // c)) for s, c in zip(arr.shape, chunks)] or [1]
    if not arr.shape:
        grid = []
    for idx in (np.ndindex(*grid) if grid else [()]):
        sel = tuple(slice(i * c, min((i + 1) * c, s))
                    for i, c, s in zip(idx, chunks, arr.shape))
        raw = _zarr_chunk_bytes(le[sel], chunks, comp)
        kpath = os.path.join(adir, keyfn(tuple(idx)))
        os.makedirs(os.path.dirname(kpath), exist_ok=True)
        with open(kpath, "wb") as f:
            f.write(raw)


def gzip_compress(raw: bytes, level: int = 1) -> bytes:
    import gzip as _gz
    return _gz.compress(raw, compresslevel=level, mtime=0)


def to_zarr(ds_or_arrays, store: str, dims: Mapping[str, np.ndarray] | None = None,
            chunks: Mapping[str, Sequence[int]] | None = None,
            zarr_format: int = 2) -> None:
    """Write a zarr group from a dict of named numpy arrays
    (name → (dims, array)); coordinate arrays from ``dims``.
    ``zarr_format=2`` writes the classic ``.zgroup`` layout,
    ``zarr_format=3`` the current ``zarr.json`` layout."""
    os.makedirs(store, exist_ok=True)
    if zarr_format == 3:
        with open(os.path.join(store, "zarr.json"), "w") as f:
            json.dump({"zarr_format": 3, "node_type": "group",
                       "attributes": {}}, f)
    else:
        with open(os.path.join(store, ".zgroup"), "w") as f:
            json.dump({"zarr_format": 2}, f)
    for d, labels in (dims or {}).items():
        write_zarr_array(store, d, np.asarray(labels), [d], zarr_format=zarr_format)
    for name, (vdims, arr) in ds_or_arrays.items():
        ck = (chunks or {}).get(name)
        write_zarr_array(store, name, np.asarray(arr), vdims, ck,
                         zarr_format=zarr_format)


def open_zarr(spark: SparkSession, store: str,
              variables: Sequence[str] | None = None) -> XDataset:
    """Open a zarr v2 group chunk-parallel (xarray/backends/zarr.py:1471
    open_zarr analogue).

    Plan shape: coordinate arrays (label-sized) load driver-side; the
    chunk grid of the data variables becomes a DataFrame of chunk
    indices repartitioned to ~2× parallelism (many chunks per task —
    per-task overhead amortizes across chunk decodes), and
    ``mapInPandas`` decodes each chunk executor-side into long-form
    rows.  The chunk stays the IO unit zarr was designed around, so a
    100 TB store never funnels through the driver.
    """
    def _is_array(n: str) -> bool:
        d = os.path.join(store, n)
        if os.path.exists(os.path.join(d, ".zarray")):
            return True
        zp = os.path.join(d, "zarr.json")
        if os.path.exists(zp):
            with open(zp) as f:
                return json.load(f).get("node_type") == "array"
        return False

    names = [n for n in sorted(os.listdir(store))
             if os.path.isdir(os.path.join(store, n)) and _is_array(n)]
    metas = {n: _zarr_meta(store, n) for n in names}
    dims_of = lambda v: list(metas[v][1].get("_ARRAY_DIMENSIONS", [v]))  # noqa: E731
    all_vars = {n: None for n in names}
    data_names, dims = _select_var_group(all_vars, dims_of, variables)
    shape = metas[data_names[0]][0]["shape"]
    chunk_specs = {v: metas[v][0]["chunks"] for v in data_names}
    if len({tuple(c) for c in chunk_specs.values()}) != 1:
        raise NotImplementedError("data variables with different chunk grids; "
                                  "open them in groups via variables=[...]")
    chunks = chunk_specs[data_names[0]]
    coord_arrays = {}
    for i, d in enumerate(dims):
        if d in metas and dims_of(d) == [d]:
            coord_arrays[d] = read_zarr_array(store, d)
        else:
            coord_arrays[d] = np.arange(shape[i])
    grid = [(-(-s // c)) for s, c in zip(shape, chunks)]
    idx_rows = [tuple(int(x) for x in idx) for idx in np.ndindex(*grid)]
    icols = [f"__c{i}" for i in range(len(dims))]
    files = spark.createDataFrame(idx_rows, icols).repartition(
        min(len(idx_rows), spark.sparkContext.defaultParallelism * 2)
    )
    # schema probe: one-element frame with the coord dtypes + var dtypes
    probe = _long_frame(
        dims, {d: np.asarray(coord_arrays[d][:1]) for d in dims},
        {v: np.zeros([1] * len(dims), np.dtype(metas[v][0]["dtype"]).newbyteorder("="))
         for v in data_names},
    )
    schema = spark.createDataFrame(probe).schema
    zarrays = {v: metas[v][0] for v in data_names}
    coords_b = {d: np.asarray(coord_arrays[d]) for d in dims}

    def gen(batches):
        for pdf in batches:
            for row in pdf[icols].to_numpy():
                idx = tuple(int(i) for i in row)
                sel = tuple(slice(i * c, min((i + 1) * c, s))
                            for i, c, s in zip(idx, chunks, shape))
                var_blocks = {}
                for v in data_names:
                    za = zarrays[v]
                    cpath = os.path.join(store, v, _zarr_chunk_key(za, idx))
                    dt = np.dtype(za["dtype"])
                    csel = tuple(sl.stop - sl.start for sl in sel)
                    if os.path.exists(cpath):
                        with open(cpath, "rb") as f:
                            raw = _zarr_decompress(f.read(), za.get("compressor"))
                        block = np.frombuffer(raw, dtype=dt).reshape(za["chunks"])
                        block = block[tuple(slice(0, n) for n in csel)]
                    else:
                        fill = za.get("fill_value")
                        block = np.full(csel, fill if fill is not None else 0, dt)
                    # byteswap only when the on-disk order is foreign —
                    # astype() always copies, and '<' IS native here
                    if dt.kind in "iuf" and not dt.isnative:
                        block = block.astype(dt.newbyteorder("="))
                    var_blocks[v] = block
                chunk_coords = {d: coords_b[d][sel[i]] for i, d in enumerate(dims)}
                yield _long_frame(dims, chunk_coords, var_blocks)

    df = files.mapInPandas(gen, schema=schema)
    return XDataset(df, dims, {}, data_names, {})


def _zarr_set_shape(store: str, name: str, shape: list) -> None:
    """Rewrite one array's shape in its metadata file (v2 .zarray or v3
    zarr.json) — the driver-side step of an append_dim write."""
    v3path = os.path.join(store, name, "zarr.json")
    if os.path.exists(v3path):
        with open(v3path) as f:
            meta = json.load(f)
        meta["shape"] = list(shape)
        with open(v3path, "w") as f:
            json.dump(meta, f)
        return
    zpath = os.path.join(store, name, ".zarray")
    with open(zpath) as f:
        meta = json.load(f)
    meta["shape"] = list(shape)
    with open(zpath, "w") as f:
        json.dump(meta, f)


def _to_zarr_update(ds, store: str, dim: str | None,
                    region: dict | None, append_dim: str | None) -> None:
    """to_zarr(region=...) / to_zarr(append_dim=...) against an EXISTING
    store (xarray/core/dataset.py:2204 region/append_dim semantics):

    - ``region={dim: slice(start, stop)}`` overwrites exactly that slice of
      every data var.  Like the reference, the region must be
      CHUNK-ALIGNED (start on a chunk boundary; stop on a boundary or at
      the array end) so each Spark task owns whole chunk files — no
      read-modify-write, no cross-writer races at 1000 executors.
    - ``append_dim=dim`` extends the arrays: metadata shapes bump
      driver-side (tiny JSON), the label-sized coordinate array is
      extended driver-side, and ONLY the new chunks are written by
      executors.  Requires the existing length to be chunk-aligned (a
      partial final chunk would need a read-modify-merge; rewrite the
      store or choose a dividing chunk size — the honest guard).

    Chunk size, dtype, compressor, and key layout all come FROM THE
    STORE's metadata, so updates interoperate with any prior writer and
    both zarr formats.  Coordinate VALUES inside a region are trusted to
    match (the reference verifies them by reading; at 100 TB that read
    is wasted work — validate once upstream if needed)."""
    import datetime as _dt

    import pandas as pd
    from pyspark.sql import functions as SF  # noqa: N812
    from pyspark.sql import types as ST

    if region is not None:
        (dim, sl), = region.items()
    else:
        dim = append_dim
    varlist = list(ds.data_vars)
    if not varlist:
        raise ValueError("no data vars to write")
    zarray0, _ = _zarr_meta(store, varlist[0])
    for v in varlist[1:]:
        za, _ = _zarr_meta(store, v)
        if za["shape"] != zarray0["shape"] or za["chunks"] != zarray0["chunks"]:
            raise ValueError(f"store arrays disagree on shape/chunks: {v}")
    n_total, chunk = int(zarray0["shape"][0]), int(zarray0["chunks"][0])
    dt = np.dtype(zarray0["dtype"])
    labels = ds._dim_labels(dim)
    # one ordered collect serves both the size check and (in the
    # append branch) the coordinate values — the size-only aggregate
    # was a second sequential driver job on the same label table
    _lab_vals = [r[0] for r in
                 labels.orderBy("__pos").select(dim).collect()]
    m = len(_lab_vals)
    if region is not None:
        if sl.step not in (None, 1):
            raise ValueError("region slices cannot be stepped "
                             "(the reference has the same rule)")
        start = sl.start or 0
        stop = n_total if sl.stop is None else sl.stop
        if not (0 <= start < stop <= n_total):
            raise ValueError(f"region {start}:{stop} outside array "
                             f"length {n_total}")
        if start % chunk != 0 or (stop % chunk != 0 and stop != n_total):
            raise ValueError(
                f"region {start}:{stop} is not aligned to chunks of "
                f"{chunk} (the reference's to_zarr has the same "
                "requirement — each writer must own whole chunks)")
        if m != stop - start:
            raise ValueError(f"dataset has {m} labels; region needs "
                             f"{stop - start}")
        offset, new_n = start, n_total
    else:
        if n_total % chunk != 0:
            raise NotImplementedError(
                f"append_dim onto a partial final chunk ({n_total} % "
                f"{chunk} != 0): a distributed writer cannot merge into "
                "a half-full chunk without read-modify-write; rewrite "
                "the store or use a chunk size dividing the length")
        offset, new_n = n_total, n_total + m
        for v in varlist:
            _zarr_set_shape(store, v, [new_n])
        old_coord = read_zarr_array(store, dim)
        vals = _lab_vals
        if vals and isinstance(vals[0], (_dt.datetime, _dt.date)):
            newc = (np.array(vals, dtype="datetime64[s]")
                    .astype("int64").astype("float64"))
        else:
            newc = np.asarray(vals)
            if newc.dtype.kind == "M":
                newc = (newc.astype("datetime64[s]")
                        .astype("int64").astype("float64"))
        coord = np.concatenate([old_coord,
                                newc.astype(old_coord.dtype, copy=False)])
        ca, _ = _zarr_meta(store, dim)
        v3 = os.path.exists(os.path.join(store, varlist[0], "zarr.json"))
        write_zarr_array(store, dim, coord, [dim], [int(ca["chunks"][0])],
                         "zlib" if zarray0.get("compressor") else None,
                         3 if v3 else 2)

    comp = zarray0.get("compressor")
    keyfn = lambda idx: _zarr_chunk_key(zarray0, idx)  # noqa: E731

    fact = (
        ds.df.join(SF.broadcast(labels.select(dim, "__pos")), on=dim)
        .withColumn("__gpos", SF.col("__pos") + SF.lit(offset))
        .withColumn("__chunk", SF.floor(SF.col("__gpos") / chunk))
        .select("__chunk", "__gpos", *[SF.col(v).cast("double").alias(v)
                                       for v in varlist])
    )
    out_schema = ST.StructType([ST.StructField("chunk", ST.LongType()),
                                ST.StructField("written", ST.IntegerType())])

    def write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["__chunk"].iloc[0])
        pdf = pdf.sort_values("__gpos")
        base = cid * chunk
        size = min(chunk, new_n - base)
        written = 0
        for v in varlist:
            block = np.full(size, np.nan, dtype=dt.newbyteorder("="))
            block[pdf["__gpos"].to_numpy("int64") - base] =                 pdf[v].to_numpy("float64")
            raw = _zarr_chunk_bytes(block, [chunk], comp)
            kpath = os.path.join(store, v, keyfn((cid,)))
            os.makedirs(os.path.dirname(kpath), exist_ok=True)
            with open(kpath, "wb") as f:
                f.write(raw)
            written += 1
        return pd.DataFrame({"chunk": [cid], "written": [written]})

    done = fact.groupBy("__chunk").applyInPandas(write_chunk, out_schema)
    wrote = done.agg(SF.sum("written")).collect()[0][0]
    n_chunks = (-(-(offset + m) // chunk)) - (offset // chunk)
    expected = n_chunks * len(varlist)
    if wrote != expected:
        raise IOError(f"zarr update: wrote {wrote} chunks, "
                      f"expected {expected}")


def _to_zarr_nd(ds, store: str, chunk_map: dict,
                compressor: str | None, zarr_format: int) -> None:
    """N-D chunk-parallel zarr write: the chunk GRID over all dims is
    the task grid — each Spark task owns one N-D chunk file (the same
    task-per-chunk shape open_zarr reads with).  Positions come from
    one broadcast label table per dim; rows group on the chunk-index
    tuple and each group assembles its block with a single
    ravel_multi_index scatter.  Assumes a dense grid (the array model
    being written); missing combinations surface as NaN inside blocks,
    and the chunk-count check still requires every grid cell to carry
    at least one row."""
    import pandas as pd
    from pyspark.sql import functions as SF  # noqa: N812
    from pyspark.sql import types as ST

    dims = list(ds.dims)
    varlist = list(ds.data_vars)
    sizes, chunks_l, coord_arrays = [], [], {}
    import datetime as _dt
    fact = ds.df
    for d in dims:
        labels = ds._dim_labels(d)
        vals = [r[0] for r in labels.orderBy("__pos").select(d).collect()]
        n_d = len(vals)
        if n_d == 0:
            raise ValueError("empty dataset")
        c_d = min(int(chunk_map.get(d, n_d)), n_d)
        sizes.append(n_d)
        chunks_l.append(c_d)
        if vals and isinstance(vals[0], (_dt.datetime, _dt.date)):
            coord = (np.array(vals, dtype="datetime64[s]")
                     .astype("int64").astype("float64"))
        else:
            coord = np.asarray(vals)
            if coord.dtype.kind == "M":
                coord = (coord.astype("datetime64[s]")
                         .astype("int64").astype("float64"))
        coord_arrays[d] = coord
        fact = fact.join(
            SF.broadcast(labels.select(
                SF.col(d), SF.col("__pos").alias(f"__p_{d}"))), on=d)
    os.makedirs(store, exist_ok=True)
    if zarr_format == 3:
        with open(os.path.join(store, "zarr.json"), "w") as f:
            json.dump({"zarr_format": 3, "node_type": "group",
                       "attributes": {}}, f)
    else:
        with open(os.path.join(store, ".zgroup"), "w") as f:
            json.dump({"zarr_format": 2}, f)
    for d, n_d, c_d in zip(dims, sizes, chunks_l):
        write_zarr_array(store, d, coord_arrays[d], [d], [c_d],
                         compressor, zarr_format)
    comps, keyfns = {}, {}
    for v in varlist:
        comps[v], keyfns[v] = _write_zarr_meta(
            store, v, sizes, chunks_l, np.dtype("float64"), dims,
            compressor, zarr_format)

    sel = [SF.floor(SF.col(f"__p_{d}") / c).alias(f"__c_{d}")
           for d, c in zip(dims, chunks_l)]
    sel += [SF.col(f"__p_{d}") for d in dims]
    sel += [SF.col(v).cast("double").alias(v) for v in varlist]
    fact = fact.select(*sel)
    out_schema = ST.StructType([ST.StructField("written", ST.IntegerType())])
    ckeys = [f"__c_{d}" for d in dims]

    def write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = tuple(int(pdf[k].iloc[0]) for k in ckeys)
        base = [i * c for i, c in zip(cid, chunks_l)]
        bshape = [min(c, n - b) for c, n, b in zip(chunks_l, sizes, base)]
        idx = np.ravel_multi_index(
            tuple(pdf[f"__p_{d}"].to_numpy("int64") - b
                  for d, b in zip(dims, base)), bshape)
        written = 0
        for v in varlist:
            block = np.full(int(np.prod(bshape)), np.nan, dtype="float64")
            block[idx] = pdf[v].to_numpy("float64")
            raw = _zarr_chunk_bytes(block.reshape(bshape), chunks_l,
                                    comps[v])
            kpath = os.path.join(store, v, keyfns[v](cid))
            os.makedirs(os.path.dirname(kpath), exist_ok=True)
            with open(kpath, "wb") as f:
                f.write(raw)
            written += 1
        return pd.DataFrame({"written": [written]})

    done = fact.groupBy(*ckeys).applyInPandas(write_chunk, out_schema)
    wrote = done.agg(SF.sum("written")).collect()[0][0]
    grid = 1
    for n_d, c_d in zip(sizes, chunks_l):
        grid *= -(-n_d // c_d)
    expected = grid * len(varlist)
    if wrote != expected:
        raise IOError(f"to_zarr N-D: wrote {wrote} chunks, expected "
                      f"{expected} (is the grid dense?)")


def to_zarr_distributed(ds, store: str, dim: str | None = None,
                        chunk_rows: int = 100_000,
                        compressor: str | None = "zlib",
                        zarr_format: int = 2, mode: str = "w",
                        region: dict | None = None,
                        append_dim: str | None = None,
                        chunks: dict | None = None) -> None:
    """CHUNK-PARALLEL zarr write of a (1-D) XDataset: the write-side
    mirror of ``open_zarr``'s scale shape (xarray to_zarr with dask:
    one task per chunk, backends/zarr.py store.set_variables).

    Plan: join the fact table to the two-phase-ranked label table for
    positions, key every row by ``pos // chunk_rows``, and let each
    ``applyInPandas`` group serialize + compress + write ITS OWN chunk
    file — executor-side, straight to the store; the driver writes only
    metadata and the (label-sized) coordinate array.  Requires a store
    path all executors can reach (local FS here; any POSIX/fuse mount on
    a cluster — the same requirement zarr itself has).

    Data vars must be numeric; rows are assumed dense on the dim (one
    row per label), matching the array model being written.
    """
    import pandas as pd
    from pyspark.sql import functions as SF  # noqa: N812 - local alias
    from pyspark.sql import types as ST

    if region is not None or append_dim is not None:
        return _to_zarr_update(ds, store, dim, region, append_dim)
    if mode not in ("w", "w-"):
        raise ValueError(f"mode {mode!r}: use region=/append_dim= for "
                         "updates ('r+'/'a' are implied by them)")
    if len(ds.dims) != 1:
        cmap = dict(chunks or {})
        cmap.setdefault(ds.dims[0], chunk_rows)
        return _to_zarr_nd(ds, store, cmap, compressor, zarr_format)
    dim = dim or ds.dims[0]
    varlist = list(ds.data_vars)
    labels = ds._dim_labels(dim)
    vals = [r[0] for r in labels.orderBy("__pos").select(dim).collect()]
    n = len(vals)
    if n == 0:
        raise ValueError("empty dataset")
    os.makedirs(store, exist_ok=True)
    if zarr_format == 3:
        with open(os.path.join(store, "zarr.json"), "w") as f:
            json.dump({"zarr_format": 3, "node_type": "group",
                       "attributes": {}}, f)
    else:
        with open(os.path.join(store, ".zgroup"), "w") as f:
            json.dump({"zarr_format": 2}, f)
    # coordinate array: label-sized, driver-side by definition
    # (vals already collected above — one job serves size + coords)
    import datetime as _dt
    if vals and isinstance(vals[0], (_dt.datetime, _dt.date)):
        coord = (np.array(vals, dtype="datetime64[s]")
                 .astype("int64").astype("float64"))
    else:
        coord = np.asarray(vals)
        if coord.dtype.kind == "M":
            coord = coord.astype("datetime64[s]").astype("int64").astype("float64")
    write_zarr_array(store, dim, coord, [dim], [min(chunk_rows, n)],
                     compressor, zarr_format)
    comps, keyfns = {}, {}
    for v in varlist:
        comps[v], keyfns[v] = _write_zarr_meta(
            store, v, [n], [chunk_rows], np.dtype("float64"), [dim],
            compressor, zarr_format)
    chunks = [chunk_rows]

    fact = (
        ds.df.join(SF.broadcast(labels.select(dim, "__pos")), on=dim)
        .withColumn("__chunk", SF.floor(SF.col("__pos") / chunk_rows))
        .select("__chunk", "__pos", *[SF.col(v).cast("double").alias(v)
                                      for v in varlist])
    )
    out_schema = ST.StructType([ST.StructField("chunk", ST.LongType()),
                                ST.StructField("written", ST.IntegerType())])

    def write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["__chunk"].iloc[0])
        pdf = pdf.sort_values("__pos")
        base = cid * chunk_rows
        size = min(chunk_rows, n - base)
        written = 0
        for v in varlist:
            block = np.full(size, np.nan, dtype="float64")
            block[pdf["__pos"].to_numpy("int64") - base] = pdf[v].to_numpy("float64")
            raw = _zarr_chunk_bytes(block, chunks, comps[v])
            kpath = os.path.join(store, v, keyfns[v]((cid,)))
            os.makedirs(os.path.dirname(kpath), exist_ok=True)
            with open(kpath, "wb") as f:
                f.write(raw)
            written += 1
        return pd.DataFrame({"chunk": [cid], "written": [written]})

    done = fact.groupBy("__chunk").applyInPandas(write_chunk, out_schema)
    wrote = done.agg(SF.sum("written")).collect()[0][0]
    expected = (-(-n // chunk_rows)) * len(varlist)
    if wrote != expected:
        raise IOError(f"to_zarr_distributed: wrote {wrote} chunks, "
                      f"expected {expected}")
