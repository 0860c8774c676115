"""netCDF-3 classic and zarr v2 backends: byte-level roundtrips and the
long-form open paths (driver-side nc, chunk-parallel zarr)."""

import os
import struct

import numpy as np
import pandas as pd
import pytest

from xarray_spark import XDataset, open_dataset
from xarray_spark.backends import (
    open_dataset_netcdf,
    open_mfdataset_netcdf,
    open_zarr,
    read_netcdf3,
    read_zarr_array,
    to_zarr,
    write_netcdf3,
)


@pytest.fixture()
def nc_file(tmp_path):
    path = str(tmp_path / "sample.nc")
    t = np.arange(4, dtype="float64")
    x = np.array([10.0, 20.0, 30.0])
    temp = np.arange(12, dtype="float64").reshape(4, 3) * 0.5
    mask = np.array([[1, 2, -9], [3, -9, 4], [5, 6, 7], [8, 9, 10]], dtype="int32")
    write_netcdf3(
        path,
        {"t": 4, "x": 3},
        {
            "t": (["t"], t),
            "x": (["x"], x),
            "temp": (["t", "x"], temp, {"units": "K"}),
            "masked": (["t", "x"], mask, {"_FillValue": -9.0, "scale_factor": 2.0}),
        },
        attrs={"title": "fixture"},
    )
    return path, t, x, temp, mask


def test_netcdf3_roundtrip_bytes(nc_file):
    path, t, x, temp, mask = nc_file
    meta = read_netcdf3(path)
    assert meta["dims"] == {"t": 4, "x": 3}
    assert meta["attrs"]["title"] == "fixture"
    np.testing.assert_array_equal(meta["vars"]["t"]["data"], t)
    np.testing.assert_array_equal(meta["vars"]["temp"]["data"], temp)
    assert meta["vars"]["temp"]["attrs"]["units"] == "K"
    np.testing.assert_array_equal(meta["vars"]["masked"]["data"], mask)


def test_open_dataset_netcdf(spark, nc_file):
    path, t, x, temp, mask = nc_file
    ds = open_dataset(spark, path)  # engine inferred from .nc
    assert sorted(ds.data_vars) == ["masked", "temp"]
    assert list(ds.dims) == ["t", "x"]
    rows = {(r["t"], r["x"]): r for r in ds.df.collect()}
    assert len(rows) == 12
    assert rows[(0.0, 10.0)]["temp"] == 0.0
    assert rows[(3.0, 30.0)]["temp"] == 5.5
    # CF decode from attrs: fill -> null, scale 2x
    assert rows[(0.0, 30.0)]["masked"] is None
    assert rows[(0.0, 20.0)]["masked"] == 4.0
    # and the result is a full XDataset: aggregate over a dim
    m = ds.mean("x").df.orderBy("t").collect()
    np.testing.assert_allclose([r["temp"] for r in m], temp.mean(axis=1))


def test_open_mfdataset_netcdf_parallel(spark, tmp_path):
    paths = []
    for k in range(3):
        p = str(tmp_path / f"part{k}.nc")
        t = np.arange(5, dtype="float64") + 5 * k
        v = t * 2.0
        write_netcdf3(p, {"t": 5}, {"t": (["t"], t), "v": (["t"], v)})
        paths.append(p)
    ds = open_mfdataset_netcdf(spark, paths)
    rows = ds.df.orderBy("t").collect()
    assert [r["t"] for r in rows] == [float(i) for i in range(15)]
    assert [r["v"] for r in rows] == [float(i) * 2 for i in range(15)]


def test_netcdf3_record_variables(tmp_path):
    """Hand-crafted CDF-1 file with an unlimited dim: 2 records of a
    record var interleave after the fixed var — exercises the reader's
    record path, which the (fixed-size-only) writer never emits."""
    path = str(tmp_path / "rec.nc")

    def name(s):
        b = s.encode()
        pad = (4 - len(b) % 4) % 4
        return struct.pack(">i", len(b)) + b + b"\x00" * pad

    hdr = b"CDF\x01" + struct.pack(">i", 2)           # numrecs=2
    hdr += struct.pack(">ii", 0x0A, 2)                # 2 dims
    hdr += name("rec") + struct.pack(">i", 0)         # unlimited
    hdr += name("x") + struct.pack(">i", 2)
    hdr += struct.pack(">ii", 0, 0)                   # no global attrs
    hdr += struct.pack(">ii", 0x0B, 2)                # 2 vars
    fixed_data = np.array([7.0, 8.0], dtype=">f8")
    rec_data = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=">f8")
    # var 'base' (fixed, dims [x]) then var 'val' (record, dims [rec, x]);
    # offsets: header length computed below
    var1 = name("base") + struct.pack(">i", 1) + struct.pack(">i", 1)
    var1 += struct.pack(">ii", 0, 0) + struct.pack(">ii", 6, 16)
    var2 = name("val") + struct.pack(">i", 2) + struct.pack(">ii", 0, 1)
    var2 += struct.pack(">ii", 0, 0) + struct.pack(">ii", 6, 16)
    hlen = len(hdr) + len(var1) + 4 + len(var2) + 4
    body = hdr + var1 + struct.pack(">i", hlen) + var2 + struct.pack(">i", hlen + 16)
    body += fixed_data.tobytes() + rec_data.tobytes()
    with open(path, "wb") as f:
        f.write(body)
    meta = read_netcdf3(path)
    assert meta["dims"] == {"rec": 2, "x": 2}
    np.testing.assert_array_equal(meta["vars"]["base"]["data"], [7.0, 8.0])
    np.testing.assert_array_equal(meta["vars"]["val"]["data"], [[1.0, 2.0], [3.0, 4.0]])


@pytest.fixture()
def zarr_store(tmp_path):
    store = str(tmp_path / "store.zarr")
    t = np.arange(10, dtype="float64")
    x = np.array([1.5, 2.5, 3.5])
    v = np.arange(30, dtype="float64").reshape(10, 3)
    w = (np.arange(30, dtype="int32") % 7).reshape(10, 3)
    to_zarr(
        {"v": (["t", "x"], v), "w": (["t", "x"], w)},
        store,
        dims={"t": t, "x": x},
        chunks={"v": [4, 2], "w": [4, 2]},
    )
    return store, t, x, v, w


def test_zarr_array_roundtrip(zarr_store):
    store, t, x, v, w = zarr_store
    np.testing.assert_array_equal(read_zarr_array(store, "t"), t)
    np.testing.assert_array_equal(read_zarr_array(store, "v"), v)
    np.testing.assert_array_equal(read_zarr_array(store, "w"), w)
    # chunk files exist with the expected grid (3 x 2 chunks for 10x3 / 4x2)
    keys = [k for k in os.listdir(os.path.join(store, "v")) if not k.startswith(".")]
    assert sorted(keys) == ["0.0", "0.1", "1.0", "1.1", "2.0", "2.1"]


def test_open_zarr_chunk_parallel(spark, zarr_store):
    store, t, x, v, w = zarr_store
    ds = open_zarr(spark, store)
    assert sorted(ds.data_vars) == ["v", "w"]
    rows = {(r["t"], r["x"]): (r["v"], r["w"]) for r in ds.df.collect()}
    assert len(rows) == 30
    for i, tv in enumerate(t):
        for j, xv in enumerate(x):
            assert rows[(tv, xv)] == (v[i, j], w[i, j])
    agg = ds.sum("t").df.orderBy("x").collect()
    np.testing.assert_allclose([r["v"] for r in agg], v.sum(axis=0))


def test_open_zarr_uncompressed_and_missing_chunk(spark, tmp_path):
    from xarray_spark.backends import write_zarr_array
    store = str(tmp_path / "raw.zarr")
    os.makedirs(store)
    import json
    with open(os.path.join(store, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    arr = np.arange(8, dtype="float64")
    write_zarr_array(store, "a", arr, ["t"], chunks=[4], compressor=None)
    # declare fill_value and delete the second chunk -> fill
    zpath = os.path.join(store, "a", ".zarray")
    za = json.load(open(zpath))
    za["fill_value"] = -1.0
    json.dump(za, open(zpath, "w"))
    os.remove(os.path.join(store, "a", "1"))
    ds = open_zarr(spark, store)
    got = [r["a"] for r in ds.df.orderBy("t").collect()]
    assert got == [0.0, 1.0, 2.0, 3.0, -1.0, -1.0, -1.0, -1.0]


def test_backend_registry_and_guess(spark, tmp_path):
    from xarray_spark import io as xio
    from xarray_spark import XDataset, register_backend, list_engines
    assert set(list_engines()) >= {"parquet", "netcdf", "zarr"}
    assert xio.guess_engine("x.nc") == "netcdf"
    assert xio.guess_engine("x.zarr") == "zarr"
    assert xio.guess_engine("some/table") == "parquet"
    # third-party registration: a csv engine with a sniffer
    calls = {}

    def open_csv(sp, path, variables=None, decoders=None):
        from pyspark.sql import functions as F
        calls["path"] = path
        df = sp.read.option("header", "true").csv(path)
        return XDataset(df.select(F.col("t").cast("long").alias("t"),
                                  F.col("v").cast("double").alias("v")), dims=["t"])

    register_backend("csv", open_csv, lambda p: p.endswith(".csv"))
    try:
        p = str(tmp_path / "tiny.csv")
        import pandas as pd
        pd.DataFrame({"t": [1, 2], "v": [0.5, 1.5]}).to_csv(p, index=False)
        ds = xio.open_dataset(spark, p)  # engine sniffed from suffix
        assert calls["path"] == p
        assert ds.df.count() == 2
    finally:
        xio._BACKENDS.pop("csv", None)


def test_open_groups_parquet_tree(spark, tmp_path):
    from xarray_spark import XDataset, open_groups, open_datatree
    from xarray_spark.datatree import DataTree
    a = XDataset(spark.createDataFrame([(1, 2.0)], ["t", "v"]), dims=["t"])
    b = XDataset(spark.createDataFrame([(1, 3.0)], ["t", "w"]), dims=["t"])
    tree = DataTree({"/coarse": a, "/coarse/fine": b})
    root = str(tmp_path / "tree")
    tree.to_parquet(root)
    groups = open_groups(spark, root)
    assert set(groups) == {"/coarse", "/coarse/fine"}
    assert groups["/coarse/fine"].df.collect()[0]["w"] == 3.0
    dt2 = open_datatree(spark, root)
    assert set(dt2.groups) == {"/coarse", "/coarse/fine"}


def test_open_groups_zarr_nested(spark, tmp_path):
    import numpy as np
    from xarray_spark import to_zarr, open_groups
    store = str(tmp_path / "h.zarr")
    to_zarr({"v": (["t"], np.arange(4, dtype="float64"))}, store,
            dims={"t": np.arange(4, dtype="float64")})
    groups = open_groups(spark, store)
    assert "/" in groups
    assert groups["/"].df.count() == 4


def test_from_series_and_to_masked_array(spark):
    import numpy as np
    import pandas as pd
    from xarray_spark import from_series
    s = pd.Series([1.0, np.nan, 3.0],
                  index=pd.Index([10, 20, 30], name="t"), name="v")
    da = from_series(spark, s)
    assert da.name == "v"
    ma = da.to_masked_array()
    assert list(ma.mask) == [False, True, False]
    assert ma[0] == 1.0 and ma[2] == 3.0


def test_decode_cf_bool_unsigned_and_cf_calendar(spark):
    from xarray_spark.io import decode_cf
    from xarray_spark import cftime as cft
    df = spark.createDataFrame(
        [(1, -1, 0.0), (0, 5, 59.0)], "flag int, count smallint, t double")
    out = decode_cf(df, {
        "flag": {"dtype": "bool"},
        "count": {"unsigned": True},
        "t": {"time_units": "days since 2000-01-01", "calendar": "360_day"},
    }).collect()
    rows = sorted((r["flag"], r["count"], r["t"]) for r in out)
    # -1 in a signed i16 container with _Unsigned -> 65535
    assert rows == [
        (False, 5, cft._py_ordinal(2000, 2, 30, "360_day")),
        (True, 65535, cft._py_ordinal(2000, 1, 1, "360_day")),
    ]


def test_zarr_v3_roundtrip(spark, tmp_path):
    import numpy as np
    from xarray_spark.backends import open_zarr, read_zarr_array, to_zarr
    store = str(tmp_path / "v3.zarr")
    t = np.arange(8, dtype="float64")
    v = (t * 2.5)
    to_zarr({"v": (["t"], v)}, store, dims={"t": t},
            chunks={"v": [3]}, zarr_format=3)
    import os, json
    meta = json.load(open(os.path.join(store, "zarr.json")))
    assert meta["zarr_format"] == 3 and meta["node_type"] == "group"
    assert os.path.exists(os.path.join(store, "v", "c", "0"))  # default key encoding
    np.testing.assert_array_equal(read_zarr_array(store, "v"), v)
    ds = open_zarr(spark, store)
    got = {r["t"]: r["v"] for r in ds.df.collect()}
    assert got == {float(i): float(i) * 2.5 for i in range(8)}


def test_zarr_v3_guess_and_groups(spark, tmp_path):
    import numpy as np
    from xarray_spark import open_dataset, open_groups
    from xarray_spark.io import guess_engine
    from xarray_spark.backends import to_zarr
    store = str(tmp_path / "h3")
    to_zarr({"v": (["t"], np.arange(4, dtype="float64"))}, store,
            dims={"t": np.arange(4, dtype="float64")}, zarr_format=3)
    assert guess_engine(store) == "zarr"
    ds = open_dataset(spark, store)
    assert ds.df.count() == 4
    groups = open_groups(spark, store)
    assert "/" in groups and groups["/"].df.count() == 4


def test_zarr_v3_missing_chunk_fill(spark, tmp_path):
    import numpy as np, os
    from xarray_spark.backends import open_zarr, to_zarr
    store = str(tmp_path / "m3.zarr")
    to_zarr({"a": (["t"], np.arange(6, dtype="float64"))}, store,
            dims={"t": np.arange(6, dtype="float64")},
            chunks={"a": [2]}, zarr_format=3)
    os.remove(os.path.join(store, "a", "c", "2"))  # drop the last chunk
    got = sorted((r["t"], r["a"]) for r in open_zarr(spark, store).df.collect())
    assert got[:4] == [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0)]
    # v3 float fill = NaN -> long-form null (NaN≡null across Arrow)
    assert all(a is None or np.isnan(a) for _, a in got[4:])


def test_to_zarr_distributed_roundtrip(spark, tmp_path):
    import numpy as np
    from xarray_spark import XDataset
    from xarray_spark.backends import open_zarr, to_zarr_distributed
    n = 1000
    rows = [(float(i), float(i) * 0.5, float(i % 7)) for i in range(n)]
    ds = XDataset(spark.createDataFrame(rows, ["t", "a", "b"]), dims=["t"])
    for fmt in (2, 3):
        store = str(tmp_path / f"dist_v{fmt}.zarr")
        to_zarr_distributed(ds, store, chunk_rows=128, zarr_format=fmt)
        back = open_zarr(spark, store)
        got = back.df.orderBy("t").collect()
        assert len(got) == n
        assert got[13]["a"] == 6.5 and got[13]["b"] == 6.0
        # 1000 rows / 128-chunk => 8 chunk files per var
        import os
        vdir = os.path.join(store, "a")
        files = [f for root, _, fs in os.walk(vdir) for f in fs
                 if not f.startswith((".", "zarr"))]
        assert len(files) == 8


def test_dataset_to_netcdf_roundtrip(spark, tmp_path):
    from xarray_spark import XDataset, open_dataset
    p = str(tmp_path / "out.nc")
    rows = [(float(i), float(i) * 3.0) for i in range(6)]
    ds = XDataset(spark.createDataFrame(rows, ["t", "v"]), dims=["t"])
    ds.to_netcdf(p)
    back = open_dataset(spark, p)
    got = {r["t"]: r["v"] for r in back.df.collect()}
    assert got == {float(i): float(i) * 3.0 for i in range(6)}


class TestZarrRegionAppend:
    @pytest.mark.parametrize("fmt", [2, 3])
    def test_region_overwrite_roundtrip(self, spark, tmp_path, fmt):
        import numpy as np
        from xarray_spark.backends import read_zarr_array
        store = str(tmp_path / f"z{fmt}")
        full = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(20),
                          "v": [float(i) for i in range(20)]})),
            dims=["t"])
        full.to_zarr(store, chunk_rows=5, zarr_format=fmt)
        reg = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(5, 15),
                          "v": [-float(i) for i in range(5, 15)]})),
            dims=["t"])
        reg.to_zarr(store, region={"t": slice(5, 15)})
        arr = read_zarr_array(store, "v")
        exp = np.array([float(i) for i in range(5)]
                       + [-float(i) for i in range(5, 15)]
                       + [float(i) for i in range(15, 20)])
        np.testing.assert_allclose(arr, exp)

    @pytest.mark.parametrize("fmt", [2, 3])
    def test_append_dim_extends_store(self, spark, tmp_path, fmt):
        import numpy as np
        from xarray_spark.backends import open_zarr, read_zarr_array
        store = str(tmp_path / f"za{fmt}")
        full = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(20),
                          "v": [float(i) for i in range(20)]})),
            dims=["t"])
        full.to_zarr(store, chunk_rows=5, zarr_format=fmt)
        app = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(20, 30),
                          "v": [float(i) * 10 for i in range(20, 30)]})),
            dims=["t"])
        app.to_zarr(store, append_dim="t")
        arr = read_zarr_array(store, "v")
        coord = read_zarr_array(store, "t")
        assert arr.shape == (30,)
        np.testing.assert_allclose(arr[20:],
                                   [float(i) * 10 for i in range(20, 30)])
        np.testing.assert_allclose(coord, np.arange(30))
        assert open_zarr(spark, store).df.count() == 30

    def test_region_alignment_guard(self, spark, tmp_path):
        store = str(tmp_path / "zg")
        full = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(20),
                          "v": [float(i) for i in range(20)]})),
            dims=["t"])
        full.to_zarr(store, chunk_rows=5)
        reg = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(3, 13),
                          "v": [0.0] * 10})), dims=["t"])
        with pytest.raises(ValueError):
            reg.to_zarr(store, region={"t": slice(3, 13)})
        # wrong row count for the region
        with pytest.raises(ValueError):
            reg.to_zarr(store, region={"t": slice(0, 5)})

    def test_append_partial_chunk_guard(self, spark, tmp_path):
        store = str(tmp_path / "zp")
        full = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(7),
                          "v": [float(i) for i in range(7)]})),
            dims=["t"])
        full.to_zarr(store, chunk_rows=5)  # 7 % 5 != 0
        app = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": [7], "v": [9.0]})), dims=["t"])
        with pytest.raises(NotImplementedError):
            app.to_zarr(store, append_dim="t")


class TestZarrND:
    @pytest.mark.parametrize("fmt", [2, 3])
    def test_2d_write_read_roundtrip(self, spark, tmp_path, fmt):
        from xarray_spark.backends import open_zarr, read_zarr_array
        store = str(tmp_path / f"nd{fmt}")
        rows = [{"x": i, "y": j, "v": float(i * 100 + j),
                 "w": float(i - j)} for i in range(7) for j in range(5)]
        ds = XDataset(spark.createDataFrame(pd.DataFrame(rows)),
                      dims=["x", "y"])
        ds.to_zarr(store, chunks={"x": 3, "y": 2}, zarr_format=fmt)
        arr = read_zarr_array(store, "v")
        exp = np.arange(7)[:, None] * 100 + np.arange(5)[None, :]
        assert arr.shape == (7, 5)
        np.testing.assert_allclose(arr, exp)
        back = open_zarr(spark, store)
        assert back.dims == ("x", "y")
        p = back.to_pandas().sort_values(["x", "y"])
        np.testing.assert_allclose(p["v"].to_numpy().reshape(7, 5), exp)
        np.testing.assert_allclose(
            p["w"].to_numpy(),
            [float(i - j) for i in range(7) for j in range(5)])

    def test_sparse_grid_rejected(self, spark, tmp_path):
        store = str(tmp_path / "ndsparse")
        rows = [{"x": 0, "y": 0, "v": 1.0}, {"x": 5, "y": 5, "v": 2.0}]
        ds = XDataset(spark.createDataFrame(pd.DataFrame(rows)),
                      dims=["x", "y"])
        # 2 labels per dim -> 2x2 grid cells with chunks of 1, but only
        # 2 populated -> the dense-grid check trips
        with pytest.raises(IOError):
            ds.to_zarr(store, chunks={"x": 1, "y": 1})


def test_dump_load_store_roundtrip(spark, tmp_path):
    """Legacy store surface (core/dataset.py:423 load_store, :2018
    dump_to_store): path-addressed stores route by extension."""
    import pandas as pd
    from xarray_spark import XDataset
    ds = XDataset(spark.createDataFrame(
        pd.DataFrame({"t": range(5), "v": [1., 2., 3., 4., 5.]})),
        dims=["t"])
    zp = str(tmp_path / "x.zarr")
    ds.dump_to_store(zp)
    back = XDataset.load_store(zp)
    assert sorted(back.to_pandas()["v"]) == [1., 2., 3., 4., 5.]
    nc = str(tmp_path / "x.nc")
    ds.dump_to_store(nc)
    b2 = XDataset.load_store(nc)
    assert sorted(b2.to_pandas()["v"]) == [1., 2., 3., 4., 5.]
