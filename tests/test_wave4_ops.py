"""Wave 4: approx quantile, clip/astype/round, calendar ops,
get_dummies/extractall, batch-vs-stream parity."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xarray_spark import XDataset
from xarray_spark.computation import convert_calendar, date_range_like
from xarray_spark.dataset import XDataArray


def mk(spark, rows, dims, **kw):
    return XDataset(spark.createDataFrame(rows), dims, **kw)


def test_quantile_approx_close_to_exact(spark):
    rows = [{"t": i, "v": float(i)} for i in range(1000)]
    d = mk(spark, rows, ["t"])
    exact = d.quantile([0.5], "t").df.collect()[0]["v"]
    approx = d.quantile([0.5], "t", approx=True).df.collect()[0]["v"]
    assert abs(exact - approx) <= 1.0


def test_clip_astype_round(spark):
    d = mk(spark, [{"t": 0, "v": 3.456}], ["t"])
    assert d.clip(min=0.0, max=2.0).df.collect()[0]["v"] == 2.0
    assert d.round(1).df.collect()[0]["v"] == 3.5
    assert d.astype("int").df.collect()[0]["v"] == 3


def test_convert_calendar(spark):
    rows = [
        {"t": dt.datetime(2024, 2, 28), "v": 1.0},
        {"t": dt.datetime(2024, 2, 29), "v": 2.0},
        {"t": dt.datetime(2024, 1, 31), "v": 3.0},
    ]
    d = mk(spark, rows, ["t"])
    noleap = convert_calendar(d, "t", "noleap")
    assert noleap.df.count() == 2
    d360 = convert_calendar(d, "t", "360_day")
    assert {r["v"] for r in d360.df.collect()} == {1.0}


def test_date_range_like(spark):
    rows = [{"t": dt.datetime(2024, 1, 1) + dt.timedelta(days=i), "v": 1.0} for i in range(5)]
    d = mk(spark, rows, ["t"])
    cal = date_range_like(spark, d, "t")
    assert cal.count() == 5


def test_get_dummies(spark):
    df = spark.createDataFrame([{"i": 0, "s": "a|b"}, {"i": 1, "s": "b|c"}])
    da = XDataArray(df, ["i"], {}, ["s"])
    out = da.str.get_dummies()
    got = {r["i"]: (r["a"], r["b"], r["c"]) for r in out.df.collect()}
    assert got == {0: (1, 1, 0), 1: (0, 1, 1)}


def test_extractall(spark):
    df = spark.createDataFrame([{"i": 0, "s": "x1 y2 z3"}])
    da = XDataArray(df, ["i"], {}, ["s"])
    # (pattern is now passed via F.lit — no SQL-literal backslash
    # doubling; the old double-escape compensated for the F.expr bug)
    out = da.str.extractall(r"([a-z])(\d)", group=2)
    got = {r["match"]: r["s"] for r in out.df.collect()}
    assert got == {0: "1", 1: "2", 2: "3"}


def test_batch_stream_resample_parity(spark, tmp_path):
    """The streaming resample must agree with the batch engine on the
    same data (closed windows)."""
    import uuid
    from xarray_spark.streaming import open_stream, stream_resample

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()), T.StructField("v", T.DoubleType())
    ])
    rows = [(dt.datetime(2024, 1, 1, 0, m, 30), float(m)) for m in range(30)]
    path = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)

    # batch: XDataset resample
    bds = XDataset(
        spark.read.parquet(path).withColumn("event_id", F.monotonically_increasing_id()),
        dims=["event_id"], coords={"ts": ("event_id",)},
    )
    batch = {
        (r["ts"],): (r["n"], r["total"])
        for r in bds.resample(ts="10min").agg(n=F.count(F.lit(1)), total=F.sum("v")).df.collect()
    }

    src = open_stream(spark, path, schema)
    out = stream_resample(src, "ts", "10min", {"n": F.count(F.lit(1)), "total": F.sum("v")})
    name = f"p_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream = {
        (r["ts"],): (r["n"], r["total"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert batch == stream and len(batch) == 3


def test_salted_agg_matches_plain(spark):
    from xarray_spark import salted_agg
    rows = [{"k": "a" if i % 10 else "b", "t": i, "v": float(i)} for i in range(100)]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], coords={"k": ("t",)})
    out = salted_agg(d, ["k"], {
        "n": ("count", "*"), "s": ("sum", "v"),
        "mx": ("max", "v"), "m": ("avg", "v"),
    }, salt=8)
    got = {r["k"]: (r["n"], r["s"], r["mx"], r["m"]) for r in out.df.collect()}
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"], r["m"])
        for r in d.df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.max("v").alias("mx"), F.avg("v").alias("m")).collect()
    }
    assert got == plain


def test_sel_points_nearest(spark):
    from xarray_spark import sel_points_nearest
    rows = [{"i": i, "x": float(i), "y": float(i), "v": float(100 + i)} for i in range(10)]
    d = XDataset(spark.createDataFrame(rows), dims=["i"],
                 coords={"x": ("i",), "y": ("i",)})
    out = sel_points_nearest(d, {"x": [2.2, 7.9], "y": [2.0, 8.1]})
    got = {r["points"]: r["v"] for r in out.df.collect()}
    assert got == {0: 102.0, 1: 108.0}


def test_cumprod(spark):
    rows = [{"t": i, "v": float(v)} for i, v in enumerate([1, 2, 3, 4])]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    got = [r["v"] for r in d.cumprod("t").df.orderBy("t").collect()]
    assert got == [1.0, 2.0, 6.0, 24.0]


def test_interp_like(spark):
    a = XDataset(spark.createDataFrame(
        [{"t": 0.0, "v": 0.0}, {"t": 10.0, "v": 100.0}]), dims=["t"])
    b = XDataset(spark.createDataFrame(
        [{"t": 2.5, "w": 1.0}, {"t": 5.0, "w": 1.0}]), dims=["t"])
    out = a.interp_like(b)
    got = {r["t"]: r["v"] for r in out.df.collect()}
    assert got == {2.5: 25.0, 5.0: 50.0}


def test_reindex_like(spark):
    a = XDataset(spark.createDataFrame(
        [{"t": 0, "v": 1.0}, {"t": 1, "v": 2.0}]), dims=["t"])
    b = XDataset(spark.createDataFrame(
        [{"t": 1, "w": 0.0}, {"t": 2, "w": 0.0}]), dims=["t"])
    out = a.reindex_like(b, fill_value=0.0)
    got = {r["t"]: r["v"] for r in out.df.collect()}
    assert got == {1: 2.0, 2: 0.0}


def test_map_blocks(spark):
    import pandas as pd
    d = XDataset(spark.createDataFrame(
        [{"t": i, "v": float(i)} for i in range(4)]), dims=["t"])

    def double(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["v"] = pdf["v"] * 2
            yield pdf

    out = d.map_blocks(double)
    assert sorted(r["v"] for r in out.df.collect()) == [0.0, 2.0, 4.0, 6.0]


def test_interpolate_na_max_gap(spark):
    rows = [
        {"t": 0.0, "v": 0.0}, {"t": 1.0, "v": None}, {"t": 2.0, "v": 2.0},
        {"t": 3.0, "v": None}, {"t": 10.0, "v": 10.0},
    ]
    d = XDataset(spark.createDataFrame(rows, "t double, v double"), dims=["t"])
    got = {r["t"]: r["v"] for r in d.interpolate_na("t", max_gap=3.0).df.collect()}
    assert got[1.0] == 1.0       # gap width 2 <= 3 -> filled
    assert got[3.0] is None      # gap width 8 > 3 -> left null


def test_from_dict_roundtrip(spark):
    from xarray_spark.io import from_dict
    d = XDataset(spark.createDataFrame([{"t": 0, "v": 1.5}]), dims=["t"])
    back = from_dict(spark, d.to_dict())
    assert back.dims == ("t",) and back.df.collect()[0]["v"] == 1.5


def test_range_linspace_index(spark):
    from xarray_spark.io import linspace_index, range_index
    r = range_index(spark, "x", 0.0, 10.0, 2.5)
    assert [row["x"] for row in r.orderBy("x").collect()] == [0.0, 2.5, 5.0, 7.5]
    l = linspace_index(spark, "x", 0.0, 1.0, 5)
    assert [row["x"] for row in l.orderBy("x").collect()] == [0.0, 0.25, 0.5, 0.75, 1.0]


def test_apply_ufunc_multi_input(spark):
    import pandas as pd
    from xarray_spark import apply_ufunc
    a = XDataset(spark.createDataFrame(
        [{"g": g, "t": t, "u": float(t)} for g in range(2) for t in range(3)]),
        dims=["g", "t"])
    b = XDataset(spark.createDataFrame(
        [{"g": g, "t": t, "w": 2.0} for g in range(2) for t in range(3)]),
        dims=["g", "t"])

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["u"] = pdf["u"] * pdf["w"]
        return pdf[["g", "t", "u", "w"]]

    out = apply_ufunc(f, a, b, input_core_dims=[["t"]])
    vals = sorted(r["u"] for r in out.df.collect())
    assert vals == [0.0, 0.0, 2.0, 2.0, 4.0, 4.0]


def test_dataset_update(spark):
    a = XDataset(spark.createDataFrame(
        [{"t": 0, "v": 1.0}, {"t": 1, "v": 2.0}]), dims=["t"])
    b = XDataset(spark.createDataFrame(
        [{"t": 1, "v": 99.0, "w": 5.0}]), dims=["t"])
    out = a.update(b)
    got = {r["t"]: (r["v"], r["w"]) for r in out.df.collect()}
    # reference semantics: update REPLACES the variable wholesale,
    # reindexed to self's labels — t=0 has no source row in b, so v
    # becomes null there (verified against the reference directly)
    assert got == {0: (None, None), 1: (99.0, 5.0)}


def test_weighted_quantile(spark):
    import numpy as np
    rows = [{"t": i, "v": float(v), "w": float(w)}
            for i, (v, w) in enumerate([(1, 1), (2, 1), (3, 1), (4, 1)])]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], data_vars=["v"])
    got = d.weighted("w").quantile(0.5).df.collect()[0]["v"]
    # equal weights -> the weighted HF7 estimator reduces to numpy's
    # linear quantile: median of 1..4 = 2.5
    assert got == 2.5

    def akinshin_wq(v, w, q):
        # the reference's algorithm (computation/weighted.py:348),
        # replicated independently
        v, w = np.asarray(v, float), np.asarray(w, float)
        order = np.argsort(v)
        v, w = v[order], w[order]
        nw = w.sum() ** 2 / (w ** 2).sum()
        w = w / w.sum()
        wcum = np.append(0, np.cumsum(w))
        h = np.clip((nw - 1) * q + 1, 1, nw)
        u = np.maximum((h - 1) / nw, np.minimum(h / nw, wcum))
        vv = u * nw - h + 1
        return (v * np.diff(vv)).sum()

    # heavy weight on 4 pulls the median up — reference semantics
    rows2 = [{"t": i, "v": float(v), "w": float(w)}
             for i, (v, w) in enumerate([(1, 1), (2, 1), (3, 1), (4, 10)])]
    d2 = XDataset(spark.createDataFrame(rows2), dims=["t"], data_vars=["v"])
    got2 = d2.weighted("w").quantile(0.5).df.collect()[0]["v"]
    assert abs(got2 - akinshin_wq([1, 2, 3, 4], [1, 1, 1, 10], 0.5)) < 1e-12
    assert got2 > 3.0  # the heavy tail weight dominates


def test_dt_decimal_year_isocalendar(spark):
    import datetime as dt
    from xarray_spark.dataset import XDataArray
    df = spark.createDataFrame([{"i": 0, "ts": dt.datetime(2024, 7, 2)}])
    da = XDataArray(df, ["i"], {}, ["ts"])
    dy = da.dt.decimal_year.df.collect()[0]["ts"]
    assert 2024.49 < dy < 2024.51
    iso = da.dt.isocalendar().df.collect()[0]["ts"]
    assert iso["year"] == 2024 and iso["week"] == 27 and iso["weekday"] == 2


def test_var_attrs_and_filter(spark):
    d = XDataset(spark.createDataFrame(
        [{"t": 0, "temp": 1.0, "rain": 2.0}]), dims=["t"])
    d = d.assign_var_attrs("temp", units="K", standard_name="air_temperature")
    d = d.assign_var_attrs("rain", units="mm")
    out = d.filter_by_attrs(units="K")
    assert out.data_vars == ("temp",)
    out2 = d.filter_by_attrs(units=lambda u: u in ("K", "mm"))
    assert set(out2.data_vars) == {"temp", "rain"}
    assert d.drop_attrs().attrs == {}


def test_groupby_groups_iter(spark):
    rows = [{"t": t, "g": t % 2, "v": float(t)} for t in range(4)]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], coords={"g": ("t",)})
    gb = d.groupby("g")
    groups = gb.groups
    assert set(groups) == {0, 1}
    assert sorted(r["v"] for r in groups[0].df.collect()) == [0.0, 2.0]
    assert len(list(iter(gb))) == 2
