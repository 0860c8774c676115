"""Tests for the second operator wave: resample up/down-sampling, EWM,
pad, cumulative_integrate, cross, date_range, like-constructors,
set_index family, DataTree."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from xarray_spark import (
    DataTree,
    XDataset,
    cross,
    date_range,
    full_like,
    ones_like,
    zeros_like,
)
from xarray_spark.dataset import XDataArray


def make_ds(spark, rows, dims, coords=None, data_vars=None):
    return XDataset(spark.createDataFrame(rows), dims, coords, data_vars)


@pytest.fixture(scope="module")
def tseries(spark):
    # daily series with a two-day hole (Jan 3-4 missing)
    rows = [
        {"t": dt.datetime(2024, 1, 1), "v": 1.0},
        {"t": dt.datetime(2024, 1, 2), "v": 2.0},
        {"t": dt.datetime(2024, 1, 5), "v": 5.0},
    ]
    return make_ds(spark, rows, dims=["t"])


def test_resample_downsample(spark):
    rows = [
        {"t": dt.datetime(2024, 1, 1, h), "v": float(h)} for h in (0, 1, 13)
    ]
    d = make_ds(spark, rows, dims=["t"])
    out = d.resample(t="D").mean()
    assert out.df.collect()[0]["v"] == pytest.approx(14 / 3)


def test_resample_asfreq_fills_calendar(tseries):
    out = tseries.resample(t="D").asfreq()
    got = {r["t"].day: r["v"] for r in out.df.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None, 5: 5.0}


def test_resample_pad(tseries):
    out = tseries.resample(t="D").pad()
    got = {r["t"].day: r["v"] for r in out.df.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 2.0, 4: 2.0, 5: 5.0}


def test_resample_backfill(tseries):
    out = tseries.resample(t="D").backfill()
    got = {r["t"].day: r["v"] for r in out.df.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 5.0, 4: 5.0, 5: 5.0}


def test_resample_interpolate(tseries):
    out = tseries.resample(t="D").interpolate()
    got = {r["t"].day: r["v"] for r in out.df.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0, 5: 5.0}


def test_rolling_exp_mean(spark):
    rows = [{"t": i, "v": float(v)} for i, v in enumerate([1, 2, 3, 4])]
    d = make_ds(spark, rows, dims=["t"])
    out = d.rolling_exp(t=3).mean()  # pandas ewm(span=3)
    import pandas as pd

    expect = pd.Series([1.0, 2.0, 3.0, 4.0]).ewm(span=3, min_periods=1).mean()
    got = [r["v"] for r in out.df.orderBy("t").collect()]
    assert got == pytest.approx(list(expect))


def test_pad_constant(spark):
    rows = [{"t": 10.0, "v": 1.0}, {"t": 20.0, "v": 2.0}, {"t": 30.0, "v": 3.0}]
    d = make_ds(spark, rows, dims=["t"])
    out = d.pad(t=(1, 2), constant_values=0.0)
    got = {r["t"]: r["v"] for r in out.df.orderBy("t").collect()}
    assert got == {0.0: 0.0, 10.0: 1.0, 20.0: 2.0, 30.0: 3.0, 40.0: 0.0, 50.0: 0.0}


def test_pad_edge(spark):
    rows = [{"t": 0.0, "v": 7.0}, {"t": 1.0, "v": 9.0}]
    d = make_ds(spark, rows, dims=["t"])
    out = d.pad(t=(1, 1), mode="edge")
    got = {r["t"]: r["v"] for r in out.df.orderBy("t").collect()}
    assert got == {-1.0: 7.0, 0.0: 7.0, 1.0: 9.0, 2.0: 9.0}


def test_cumulative_integrate(spark):
    rows = [{"t": float(t), "v": 2.0} for t in range(4)]
    d = make_ds(spark, rows, dims=["t"])
    out = d.cumulative_integrate("t")
    got = {r["t"]: r["v"] for r in out.df.orderBy("t").collect()}
    assert got == {0.0: 0.0, 1.0: 2.0, 2.0: 4.0, 3.0: 6.0}


def test_cross(spark):
    # x-hat × y-hat = z-hat
    rows_a = [{"c": "x", "v": 1.0}, {"c": "y", "v": 0.0}, {"c": "z", "v": 0.0}]
    rows_b = [{"c": "x", "v": 0.0}, {"c": "y", "v": 1.0}, {"c": "z", "v": 0.0}]
    a = XDataArray(spark.createDataFrame(rows_a), ["c"], {}, ["v"])
    b = XDataArray(spark.createDataFrame(rows_b), ["c"], {}, ["v"])
    out = cross(a, b, dim="c")
    got = {r["c"]: r["value"] for r in out.df.collect()}
    assert got == {"x": 0.0, "y": 0.0, "z": 1.0}


def test_date_range(spark):
    df = date_range(spark, "2024-01-01", "2024-01-10", "D")
    assert df.count() == 10
    df2 = date_range(spark, "2024-01-01", "2024-12-31", "MS")
    assert df2.count() == 12


def test_like_constructors(spark):
    d = make_ds(spark, [{"t": 0, "v": 5.0}], dims=["t"])
    assert full_like(d, 9.0).df.collect()[0]["v"] == 9.0
    assert zeros_like(d).df.collect()[0]["v"] == 0.0
    assert ones_like(d).df.collect()[0]["v"] == 1.0


def test_set_reset_index(spark):
    rows = [{"t": 0, "year": 2000, "v": 1.0}]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], coords={"year": ("t",)})
    s = d.set_index(t="year")
    assert s.dims == ("year",)
    r = s.reset_index("year")
    assert "year" in r.coords


def test_datatree(spark, tmp_path):
    a = make_ds(spark, [{"t": 0, "v": 1.0}], dims=["t"])
    b = make_ds(spark, [{"t": 0, "v": 2.0}], dims=["t"])
    tree = DataTree({"/grp_a": a, "/grp_b/nested": b})
    assert len(tree) == 2 and "/grp_a" in tree
    doubled = tree.map_over_datasets(lambda ds: ds * 2)
    assert doubled["/grp_a"].df.collect()[0]["v"] == 2.0
    sub = tree.subtree("/grp_b")
    assert len(sub) == 1
    root = str(tmp_path / "tree")
    tree.to_parquet(root)
    back = DataTree.open(spark, root, ["/grp_a", "/grp_b/nested"])
    assert back["/grp_b/nested"].df.collect()[0]["v"] == 2.0


def test_connected_components_vs_union_find(spark):
    import random
    from xarray_spark.extras.dedup import connected_components

    rng = random.Random(11)
    edges = [(rng.randint(0, 199), rng.randint(0, 199)) for _ in range(150)]
    edges += [(i, i + 1) for i in range(300, 340)]  # a 41-node chain
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["id"]: r["cluster"]
           for r in connected_components(df).collect()}
    assert got == expected


def test_dedup_keep_canonical(spark):
    from xarray_spark.extras.dedup import dedup_keep_canonical
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], ["id_a", "id_b"])
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == [0, 1, 4]


def test_str_tail2_methods(spark):
    from xarray_spark import XDataset
    d = XDataset(spark.createDataFrame(
        [(1, "a-b-c-d"), (2, "x-y")], ["t", "s"]), dims=["t"])
    da = d["s"]
    rows = {r["t"]: r["s"] for r in da.str.rsplit("-", maxsplit=1).df.collect()}
    assert rows[1] == ["a-b-c", "d"] and rows[2] == ["x", "y"]
    rows = {r["t"]: r["s"] for r in da.str.slice_replace(1, 3, "Z").df.collect()}
    assert rows[1] == "aZ-c-d" and rows[2] == "xZ"
    only1 = d.isel(t=[0])["s"]
    assert only1.str.index("b").df.collect()[0]["s"] == 2
    import pytest as _pt
    with _pt.raises(Exception, match="not found"):
        da.str.index("q").df.collect()
    # join along the dim consumes it
    j = d["s"].str.join(dim="t", sep="|").df.collect()
    assert j[0]["s"] == "a-b-c-d|x-y"


def test_str_format_and_rindex(spark):
    from xarray_spark import XDataset
    d = XDataset(spark.createDataFrame(
        [(1, "v={0}:{k}"), (2, "plain")], ["t", "s"]), dims=["t"])
    rows = {r["t"]: r["s"] for r in d["s"].str.format(7, k="x").df.collect()}
    assert rows == {1: "v=7:x", 2: "plain"}
    d2 = XDataset(spark.createDataFrame([(1, "abcabc")], ["t", "s"]), dims=["t"])
    assert d2["s"].str.rindex("bc").df.collect()[0]["s"] == 4


def test_str_format_array_broadcast(spark):
    from pyspark.sql import functions as F
    from xarray_spark import XDataset
    d = XDataset(spark.createDataFrame(
        [(1, "{0}-{n}", "A", 10), (2, "{n}/{0}", "B", 20), (3, None, "C", 30)],
        ["t", "s", "tag", "num"]), dims=["t"])
    # XDataArray args broadcast elementwise; scalar kwarg mixes in
    got = {r["t"]: r["s"] for r in
           d["s"].str.format(d["tag"], n=d["num"]).df.collect()}
    assert got == {1: "A-10", 2: "20/B", 3: None}
    # XDataArray arg aligns on the shared dim
    other = XDataset(spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], ["t", "v"]), dims=["t"])["v"]
    got2 = {r["t"]: r["s"] for r in d["s"].str.format(other, n=0).df.collect()}
    assert got2 == {1: "x-0", 2: "0/y", 3: None}


def test_dt_timedelta_fields_and_aliases(spark):
    from pyspark.sql import functions as F
    from xarray_spark import XDataset
    df = spark.createDataFrame(
        [(1, "2020-01-03 12:00:00.500000", "2020-01-01 00:00:00")],
        ["t", "b", "a"],
    ).select(
        "t",
        (F.col("b").cast("timestamp") - F.col("a").cast("timestamp")).alias("td"),
        F.col("b").cast("timestamp").alias("ts"),
    )
    d = XDataset(df, dims=["t"])
    td = d["td"]
    assert td.dt.days.df.collect()[0]["td"] == 2
    assert td.dt.seconds.df.collect()[0]["td"] == 43200
    assert td.dt.microseconds.df.collect()[0]["td"] == 500000
    assert abs(td.dt.total_seconds().df.collect()[0]["td"] - 216000.5) < 1e-6
    ts = d["ts"]
    assert ts.dt.day_of_week.df.collect()[0]["ts"] == 4  # Friday=4
    assert ts.dt.calendar == "proleptic_gregorian"


def test_datatree_filter_match_prune(spark):
    a = make_ds(spark, [{"t": 0, "v": 1.0}], dims=["t"])
    b = make_ds(spark, [{"t": 0, "v": 9.0}], dims=["t"])
    tree = DataTree({"/obs/a": a, "/obs/b": b, "/model/a": a})
    assert set(tree.match("/obs/*").groups) == {"/obs/a", "/obs/b"}
    big = tree.filter(lambda ds: ds.df.collect()[0]["v"] > 5)
    assert set(big.groups) == {"/obs/b"}
    assert set(tree.prune().groups) == set(tree.groups)  # none empty
