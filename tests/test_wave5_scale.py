"""Bucketed tables, multi-probe LSH, IVF, session windows."""

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xarray_spark import XDataset


def test_bucketed_table_join_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rows_a = [{"k": i, "v": float(i)} for i in range(1000)]
        rows_b = [{"k": i, "w": float(2 * i)} for i in range(1000)]
        a = XDataset(spark.createDataFrame(rows_a), dims=["k"])
        b = XDataset(spark.createDataFrame(rows_b), dims=["k"])
        na, nb = f"ba_{uuid.uuid4().hex[:8]}", f"bb_{uuid.uuid4().hex[:8]}"
        a.to_table(na, bucket_by=["k"], n_buckets=8)
        b.to_table(nb, bucket_by=["k"], n_buckets=8)
        ta, tb = spark.table(na), spark.table(nb)
        joined = ta.join(tb, on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


@pytest.fixture(scope="module")
def emb(spark):
    import math
    rows = []
    for i in range(200):
        vec = [math.sin(0.1 * (i + 1) * (j + 1)) for j in range(16)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_multiprobe_recall_at_least_single_probe(emb):
    from xarray_spark.extras.similarity import cosine_topk, lsh_topk, lsh_topk_multiprobe
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding"))
    exact = {(r["qid"], r["nid"]) for r in cosine_topk(emb, queries, k=5).collect()}
    single = {(r["qid"], r["nid"]) for r in
              lsh_topk(emb, queries, k=5, n_planes=6, dim=16).collect()}
    multi = {(r["qid"], r["nid"]) for r in
             lsh_topk_multiprobe(emb, queries, k=5, n_planes=6, dim=16, n_probes=1).collect()}
    assert len(multi & exact) >= len(single & exact)


def test_ivf_topk(emb):
    from xarray_spark.extras.similarity import cosine_topk, ivf_topk
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding"))
    exact = {(r["qid"], r["nid"]) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = ivf_topk(emb, queries, k=5, n_cells=4, n_probe=2).collect()
    got = {(r["qid"], r["nid"]) for r in approx}
    # probing half the cells should recover a decent share of true top-5
    assert len(got & exact) >= 5
    # ranks are dense 1..k per query
    ranks = sorted(r["rank"] for r in approx if r["qid"] == 0)
    assert ranks == list(range(1, len(ranks) + 1))


def test_stream_sessionize(spark, tmp_path):
    from xarray_spark.streaming import open_stream, stream_sessionize
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("user", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0), "u", 1.0),
        (dt.datetime(2024, 1, 1, 0, 1), "u", 2.0),
        (dt.datetime(2024, 1, 1, 0, 2), "u", 3.0),
        # > 5 min gap -> new session
        (dt.datetime(2024, 1, 1, 0, 30), "u", 4.0),
    ]
    path = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    src = open_stream(spark, path, schema)
    out = stream_sessionize(src, "ts", "5 minutes",
                            {"n": F.count(F.lit(1)), "total": F.sum("v")},
                            keys=["user"])
    name = f"s_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["ts"].minute: (r["n"], r["total"], r["session_seconds"])
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got[0] == (3, 6.0, 7 * 60)   # 0,1,2 min events + 5 min gap tail
    assert got[30] == (1, 4.0, 5 * 60)


def test_argmax_multi_dim(spark):
    rows = [{"g": g, "x": x, "y": y, "v": float(g * 100 + x * 10 + y)}
            for g in range(2) for x in range(3) for y in range(3)]
    d = XDataset(spark.createDataFrame(rows), dims=["g", "x", "y"])
    out = d.idxmax(["x", "y"])
    got = {r["g"]: (r["v"]["x"], r["v"]["y"]) for r in out.df.collect()}
    assert got == {0: (2, 2), 1: (2, 2)}
    out2 = d.idxmin(["x", "y"])
    got2 = {r["g"]: (r["v"]["x"], r["v"]["y"]) for r in out2.df.collect()}
    assert got2 == {0: (0, 0), 1: (0, 0)}


def test_sidecar_restores_catalog(spark, tmp_path):
    from xarray_spark import open_dataset
    d = XDataset(
        spark.createDataFrame([{"t": 0, "c": 1, "v": 2.0}]),
        dims=["t"], coords={"c": ("t",)}, attrs={"title": "demo"},
    )
    p = str(tmp_path / "cat")
    d.to_parquet(p)
    back = open_dataset(spark, p)
    assert back.dims == ("t",) and back.coords == {"c": ("t",)}
    assert back.data_vars == ("v",) and back.attrs["title"] == "demo"


def test_groupby_assign_and_where(spark):
    from pyspark.sql import functions as F
    rows = [{"t": t, "g": t % 2, "v": float(t)} for t in range(6)]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], coords={"g": ("t",)})
    gb = d.groupby("g")
    out = gb.assign(gmean=F.avg("v"))
    got = {r["t"]: r["gmean"] for r in out.df.collect()}
    assert got[0] == 2.0 and got[1] == 3.0  # means of {0,2,4} and {1,3,5}
    cond = gb.agg(ok=F.avg("v") > 2.5)
    masked = d.groupby("g").where(cond)
    vals = {r["t"]: r["v"] for r in masked.df.collect()}
    assert vals[1] == 1.0 and vals[0] is None  # group 0 mean 2.0 -> masked


def test_season_resampler_cross_year(spark):
    import datetime as dt
    from xarray_spark.groupers import SeasonResampler
    rows = [
        {"t": dt.datetime(2000, 12, 15), "v": 1.0},
        {"t": dt.datetime(2001, 1, 15), "v": 2.0},
        {"t": dt.datetime(2001, 6, 15), "v": 4.0},
    ]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    # round-10 reference-parity semantics: the label is the season
    # instance's START timestamp (December keeps its year), and
    # drop_incomplete would trim the partial boundary instances —
    # disable it to observe both groups on this 3-point fixture
    out = d.groupby(t=SeasonResampler(drop_incomplete=False)).sum()
    import pandas as pd
    got = {str(pd.Timestamp(r["t"]))[:10]: r["v"]
           for r in out.df.collect()}
    # Dec 2000 + Jan 2001 share the DJF instance labeled 2000-12-01
    assert got["2000-12-01"] == 3.0 and got["2001-06-01"] == 4.0


def test_register_accessor(spark):
    from xarray_spark.dataset import register_dataset_accessor

    @register_dataset_accessor("stats")
    class StatsAccessor:
        def __init__(self, ds):
            self._ds = ds

        def nvars(self):
            return len(self._ds.data_vars)

    d = XDataset(spark.createDataFrame([{"t": 0, "a": 1.0, "b": 2.0}]), dims=["t"])
    assert d.stats.nvars() == 2


def test_open_dataarray_load_dataset(spark, tmp_path):
    from xarray_spark.io import load_dataset, open_dataarray
    d = XDataset(spark.createDataFrame([{"t": 0, "v": 1.0}]), dims=["t"])
    p = str(tmp_path / "single")
    d.to_parquet(p)
    da = open_dataarray(spark, p)
    assert da.name == "v"
    eager = load_dataset(spark, p)
    assert eager.df.count() == 1


def test_salted_join_matches_plain(spark):
    from xarray_spark.alignment import salted_join
    # skewed: 90% of big rows share one key
    big = spark.createDataFrame(
        [{"k": 0 if i % 10 else i, "v": float(i)} for i in range(1000)]
    )
    small = spark.createDataFrame([{"k": k, "w": float(k * 10)} for k in range(100)])
    plain = big.join(small, on="k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    ).collect()[0]
    salted = salted_join(big, small, ["k"], salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_mapping_interface_and_loc(spark):
    d = XDataset(spark.createDataFrame(
        [{"t": 0, "a": 1.0, "b": 2.0}, {"t": 1, "a": 3.0, "b": 4.0}]), dims=["t"])
    assert len(d) == 2 and set(d.keys()) == {"a", "b"}
    assert {name for name, _ in d.items()} == {"a", "b"}
    assert d.sizes == {"t": 2}
    sub = d.loc[{"t": 1}]
    assert sub.df.collect()[0]["a"] == 3.0


def test_ops_on_empty_dataset(spark):
    d = XDataset(spark.createDataFrame([{"t": 1.0, "v": 2.0}]), dims=["t"])
    empty = d.query("v > 1000")
    assert empty.pad(t=(1, 1)).df.count() == 0
    assert empty.mean().df.collect()[0]["v"] is None
    assert empty.cumsum("t").df.count() == 0
    assert empty.ffill("t").df.count() == 0
    assert empty.rolling(t=3, min_periods=1).mean().df.count() == 0


def test_dataarray_series_values_item(spark):
    from xarray_spark.dataset import XDataArray
    df = spark.createDataFrame([{"t": 1, "v": 10.0}, {"t": 0, "v": 5.0}])
    da = XDataArray(df, ["t"], {}, ["v"])
    s = da.to_series()
    assert s.loc[0] == 5.0 and s.loc[1] == 10.0
    assert list(da.values) == [5.0, 10.0]
    import pytest as _pt
    with _pt.raises(ValueError):
        da.item()
    one = XDataArray(spark.createDataFrame([{"t": 0, "v": 7.0}]), ["t"], {}, ["v"])
    assert one.item() == 7.0


def test_bpe_token_count_unit(spark):
    from xarray_spark.extras.text import bpe_ish_token_count
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("don't stop, it's 42 now!",)], ["s"])
    n = df.select(bpe_ish_token_count(F.col("s")).alias("n")).collect()[0]["n"]
    # don | 't | stop | , | it | 's | 42 | now | ! -> 9
    assert n == 9


def test_set_options_arithmetic_join(spark):
    from xarray_spark import set_options
    a = XDataset(spark.createDataFrame(
        [{"t": 0, "v": 1.0}, {"t": 1, "v": 2.0}]), dims=["t"])
    b = XDataset(spark.createDataFrame(
        [{"t": 1, "v": 10.0}, {"t": 2, "v": 20.0}]), dims=["t"])
    inner = a + b
    assert {r["t"] for r in inner.df.collect()} == {1}
    with set_options(arithmetic_join="outer"):
        outer = a + b
        got = {r["t"]: r["v"] for r in outer.df.collect()}
    assert set(got) == {0, 1, 2}
    assert got[1] == 12.0 and got[0] is None and got[2] is None
    import pytest as _pt
    with _pt.raises(ValueError):
        set_options(arithmetic_join="bogus")
    with _pt.raises(ValueError):
        set_options(no_such_option=1)


def test_auto_segment_dispatch(spark):
    from xarray_spark import set_options
    rows = [{"t": i, "v": float(i)} for i in range(300)]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    plain = [r["v"] for r in d.rolling(t=5).mean().df.orderBy("t").collect()]
    with set_options(auto_segment_threshold=100):
        auto = d.rolling(t=5).mean()
        vals = [r["v"] for r in auto.df.orderBy("t").collect()]
        cum = [r["v"] for r in d.cumsum("t").df.orderBy("t").collect()]
    assert vals == plain
    assert cum[-1] == sum(range(300))


def test_multimodal_decode_resize_pipeline(spark):
    import numpy as np
    from xarray_spark.extras.multimodal import (
        decode_image, resize_image, synth_media_table,
    )
    media = synth_media_table(spark, n=8)
    dec = decode_image(media)
    rows = dec.collect()
    assert len(rows) == 8
    r0 = rows[0]
    assert len(r0["pixels"]) == r0["width"] * r0["height"] * r0["channels"]
    # determinism: same payload -> same pixels
    again = {r["media_id"]: r["pixels"] for r in decode_image(media).collect()}
    assert again[r0["media_id"]] == r0["pixels"]
    rs = resize_image(dec, 4, 4).collect()
    assert all(len(r["pixels"]) == 4 * 4 * r["channels"] for r in rs)
    # bilinear identity: resizing to the same shape reproduces the buffer
    same = {r["media_id"]: r["pixels"]
            for r in resize_image(dec, 16, 16).collect()}
    orig = {r["media_id"]: r["pixels"] for r in rows}
    for k in orig:
        np.testing.assert_allclose(same[k], orig[k], rtol=1e-6)


def test_multimodal_frame_sample(spark):
    from xarray_spark.extras.multimodal import frame_sample, synth_media_table
    media = synth_media_table(spark, n=4)
    frames = frame_sample(media, every_n=2, frame_bytes=64).collect()
    # payload sizes are 128..256 bytes -> 2..4 pseudo-frames, keep 0,2
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(idxs == sorted(idxs) and all(i % 2 == 0 for i in idxs)
               for idxs in by_id.values())
    assert len(by_id) == 4


def test_near_dup_shard_cols_bound_candidates(spark):
    """shard_cols pre-shards every near-dup join: pairs never cross a
    shard boundary (the 100 TB candidate-set bound), within-shard
    results identical to the unsharded run on that shard alone."""
    from xarray_spark.extras.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_dups,
    )
    docs = []
    for lang in ("en", "de"):
        base = [f"{lang}tok{j}" for j in range(25)]
        for v in range(4):
            toks = list(base)
            toks[v] = f"{lang}alt{v}"
            docs.append((("en" == lang) * 100 + v, lang, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    lang_of = {i: l for i, l, _ in docs}
    for fn, kw in ((simhash_near_dups, dict(max_hamming=20)),
                   (ngram_jaccard_pairs, dict(threshold=0.1)),
                   (minhash_lsh_pairs, dict(threshold=0.1))):
        pairs = fn(df, shard_cols=["lang"], **kw).collect()
        assert pairs, fn.__name__
        assert all(lang_of[r["id_a"]] == lang_of[r["id_b"]] for r in pairs), fn.__name__
        # per-shard parity with the unsharded operator
        en_only = df.where(F.col("lang") == "en")
        solo = {(r["id_a"], r["id_b"]) for r in fn(en_only, **kw).collect()}
        sharded_en = {(r["id_a"], r["id_b"]) for r in pairs
                      if lang_of[r["id_a"]] == "en"}
        assert sharded_en == solo, fn.__name__
