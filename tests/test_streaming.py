"""Structured Streaming extension tests — file-source micro-batches
driven with trigger(availableNow) into a memory sink."""

import datetime as dt
import shutil
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xarray_spark.streaming import (
    open_stream,
    stream_ewma,
    stream_resample,
    stream_rolling_mean,
)

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("key", T.StringType()),
    T.StructField("v", T.DoubleType()),
])


@pytest.fixture()
def stream_dir(spark, tmp_path):
    path = str(tmp_path / "in")
    rows = [
        (dt.datetime(2024, 1, 1, 0, m), "a", float(m)) for m in range(10)
    ] + [
        (dt.datetime(2024, 1, 1, 0, m), "b", float(2 * m)) for m in range(10)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(path)
    return path


def _run_to_memory(df, name, mode="append"):
    # aggregations use "complete": with availableNow the watermark never
    # passes the final windows, so "append" would hold them back
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_resample(spark, stream_dir):
    src = open_stream(spark, stream_dir, SCHEMA)
    out = stream_resample(
        src, "ts", "5min", {"n": F.count(F.lit(1)), "total": F.sum("v")},
        watermark="10 minutes", keys=["key"],
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="complete")
    got = {
        (r["key"], r["ts"].minute): (r["n"], r["total"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # 0-4 and 5-9 buckets per key
    assert got[("a", 0)] == (5, 10.0)   # 0+1+2+3+4
    assert got[("a", 5)] == (5, 35.0)   # 5+..+9
    assert got[("b", 5)] == (5, 70.0)


def test_stream_rolling_mean(spark, stream_dir):
    src = open_stream(spark, stream_dir, SCHEMA)
    out = stream_rolling_mean(
        src, "ts", window="10min", slide="5min", value_cols=["v"],
        watermark="10 minutes", keys=["key"],
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="complete")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {(r["key"], r["ts"].strftime("%H:%M")): r["v_mean"] for r in rows}
    # the window covering 00:00-00:10 for key a holds 0..9 → mean 4.5
    assert got[("a", "00:00")] == 4.5


def test_stream_ewma_state(spark, stream_dir):
    src = open_stream(spark, stream_dir, SCHEMA)
    out = stream_ewma(src, "key", "ts", "v", alpha=0.5)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name)
    rows = spark.sql(f"SELECT * FROM {name} WHERE key = 'a' ORDER BY ts").collect()
    assert len(rows) == 10
    # recursion: e0=0, e1=.5*1+.5*0=0.5, e2=.5*2+.5*.5=1.25
    assert rows[0]["ewma"] == 0.0
    assert rows[1]["ewma"] == 0.5
    assert rows[2]["ewma"] == 1.25


def test_stream_dedup_exact(spark, tmp_path):
    from xarray_spark.streaming import open_stream, stream_dedup_exact
    path = str(tmp_path / "dup_in")
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0), "k1", 1.0),
        (dt.datetime(2024, 1, 1, 0, 1), "k1", 1.0),   # duplicate key
        (dt.datetime(2024, 1, 1, 0, 2), "k2", 2.0),
        (dt.datetime(2024, 1, 1, 0, 3), "k2", 2.0),   # duplicate key
        (dt.datetime(2024, 1, 1, 0, 4), "k3", 3.0),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(path)
    src = open_stream(spark, path, SCHEMA)
    out = stream_dedup_exact(src, ["key"], "ts", watermark="10 minutes")
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    got = sorted(r["key"] for r in spark.sql(f"SELECT * FROM {name}").collect())
    assert got == ["k1", "k2", "k3"]


def test_stream_asof_join(spark, tmp_path):
    from xarray_spark.streaming import stream_asof_join
    obs_dir, tgt_dir = str(tmp_path / "obs"), str(tmp_path / "tgt")
    obs_rows = [
        (dt.datetime(2024, 1, 1, 0, 0), "a", 10.0),
        (dt.datetime(2024, 1, 1, 0, 5), "a", 20.0),
        (dt.datetime(2024, 1, 1, 0, 2), "b", 7.0),
    ]
    # target ticks every 3 minutes
    tgt_rows = [(dt.datetime(2024, 1, 1, 0, m), k, None)
                for m in (0, 3, 6, 9) for k in ("a", "b")]
    spark.createDataFrame(obs_rows, SCHEMA).coalesce(1).write.parquet(obs_dir)
    spark.createDataFrame(tgt_rows, SCHEMA).coalesce(1).write.parquet(tgt_dir)
    out = stream_asof_join(
        open_stream(spark, obs_dir, SCHEMA),
        open_stream(spark, tgt_dir, SCHEMA).select("ts", "key"),
        key_col="key", time_col="ts", value_cols=["v"],
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name)
    got = {(r["key"], r["ts"].minute): r["v"]
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got[("a", 0)] == 10.0      # exact-ts obs folds first
    assert got[("a", 3)] == 10.0
    assert got[("a", 6)] == 20.0
    assert got[("a", 9)] == 20.0
    assert got[("b", 0)] is None      # no obs yet
    assert got[("b", 3)] == 7.0
    assert got[("b", 9)] == 7.0


def test_stream_asof_join_tolerance_and_state(spark, tmp_path):
    from xarray_spark.streaming import stream_asof_join
    obs_dir, tgt_dir = str(tmp_path / "obs"), str(tmp_path / "tgt")
    spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0), "a", 5.0)], SCHEMA
    ).coalesce(1).write.parquet(obs_dir)
    spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 2), "a", None),
         (dt.datetime(2024, 1, 1, 0, 30), "a", None)], SCHEMA
    ).coalesce(1).write.parquet(tgt_dir)
    out = stream_asof_join(
        open_stream(spark, obs_dir, SCHEMA),
        open_stream(spark, tgt_dir, SCHEMA).select("ts", "key"),
        key_col="key", time_col="ts", value_cols=["v"],
        tolerance=600.0,  # 10 minutes
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name)
    got = {r["ts"].minute: r["v"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got[2] == 5.0
    assert got[30] is None  # beyond tolerance -> null, not stale value
