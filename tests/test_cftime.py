"""cftime-style encoded calendars (xarray/coding/cftime_offsets.py,
calendar_ops.py): ordinal encode/decode, field arithmetic, date ranges,
and convert_calendar across representations."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from xarray_spark import XDataset
from xarray_spark import cftime as cft
from xarray_spark.computation import convert_calendar


def test_ordinal_roundtrip_fields(spark):
    # every (y, m, d) in a sample grid roundtrips through the ordinal
    rows = []
    for cal, mdays in (("360_day", 30), ("noleap", 28), ("all_leap", 29)):
        for y in (1969, 1970, 2000, 2003):
            for m in (1, 2, 6, 12):
                for d in (1, 15, mdays):
                    rows.append((cal, y, m, d))
    df = spark.createDataFrame(rows, ["cal", "y", "m", "d"])
    for cal in ("360_day", "noleap", "all_leap"):
        sub = df.where(F.col("cal") == cal)
        enc = sub.withColumn("o", cft.cf_ordinal(F.col("y"), F.col("m"), F.col("d"), cal))
        dec = enc.select(
            "y", "m", "d",
            cft.cf_field(F.col("o"), "year", cal).alias("y2"),
            cft.cf_field(F.col("o"), "month", cal).alias("m2"),
            cft.cf_field(F.col("o"), "day", cal).alias("d2"),
        )
        bad = dec.where(
            (F.col("y") != F.col("y2")) | (F.col("m") != F.col("m2"))
            | (F.col("d") != F.col("d2"))
        )
        assert bad.count() == 0, cal


def test_360day_feb30_exists(spark):
    # 1970-02-30 is a real 360_day date: ordinal 59
    row = spark.range(1).select(
        cft.cf_ordinal(F.lit(1970), F.lit(2), F.lit(30), "360_day").alias("o")
    ).collect()[0]
    assert row["o"] == 59


def test_cf_date_range_daily_and_monthly(spark):
    r = cft.cf_date_range(spark, "2000-01-01", "2000-12-30", "D", "360_day")
    assert r.count() == 360
    r2 = cft.cf_date_range(spark, "2000-01-01", "2001-12-01", "MS", "noleap")
    months = r2.select(cft.cf_field(F.col("time"), "month", "noleap").alias("m")).collect()
    assert len(months) == 24
    days = r2.select(cft.cf_field(F.col("time"), "day", "noleap").alias("d")).distinct().collect()
    assert [r["d"] for r in days] == [1]


def test_convert_real_to_360day_date_alignment(spark):
    rows = [(dt.datetime(2000, 1, 30) + dt.timedelta(days=i), float(i))
            for i in range(3)]  # Jan 30, 31, Feb 1
    ds = XDataset(spark.createDataFrame(rows, ["t", "v"]), dims=["t"])
    out = convert_calendar(ds, "t", "360_day", use_cftime=True)
    got = sorted(r["t"] for r in out.df.collect())
    # Jan 31 dropped; Jan 30 -> ordinal for 2000-01-30; Feb 1 -> 2000-02-01
    o_jan30 = cft._py_ordinal(2000, 1, 30, "360_day")
    o_feb1 = cft._py_ordinal(2000, 2, 1, "360_day")
    assert got == [o_jan30, o_feb1]
    assert out.attrs["calendar"] == "360_day"


def test_convert_year_alignment_keeps_all_rows(spark):
    rows = [(dt.datetime(2000, 12, 31), 1.0), (dt.datetime(2000, 2, 29), 2.0)]
    ds = XDataset(spark.createDataFrame(rows, ["t", "v"]), dims=["t"])
    out = convert_calendar(ds, "t", "360_day", align_on="year", use_cftime=True)
    assert out.df.count() == 2  # proportional mapping never drops


def test_convert_encoded_to_encoded_and_back_to_real(spark):
    # noleap 2001-03-01 -> 360_day same (y,m,d) -> real timestamp
    o = cft._py_ordinal(2001, 3, 1, "noleap")
    ds = XDataset(spark.createDataFrame([(o, 1.0)], ["t", "v"]), dims=["t"],
                  attrs={"calendar": "noleap"})
    enc2 = convert_calendar(ds, "t", "360_day", use_cftime=True)
    assert enc2.df.collect()[0]["t"] == cft._py_ordinal(2001, 3, 1, "360_day")
    real = convert_calendar(enc2, "t", "standard")
    ts = real.df.collect()[0]["t"]
    assert (ts.year, ts.month, ts.day) == (2001, 3, 1)
    assert "calendar" not in (real.attrs or {})


def test_decode_cf_time_360day(spark):
    # 'days since 2000-01-01' in 360_day: value 59 = 2000-02-30
    df = spark.createDataFrame([(59.0,)], ["time"])
    out = df.select(cft.decode_cf_time(F.col("time"), "days since 2000-01-01", "360_day").alias("o"))
    o = out.collect()[0]["o"]
    assert cft._py_ordinal(2000, 2, 30, "360_day") == o
