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


def test_us_ordinal_fields_and_roundtrip(spark):
    # 360_day 2000-02-30 13:45:30.250000
    day = cft._py_ordinal(2000, 2, 30, "360_day")
    us = day * cft.US_PER_DAY + (13 * 3600 + 45 * 60 + 30) * 1_000_000 + 250_000
    df = spark.createDataFrame([(us,)], "o long")
    got = df.select(
        *[cft.cf_field_us(F.col("o"), f, "360_day").alias(f)
          for f in ("year", "month", "day", "hour", "minute", "second",
                    "microsecond")]
    ).collect()[0]
    assert (got["year"], got["month"], got["day"]) == (2000, 2, 30)
    assert (got["hour"], got["minute"], got["second"], got["microsecond"]) == \
        (13, 45, 30, 250_000)
    # cf_ordinal_us reconstructs the same instant
    back = df.select(
        cft.cf_ordinal_us(F.lit(2000), F.lit(2), F.lit(30), "360_day",
                          hour=F.lit(13), minute=F.lit(45), second=F.lit(30),
                          microsecond=F.lit(250_000)).alias("o2")
    ).collect()[0]["o2"]
    assert back == us


def test_us_pre_epoch_floor_and_weekday(spark):
    # 1969-12-31 23:00 noleap = ordinal -1 day + 23h -> day field must
    # floor to Dec 31, not round toward zero
    us = -1 * cft.US_PER_DAY + 23 * 3_600_000_000
    df = spark.createDataFrame([(us,)], "o long")
    got = df.select(
        cft.cf_field_us(F.col("o"), "year", "noleap").alias("y"),
        cft.cf_field_us(F.col("o"), "month", "noleap").alias("m"),
        cft.cf_field_us(F.col("o"), "day", "noleap").alias("d"),
        cft.cf_field_us(F.col("o"), "hour", "noleap").alias("h"),
    ).collect()[0]
    assert (got["y"], got["m"], got["d"], got["h"]) == (1969, 12, 31, 23)
    # weekday: 1970-01-01 is Thursday (cftime dayofwk 3, 0=Monday)
    wd = spark.createDataFrame([(0,), (1,), (-1,)], "o long").select(
        cft.cf_field(F.col("o"), "weekday", "noleap").alias("w")).collect()
    assert [r["w"] for r in wd] == [3, 4, 2]


def test_decode_cf_time_us_hours_since(spark):
    # 'hours since 2000-01-01 06:00:00' value 30.5 -> 2000-01-02 12:30
    df = spark.createDataFrame([(30.5,)], "time double")
    out = df.select(cft.decode_cf_time_us(
        F.col("time"), "hours since 2000-01-01 06:00:00", "noleap").alias("o"))
    o = out.collect()[0]["o"]
    want = (cft._py_ordinal(2000, 1, 2, "noleap") * cft.US_PER_DAY
            + (12 * 3600 + 30 * 60) * 1_000_000)
    assert o == want
    assert spark.range(1).select(
        cft.cf_field_us(F.lit(o), "hour", "noleap").alias("h")
    ).collect()[0]["h"] == 12


def test_us_timestamp_bridge_and_convert(spark):
    import datetime as dt
    ts = dt.datetime(2001, 3, 1, 7, 30, 15, 123456)
    df = spark.createDataFrame([(ts,)], ["t"])
    enc = df.select(cft.encode_timestamp_us(F.col("t"), "noleap").alias("o"))
    o = enc.collect()[0]["o"]
    assert o == (cft._py_ordinal(2001, 3, 1, "noleap") * cft.US_PER_DAY
                 + (7 * 3600 + 30 * 60 + 15) * 1_000_000 + 123456)
    back = enc.select(cft.decode_to_timestamp_us(F.col("o"), "noleap").alias("t"))
    assert back.collect()[0]["t"] == ts
    # convert noleap -> 360_day keeps the intraday part
    conv = enc.select(cft.convert_between_us(F.col("o"), "noleap", "360_day").alias("o2"))
    o2 = conv.collect()[0]["o2"]
    assert o2 == (cft._py_ordinal(2001, 3, 1, "360_day") * cft.US_PER_DAY
                  + (7 * 3600 + 30 * 60 + 15) * 1_000_000 + 123456)
    # days_in_month field
    dim = enc.select(cft.cf_field_us(F.col("o"), "days_in_month", "noleap").alias("n"))
    assert dim.collect()[0]["n"] == 31
