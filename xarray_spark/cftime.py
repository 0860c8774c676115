"""cftime-style non-real calendars (reference: xarray/coding/cftime_offsets.py,
coding/calendar_ops.py, coding/times.py:1355).

The reference holds 360_day / noleap / all_leap dates as cftime objects —
a Python object dtype Spark has no column type for.  The engine's
representation is an **int64 ordinal: days since 1970-01-01 IN THAT
CALENDAR** (so 1970-02-30 exists in 360_day as ordinal 59), carried in a
plain long column with the calendar name in the dataset/variable attrs.
Every field extraction and conversion below is pure integer arithmetic —
whole-stage-codegen expressions, no Python, no objects — which is the
only representation that stays JVM-side at 100 TB.

Calendars:
- ``360_day``:  12 × 30-day months, year = 360 days.
- ``noleap`` / ``365_day``: Gregorian month lengths, never a Feb 29.
- ``all_leap`` / ``366_day``: always a Feb 29.
- ``standard`` / ``proleptic_gregorian``: real timestamps (not encoded
  here — convert_calendar bridges the two worlds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_YEAR = 1970

_NOLEAP_CUM = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]
_ALLLEAP_CUM = [0, 31, 60, 91, 121, 152, 182, 213, 244, 274, 305, 335]

_YEAR_LEN = {"360_day": 360, "noleap": 365, "365_day": 365,
             "all_leap": 366, "366_day": 366}

REAL_CALENDARS = ("standard", "gregorian", "proleptic_gregorian")


def _canon(calendar: str) -> str:
    return {"365_day": "noleap", "366_day": "all_leap"}.get(calendar, calendar)


def _cum_days(calendar: str) -> list[int]:
    return _NOLEAP_CUM if _canon(calendar) == "noleap" else _ALLLEAP_CUM


def year_length(calendar: str) -> int:
    return _YEAR_LEN[calendar]


# --------------------------------------------------------------------- #
# encode / decode: (year, month, day) <-> ordinal, all expressions
# --------------------------------------------------------------------- #

def cf_ordinal(year: Column, month: Column, day: Column, calendar: str) -> Column:
    """Days since 1970-01-01 in ``calendar`` — from integer field
    columns.  Closed-form for 360_day; a 12-branch CASE (constant-folded
    per month) for the fixed-month-table calendars."""
    cal = _canon(calendar)
    y = year.cast("long") - EPOCH_YEAR
    if cal == "360_day":
        return y * 360 + (month.cast("long") - 1) * 30 + (day.cast("long") - 1)
    cum = _cum_days(cal)
    month_off = F.element_at(F.array(*[F.lit(c) for c in cum]), month.cast("int"))
    return y * _YEAR_LEN[cal] + month_off.cast("long") + (day.cast("long") - 1)


def cf_field(ordinal: Column, field: str, calendar: str) -> Column:
    """year / month / day / dayofyear from an encoded ordinal — integer
    arithmetic only (floor division handles pre-1970 ordinals)."""
    cal = _canon(calendar)
    ylen = _YEAR_LEN[cal]
    o = ordinal.cast("long")
    y = F.floor(o / ylen).cast("long")
    doy = (o - y * ylen).cast("int")  # 0-based day of year
    if field == "year":
        return (y + EPOCH_YEAR).cast("int")
    if field == "dayofyear":
        return doy + 1
    if field in ("weekday", "dayofweek"):
        # continuous 7-day cycle in every fixed calendar (cftime dayofwk
        # semantics, 0 = Monday); 1970-01-01 was a Thursday
        return (((o + 3) % 7 + 7) % 7).cast("int")
    if cal == "360_day":
        if field == "month":
            return (F.floor(doy / 30) + 1).cast("int")
        if field == "day":
            return (doy % 30 + 1).cast("int")
        if field == "days_in_month":
            return F.lit(30).cast("int")
    else:
        cum = _cum_days(cal)
        # month = number of cum entries <= doy (12-branch sum, codegen'd)
        month = sum(
            (doy >= F.lit(c)).cast("int") for c in cum[1:]
        ) + F.lit(1)
        if field == "month":
            return month.cast("int")
        if field == "day":
            month_off = F.element_at(F.array(*[F.lit(c) for c in cum]), month)
            return (doy - month_off + 1).cast("int")
        if field == "days_in_month":
            lens = _cum_days(cal) + [ylen]
            month_len = [lens[i + 1] - lens[i] for i in range(12)]
            return F.element_at(F.array(*[F.lit(x) for x in month_len]), month).cast("int")
    raise ValueError(f"field {field!r}")


# --------------------------------------------------------------------- #
# microsecond-grain ordinals (sub-daily cftime)
# --------------------------------------------------------------------- #

US_PER_DAY = 86_400_000_000

_US_PER_UNIT = {
    "days": US_PER_DAY, "hours": 3_600_000_000, "minutes": 60_000_000,
    "seconds": 1_000_000, "milliseconds": 1_000, "microseconds": 1,
}


def cf_ordinal_us(year: Column, month: Column, day: Column, calendar: str,
                  hour: Column | None = None, minute: Column | None = None,
                  second: Column | None = None,
                  microsecond: Column | None = None) -> Column:
    """Microseconds since 1970-01-01T00:00:00 in ``calendar`` — the
    sub-daily extension of :func:`cf_ordinal`.  int64 spans ±292k years
    at this grain; still pure integer expressions."""
    o = cf_ordinal(year, month, day, calendar).cast("long") * US_PER_DAY
    for part, scale in ((hour, 3_600_000_000), (minute, 60_000_000),
                        (second, 1_000_000), (microsecond, 1)):
        if part is not None:
            o = o + part.cast("long") * scale
    return o


def cf_field_us(ordinal_us: Column, field: str, calendar: str) -> Column:
    """Field extraction from a microsecond-grain ordinal: date fields
    delegate to :func:`cf_field` on the floored day ordinal; time-of-day
    fields are modular arithmetic on the intraday remainder."""
    o = ordinal_us.cast("long")
    day_ord = F.floor(o / US_PER_DAY).cast("long")
    intra = o - day_ord * US_PER_DAY  # always in [0, US_PER_DAY)
    if field == "hour":
        return F.floor(intra / 3_600_000_000).cast("int")
    if field == "minute":
        return (F.floor(intra / 60_000_000) % 60).cast("int")
    if field == "second":
        return (F.floor(intra / 1_000_000) % 60).cast("int")
    if field == "microsecond":
        return (intra % 1_000_000).cast("int")
    return cf_field(day_ord, field, calendar)


def day_ordinal_us(ordinal_us: Column) -> Column:
    """Day-grain ordinal from a microsecond-grain one (floor division
    keeps pre-epoch instants on the correct day)."""
    return F.floor(ordinal_us.cast("long") / US_PER_DAY).cast("long")


def decode_cf_time_us(col: Column, units: str, calendar: str) -> Column:
    """CF time decode preserving sub-daily precision: returns the
    microsecond-grain ordinal (:func:`decode_cf_time` floors to days).
    Handles fractional numeric values ('hours since ...' stored as
    double)."""
    cal = _canon(calendar)
    unit, _, epoch = units.partition(" since ")
    unit = unit.strip().lower()
    per = _US_PER_UNIT[unit]
    parts = epoch.strip().split(" ")
    ey, em, ed = (int(x) for x in parts[0].split("-"))
    base = _py_ordinal(ey, em, ed, cal) * US_PER_DAY
    if len(parts) > 1:
        hh, mm, *rest = parts[1].split(":")
        ss = float(rest[0]) if rest else 0.0
        base += (int(hh) * 3600 + int(mm) * 60) * 1_000_000 + int(round(ss * 1e6))
    return (F.round(col.cast("double") * per).cast("long") + F.lit(base))


def encode_timestamp_us(ts: Column, calendar: str,
                        align_on: str = "date") -> Column:
    """Real timestamp -> microsecond-grain ordinal (time of day
    preserved; date mapping as in :func:`encode_timestamp`)."""
    day = encode_timestamp(ts, calendar, align_on)
    intra = (
        F.hour(ts).cast("long") * 3_600_000_000
        + F.minute(ts).cast("long") * 60_000_000
        + F.second(ts).cast("long") * 1_000_000
        + (F.unix_micros(ts) % 1_000_000 + 1_000_000) % 1_000_000
    )
    return day.cast("long") * US_PER_DAY + intra


def decode_to_timestamp_us(ordinal_us: Column, calendar: str,
                           align_on: str = "date") -> Column:
    """Microsecond-grain ordinal -> real timestamp with time of day."""
    day_ord = day_ordinal_us(ordinal_us)
    intra = ordinal_us.cast("long") - day_ord * US_PER_DAY
    base = decode_to_timestamp(day_ord, calendar, align_on)
    return F.timestamp_micros(F.unix_micros(base) + intra)


def convert_between_us(ordinal_us: Column, src: str, dst: str) -> Column:
    """Sub-daily calendar-to-calendar conversion: date part remapped via
    :func:`convert_between`, intraday microseconds carried over."""
    day_ord = day_ordinal_us(ordinal_us)
    intra = ordinal_us.cast("long") - day_ord * US_PER_DAY
    return convert_between(day_ord, src, dst) * US_PER_DAY + intra


# --------------------------------------------------------------------- #
# ranges
# --------------------------------------------------------------------- #

def cf_date_range(spark: SparkSession, start: str, end: str, freq: str = "D",
                  calendar: str = "noleap", name: str = "time") -> DataFrame:
    """Encoded-ordinal label table for a non-real calendar
    (xarray/coding/cftime_offsets.py date_range with calendar=...).

    'D'/'nD' step in days; 'MS' steps month starts (exact in every
    calendar here because month lengths are data-independent).  One
    ``sequence()`` expression — no driver loop.
    """
    cal = _canon(calendar)
    sy, sm, sd = (int(x) for x in start.split("-"))
    ey, em, ed = (int(x) for x in end.split("-"))
    lo = _py_ordinal(sy, sm, sd, cal)
    hi = _py_ordinal(ey, em, ed, cal)
    if freq.endswith("D"):
        step = int(freq[:-1] or 1)
        return spark.range(1).select(
            F.explode(F.sequence(F.lit(lo), F.lit(hi), F.lit(step))).alias(name)
        )
    if freq == "MS":
        mi_lo = (sy - EPOCH_YEAR) * 12 + (sm - 1)
        mi_hi = (ey - EPOCH_YEAR) * 12 + (em - 1)
        mi = F.explode(F.sequence(F.lit(mi_lo), F.lit(mi_hi), F.lit(1))).alias("__mi")
        yy = F.floor(F.col("__mi") / 12).cast("long")
        mm = (F.col("__mi") - yy * 12 + 1).cast("int")
        return spark.range(1).select(mi).select(
            cf_ordinal(yy + EPOCH_YEAR, mm, F.lit(1), cal).alias(name)
        )
    raise NotImplementedError(f"cf_date_range freq {freq!r}")


def _py_ordinal(y: int, m: int, d: int, calendar: str) -> int:
    cal = _canon(calendar)
    if cal == "360_day":
        return (y - EPOCH_YEAR) * 360 + (m - 1) * 30 + (d - 1)
    return (y - EPOCH_YEAR) * _YEAR_LEN[cal] + _cum_days(cal)[m - 1] + (d - 1)


# --------------------------------------------------------------------- #
# conversions (xarray/coding/calendar_ops.py convert_calendar)
# --------------------------------------------------------------------- #

def encode_timestamp(ts: Column, calendar: str, align_on: str = "date") -> Column:
    """Real timestamp -> encoded ordinal.

    align_on='date': same (y, m, d); dates that don't exist in the
    target (Feb 29 -> noleap; day 31 / Feb 29 -> 360_day) become null —
    the caller drops or fills them (xarray's `missing` handling).
    align_on='year': map day-of-year proportionally
    (xarray calendar_ops.py:291 _interpolate_day_of_year) — every source
    date lands on a valid target date.
    """
    cal = _canon(calendar)
    y, m, d = F.year(ts), F.month(ts), F.dayofmonth(ts)
    if align_on == "date":
        ok = _valid_date(y, m, d, cal)
        return F.when(ok, cf_ordinal(y, m, d, cal))
    if align_on == "year":
        src_len = F.when(
            ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0), F.lit(366)
        ).otherwise(F.lit(365))
        doy = F.dayofyear(ts) - 1
        tlen = _YEAR_LEN[cal]
        tdoy = F.floor(doy * tlen / src_len).cast("long")
        return (y.cast("long") - EPOCH_YEAR) * tlen + tdoy
    raise ValueError(f"align_on {align_on!r}")


def decode_to_timestamp(ordinal: Column, calendar: str,
                        align_on: str = "date") -> Column:
    """Encoded ordinal -> real timestamp (null where the target date
    doesn't exist in Gregorian under align_on='date': Feb 30)."""
    cal = _canon(calendar)
    y = cf_field(ordinal, "year", cal)
    if align_on == "date":
        m = cf_field(ordinal, "month", cal)
        d = cf_field(ordinal, "day", cal)
        return F.try_to_timestamp(
            F.concat_ws("-", y.cast("string"),
                        F.lpad(m.cast("string"), 2, "0"),
                        F.lpad(d.cast("string"), 2, "0"))
        )
    if align_on == "year":
        tlen = _YEAR_LEN[cal]
        doy = cf_field(ordinal, "dayofyear", cal) - 1
        leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
        dst_len = F.when(leap, F.lit(366)).otherwise(F.lit(365))
        tdoy = F.floor(doy * dst_len / tlen).cast("int")
        jan1 = F.to_timestamp(F.concat(y.cast("string"), F.lit("-01-01")))
        return F.timestamp_seconds(F.unix_timestamp(jan1) + tdoy.cast("long") * 86400)
    raise ValueError(f"align_on {align_on!r}")


def _valid_date(y: Column, m: Column, d: Column, cal: str) -> Column:
    if cal == "360_day":
        return d <= 30
    if cal == "noleap":
        return ~((m == 2) & (d == 29))
    return F.lit(True)  # all_leap: every Gregorian date exists


def convert_between(ordinal: Column, src: str, dst: str) -> Column:
    """Encoded -> encoded via (y, m, d) with align_on='date' semantics
    (nonexistent target dates -> null)."""
    src, dst = _canon(src), _canon(dst)
    y = cf_field(ordinal, "year", src)
    m = cf_field(ordinal, "month", src)
    d = cf_field(ordinal, "day", src)
    ok = _valid_date(y, m, d, dst)
    return F.when(ok, cf_ordinal(y, m, d, dst))


def decode_cf_time(col: Column, units: str, calendar: str) -> Column:
    """CF time decode for a non-real calendar: '<unit> since <date>'
    where the reference date is IN that calendar — the ubiquitous
    climate-model-output encoding (coding/times.py:1355).  Returns the
    encoded ordinal (long), not a timestamp."""
    cal = _canon(calendar)
    unit, _, epoch = units.partition(" since ")
    unit = unit.strip().lower()
    per_day = {"days": 1.0, "hours": 24.0, "minutes": 1440.0,
               "seconds": 86400.0}[unit]
    ep = epoch.strip().split(" ")[0]
    ey, em, ed = (int(x) for x in ep.split("-"))
    base = _py_ordinal(ey, em, ed, cal)
    return (F.floor(col.cast("double") / per_day) + F.lit(base)).cast("long")


# --------------------------------------------------------------------- #
# CFTimeIndex — driver-side label index over encoded ordinals
# --------------------------------------------------------------------- #

def _py_date(ordinal: int, calendar: str) -> tuple:
    """Inverse of :func:`_py_ordinal`: encoded day ordinal ->
    (year, month, day) in ``calendar`` (floor division keeps pre-epoch
    ordinals exact)."""
    cal = _canon(calendar)
    o = int(ordinal)
    if cal == "360_day":
        y, r = divmod(o, 360)
        return (EPOCH_YEAR + y, r // 30 + 1, r % 30 + 1)
    yl = _YEAR_LEN[cal]
    y, doy = divmod(o, yl)
    cum = _cum_days(cal)
    m = max(i for i in range(12) if cum[i] <= doy)
    return (EPOCH_YEAR + y, m + 1, doy - cum[m] + 1)


class CFTimeIndex:
    """Label index over non-real-calendar dates (the reference's
    ``CFTimeIndex``, xarray/coding/cftimeindex.py:411 — reimplemented
    over the engine's encoded int64 ordinals instead of cftime
    objects; the cftime package is not available in this runtime and
    the ordinal encoding is the engine's documented representation,
    SURVEY §1.3).

    An index is LABEL-SIZED by definition, so this is a plain
    driver-side container: it holds day ordinals + the calendar and
    converts to/from the label tables the distributed plans consume
    (:meth:`to_label_table`, :meth:`from_label_table`)."""

    def __init__(self, values, calendar: str = "noleap",
                 name: str = "time") -> None:
        cal = _canon(calendar)
        if cal not in _YEAR_LEN:
            raise ValueError(
                f"CFTimeIndex holds encoded non-real calendars "
                f"({sorted(_YEAR_LEN)}); use a pandas DatetimeIndex for "
                f"{calendar!r}")
        self.values = [int(v) for v in values]
        self.calendar = calendar
        self.name = name

    # ---- sequence protocol ------------------------------------------ #
    def __len__(self):
        return len(self.values)

    def __iter__(self):
        return iter(self.values)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return CFTimeIndex(self.values[i], self.calendar, self.name)
        return self.values[i]

    def __eq__(self, other):
        return (isinstance(other, CFTimeIndex)
                and self.values == other.values
                and _canon(self.calendar) == _canon(other.calendar))

    def __repr__(self):
        dates = [f"{y:04d}-{m:02d}-{d:02d}"
                 for y, m, d in (self._ymd(v) for v in self.values[:4])]
        tail = ", ..." if len(self.values) > 4 else ""
        return (f"CFTimeIndex([{', '.join(dates)}{tail}], "
                f"calendar={self.calendar!r}, length={len(self)})")

    def _ymd(self, v):
        return _py_date(v, self.calendar)

    # ---- reference surface ------------------------------------------ #
    @property
    def asi8(self):
        """Encoded ordinals as a list of ints (reference asi8 is the
        integer view of the index)."""
        return list(self.values)

    @property
    def year(self):
        return [self._ymd(v)[0] for v in self.values]

    @property
    def month(self):
        return [self._ymd(v)[1] for v in self.values]

    @property
    def day(self):
        return [self._ymd(v)[2] for v in self.values]

    @property
    def dayofyear(self):
        cal = _canon(self.calendar)
        if cal == "360_day":
            return [v % 360 + 1 for v in self.values]
        return [v % _YEAR_LEN[cal] + 1 for v in self.values]

    def strftime(self, fmt: str = "%Y-%m-%d"):
        cal = _canon(self.calendar)
        ylen = 360 if cal == "360_day" else _YEAR_LEN[cal]
        out = []
        for v in self.values:
            y, m, d = self._ymd(v)
            doy = v % ylen + 1
            s = (fmt.replace("%Y", f"{y:04d}").replace("%m", f"{m:02d}")
                 .replace("%d", f"{d:02d}").replace("%j", f"{doy:03d}"))
            out.append(s)
        return out

    def shift(self, periods: int, freq: str = "D") -> "CFTimeIndex":
        """Shift by ``periods`` steps of ``freq`` ('D'/'nD' day steps,
        'MS' month starts) — reference cftimeindex.py:511."""
        if freq.endswith("D"):
            step = int(freq[:-1] or 1) * int(periods)
            return CFTimeIndex([v + step for v in self.values],
                               self.calendar, self.name)
        if freq == "MS":
            out = []
            for v in self.values:
                y, m, _ = self._ymd(v)
                mi = (y - EPOCH_YEAR) * 12 + (m - 1) + int(periods)
                yy, mm = divmod(mi, 12)
                out.append(_py_ordinal(EPOCH_YEAR + yy, mm + 1, 1,
                                       self.calendar))
            return CFTimeIndex(out, self.calendar, self.name)
        raise NotImplementedError(f"shift freq {freq!r}")

    def to_datetimeindex(self):
        """Real pandas DatetimeIndex with the SAME (y, m, d) labels —
        raises on dates the real calendar lacks (noleap has no Feb 29 to
        collide, but 360_day day-30 Februaries do not exist), like the
        reference's unsafe-conversion error."""
        import pandas as pd
        return pd.DatetimeIndex(
            [pd.Timestamp(*self._ymd(v)) for v in self.values],
            name=self.name)

    # ---- engine bridges --------------------------------------------- #
    def to_label_table(self, spark) -> DataFrame:
        """Label-table DataFrame of the ordinals (what sel/reindex/
        resample plans consume)."""
        from xarray_spark._utils import local_df
        return local_df(spark, [(v,) for v in self.values],
                        f"{self.name} long")

    @classmethod
    def from_label_table(cls, df, calendar: str,
                         name: str | None = None) -> "CFTimeIndex":
        """Collect a label table (or a dataset dim column) into an
        index.  Labels are bounded by construction — this is the
        documented label-table-sized driver transfer, not a data
        collect."""
        try:  # accept an XDataset (duck-typed: has .df and .dims)
            inner = df.df
            name = name or df.dims[0]
            df = inner
        except AttributeError:
            name = name or df.columns[0]
        rows = df.select(name).distinct().orderBy(name).collect()
        return cls([r[0] for r in rows], calendar, name)
