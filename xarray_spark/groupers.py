"""Grouper objects (reference: xarray/groupers.py).

Each grouper turns a column into a group-key Column expression — the
Spark analogue of xarray's factorize step (xarray/core/groupby.py:289
ResolvedGrouper).  Keys stay JVM-side expressions so groupBy gets full
codegen + partial aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class Grouper:
    def key_expr(self, col: Column) -> Column:
        raise NotImplementedError


@dataclass
class UniqueGrouper(Grouper):
    """Group by unique values (xarray/groupers.py:210)."""

    labels: Sequence | None = None

    def key_expr(self, col: Column) -> Column:
        return col


@dataclass
class BinGrouper(Grouper):
    """pandas.cut semantics: right-closed intervals (xarray/groupers.py:344).

    The bin edges are a small literal list → a CASE chain, fully
    codegen'd; no shuffle beyond the groupBy itself.
    """

    bins: Sequence[float] = field(default_factory=list)
    labels: Sequence | None = None
    right: bool = True
    include_lowest: bool = False
    precision: int = 3
    duplicates: str = "raise"

    def key_expr(self, col: Column) -> Column:
        edges = list(self.bins)
        if len(set(edges)) < len(edges):
            # pandas.cut duplicates= policy: raise on repeated edges
            # unless duplicates='drop' collapses them
            if self.duplicates == "drop":
                edges = sorted(set(edges))
            else:
                raise ValueError(
                    "Bin edges must be unique. You can drop duplicate "
                    "edges by setting the 'duplicates' kwarg")
        if self.labels is not None:
            labels = list(self.labels)
            if len(labels) != len(edges) - 1:
                # pandas.cut parity: labels must match the (deduped)
                # bin count exactly
                raise ValueError(
                    f"Bin labels must be one fewer than the number of "
                    f"bin edges: {len(labels)} labels for "
                    f"{len(edges)} edges")
        else:
            # pandas renders interval labels at precision=3 and shows
            # include_lowest as the -0.1%-adjusted first edge; derive
            # them from pandas itself (empty cut) so text matches
            # cut() bit-for-bit.  Membership below uses the TRUE edges.
            import pandas as pd
            cats = pd.cut(pd.Series([], dtype="float64"), bins=edges,
                          right=self.right, precision=self.precision,
                          include_lowest=self.include_lowest).cat.categories
            labels = [str(c) for c in cats]
        expr = F.lit(None).cast("string")
        chain = None
        for i in range(len(edges) - 1):
            lo, hi = edges[i], edges[i + 1]
            if self.right:
                closed_lo = (col >= F.lit(lo)) if (i == 0 and self.include_lowest) else (col > F.lit(lo))
                cond = closed_lo & (col <= F.lit(hi))
            else:
                cond = (col >= F.lit(lo)) & (col < F.lit(hi))
            label = labels[i]
            chain = F.when(cond, F.lit(label)) if chain is None else chain.when(cond, F.lit(label))
        return chain.otherwise(expr) if chain is not None else expr


@dataclass
class EncodedGroups(Grouper):
    """Precomputed integer codes → labels (reference xarray/groupers.py:78
    EncodedGroups).

    The grouped-by column already holds the integer codes of an earlier
    factorization (e.g. a dictionary-encoded parquet column or the
    output of an upstream pipeline stage); ``labels[i]`` names code
    ``i``.  The mapping compiles to one ``element_at`` against a
    literal array — fully codegen'd, no join.

    The reference's ``-1`` sentinel ("in no group") maps to a null key;
    Spark's groupBy keeps a null-key group where the reference omits
    it, so drop it (``where(key.isNotNull())``) when exact parity
    matters — the differential test does exactly that.
    """

    labels: Sequence = field(default_factory=list)

    def key_expr(self, col: Column) -> Column:
        arr = F.array(*[F.lit(lab) for lab in self.labels])
        code = col.cast("int")
        return F.when(
            (code >= 0) & (code < F.lit(len(self.labels))),
            F.element_at(arr, code + 1),
        )


# pandas-style frequency aliases → (date_trunc unit, None) or special
_TRUNC = {
    "S": "second", "s": "second",
    "T": "minute", "min": "minute",
    "H": "hour", "h": "hour",
    "D": "day", "d": "day",
    "W": "week",
    "MS": "month", "M": "month", "ME": "month",
    "QS": "quarter", "Q": "quarter", "QE": "quarter",
    "YS": "year", "Y": "year", "YE": "year", "AS": "year", "A": "year",
}


def _parse_freq(freq: str) -> tuple[int, str]:
    i = 0
    while i < len(freq) and freq[i].isdigit():
        i += 1
    n = int(freq[:i]) if i else 1
    unit = freq[i:]
    return n, unit


def _offset_seconds(off) -> int:
    """Bin-origin offset → whole seconds (pandas offset string,
    timedelta, or pd.Timedelta)."""
    if off is None:
        return 0
    import pandas as pd
    return int(pd.Timedelta(off).total_seconds())


#: units whose pandas spelling anchors bins/labels at the period END
_END_ANCHORED = ("ME", "QE", "YE")


@dataclass
class TimeResampler(Grouper):
    """Time-frequency resampling (xarray/groupers.py:474).

    Single-unit frequencies map to ``date_trunc`` (codegen'd); multiples
    map to epoch-arithmetic tumbling windows, the same binning
    ``F.window`` produces but keeping the window *start* as the label
    (pandas/xarray resample label convention, closed='left').

    ``closed``/``label``/``offset`` mirror the reference TimeResampler
    params: fixed-width units (s/min/h/D) honor all three exactly;
    end-anchored spellings (ME/QE/YE) default to closed/label='right'
    with month-end labels.  'W'/'W-XXX' are pandas ANCHORED weeks
    (right-closed at end-of-anchor-day, labeled by the anchor date;
    'W' == 'W-SUN' — fixed round 6, was ISO Mon-Sun); modifiers on W
    raise; multi-week 'nW' keeps epoch-tumbling windows.
    """

    freq: str = "D"
    closed: str | None = None
    label: str | None = None
    offset: str | None = None

    def key_expr(self, col: Column) -> Column:
        n, unit = _parse_freq(self.freq)
        week_anchor = 1  # pandas 'W' == 'W-SUN'
        if unit.upper().startswith("W-"):
            week_anchor = {"SUN": 1, "MON": 2, "TUE": 3, "WED": 4,
                           "THU": 5, "FRI": 6, "SAT": 7}[unit[2:].upper()]
            unit = "W"
        trunc = _TRUNC.get(unit)
        if trunc is None:
            raise ValueError(f"unsupported resample freq {self.freq!r}")
        end_anchored = unit in _END_ANCHORED
        closed = self.closed or ("right" if end_anchored else "left")
        label = self.label or ("right" if end_anchored else "left")
        mods = (closed != "left") or (label != "left") or self.offset
        if trunc in ("month", "quarter", "year"):
            if self.offset:
                raise NotImplementedError("offset on calendar-unit freqs")
            months = {"month": 1, "quarter": 3, "year": 12}[trunc] * n
            m0 = (F.year(col) * 12 + F.month(col) - 1)
            start = F.floor(m0 / months) * months
            start_date = F.make_date(
                (start / 12).cast("int"), (start % 12 + 1).cast("int"), F.lit(1))
            # pandas end-anchored bins are plain calendar-block
            # membership (the whole last day included; the next block
            # starts exactly at its first midnight) — only the LABEL
            # moves to the block end
            if label == "right":
                return F.last_day(F.add_months(start_date, months - 1)) \
                        .cast("timestamp")
            return start_date.cast("timestamp")
        if trunc == "week":
            if mods:
                raise NotImplementedError(
                    "closed/label/offset on weekly freqs")
            if n == 1:
                # pandas anchored weeks (wave-30 diff find; 'W' ==
                # 'W-SUN'): every timestamp whose DATE is ≤ the next
                # anchor day belongs to that anchor's bin, labeled by
                # the anchor date — right-closed at end-of-anchor-day.
                # Spark dayofweek: 1=Sunday … 7=Saturday.
                off = (F.lit(week_anchor) - F.dayofweek(col) + 7) % 7
                return F.date_add(F.to_date(col), off.cast("int")) \
                        .cast("timestamp")
        elif n == 1 and not mods:
            return F.date_trunc(trunc, col)
        secs = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
                "week": 604800}[trunc] * n
        off = _offset_seconds(self.offset)
        e = F.unix_timestamp(col) - F.lit(off)
        if closed == "right":
            # bin is (start, start+secs]: a point ON the edge stays left
            start = (F.ceil(e / F.lit(float(secs))) * secs) - secs
        else:
            start = F.floor(e / secs) * secs
        lab = start + F.lit(secs if label == "right" else 0) + F.lit(off)
        return F.timestamp_seconds(lab)


_SEASON_OF_MONTH = {
    12: "DJF", 1: "DJF", 2: "DJF",
    3: "MAM", 4: "MAM", 5: "MAM",
    6: "JJA", 7: "JJA", 8: "JJA",
    9: "SON", 10: "SON", 11: "SON",
}


@dataclass
class SeasonGrouper(Grouper):
    """Meteorological seasons incl. cross-year DJF
    (xarray/groupers.py:801)."""

    seasons: Sequence[str] = ("DJF", "MAM", "JJA", "SON")

    def key_expr(self, col: Column) -> Column:
        m = F.month(col)
        chain = None
        for month, season in _SEASON_OF_MONTH.items():
            cond = m == F.lit(month)
            chain = F.when(cond, F.lit(season)) if chain is None else chain.when(cond, F.lit(season))
        return chain


@dataclass
class SeasonResampler(Grouper):
    """Season-resampling with the cross-year convention
    (xarray/groupers.py:874): December belongs to the FOLLOWING year's
    DJF, so the key is 'YYYY-DJF' with Dec year-shifted by +1."""

    seasons: Sequence[str] = ("DJF", "MAM", "JJA", "SON")

    def key_expr(self, col: Column) -> Column:
        season = SeasonGrouper().key_expr(col)
        y = F.year(col) + F.when(F.month(col) == 12, F.lit(1)).otherwise(F.lit(0))
        return F.concat_ws("-", y.cast("string"), season)
