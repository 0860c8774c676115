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
    """Group by unique values (xarray/groupers.py:210).

    ``labels`` RESTRICTS grouping to the listed values — unlisted rows
    drop (null key; round-11 find: the field existed but key_expr
    ignored it).  Labels absent from the data crash the reference
    itself (CoordinateValidationError), so there is no absent-label
    semantic to match; the long form simply yields no row for them."""

    labels: Sequence | None = None

    def key_expr(self, col: Column) -> Column:
        if self.labels is not None:
            return F.when(col.isin(list(self.labels)), col)
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


def _offset_micros(off) -> int:
    """Bin-origin offset → exact integer microseconds."""
    if off is None:
        return 0
    import pandas as pd
    return int(pd.Timedelta(off).value // 1000)


#: sub-second fixed widths in MICROSECONDS (pandas ms/us spellings;
#: storage is micro-grain, so ns widths aren't representable)
_SUBSEC_US = {"ms": 1000, "L": 1000, "us": 1, "U": 1}


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
    'W' == 'W-SUN' — fixed round 6, was ISO Mon-Sun); the full
    closed/label matrix is honored on both 'W' and multi-week 'nW'
    (wave 50).  ``offset`` on calendar/weekly freqs is accepted and
    IGNORED — measured pandas behavior (non-Tick freqs no-op it).
    """

    freq: str = "D"
    closed: str | None = None
    label: str | None = None
    offset: str | None = None
    #: pandas resample origin — honored for fixed-width (Tick) freqs;
    #: resolve_groupers folds it into ``offset`` exactly as resample()
    #: does (round-11 fuzz find: a bare TimeResampler('2D') passed to
    #: groupby() binned on the epoch grid while resample('2D') anchored
    #: at the data's first day)
    origin: str = "start_day"
    #: month-index (year*12+month-1) of the data's first unit block —
    #: pandas anchors MULTI-month/quarter/year bins at the first
    #: point's block (origin='start_day'), not at epoch multiples
    #: (round-9 find: 3MS over data starting in March must bin
    #: Mar/Jun/Sep…, not Jan/Apr/Jul…).  0 keeps the epoch grid
    #: (n == 1, streaming, or non-temporal dims — where it coincides).
    month_anchor: int = 0
    #: epoch-day of the first bin's ANCHOR day for multi-week freqs —
    #: pandas nW bins are anchored weeks stepped n from the first
    #: point's anchor (2W over data starting Wed May 14 1969 ends
    #: Sun May 18 / Jun 1 / …), not epoch-tumbling 14-day windows.
    #: For closed='left' the anchor is the anchor day ON-OR-BEFORE the
    #: first point (bins [anchor, anchor+span)); for closed='right'
    #: it is on-or-after (bins (anchor-span·day, anchor] in dates).
    #: None keeps the epoch-tumbling fallback (0 is a legitimate
    #: anchor: 1970-01-01 — round-10 ADVICE sentinel fix).
    day_anchor: int | None = None

    def key_expr(self, col: Column) -> Column:
        n, unit = _parse_freq(self.freq)
        week_anchor = 1  # pandas 'W' == 'W-SUN'
        if unit.upper().startswith("W-"):
            week_anchor = {"SUN": 1, "MON": 2, "TUE": 3, "WED": 4,
                           "THU": 5, "FRI": 6, "SAT": 7}[unit[2:].upper()]
            unit = "W"
        us_w = _SUBSEC_US.get(unit)
        if us_w is not None:
            # sub-second tumbling bins, integer-microsecond exact
            step = n * us_w
            closed_s = self.closed or "left"
            label_s = self.label or "left"
            off_us = _offset_micros(self.offset)
            e = F.unix_micros(col.cast("timestamp")) - F.lit(off_us)
            if closed_s == "right":
                # bin is (start, start+step]: a point ON the edge
                # stays left — pmod keeps floor semantics pre-1970
                start = (e - 1) - F.pmod(e - 1, F.lit(step))
            else:
                start = e - F.pmod(e, F.lit(step))
            lab = start + F.lit(step if label_s == "right" else 0) \
                + F.lit(off_us)
            return F.timestamp_micros(lab)
        trunc = _TRUNC.get(unit)
        if trunc is None:
            raise ValueError(f"unsupported resample freq {self.freq!r}")
        end_anchored = unit in _END_ANCHORED
        closed = self.closed or ("right" if end_anchored else "left")
        label = self.label or ("right" if end_anchored else "left")
        mods = (closed != "left") or (label != "left") or self.offset
        if trunc in ("month", "quarter", "year"):
            # pandas silently IGNORES offset= on non-Tick (calendar)
            # frequencies — measured round 10: resample('MS',
            # offset='1D') ≡ resample('MS') bin-for-bin — so parity is
            # to accept and ignore it, not raise
            months = {"month": 1, "quarter": 3, "year": 12}[trunc] * n
            # `closed` moves MEMBERSHIP on calendar units, not just
            # labels (round-10 elevated-fuzz find, measured pandas):
            # start-anchored closed='right' bins are (start, next]
            # — a point exactly ON a start midnight joins the earlier
            # bin (shift 1 µs back, micro-grain exact); end-anchored
            # closed='left' edges sit at the end-day MIDNIGHT (pandas
            # _adjust_bin_edges applies the end-of-day adjustment only
            # for closed='right'), so the block's whole last day joins
            # the NEXT bin (shift 1 day forward, then plain block
            # membership).
            eff = col
            if closed == "right" and not end_anchored:
                eff = F.timestamp_micros(
                    F.unix_micros(col.cast("timestamp")) - 1)
            elif closed == "left" and end_anchored:
                eff = col.cast("timestamp") + F.expr("INTERVAL 1 DAY")
            m0 = (F.year(eff) * 12 + F.month(eff) - 1)
            a = F.lit(int(self.month_anchor))

            def _mdate(m):
                return F.make_date((m / 12).cast("int"),
                                   (m % 12 + 1).cast("int"), F.lit(1))

            if end_anchored and n > 1:
                # pandas nME/nQE: bins END every `months` from the
                # anchor block's unit-END month (2QE over March data
                # ends Mar 31 / Sep 30 / … — the anchor QUARTER's last
                # month, not its first) — ceil association, round 9.
                # closed='left' shifts the whole grid ONE STEP LATER:
                # the first bin ends at anchor-block-start + months − 1
                # (2ME over Jan 1 data ends Feb 29 / Apr 30 / …, not
                # Jan 31 / Mar 31 — measured pandas, round-10 elevated
                # fuzz), with the anchor itself computed from the
                # first point + 1 day (see _calendar_anchors).
                u = months // n
                ae = a + F.lit(months - 1 if closed == "left" else u - 1)
                endm = ae + F.ceil((m0 - ae) / months) * months
                if label == "right":
                    return F.last_day(_mdate(endm)).cast("timestamp")
                return F.last_day(_mdate(endm - months)).cast("timestamp")
            start = a + F.floor((m0 - a) / months) * months
            start_date = _mdate(start)
            # pandas end-anchored bins are plain calendar-block
            # membership (the whole last day included; the next block
            # starts exactly at its first midnight) — only the LABEL
            # moves.  The label matrix is anchor-dependent (measured
            # round 9): ME/QE/YE edges are block ENDS, so label='left'
            # is the PREVIOUS block's end (May 31 for the June block),
            # while MS/QS/YS edges are block STARTS, so label='right'
            # is the NEXT block's start (Jul 1 for the June block).
            if end_anchored:
                if label == "right":
                    return F.last_day(F.add_months(start_date, months - 1)) \
                            .cast("timestamp")
                return F.date_sub(start_date, 1).cast("timestamp")
            if label == "right":
                return F.add_months(start_date, months).cast("timestamp")
            return start_date.cast("timestamp")
        if trunc == "week":
            # offset= on anchored-week freqs is a pandas no-op too
            # (measured round 10) — ignored for parity
            if n == 1:
                # pandas anchored weeks (wave-30 diff find; 'W' ==
                # 'W-SUN'): every timestamp whose DATE is ≤ the next
                # anchor day belongs to that anchor's bin, labeled by
                # the anchor date — right-closed at end-of-anchor-day.
                # Spark dayofweek: 1=Sunday … 7=Saturday.  Anchored
                # weeks are END-anchored in pandas terms, so the
                # defaults here ARE closed='right'/label='right'
                # (measured round 9 — the old guard raised on the
                # explicit spelling of the default); closed='left'
                # pushes a point ON the anchor day to the NEXT bin,
                # label='left' backs the label up one anchor.
                wc = closed if self.closed else "right"
                wl = label if self.label else "right"
                if wc == "left":
                    off = ((F.lit(week_anchor) - F.dayofweek(col) + 6)
                           % 7) + 1
                else:
                    off = (F.lit(week_anchor) - F.dayofweek(col) + 7) % 7
                lab = F.date_add(F.to_date(col), off.cast("int"))
                if wl == "left":
                    lab = F.date_sub(lab, 7)
                return lab.cast("timestamp")
            if self.day_anchor is not None:
                # pandas nW: anchored weeks stepped n from the FIRST
                # point's anchor day.  Defaults are closed='right'/
                # label='right' (anchored weeks are end-anchored).
                # closed='right': bins END on anchor days — a point ON
                # the anchor day stays (whole-day membership, date
                # arithmetic).  closed='left': bins are [anchor,
                # anchor+span) with the anchor day ON-OR-BEFORE the
                # first point (day_anchor is computed per `closed` in
                # resample._calendar_anchors), still labeled by the
                # RIGHT edge.  label='left' backs the label up one
                # span.  Measured against pandas round 10 (wave 50).
                wc = self.closed or "right"
                wl = self.label or "right"
                d = F.unix_date(F.to_date(col))
                a = F.lit(int(self.day_anchor))
                span = 7 * n
                if wc == "left":
                    end = a + (F.floor((d - a) / span) + 1) * span
                else:
                    end = a + F.ceil((d - a) / span) * span
                lab = F.date_from_unix_date(end.cast("int"))
                if wl == "left":
                    lab = F.date_sub(lab, span)
                return lab.cast("timestamp")
        elif n == 1 and not mods:
            return F.date_trunc(trunc, col)
        # integer-MICROSECOND tumbling arithmetic: unix_timestamp
        # truncates the sub-second fraction (toward zero — the wrong
        # direction pre-1970), so a x.5-second point could misbin at a
        # right-closed edge; pmod on exact long micros keeps floor
        # semantics on both sides of the epoch (round-10 dt-fuzz find)
        us = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
              "week": 604800}[trunc] * n * 1_000_000
        off = _offset_micros(self.offset)
        e = F.unix_micros(col.cast("timestamp")) - F.lit(off)
        if closed == "right":
            # bin is (start, start+us]: a point ON the edge stays left
            start = (e - 1) - F.pmod(e - 1, F.lit(us))
        else:
            start = e - F.pmod(e, F.lit(us))
        lab = start + F.lit(us if label == "right" else 0) + F.lit(off)
        return F.timestamp_micros(lab)


_SEASON_OF_MONTH = {
    12: "DJF", 1: "DJF", 2: "DJF",
    3: "MAM", 4: "MAM", 5: "MAM",
    6: "JJA", 7: "JJA", 8: "JJA",
    9: "SON", 10: "SON", 11: "SON",
}


@dataclass
class SeasonGrouper(Grouper):
    """Meteorological seasons incl. cross-year DJF
    (xarray/groupers.py:801).  CUSTOM seasons honored (round-11 fuzz
    find: the chain used the default month->season map whatever
    ``seasons`` said): months in no listed season drop; seasons may
    OVERLAP — the reference duplicates a shared month's rows into
    every season listing it, which the long form expresses as an
    exploded matching-season array (row fan-out only when overlap
    actually exists; disjoint seasons keep the plain when-chain)."""

    seasons: Sequence[str] = ("DJF", "MAM", "JJA", "SON")

    def key_expr(self, col: Column) -> Column:
        seasons = list(self.seasons)
        inds = _season_to_month_tuple(seasons)
        m = F.month(col)
        flat = [mo for t in inds for mo in t]
        if len(flat) == len(set(flat)):
            chain = None
            for s, months in zip(seasons, inds):
                cond = m.isin([int(x) for x in months])
                chain = (F.when(cond, F.lit(s)) if chain is None
                         else chain.when(cond, F.lit(s)))
            return chain
        arr = F.array(*[
            F.when(m.isin([int(x) for x in months]), F.lit(s))
            for s, months in zip(seasons, inds)])
        # empty arrays (unrequested months) yield no rows under explode
        return F.explode(F.array_compact(arr))


def _season_to_month_tuple(seasons) -> tuple:
    """Season strings → month tuples, re-derived from the reference's
    parsing contract (groupers.py:682 doctest): each season is a run
    of consecutive month INITIALS out of 'JFMAMJJASOND'; the repeated
    initials (J/M/A) disambiguate by the two-letter prefix, and a
    single-letter season borrows the NEXT season's initial."""
    initials = "JFMAMJJASOND"
    wrapped = initials + "J"
    starts = {wrapped[i] + wrapped[i + 1]: i + 1 for i in range(12)}
    out = []
    for i, season in enumerate(seasons):
        if len(season) == 1:
            suffix = (seasons[i + 1][0] if i < len(seasons) - 1
                      else seasons[0][0])
        else:
            suffix = season[1]
        start = starts[season[0] + suffix]
        months = [start]
        for k in range(len(season) - 1):
            e = start + k + 1
            months.append(e - 12 if e > 12 else e)
        out.append(tuple(months))
    return tuple(out)


def _is_sorted_periodic(lst) -> bool:
    """True when the month run is sorted up to ONE wraparound AND the
    tail stays below the head (reference groupers.py:721)."""
    wraps = [i for i in range(1, len(lst)) if lst[i] < lst[i - 1]]
    if not wraps:
        return True
    return len(wraps) == 1 and lst[-1] <= lst[0]


@dataclass
class SeasonResampler(Grouper):
    """Season-resampling (xarray/groupers.py:874): group labels are the
    season instance's START date (year, first-month, 1) as a
    TIMESTAMP — months following a cross-year December get year−1, so
    a DJF instance carries its December's year (measured reference
    behavior; through round 9 the engine used a 'YYYY-DJF' string with
    the December shifted +1 — both group identically, the LABEL
    differs).  Custom contiguous seasons ('JF', 'JJAS', 'DJFM')
    supported; months in no season drop (null key → _prepared filter).
    ``drop_incomplete`` (the reference default) trims the first/last
    season instances when the data's boundary MONTHS don't reach the
    season edges — resolve_groupers threads the data-range lookup in
    as ``keep_range``.  Knowing divergence: with EMPTY interior
    instances (sparse data) the reference's code/label zip mislabels
    every later season (its unique_codes index into a longer
    full_index); the engine labels each group by its own season start
    — correct, pinned against dense data only."""

    seasons: Sequence[str] = ("DJF", "MAM", "JJA", "SON")
    drop_incomplete: bool = True
    #: resolved [lo, hi] ISO keep-range (season-start labels) for the
    #: drop_incomplete trim; None = keep every instance
    keep_range: tuple | None = None

    def key_expr(self, col: Column) -> Column:
        seasons = list(self.seasons)
        inds = _season_to_month_tuple(seasons)
        flat = [m for t in inds for m in t]
        if len(flat) > len(set(flat)):
            raise ValueError("Overlapping seasons are not allowed. "
                             f"Received {self.seasons!r}")
        if not _is_sorted_periodic(flat):
            raise ValueError("Resampling is only supported with sorted "
                             f"seasons. Provided seasons {self.seasons!r} "
                             "are not sorted.")
        m, y = F.month(col), F.year(col)
        chain = None
        for s, months in zip(seasons, inds):
            after_dec = (set(months[s.index("D") + 1:])
                         if "DJ" in s else set())
            for mo in months:
                yy = y - F.lit(1 if mo in after_dec else 0)
                lbl = F.make_date(yy.cast("int"), F.lit(int(months[0])),
                                  F.lit(1)).cast("timestamp")
                cond = m == F.lit(int(mo))
                chain = (F.when(cond, lbl) if chain is None
                         else chain.when(cond, lbl))
        key = chain  # unrequested months → NULL → dropped
        if self.keep_range is not None:
            lo, hi = self.keep_range
            key = F.when(
                (key >= F.lit(lo).cast("timestamp"))
                & (key <= F.lit(hi).cast("timestamp")), key)
        return key

    def month_pos_expr(self, col: Column) -> Column:
        """0-based position of the month within ITS season (NULL for
        unrequested months).  min() of this per season instance is the
        earliest observed month position — 0 iff the instance reaches
        its season's first month; max() is the latest — season_len−1
        iff it reaches the last.  Feeds the AGGREGATED drop_incomplete
        trim (groupby._agg): the boundary-instance completeness check
        rides the main aggregation instead of a pre-scan min/max job
        (round-10 verdict #2)."""
        m = F.month(col)
        chain = None
        for months in _season_to_month_tuple(list(self.seasons)):
            for pos, mo in enumerate(months):
                cond = m == F.lit(int(mo))
                lbl = F.lit(pos)
                chain = (F.when(cond, lbl) if chain is None
                         else chain.when(cond, lbl))
        return chain

