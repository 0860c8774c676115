"""Differential wave 50 (round 10): the resample matrix completed +
upsample-verb parity + anchored temporal-coord exactness.

What this wave pins (each measured against the live reference):

1. **Multi-week closed/label matrix** — `nW` with every closed/label
   combination (was a documented raise): pandas closed='right' bins
   END on anchor days stepped n·7 from the first point's on-or-after
   anchor; closed='left' bins are [anchor, anchor+span) anchored
   on-or-BEFORE the first point, still labeled by the right edge;
   label='left' backs the label up one span.
2. **offset= on calendar/weekly freqs is a pandas NO-OP** (measured:
   resample('MS', offset='1D') ≡ resample('MS') bin-for-bin) — the
   engine now accepts and ignores it instead of raising.
3. **Upsample verbs operate on the ORIGINAL series** (reference
   core/resample.py:132-249): pad/backfill/nearest reindex
   ``self._obj`` onto grouper.full_index and interpolate uses the
   original x-positions as knots — NOT per-bin firsts.  On a
   downsampling freq the two diverge; the engine matched only the
   upsampling case through round 9.
4. **asfreq is self.mean(dim)** (core/resample.py:383-392): per-bin
   MEAN + full-index densify, not first-per-bin.
5. **End-anchored (ME/QE/YE) label runs** — upsampling and empty-bin
   densify onto month-end labels (was a documented raise): the run is
   uniform in month-START space, stepped then mapped via last_day.
6. **Epoch-day-0 week anchor** (ADVICE): W-THU data starting in late
   Dec 1969 anchors at 1970-01-01 (epoch-day 0) — the old 0-sentinel
   silently fell back to epoch-tumbling bins.
7. **Anchored temporal-coord numeric view** (ADVICE):
   differentiate/integrate on 1 ms-spaced 2026 timestamps — the
   per-frame integer-us anchor is subtracted BEFORE the ns scaling,
   so the deltas are exact (was 6.5e-4 rel error from independent
   rounding at 1.7e18).
8. **groupby(TimeResampler(...)) anchors like resample()** — a bare
   TimeResampler passed through groupers= gets the first-point
   calendar anchors.
"""

import sys
import warnings

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/reference")
import xarray as xr  # noqa: E402

from xarray_spark import XDataset  # noqa: E402

warnings.filterwarnings("ignore")


def _eng(spark, ts, vals):
    return XDataset(spark.createDataFrame(
        pd.DataFrame({"t": pd.to_datetime(ts), "v": vals})), dims=["t"])


def _ref(ts, vals):
    return xr.DataArray(vals, dims="t", coords={"t": pd.to_datetime(ts)})


def _cmp_series(got_df, ref_da, rtol=0.0):
    """Full-run comparison INCLUDING empty-bin NaN rows and label set."""
    g = got_df.sort_values("t")
    exp_t = [pd.Timestamp(x) for x in ref_da["t"].values]
    got_t = [pd.Timestamp(x) for x in g["t"].tolist()]
    assert got_t == exp_t, (got_t, exp_t)
    ev = np.asarray(ref_da.values, dtype="float64")
    gv = np.asarray([np.nan if x is None else x for x in g["v"]], "float64")
    np.testing.assert_allclose(gv, ev, rtol=rtol, atol=0.0, equal_nan=True)


# --------------------------------------------------------- 1: nW matrix

WEEK_TS = ["2024-01-10 06:00", "2024-01-14 00:00", "2024-01-14 15:00",
           "2024-01-15 01:00", "2024-01-28 00:00", "2024-02-20 13:00",
           "2024-03-03 23:59"]
WEEK_V = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0]


@pytest.mark.parametrize("freq", ["2W", "3W", "2W-WED", "4W-THU"])
@pytest.mark.parametrize("closed", [None, "left", "right"])
@pytest.mark.parametrize("label", [None, "left", "right"])
def test_multiweek_closed_label_matrix(spark, freq, closed, label):
    eng = _eng(spark, WEEK_TS, WEEK_V)
    ref = _ref(WEEK_TS, WEEK_V)
    r = ref.resample(t=freq, closed=closed, label=label).sum()
    g = eng.resample({"t": freq}, closed=closed, label=label) \
           .sum().to_pandas()
    _cmp_series(g, r)


def test_single_week_closed_label_still_green(spark):
    # regression guard: the n==1 path shares defaults with nW now
    for closed in (None, "left", "right"):
        for label in (None, "left", "right"):
            eng = _eng(spark, WEEK_TS, WEEK_V)
            ref = _ref(WEEK_TS, WEEK_V)
            r = ref.resample(t="W", closed=closed, label=label).sum()
            g = eng.resample({"t": "W"}, closed=closed, label=label) \
                   .sum().to_pandas()
            _cmp_series(g, r)


# ------------------------------------------------- 2: offset is a no-op

@pytest.mark.parametrize("freq,off", [("MS", "1D"), ("ME", "36h"),
                                      ("2MS", "1D"), ("W", "12h"),
                                      ("2W", "1D"), ("QE", "1D"),
                                      ("W-WED", "2D")])
def test_offset_noop_on_calendar_freqs(spark, freq, off):
    eng = _eng(spark, WEEK_TS, WEEK_V)
    ref = _ref(WEEK_TS, WEEK_V)
    r = ref.resample(t=freq, offset=off).sum()
    g = eng.resample({"t": freq}, offset=off).sum().to_pandas()
    _cmp_series(g, r)


# ------------------------------- 3+4: verbs on the ORIGINAL, asfreq=mean

DOWN_TS = pd.date_range("2024-01-03", periods=11, freq="9D13h")
DOWN_V = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]


@pytest.mark.parametrize("freq", ["MS", "ME", "2W", "10D"])
def test_downsample_asfreq_is_bin_mean(spark, freq):
    eng = _eng(spark, DOWN_TS, DOWN_V)
    ref = _ref(DOWN_TS, DOWN_V)
    r = ref.resample(t=freq).asfreq()
    g = eng.resample({"t": freq}).asfreq().to_pandas()
    _cmp_series(g, r)


@pytest.mark.parametrize("verb", ["ffill", "bfill", "nearest"])
@pytest.mark.parametrize("freq", ["MS", "2W", "4D"])
def test_fill_verbs_use_original_points(spark, verb, freq):
    eng = _eng(spark, DOWN_TS, DOWN_V)
    ref = _ref(DOWN_TS, DOWN_V)
    r = getattr(ref.resample(t=freq), verb)()
    g = getattr(eng.resample({"t": freq}), verb)().to_pandas()
    _cmp_series(g, r)


@pytest.mark.parametrize("freq", ["4D", "2W", "MS"])
def test_interpolate_uses_original_knots(spark, freq):
    # reference interp needs scipy (absent) for non-linear; linear runs
    # through numpy — compare against np.interp on the label run, which
    # is what scipy interp1d linear reduces to
    eng = _eng(spark, DOWN_TS, DOWN_V)
    ref = _ref(DOWN_TS, DOWN_V)
    labels = ref.resample(t=freq).asfreq()["t"].values
    x = DOWN_TS.astype("int64").to_numpy().astype("float64")
    xi = pd.to_datetime(labels).astype("int64").to_numpy().astype("float64")
    exp = np.interp(xi, x, np.asarray(DOWN_V), left=np.nan, right=np.nan)
    g = eng.resample({"t": freq}).interpolate().to_pandas().sort_values("t")
    got_t = [pd.Timestamp(v) for v in g["t"]]
    assert got_t == [pd.Timestamp(v) for v in labels]
    gv = np.asarray([np.nan if v is None else v for v in g["v"]], "float64")
    np.testing.assert_allclose(gv, exp, rtol=1e-15, equal_nan=True)


# ------------------------------------------- 5: end-anchored label runs

SPARSE_TS = ["2024-01-05", "2024-03-20", "2024-06-02", "2024-06-28"]
SPARSE_V = [1.0, 2.0, 3.0, 6.0]


@pytest.mark.parametrize("freq", ["ME", "QE", "2QE", "YE"])
def test_end_anchored_densify_empty_bins(spark, freq):
    eng = _eng(spark, SPARSE_TS, SPARSE_V)
    ref = _ref(SPARSE_TS, SPARSE_V)
    r = ref.resample(t=freq).sum()
    g = eng.resample({"t": freq}).sum().to_pandas()
    _cmp_series(g, r)


@pytest.mark.parametrize("verb", ["asfreq", "ffill", "bfill", "nearest"])
def test_end_anchored_upsample_verbs(spark, verb):
    eng = _eng(spark, SPARSE_TS, SPARSE_V)
    ref = _ref(SPARSE_TS, SPARSE_V)
    r = getattr(ref.resample(t="ME"), verb)()
    g = getattr(eng.resample({"t": "ME"}), verb)().to_pandas()
    _cmp_series(g, r)


# --------------------------------------------- 6: epoch-day-0 anchor

def test_week_anchor_epoch_day_zero(spark):
    # W-THU over data starting Fri 1969-12-26: first anchor day is
    # Thu 1970-01-01 = epoch-day 0 (the old 0-sentinel lost it)
    ts = ["1969-12-26 00:00", "1969-12-30 00:00", "1970-01-01 10:00",
          "1970-01-07 00:00"]
    vals = [1.0, 2.0, 4.0, 8.0]
    eng = _eng(spark, ts, vals)
    ref = _ref(ts, vals)
    for freq in ("2W-THU", "3W-THU"):
        r = ref.resample(t=freq).sum()
        g = eng.resample({"t": freq}).sum().to_pandas()
        _cmp_series(g, r)


# ------------------------------- 7: anchored temporal-coord exactness

def test_differentiate_millisecond_2026_exact(spark):
    ts = pd.date_range("2026-03-01 12:00:00", periods=64, freq="1ms")
    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 1.0, 64)
    eng = _eng(spark, ts, vals.tolist())
    ref = _ref(ts, vals.tolist())
    r = ref.differentiate("t")
    g = eng.differentiate("t").to_pandas().sort_values("t")
    np.testing.assert_allclose(np.asarray(g["v"], "float64"), r.values,
                               rtol=1e-12)


def test_integrate_millisecond_2026_exact(spark):
    ts = pd.date_range("2026-03-01 12:00:00", periods=64, freq="1ms")
    rng = np.random.default_rng(11)
    vals = rng.normal(50.0, 2.0, 64)
    eng = _eng(spark, ts, vals.tolist())
    ref = _ref(ts, vals.tolist())
    r = float(ref.integrate("t").values)
    g = float(eng.integrate("t").to_pandas()["v"].iloc[0])
    np.testing.assert_allclose(g, r, rtol=1e-12)


def test_cumulative_integrate_millisecond_2026(spark):
    ts = pd.date_range("2026-07-04", periods=48, freq="500us")
    vals = np.linspace(-3.0, 9.0, 48)
    eng = _eng(spark, ts, vals.tolist())
    ref = _ref(ts, vals.tolist())
    r = ref.cumulative_integrate("t")
    g = eng.cumulative_integrate("t").to_pandas().sort_values("t")
    np.testing.assert_allclose(np.asarray(g["v"], "float64"), r.values,
                               rtol=1e-12)


# ------------------------------- 8: groupby(TimeResampler) anchoring

def test_groupby_timeresampler_anchors_like_resample(spark):
    """Round-11 semantics: a SINGLE bare TimeResampler through
    groupby() IS resample() — same anchors AND the same full label run
    with empty bins NaN-materialized (the reference's groupby(Time-
    Resampler) == resample; through round 10 the engine's groupby path
    stayed sparse and epoch-anchored)."""
    from xarray_spark.groupers import TimeResampler
    eng = _eng(spark, WEEK_TS, WEEK_V)
    ref = _ref(WEEK_TS, WEEK_V)
    rs = ref.resample(t="2W").sum()
    exp = [(pd.Timestamp(a), float(b))
           for a, b in zip(rs["t"].values, rs.values)]
    g = eng.groupby(t=TimeResampler("2W")).sum().to_pandas().sort_values("t")
    got = [(pd.Timestamp(a),
            np.nan if b is None else float(b))
           for a, b in zip(g["t"], g["v"])]
    assert [t for t, _ in got] == [t for t, _ in exp], (got, exp)
    np.testing.assert_allclose([v for _, v in got], [v for _, v in exp],
                               equal_nan=True)


# ---------------------- 9: sub-second freqs + exact micros tumbling

def test_subsecond_resample(spark):
    # spans the epoch boundary with fractional-second points: the
    # pmod-on-micros arithmetic must floor (not truncate toward zero)
    ts = pd.date_range("1969-12-31 23:59:59.9981", periods=40,
                       freq="713us")
    vals = [float(i) for i in range(40)]
    eng = _eng(spark, ts, vals)
    ref = _ref(ts, vals)
    for freq in ("500ms", "2ms", "250us", "10ms"):
        r = ref.resample(t=freq).sum()
        g = eng.resample({"t": freq}, ).sum().to_pandas()
        _cmp_series(g, r)


def test_fixed_width_closed_right_fractional_pre1970(spark):
    ts = pd.to_datetime(["1969-12-31 23:59:58.5", "1969-12-31 23:59:59.0",
                         "1969-12-31 23:59:59.5", "1970-01-01 00:00:00.0",
                         "1970-01-01 00:00:00.5", "1970-01-01 00:00:02.0"])
    vals = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]
    eng = _eng(spark, ts, vals)
    ref = _ref(ts, vals)
    for freq in ("2s", "1s"):
        for closed in (None, "left", "right"):
            for label in (None, "right"):
                r = ref.resample(t=freq, closed=closed, label=label).sum()
                g = eng.resample({"t": freq}, closed=closed,
                                 label=label).sum().to_pandas()
                _cmp_series(g, r)


def test_dt_floor_ceil_round_subsecond(spark):
    ts = pd.date_range("1969-12-31 23:59:59.123456", periods=30,
                       freq="777777us")
    df = pd.DataFrame({"i": range(30), "ts": ts})
    eng = XDataset(spark.createDataFrame(df), dims=["i"])
    ref = xr.DataArray(ts, dims="i", coords={"i": range(30)})
    for verb in ("floor", "ceil", "round"):
        for fq in ("500ms", "50us", "s", "2s", "10ms"):
            r = [pd.Timestamp(x) for x in getattr(ref.dt, verb)(fq).values]
            g = (getattr(eng["ts"].dt, verb)(fq).to_pandas()
                 .sort_values("i").iloc[:, -1])
            got = [pd.Timestamp(x) for x in g]
            assert got == r, (verb, fq, got[:4], r[:4])


def test_str_title_non_space_boundaries(spark):
    strs = ["ZZ-top", "a,b,,c", "123abc456", "hello world", "ünïcodé-x",
            "CamelCase", "", "  pad  ", None, "o'neill MCADAM"]
    df = pd.DataFrame({"i": range(len(strs)), "s": strs})
    eng = XDataset(spark.createDataFrame(df), dims=["i"])
    g = eng["s"].str.title().to_pandas().sort_values("i").iloc[:, -1]
    exp = [s.title() if s is not None else None for s in strs]
    assert [x for x in g] == exp


def test_origin_plus_offset_composition(spark):
    # the origin shift composes with an explicit offset (the branch
    # that referenced _offset_seconds without importing it — fixed
    # round 10)
    ts = pd.date_range("2024-01-01 03:17", periods=30, freq="5h13min")
    vals = [float(i) for i in range(30)]
    eng = _eng(spark, ts, vals)
    ref = _ref(ts, vals)
    for kw in ({"origin": "start", "offset": "30min"},
               {"origin": "start_day", "offset": "90s"},
               {"origin": "epoch", "offset": "45min"}):
        r = ref.resample(t="7h", **kw).sum()
        g = eng.resample({"t": "7h"}, **kw).sum().to_pandas()
        _cmp_series(g, r)


# ------------- 10: calendar closed= moves MEMBERSHIP (elevated fuzz)

EDGE_TS = ["2024-01-01 00:00", "2024-01-15 00:00", "2024-02-01 00:00",
           "2024-03-01 00:00", "2024-03-02 00:00", "2024-04-30 00:00",
           "2024-05-31 00:00", "2024-06-30 23:59"]
EDGE_V = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0]


@pytest.mark.parametrize("freq", ["MS", "ME", "2MS", "2ME", "3ME", "4MS",
                                  "QS", "QE", "2QS", "2QE", "YE", "2YS"])
@pytest.mark.parametrize("closed", ["left", "right"])
def test_calendar_closed_membership_matrix(spark, freq, closed):
    """round-10 elevated-fuzz find: `closed` moves bin MEMBERSHIP on
    calendar units, not just labels.  Start-anchored closed='right'
    bins are (start, next] with the grid anchored a full (n−1) blocks
    earlier from first−1µs; end-anchored closed='left' edges sit at
    end-day MIDNIGHTS (the block's last day joins the NEXT bin) with
    the multi-unit grid anchored one step later from first+1day —
    all measured against pandas (504-combo matrix green)."""
    for ts, vals in ((EDGE_TS, EDGE_V),
                     (pd.date_range("2024-01-31", periods=10, freq="17D"),
                      [float(i) for i in range(10)])):
        eng = _eng(spark, ts, vals)
        ref = _ref(ts, vals)
        for label in (None, "left", "right"):
            r = ref.resample(t=freq, closed=closed, label=label).sum()
            g = eng.resample({"t": freq}, closed=closed,
                             label=label).sum().to_pandas()
            _cmp_series(g, r)


# ----------------------- 11: SeasonResampler reference parity (dense)

def test_season_resampler_reference_matrix(spark):
    """Round-10 rewrite: season labels are the instance's START
    timestamp (December keeps its year — the old engine emitted
    'YYYY-DJF' strings with Dec shifted +1), custom contiguous seasons
    work, and drop_incomplete trims partial boundary instances at
    month granularity.  Dense data only: with EMPTY interior
    instances the reference's own unique_codes indexing mislabels
    later seasons, and when the dropped first season wraps the year
    without containing 'DJ' the reference forgets the year bump —
    both knowing divergences where the engine is right."""
    from xarray.groupers import SeasonResampler as RefSR
    from xarray_spark.groupers import SeasonResampler
    cases = [("2000-12-15", 130), ("2001-03-01", 110), ("2001-05-07", 90)]
    combos = [(("DJF", "MAM", "JJA", "SON"), True),
              (("DJF", "MAM", "JJA", "SON"), False),
              (("JF", "MAM", "JJAS", "OND"), True),
              (("DJFM", "AM", "JJA", "SON"), False)]
    for start, periods in cases:
        ts = pd.date_range(start, periods=periods, freq="7D")
        vals = np.arange(float(periods))
        eng = _eng(spark, ts, list(vals))
        ref = _ref(ts, list(vals))
        for seasons, di in combos:
            if seasons[-1] == "OND" and di and start == "2000-12-15":
                continue  # the reference's missing year-bump bug
            r = ref.groupby(t=RefSR(list(seasons), drop_incomplete=di)) \
                   .sum()
            g = (eng.groupby(t=SeasonResampler(seasons,
                                               drop_incomplete=di))
                 .sum().to_pandas().sort_values("t"))
            rt = [str(x)[:10] for x in r["t"].values
                  if not np.isnan(r.sel(t=x).values)]
            rv = [float(v) for v in r.values if v == v]
            gt = [str(pd.Timestamp(x))[:10] for x in g["t"]]
            assert gt == rt, (start, seasons, di, gt[:4], rt[:4])
            np.testing.assert_allclose(np.asarray(g["v"], float), rv)


def test_season_resampler_validation(spark):
    from xarray_spark.groupers import SeasonResampler
    import pytest as _pt
    eng = _eng(spark, pd.date_range("2001-01-01", periods=5, freq="MS"),
               [1.0] * 5)
    with _pt.raises(ValueError, match="Overlapping"):
        eng.groupby(t=SeasonResampler(("DJF", "FMA"))).sum()
    with _pt.raises(ValueError, match="sorted"):
        eng.groupby(t=SeasonResampler(("MAM", "DJF", "JJA", "SON"))).sum()
