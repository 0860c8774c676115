"""Standing randomized differential fuzz: engine vs the reference
across op families on an adversarial value pool (NaN / ±inf / ±0 /
denormals / near-symmetric cancellation pairs / 1e15 outliers / ties).

Deterministic seed per run; `SPARK_GRAFT_FUZZ_TRIALS` scales the trial
count (default keeps the suite fast).  This harness found four of the
round-9 wave-47 pins before any external fuzz did: the rolling-var
series-shift poisoning, idxmax/argmax tie-breaking, all-NaN coarsen
block sums, and the non-finite weighted-variance matrix — keep it
green and occasionally crank the trials.
"""

import os
import sys
import warnings

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/reference")
import xarray as xr  # noqa: E402

from xarray_spark import XDataset  # noqa: E402

warnings.filterwarnings("ignore")

TRIALS = int(os.environ.get("SPARK_GRAFT_FUZZ_TRIALS", "8"))

POOL = np.array([0.0, -0.0, 1.0, -1.0, 3.5, -3.5, 1e6,
                 -999999.9999999999, 999999.9999999999, -1e6, 1e-300,
                 -1e-300, 2.5e5, -2.4999999999999997e5, np.nan, np.inf,
                 -np.inf, 5e-324, -5e-324, 1e15, 1e15 + 2.0])


def _draw(rng, n, nan_frac=0.2, inf_ok=True):
    pool = POOL if inf_ok else POOL[~np.isinf(POOL)]
    mix = rng.random(n) < 0.5
    vals = np.where(mix, rng.choice(pool, n), rng.normal(scale=10, size=n))
    vals[rng.random(n) < nan_frac] = np.nan
    return vals


def _close(a, b, rtol=1e-7, atol=1e-12):
    a, b = np.asarray(a, float), np.asarray(b, float)
    if a.shape != b.shape:
        return False
    return bool(np.all(np.isclose(a, b, rtol=rtol, atol=atol,
                                  equal_nan=True)))


def test_fuzz_reductions_and_windows(spark):
    rng = np.random.default_rng(20260816)
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(3, 25))
        vals = _draw(rng, n)
        keys = rng.integers(0, 3, n)
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "k": keys, "v": vals})),
            dims=["t"], coords={"k": ("t",)})
        ref = xr.DataArray(vals, dims="t",
                           coords={"t": range(n), "k": ("t", keys)})
        for op in ("sum", "mean", "min", "max", "prod", "std", "var",
                   "median"):
            g = getattr(eng["v"], op)().to_pandas()["v"].iloc[0]
            r = float(getattr(ref, op)().values)
            if not _close(g, r):
                fails.append((trial, op, g, r, vals.tolist()))
        for op in ("sum", "mean", "min", "max", "std", "var", "median"):
            g = (getattr(eng.groupby("k"), op)().to_pandas()
                 .sort_values("k")["v"].to_numpy())
            r = getattr(ref.groupby("k"), op)().values
            if not _close(g, r):
                fails.append((trial, f"gb_{op}", g.tolist(), r.tolist(),
                              vals.tolist()))
        wsz = int(rng.integers(2, 5))
        # count included since round 11: min_periods masks count too
        # (a zero-valid window is NaN, not 0 — N-D fuzz find)
        for op in ("sum", "mean", "min", "max", "std", "var", "median",
                   "count"):
            g = (getattr(eng.rolling({"t": wsz}), op)().to_pandas()
                 .sort_values("t")["v"].to_numpy())
            r = getattr(ref.rolling(t=wsz), op)().values
            if not _close(g, r):
                fails.append((trial, f"roll_{op}_{wsz}", g.tolist(),
                              r.tolist(), vals.tolist()))
        g = (eng["v"].cumsum("t").to_pandas().sort_values("t")["v"]
             .to_numpy())
        if not _close(g, ref.cumsum("t").values):
            fails.append((trial, "cumsum", g.tolist(), vals.tolist()))
    assert not fails, fails[:5]


def test_fuzz_weighted_args_interp_coarsen(spark):
    rng = np.random.default_rng(816)
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(4, 20))
        vals = _draw(rng, n)
        w = np.abs(rng.normal(1.0, 0.5, n)) + 0.01
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": range(n)})
        wda = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "w": w})), dims=["t"])["w"]
        refw = ref.weighted(xr.DataArray(w, dims="t"))
        for op in ("sum", "mean", "var", "std", "sum_of_weights"):
            g = getattr(eng.weighted(wda), op)().to_pandas()["v"].iloc[0]
            r = float(getattr(refw, op)().values)
            if not _close(g, r):
                fails.append((trial, f"w_{op}", g, r, vals.tolist()))
        q = float(rng.choice([0.0, 0.35, 0.5, 0.77, 1.0]))
        g = eng.weighted(wda).quantile(q).to_pandas()["v"].iloc[0]
        r = float(refw.quantile(q).values)
        if not _close(g, r):
            fails.append((trial, f"w_q{q}", g, r, vals.tolist()))
        for op in ("idxmin", "idxmax", "argmin", "argmax"):
            g = getattr(eng["v"], op)("t").to_pandas().iloc[0, -1]
            r = float(getattr(ref, op)("t").values)
            gv = float(g) if g is not None else np.nan
            if not (np.isnan(gv) and np.isnan(r)) and gv != r:
                fails.append((trial, op, gv, r, vals.tolist()))
        v2 = _draw(rng, n, nan_frac=0.4, inf_ok=False)
        eng2 = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": np.arange(n, dtype=float), "v": v2})),
            dims=["t"])
        ref2 = xr.DataArray(v2, dims="t",
                            coords={"t": np.arange(n, dtype=float)})
        g = (eng2.interpolate_na("t", method="linear").to_pandas()
             .sort_values("t")["v"].to_numpy())
        if not _close(g, ref2.interpolate_na("t", method="linear").values):
            fails.append((trial, "ina_linear", g.tolist(), v2.tolist()))
        wsz = int(rng.integers(2, 4))
        for op in ("mean", "sum", "var", "std", "median", "max"):
            g = (getattr(eng2.coarsen({"t": wsz}, boundary="trim"), op)()
                 .to_pandas().sort_values("t")["v"].to_numpy())
            r = getattr(ref2.coarsen(t=wsz, boundary="trim"), op)().values
            if not _close(g, r):
                fails.append((trial, f"co_{op}_{wsz}", g.tolist(),
                              r.tolist(), v2.tolist()))
        g = (eng2["v"].cumprod("t").to_pandas().sort_values("t")["v"]
             .to_numpy())
        if not _close(g, ref2.cumprod("t").values):
            fails.append((trial, "cumprod", g.tolist(), v2.tolist()))
    assert not fails, fails[:5]


def test_fuzz_align_reindex_fill(spark):
    """Round-10 pool widening (verdict #7): align join×fill_value and
    reindex method×tolerance×fill_value over partially-overlapping
    label sets drawn with adversarial values."""
    rng = np.random.default_rng(1010)
    fails = []
    for trial in range(TRIALS):
        na, nb = int(rng.integers(3, 12)), int(rng.integers(3, 12))
        la = np.sort(rng.choice(np.arange(0, 20), na, replace=False))
        lb = np.sort(rng.choice(np.arange(0, 20), nb, replace=False))
        va, vb = _draw(rng, na), _draw(rng, nb)
        ea = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": la, "v": va})), dims=["t"])
        eb = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": lb, "u": vb})), dims=["t"])
        ra = xr.DataArray(va, dims="t", coords={"t": la}).rename("v")
        rb = xr.DataArray(vb, dims="t", coords={"t": lb}).rename("u")
        fill = float(rng.choice([0.0, -7.5, 1e15]))
        for join in ("inner", "outer", "left", "right"):
            from xarray_spark import align
            g1, g2 = align(ea, eb, join=join, fill_value=fill)
            r1, r2 = xr.align(ra, rb, join=join, fill_value=fill)
            gp = g1.to_pandas().sort_values("t")
            if (gp["t"].tolist() != list(r1["t"].values)
                    or not _close(gp["v"].to_numpy(), r1.values)):
                fails.append((trial, f"align_{join}", gp["v"].tolist(),
                              r1.values.tolist()))
            gp2 = g2.to_pandas().sort_values("t")
            if not _close(gp2["u"].to_numpy(), r2.values):
                fails.append((trial, f"align_{join}_b", gp2["u"].tolist(),
                              r2.values.tolist()))
        # reindex: plain + fill_value + method (+tolerance)
        tgt = np.sort(rng.choice(np.arange(-2, 24), 8, replace=False))
        for method, tol in ((None, None), (None, None),
                            ("ffill", None), ("bfill", None),
                            ("nearest", None), ("nearest", 1.0),
                            ("ffill", 2.0)):
            g = (ea.reindex({"t": tgt.tolist()}, method=method,
                            tolerance=tol, fill_value=fill)
                 .to_pandas().sort_values("t"))
            r = ra.reindex(t=tgt, method=method, tolerance=tol,
                           fill_value=fill)
            if not _close(g["v"].to_numpy(), r.values):
                fails.append((trial, f"reindex_{method}_{tol}",
                              g["v"].tolist(), r.values.tolist()))
    assert not fails, fails[:5]


_STR_POOL = ["", " ", "  padded  ", "Hello World", "héllo wörld", "a,b,,c",
             "UPPER lower MiXeD", "123abc456", "tab\there", "ünïcodé",
             "the quick brown fox", "  lead", "trail  ", "a|b|c", "ZZ-top",
             None, "x" * 40, "CamelCaseWord", "snake_case_word", "%%%", "-1.5"]


def test_fuzz_str_accessor_matrix(spark):
    """Round-10 pool widening: the .str matrix over adversarial strings
    (empty / None / unicode / padding / separators) vs the reference."""
    rng = np.random.default_rng(4242)
    fails = []
    ops = [
        ("upper", lambda s: s.upper(), lambda s: s.str.upper()),
        ("lower", lambda s: s.lower(), lambda s: s.str.lower()),
        ("len", lambda s: s.len(), lambda s: s.str.len()),
        ("strip", lambda s: s.strip(), lambda s: s.str.strip()),
        ("title", lambda s: s.title(), lambda s: s.str.title()),
        ("swapcase", lambda s: s.swapcase(), lambda s: s.str.swapcase()),
        ("capitalize", lambda s: s.capitalize(),
         lambda s: s.str.capitalize()),
        ("zfill8", lambda s: s.zfill(8), lambda s: s.str.zfill(8)),
        ("slice25", lambda s: s.slice(2, 5), lambda s: s.str.slice(2, 5)),
        ("startswith", lambda s: s.startswith("a"),
         lambda s: s.str.startswith("a")),
        ("contains_o", lambda s: s.contains("o"),
         lambda s: s.str.contains("o")),
        ("find_e", lambda s: s.find("e"), lambda s: s.str.find("e")),
        ("count_a", lambda s: s.count("a"), lambda s: s.str.count("a")),
        ("pad12", lambda s: s.pad(12, side="both", fillchar="*"),
         lambda s: s.str.pad(12, side="both", fillchar="*")),
        ("replace", lambda s: s.replace("o", "0"),
         lambda s: s.str.replace("o", "0")),
        ("isalpha", lambda s: s.isalpha(), lambda s: s.str.isalpha()),
        ("isdigit", lambda s: s.isdigit(), lambda s: s.str.isdigit()),
    ]
    for trial in range(max(2, TRIALS // 2)):
        n = int(rng.integers(5, 15))
        strs = [(_STR_POOL[i] if _STR_POOL[i] is not None else None)
                for i in rng.integers(0, len(_STR_POOL), n)]
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "s": strs})), dims=["t"])
        ref = xr.DataArray(np.array(strs, dtype=object), dims="t",
                           coords={"t": range(n)})
        for name, eop, rop in ops:
            try:
                r = rop(ref).values
            except Exception:  # noqa: BLE001
                continue  # reference rejects (e.g. None mixed) — skip
            g = eop(eng["s"].str).to_pandas().sort_values("t").iloc[:, -1]
            for gv, rv in zip(g.tolist(), r.tolist()):
                if gv is None and (rv is None or rv != rv):
                    continue
                if isinstance(rv, float) and isinstance(gv, (int, float)):
                    if not (np.isnan(rv) and (gv is None or np.isnan(gv))) \
                            and float(gv) != float(rv):
                        fails.append((trial, name, gv, rv))
                elif gv != rv:
                    fails.append((trial, name, gv, rv, strs))
    assert not fails, fails[:5]


def test_fuzz_dt_accessor_matrix(spark):
    """Round-10 pool widening: the .dt field/round matrix over random
    timestamps incl. pre-1970, sub-second, month/year edges."""
    rng = np.random.default_rng(2468)
    fails = []
    fields = ["year", "month", "day", "hour", "minute", "second",
              "dayofweek", "dayofyear", "quarter", "days_in_month",
              "is_month_start", "is_month_end", "is_leap_year"]
    freqs = ["h", "D", "15min", "s", "500ms", "2h"]
    for trial in range(max(2, TRIALS // 2)):
        n = int(rng.integers(5, 16))
        base = np.datetime64("1969-06-01") + rng.integers(
            -2_000_000, 200_000_000, n).astype("timedelta64[s]")
        micro = rng.integers(0, 1_000_000, n).astype("timedelta64[us]")
        ts = pd.to_datetime(base + micro)
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "ts": ts})), dims=["t"])
        ref = xr.DataArray(ts, dims="t", coords={"t": range(n)})
        for f in fields:
            g = (getattr(eng["ts"].dt, f).to_pandas().sort_values("t")
                 .iloc[:, -1].to_numpy())
            r = getattr(ref.dt, f).values
            if not np.array_equal(np.asarray(g, dtype="int64"),
                                  np.asarray(r, dtype="int64")):
                fails.append((trial, f, g.tolist(), r.tolist()))
        for fq in freqs:
            for verb in ("floor", "ceil", "round"):
                g = (getattr(eng["ts"].dt, verb)(fq).to_pandas()
                     .sort_values("t").iloc[:, -1])
                r = getattr(ref.dt, verb)(fq).values
                gl = [pd.Timestamp(x) for x in g]
                rl = [pd.Timestamp(x) for x in r]
                if gl != rl:
                    fails.append((trial, f"{verb}_{fq}", gl[:3], rl[:3]))
    assert not fails, fails[:5]


def test_fuzz_var_dims_offset(spark):
    """Round-10 verdict #6 proof: the constructor-broadcast var_dims
    frames now take the demeaned two-pass through _reduce's/_agg's
    per-stage _pre hook — drive exactly that path (partial dim overlap)
    with offset-1e8/1e12 data, where the old single-pass formula
    drifted 4e-6 rel, and demand near-exactness."""
    rng = np.random.default_rng(1012)
    fails = []
    for trial in range(TRIALS):
        nx, ny = int(rng.integers(2, 5)), int(rng.integers(2, 6))
        offset = float(rng.choice([1e8, 1e12]))
        grid = rng.normal(0.0, 1.0, (nx, ny)) + offset
        u = rng.normal(0.0, 1.0, nx) + offset
        spec = dict(data_vars={"t": (("x", "y"), grid), "u": ("x", u)},
                    coords={"x": list(range(nx)), "y": list(range(ny))})
        r = xr.Dataset(**spec)
        o = XDataset(**spec)
        for dims, ddof in ((["x", "y"], 0), (["x", "y"], 1), (["x"], 0)):
            for op in ("var", "std"):
                g = getattr(o, op)(dims if len(dims) > 1 else dims[0],
                                   ddof=ddof).to_pandas()
                rr = getattr(r, op)(dims if len(dims) > 1 else dims[0],
                                    ddof=ddof)
                for col in ("u", "t"):
                    gv = np.asarray(g[col], dtype="float64")
                    rv = np.atleast_1d(np.asarray(rr[col].values, "float64"))
                    if rv.size == 1 and gv.size > 1:
                        # reduced-to-scalar var broadcast over the kept
                        # dim's long-form rows
                        rv = np.full(gv.size, rv[0])
                    # tolerance scales with the offset: the group
                    # MEAN's sum-order nondeterminism (Spark partial
                    # order vs numpy pairwise) perturbs the demeaned
                    # variance by (Δμ)² ≈ (n·ulp(Σ)/2n)² — ~1e-6 rel at
                    # offset 1e12, ~5e-9 at 1e8.  The guarded bug class
                    # (single-pass moment identity) is 0.0-or-percent
                    # WRONG at 1e12 and survives this gate's margin.
                    tol = 1e-7 if offset <= 1e8 else 5e-6
                    if not _close(np.sort(gv), np.sort(rv), rtol=tol):
                        fails.append((trial, f"{col}_{op}", dims, ddof,
                                      offset, gv.tolist(), rv.tolist()))
    assert not fails, fails[:5]


def test_fuzz_resample_matrix(spark):
    """Round-10 standing resample fuzz: random irregular timestamps
    (pre/post-1970, fractional seconds) × freq × closed × label × agg,
    full-label-run comparison (empty bins included) vs the reference.
    Two span regimes keep the densify label run bounded: calendar
    freqs over day/month-scale spans, sub-second freqs over
    second-scale spans."""
    rng = np.random.default_rng(5050)
    cal_freqs = ["2h", "7h", "D", "3D", "W", "W-WED", "2W", "3W-THU",
                 "MS", "ME", "2MS", "QS", "QE", "90min", "11h"]
    sub_freqs = ["500ms", "50ms", "2ms", "250us", "10s", "3s"]
    aggs = ["sum", "mean", "count", "min", "max", "var", "std"]
    fails = []
    for trial in range(TRIALS * 2):
        n = int(rng.integers(5, 28))
        subsec = bool(rng.integers(0, 2))
        start = (pd.Timestamp("1969-01-01")
                 + pd.Timedelta(seconds=int(rng.integers(0, 157680000))))
        if subsec:
            deltas = np.unique(rng.integers(1, 60_000_000, n))  # ≤60 s
            ts = start + pd.to_timedelta(deltas, unit="us")
            freq = sub_freqs[int(rng.integers(0, len(sub_freqs)))]
        else:
            deltas = np.unique(rng.integers(1, 500 * 86_400_000, n))
            ts = start + pd.to_timedelta(deltas, unit="ms")
            freq = cal_freqs[int(rng.integers(0, len(cal_freqs)))]
        n = len(deltas)
        vals = _draw(rng, n, inf_ok=False)
        closed = [None, "left", "right"][int(rng.integers(0, 3))]
        label = [None, "left", "right"][int(rng.integers(0, 3))]
        agg = aggs[int(rng.integers(0, len(aggs)))]
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": ts, "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": ts})
        try:
            r = getattr(ref.resample(t=freq, closed=closed, label=label),
                        agg)()
        except Exception:  # noqa: BLE001
            continue  # reference itself rejects the combo
        g = getattr(eng.resample({"t": freq}, closed=closed, label=label),
                    agg)().to_pandas().sort_values("t")
        exp_t = [pd.Timestamp(x) for x in r["t"].values]
        got_t = [pd.Timestamp(x) for x in g["t"]]
        if got_t != exp_t:
            fails.append((trial, freq, closed, label, agg, "labels",
                          got_t[:4], exp_t[:4]))
            continue
        gv = np.asarray([np.nan if x is None else x for x in g["v"]],
                        "float64")
        rv = np.asarray(r.values, "float64")
        if not _close(gv, rv):
            fails.append((trial, freq, closed, label, agg,
                          gv.tolist(), rv.tolist(), str(ts[0])))
    assert not fails, fails[:4]


def test_fuzz_resample_upsample_verbs(spark):
    """Round-11 new family (round-10 verdict #6): the upsample verbs
    asfreq/pad/bfill/nearest/interpolate over IRREGULAR gaps — the
    semantics changed in round 10 (verbs operate on the ORIGINAL
    series; asfreq == bin mean) so the matrix gets its own draw.
    Full label-run comparison vs the reference."""
    rng = np.random.default_rng(1111)
    freqs = ["2h", "6h", "D", "12h", "3h", "8h"]
    verbs = ["asfreq", "pad", "bfill", "nearest", "interpolate"]
    fails = []
    for trial in range(TRIALS * 2):
        n = int(rng.integers(4, 22))
        start = (pd.Timestamp("1969-06-01")
                 + pd.Timedelta(seconds=int(rng.integers(0, 63072000))))
        deltas = np.unique(rng.integers(1, 12 * 86_400_000, n))  # <=12d
        ts = start + pd.to_timedelta(deltas, unit="ms")
        n = len(deltas)
        vals = _draw(rng, n, nan_frac=0.15, inf_ok=False)
        freq = freqs[int(rng.integers(0, len(freqs)))]
        verb = verbs[int(rng.integers(0, len(verbs)))]
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": ts, "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": ts})
        try:
            r = getattr(ref.resample(t=freq), verb)()
        except Exception:  # noqa: BLE001
            continue
        g = (getattr(eng.resample({"t": freq}), verb)()
             .to_pandas().sort_values("t"))
        exp_t = [pd.Timestamp(x) for x in r["t"].values]
        got_t = [pd.Timestamp(x) for x in g["t"]]
        if got_t != exp_t:
            fails.append((trial, freq, verb, "labels", got_t[:4],
                          exp_t[:4], str(ts[0])))
            continue
        gv = np.asarray([np.nan if x is None else x for x in g["v"]],
                        "float64")
        rv = np.asarray(r.values, "float64")
        if not _close(gv, rv):
            fails.append((trial, freq, verb, gv.tolist(), rv.tolist(),
                          str(ts[0])))
    assert not fails, fails[:4]


def test_fuzz_groupby_binary_transform(spark):
    """Round-11 new family (round-10 verdict #6): groupby BINARY OPS
    (the transform/broadcast-back pattern — ds.groupby(k) - mean) and
    groupby.map identity/shift transforms, adversarial values, vs the
    reference."""
    rng = np.random.default_rng(2222)
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(4, 24))
        vals = _draw(rng, n, inf_ok=False)
        keys = rng.integers(0, 3, n)
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "k": keys, "v": vals})),
            dims=["t"], coords={"k": ("t",)})
        ref = xr.DataArray(vals, dims="t",
                           coords={"t": range(n), "k": ("t", keys)})
        for op, sym in (("mean", "-"), ("sum", "-"), ("max", "/"),
                        ("mean", "+")):
            agg_e = getattr(eng.groupby("k"), op)()
            agg_r = getattr(ref.groupby("k"), op)()
            if sym == "-":
                ge = eng.groupby("k") - agg_e
                rr = ref.groupby("k") - agg_r
            elif sym == "+":
                ge = eng.groupby("k") + agg_e
                rr = ref.groupby("k") + agg_r
            else:
                ge = eng.groupby("k") / agg_e
                rr = ref.groupby("k") / agg_r
            g = ge.to_pandas().sort_values("t")["v"].to_numpy()
            r = rr.sortby("t").values
            if not _close(g, r):
                fails.append((trial, f"gb{sym}{op}", g.tolist(),
                              r.tolist(), vals.tolist()))
    assert not fails, fails[:4]


def test_fuzz_nd_rolling(spark):
    """Round-11 new family: N-D rolling var/std/median/mean/prod over
    random dense grids with NaN holes vs the reference (random window
    rectangle, min_periods, center)."""
    rng = np.random.default_rng(3333)
    fails = []
    for trial in range(max(2, TRIALS // 2)):
        nx, ny = int(rng.integers(3, 8)), int(rng.integers(3, 8))
        a = rng.normal(0, 10, (nx, ny))
        a[rng.random((nx, ny)) < 0.25] = np.nan
        wx = int(rng.integers(2, min(4, nx) + 1))
        wy = int(rng.integers(2, min(4, ny) + 1))
        minp = int(rng.integers(1, wx * wy + 1))
        center = bool(rng.integers(0, 2))
        rows = [(i, j, None if np.isnan(a[i, j]) else float(a[i, j]))
                for i in range(nx) for j in range(ny)]
        pdf = pd.DataFrame(rows, columns=["x", "y", "v"])
        pdf["v"] = pdf["v"].astype("float64")
        eng = XDataset(spark.createDataFrame(pdf), dims=["x", "y"],
                       data_vars=["v"])
        da = xr.DataArray(a, dims=["x", "y"])
        for op in ("var", "std", "median", "mean", "prod", "count",
                   "min", "max", "sum"):
            g = (getattr(eng.rolling(dict(x=wx, y=wy), min_periods=minp,
                                     center=center), op)()
                 .to_pandas().sort_values(["x", "y"])["v"]
                 .to_numpy(dtype="float64", na_value=np.nan)
                 .reshape(nx, ny))
            r = np.asarray(getattr(
                da.rolling(x=wx, y=wy, min_periods=minp, center=center),
                op)().values, "float64")
            if not _close(g, r):
                fails.append((trial, op, wx, wy, minp, center,
                              g.tolist(), r.tolist()))
    assert not fails, fails[:3]


def test_fuzz_coarsen_boundary_matrix(spark):
    """Round-11 extension: coarsen boundary x side x reduction over
    adversarial values — the standing coarsen draw only exercised
    boundary='trim'."""
    rng = np.random.default_rng(4444)
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(4, 20))
        vals = _draw(rng, n, inf_ok=False)
        wsz = int(rng.integers(2, 5))
        boundary = ["trim", "pad", "exact"][int(rng.integers(0, 3))]
        side = ["left", "right"][int(rng.integers(0, 2))]
        if boundary == "exact" and n % wsz:
            continue
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": range(n)})
        for op in ("mean", "sum", "max", "std", "count", "median"):
            try:
                r = getattr(ref.coarsen(t=wsz, boundary=boundary,
                                        side=side), op)()
            except Exception:  # noqa: BLE001
                continue
            g = (getattr(eng.coarsen({"t": wsz}, boundary=boundary,
                                     side=side), op)()
                 .to_pandas().sort_values("t"))
            gv = np.asarray([np.nan if x is None else x for x in g["v"]],
                            "float64")
            rv = np.asarray(r.values, "float64")
            if not _close(gv, rv):
                fails.append((trial, op, wsz, boundary, side,
                              gv.tolist(), rv.tolist(), vals.tolist()))
    assert not fails, fails[:4]


def test_fuzz_interpolate_na_params(spark):
    """Round-11 extension: interpolate_na method x limit x max_gap on
    irregular coordinates (the standing draw fixed method='linear'
    with no limit)."""
    rng = np.random.default_rng(5555)
    fails = []
    methods = ["linear", "nearest", "zero", "slinear"]
    for trial in range(TRIALS):
        n = int(rng.integers(5, 22))
        vals = _draw(rng, n, nan_frac=0.45, inf_ok=False)
        # irregular, strictly increasing coordinate
        x = np.cumsum(rng.integers(1, 5, n)).astype("float64")
        method = methods[int(rng.integers(0, len(methods)))]
        limit = [None, 1, 2][int(rng.integers(0, 3))]
        max_gap = [None, 3.0, 6.0][int(rng.integers(0, 3))]
        if limit is not None and max_gap is not None:
            max_gap = None  # reference rejects combining them? keep axes separate
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": x, "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": x})
        try:
            r = ref.interpolate_na("t", method=method, limit=limit,
                                   max_gap=max_gap)
        except Exception:  # noqa: BLE001
            continue
        g = (eng.interpolate_na("t", method=method, limit=limit,
                                max_gap=max_gap)
             .to_pandas().sort_values("t"))
        gv = np.asarray([np.nan if v is None else v for v in g["v"]],
                        "float64")
        rv = np.asarray(r.values, "float64")
        if not _close(gv, rv):
            fails.append((trial, method, limit, max_gap, gv.tolist(),
                          rv.tolist(), vals.tolist(), x.tolist()))
    assert not fails, fails[:4]


def test_fuzz_pad_modes(spark):
    """Round-11 extension: pad mode x width matrix vs the reference
    (the wave pins fixed a few shapes; the mode surface is wide)."""
    rng = np.random.default_rng(6666)
    modes = ["constant", "edge", "reflect", "symmetric", "wrap",
             "maximum", "minimum", "mean", "linear_ramp", "median"]
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(4, 14))
        vals = _draw(rng, n, nan_frac=0.1, inf_ok=False)
        before = int(rng.integers(0, 4))
        after = int(rng.integers(0, 4))
        if before == after == 0:
            continue
        if before >= n or after >= n:
            continue  # reflect/wrap need width < n
        mode = modes[int(rng.integers(0, len(modes)))]
        kw = {}
        if mode == "constant":
            kw["constant_values"] = float(rng.choice([0.0, -3.5]))
        elif mode in ("maximum", "minimum", "mean", "median") \
                and rng.integers(0, 2):
            kw["stat_length"] = int(rng.integers(1, n))
        elif mode == "linear_ramp" and rng.integers(0, 2):
            kw["end_values"] = float(rng.choice([0.0, 5.0, -2.5]))
        elif mode in ("reflect", "symmetric") and rng.integers(0, 2):
            kw["reflect_type"] = "odd"
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": range(n)})
        try:
            r = ref.pad(t=(before, after), mode=mode, **kw)
        except Exception:  # noqa: BLE001
            continue
        try:
            g = (eng.pad(t=(before, after), mode=mode, **kw)
                 .to_pandas().sort_values("t"))
        except NotImplementedError:
            continue  # documented engine stance, if any
        gv = np.asarray([np.nan if v is None else v for v in g["v"]],
                        "float64")
        rv = np.asarray(r.values, "float64")
        if not _close(gv, rv):
            fails.append((trial, mode, before, after, gv.tolist(),
                          rv.tolist(), vals.tolist()))
    assert not fails, fails[:4]


def test_fuzz_shift_roll_diff(spark):
    """Round-11 extension: shift(fill_value) / roll(roll_coords) /
    diff(n, label) parameter draws."""
    rng = np.random.default_rng(7777)
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(4, 18))
        vals = _draw(rng, n, inf_ok=False)
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": range(n)})
        k = int(rng.integers(-3, 4))
        fv = rng.choice([None, 0.0, -9.5])
        fv = None if fv is None else float(fv)
        g = (eng.shift({"t": k}, fill_value=fv).to_pandas()
             .sort_values("t")["v"].to_numpy())
        r = (ref.shift(t=k, fill_value=np.nan if fv is None else fv)
             .values)
        if not _close(g, r):
            fails.append((trial, "shift", k, fv, g.tolist(), r.tolist()))
        g = (eng.roll({"t": k}).to_pandas().sort_values("t")["v"]
             .to_numpy())
        r = ref.roll(t=k).values
        if not _close(g, r):
            fails.append((trial, "roll", k, g.tolist(), r.tolist()))
        nd = int(rng.integers(1, 4))
        lab = ["upper", "lower"][int(rng.integers(0, 2))]
        if nd < n:
            gdf = eng.diff("t", n=nd, label=lab).to_pandas().sort_values("t")
            rr = ref.diff("t", n=nd, label=lab)
            if (gdf["t"].tolist() != list(rr["t"].values)
                    or not _close(gdf["v"].to_numpy(), rr.values)):
                fails.append((trial, "diff", nd, lab,
                              gdf["v"].tolist(), rr.values.tolist()))
    assert not fails, fails[:4]


def test_fuzz_2d_reduce_dims(spark):
    """Round-11 extension: reductions over dim SUBSETS of a 2-D grid
    (one dim / the other / both) with adversarial values — exercises
    the kept-dims plumbing rather than the scalar path."""
    rng = np.random.default_rng(8888)
    fails = []
    for trial in range(TRIALS):
        nx, ny = int(rng.integers(2, 6)), int(rng.integers(2, 6))
        a = _draw(rng, nx * ny, inf_ok=False).reshape(nx, ny)
        rows = [(i, j, None if np.isnan(a[i, j]) else float(a[i, j]))
                for i in range(nx) for j in range(ny)]
        pdf = pd.DataFrame(rows, columns=["x", "y", "v"])
        pdf["v"] = pdf["v"].astype("float64")
        eng = XDataset(spark.createDataFrame(pdf), dims=["x", "y"],
                       data_vars=["v"])
        ref = xr.DataArray(a, dims=["x", "y"])
        for dims in ("x", "y", ["x", "y"]):
            for op in ("sum", "mean", "std", "var", "median", "min",
                       "prod"):
                gds = getattr(eng, op)(dims if isinstance(dims, list)
                                       else dims)
                gp = gds.to_pandas()
                kept = [c for c in ("x", "y") if c in gp.columns]
                gv = (gp.sort_values(kept)["v"].to_numpy()
                      if kept else np.array([gp["v"].iloc[0]]))
                rv = np.atleast_1d(np.asarray(
                    getattr(ref, op)(dim=dims).values, "float64"))
                if not _close(gv, rv):
                    fails.append((trial, op, dims, gv.tolist(),
                                  rv.tolist()))
    assert not fails, fails[:4]


def test_fuzz_cumulative_min_periods(spark):
    """Round-11 extension: cumulative (unbounded-preceding rolling) ops
    x min_periods over adversarial values."""
    rng = np.random.default_rng(9999)
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(3, 18))
        vals = _draw(rng, n, inf_ok=False)
        minp = int(rng.integers(1, 4))
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"t": range(n), "v": vals})), dims=["t"])
        ref = xr.DataArray(vals, dims="t", coords={"t": range(n)})
        for op in ("sum", "mean", "min", "max", "count", "std", "var",
                   "median", "prod"):
            try:
                r = getattr(ref.cumulative("t", min_periods=minp), op)()
            except Exception:  # noqa: BLE001
                continue
            g = (getattr(eng.cumulative("t", min_periods=minp), op)()
                 .to_pandas().sort_values("t")["v"].to_numpy())
            rv = np.asarray(r.values, "float64")
            if not _close(g, rv):
                fails.append((trial, op, minp, g.tolist(), rv.tolist(),
                              vals.tolist()))
    assert not fails, fails[:4]


def test_fuzz_stack_unstack_roundtrip(spark):
    """Round-11 extension: stack/unstack over random dense 2-D grids —
    values survive the roundtrip and the stacked long-form multiset
    matches the reference's stacked array."""
    rng = np.random.default_rng(12121)
    fails = []
    for trial in range(TRIALS):
        nx, ny = int(rng.integers(2, 6)), int(rng.integers(2, 6))
        a = _draw(rng, nx * ny, inf_ok=False).reshape(nx, ny)
        rows = [(i, j, None if np.isnan(a[i, j]) else float(a[i, j]))
                for i in range(nx) for j in range(ny)]
        pdf = pd.DataFrame(rows, columns=["x", "y", "v"])
        pdf["v"] = pdf["v"].astype("float64")
        eng = XDataset(spark.createDataFrame(pdf), dims=["x", "y"],
                       data_vars=["v"])
        ref = xr.DataArray(a, dims=["x", "y"],
                           coords={"x": range(nx), "y": range(ny)})
        st = eng.stack(z=("x", "y"))
        rst = ref.stack(z=("x", "y"))
        gp = st.to_pandas()
        gv = np.sort(gp["v"].to_numpy(dtype="float64", na_value=np.nan))
        rv = np.sort(np.asarray(rst.values, "float64"))
        if not _close(gv, rv):
            fails.append((trial, "stack_values", gv.tolist(), rv.tolist()))
        back = st.unstack("z").to_pandas().sort_values(["x", "y"])
        bv = back["v"].to_numpy(dtype="float64", na_value=np.nan)
        ov = a.reshape(-1)
        if not _close(np.sort(bv), np.sort(ov)):
            fails.append((trial, "roundtrip", bv.tolist(), ov.tolist()))
    assert not fails, fails[:4]


def test_fuzz_groupby_time_resampler(spark):
    """Round-11 extension: a bare TimeResampler through groupby()
    (alone and composed with a UniqueGrouper) must bin exactly like
    resample() — fixed-width widths anchor at origin (default
    start_day), calendar multiples at the first unit block.  Found
    round 11: '2D' through groupby binned on the EPOCH grid."""
    from xarray.groupers import TimeResampler as RefTR
    from xarray.groupers import UniqueGrouper as RefUG
    from xarray_spark.groupers import TimeResampler, UniqueGrouper
    rng = np.random.default_rng(13131)
    freqs = ["2D", "3D", "D", "7h", "2MS", "W", "2W", "36h"]
    fails = []
    for trial in range(TRIALS):
        n = int(rng.integers(6, 25))
        start = (pd.Timestamp("1999-01-01")
                 + pd.Timedelta(hours=int(rng.integers(0, 50000))))
        ts = start + pd.to_timedelta(
            np.unique(rng.integers(1, 90 * 24, n)), unit="h")
        n = len(ts)
        vals = _draw(rng, n, inf_ok=False)
        keys = rng.integers(0, 2, n)
        freq = freqs[int(rng.integers(0, len(freqs)))]
        compose = bool(rng.integers(0, 2))
        eng = XDataset(spark.createDataFrame(
            pd.DataFrame({"s": range(n), "t": ts, "k": keys,
                          "v": vals})),
            dims=["s"], coords={"t": ("s",), "k": ("s",)})
        ref = xr.DataArray(vals, dims="s",
                           coords={"t": ("s", ts), "k": ("s", keys)})
        try:
            if compose:
                r = ref.groupby(t=RefTR(freq), k=RefUG()).sum()
            else:
                r = ref.groupby(t=RefTR(freq)).sum()
        except Exception:  # noqa: BLE001
            continue
        if compose:
            g = eng.groupby({"t": TimeResampler(freq),
                             "k": UniqueGrouper()}).sum().to_pandas()
            gd = {(str(pd.Timestamp(row["t"])), int(row["k"])): row["v"]
                  for _, row in g.iterrows()}
            rd = {}
            for i, tv in enumerate(r["t"].values):
                for j, kv in enumerate(r["k"].values):
                    x = float(np.asarray(r.values)[i, j])
                    if x == x:
                        rd[(str(pd.Timestamp(tv)), int(kv))] = x
            ok = (set(gd) == set(rd)
                  and _close([gd[k] for k in sorted(gd)],
                             [rd[k] for k in sorted(rd)]))
        else:
            g = eng.groupby({"t": TimeResampler(freq)}).sum() \
                .to_pandas().sort_values("t")
            ok = ([pd.Timestamp(x) for x in g["t"]]
                  == [pd.Timestamp(x) for x in r["t"].values]
                  and _close(g["v"].to_numpy(),
                             np.asarray(r.values, "float64")))
        if not ok:
            fails.append((trial, freq, compose, str(ts[0])))
    assert not fails, fails[:4]


def test_fuzz_concat_matrix(spark):
    """Round-12 family: the concat parameter matrix — draw
    (data_vars, coords, compat, join) over 2-3 datasets whose
    variables randomly (dis)agree / go missing, and require the engine
    and the reference to produce the same per-var values+dims or raise
    the same error class."""
    from xarray_spark.combine import concat as econcat
    from xarray_spark.errors import MergeError
    rng = np.random.default_rng(12012)
    fails = []
    for trial in range(TRIALS):
        nds = int(rng.integers(2, 4))
        ny = 3
        yl = [10, 20, 30]
        u_vals = [float(rng.choice([5.0, 5.0, 6.0])) for _ in range(nds)]
        w_same = rng.random() < 0.5
        w_base = _draw(rng, ny, nan_frac=0.3, inf_ok=False)
        z_in = [bool(rng.random() < 0.7) for _ in range(nds)]
        z_in[int(rng.integers(0, nds))] = True
        engs, refs = [], []
        x0 = 0
        for i in range(nds):
            nx = int(rng.integers(1, 4))
            xs = list(range(x0, x0 + nx)); x0 += nx
            v = _draw(rng, nx * ny, inf_ok=False).reshape(nx, ny)
            w = (w_base if w_same or i == 0
                 else _draw(rng, ny, nan_frac=0.3, inf_ok=False))
            dvars = {"v": (("x", "y"), v), "u": ((), u_vals[i]),
                     "w": (("y",), w)}
            if z_in[i]:
                dvars["z"] = (("x", "y"),
                              _draw(rng, nx * ny, inf_ok=False)
                              .reshape(nx, ny))
            engs.append(XDataset(dict(dvars), coords={"x": xs, "y": yl}))
            refs.append(xr.Dataset(dict(dvars),
                                   coords={"x": xs, "y": yl}))
        dv = ["all", "minimal", "different", None][int(rng.integers(0, 4))]
        co = ["minimal", "different", "all"][int(rng.integers(0, 3))]
        compat = ["equals", "override", "no_conflicts",
                  "broadcast_equals"][int(rng.integers(0, 4))]
        join = "outer"
        dim = ["x", "e"][int(rng.integers(0, 2))]      # existing / new
        fv = [None, -7.5][int(rng.integers(0, 2))]
        kw = dict(dim=dim, data_vars=dv, coords=co, compat=compat,
                  join=join)
        if fv is not None:
            kw["fill_value"] = fv
        rerr = gerr = None
        try:
            r = xr.concat(refs, **kw)
        except Exception as ex:  # noqa: BLE001
            rerr = type(ex).__name__
        try:
            g = econcat(engs, **kw)
            gp = g.to_pandas()
        except MergeError:
            gerr = "MergeError"
        except Exception as ex:  # noqa: BLE001
            gerr = type(ex).__name__
        if rerr or gerr:
            # both sides must fail; exact class may differ between the
            # reference's MergeError/ValueError surfaces
            if (rerr is None) != (gerr is None):
                fails.append((trial, kw, "err-mismatch", rerr, gerr))
            continue
        for var in r.data_vars:
            rv = r[var]
            vd = tuple(g.var_dims.get(var, g.dims))
            if set(vd) != set(rv.dims):
                fails.append((trial, kw, var, "dims", vd, rv.dims))
                continue
            if vd:
                sub = (gp[list(vd) + [var]]
                       .drop_duplicates(subset=list(vd))
                       .sort_values(list(vd)))
                got = sub[var].to_numpy()
                exp = rv.transpose(*vd).values.ravel()
            else:
                got = gp[[var]].head(1)[var].to_numpy()
                exp = np.array([float(rv.values)])
            if not _close(got, exp):
                fails.append((trial, kw, var, got.tolist(),
                              np.asarray(exp).tolist()))
    assert not fails, fails[:4]


def test_fuzz_where_drop_dropna_thresh(spark):
    """Round-12 family (verdict #5): where(cond, drop=True) and
    dropna(dim, how/thresh) — the two §2 selection surfaces with the
    thinnest fuzz coverage."""
    rng = np.random.default_rng(12013)
    fails = []
    for trial in range(TRIALS):
        nx, ny = int(rng.integers(2, 6)), int(rng.integers(2, 5))
        v = _draw(rng, nx * ny, nan_frac=0.35, inf_ok=False) \
            .reshape(nx, ny)
        xs, yl = list(range(nx)), [10 * (j + 1) for j in range(ny)]
        eng = XDataset({"v": (("x", "y"), v)},
                       coords={"x": xs, "y": yl})
        ref = xr.Dataset({"v": (("x", "y"), v)},
                         coords={"x": xs, "y": yl})
        thr = float(rng.choice([-1.0, 0.0, 2.5]))
        # where(cond, drop=True)
        g = (eng.where(eng["v"] > thr, drop=True).to_pandas())
        r = ref.where(ref["v"] > thr, drop=True)
        rx = list(np.asarray(r["x"].values))
        ry = list(np.asarray(r["y"].values))
        gx = sorted(set(g["x"])) if len(g) else []
        gy = sorted(set(g["y"])) if len(g) else []
        if gx != rx or gy != ry:
            fails.append((trial, "where-drop-labels", gx, rx, gy, ry))
        elif len(g):
            gv = (g.sort_values(["x", "y"])["v"]
                  .to_numpy().reshape(len(rx), len(ry)))
            if not _close(gv, r["v"].values):
                fails.append((trial, "where-drop-values"))
        # dropna over each dim: how x thresh
        for d in ("x", "y"):
            for how, th in (("any", None), ("all", None), (None, 1),
                            (None, ny if d == "x" else nx)):
                kw = (dict(how=how) if th is None else dict(thresh=th))
                g = eng.dropna(d, **kw).to_pandas()
                r = ref.dropna(d, **kw)
                rlab = list(np.asarray(r[d].values))
                glab = sorted(set(g[d])) if len(g) else []
                if glab != rlab:
                    fails.append((trial, f"dropna-{d}-{how}-{th}",
                                  glab, rlab))
                elif len(g):
                    od = ["x", "y"]
                    gv = (g.sort_values(od)["v"].to_numpy()
                          .reshape(len(set(g["x"])), len(set(g["y"]))))
                    if not _close(gv, r["v"].values):
                        fails.append((trial,
                                      f"dropna-vals-{d}-{how}-{th}"))
    assert not fails, fails[:4]
