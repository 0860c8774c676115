"""Regression tests for the round-2 advisory fixes:

- resample upsample interval for n-multiple freqs ('7D' must stride 7
  days, not 49)
- rolling_segmented halo chaining across undersized/skewed segments
- drop_duplicates deterministic survivor
- reindex fill_value touching only introduced positions
- eval() routing comparisons to the expression path
"""

import pytest
from pyspark.sql import functions as F

from xarray_spark import XDataset
from xarray_spark.alignment import reindex
from xarray_spark.segmented import rolling_segmented


def test_resample_asfreq_7d_calendar(spark):
    import datetime as dt
    rows = [
        {"t": dt.datetime(2000, 1, 1) + dt.timedelta(days=14 * i), "v": float(i)}
        for i in range(4)
    ]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    out = d.resample(t="7D").asfreq().df.orderBy("t").collect()
    # span is 42 days -> 7 weekly labels, every second one populated
    assert len(out) == 7
    got = [r["t"] for r in out]
    assert all((got[i + 1] - got[i]).days == 7 for i in range(6))
    assert [r["v"] for r in out] == [0.0, None, 1.0, None, 2.0, None, 3.0]


def test_rolling_segmented_skewed_segments(spark):
    # one label occupies 80% of rows: approxQuantile cuts collapse and
    # several segments end up undersized/empty — the chained halo must
    # still reproduce the global window exactly
    # v is constant per label so the rolling result is well-defined even
    # though tie order among duplicate labels is arbitrary
    rows = [
        {"t": 0 if i < 400 else i - 399, "v": 1.0 if i < 400 else float(i - 399)}
        for i in range(500)
    ]
    d = XDataset(spark.createDataFrame(rows, "t int, v double"), dims=["t"])
    g = d.rolling(t=9, min_periods=2).sum().df.orderBy("t", "v").collect()
    s = rolling_segmented(d, "t", 9, "sum", min_periods=2, n_segments=16)
    got = [r["v"] for r in s.df.orderBy("t", "v").collect()]
    want = [r["v"] for r in g]
    assert got == pytest.approx(want)


def test_rolling_segmented_window_larger_than_segments(spark):
    # window >> segment size: a frame spans MANY segments; halo must chain
    rows = [{"t": i, "v": 1.0} for i in range(100)]
    d = XDataset(spark.createDataFrame(rows, "t int, v double"), dims=["t"])
    g = d.rolling(t=40, min_periods=1).sum().df.orderBy("t").collect()
    s = rolling_segmented(d, "t", 40, "sum", min_periods=1, n_segments=20)
    assert [r["v"] for r in s.df.orderBy("t").collect()] == [r["v"] for r in g]


def test_drop_duplicates_deterministic(spark):
    rows = [
        {"t": 1, "v": 5.0}, {"t": 1, "v": 2.0}, {"t": 1, "v": 9.0},
        {"t": 2, "v": 7.0}, {"t": 2, "v": 1.0},
    ]
    d = XDataset(spark.createDataFrame(rows, "t int, v double"), dims=["t"])
    first = {(r["t"], r["v"]) for r in d.drop_duplicates("t").df.collect()}
    last = {(r["t"], r["v"]) for r in d.drop_duplicates("t", keep="last").df.collect()}
    assert first == {(1, 2.0), (2, 1.0)}
    assert last == {(1, 9.0), (2, 7.0)}


def test_reindex_fill_value_preserves_genuine_nulls(spark):
    rows = [{"t": 1, "v": None}, {"t": 2, "v": 5.0}]
    d = XDataset(spark.createDataFrame(rows, "t int, v double"), dims=["t"])
    out = reindex(d, {"t": [1, 2, 3]}, fill_value=-1.0)
    got = {r["t"]: r["v"] for r in out.df.collect()}
    # t=1 matched with a genuine null -> stays null; t=3 introduced -> filled
    assert got[1] is None and got[2] == 5.0 and got[3] == -1.0


def _brute_force_simhash_pairs(spark, docs, k):
    from xarray_spark.extras.dedup import simhash
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = simhash(df).collect()
    hs = {r["doc_id"]: r["simhash"] for r in rows}
    ids = sorted(hs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= k:
                want.add((a, b))
    return df, want


@pytest.mark.parametrize("k", [3, 10])
def test_simhash_near_dups_recall_brute_force(spark, k):
    # clustered corpora: docs within a cluster share most tokens, so many
    # true pairs land in the 4..10 hamming band the old 4-block bucketing
    # silently dropped
    docs = []
    for c in range(8):
        base = [f"w{c}_{j}" for j in range(30)]
        for v in range(5):
            toks = list(base)
            toks[v] = f"alt{c}_{v}"
            toks[(v * 7) % 30] = f"alt2{c}_{v}"
            docs.append((c * 10 + v, " ".join(toks)))
    from xarray_spark.extras.dedup import simhash_near_dups
    df, want = _brute_force_simhash_pairs(spark, docs, k)
    got = {(r["id_a"], r["id_b"]) for r in simhash_near_dups(df, max_hamming=k).collect()}
    assert got == want
    if k == 10:
        assert want, "test corpus should contain hamming<=10 pairs"


VALUES = [((i * 73) % 89) * 0.5 - 11.0 for i in range(211)]
QS = [0.0, 0.1, 0.25, 0.5, 0.731, 0.9, 1.0]


@pytest.mark.parametrize("method", [
    "linear", "lower", "higher", "nearest", "midpoint",
    "inverted_cdf", "averaged_inverted_cdf", "closest_observation",
    "interpolated_inverted_cdf", "hazen", "weibull",
    "median_unbiased", "normal_unbiased",
])
def test_quantile_methods_match_numpy(spark, method):
    import numpy as np
    rows = [{"t": i, "v": v} for i, v in enumerate(VALUES)]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    got = {r["quantile"]: r["v"] for r in d.quantile(QS, method=method).df.collect()}
    want = np.quantile(np.array(VALUES), QS, method=method)
    for q, w in zip(QS, want):
        assert got[q] == pytest.approx(w, abs=1e-12), (method, q)


@pytest.mark.parametrize("method", ["lower", "weibull", "nearest", "closest_observation"])
def test_grouped_quantile_methods_match_numpy(spark, method):
    import numpy as np
    rows = [{"g": i % 3, "t": i, "v": v} for i, v in enumerate(VALUES)]
    d = XDataset(spark.createDataFrame(rows), dims=["g", "t"])
    out = d.quantile([0.25, 0.5, 0.9], dim="t", method=method).df.collect()
    got = {(r["g"], r["quantile"]): r["v"] for r in out}
    for g in range(3):
        vals = np.array([v for i, v in enumerate(VALUES) if i % 3 == g])
        want = np.quantile(vals, [0.25, 0.5, 0.9], method=method)
        for q, w in zip([0.25, 0.5, 0.9], want):
            assert got[(g, q)] == pytest.approx(w, abs=1e-12), (method, g, q)


def test_ungrouped_quantile_plan_has_no_percentile_buffer(spark):
    import numpy as np
    rows = [{"t": i, "v": v} for i, v in enumerate(VALUES)]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    out = d.quantile([0.5, 0.9])
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "percentile(" not in plan
    got = {r["quantile"]: r["v"] for r in out.df.collect()}
    assert got[0.5] == pytest.approx(float(np.median(VALUES)))
    med = d.median()
    assert med.df.collect()[0]["v"] == pytest.approx(float(np.median(VALUES)))


def test_interpolate_na_zero_hold(spark):
    rows = [
        {"t": 0, "v": 1.0}, {"t": 1, "v": None}, {"t": 2, "v": None},
        {"t": 3, "v": 4.0}, {"t": 4, "v": None},
    ]
    d = XDataset(spark.createDataFrame(rows, "t int, v double"), dims=["t"])
    got = {r["t"]: r["v"] for r in d.interpolate_na("t", method="zero").df.collect()}
    # interior gaps hold the previous value; the trailing null stays null
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 3: 4.0, 4: None}


def test_interpolate_na_quadratic_exact_on_parabola(spark):
    # y = x^2 with interior holes: order-2 Lagrange recovers it exactly
    rows = [{"t": float(i), "v": float(i * i) if i % 3 != 1 else None}
            for i in range(12)]
    d = XDataset(spark.createDataFrame(rows, "t double, v double"), dims=["t"])
    got = {r["t"]: r["v"] for r in d.interpolate_na("t", method="quadratic").df.collect()}
    for i in range(1, 11):
        assert got[float(i)] == pytest.approx(float(i * i), abs=1e-9), i
    # t=10 is a trailing hole? i=10 -> 10%3==1 -> null and interior (11 valid after) -> filled


def test_interpolate_na_polynomial_grouped(spark):
    rows = []
    for g in range(2):
        for i in range(10):
            v = float((g + 1) * i ** 3 - 2 * i) if i not in (4, 5) else None
            rows.append({"g": g, "t": float(i), "v": v})
    d = XDataset(spark.createDataFrame(rows, "g int, t double, v double"), dims=["g", "t"])
    out = d.interpolate_na("t", method="polynomial", order=3)
    got = {(r["g"], r["t"]): r["v"] for r in out.df.collect()}
    for g in range(2):
        for i in (4, 5):
            assert got[(g, float(i))] == pytest.approx(float((g + 1) * i ** 3 - 2 * i), abs=1e-7)


def _str_da(spark, values):
    from xarray_spark import XDataArray
    rows = [{"i": i, "s": v} for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, s string")
    return XDataArray(df, ["i"], {}, ["s"])


def test_str_accessor_tail(spark):
    da = _str_da(spark, ["a-b-c", "plain", "Hello World", "xxabcxx"])
    rp = {r["i"]: r["s"] for r in da.str.rpartition("-").df.collect()}
    assert (rp[0]["head"], rp[0]["sep"], rp[0]["tail"]) == ("a-b", "-", "c")
    assert (rp[1]["head"], rp[1]["sep"], rp[1]["tail"]) == ("", "", "plain")
    ct = {r["i"]: r["s"] for r in da.str.center(9, "*").df.collect()}
    assert ct[1] == "**plain**"
    assert ct[2] == "Hello World"
    rmp = {r["i"]: r["s"] for r in da.str.removeprefix("xx").df.collect()}
    assert rmp[3] == "abcxx" and rmp[1] == "plain"
    rms = {r["i"]: r["s"] for r in da.str.removesuffix("xx").df.collect()}
    assert rms[3] == "xxabc"
    rf = {r["i"]: r["s"] for r in da.str.rfind("x").df.collect()}
    assert rf[3] == 6 and rf[1] == -1
    it = {r["i"]: r["s"] for r in da.str.istitle().df.collect()}
    assert it[2] is True and it[1] is False
    nz = {r["i"]: r["s"] for r in da.str.normalize("NFC").df.collect()}
    assert nz[1] == "plain"


def test_str_wrap(spark):
    da = _str_da(spark, ["the quick brown fox jumps"])
    out = da.str.wrap(10).df.collect()[0]["s"]
    assert out == "the quick\nbrown fox\njumps"
    for line in out.split("\n"):
        assert len(line) <= 10


def test_dt_accessor_tail(spark):
    import datetime as dt
    from xarray_spark import XDataArray
    rows = [
        {"i": 0, "t": dt.datetime(2000, 3, 31, 5, 6, 7, 123456)},
        {"i": 1, "t": dt.datetime(2001, 7, 4)},
    ]
    df = spark.createDataFrame(rows)
    da = XDataArray(df, ["i"], {}, ["t"])
    qe = {r["i"]: r["t"] for r in da.dt.is_quarter_end.df.collect()}
    assert qe[0] is True and qe[1] is False
    us = {r["i"]: r["t"] for r in da.dt.microsecond.df.collect()}
    assert us[0] == 123456 and us[1] == 0
    dn = {r["i"]: r["t"] for r in da.dt.day_name().df.collect()}
    assert dn[1] == "Wednesday"
    mn = {r["i"]: r["t"] for r in da.dt.month_name().df.collect()}
    assert mn[0] == "March"


def test_sel_label_slice_step(spark):
    rows = [{"t": i, "v": float(i)} for i in range(20)]
    d = XDataset(spark.createDataFrame(rows, "t int, v double"), dims=["t"])
    out = d.sel(t=slice(3, 15, 4))
    got = sorted(r["t"] for r in out.df.collect())
    assert got == [3, 7, 11, 15]


def test_identical_and_broadcast_equals(spark):
    rows = [{"t": i, "v": float(i)} for i in range(5)]
    a = XDataset(spark.createDataFrame(rows, "t int, v double"), dims=["t"])
    b = XDataset(spark.createDataFrame(rows, "t int, v double"), dims=["t"])
    assert a.identical(b)
    c = b._replace(attrs={"note": "x"})
    assert a.equals(c) and not a.identical(c)
    # broadcast_equals: constant-over-t equals its reduced form
    const = XDataset(spark.createDataFrame([{"t": i, "v": 7.0} for i in range(5)],
                                           "t int, v double"), dims=["t"])
    scalar = XDataset(spark.createDataFrame([{"v": 7.0}], "v double"), dims=[])
    assert const.broadcast_equals(scalar)
    assert not const.equals(scalar)


def test_embedding_near_dups_banded_recall(spark):
    """Clusters of near-identical vectors: every intra-cluster pair has
    cosine ≥ 0.999 and must be found by the banded sign-LSH (and nothing
    below threshold may appear — the exact re-rank guarantees that)."""
    import numpy as np
    rng = np.random.default_rng(11)
    rows = []
    truth = set()
    vid = 0
    vecs = {}
    for c in range(20):
        base = rng.normal(size=16)
        base /= np.linalg.norm(base)
        members = []
        for m in range(3):
            v = base + rng.normal(size=16) * 1e-3
            rows.append((vid, [float(x) for x in v]))
            vecs[vid] = v
            members.append(vid)
            vid += 1
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                truth.add((a, b))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from xarray_spark.extras.similarity import embedding_near_dups
    got = {(r["id_a"], r["id_b"])
           for r in embedding_near_dups(df, threshold=0.95, dim=16).collect()}
    # exact: verified candidates only, and banded recall finds every pair
    brute = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            cs = float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
            if cs >= 0.95:
                brute.add((a, b))
    assert truth <= brute
    assert got == brute


def test_curvefit_exponential_recovery(spark):
    import math
    # two groups with different (a, b); exact data -> LM recovers params
    rows = []
    for g, (a, b) in enumerate([(5.0, -0.7), (2.0, -0.3)]):
        for i in range(40):
            x = i * 0.25
            rows.append({"g": g, "x": x, "y": a * math.exp(b * x)})
    d = XDataset(spark.createDataFrame(rows), dims=["g", "x"])

    def model(x, a, b):
        import numpy as np
        return a * np.exp(b * x)

    out = d.curvefit("x", model, p0=[1.0, -0.1], param_names=["a", "b"])
    got = {(r["g"], r["param"]): r["y_curvefit_coefficients"] for r in out.df.collect()}
    assert got[(0, "a")] == pytest.approx(5.0, abs=1e-8)
    assert got[(0, "b")] == pytest.approx(-0.7, abs=1e-8)
    assert got[(1, "a")] == pytest.approx(2.0, abs=1e-8)
    assert got[(1, "b")] == pytest.approx(-0.3, abs=1e-8)


def test_curvefit_ungrouped_and_nulls(spark):
    import math
    rows = [{"x": float(i), "y": 3.0 * math.exp(-0.2 * i) if i % 5 else None}
            for i in range(1, 60)]
    d = XDataset(spark.createDataFrame(rows, "x double, y double"), dims=["x"])

    def model(x, a, b):
        import numpy as np
        return a * np.exp(b * x)

    out = d.curvefit("x", model, p0=[1.0, -0.05], param_names=["a", "b"])
    got = {r["param"]: r["y_curvefit_coefficients"] for r in out.df.collect()}
    assert got["a"] == pytest.approx(3.0, abs=1e-7)
    assert got["b"] == pytest.approx(-0.2, abs=1e-7)


def test_eval_comparison_not_assignment(spark):
    rows = [{"t": 1, "a": 2.0, "b": 3.0}, {"t": 2, "a": 4.0, "b": 1.0}]
    d = XDataset(spark.createDataFrame(rows), dims=["t"], data_vars=["a", "b"])
    out = d.eval("a == b")
    assert "__eval" in out.df.columns
    out2 = d.eval("c = a + b")
    got = {r["t"]: r["c"] for r in out2.df.collect()}
    assert got == {1: 5.0, 2: 5.0}


def test_align_override_positional(spark):
    from xarray_spark.alignment import align
    a = XDataset(spark.createDataFrame(
        [(10, 1.0), (20, 2.0), (30, 3.0)], ["t", "v"]), dims=["t"])
    b = XDataset(spark.createDataFrame(
        [(11, 5.0), (21, 6.0), (31, 7.0)], ["t", "w"]), dims=["t"])
    a2, b2 = align(a, b, join="override")
    # b's labels are rewritten positionally to a's
    got = {r["t"]: r["w"] for r in b2.df.collect()}
    assert got == {10: 5.0, 20: 6.0, 30: 7.0}
    assert sorted(r["t"] for r in a2.df.collect()) == [10, 20, 30]


def test_align_override_size_mismatch_raises(spark):
    from xarray_spark.alignment import align
    a = XDataset(spark.createDataFrame([(10, 1.0), (20, 2.0)], ["t", "v"]), dims=["t"])
    b = XDataset(spark.createDataFrame([(11, 5.0)], ["t", "w"]), dims=["t"])
    with pytest.raises(ValueError, match="override"):
        align(a, b, join="override")


def test_merge_compat_equals_raises_on_difference(spark):
    from xarray_spark.combine import merge
    a = XDataset(spark.createDataFrame([(1, 1.0), (2, 2.0)], ["t", "v"]), dims=["t"])
    b = XDataset(spark.createDataFrame([(1, 1.0), (2, 9.0)], ["t", "v"]), dims=["t"])
    with pytest.raises(ValueError, match="not equal"):
        merge([a, b], compat="equals")
    # equal inputs pass
    b_ok = XDataset(spark.createDataFrame([(1, 1.0), (2, 2.0)], ["t", "v"]), dims=["t"])
    out = merge([a, b_ok], compat="equals")
    assert sorted(r["v"] for r in out.df.collect()) == [1.0, 2.0]


def test_merge_compat_equals_null_pattern_strict(spark):
    from xarray_spark.combine import merge
    # no_conflicts tolerates null-vs-value; equals must NOT
    a = XDataset(spark.createDataFrame([(1, None), (2, 2.0)], "t int, v double"), dims=["t"])
    b = XDataset(spark.createDataFrame([(1, 1.0), (2, 2.0)], "t int, v double"), dims=["t"])
    merge([a, b], compat="no_conflicts")  # fine
    with pytest.raises(ValueError, match="not equal"):
        merge([a, b], compat="equals")


def test_merge_compat_identical_checks_attrs(spark):
    from xarray_spark.combine import merge
    a = XDataset(spark.createDataFrame([(1, 1.0)], ["t", "v"]), dims=["t"],
                 attrs={"units": "m"})
    b = XDataset(spark.createDataFrame([(1, 2.0)], ["t", "w"]), dims=["t"],
                 attrs={"units": "ft"})
    with pytest.raises(ValueError, match="attrs"):
        merge([a, b], compat="identical")


def test_merge_compat_broadcast_equals(spark):
    from xarray_spark.combine import merge
    # v is constant along s in `b`; a carries v without the s dim
    a = XDataset(spark.createDataFrame([(1, 5.0), (2, 6.0)], ["t", "v"]), dims=["t"])
    b = XDataset(spark.createDataFrame(
        [(1, "x", 5.0), (1, "y", 5.0), (2, "x", 6.0), (2, "y", 6.0)],
        ["t", "s", "v"]), dims=["t", "s"])
    out = merge([a, b], compat="broadcast_equals")
    assert "v" in out.data_vars


def test_merge_compat_minimal_drops_overlap(spark):
    from xarray_spark.combine import merge
    a = XDataset(spark.createDataFrame([(1, 1.0, 10.0)], ["t", "v", "a_only"]),
                 dims=["t"], data_vars=["v", "a_only"])
    b = XDataset(spark.createDataFrame([(1, 9.0, 20.0)], ["t", "v", "b_only"]),
                 dims=["t"], data_vars=["v", "b_only"])
    out = merge([a, b], compat="minimal")
    assert set(out.data_vars) == {"a_only", "b_only"}
    assert "v" not in out.df.columns


def test_reorder_levels_struct_field_order(spark):
    d = XDataset(spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 3.0)], ["t", "s", "v"]), dims=["t", "s"])
    st = d.stack(z=["t", "s"])
    ro = st.reorder_levels(z=["s", "t"])
    f = ro.df.schema["z"].dataType.names
    assert f == ["s", "t"]
    # values preserved
    rows = sorted((r["z"]["t"], r["z"]["s"], r["v"]) for r in ro.df.collect())
    assert rows == [(1, "a", 2.0), (2, "b", 3.0)]


def test_set_xindex_records_and_sel_works(spark):
    d = XDataset(spark.createDataFrame(
        [(1, 10.0, 2.0), (2, 20.0, 3.0)], ["t", "alt", "v"]),
        dims=["t"], coords={"alt": ("t",)})
    dx = d.set_xindex("alt")
    assert dx.attrs["_xindexes"] == ["alt"]
    got = dx.sel(alt=20.0).df.collect()
    assert len(got) == 1 and got[0]["t"] == 2
    with pytest.raises(ValueError):
        d.set_xindex("missing")


def test_drop_indexes(spark):
    d = XDataset(spark.createDataFrame(
        [(1, 10.0, 2.0)], ["t", "alt", "v"]),
        dims=["t"], coords={"alt": ("t",)})
    dx = d.set_xindex("alt")
    assert dx.attrs["_xindexes"] == ["alt"]
    dd = dx.drop_indexes("alt")
    assert dd.attrs["_xindexes"] == []
    assert "alt" in dd.df.columns  # the column survives
    with pytest.raises(ValueError):
        d.drop_indexes("alt")  # was never an index


def test_interpolate_na_pchip_monotone_no_overshoot(spark):
    # steep step data: cubic Lagrange overshoots, pchip must not
    rows = [(0.0, 0.0), (1.0, 0.1), (2.0, None), (3.0, 9.9), (4.0, 10.0)]
    d = XDataset(spark.createDataFrame(rows, ["t", "v"]), dims=["t"])
    got = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="pchip").df.collect()}
    assert got[2.0] is not None and 0.1 <= got[2.0] <= 9.9
    # linear data is reproduced exactly
    rows = [(float(i), 2.0 * i if i != 3 else None) for i in range(6)]
    d = XDataset(spark.createDataFrame(rows, ["t", "v"]), dims=["t"])
    got = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="pchip").df.collect()}
    assert got[3.0] == pytest.approx(6.0, abs=1e-9)


def test_interpolate_na_akima_hand_computed(spark):
    # quadratic with a hole at t=3: valid xv=[0,1,2,4,...], secants
    # m=[1,3,6,9,...]; Akima slopes d(2)=4.2, d(4)=7.8; cubic Hermite
    # on [2,4] at t=0.5 gives 2 + 1.05 + 8 - 1.95 = 9.1 (hand-computed
    # from Akima 1970's published formula)
    rows = [(float(i), float(i * i) if i != 3 else None)
            for i in range(10)]
    d = XDataset(spark.createDataFrame(rows, ["t", "v"]), dims=["t"])
    got = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="akima").df.collect()}
    assert got[3.0] == pytest.approx(9.1, abs=1e-9)
    # linear data reproduced exactly (all secants equal)
    rows = [(float(i), 2.0 * i if i != 4 else None) for i in range(8)]
    d = XDataset(spark.createDataFrame(rows, ["t", "v"]), dims=["t"])
    got = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="akima").df.collect()}
    assert got[4.0] == pytest.approx(8.0, abs=1e-9)
    # leading/trailing nulls stay null (interior-only semantics)
    rows2 = [(0.0, None), (1.0, 1.0), (2.0, None), (3.0, 3.0), (4.0, None)]
    d2 = XDataset(spark.createDataFrame(rows2, ["t", "v"]), dims=["t"])
    got2 = {r["t"]: r["v"] for r in
            d2.interpolate_na("t", method="akima").df.collect()}
    assert got2[0.0] is None and got2[4.0] is None and got2[2.0] is not None


def test_top_level_api_surface(spark, tmp_path):
    import xarray_spark as xs
    d = XDataset(spark.createDataFrame([(1, 2.0)], ["t", "v"]), dims=["t"])
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    xs.save_mfdataset([d, d], [p1, p2])
    back = xs.load_dataset(spark, p1)
    assert back.df.count() == 1
    da = xs.load_dataarray(spark, p2)
    assert da.name == "v"
    opts = xs.get_options()
    assert "arithmetic_join" in opts and opts is not xs.OPTIONS
    out = xs.map_blocks(lambda pdf: pdf.assign(v=pdf.v * 2), d)
    assert out.df.collect()[0]["v"] == 4.0
    assert xs.unify_chunks(d)[0] is d


def test_pad_positional_modes_match_numpy(spark):
    import numpy as np
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    rows = [{"t": float(i), "v": v} for i, v in enumerate(vals)]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    for mode in ("reflect", "symmetric", "wrap", "mean", "maximum", "minimum"):
        out = d.pad(t=(2, 3), mode=mode)
        got = [r["v"] for r in out.df.orderBy("t").collect()]
        want = list(np.pad(np.array(vals), (2, 3), mode=mode))
        assert got == pytest.approx(want), mode
    # linear_ramp to 0: before-edge 3.0 ramps 1.5 at i=1? numpy ramps
    # from edge to end over the width INCLUDING the outermost = end
    out = d.pad(t=(2, 2), mode="linear_ramp", end_values=0.0)
    got = [r["v"] for r in out.df.orderBy("t").collect()]
    want = list(np.pad(np.array(vals), (2, 2), mode="linear_ramp", end_values=0.0))
    assert got == pytest.approx(want)


def test_pad_positional_width_guard(spark):
    rows = [{"t": 0.0, "v": 1.0}, {"t": 1.0, "v": 2.0}]
    d = XDataset(spark.createDataFrame(rows), dims=["t"])
    with pytest.raises(ValueError, match="width"):
        d.pad(t=(3, 0), mode="reflect")


def test_interp_pchip_smooth(spark):
    from xarray_spark.missing import interp
    rows = [(float(i), float(i * i)) for i in range(8)]
    d = XDataset(spark.createDataFrame(rows, ["t", "v"]), dims=["t"])
    out = interp(d, {"t": [2.5]}, method="pchip")
    got = {r["t"]: r["v"] for r in out.df.collect()}
    assert got[2.5] == pytest.approx(6.25, abs=0.05)  # pchip near x^2


def test_interpolate_na_use_coordinate_false(spark):
    # irregular labels: positional interpolation averages neighbors,
    # coordinate interpolation weights by label distance
    rows = [(0.0, 0.0), (1.0, None), (10.0, 10.0)]
    d = XDataset(spark.createDataFrame(rows, "t double, v double"), dims=["t"])
    pos = {r["t"]: r["v"] for r in
           d.interpolate_na("t", use_coordinate=False).df.collect()}
    lab = {r["t"]: r["v"] for r in d.interpolate_na("t").df.collect()}
    assert pos[1.0] == pytest.approx(5.0)   # midpoint by position
    assert lab[1.0] == pytest.approx(1.0)   # weighted by label
    cub = d.interpolate_na("t", method="pchip", use_coordinate=False)
    assert {r["t"]: r["v"] for r in cub.df.collect()}[1.0] == pytest.approx(5.0)


def test_interpolate_na_natural_spline_hand_computed(spark):
    # knots x=[0,1,2,3], y=[0,1,1,0]: natural spline M=[0,-1.2,-1.2,0],
    # S(1.5) = 1.15 (hand-solved tridiagonal system)
    rows = [(0.0, 0.0), (1.0, 1.0), (1.5, None), (2.0, 1.0), (3.0, 0.0)]
    d = XDataset(spark.createDataFrame(rows, "t double, v double"), dims=["t"])
    got = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="spline").df.collect()}
    assert got[1.5] == pytest.approx(1.15, abs=1e-9)
    # linear data reproduced exactly (all second derivatives zero)
    rows = [(float(i), 2.0 * i if i != 3 else None) for i in range(6)]
    d = XDataset(spark.createDataFrame(rows, "t double, v double"), dims=["t"])
    got = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="spline").df.collect()}
    assert got[3.0] == pytest.approx(6.0, abs=1e-9)


def test_interpolate_na_smoothing_spline_vs_dense(spark):
    """Banded Reinsch solve vs an independent dense solve of
    g = (I + lam*K)^-1 y with K = Delta^T W^-1 Delta (Green & Silverman
    formulation), evaluated mid-gap with the natural-spline formula."""
    import numpy as np
    rng = np.random.RandomState(7)
    xv = np.sort(rng.uniform(0, 10, 12))
    yv = np.sin(xv) + rng.normal(0, 0.1, 12)
    lam = 0.5
    n = len(xv)
    h = np.diff(xv); e = 1.0 / h; m = n - 2
    Delta = np.zeros((m, n)); W = np.zeros((m, m))
    for j in range(m):
        Delta[j, j] = e[j]; Delta[j, j + 1] = -(e[j] + e[j + 1]); Delta[j, j + 2] = e[j + 1]
        W[j, j] = (h[j] + h[j + 1]) / 3.0
        if j < m - 1:
            W[j, j + 1] = W[j + 1, j] = h[j + 1] / 6.0
    K = Delta.T @ np.linalg.inv(W) @ Delta
    g = np.linalg.solve(np.eye(n) + lam * K, yv)
    gamma = np.linalg.solve(W, Delta @ g)
    M = np.concatenate([[0.0], gamma, [0.0]])
    xq = (xv[5] + xv[6]) / 2.0
    j = 5; hh = xv[j + 1] - xv[j]; t0, t1 = xv[j + 1] - xq, xq - xv[j]
    want = (M[j] * t0 ** 3 / (6 * hh) + M[j + 1] * t1 ** 3 / (6 * hh)
            + (g[j] / hh - M[j] * hh / 6) * t0
            + (g[j + 1] / hh - M[j + 1] * hh / 6) * t1)
    rows = [(float(x), float(y)) for x, y in zip(xv, yv)] + [(float(xq), None)]
    d = XDataset(spark.createDataFrame(rows, "t double, v double"), dims=["t"])
    got = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="smooth_spline", lam=lam).df.collect()}
    assert got[float(xq)] == pytest.approx(float(want), abs=1e-9)
    # lam -> 0 degenerates to the interpolating natural spline
    nat = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="spline").df.collect()}
    sm0 = {r["t"]: r["v"] for r in
           d.interpolate_na("t", method="smooth_spline", lam=1e-12).df.collect()}
    assert sm0[float(xq)] == pytest.approx(nat[float(xq)], abs=1e-5)


def test_interp_higher_order_families(spark):
    # data IS a cubic polynomial: cubic interp is exact at any target
    rows = [(float(i), float(i**3 - 2 * i)) for i in range(8)]
    d = XDataset(spark.createDataFrame(rows, "t double, v double"), dims=["t"])
    out = d.interp(t=[2.5, 4.25], method="cubic")
    got = {r["t"]: r["v"] for r in out.df.collect()}
    assert got[2.5] == pytest.approx(2.5**3 - 5.0, abs=1e-9)
    assert got[4.25] == pytest.approx(4.25**3 - 8.5, abs=1e-9)
    # polynomial order via kwargs= (xarray's scipy-kwargs convention)
    out2 = d.interp(t=[3.5], method="polynomial", kwargs={"order": 3})
    assert {r["t"]: r["v"] for r in out2.df.collect()}[3.5] == \
        pytest.approx(3.5**3 - 7.0, abs=1e-9)


def test_polyfit_skipna_consistent_moments(spark):
    # nulls in y must drop the row from BOTH sides of the normal
    # equations; the fit on the remaining points is exact
    import numpy as np
    rows = [{"t": float(i), "v": 2.0 * i + 1.0 if i not in (2, 5) else None}
            for i in range(8)]
    d = XDataset(spark.createDataFrame(rows, "t double, v double"), dims=["t"])
    out = {r["degree"]: r["v_polyfit_coefficients"]
           for r in d.polyfit("t", 1).df.collect()}
    assert out[1] == pytest.approx(2.0, abs=1e-9)
    assert out[0] == pytest.approx(1.0, abs=1e-9)


def test_polyfit_weighted_matches_numpy(spark):
    import numpy as np
    xs = np.arange(10, dtype="float64")
    ys = 3.0 * xs - 2.0 + np.array([0.5, -0.5] * 5)
    ws = np.array([1.0, 4.0] * 5)
    rows = [{"t": float(x), "v": float(y), "wt": float(w)}
            for x, y, w in zip(xs, ys, ws)]
    d = XDataset(spark.createDataFrame(rows, "t double, v double, wt double"),
                 dims=["t"])
    out = {r["degree"]: r["v_polyfit_coefficients"]
           for r in d.polyfit("t", 1, w="wt").df.collect()}
    want = np.polyfit(xs, ys, 1, w=ws)  # np convention: w scales residuals
    assert out[1] == pytest.approx(want[0], abs=1e-9)
    assert out[0] == pytest.approx(want[1], abs=1e-9)
