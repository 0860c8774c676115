"""Round-6 tests: the five round-5 advisor findings (ieee_div NULL
dividend, atomic rename, ieee_mod/trunc 2^63 ANSI overflow, single
str.index/rindex definition, fillna dtype preservation)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spark import XDataset


def _one(spark, col):
    return spark.range(1).select(col.alias("r")).first()["r"]


class TestIeeeDiv:
    def test_null_dividend_zero_divisor_stays_null(self, spark):
        from xarray_spark._utils import ieee_div
        r = _one(spark, ieee_div(F.lit(None).cast("double"), F.lit(0.0)))
        assert r is None  # was +inf: NULL skipped the nan branch

    def test_null_divisor_stays_null(self, spark):
        from xarray_spark._utils import ieee_div
        r = _one(spark, ieee_div(F.lit(3.0), F.lit(None).cast("double")))
        assert r is None

    def test_normal_cases_unchanged(self, spark):
        from xarray_spark._utils import ieee_div
        rows = spark.range(1).select(
            ieee_div(F.lit(1.0), F.lit(0.0)).alias("a"),
            ieee_div(F.lit(-1.0), F.lit(0.0)).alias("b"),
            ieee_div(F.lit(0.0), F.lit(0.0)).alias("c"),
            ieee_div(F.lit(6.0), F.lit(3.0)).alias("d"),
        ).first()
        assert rows["a"] == math.inf and rows["b"] == -math.inf
        assert math.isnan(rows["c"]) and rows["d"] == 2.0


class TestIeeeModOverflow:
    def test_mod_inf_ratio(self, spark):
        from xarray_spark._utils import ieee_mod
        # np.mod(inf, 2) = nan; raw FLOOR(inf) ANSI-overflows BIGINT
        r = _one(spark, ieee_mod(F.lit(math.inf), F.lit(2.0)))
        assert math.isnan(r)

    def test_mod_huge_ratio(self, spark):
        from xarray_spark._utils import ieee_mod
        # ratio ≥ 2^63: numpy gives mod(1e300, 1.0) = 0.0
        r = _one(spark, ieee_mod(F.lit(1e300), F.lit(1.0)))
        assert r == np.mod(1e300, 1.0)

    def test_trunc_floor_ceil_huge(self, spark):
        from xarray_spark import ufuncs as xu
        import xarray_spark as xs
        pdf = pd.DataFrame({"i": [0, 1, 2], "v": [1e300, -2.0 ** 63, 2.5]})
        ds = XDataset(spark.createDataFrame(pdf), dims=["i"])
        for fn, npfn in [(xu.trunc, np.trunc), (xu.floor, np.floor),
                         (xu.ceil, np.ceil)]:
            got = fn(ds["v"]).to_pandas().sort_values("i")["v"].to_numpy()
            np.testing.assert_array_equal(got, npfn(pdf["v"].to_numpy()))


class TestAtomicRename:
    def _ds(self, spark):
        pdf = pd.DataFrame({"x": [1, 2], "a": [10.0, 20.0], "b": [30.0, 40.0]})
        return XDataset(spark.createDataFrame(pdf), dims=["x"],
                        data_vars=["a", "b"])

    def test_swap(self, spark):
        out = self._ds(spark).rename({"a": "b", "b": "a"}).to_pandas().sort_values("x")
        assert out["b"].tolist() == [10.0, 20.0]  # old a
        assert out["a"].tolist() == [30.0, 40.0]  # old b

    def test_chain(self, spark):
        # {a:'b', b:'c'}: old-a → b, old-b → c (atomic, no clobber)
        out = self._ds(spark).rename({"a": "b", "b": "c"}).to_pandas().sort_values("x")
        assert out["b"].tolist() == [10.0, 20.0]
        assert out["c"].tolist() == [30.0, 40.0]
        assert "a" not in out.columns

    def test_still_refuses_plain_shadow(self, spark):
        with pytest.raises(ValueError):
            self._ds(spark).rename({"a": "b"})


class TestStrIndexSingleDef:
    def test_index_and_rindex(self, spark):
        pdf = pd.DataFrame({"i": [0, 1], "s": ["abcabc", "xxabx"]})
        ds = XDataset(spark.createDataFrame(pdf), dims=["i"])
        got = ds["s"].str.index("ab").to_pandas().sort_values("i")["s"].tolist()
        assert got == [0, 2]
        got = ds["s"].str.rindex("ab").to_pandas().sort_values("i")["s"].tolist()
        assert got == [3, 2]

    def test_index_raises_on_miss(self, spark):
        pdf = pd.DataFrame({"i": [0], "s": ["zzz"]})
        ds = XDataset(spark.createDataFrame(pdf), dims=["i"])
        with pytest.raises(Exception):
            ds["s"].str.index("ab").to_pandas()

    def test_single_definition(self):
        import inspect
        from xarray_spark.accessors import StringAccessor
        src = inspect.getsource(StringAccessor)
        assert src.count("def index(") == 1
        assert src.count("def rindex(") == 1


class TestFillnaDtype:
    def test_int_var_not_promoted(self, spark):
        left = pd.DataFrame({"x": [1, 2, 3],
                             "n": pd.array([5, None, 7], dtype="Int64"),
                             "s": ["a", None, "c"]})
        right = pd.DataFrame({"x": [1, 2, 3], "n": [100, 200, 300],
                              "s": ["A", "B", "C"]})
        ds = XDataset(spark.createDataFrame(left), dims=["x"])
        other = XDataset(spark.createDataFrame(right), dims=["x"])
        out = ds.fillna(other)
        sch = dict(out.df.dtypes)
        assert sch["n"] == "bigint"  # was silently promoted to double
        assert sch["s"] == "string"  # was an ANSI cast failure
        got = out.to_pandas().sort_values("x")
        assert got["n"].tolist() == [5, 200, 7]
        assert got["s"].tolist() == ["a", "B", "c"]

    def test_float_nan_still_filled(self, spark):
        left = pd.DataFrame({"x": [1, 2], "v": [np.nan, 1.5]})
        right = pd.DataFrame({"x": [1, 2], "v": [9.0, 99.0]})
        ds = XDataset(spark.createDataFrame(left), dims=["x"])
        other = XDataset(spark.createDataFrame(right), dims=["x"])
        got = ds.fillna(other).to_pandas().sort_values("x")
        assert got["v"].tolist() == [9.0, 1.5]


class TestGopherFilter:
    def test_signals_and_verdict(self, spark):
        from xarray_spark.extras.curation import gopher_filter
        rows = [
            (0, "the quick brown fox jumps over the lazy dog again and again today"),
            (1, "## ### #### ..."),               # symbol heavy, no stopwords
            (2, ""),                               # empty
            (3, None),                             # null
            (4, "a b c d e f g h i j k l"),        # 1-char words
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in
               gopher_filter(df, min_words=5, max_words=100,
                             min_mean_word_len=2.0, max_mean_word_len=8.0,
                             min_alpha_word_frac=0.8,
                             min_stopword_hits=1).collect()}
        assert out[0]["passes"] is True
        assert out[0]["n_words"] == 13
        assert out[0]["stop_hits"] >= 2
        assert out[1]["passes"] is False       # alpha_frac 0, no stopwords
        assert out[1]["alpha_frac"] == 0.0
        assert out[2]["n_words"] == 0 and out[2]["passes"] is False
        assert out[3]["n_words"] == 0 and out[3]["passes"] is False
        assert out[4]["passes"] is False       # mean word len 1.0
        assert out[4]["mean_word_len"] == 1.0

    def test_symbol_ratio_counts(self, spark):
        from xarray_spark.extras.curation import gopher_filter
        df = spark.createDataFrame(
            [(0, "alpha # beta ... gamma #")], ["doc_id", "text"])
        r = gopher_filter(df, min_words=1).collect()[0]
        # 2 hashes + 1 ellipsis over 5 words (the # and ... count as
        # words too in the split)
        assert r["symbol_ratio"] == round(3 / r["n_words"] + 1e-9, 6)


class TestC4Filter:
    def test_line_and_page_rules(self, spark):
        from xarray_spark.extras.curation import c4_filter
        rows = [
            (0, "The cat sat on the mat.\nshort.\nno terminal punct here\n"
                "Another good sentence here!\nAnd one more fine line?"),
            (1, "Enable javascript to view this.\n"
                "A valid closing sentence stands here."),
            (2, "function() { return 1; }\nA sentence that passes fine.\n"
                "And a second good sentence too."),
            (3, "Lorem ipsum dolor sit amet.\nMore filler text follows now."),
            (4, None),
            (5, "Buy spamword pills online now!\nOther normal sentence here."),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in
               c4_filter(df, min_sentences=2,
                         badwords=("spamword",)).collect()}
        # doc 0: "short." (<3 words) and the punct-less line drop
        assert out[0]["n_lines"] == 5 and out[0]["n_lines_kept"] == 3
        assert out[0]["n_sentences"] == 3 and out[0]["passes"] is True
        assert "no terminal punct" not in out[0]["clean_text"]
        # doc 1: javascript line removed -> only 1 sentence left
        assert out[1]["n_lines_kept"] == 1 and out[1]["passes"] is False
        assert "javascript" not in out[1]["clean_text"]
        # doc 2: brace page dropped even with 2 good sentences
        assert out[2]["n_sentences"] == 2 and out[2]["passes"] is False
        # doc 3: lorem ipsum page dropped
        assert out[3]["passes"] is False
        # doc 4: null text -> empty everything
        assert out[4]["n_lines_kept"] == 0 and out[4]["passes"] is False
        # doc 5: badword page dropped (word-boundary, case-blind)
        assert out[5]["passes"] is False

    def test_clean_text_trims_and_joins(self, spark):
        from xarray_spark.extras.curation import c4_filter
        df = spark.createDataFrame(
            [(0, "  First good sentence here.  \n  Second fine line too!  ")],
            ["doc_id", "text"])
        r = c4_filter(df, min_sentences=1).collect()[0]
        assert r["clean_text"] == ("First good sentence here.\n"
                                   "Second fine line too!")
        assert r["clean_chars"] == len(r["clean_text"])
        assert r["passes"] is True

    def test_badword_is_word_boundary(self, spark):
        from xarray_spark.extras.curation import c4_filter
        df = spark.createDataFrame(
            [(0, "The class classification sentence is fine today.")],
            ["doc_id", "text"])
        r = c4_filter(df, min_sentences=1, badwords=("class",)).collect()[0]
        # "classification" must NOT trigger the "class" badword …
        assert r["passes"] is False  # … but the standalone "class" does
        r2 = c4_filter(
            df, min_sentences=1, badwords=("lass",)).collect()[0]
        assert r2["passes"] is True  # substring never matches

    def test_map_only_plan(self, spark):
        from xarray_spark.extras.curation import c4_filter
        df = spark.createDataFrame(
            [(0, "One fair sentence stands here.")], ["doc_id", "text"])
        plan = c4_filter(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # single map-only projection


class TestNgramLmScore:
    def test_buckets_track_predictability(self, spark):
        from xarray_spark.extras.text import ngram_lm_score
        rows = [
            (0, "the the the the the the"),    # repetitive -> low ppl
            (1, "zq xv kj qp wz jx vq"),        # rare grams -> high ppl
            (2, "the cat sat on the mat"),
            (3, ""),
            (4, None),
            (5, "the dog sat on the log"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in ngram_lm_score(df).collect()}
        assert out[0]["bucket"] == 1            # head = most predictable
        assert out[1]["bucket"] == 3            # tail = least predictable
        assert out[0]["ppl"] < out[2]["ppl"] < out[1]["ppl"]
        # empty/null docs: zero grams, NULL ppl and bucket
        for i in (3, 4):
            assert out[i]["n_grams"] == 0 and out[i]["nll_q"] == 0
            assert out[i]["ppl"] is None and out[i]["bucket"] is None

    def test_integer_quantization_is_run_deterministic(self, spark):
        from xarray_spark.extras.text import ngram_lm_score
        rows = [(i, f"some text body number {i} repeated words words")
                for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        a = {r["doc_id"]: r["nll_q"] for r in
             ngram_lm_score(df).collect()}
        b = {r["doc_id"]: r["nll_q"] for r in
             ngram_lm_score(df.repartition(7)).collect()}
        assert a == b  # integer sums: partitioning can never change them

    def test_threshold_fast_path_matches_cutpoints(self, spark):
        from xarray_spark.extras.text import ngram_lm_score
        rows = [(0, "aaa aaa aaa aaa"), (1, "the cat sat on a mat"),
                (2, "zq xv kj qp wz")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        base = {r["doc_id"]: r["ppl"] for r in ngram_lm_score(df).collect()}
        ppls = sorted(base.values())
        t1 = (ppls[0] + ppls[1]) / 2
        t2 = (ppls[1] + ppls[2]) / 2
        out = {r["doc_id"]: r["bucket"] for r in
               ngram_lm_score(df, thresholds=(t1, t2)).collect()}
        by_ppl = sorted(base, key=base.get)
        assert out[by_ppl[0]] == 1
        assert out[by_ppl[1]] == 2
        assert out[by_ppl[2]] == 3

    def test_external_train_corpus(self, spark):
        from xarray_spark.extras.text import ngram_lm_score
        train = spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog")],
            ["doc_id", "text"])
        score = spark.createDataFrame(
            [(10, "the quick brown fox"), (11, "zzz qqq xxx")],
            ["doc_id", "text"])
        out = {r["doc_id"]: r for r in
               ngram_lm_score(score, train=train).collect()}
        # grams seen in train score far better than all-OOV text
        assert out[10]["ppl"] < out[11]["ppl"]

    def test_model_joins_are_broadcast(self, spark):
        from xarray_spark.extras.text import ngram_lm_score
        df = spark.createDataFrame(
            [(0, "plain text here")], ["doc_id", "text"])
        plan = (ngram_lm_score(df)._jdf.queryExecution()
                .executedPlan().toString())
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan


class TestDecontaminateNgrams:
    def test_flag_and_drop_modes(self, spark):
        from xarray_spark.extras.curation import decontaminate_ngrams
        corpus = spark.createDataFrame([
            (0, "alpha beta gamma delta epsilon zeta"),     # shares 5-gram
            (1, "one two three four five six seven"),        # clean
            (2, "alpha beta gamma delta epsilon other"),     # shares one
            (3, None),                                       # null text
        ], ["doc_id", "text"])
        ev = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta extra")],
            ["doc_id", "text"])
        out = {r["doc_id"]: r for r in
               decontaminate_ngrams(corpus, ev, n=5).collect()}
        # doc 0: grams (a b g d e) and (b g d e z) both in eval
        assert out[0]["n_hits"] == 2 and out[0]["contaminated"] is True
        assert out[1]["n_hits"] == 0 and out[1]["contaminated"] is False
        assert out[2]["n_hits"] == 1 and out[2]["contaminated"] is True
        assert out[3]["n_hits"] == 0
        kept = decontaminate_ngrams(corpus, ev, n=5, mode="drop")
        assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]

    def test_eval_side_broadcast_plan(self, spark):
        from xarray_spark.extras.curation import decontaminate_ngrams
        corpus = spark.createDataFrame(
            [(0, "a b c d e f")], ["doc_id", "text"])
        ev = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
        plan = (decontaminate_ngrams(corpus, ev, n=5)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestPackNosplit:
    def test_next_fit_semantics(self, spark):
        from xarray_spark.extras.curation import pack_sequences_nosplit
        rows = [(i, " ".join(["w"] * n))
                for i, n in enumerate([5, 4, 3, 9, 2, 11, 1, 5])]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in
               pack_sequences_nosplit(df, budget=8,
                                      n_buckets=1).collect()}
        assert [out[i]["bin"] for i in range(8)] == [0, 1, 1, 2, 3, 4, 5, 5]
        assert out[3]["oversize"] is True and out[5]["oversize"] is True
        assert out[2]["bin_fill"] == 7  # 4 + 3 packed together
        # invariant: no non-oversize bin exceeds the budget
        for r in out.values():
            assert r["oversize"] or r["bin_fill"] <= 8

    def test_deterministic_across_partitionings(self, spark):
        from xarray_spark.extras.curation import pack_sequences_nosplit
        rows = [(i, " ".join(["tok"] * (i % 7 + 1))) for i in range(60)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        a = {r["doc_id"]: (r["bucket"], r["bin"]) for r in
             pack_sequences_nosplit(df, budget=10, n_buckets=4).collect()}
        b = {r["doc_id"]: (r["bucket"], r["bin"]) for r in
             pack_sequences_nosplit(df.repartition(13), budget=10,
                                    n_buckets=4).collect()}
        assert a == b


class TestDsir:
    """DSIR importance resampling (extras.sampling.dsir_weights/
    dsir_sample — Xie et al. 2023)."""

    def _corpus(self, spark):
        # two styles: "clean" docs share the target's vocabulary,
        # "noisy" docs use a disjoint one
        rows = []
        for i in range(40):
            if i % 2 == 0:
                rows.append((i, "the quick brown fox jumps over the lazy dog"))
            else:
                rows.append((i, "zzz qqq xxx kkk www vvv uuu ttt sss rrr"))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_weights_favor_target_like_docs(self, spark):
        from xarray_spark.extras.sampling import dsir_weights
        df = self._corpus(spark)
        target = spark.createDataFrame(
            [(1000, "quick brown fox and the lazy dog again")],
            "doc_id long, text string")
        w = {r["doc_id"]: r["logw_q"]
             for r in dsir_weights(df, target, buckets=512).collect()}
        clean = [w[i] for i in range(0, 40, 2)]
        noisy = [w[i] for i in range(1, 40, 2)]
        assert min(clean) > max(noisy)

    def test_every_doc_returned_including_empty(self, spark):
        from xarray_spark.extras.sampling import dsir_weights
        df = spark.createDataFrame(
            [(0, "alpha beta"), (1, ""), (2, None)],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in
                dsir_weights(df, df, buckets=64).collect()}
        assert set(rows) == {0, 1, 2}
        assert rows[1]["n_feats"] == 0 and rows[1]["logw_q"] == 0
        assert rows[2]["n_feats"] == 0
        # unigrams + bigrams of a 2-word doc = 3 features
        assert rows[0]["n_feats"] == 3

    def test_sample_deterministic_and_partition_independent(self, spark):
        from xarray_spark.extras.sampling import dsir_sample
        df = self._corpus(spark)
        target = df.where(F.col("doc_id") % 4 == 0)
        a = sorted(r["doc_id"] for r in
                   dsir_sample(df, target, k=10, buckets=256).collect())
        b = sorted(r["doc_id"] for r in
                   dsir_sample(df.repartition(7), target, k=10,
                               buckets=256).collect())
        assert len(a) == 10 and a == b

    def test_no_gumbel_is_exact_topk_by_weight(self, spark):
        from xarray_spark.extras.sampling import dsir_sample, dsir_weights
        df = self._corpus(spark)
        target = spark.createDataFrame(
            [(1000, "quick brown fox the lazy dog")],
            "doc_id long, text string")
        sel = sorted(r["doc_id"] for r in
                     dsir_sample(df, target, k=20, buckets=512,
                                 gumbel=False).collect())
        w = dsir_weights(df, target, buckets=512).collect()
        top = sorted(sorted(w, key=lambda r: (-r["logw_q"], r["doc_id"]))[:20],
                     key=lambda r: r["doc_id"])
        assert sel == [r["doc_id"] for r in top]
        # with target-vocab docs dominant, top-20 = the 20 clean docs
        assert sel == list(range(0, 40, 2))

    def test_flag_mode_schema_and_k(self, spark):
        from xarray_spark.extras.sampling import dsir_sample
        df = self._corpus(spark)
        out = dsir_sample(df, df.limit(5), k=7, buckets=128, mode="flag")
        assert set(out.columns) == {"doc_id", "n_feats", "logw_q",
                                    "score_q", "selected"}
        rows = out.collect()
        assert len(rows) == 40
        assert sum(r["selected"] for r in rows) == 7

    def test_bad_args(self, spark):
        from xarray_spark.extras.sampling import dsir_sample, dsir_weights
        df = self._corpus(spark)
        with pytest.raises(ValueError):
            dsir_sample(df, df, k=-1)
        with pytest.raises(ValueError):
            dsir_sample(df, df, k=1, mode="bogus")
        with pytest.raises(ValueError):
            dsir_weights(df, df, buckets=1)


class TestPiiRedact:
    def test_masks_in_order_and_counts(self, spark):
        from xarray_spark.extras.text import pii_redact
        df = spark.createDataFrame(
            [(0, "mail a.b@x.co see https://x.co/p9912345678 call 12345678"),
             (1, "clean text"),
             (2, None)],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
        red = rows[0]["text_redacted"]
        # URL-internal digits were consumed by the URL token, not
        # turned into a second <NUMBER>
        assert red == "mail <EMAIL> see <URL> call <NUMBER>"
        # ...but n_redactions audits the ORIGINAL text, where the
        # URL-internal digit run also matches: 1 email + 1 url + 2 runs
        assert rows[0]["n_redactions"] == 4
        assert rows[1]["text_redacted"] == "clean text"
        assert rows[1]["n_redactions"] == 0
        assert rows[2]["text_redacted"] is None

    def test_custom_tokens(self, spark):
        from xarray_spark.extras.text import pii_redact
        df = spark.createDataFrame([(0, "x@y.io")], "doc_id long, text string")
        r = pii_redact(df, email_token="[E]").collect()[0]
        assert r["text_redacted"] == "[E]"
