"""Round-3 additions: portable hashing (oracle-checkable dedup/ANN) and
deterministic hash sampling/splitting."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashlib

import pytest
from pyspark.sql import functions as F


def test_md5_long_matches_python(spark):
    from xarray_spark.extras.portable import md5_long
    df = spark.createDataFrame([("hello",), ("",), ("the fast key",)], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", md5_long(F.col("s")).alias("h")).collect()}
    for s, h in got.items():
        assert h == int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_int_signature_deterministic(spark):
    from xarray_spark.extras.portable import int_signature, plane_coeffs
    planes = plane_coeffs(4, 8)
    df = spark.createDataFrame(
        [(1, [0.1] * 8), (2, [-0.5] * 8)], ["id", "v"]
    ).select("id", F.col("v").cast("array<double>").alias("v"))
    out = {r["id"]: r["sig"] for r in
           df.select("id", int_signature(F.col("v"), planes).alias("sig")).collect()}
    # recompute driver-side: bit i set iff sum(floor(x*1e6)*coef) > 0
    for rid, vec in [(1, [0.1] * 8), (2, [-0.5] * 8)]:
        import math
        expect = 0
        for i, p in enumerate(planes):
            d = sum(math.floor(x * 1e6) * c for x, c in zip(vec, p))
            if d > 0:
                expect |= 1 << i
        assert out[rid] == expect


def test_portable_minhash_band_recall(spark):
    """Identical docs share every band; disjoint docs share none."""
    from xarray_spark.extras.dedup import minhash_lsh_pairs
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h"),
            (3, "q r s t u v w x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, threshold=0.5, hash_mode="portable").collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["jaccard_est"] == 1.0


def test_portable_simhash_exact_recall(spark):
    from xarray_spark.extras.dedup import simhash_near_dups
    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
            (3, "omega psi chi phi")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = simhash_near_dups(df, max_hamming=10, bits=60,
                            hash_mode="portable").collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_hash_sample_reproducible_and_partition_independent(spark):
    from xarray_spark.extras.sampling import hash_sample
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in hash_sample(df, 0.2, "k").collect())
    b = sorted(r["k"] for r in hash_sample(df.repartition(7), 0.2, "k").collect())
    assert a == b
    assert 250 < len(a) < 550  # ~400 expected


def test_hash_sample_rate_bounds():
    from xarray_spark.extras.sampling import hash_sample
    with pytest.raises(ValueError):
        hash_sample(None, 1.5, "k")


def test_hash_split_partition_and_stability(spark):
    from xarray_spark.extras.sampling import hash_split
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    s = hash_split(df, {"train": 0.8, "test": 0.2}, "k")
    counts = {r["split"]: r["n"] for r in
              s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    assert sum(counts.values()) == 1000
    # appending rows must not move existing assignments
    s2 = hash_split(spark.range(0, 2000).withColumnRenamed("id", "k"),
                    {"train": 0.8, "test": 0.2}, "k")
    m1 = {r["k"]: r["split"] for r in s.collect()}
    m2 = {r["k"]: r["split"] for r in s2.collect()}
    assert all(m2[k] == v for k, v in m1.items())


def test_stratified_hash_sample_drops_unlisted(spark):
    from xarray_spark.extras.sampling import stratified_hash_sample
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zz") for i in range(200)], ["k", "lang"])
    out = stratified_hash_sample(df, {"en": 1.0}, "lang", "k")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == 100


def test_decontaminate_removes_exact_matches(spark):
    from xarray_spark.extras.curation import decontaminate
    corpus = spark.createDataFrame(
        [(1, "keep me"), (2, "Remove  Me"), (3, "also keep")], ["doc_id", "text"])
    ev = spark.createDataFrame([(9, "remove me")], ["doc_id", "text"])
    out = sorted(r["doc_id"] for r in decontaminate(corpus, ev).collect())
    assert out == [1, 3]  # normalization folds case/whitespace


def test_pack_sequences_layout(spark):
    from xarray_spark.extras.curation import pack_sequences
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(20)], ["doc_id", "text"])
    out = pack_sequences(docs, budget=25, n_buckets=1).collect()
    by_id = sorted(out, key=lambda r: r["doc_id"])
    # single bucket: docs laid end-to-end in id order, 10 tokens each
    for i, r in enumerate(by_id):
        assert r["n_tokens"] == 10
        assert r["tokens_before"] == 10 * i
        assert r["bin"] == (10 * i) // 25
    # deterministic: identical layout on re-run
    again = sorted(pack_sequences(docs, budget=25, n_buckets=1).collect(),
                   key=lambda r: r["doc_id"])
    assert [r["bin"] for r in again] == [r["bin"] for r in by_id]


def test_shuffle_deterministic_total_order(spark):
    from xarray_spark.extras.sampling import shuffle_deterministic
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = shuffle_deterministic(df, "k").collect()
    ranks = sorted(r["shuffle_rank"] for r in a)
    assert ranks == list(range(1, 501))  # total order, no gaps/dups
    # reproducible across partitionings
    b = shuffle_deterministic(df.repartition(13), "k").collect()
    assert ({(r["k"], r["shuffle_rank"]) for r in a}
            == {(r["k"], r["shuffle_rank"]) for r in b})
    # scrambled w.r.t. natural order
    by_rank = [r["k"] for r in sorted(a, key=lambda r: r["shuffle_rank"])]
    assert by_rank != sorted(by_rank)


def test_audio_pcm16_decode_real_math(spark):
    import numpy as np
    from xarray_spark.extras.multimodal import audio_features, decode_audio
    # known payload: samples [0, -32768, 16384] as PCM16 LE + odd tail byte
    data = (np.array([0, -32768, 16384], dtype="<i2").tobytes() + b"\x7f")
    df = spark.createDataFrame(
        [(1, bytearray(data), "pcm16", 16000)],
        "media_id long, data binary, format string, sample_rate int")
    dec = decode_audio(df).collect()[0]
    assert dec["samples"] == [0.0, -1.0, 0.5]  # odd byte dropped
    # frame of 3: rms = sqrt((0+1+0.25)/3), zcr = 1 change (-1 -> 0.5) / 2
    f = audio_features(decode_audio(df), frame_len=3).collect()[0]
    assert abs(f["rms"] - (1.25 / 3) ** 0.5) < 1e-12
    assert f["zcr"] == 0.5


def test_audio_non_pcm_raises(spark):
    import pytest as _pt
    from xarray_spark.extras.multimodal import decode_audio
    df = spark.createDataFrame(
        [(1, bytearray(b"xx"), "mp3", 44100)],
        "media_id long, data binary, format string, sample_rate int")
    with _pt.raises(Exception, match="pcm16"):
        decode_audio(df).collect()


def test_pii_scan_counts(spark):
    from xarray_spark.extras.text import pii_scan
    df = spark.createDataFrame(
        [(1, "mail me a@b.io or c@d.org"),
         (2, "go to https://x.y/z?a=1"),
         (3, "call 12345678 now"),
         (4, "clean text only")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["pii_flag"]
    assert out[2]["n_urls"] == 1 and out[2]["pii_flag"]
    assert out[3]["n_digit_runs"] == 1 and out[3]["pii_flag"]
    assert not out[4]["pii_flag"]


def test_hash_split_partial_weights_drop_remainder(spark):
    from xarray_spark.extras.sampling import hash_split
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    s = hash_split(df, {"eval": 0.01}, "k")
    rows = s.collect()
    assert 0 < len(rows) < 100  # ~10 expected, remainder dropped
    assert all(r["split"] == "eval" for r in rows)


def test_chunk_documents_overlap_and_empty(spark):
    from xarray_spark.extras.curation import chunk_documents
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_chars=4, overlap=2)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk"])
            for r in out.collect()}
    # stride 2 over 10 chars: starts 0,2,4,6,8
    assert rows[(1, 0)] == (0, "abcd")
    assert rows[(1, 1)] == (2, "cdef")
    assert rows[(1, 4)] == (8, "ij")
    assert rows[(2, 0)] == (0, "")  # empty doc keeps one empty chunk
    assert len([k for k in rows if k[0] == 1]) == 5
