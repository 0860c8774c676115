"""Round-13 optimization internals and advisor-flagged fixes.

Pins (1) the multi-shared-dim left/right align fix: restricting along
an earlier dim invalidates the marker-derived missing-label set for
later dims, so subsequent conforms must anti-join against the current
(partially conformed) frame; (2) the tree-node-boundary classifier in
``materialize_if_derived`` (an attribute NAMED 'AggregateRevenue' must
not reclassify a fact scan as derived).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xarray_spark import XDataset, get_spark, align  # noqa: E402
from xarray_spark._utils import materialize_if_derived  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test_opt_r13")
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_left_align_two_shared_dims_synthesizes_late_missing(spark):
    """Advisor repro: a={t:[1], s:[1,5]}, b={(1,1,.1),(2,5,.5)}.
    Left-align restricts b to t=1 (dropping the only s=5 carrier);
    the s conform must then synthesize the (1, 5, NULL) slice the
    reference reindex(t=a.t, s=a.s) produces."""
    import pandas as pd
    a = XDataset(spark.createDataFrame(
        pd.DataFrame({"t": [1, 1], "s": [1, 5], "u": [1.0, 2.0]})),
        dims=["t", "s"])
    b = XDataset(spark.createDataFrame(
        pd.DataFrame({"t": [1, 2], "s": [1, 5], "v": [0.1, 0.5]})),
        dims=["t", "s"])
    a2, b2 = align(a, b, join="left")
    rows_b = {(r["t"], r["s"], r["v"]) for r in b2.df.collect()}
    assert rows_b == {(1, 1, 0.1), (1, 5, None)}
    # the left dataset is the reference: unchanged
    rows_a = {(r["t"], r["s"], r["u"]) for r in a2.df.collect()}
    assert rows_a == {(1, 1, 1.0), (1, 5, 2.0)}


def test_right_align_two_shared_dims_synthesizes_late_missing(spark):
    """Mirror of the left-align repro with the roles swapped."""
    import pandas as pd
    a = XDataset(spark.createDataFrame(
        pd.DataFrame({"t": [1, 2], "s": [1, 5], "v": [0.1, 0.5]})),
        dims=["t", "s"])
    b = XDataset(spark.createDataFrame(
        pd.DataFrame({"t": [1, 1], "s": [1, 5], "u": [1.0, 2.0]})),
        dims=["t", "s"])
    a2, b2 = align(a, b, join="right")
    rows_a = {(r["t"], r["s"], r["v"]) for r in a2.df.collect()}
    assert rows_a == {(1, 1, 0.1), (1, 5, None)}


def test_outer_align_two_shared_dims_marker_path_exact(spark):
    """join='outer' never restricts, so the marker-derived missing set
    stays exact for every dim — same result as sequential anti-joins."""
    import pandas as pd
    a = XDataset(spark.createDataFrame(
        pd.DataFrame({"t": [1], "s": [1], "u": [1.0]})), dims=["t", "s"])
    b = XDataset(spark.createDataFrame(
        pd.DataFrame({"t": [2], "s": [5], "v": [0.5]})), dims=["t", "s"])
    a2, b2 = align(a, b, join="outer")
    rows_a = {(r["t"], r["s"], r["u"]) for r in a2.df.collect()}
    rows_b = {(r["t"], r["s"], r["v"]) for r in b2.df.collect()}
    # full 2x2 grid on both sides, nulls where absent
    assert {(t, s) for t, s, _ in rows_a} == {(1, 1), (1, 5), (2, 1), (2, 5)}
    assert rows_a == {(1, 1, 1.0), (1, 5, None), (2, 1, None), (2, 5, None)}
    assert rows_b == {(2, 5, 0.5), (1, 1, None), (1, 5, None), (2, 1, None)}


def test_materialize_gate_ignores_attribute_names(spark):
    """A fact scan whose COLUMN ALIASES spell reduction-node names must
    pass through untouched (node names match at line starts only)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    fact = li.select(
        F.col("l_quantity").alias("AggregateRevenue"),
        F.col("l_orderkey").alias("DeduplicatedKey"),
        F.col("l_partkey").alias("GlobalLimitMarker"),
    ).where(F.col("AggregateRevenue") > 0)
    assert materialize_if_derived(fact) is fact


def test_materialize_gate_still_truncates_true_aggregates(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    assert materialize_if_derived(agg) is not agg


def test_local_df_matches_list_path_for_naive_timestamps(spark):
    """local_df (Arrow local path) must interpret NAIVE datetimes
    exactly like createDataFrame(list): DRIVER-LOCAL wall time — pinned
    under a simulated non-UTC driver (the round-9 midbin scenario)."""
    import datetime as dt
    import os
    import time as _time
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        from xarray_spark._utils import local_df
        rows = [(dt.datetime(2024, 1, 1, 0, 0), 1.0),
                (dt.datetime(2024, 6, 15, 12, 0), 2.0)]
        schema = "k timestamp, v double"
        want = {(r["k"], r["v"])
                for r in spark.createDataFrame(rows, schema).collect()}
        got = {(r["k"], r["v"])
               for r in local_df(spark, rows, schema).collect()}
        assert got == want
        # NTZ stays wall-clock in both paths
        schema_ntz = "k timestamp_ntz, v double"
        want_ntz = {(r["k"], r["v"]) for r in
                    spark.createDataFrame(rows, schema_ntz).collect()}
        got_ntz = {(r["k"], r["v"]) for r in
                   local_df(spark, rows, schema_ntz).collect()}
        assert got_ntz == want_ntz
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()
