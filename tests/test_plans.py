"""Physical-plan regression guards: the scale-critical plan properties
(SCALE.md core invariants) asserted on the real optimized plans, so a
future refactor that silently loses pushdown or broadcasts fails CI."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry(spark):
    import __spark_entry__ as em
    return em


def test_sel_filter_reaches_parquet_scan(spark, entry):
    df = entry.q02_sel_label_slice(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_projection_pruned_to_needed_columns(spark, entry):
    df = entry.q02_sel_label_slice(spark, SF)
    plan = plan_of(df)
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    # only the columns the query touches — not the 16-column lineitem
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_binary_align_broadcasts_small_side(spark, entry):
    df = entry.q19_binary_align(spark, SF)
    assert "BroadcastHashJoin" in plan_of(df)


def test_reduction_has_partial_final_agg(spark, entry):
    df = entry.q01_pricing_summary(spark, SF)
    plan = plan_of(df)
    # partial + final HashAggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_label_semi_join_broadcast_for_isel(spark, entry):
    df = entry.q03_isel_head(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_no_cartesian_in_gate_queries(spark, entry):
    """No gate query may plan an unbounded cartesian product (the
    broadcast nested-loop joins from as-of label matching are bounded:
    one side is a literal label table)."""
    for name, fn in entry.queries().items():
        if name in ("q67_stream_resample",):  # streaming: no batch plan
            continue
        plan = plan_of(fn(spark, SF))
        assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
