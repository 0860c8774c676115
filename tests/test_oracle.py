"""Full driver-contract gate at sf0.001 (fast) — every queries() entry
vs its DuckDB oracle. The driver runs the same comparison at sf0.01."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest

from oracle_harness import run_all

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gate_results(spark):
    return run_all(spark, SF_DIR)


def test_all_queries_pass(gate_results):
    failures = {k: v for k, v in gate_results.items() if v}
    assert not failures, "\n".join(m for msgs in failures.values() for m in msgs)


def test_entry_smoke(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
