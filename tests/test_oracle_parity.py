"""Mini replica of the driver's t2 gate: every declared query with an oracle
must match DuckDB bit-exact at sf0.001 (fast) — run sf0.01 via
``SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py``."""

from __future__ import annotations

import os

import pytest

from lakehouse_workshop_spark.operators import all_oracles, all_queries

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def _oracle_names() -> list[str]:
    return sorted(all_oracles())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, name):
    from lakehouse_workshop_spark.oracle import compare_query

    fn = all_queries()[name]
    res = compare_query(name, fn(spark, PARITY_SF), all_oracles()[name], PARITY_SF)
    assert res.ok, str(res)


def test_all_queries_return_rows(spark):
    """Queries without oracles still must run and return a stable schema."""
    for name, fn in all_queries().items():
        df = fn(spark, PARITY_SF)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
