"""Mirror of the driver's correctness gate: every queries() entry that has an
oracle_sql() entry is executed on Spark AND DuckDB at sf0.001 (and re-checked
at sf0.01 in test_oracle_parity_mid) and compared order-insensitively.

Run these locally BEFORE relying on the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from .conftest import SF_MID, SF_SMALL, compare_to_oracle, register_duck_views


def _pairs():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    return [(name, q[name], o[name]) for name in q if name in o]


def _ids():
    return [name for name, _, _ in _pairs()]


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=_ids())
def test_oracle_parity_small(spark, duck, name, qfn, sql):
    register_duck_views(duck, SF_SMALL)
    compare_to_oracle(qfn(spark, SF_SMALL), duck, sql)


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=_ids())
def test_oracle_parity_mid(spark, duck, name, qfn, sql):
    register_duck_views(duck, SF_MID)
    compare_to_oracle(qfn(spark, SF_MID), duck, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def _no_oracle_pairs():
    """queries() entries with NO oracle_sql() twin (sketch estimates, ANN).

    The oracle-parity params above already execute every oracle-checkable
    query; these would otherwise only ever run under the driver — which
    is exactly how r3's testdata regeneration broke two queries without any
    pytest turning red. Together the two parametrizations execute the WHOLE
    declared surface, so schema drift fails here in seconds, not in the
    driver's round artifacts."""
    import __spark_entry__ as entry_mod

    o = entry_mod.oracle_sql()
    return [(name, fn) for name, fn in entry_mod.queries().items() if name not in o]


@pytest.mark.parametrize(
    "name,qfn", _no_oracle_pairs(), ids=[n for n, _ in _no_oracle_pairs()]
)
def test_no_oracle_queries_execute(spark, name, qfn):
    df = qfn(spark, SF_SMALL)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
