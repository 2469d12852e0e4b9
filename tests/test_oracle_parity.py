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
