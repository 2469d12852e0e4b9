from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hybrid_vector_search_spark.session import get_spark

    s = get_spark("hvs-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    yield con
    con.close()


def register_duck_views(con, sf_dir: str) -> None:
    from hybrid_vector_search_spark.sources import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def compare_to_oracle(spark_df, con, sql: str, float_dp: int | None = None):
    """Mirror the driver's check: row count + column names + order-insensitive
    value multiset, with columns sorted by name."""
    import math

    sdf = spark_df.toPandas()
    odf = con.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    cols = sorted(sdf.columns)

    def canon(df):
        rows = []
        for row in df[cols].itertuples(index=False):
            vals = []
            for v in row:
                if isinstance(v, float):
                    if math.isnan(v):
                        vals.append("NaN")
                    elif float_dp is not None:
                        vals.append(f"{round(v, float_dp):.{float_dp}f}")
                    else:
                        vals.append(repr(v))
                else:
                    vals.append(str(v))
            rows.append(tuple(vals))
        return sorted(rows)

    s_rows, o_rows = canon(sdf), canon(odf)
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in o_rows][:5]
        diff_o = [r for r in o_rows if r not in s_rows][:5]
        raise AssertionError(f"value mismatch.\n spark-only: {diff_s}\n oracle-only: {diff_o}")
