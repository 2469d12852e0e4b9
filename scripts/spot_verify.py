"""Spot-verify named queries against the DuckDB oracle at one or more SFs.
Usage: python scripts/spot_verify.py sf0.001[,sf0.01] q1 q2 ...  ('ALL' = all)"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as m  # noqa: E402
from hybrid_vector_search_spark.session import get_spark  # noqa: E402
from hybrid_vector_search_spark.sources import TABLES  # noqa: E402


def main() -> None:
    sfs = sys.argv[1].split(",")
    names = sys.argv[2:]
    qs, os_ = m.queries(), m.oracle_sql()
    if names == ["ALL"]:
        names = list(qs)
    spark = get_spark("spot-verify")
    fails = []
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in os_:
                print(sf, name, "rows-only", len(sdf), flush=True)
                continue
            odf = con.execute(os_[name]).fetchdf()
            cols = sorted(sdf.columns)
            if cols != sorted(odf.columns):
                print(sf, name, "COLS-MISMATCH", cols, sorted(odf.columns), flush=True)
                fails.append((sf, name))
                continue
            canon = lambda df: sorted(  # noqa: E731
                tuple(repr(v) for v in r) for r in df[cols].itertuples(index=False)
            )
            ok = canon(sdf) == canon(odf)
            print(sf, name, "match=", ok, flush=True)
            if not ok:
                fails.append((sf, name))
    print("FAILS", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
