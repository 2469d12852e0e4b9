"""Local replica of the driver's correctness gate.

For each query in __spark_entry__.queries(), run the Spark DataFrame and the
DuckDB oracle (tables pre-registered as views over the same parquet) at
sf0.01, then compare row count, column-name set, and a value hash computed
over rows sorted by all columns with columns sorted by name (floats rounded
to 6 significant decimals to absorb float32/float64 representation drift).

Usage:
    python scripts/selfcheck.py [query ...]        # default: all queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/selfcheck.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "NULL"
    if not isinstance(v, (list, tuple, dict, bytes, str)):
        import pandas as pd

        if pd.isna(v):  # NaT / NaN: pandas' NULL vs Spark's None
            return "NULL"
    if hasattr(v, "isoformat"):  # datetime / date / pd.Timestamp
        import pandas as pd

        return str(pd.Timestamp(v).value)  # epoch ns: events timestamps are
        # TIMESTAMP(NANOS) parquet, which Spark reads as LongType — keep both
        # engines on the same integer representation
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as entry

    from hybrid_vector_search_spark.session import get_spark

    spark = get_spark("hvs-selfcheck")
    qs = entry.queries()
    osql = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in osql:
            print(f"ok?  {name}: no_oracle ({len(srows)} rows)")
            continue
        try:
            odf = con.sql(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"oracle error: {exc}"))
            print(f"FAIL {name}: oracle error: {exc}")
            continue
        ocols = list(odf.columns)
        orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_rows and ok_schema and _hash(srows, scols) == _hash(orows, ocols)
        if ok_rows and ok_schema and ok_hash:
            print(f"PASS {name} ({len(srows)} rows)")
        else:
            detail = (
                f"rows {len(srows)}/{len(orows)} schema "
                f"{sorted(scols)}~{sorted(ocols)} hash={ok_hash}"
            )
            failures.append((name, detail))
            print(f"FAIL {name}: {detail}")

    print(f"\n{len(failures)} failures")
    for n, d in failures:
        print(f"  {n}: {d[:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
