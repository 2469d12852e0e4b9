"""Declarative data-quality constraints (the ingest validation sweep).

Every serious pipeline validates a new drop before processing it: null
checks, domain checks, key uniqueness, referential integrity. This module
is that sweep as composable constraint objects evaluated against a
DataFrame, returning ONE small relation ``(constraint, n_violations)`` a
gate can assert on (0 = pass) and a dashboard can trend.

Execution shape (the scale contract):
- all ROW-LEVEL checks (not_null / in_range / accepted_values / matches)
  fold into a SINGLE aggregate pass — one scan, one 1-row reduce, however
  many checks are declared;
- ``unique`` adds one groupBy on its key (count of keys seen more than
  once, so the violation count is stable, not row-multiplied);
- ``foreign_key`` adds one broadcast-or-shuffle anti join per reference
  (dimension refs broadcast like any dimension);
- the per-check counts union into the report, each branch a scalar-sized
  relation — report size = number of checks, never rows.

The whole report is plain Catalyst, so a DuckDB oracle replays it
(`data_quality_report` driver query).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A named constraint. ``violation`` (row-level checks) is a boolean
    Column that is true where the ROW violates the constraint; aggregate
    checks (unique / foreign_key) carry their own evaluation instead."""

    name: str
    violation: Column | None = None
    kind: str = "row"
    params: tuple = field(default=())


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo=None, hi=None) -> Check:
    c = F.col(col)
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (c < F.lit(lo))
    if hi is not None:
        cond = cond | (c > F.lit(hi))
    # null is not a range violation — not_null() owns that claim
    return Check(f"in_range({col})", c.isNotNull() & cond)


def accepted_values(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(f"accepted_values({col})", c.isNotNull() & ~c.isin(*values))


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(f"matches({col})", c.isNotNull() & ~c.rlike(pattern))


def unique(col: str) -> Check:
    return Check(f"unique({col})", None, kind="unique", params=(col,))


def foreign_key(
    col: str, ref: DataFrame, ref_col: str, ref_name: str, broadcast: bool = False
) -> Check:
    """Rows of df whose ``col`` has no match in ``ref[ref_col]`` (nulls are
    not FK violations — SQL semantics). ``ref_name`` labels the report.

    ``broadcast=True`` force-broadcasts the reference keys — only safe when
    the reference is dimension-sized. The default leaves the join strategy
    to AQE/auto-broadcast so a fact-to-fact FK check shuffles instead of
    OOM-ing the driver."""
    return Check(
        f"foreign_key({col}->{ref_name}.{ref_col})",
        None,
        kind="fk",
        params=(col, ref, ref_col, broadcast),
    )


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(constraint, n_violations) — one row per declared check.

    An empty ``checks`` list yields an empty report with the same schema
    (not an error); duplicate check names are allowed — the unpivot is an
    explode over an array of structs, not a map, so no key-dedup policy
    applies and each declared check keeps its own row."""
    if not checks:
        return (
            df.sparkSession.range(0)
            .select(
                F.lit("").alias("constraint"),
                F.lit(0).cast("long").alias("n_violations"),
            )
        )
    row_checks = [c for c in checks if c.kind == "row"]
    parts: list[DataFrame] = []
    if row_checks:
        agg = df.agg(
            *[
                F.sum(c.violation.cast("long")).alias(f"_v{i}")
                for i, c in enumerate(row_checks)
            ]
        )
        # one aggregate pass → unpivot the 1-row result to (constraint, n);
        # array-of-structs (not map_from_arrays) so duplicate names survive
        parts.append(
            agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c.name).alias("constraint"),
                                F.coalesce(F.col(f"_v{i}"), F.lit(0))
                                .cast("long")
                                .alias("n_violations"),
                            )
                            for i, c in enumerate(row_checks)
                        ]
                    )
                ).alias("kv")
            ).select("kv.constraint", "kv.n_violations")
        )
    for c in checks:
        if c.kind == "unique":
            (col,) = c.params
            dup_keys = (
                df.where(F.col(col).isNotNull())
                .groupBy(col)
                .agg(F.count("*").alias("n"))
                .where(F.col("n") > 1)
            )
            parts.append(
                dup_keys.agg(
                    F.lit(c.name).alias("constraint"),
                    F.coalesce(F.count("*"), F.lit(0)).cast("long").alias("n_violations"),
                )
            )
        elif c.kind == "fk":
            col, ref, ref_col, bcast = c.params
            ref_keys = ref.select(F.col(ref_col).alias(col)).distinct()
            if bcast:
                ref_keys = F.broadcast(ref_keys)
            missing = df.where(F.col(col).isNotNull()).join(
                ref_keys, col, "left_anti"
            )
            parts.append(
                missing.agg(
                    F.lit(c.name).alias("constraint"),
                    F.count("*").cast("long").alias("n_violations"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
