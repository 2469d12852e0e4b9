"""Nested-array flatten (the reference's transform-seed step).

Reference semantics (transform-seed.py:64-94): iterate the parent collection,
explode the ``products`` array into one output document per element, where
each output document gets
- every parent field EXCEPT an excluded set ({products,
  description_embeddings, image_embeddings}, transform-seed.py:71-77),
- ``catalogId`` := the parent's ``_id`` (transform-seed.py:78-80),
- the element embedded whole as a ``product`` struct (transform-seed.py:82),
- ``_id`` := the element's own ``_id`` when present, else a fresh id
  (transform-seed.py:83-91).

Here that whole loop is a single ``explode`` projection — one narrow
transformation, no shuffle, fully parallel at any scale. The inverse
(``nest``) is provided for round-trip tests and for building reference-shaped
nested tables from flat ones.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flatten(
    df: DataFrame,
    array_col: str,
    *,
    parent_id_col: str = "_id",
    parent_id_out: str = "catalogId",
    child_alias: str = "product",
    child_id_field: str | None = "_id",
    output_id_col: str = "_id",
    exclude: Sequence[str] = (),
) -> DataFrame:
    """One output row per array element, parent fields copied alongside.

    Uses ``explode`` (drops rows with empty/null arrays, matching the
    reference's per-element loop which emits nothing for empty arrays).
    """
    dropped = set(exclude) | {array_col}
    parent_cols = [c for c in df.columns if c not in dropped and c != parent_id_col]
    out = df.select(
        F.col(parent_id_col).alias(parent_id_out),
        *parent_cols,
        F.explode(F.col(array_col)).alias(child_alias),
    )
    if child_id_field is not None:
        fresh: Column = F.concat_ws(
            "-", F.col(parent_id_out).cast("string"), F.monotonically_increasing_id().cast("string")
        )
        out = out.withColumn(
            output_id_col,
            F.coalesce(F.col(f"{child_alias}.{child_id_field}").cast("string"), fresh),
        )
    return out


def nest(
    df: DataFrame,
    group_cols: Sequence[str],
    child_cols: Sequence[str],
    *,
    array_col: str = "products",
) -> DataFrame:
    """Inverse of flatten: collect child columns into an array<struct> per
    group. Element order inside the array is nondeterministic (Spark makes no
    ordering promise for collect_list after a shuffle) — consumers needing
    determinism must sort with ``array_sort`` or compare post-explode."""
    child_struct = F.struct(*[F.col(c) for c in child_cols])
    return df.groupBy(*group_cols).agg(F.collect_list(child_struct).alias(array_col))
