"""Frequency sketches: exact heavy hitters and a count-min companion.

The exact path (groupBy + count + top-k) is the oracle-checkable truth; the
count-min path is the 100 TB substitute when the value domain itself is too
large to shuffle (e.g. trillions of distinct n-grams): per-partition sketches
are fixed-size (depth×width int64), merge by addition — an aggregate whose
shuffle payload is O(partitions·depth·width), independent of both row count
and cardinality. Candidates come from per-partition exact top-m heaps (a
heavy hitter globally is heavy in at least one partition when m is sized to
k·partitions — the standard SpaceSaving-style argument), then the merged
sketch serves point estimates.

Count-min guarantees estimate ≥ true count (one-sided error ≤ εN with
ε = e/width at depth ln(1/δ) rows) — pinned by property tests, not assumed.
Because the merge is a plain sum, the merged sketch equals the one-pass
global sketch under ANY partitioning or batching — which is what makes the
estimate (a) oracle-checkable in SQL (__spark_entry__._CM_HEAVY_HITTERS_ORACLE
replays the md5 cells) and (b) incrementally maintainable by the streaming
variant (streaming/sketch.py merges per-micro-batch partials into the same
state shape).

The two composable halves:
- :func:`sketch_partials`  — corpus → (cells ∪ candidates) mixed relation
- :func:`cm_topk`          — merged cells + candidate set → top-k estimates
:func:`count_min_heavy_hitters` is their one-shot batch composition.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic row hashes: md5 over salted value, reduced mod width.
# hashlib (not python hash()) so every executor/run agrees.


def _cm_rows(value: str, depth: int, width: int) -> list[int]:
    return [
        int.from_bytes(hashlib.md5(f"{d}#{value}".encode()).digest()[:8], "big") % width
        for d in range(depth)
    ]


def exact_heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact top-k most frequent values of ``col``: one shuffle (partial
    count map-side), TakeOrderedAndProject for the top-k. The oracle path."""
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(k)
    )


MIXED_SCHEMA = "kind string, row long, col long, n long, v string"


def sketch_partials(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    k: int = 20,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """One Arrow pass per partition emitting (a) the partition's local
    count-min cells as (row, col, n) triples and (b) its exact top-m local
    candidates, as one mixed relation (``kind`` = cell | cand). The value
    column is never globally shuffled — only these fixed-size partials are.
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(col).cast("string").alias("v"))
    # The SpaceSaving-style completeness argument ("a global heavy hitter is
    # heavy in at least one partition") needs m ≈ k·partitions when a value
    # can be spread evenly across partitions — so the default scales with the
    # actual partition count (bounded below for tiny inputs). The candidate
    # traffic stays ≤ partitions·m rows, never the data.
    n_parts = max(1, src.rdd.getNumPartitions())
    m = candidates_per_partition or max(k * n_parts, k * 4, 32)

    def part_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf["v"].dropna())
        if not counts:
            return
        sketch = np.zeros((depth, width), dtype=np.int64)
        for v, n in counts.items():
            for d, c in enumerate(_cm_rows(v, depth, width)):
                sketch[d, c] += n
        rows, cols = np.nonzero(sketch)
        yield pd.DataFrame(
            {
                "kind": "cell",
                "row": rows.astype("int64"),
                "col": cols.astype("int64"),
                "n": sketch[rows, cols],
                "v": None,
            }
        )
        # deterministic tie-break (count desc, value asc) — most_common()
        # breaks ties by insertion order, which varies with batch boundaries
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        yield pd.DataFrame(
            {
                "kind": "cand",
                "row": 0,
                "col": 0,
                "n": [int(n) for _, n in top],
                "v": [v for v, _ in top],
            }
        )

    return src.mapInPandas(part_kernel, MIXED_SCHEMA)


def cm_topk(
    merged: DataFrame,
    cands: DataFrame,
    k: int,
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Top-k (value, n_est) from a merged cell relation (row, col, n) and a
    candidate value relation (v). Estimate = min over the value's depth
    cells; cell coordinates via the same md5 hash in a tiny Arrow kernel
    over the candidate set only — never the data."""
    import pandas as pd

    def cand_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"v": [], "row": [], "col": []}
            for v in pdf["v"]:
                for d, c in enumerate(_cm_rows(v, depth, width)):
                    out["v"].append(v)
                    out["row"].append(d)
                    out["col"].append(c)
            yield pd.DataFrame(out)

    cells = cands.select("v").distinct().mapInPandas(cand_cells, "v string, row long, col long")
    est = (
        cells.join(merged, ["row", "col"], "left")
        .fillna(0, subset=["n"])
        .groupBy("v")
        .agg(F.min("n").alias("n_est"))
    )
    return (
        est.orderBy(F.desc("n_est"), F.asc("v"))
        .limit(k)
        .select(F.col("v").alias("value"), "n_est")
    )


def count_min_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    *,
    depth: int = 4,
    width: int = 2048,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """(value, n_est) for the top-k values by count-min ESTIMATE — the
    one-shot composition of sketch_partials + cm_topk."""
    mixed = sketch_partials(
        df, col, depth=depth, width=width, k=k,
        candidates_per_partition=candidates_per_partition,
    ).persist()
    merged = (
        mixed.where(F.col("kind") == "cell")
        .groupBy("row", "col")
        .agg(F.sum("n").alias("n"))
    )
    cands = mixed.where(F.col("kind") == "cand").select("v").distinct()
    out = cm_topk(merged, cands, k, depth=depth, width=width)
    # the result is k rows — materialize it (cutting lineage) so the persisted
    # per-partition sketch can be released instead of leaking executor memory
    out = out.localCheckpoint(eager=True)
    mixed.unpersist()
    return out
