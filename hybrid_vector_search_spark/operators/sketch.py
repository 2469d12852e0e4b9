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


def count_min_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    *,
    depth: int = 4,
    width: int = 2048,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """(value, n_est) for the top-k values by count-min ESTIMATE.

    Plan: one Arrow pass per partition emits (a) the partition's local
    count-min cells as (row, col, n) triples and (b) its exact top-m local
    candidates; cells groupBy-sum into the merged sketch (bounded size),
    candidate estimates are min-over-rows lookups joined against it. The
    value column is never globally shuffled.
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

    mixed = src.mapInPandas(
        part_kernel, "kind string, row long, col long, n long, v string"
    ).persist()
    merged = (
        mixed.where(F.col("kind") == "cell")
        .groupBy("row", "col")
        .agg(F.sum("n").alias("n"))
    )
    cands = (
        mixed.where(F.col("kind") == "cand").select("v").distinct()
    )

    # estimate = min over depth rows of the merged sketch at the value's
    # cells; cell coordinates via the same Python hash in a tiny Arrow kernel
    # over the candidate set only (≤ partitions·m rows — never the data).
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

    cells = cands.mapInPandas(cand_cells, "v string, row long, col long")
    est = (
        cells.join(merged, ["row", "col"], "left")
        .fillna(0, subset=["n"])
        .groupBy("v")
        .agg(F.min("n").alias("n_est"))
    )
    out = (
        est.orderBy(F.desc("n_est"), F.asc("v"))
        .limit(k)
        .select(F.col("v").alias("value"), "n_est")
    )
    # the result is k rows — materialize it (cutting lineage) so the persisted
    # per-partition sketch can be released instead of leaking executor memory
    out = out.localCheckpoint(eager=True)
    mixed.unpersist()
    return out
