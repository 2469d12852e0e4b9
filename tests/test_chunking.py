"""chunk_index boundary arithmetic: one Spark pass over every n in [0, 200]
compared against an independent Python reference — covers the empty doc,
n == size, n == size+1, and every stride remainder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _ref_chunks(n: int, size: int, stride: int) -> list[int]:
    if n <= 0:
        return []
    if n <= size:
        return [0]
    return list(range(1 + (n - size + stride - 1) // stride))


@pytest.mark.parametrize("size,stride", [(32, 24), (8, 8), (5, 1), (16, 16)])
def test_chunk_index_matches_reference(spark, size, stride):
    from hybrid_vector_search_spark.functions.text import chunk_index

    df = spark.range(0, 201).select(F.col("id").cast("int").alias("n"))
    got = {
        r.n: list(r.idx)
        for r in df.select("n", chunk_index(F.col("n"), size, stride).alias("idx")).collect()
    }
    for n in range(201):
        assert got[n] == _ref_chunks(n, size, stride), (n, size, stride)
        # coverage invariant: the last chunk's window reaches the last token
        if n > 0:
            last = got[n][-1]
            assert last * stride < n <= last * stride + size


def test_chunk_index_rejects_bad_params():
    from hybrid_vector_search_spark.functions.text import chunk_index

    with pytest.raises(ValueError):
        chunk_index(F.lit(10), 0, 1)
    with pytest.raises(ValueError):
        chunk_index(F.lit(10), 4, 5)  # stride > size would skip tokens
    with pytest.raises(ValueError):
        chunk_index(F.lit(10), 4, 0)
