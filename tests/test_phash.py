"""multimodal perceptual hashing: dHash, planted-geometry corpus, band join."""

from __future__ import annotations

import numpy as np
import pytest


def test_dhash_realizes_target_bits():
    from hybrid_vector_search_spark.multimodal import dhash64

    bits = 0xDEADBEEFCAFE1234
    img = np.empty((8, 9), dtype=np.uint8)
    for r in range(8):
        cur = 128
        img[r, 0] = cur
        for c in range(8):
            cur += 8 if (bits >> (r * 8 + c)) & 1 else -8
            img[r, c + 1] = cur
    got = dhash64(img)
    # signed two's-complement int64: compare the 64-bit pattern, and the
    # value itself must fit the `h long` Arrow schema it flows through
    assert got & ((1 << 64) - 1) == bits
    assert -(1 << 63) <= got < (1 << 63)
    assert got < 0  # bit 63 of 0xDEAD... is set → negative when signed


def test_dhash_brightness_invariant():
    """The point of dHash: a global brightness shift preserves every
    adjacent comparison, so the hash is unchanged."""
    from hybrid_vector_search_spark.multimodal import dhash64

    rng = np.random.RandomState(3)
    img = rng.randint(60, 180, size=(8, 9)).astype(np.uint8)
    assert dhash64(img) == dhash64((img + 20).astype(np.uint8))


def test_neardup_pairs_geometry(spark):
    """Same-group Hamming == |v_i - v_j| (nested flips), cross-group pairs
    never qualify, diffs 4..5 are candidate-generated but verify-filtered."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.multimodal import (
        image_neardup_pairs,
        synthetic_png_corpus,
    )

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = image_neardup_pairs(synthetic_png_corpus(docs)).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    want = {}
    for i in range(24):
        for j in range(i + 1, 24):
            if i // 6 == j // 6 and abs(i % 6 - j % 6) <= 3:
                want[(i, j)] = abs(i % 6 - j % 6)
    assert got == want


def test_group_capacity_guard(spark):
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.multimodal import synthetic_png_corpus

    docs = spark.range(6 * (1 << 14), 6 * (1 << 14) + 1).select(
        F.col("id").alias("doc_id")
    )
    with pytest.raises(Exception, match="16383"):
        synthetic_png_corpus(docs).collect()
