"""Multimodal plumbing: schema, Arrow batching, determinism, codec gating."""

from __future__ import annotations

import pytest


def test_feature_extraction_plumbing(spark):
    import numpy as np

    from hybrid_vector_search_spark.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, 40, kind="image").repartition(4)
    out = extract_features(media, dim=16)
    rows = out.collect()
    assert len(rows) == 40
    assert "content" not in out.columns  # bytes dropped before any shuffle
    by_id = {r.media_id: r.features for r in rows}
    assert all(len(v) == 16 for v in by_id.values())
    # deterministic: same id → same features across runs
    again = {r.media_id: r.features for r in extract_features(media, dim=16).collect()}
    assert all(np.allclose(by_id[i], again[i], atol=0) for i in by_id)


def test_features_usable_by_knn(spark):
    """Extracted features slot straight into the KNN operator — the
    multimodal column is a first-class vector column."""
    from hybrid_vector_search_spark.multimodal import extract_features, synthetic_media
    from hybrid_vector_search_spark.operators.knn import knn

    media = synthetic_media(spark, 30, kind="audio")
    feats = extract_features(media, dim=16)
    qv = [float(x) for x in feats.where("media_id = 3").head().features]
    top = knn(feats, qv, 3, vector_col="features", id_col="media_id").collect()
    assert top[0].media_id == 3 and top[0].score == 1.0


def test_codec_slots_gated(spark):
    from hybrid_vector_search_spark.multimodal import decode_image, resize_images, synthetic_media

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")
    with pytest.raises(NotImplementedError):
        resize_images(synthetic_media(spark, 1), width=32, height=32)
