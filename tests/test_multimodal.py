"""Multimodal plumbing: schema, Arrow batching, determinism, codec gating.

The codec lane is environment-honest: with no Pillow in the container the
gate tests assert the NotImplementedError contract; if Pillow ever lands,
those auto-skip and the real-codec tests (PNG round-trip through the SAME
decode_media dispatch and resize_images plumbing) take over — `pytest -k
codec` is green either way, and the upgrade is zero-diff (multimodal.py:85).
"""

from __future__ import annotations

import importlib.util

import pytest

_HAS_PIL = importlib.util.find_spec("PIL") is not None
needs_codec = pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
codecless = pytest.mark.skipif(_HAS_PIL, reason="Pillow installed — gate inactive")


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


@codecless
def test_real_codec_slot_still_gated():
    from hybrid_vector_search_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")


@needs_codec
def test_real_codec_png_roundtrip():
    """With Pillow present, decode_image round-trips a real PNG bit-exactly
    and decode_media reaches it through the same format dispatch."""
    import io

    import numpy as np

    from hybrid_vector_search_spark.multimodal import decode_image, decode_media

    from PIL import Image

    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, format="PNG")
    png = buf.getvalue()
    assert (decode_image(png) == src).all()
    via_dispatch = decode_media(png, {"format": "png", "width": 9, "height": 6})
    assert (via_dispatch == src).all()


@needs_codec
def test_real_codec_resize_images(spark):
    """resize_images over real PNG content: identical plumbing, real decode."""
    import io

    import numpy as np

    from hybrid_vector_search_spark.multimodal import MEDIA_SCHEMA, resize_array, resize_images

    from PIL import Image

    rows = []
    imgs = {}
    for i in range(4):
        arr = np.random.default_rng(i).integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        rows.append((i, "image", buf.getvalue(), (10, 12, None, None, "png")))
        imgs[i] = arr
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(media, width=5, height=6).collect()}
    for i, arr in imgs.items():
        want = resize_array(arr, width=5, height=6)
        assert bytes(out[i].content) == want.tobytes()
        assert out[i].meta.format == "raw-rgb"


def test_resize_array_matches_reference():
    """The resize math is real: nearest-neighbor gather against a hand
    reference, exact."""
    import numpy as np

    from hybrid_vector_search_spark.multimodal import resize_array

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_array(img, width=3, height=2)
    assert out.shape == (2, 3, 3)
    # rows map 0,1 -> 0,2 ; cols 0,1,2 -> 0,2,4
    ref = img[[0, 2]][:, [0, 2, 4]]
    assert (out == ref).all()
    # upscale repeats samples, never interpolates out-of-range values
    up = resize_array(img, width=12, height=8)
    assert up.shape == (8, 12, 3)
    assert set(np.unique(up)) <= set(np.unique(img))


def test_resize_images_plumbing(spark):
    """resize_images: same schema out, meta updated, raw-rgb payload of
    exactly h*w*3 bytes, deterministic across runs."""
    from hybrid_vector_search_spark.multimodal import resize_images, synthetic_media

    media = synthetic_media(spark, 10, kind="image").repartition(3)
    out = resize_images(media, width=16, height=8)
    assert out.schema == media.schema
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 10
    for r in rows.values():
        assert r.meta.width == 16 and r.meta.height == 8
        assert r.meta.format == "raw-rgb"
        assert len(r.content) == 16 * 8 * 3
    again = {r.media_id: bytes(r.content) for r in resize_images(media, width=16, height=8).collect()}
    assert all(bytes(rows[i].content) == again[i] for i in rows)


def test_sample_frames_schedule(spark):
    """sample_frames: one row per (media_id, frame_idx) at 0, step, 2·step
    … < duration; deterministic frame bytes."""
    import math

    from hybrid_vector_search_spark.multimodal import sample_frames, synthetic_media

    media = synthetic_media(spark, 5, kind="video")  # duration_ms = 1000
    out = sample_frames(media, every_ms=300)
    rows = out.collect()
    per = math.ceil(1000 / 300)  # t = 0, 300, 600, 900
    assert len(rows) == 5 * per
    one = sorted((r for r in rows if r.media_id == 2), key=lambda r: r.frame_idx)
    assert [r.t_ms for r in one] == [0, 300, 600, 900]
    assert all(len(r.frame) == 64 for r in one)
    again = sorted(
        (r for r in sample_frames(media, every_ms=300).collect() if r.media_id == 2),
        key=lambda r: r.frame_idx,
    )
    assert [bytes(r.frame) for r in one] == [bytes(r.frame) for r in again]

    with pytest.raises(ValueError):
        sample_frames(media, every_ms=0)


def test_decode_media_dispatches_on_declared_format():
    """decode_media routes on meta['format'], not on whether a codec library
    happens to be importable: raw-rgb reshapes the bytes directly, fake (or
    unset) runs the md5-chain fake, and a real codec name reaches the gated
    decode_image (NotImplementedError in this codec-less container)."""
    import numpy as np
    import pytest

    from hybrid_vector_search_spark.multimodal import decode_media, fake_decode

    raw = bytes(range(48)) * 2  # 96 bytes = 4x8 rgb
    img = decode_media(raw, {"format": "raw-rgb", "width": 8, "height": 4})
    assert img.shape == (4, 8, 3) and img.dtype == np.uint8
    assert img.tobytes() == raw  # reshape, never re-derived

    blob = b"anything"
    fake = decode_media(blob, {"format": "fake", "width": 8, "height": 4})
    assert (fake == fake_decode(blob, 8, 4)).all()
    assert (decode_media(blob, {"width": 8, "height": 4}) == fake).all()

    # format='png' routes to the dependency-free stdlib codec (real decode,
    # no Pillow needed — png_codec); grey expands to the HxWx3 contract
    from hybrid_vector_search_spark.png_codec import encode_png

    grey = np.arange(32, dtype=np.uint8).reshape(4, 8)
    via_png = decode_media(
        encode_png(grey), {"format": "png", "width": 8, "height": 4}
    )
    assert via_png.shape == (4, 8, 3)
    assert (via_png[:, :, 0] == grey).all() and (via_png[:, :, 2] == grey).all()

    if not _HAS_PIL:  # other real codec names reach the gated decode_image
        with pytest.raises(NotImplementedError):
            decode_media(b"\xff\xd8\xff jpeg", {"format": "jpeg", "width": 8, "height": 4})


def test_resize_output_consumable_as_raw_rgb(spark):
    """A second resize over resize_images output must go through the raw-rgb
    reshape path (the output meta declares raw-rgb), not the fake decode —
    downsampling twice equals downsampling once for integer-ratio
    nearest-neighbor gathers with aligned grids."""
    from hybrid_vector_search_spark.multimodal import (
        resize_array,
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, 6)
    once = resize_images(media, width=16, height=16)
    twice = resize_images(once, width=8, height=8)
    direct = resize_images(media, width=8, height=8)
    got = {r.media_id: bytes(r.content) for r in twice.collect()}
    want = {r.media_id: bytes(r.content) for r in direct.collect()}
    assert got == want
    meta = twice.select("meta").head().meta
    assert (meta.width, meta.height, meta.format) == (8, 8, "raw-rgb")


def test_audio_windows_schedule_and_content(spark):
    """25ms/10ms framing: full windows only, correct sample offsets, RMS
    matches a direct numpy recompute of the md5-chain fake PCM."""
    import numpy as np

    from hybrid_vector_search_spark.multimodal import _md5_expand, audio_windows

    df = spark.createDataFrame(
        [
            (1, "audio", b"seed-a", {"sample_rate": "1000", "duration_ms": "100"}),
            (2, "audio", b"seed-b", {"sample_rate": "1000", "duration_ms": "24"}),
            (3, "audio", b"seed-c", {"sample_rate": "0", "duration_ms": "100"}),
        ],
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    rows = audio_windows(df, win_ms=25, hop_ms=10).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # clip 2 (shorter than one window) and clip 3 (no rate) emit nothing
    assert set(by_id) == {1}
    got = sorted(by_id[1], key=lambda r: r["win_idx"])
    # dur=100, win=25, hop=10 -> starts 0,10,...,70 (8 windows)
    assert [r["start_ms"] for r in got] == list(range(0, 71, 10))
    assert all(r["n_samples"] == 25 for r in got)  # 25ms at 1 kHz
    pcm = np.frombuffer(_md5_expand(b"seed-a", 100), dtype=np.uint8)
    for r in got:
        s0 = r["start_ms"]  # 1 kHz -> 1 sample per ms
        w = pcm[s0 : s0 + 25]
        assert bytes(r["window"]) == w.tobytes()
        assert r["rms_u8"] == round(
            float(np.sqrt(np.mean(w.astype(np.float64) ** 2))), 6
        )


def test_audio_windows_payload_modes_match_full(spark):
    """r14: payload='rms' / payload='schedule' only drop columns — every
    value they do emit equals the full kernel's, on BOTH lanes (fake-PCM
    meta clips and real decoded WAV), so a consumer that reads fewer
    columns computes the same declared result."""
    from hybrid_vector_search_spark.multimodal import (
        audio_windows,
        synthetic_media,
        synthetic_wav_corpus,
    )

    for media in (
        synthetic_media(spark, 25, kind="audio"),
        synthetic_wav_corpus(
            spark.range(12).selectExpr(
                "id AS doc_id", "cast(200 + id * 37 AS long) AS n_chars"
            )
        ),
    ):
        full = audio_windows(media).collect()
        rms = audio_windows(media, payload="rms").collect()
        sched = audio_windows(media, payload="schedule").collect()
        key = lambda r: (r["media_id"], r["win_idx"])  # noqa: E731
        f = {key(r): r for r in full}
        assert sorted(f) == sorted(key(r) for r in rms) == sorted(
            key(r) for r in sched
        )
        for r in rms:
            fr = f[key(r)]
            assert (r["start_ms"], r["n_samples"], r["rms_u8"]) == (
                fr["start_ms"], fr["n_samples"], fr["rms_u8"]
            )
        for r in sched:
            fr = f[key(r)]
            assert (r["start_ms"], r["n_samples"]) == (
                fr["start_ms"], fr["n_samples"]
            )
        assert "window" not in rms[0].asDict() and "rms_u8" not in sched[0].asDict()


def test_audio_windows_partition_invariant(spark):
    from hybrid_vector_search_spark.multimodal import audio_windows, synthetic_media

    media = synthetic_media(spark, 40, kind="audio")
    a = sorted(
        map(tuple, audio_windows(media.coalesce(1)).drop("window").collect())
    )
    b = sorted(
        map(tuple, audio_windows(media.repartition(7)).drop("window").collect())
    )
    assert a == b and len(a) > 0


def test_jpeg_gated_lane_pillow_parity(spark):
    """Runs only where Pillow exists (not this container): a REAL JPEG
    declared as format='jpeg' must route through decode_image's Pillow
    gate and come out of resize_images as the exact nearest-neighbor
    resize of Pillow's own decode — the same gated-lane contract the PNG
    codec has in test_png_codec.test_pillow_parity_when_available."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from hybrid_vector_search_spark.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        resize_array,
        resize_images,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(img).save(buf, format="JPEG", quality=95)
    jpeg = buf.getvalue()
    # JPEG is lossy: the comparison baseline is Pillow's decode of the
    # same bytes, not the source array
    decoded = np.asarray(PIL_Image.open(io.BytesIO(jpeg)))[:, :, :3]
    assert np.array_equal(decode_media(jpeg, {"format": "jpeg"}), decoded)

    df = spark.createDataFrame(
        [(0, "image", jpeg, (12, 16, None, None, "jpeg"))], MEDIA_SCHEMA
    )
    out = resize_images(df, width=6, height=8).collect()[0]
    assert (out["meta"]["width"], out["meta"]["height"]) == (6, 8)
    assert out["meta"]["format"] == "raw-rgb"
    got = np.frombuffer(bytes(out["content"]), dtype=np.uint8).reshape(8, 6, 3)
    assert np.array_equal(got, resize_array(decoded, width=6, height=8))


def test_jpeg_without_pillow_raises_honestly(spark):
    """In THIS container (no Pillow) a format='jpeg' blob must raise the
    loud NotImplementedError contract, not mis-decode via the fake."""
    try:
        import PIL.Image  # noqa: F401

        pytest.skip("Pillow present — the gated parity test covers this env")
    except ImportError:
        pass
    from hybrid_vector_search_spark.multimodal import decode_media

    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_media(b"\xff\xd8\xff\xe0fakejpegbytes", {"format": "jpeg"})
