"""png_codec: the dependency-free real-codec lane (r7 verdict ask #7).

encode → decode round-trips bit-exactly; all five PNG filters decode; a
real PNG flows through resize_images end-to-end (format='png' dispatch);
and when Pillow IS present (importorskip — absent in this container, the
lane runs wherever it exists) its decode agrees byte-for-byte with ours."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hybrid_vector_search_spark.png_codec import decode_png, encode_png


def _img(h=13, w=17, ch=3, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_roundtrip_bit_exact(ch):
    img = _img(ch=ch)
    back = decode_png(encode_png(img))
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def _png_with_filter(img: np.ndarray, filt: int) -> bytes:
    """Hand-assemble a PNG whose every scanline uses the given filter type,
    computing the filtered bytes per the spec — exercises the decoder's
    filter reconstruction, which encode_png (filter 0 only) never does."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int16)
    rows = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int16), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, dtype=np.int16), prev[:-ch]])
        if filt == 0:
            enc = cur
        elif filt == 1:
            enc = cur - left
        elif filt == 2:
            enc = cur - prev
        elif filt == 3:
            enc = cur - ((left + prev) >> 1)
        elif filt == 4:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        rows.append(bytes([filt]) + bytes((enc & 0xFF).astype(np.uint8)))
        prev = cur

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_all_filters_reconstruct(filt):
    img = _img(h=9, w=11)
    assert np.array_equal(decode_png(_png_with_filter(img, filt)), img)


def test_rejects_non_png_and_exotic():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    img = _img(h=2, w=2)
    png16 = encode_png(img)  # corrupt the depth byte in IHDR
    png16 = png16[:24] + bytes([16]) + png16[25:]
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(png16)


def test_real_png_through_resize_images(spark):
    """The gated real-codec lane, end to end in Spark: PNG-encoded content
    with format='png' metadata flows through resize_images' Arrow kernel
    and comes out as the raw-rgb contract with the requested dims and the
    ACTUAL decoded pixels (nearest-neighbor of the true image)."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.multimodal import (
        MEDIA_SCHEMA,
        resize_array,
        resize_images,
    )

    imgs = {i: _img(h=12, w=16, seed=i) for i in (1, 2)}
    rows = [
        (
            i,
            "image",
            bytearray(encode_png(img)),
            {"width": 16, "height": 12, "sample_rate": None,
             "duration_ms": None, "format": "png"},
        )
        for i, img in imgs.items()
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in resize_images(df, width=8, height=6).collect()
    }
    for i, img in imgs.items():
        r = out[i]
        assert (r["meta"]["width"], r["meta"]["height"]) == (8, 6)
        assert r["meta"]["format"] == "raw-rgb"
        got = np.frombuffer(bytes(r["content"]), dtype=np.uint8).reshape(6, 8, 3)
        want = resize_array(img, width=8, height=6)
        assert np.array_equal(got, want)


def test_pillow_parity_when_available():
    """Runs only where Pillow exists (not this container): PIL's decode of
    our encoder's output must equal the source array, and our decoder must
    equal PIL's on a PIL-encoded PNG."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = _img()
    assert np.array_equal(np.asarray(PIL_Image.open(io.BytesIO(encode_png(img)))), img)
    buf = io.BytesIO()
    PIL_Image.fromarray(img).save(buf, format="PNG")
    assert np.array_equal(decode_png(buf.getvalue()), img)


def test_roundtrip_property():
    """Property (hypothesis): arbitrary small uint8 images round-trip
    bit-exactly through encode_png → decode_png for every channel count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.sampled_from([1, 3, 4]),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def check(h, w, ch, seed):
        img = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, ch), dtype=np.uint8
        )
        assert np.array_equal(decode_png(encode_png(img)), img)

    check()
