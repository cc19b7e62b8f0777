"""Pure-Python image codec (BMP/PPM) + real decode→resize path.

The round-trip tests pin the byte-level format contracts (bottom-up BGR
rows, 4-byte padding, top-down negative height, P6 header tolerance); the
Spark test drives resize_images through decode_image's magic-byte dispatch
— no registered decoder, no fake — and checks pixels against numpy.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    resize_images,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (12, 16), (7, 3)])
def test_bmp_roundtrip(h, w):
    # odd widths force non-zero row padding — the classic BMP decode bug
    arr = _img(h, w, seed=h * 100 + w)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_bmp_topdown_negative_height():
    arr = _img(4, 5, seed=9)
    buf = bytearray(encode_bmp(arr))
    # flip to the top-down convention: negate height, reorder rows
    h = 4
    buf[22:26] = (-h).to_bytes(4, "little", signed=True)
    stride = 3 * 5 + ((-15) % 4)
    rows = bytes(buf[54:])
    flipped = b"".join(
        rows[i * stride : (i + 1) * stride] for i in reversed(range(h))
    )
    assert np.array_equal(decode_bmp(bytes(buf[:54]) + flipped), arr)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG....")
    buf = bytearray(encode_bmp(_img(2, 2)))
    buf[28:30] = (8).to_bytes(2, "little")  # 8-bit palette BMP
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(buf))


def test_ppm_roundtrip_and_comments():
    arr = _img(6, 4, seed=3)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    with_comment = b"P6\n# a comment\n4 6\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(with_comment), arr)


def test_decode_image_magic_dispatch():
    arr = _img(3, 3, seed=5)
    assert np.array_equal(decode_image(encode_bmp(arr), {}), arr)
    assert np.array_equal(decode_image(encode_ppm(arr), {}), arr)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....", {})


def test_resize_real_bmp_decode(spark):
    """End-to-end: BMP payloads through resize_images with NO decoder arg —
    decode_image's magic sniff must pick the pure-Python BMP path — and the
    8x8 nearest-neighbor output must equal numpy's index-map resample."""
    imgs = {i: _img(12, 16, seed=i) for i in range(4)}
    rows = [
        (i, encode_bmp(a), {"width": 16, "height": 12, "sample_rate": None, "n_frames": 1})
        for i, a in imgs.items()
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    out = {
        r["doc_id"]: r["pixels"]
        for r in resize_images(media, width=8, height=8).collect()
    }
    ri = (np.arange(8) * 12) // 8
    ci = (np.arange(8) * 16) // 8
    for i, a in imgs.items():
        expect = a[ri][:, ci].reshape(-1).astype(float).tolist()
        assert out[i] == expect
