"""Optional-dependency compressed-codec adapter (VERDICT r05 item 4).

Real 100-TB multimodal corpora are JPEG/PNG/MP4, not netpbm — the
injectable-decoder seam now tries Pillow for compressed images when the
library is importable, and keeps raising the same clean
``NotImplementedError`` when it is not. Both environments are covered:
the Pillow-present tests skip when it's absent (this sandbox), and the
absent-behavior tests skip when it's present, so the suite is green
either way and exercises whichever branch the environment offers.
"""

from __future__ import annotations

import importlib.util

import pytest

from pandas_etl_framework_spark.llmops import multimodal

PIL_AVAILABLE = importlib.util.find_spec("PIL") is not None

needs_pil = pytest.mark.skipif(
    not PIL_AVAILABLE, reason="Pillow not installed in this environment"
)
needs_no_pil = pytest.mark.skipif(
    PIL_AVAILABLE, reason="Pillow installed: absent-branch not reachable"
)


def _png_bytes(width: int, height: int, value: int) -> bytes:
    import io

    from PIL import Image

    img = Image.new("RGB", (width, height), (value, value, value))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@needs_pil
def test_decode_image_png_via_pillow():
    png = _png_bytes(4, 3, 200)
    d = multimodal.decode_image(png)
    assert (d["width"], d["height"]) == (4, 3)
    assert abs(d["mean_pixel"] - 200.0) < 1e-9


@needs_pil
def test_decode_image_jpeg_via_pillow():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (100, 100, 100)).save(buf, format="JPEG")
    d = multimodal.decode_image(buf.getvalue())
    assert (d["width"], d["height"]) == (8, 8)
    # JPEG is lossy; a solid-color image stays close to its value
    assert abs(d["mean_pixel"] - 100.0) < 5.0


@needs_pil
def test_pil_resize_roundtrips_to_netpbm():
    out = multimodal._pil_resize(_png_bytes(10, 10, 50), 4, 2)
    # output is binary PPM: the stdlib decoder must read it back
    d = multimodal.decode_image(out)
    assert (d["width"], d["height"]) == (4, 2)
    assert abs(d["mean_pixel"] - 50.0) < 1e-9


@needs_pil
def test_resize_images_pipeline_with_pillow(spark):
    rows = [(1, "image", _png_bytes(6, 6, 30), "image/png", 6, 6, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(media, 3, 2).collect()
    assert len(out) == 1
    d = multimodal.decode_image(bytes(out[0]["content"]))
    assert (d["width"], d["height"]) == (3, 2)
    assert out[0]["width"] == 3 and out[0]["height"] == 2


@needs_no_pil
def test_compressed_decode_still_raises_cleanly_without_pillow():
    with pytest.raises(NotImplementedError, match="install Pillow"):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


@needs_no_pil
def test_default_resizer_still_raises_cleanly_without_pillow(spark):
    rows = [(1, "image", b"\x89PNG\r\n\x1a\n" + b"\x00" * 32,
             "image/png", None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        multimodal.resize_images(media, 2, 2).collect()


def test_netpbm_path_unaffected_by_adapter():
    # the primary stdlib path must not consult Pillow at all
    raster = bytes(range(10, 22))
    d = multimodal.decode_image(b"P6\n2 2\n255\n" + raster)
    assert (d["width"], d["height"]) == (2, 2)
    assert abs(d["mean_pixel"] - sum(raster) / 12) < 1e-12


def test_dhash_neardup_banded_equals_brute_force(spark):
    """Pigeonhole recall proof on adversarial hashes: base fingerprints
    plus variants at exactly 1, 3, and 7 flipped bits (7 = the max the
    8-band guarantee covers) and one at 8 (must be excluded). The banded
    join must return exactly the brute-force pair set."""
    import itertools

    from pandas_etl_framework_spark.llmops.multimodal import (
        dhash_neardup_pairs,
    )

    bases = [0x0123456789ABCDE7, 0x7EDCBA9876543210, 0x00FF00FF00FF00FF]
    rows = []
    mid = 0
    for base in bases:
        variants = [
            base,
            base ^ (1 << 5),                       # distance 1
            base ^ (1 << 0) ^ (1 << 17) ^ (1 << 62),   # distance 3
            base ^ sum(1 << (8 * b) for b in range(7)),  # distance 7
            base ^ sum(1 << (8 * b + 1) for b in range(8)),  # distance 8
        ]
        for v in variants:
            # keep hashes in signed-64 range like dhash63 (sign bit clear)
            rows.append((mid, v & 0x7FFFFFFFFFFFFFFF))
            mid += 1
    hashes = spark.createDataFrame(rows, "media_id long, dhash long")
    got = {
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in dhash_neardup_pairs(hashes, max_distance=7).collect()
    }
    want = set()
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 7:
            want.add((ia, ib, d))
    assert got == want
    # and the 8-distance variant really was excluded from its own family
    assert not any(a % 5 == 0 and b == a + 4 for a, b, _ in got)


def test_dhash_neardup_threshold_guard():
    import pytest

    from pandas_etl_framework_spark.llmops.multimodal import (
        dhash_neardup_pairs,
    )

    with pytest.raises(ValueError):
        dhash_neardup_pairs(None, max_distance=8, bands=8)
