"""PIL-free host decode (r4 verdict task 9): the C++ libjpeg/libpng shim
decodes the serving path's images; PIL is only a fallback."""

import io
import sys

import numpy as np
import pytest

from transformers_tpu.image_codecs import (
    decode_image,
    native_codecs_available,
)

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def rgb():
    return np.random.default_rng(0).integers(0, 256, (40, 56, 3), dtype=np.uint8)


def _encode(rgb, fmt, **kw):
    buf = io.BytesIO()
    PIL.fromarray(rgb).save(buf, format=fmt, **kw)
    return buf.getvalue()


def test_native_codecs_present(rgb):
    assert native_codecs_available(), \
        "native jpeg/png codecs must build on this image (g++ + headers present)"


def test_png_decode_bit_exact(rgb):
    data = _encode(rgb, "PNG")
    out = decode_image(data)
    np.testing.assert_array_equal(out, rgb)


def test_jpeg_decode_matches_pil(rgb):
    data = _encode(rgb, "JPEG", quality=90)
    out = decode_image(data)
    with PIL.open(io.BytesIO(data)) as im:
        ref = np.asarray(im.convert("RGB"))
    # PIL links the same libjpeg: identical IDCT output
    np.testing.assert_array_equal(out, ref)


def test_png_palette_and_gray(rgb):
    gray = rgb[:, :, 0]
    data = _encode(gray, "PNG")
    out = decode_image(data)
    np.testing.assert_array_equal(out, np.stack([gray] * 3, -1))
    pal = PIL.fromarray(rgb).convert("P", palette=PIL.Palette.ADAPTIVE)
    buf = io.BytesIO()
    pal.save(buf, format="PNG")
    out = decode_image(buf.getvalue())
    ref = np.asarray(pal.convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_image_pipeline_without_pil(rgb, tmp_path, monkeypatch):
    """The serving-path decode (bytes + file through load_image) must run
    with PIL IMPORT BLOCKED when the native codecs are live."""
    from transformers_tpu.image_processing_utils import load_image

    jpg = tmp_path / "x.jpg"
    jpg.write_bytes(_encode(rgb, "JPEG", quality=95))
    png_bytes = _encode(rgb, "PNG")

    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "PIL" or k.startswith("PIL.")}
    monkeypatch.setitem(sys.modules, "PIL", None)  # import PIL -> ImportError
    try:
        arr = load_image(png_bytes)
        assert arr.shape == (3, 40, 56)
        np.testing.assert_array_equal(arr, rgb.transpose(2, 0, 1))
        arr2 = load_image(str(jpg))
        assert arr2.shape == (3, 40, 56)
    finally:
        sys.modules.update(saved)
