"""Contract tests for decode_image's PIL branch (VERDICT r11 directive
#4 / ADVICE r11): the container has no PIL, so the branch ships with
zero executable coverage unless we inject a stub ``PIL`` module into
``sys.modules``. These tests pin the three behaviors the branch
promises:

1. the ONE raster-dict contract ({width, height, channels, maxval,
   pixels}) for every canonical mode family,
2. the canonical-mode normalization (ADVICE r11: paletted 'P' images
   must come back as RGB PIXELS, never 2-D palette indices; 32-bit 'I'
   images as 'I;16' with maxval 65535; grayscale as 'L' with 2D→3D
   shape normalization),
3. the OSError-quarantine path: PIL's UnidentifiedImageError IS an
   OSError, and it must land in the featurizer's per-row quarantine
   (ok=false + err), never crash the batch.

The stub is driver-side only — mapInPandas workers are separate
processes a sys.modules patch cannot reach — so the quarantine check
drives the module-level per-row body (_image_feature_row) the Spark
closure delegates to.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


class _FakeUnidentifiedImageError(OSError):
    """Mirrors PIL.UnidentifiedImageError's ancestry (an OSError)."""


def _install_stub_pil(monkeypatch, *, mode=None, arrays=None, open_exc=None):
    """Install a minimal PIL stub: Image.open returns a context-managed
    image of ``mode`` whose convert(m) yields ``arrays[m]`` via the
    __array__ protocol, or raises ``open_exc``."""

    class _Converted:
        def __init__(self, m):
            self._m = m

        def __array__(self, dtype=None, copy=None):
            a = arrays[self._m]
            return a if dtype is None else a.astype(dtype)

    class _FakeImage:
        def __init__(self):
            self.mode = mode
            self.converted_to = []

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def convert(self, m):
            self.converted_to.append(m)
            return _Converted(m)

    opened = []

    def _open(fp):
        if open_exc is not None:
            raise open_exc
        img = _FakeImage()
        opened.append(img)
        return img

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = _open
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    pil_mod.UnidentifiedImageError = _FakeUnidentifiedImageError
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    return opened


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n....."


def test_pil_paletted_mode_normalizes_to_rgb_pixels(monkeypatch):
    """'P' (paletted) images convert to RGB before np.asarray — the
    result is (h, w, 3) SAMPLE data with maxval 255, never the 2-D
    palette-index array the old dtype heuristic mislabeled as
    channels=1 grayscale (ADVICE r11)."""
    from data_ingestor_spark.ext.multimodal import decode_image

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    opened = _install_stub_pil(monkeypatch, mode="P", arrays={"RGB": rgb})
    out = decode_image(_PNG_MAGIC)
    assert opened[0].converted_to == ["RGB"]
    assert (out["width"], out["height"], out["channels"]) == (3, 2, 3)
    assert out["maxval"] == 255
    assert out["pixels"].shape == (2, 3, 3)
    assert (out["pixels"] == rgb).all()


def test_pil_32bit_integer_mode_gets_i16_maxval(monkeypatch):
    """'I' (32-bit integer) images convert to 'I;16': maxval comes from
    the canonical MODE (65535), not from the source dtype's itemsize,
    and the 2-D grayscale raster is normalized to (h, w, 1)."""
    from data_ingestor_spark.ext.multimodal import decode_image

    gray16 = np.full((4, 5), 300, dtype=np.uint16)
    opened = _install_stub_pil(monkeypatch, mode="I", arrays={"I;16": gray16})
    out = decode_image(_PNG_MAGIC)
    assert opened[0].converted_to == ["I;16"]
    assert (out["width"], out["height"], out["channels"]) == (5, 4, 1)
    assert out["maxval"] == 65535
    assert out["pixels"].shape == (4, 5, 1)
    assert (out["pixels"][:, :, 0] == gray16).all()


def test_pil_grayscale_mode_keeps_l_and_255(monkeypatch):
    """'L' stays in the grayscale family: canonical 'L', maxval 255,
    (h, w) → (h, w, 1)."""
    from data_ingestor_spark.ext.multimodal import decode_image

    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    opened = _install_stub_pil(monkeypatch, mode="L", arrays={"L": gray})
    out = decode_image(_PNG_MAGIC)
    assert opened[0].converted_to == ["L"]
    assert (out["width"], out["height"], out["channels"]) == (3, 2, 1)
    assert out["maxval"] == 255
    assert (out["pixels"][:, :, 0] == gray).all()


def test_pil_rgba_mode_flattens_to_rgb(monkeypatch):
    """Alpha'd / exotic modes route through 'RGB' — the featurizer's
    mean is over color samples only."""
    from data_ingestor_spark.ext.multimodal import decode_image

    rgb = np.zeros((1, 2, 3), dtype=np.uint8)
    opened = _install_stub_pil(monkeypatch, mode="RGBA", arrays={"RGB": rgb})
    out = decode_image(_PNG_MAGIC)
    assert opened[0].converted_to == ["RGB"]
    assert out["channels"] == 3 and out["maxval"] == 255


def test_pil_unidentified_image_error_is_quarantined(monkeypatch):
    """PIL decode failure: UnidentifiedImageError (an OSError) escapes
    decode_image as-is and the featurizer's per-row body quarantines it
    (ok=false, err text, NULL features) — the Exception-wide net the
    r11 self-review installed, now exercised on the exact error class
    PIL throws."""
    from data_ingestor_spark.ext.multimodal import _image_feature_row, decode_image

    _install_stub_pil(
        monkeypatch, open_exc=_FakeUnidentifiedImageError("cannot identify image")
    )
    with pytest.raises(OSError, match="cannot identify image"):
        decode_image(_PNG_MAGIC)

    row = _image_feature_row(42, _PNG_MAGIC)
    assert row["doc_id"] == 42
    assert row["ok"] is False
    assert "cannot identify image" in row["err"]
    assert row["width"] is None and row["mean_milli"] is None


def test_pil_good_decode_through_feature_row(monkeypatch):
    """The happy PIL path through the same per-row body: exact
    integer-milli mean over the canonical raster."""
    from data_ingestor_spark.ext.multimodal import _image_feature_row

    rgb = np.full((2, 2, 3), 7, dtype=np.uint8)
    _install_stub_pil(monkeypatch, mode="RGB", arrays={"RGB": rgb})
    row = _image_feature_row(7, _PNG_MAGIC)
    assert row["ok"] is True
    assert (row["width"], row["height"], row["channels"]) == (2, 2, 3)
    assert row["mean_milli"] == 7000


def test_decode_image_without_pil_still_raises_not_implemented(monkeypatch):
    """With PIL genuinely absent (sys.modules['PIL'] = None makes the
    import raise regardless of environment — ADVICE r11 on the
    env-conditional test), foreign magics refuse with
    NotImplementedError."""
    from data_ingestor_spark.ext.multimodal import decode_image

    monkeypatch.setitem(sys.modules, "PIL", None)
    with pytest.raises(NotImplementedError, match="no codec"):
        decode_image(_PNG_MAGIC)


def test_ppm_separator_byte_hardening():
    """VERDICT r11 'What's wrong' #3, both reachable hazards: (a) a
    maxval token abutting EOF (no separator byte at all) names the
    separator, not a confusing truncation count; (b) a comment line
    spliced between header and raster rejects as ambiguous instead of
    silently mis-slicing pixels by its length; (c) a raster whose FIRST
    PIXEL is 0x23 ('#') with exact length still decodes — sample data,
    not a comment."""
    from data_ingestor_spark.ext.multimodal import decode_ppm, encode_ppm

    with pytest.raises(ValueError, match="separator"):
        decode_ppm(b"P6\n2 2\n255")  # header ends at EOF, no separator
    good = encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    # header is b"P6\n2 2\n255\n" (11 bytes); splice a comment line
    # between the separator and the raster
    bad = good[:11] + b"# injected comment\n" + good[11:]
    with pytest.raises(ValueError, match="comment lines are not allowed"):
        decode_ppm(bad)
    # '#' as genuine first-pixel data (exact-length raster) decodes
    arr = np.full((2, 2, 3), 0x23, dtype=np.uint8)
    out = decode_ppm(encode_ppm(arr))
    assert (out["pixels"] == arr).all()
    # ADVICE r12 #1: same '#'-leading raster with a benign trailing
    # newline (some netpbm writers emit one) decodes instead of
    # quarantining — whitespace slack is not a comment
    out2 = decode_ppm(encode_ppm(arr) + b"\n")
    assert (out2["pixels"] == arr).all()
    # ... but non-whitespace slack after a '#'-leading raster stays
    # rejected: neither a clean comment line nor raster+newline
    with pytest.raises(ValueError, match="ambiguous '#'"):
        decode_ppm(encode_ppm(arr) + b"junk")
    # the untouched payload still round-trips
    assert decode_ppm(good)["width"] == 2
