"""Real PNG decode (stdlib zlib + unfilter) and float-WAV decode tests.

PNGs are constructed in-test byte-by-byte (signature/IHDR/IDAT/IEND with
chosen per-row filters), so the decoder is checked against the spec, not
against itself.  The Pillow comparison is skip-marked when the library
is absent (the import-gated codec path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hta_spark.pipeline.multimodal import (decode_audio_samples,
                                           decode_image_pixels,
                                           decode_png_pixels)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body)))


def _png(pixels: np.ndarray, color_type: int, filters: list[int],
         plte: bytes | None = None) -> bytes:
    """Encode (h, w, ch) uint8 pixels as a PNG with the given per-row
    filter bytes (spec-exact filtering, the inverse of the decoder)."""
    h, w, ch = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        cur = pixels[r].reshape(-1).astype(np.int32)
        f = filters[r % len(filters)]
        raw.append(f)
        enc = np.zeros_like(cur)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            enc[x] = (cur[x] - pred) & 0xFF
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) \
        + _chunk(b"IEND", b"")


def _rng_pixels(h, w, ch, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_png_rgb_all_filters(filters):
    px = _rng_pixels(11, 7, 3)
    got = decode_png_pixels(_png(px, 2, filters))
    assert got.shape == (11, 7, 3)
    assert np.array_equal(got, px)


def test_png_gray_and_rgba():
    g = _rng_pixels(5, 9, 1)
    assert np.array_equal(decode_png_pixels(_png(g, 0, [4])), g)
    ga = _rng_pixels(4, 4, 2)
    assert np.array_equal(decode_png_pixels(_png(ga, 4, [3])), ga)
    rgba = _rng_pixels(6, 3, 4)
    assert np.array_equal(decode_png_pixels(_png(rgba, 6, [1, 4])), rgba)


def test_png_palette_expands():
    idx = np.array([[[0], [1]], [[2], [1]]], dtype=np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    got = decode_png_pixels(_png(idx, 3, [0], plte=plte))
    want = np.array([[[255, 0, 0], [0, 255, 0]],
                     [[0, 0, 255], [0, 255, 0]]], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_png_dispatch_and_errors():
    px = _rng_pixels(3, 3, 3)
    assert np.array_equal(decode_image_pixels(_png(px, 2, [2])), px)
    # header-only payload (the old fixture shape) errors loudly, not fake
    truncated = _png(px, 2, [0])[:40]
    with pytest.raises(ValueError):
        decode_png_pixels(truncated)


def test_png_16bit_gated():
    px = _rng_pixels(2, 2, 3)
    b = bytearray(_png(px, 2, [0]))
    b[24] = 16                       # IHDR bit-depth byte
    with pytest.raises(NotImplementedError):
        decode_png_pixels(bytes(b))


def test_pillow_agrees_when_present():
    pytest.importorskip("PIL")
    import io

    from PIL import Image
    px = _rng_pixels(8, 5, 3)
    buf = io.BytesIO()
    Image.fromarray(px, "RGB").save(buf, format="PNG")
    assert np.array_equal(decode_png_pixels(buf.getvalue()), px)


def _wav_float(x: np.ndarray, rate=8000) -> bytes:
    body = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def test_wav_float_decodes():
    x = np.linspace(-1, 1, 64)
    got = decode_audio_samples(_wav_float(x))
    assert got.shape == (64, 1)
    assert np.allclose(got[:, 0], x, atol=1e-6)


def test_compressed_audio_gated_or_decodes():
    try:
        import soundfile  # noqa: F401
        has_sf = True
    except ImportError:
        has_sf = False
    payload = b"OggS" + bytes(64)
    if not has_sf:
        with pytest.raises(NotImplementedError):
            decode_audio_samples(payload)
