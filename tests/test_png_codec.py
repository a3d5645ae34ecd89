"""Pure-stdlib PNG codec (functions/png.py) + the PngBackend decode branch:
round-trip exactness, all five scanline filters, and the content-hash
property the fake backend can never give — two different ENCODINGS of the
same pixels produce the same perceptual hash."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from ptt_spider_go_ray.functions.png import (
    decode_png,
    encode_png,
    luma,
    pool8,
)
from ptt_spider_go_ray.stages.multimodal import (
    ImageDecoder,
    PHashStage,
    PngBackend,
    phash64,
)


def _rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(5, 9), (16, 16, 3), (7, 3, 4)])
def test_roundtrip_exact(shape):
    px = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(px))
    want = px if px.ndim > 2 else px
    assert out.shape == want.shape and (out == want).all()


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _filter_rows(px: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter known pixels per RFC 2083 so the decoder must invert
    Sub/Up/Average/Paeth to recover them."""
    h, w, ch = px.shape
    raw = b""
    prior = np.zeros(w * ch, np.int64)
    for y, f in zip(range(h), filters):
        line = px[y].reshape(-1).astype(np.int64)
        enc = np.zeros_like(line)
        for i in range(len(line)):
            left = line[i - ch] if i >= ch else 0
            up = prior[i]
            ul = prior[i - ch] if i >= ch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: _paeth(int(left), int(up), int(ul))}[f]
            enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prior = line
    return raw


def test_all_five_filters_invert():
    px = _rng().integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    raw = _filter_rows(px, [0, 1, 2, 3, 4])
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0)
    data = (sig + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    out = decode_png(data)
    assert (out == px).all()


def test_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"GIF89a not a png")
    with pytest.raises(ValueError):
        decode_png(b"")
    # 16-bit depth is out of scope and must fail loudly, not misdecode
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = sig + _chunk(b"IHDR", ihdr) + _chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)


def test_same_pixels_different_encoding_same_phash():
    """The REAL-decode property: RGB and RGBA(alpha=255) encodings of the
    same image are different BYTES but identical content — the fake backend
    hashes bytes (different), the PNG backend hashes pixels (identical)."""
    px = _rng().integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    rgba = np.dstack([px, np.full((24, 24), 255, np.uint8)])
    b_rgb, b_rgba = encode_png(px), encode_png(rgba)
    assert b_rgb != b_rgba
    be = PngBackend()
    h1 = phash64(be.gray8(b_rgb))
    h2 = phash64(be.gray8(b_rgba))
    assert h1 == h2
    f1, f2 = be.features(b_rgb), be.features(b_rgba)
    assert (f1 == f2).all() and abs(float(f1.sum()) - 1.0) < 1e-6


def test_pool8_tiny_and_uneven():
    g = np.arange(30, dtype=np.float64).reshape(5, 6)
    p = pool8(g)
    assert p.shape == (8, 8) and np.isfinite(p).all()
    # constant image pools to the constant
    assert (pool8(np.full((3, 3), 7.0)) == 7.0).all()


def test_image_decoder_stage_with_png_backend(ray_session):
    """The actor-pool stage contract on REAL pixels: width/height from IHDR,
    features from luma histograms — through the same batch path the crawl
    media feed uses."""
    imgs = [
        encode_png(_rng().integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        for (h, w) in [(10, 20), (32, 8), (6, 6)]
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(["d1", "d1", "d2"]),
            "span_idx": pa.array([0, 1, 0], pa.int32()),
            "media_ref": pa.array(["a.png", "b.png", "c.png"]),
            "body": pa.array(imgs, pa.large_binary()),
        }
    )
    out = ImageDecoder(backend="png")(batch)
    assert out["format"].to_pylist() == ["png"] * 3
    assert out["width"].to_pylist() == [20, 8, 6]
    assert out["height"].to_pylist() == [10, 32, 6]

    ph = PHashStage(backend="png")(batch)
    assert len(ph) == 3 and all(isinstance(x, int) for x in ph["phash"].to_pylist())


def test_sniff_kind_magic_table():
    from ptt_spider_go_ray.functions.wav import encode_wav
    from ptt_spider_go_ray.functions.y4m import encode_y4m
    from ptt_spider_go_ray.stages.multimodal import sniff_kind

    png = encode_png(_rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
    wav = encode_wav(np.zeros(16, np.int16))
    y4m = encode_y4m(np.zeros((1, 4, 4), np.uint8))
    assert sniff_kind(png) == "png"
    assert sniff_kind(wav) == "wav"
    assert sniff_kind(y4m) == "y4m"
    assert sniff_kind(b"\xff\xd8\xff\xe0 jfif") == "jpeg"
    assert sniff_kind(b"GIF89a...") == "gif"
    assert sniff_kind(b"RIFF....WEBP") == "webp"
    assert sniff_kind(b"RIFF....AVI ") == "riff-other"
    assert sniff_kind(b"%PDF-1.7") == "pdf"
    assert sniff_kind(b"PK\x03\x04zipzip") == "zip"
    assert sniff_kind(b"") == "unknown"
    assert sniff_kind(b"\x00filler|xxx") == "unknown"
