"""Pure-stdlib PNG codec (struct + zlib — no Pillow): a REAL image-decode
branch for the multimodal stages in a sandbox without imaging wheels.

Scope: the common still-image subset — 8-bit depth, color types 0 (gray),
2 (RGB), 6 (RGBA), all five scanline filters (None/Sub/Up/Average/Paeth,
RFC 2083 §6), non-interlaced. Anything else raises ValueError loudly.
The encoder emits filter-0 rows (enough for fixtures and round-trip tests);
the decoder handles every filter so externally-produced PNGs decode too.

Public-spec provenance: PNG (RFC 2083 / ISO 15948); the Paeth predictor is
the reference implementation transcribed from the spec's pseudocode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA → PNG bytes
    (8-bit, non-interlaced, filter 0 rows)."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        color, ch = 0, 1
        rows = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color, ch = 2, 3
        rows = px
    elif px.ndim == 3 and px.shape[2] == 4:
        color, ch = 6, 4
        rows = px
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[0], px.shape[1]
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for gray or (h, w, ch) for RGB/RGBA.
    Raises ValueError on non-PNG bytes or unsupported variants."""
    if not data or not data.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = len(_SIG), None, []
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("truncated PNG IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace}); this codec handles 8-bit "
            "gray/RGB/RGBA, non-interlaced"
        )
    ch = _CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG deflate stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], np.uint8
        ).astype(np.int64)
        if f == 0:
            recon = line
        elif f == 2:  # Up — vectorizable
            recon = (line + prior) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            recon = np.zeros(stride, np.int64)
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                up = prior[i]
                ul = prior[i - ch] if i >= ch else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(int(left), int(up), int(ul))
                recon[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    px = out.reshape(h, w, ch)
    return px[:, :, 0] if ch == 1 else px


def luma(px: np.ndarray) -> np.ndarray:
    """Rec. 601 luma as float64 (alpha ignored)."""
    if px.ndim == 2:
        return px.astype(np.float64)
    rgb = px[:, :, :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])


def pool8(gray: np.ndarray) -> np.ndarray:
    """Average-pool an (h, w) float array onto an 8×8 grid (equal-ish bins
    via reduceat; images smaller than 8 px repeat edge bins)."""
    g = np.asarray(gray, np.float64)
    h, w = g.shape
    yb = np.minimum((np.arange(8) * h) // 8, h - 1)
    xb = np.minimum((np.arange(8) * w) // 8, w - 1)
    rows = np.add.reduceat(g, yb, axis=0)
    cells = np.add.reduceat(rows, xb, axis=1)
    ycnt = np.diff(np.append(yb, h)).clip(min=1)
    xcnt = np.diff(np.append(xb, w)).clip(min=1)
    return cells / np.outer(ycnt, xcnt)
