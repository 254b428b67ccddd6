"""Pure-numpy/stdlib pixel codecs for the multimodal operators (§2.9).

The container has no PIL/opencv/ffmpeg, but two mainstream formats need
no external codec at all: uncompressed BMP is headers + raw BGR(A) rows,
and PNG is stdlib ``zlib`` + the five spec scanline filters. Implementing
both turns the multimodal ``resize``/decode path from a stub into a real
pixel pipeline for every non-entropy-coded payload; JPEG (DCT+Huffman)
and GIF (LZW) stay honestly out of scope — ``decode_pixels`` raises
``NotImplementedError`` for them with the reason.

All decoders return ``uint8`` arrays shaped (height, width, channels)
with RGB(A) channel order; encoders are exact inverses
(``decode(encode(a)) == a``, property-tested in
tests/test_multimodal_pixels.py).

Reference scope note: the reference has no media pipeline at all — this
module supports the training-data extensions, not a ported operator.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# PNG color type → channels (spec 11.2.2); palette (3) handled via PLTE.
_PNG_CT_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------- BMP
def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24/32-bit BMP → (h, w, 3|4) uint8 RGB(A).

    Handles bottom-up (positive height) and top-down (negative) rows and
    the 4-byte row padding. Other bit depths / compressions raise."""
    if not b.startswith(b"BM") or len(b) < 54:
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h_raw = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} (only BI_RGB)")
    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} (only 24/32)")
    h = abs(h_raw)
    nch = bpp // 8
    row_bytes = (w * nch + 3) // 4 * 4
    need = data_off + row_bytes * h
    if len(b) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    grid = rows.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if h_raw > 0:  # bottom-up storage
        grid = grid[::-1]
    # BGR(A) → RGB(A)
    out = grid.copy()
    out[..., 0], out[..., 2] = grid[..., 2], grid[..., 0]
    return out


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB bottom-up BMP (exact inverse
    of :func:`decode_bmp` for 3-channel input)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3)")
    h, w, _ = arr.shape
    bgr = arr[..., ::-1]
    row_bytes = (w * 3 + 3) // 4 * 4
    pad = row_bytes - w * 3
    body = b"".join(
        bgr[y].tobytes() + bytes(pad) for y in range(h - 1, -1, -1)
    )
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


# ---------------------------------------------------------------------- PNG
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(b: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG → (h, w, c) uint8.

    Color types: gray(0), RGB(2), palette(3, via PLTE → RGB),
    gray+alpha(4), RGBA(6). All five scanline filters implemented per
    the spec (9.2); interlaced or 16-bit images raise."""
    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    i, n = 8, len(b)
    w = h = depth = ctype = interlace = None
    idat = []
    plte = None
    while i + 8 <= n:
        length = int.from_bytes(b[i : i + 4], "big")
        tag = b[i + 4 : i + 8]
        payload = b[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", payload[:8])
            depth, ctype, _comp, _filt, interlace = payload[8:13]
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        i += 12 + length  # len + tag + payload + crc
    if w is None:
        raise ValueError("PNG without IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    if ctype == 3:
        nch = 1
    elif ctype in _PNG_CT_CHANNELS:
        nch = _PNG_CT_CHANNELS[ctype]
    else:
        raise ValueError(f"PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        above = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(nch, stride):
                row[x] = (row[x] + row[x - nch]) & 0xFF
        elif f == 2:  # Up
            row = bytearray(
                (np.frombuffer(bytes(row), dtype=np.uint8) + above).astype(np.uint8).tobytes()
            )
        elif f == 3:  # Average
            for x in range(stride):
                a = row[x - nch] if x >= nch else 0
                row[x] = (row[x] + ((a + int(above[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = row[x - nch] if x >= nch else 0
                c = int(above[x - nch]) if x >= nch else 0
                row[x] = (row[x] + _paeth(a, int(above[x]), c)) & 0xFF
        else:
            raise ValueError(f"PNG filter {f}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
    img = out.reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[..., 0]]
    return img


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, c) uint8 (c ∈ {1, 2, 3, 4}) → non-interlaced 8-bit PNG
    (filter 0 rows, zlib) — exact inverse of :func:`decode_png`."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(nch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {nch}")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ dispatch
def decode_pixels(b: bytes) -> tuple[str, np.ndarray]:
    """Raw image bytes → (mime, (h, w, c) uint8 array).

    Real decode for PNG and uncompressed BMP; JPEG/GIF raise
    NotImplementedError (entropy codecs — DCT+Huffman / LZW — are out of
    scope without a codec library); anything else ValueError."""
    if b.startswith(_PNG_SIG):
        return "image/png", decode_png(b)
    if b.startswith(b"BM"):
        return "image/bmp", decode_bmp(b)
    if b.startswith(b"\xff\xd8"):
        raise NotImplementedError("JPEG entropy decode needs a codec library")
    if b[:6] in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("GIF LZW decode needs a codec library")
    raise ValueError("unrecognized image container")


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, c) → (out_h, out_w, c)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(ys, xs)]
