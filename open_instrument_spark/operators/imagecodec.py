"""Pure-numpy/stdlib pixel codecs for the multimodal operators (§2.9).

The container has no PIL/opencv/ffmpeg, but three mainstream formats
need no external codec at all: uncompressed BMP is headers + raw BGR(A)
rows, PNG is stdlib ``zlib`` + the five spec scanline filters, and GIF's
LZW is ~50 lines of pure Python (spec appendix F). Implementing them
turns the multimodal ``resize``/decode path from a stub into a real
pixel pipeline; baseline and progressive JPEG joined in r6 via the
pure-numpy DCT+Huffman codec (:mod:`operators.jpegcodec`), leaving only
arithmetic/hierarchical/12-bit JPEG honestly gated behind
``NotImplementedError`` with the reason.

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


# ---------------------------------------------------------------------- GIF
def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-flavor LZW (GIF89a spec appendix F): variable-width codes
    LSB-first, CLEAR resets the table, EOI ends; the code width grows
    when the table reaches 2^width (capped at 12 bits)."""
    # Spec bound (GIF89a appendix F): root codes are 2..8 bits and the
    # table caps at 12-bit codes. An unvalidated corrupt value (e.g.
    # 69) would make fresh_table() build a 2^69-entry dict — a hang,
    # not an error.
    if not (1 <= min_code_size <= 11):
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table():
        return {i: [i] for i in range(clear)}

    table = fresh_table()
    width = min_code_size + 1
    next_code = eoi + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = fresh_table()
                width = min_code_size + 1
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code not in table:
                    raise ValueError(f"bad LZW code {code}")
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + [prev[0]]
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out
    return out


def decode_gif(b: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → (h, w, 3) uint8 RGB.

    Full LZW decode in pure Python (spec appendix F), global/local color
    tables, extension-block skipping, 4-pass interlace reorder. Truncated
    pixel streams (degenerate-but-viewable files) are padded with
    palette entry 0, matching how viewers render them.

    Frame-local return: the image descriptor's left/top offsets and the
    logical-screen size are intentionally ignored — a first frame smaller
    than the screen is returned at FRAME dimensions, not composited onto
    a screen-sized canvas. Header-level tools (and ``decode_image``'s
    header path) report the logical-screen dimensions, which may differ;
    pipelines comparing the two should compare against the frame
    descriptor's (w, h)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    flags = b[10]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i]:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            w = int.from_bytes(b[i + 5 : i + 7], "little")
            h = int.from_bytes(b[i + 7 : i + 9], "little")
            iflags = b[i + 9]
            i += 10
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
                i += 3 * n
            interlaced = bool(iflags & 0x40)
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code = b[i]
            i += 1
            data = bytearray()
            while i < len(b) and b[i]:
                size = b[i]
                data += b[i + 1 : i + 1 + size]
                i += 1 + size
            w, h = w or sw, h or sh
            # Bound the decode work by the frame's claimed pixel count:
            # a corrupt descriptor (e.g. 65535×65535) must fail fast as
            # ValueError, not build a multi-gigabyte pad list.
            if w * h > (1 << 26):  # 67M px ≈ 200 MB RGB — far above any
                raise ValueError(  # thumbnail/fixture this codec targets
                    f"GIF frame {w}x{h} exceeds the decode size limit"
                )
            idx = _lzw_decode(min_code, bytes(data), w * h)
            arr = np.zeros(w * h, dtype=np.int64)
            arr[: len(idx)] = np.asarray(idx[: w * h], dtype=np.int64)
            arr = np.clip(arr, 0, len(table) - 1)
            img = table[arr].reshape(h, w, 3)
            if interlaced:
                # GIF 4-pass interlace (spec appendix E): stored row
                # order is passes over rows 0,8,16… / 4,12… / 2,6… /
                # 1,3… — scatter back to natural order.
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                out = np.empty_like(img)
                out[order] = img
                img = out
            return img
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF without an image block")


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) palette indices + (n, 3) palette → single-frame GIF89a.

    Spec-valid trivial LZW: a CLEAR code before every pixel keeps the
    code table empty so every code is a literal root — inefficient but
    exactly decodable by any conformant reader (and by
    :func:`decode_gif`, giving the round-trip property test)."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    table_n = 1 << depth
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:n] = palette
    min_code = max(2, depth)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = bits = 0
    data = bytearray()

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    for px in idx.reshape(-1):
        emit(clear)
        emit(int(px))
    emit(eoi)
    if bits:
        data.append(acc & 0xFF)
    sub = b"".join(
        bytes([min(255, len(data) - j)]) + bytes(data[j : j + 255])
        for j in range(0, len(data), 255)
    ) + b"\x00"
    header = (
        b"GIF89a" + struct.pack("<HH", w, h)
        + bytes([0x80 | (depth - 1), 0, 0]) + pal.tobytes()
    )
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00" \
        + bytes([min_code]) + sub
    return header + img + b"\x3b"


# ------------------------------------------------------------------ dispatch
def decode_pixels(b: bytes) -> tuple[str, np.ndarray]:
    """Raw image bytes → (mime, (h, w, c) uint8 array).

    Real decode for PNG, uncompressed BMP, GIF (pure Python LZW) and —
    since r6 — baseline/extended-sequential AND progressive Huffman
    JPEG (:mod:`operators.jpegcodec`, pure-numpy DCT + Huffman).
    Arithmetic/hierarchical/12-bit JPEG raises NotImplementedError with
    the reason; anything else ValueError.

    Failure contract: EVERY corrupt-payload failure surfaces as
    ValueError — internal decoder exceptions on malformed bytes
    (``zlib.error`` from a corrupt IDAT, ``KeyError``/``IndexError``/
    ``struct.error`` from truncated structures) are normalized here so
    ``on_error="skip"`` callers can dead-letter a mixed corpus without a
    single bad blob killing the job."""
    try:
        if b.startswith(_PNG_SIG):
            return "image/png", decode_png(b)
        if b.startswith(b"BM"):
            return "image/bmp", decode_bmp(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return "image/gif", decode_gif(b)
        if b.startswith(b"\xff\xd8"):
            from open_instrument_spark.operators.jpegcodec import decode_jpeg

            return "image/jpeg", decode_jpeg(b)
    except (zlib.error, KeyError, IndexError, struct.error) as e:
        raise ValueError(f"corrupt image payload: {type(e).__name__}: {e}") from e
    raise ValueError("unrecognized image container")


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, c) → (out_h, out_w, c)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(ys, xs)]
