"""Generate the tiny checked-in image fixtures (real container files,
built from the format specs with stdlib only — no codec libraries).

Run from the repo root: ``python tests/fixtures/make_images.py``.
The PNG/GIF/BMP outputs are fully valid files any viewer opens; the
JPEG is a structurally valid marker stream (SOI → APP0 → SOF0 → SOS →
EOI with correct segment lengths) whose entropy data is a placeholder —
sufficient and honest for header-decode tests.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

HERE = Path(__file__).parent


def png(w: int, h: int) -> bytes:
    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00"
        + b"".join(bytes((x * 37 % 256, y * 53 % 256, 128)) for x in range(w))
        for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def gif(w: int, h: int) -> bytes:
    header = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x80, 0, 0])
    palette = bytes([0, 0, 0, 255, 255, 255])  # 2-color global table
    # minimal LZW image data: clear, one pixel run, end
    image = (
        b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        + b"\x02\x02\x44\x01\x00"
    )
    return header + palette + image + b"\x3b"


def bmp(w: int, h: int) -> bytes:
    row = (w * 3 + 3) // 4 * 4
    pixels = bytes(row) * h
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835,
                       2835, 0, 0)
    return header + info + pixels


def jpeg(w: int, h: int) -> bytes:
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    sos = b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xC0, sof0)
        + seg(0xDA, sos)
        + b"\x00"  # placeholder entropy byte
        + b"\xff\xd9"
    )


if __name__ == "__main__":
    (HERE / "tiny_7x5.png").write_bytes(png(7, 5))
    (HERE / "tiny_9x4.gif").write_bytes(gif(9, 4))
    (HERE / "tiny_6x3.bmp").write_bytes(bmp(6, 3))
    (HERE / "tiny_11x8.jpg").write_bytes(jpeg(11, 8))
    for p in sorted(HERE.glob("tiny_*")):
        print(p.name, p.stat().st_size, "bytes")
