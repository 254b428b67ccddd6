"""Pure-numpy pixel codec (operators/imagecodec.py): encode/decode
round-trips over random images, all five PNG scanline filters on a
reference-built file, BMP layout edge cases (row padding, top-down),
and the resize kernel."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_instrument_spark.operators.imagecodec import (
    decode_bmp,
    decode_gif,
    decode_png,
    decode_pixels,
    encode_bmp,
    encode_gif,
    encode_png,
    resize_nearest,
)


def _rand_img(rng, h, w, c):
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip(h, w, c, seed):
    img = _rand_img(np.random.default_rng(seed), h, w, c)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 12), w=st.integers(1, 12), seed=st.integers(0, 2**31))
def test_bmp_roundtrip(h, w, seed):
    # w not divisible by 4 exercises the row-padding path
    img = _rand_img(np.random.default_rng(seed), h, w, 3)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose rows use the GIVEN filter types — exercises
    the decoder's Sub/Up/Average/Paeth reconstruction, which our own
    encoder (always filter 0) never emits."""
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else cc

    stride = w * c
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        f = filters[y % len(filters)]
        row = img[y].tobytes()
        out = bytearray()
        for x in range(stride):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (row[x] - a) & 0xFF
            elif f == 2:
                v = (row[x] - b) & 0xFF
            elif f == 3:
                v = (row[x] - ((a + b) >> 1)) & 0xFF
            else:
                v = (row[x] - paeth(a, b, cc)) & 0xFF
            out.append(v)
        raw.append(f)
        raw.extend(out)
        prev = row

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode():
    rng = np.random.default_rng(7)
    for c in (1, 3, 4):
        img = _rand_img(rng, 9, 6, c)
        b = _png_with_filters(img, [0, 1, 2, 3, 4])
        assert np.array_equal(decode_png(b), img)


def test_png_palette_decodes_to_rgb():
    # 2-entry palette, 4x2 checkerboard of indices
    plte = b"\x10\x20\x30\xff\x00\x80"
    idx = np.array([[0, 1, 0, 1], [1, 0, 1, 0]], dtype=np.uint8)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    b = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    out = decode_png(b)
    assert out.shape == (2, 4, 3)
    assert tuple(out[0, 0]) == (0x10, 0x20, 0x30)
    assert tuple(out[0, 1]) == (0xFF, 0x00, 0x80)


def test_bmp_topdown_and_32bit():
    img = _rand_img(np.random.default_rng(3), 2, 3, 3)
    # hand-build a TOP-DOWN (negative height) 24-bit BMP
    w, h = 3, 2
    row_bytes = (w * 3 + 3) // 4 * 4
    pad = row_bytes - w * 3
    body = b"".join(img[y, :, ::-1].tobytes() + bytes(pad) for y in range(h))
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    assert np.array_equal(decode_bmp(header + info + body), img)
    # 32-bit BGRA
    rgba = _rand_img(np.random.default_rng(4), 2, 2, 4)
    body32 = b"".join(
        rgba[y][:, [2, 1, 0, 3]].tobytes() for y in range(1, -1, -1)
    )
    header32 = b"BM" + struct.pack("<IHHI", 54 + len(body32), 0, 0, 54)
    info32 = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 32, 0, len(body32),
                         2835, 2835, 0, 0)
    assert np.array_equal(decode_bmp(header32 + info32 + body32), rgba)


def test_decode_pixels_dispatch_and_entropy_gate():
    from open_instrument_spark.operators.jpegcodec import encode_jpeg

    img = _rand_img(np.random.default_rng(5), 4, 4, 3)
    assert decode_pixels(encode_png(img))[0] == "image/png"
    assert decode_pixels(encode_bmp(img))[0] == "image/bmp"
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    assert decode_pixels(encode_gif(idx, pal))[0] == "image/gif"
    assert decode_pixels(encode_jpeg(img))[0] == "image/jpeg"
    # truncated JPEG (valid SOI, no SOF/SOS) is corrupt, not unsupported
    with pytest.raises(ValueError):
        decode_pixels(b"\xff\xd8\xff\xe0junk")
    # progressive decodes for real since r6; arithmetic stays gated
    assert decode_pixels(encode_jpeg(img, progressive=True))[0] == "image/jpeg"
    arith = b"\xff\xd8" + b"\xff\xc9" + (11).to_bytes(2, "big") + bytes([8] + [0] * 8)
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_pixels(arith)
    with pytest.raises(ValueError):
        decode_pixels(b"not an image")


def test_decode_pixels_normalizes_corrupt_payloads_to_valueerror():
    """The dead-letter contract: EVERY corrupt payload surfaces as
    ValueError from decode_pixels, never a raw zlib.error / KeyError /
    struct.error that would slip past on_error="skip" handlers."""
    img = _rand_img(np.random.default_rng(7), 6, 6, 3)

    # PNG with a corrupt IDAT (zlib.error internally)
    png = bytearray(encode_png(img))
    idat = png.index(b"IDAT")
    png[idat + 8] ^= 0xFF  # flip a byte inside the deflate stream
    with pytest.raises(ValueError, match="corrupt image payload"):
        decode_pixels(bytes(png))

    # GIF with an out-of-range first LZW code (KeyError internally):
    # hand-build a stream whose first code is far past the root table.
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    gif = bytearray(encode_gif(np.zeros((2, 2), dtype=np.uint8), pal))
    # image data: descriptor ends with min_code_size then sub-blocks;
    # overwrite the first data byte with an all-ones code word.
    dsc = gif.index(b"\x2c")
    sub_lo = dsc + 10 + 1 + 1  # descriptor + min_code + first sub-len
    gif[sub_lo] = 0xFF
    with pytest.raises(ValueError):
        decode_pixels(bytes(gif))


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    n_colors=st.integers(2, 17),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_trivial_lzw(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def _lzw_encode_greedy(min_code: int, pixels: list[int]) -> bytes:
    """A REAL greedy LZW encoder (table growth, width bumps, emits the
    patterns that trigger the decoder's KwKwK branch) — test-only, to
    exercise decode paths the trivial clear-per-pixel encoder never
    produces."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {(i,): i for i in range(clear)}
    next_code, width = eoi + 1, min_code + 1
    acc = bits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    run: tuple = ()
    for p in pixels:
        cand = run + (p,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # GIF early-change: width grows when next_code EXCEEDS the
            # current width's range on the encoder side
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        run = (p,)
    if run:
        emit(table[run])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    n_colors=st.integers(2, 4),
    seed=st.integers(0, 2**31),
)
def test_gif_greedy_lzw_decodes(h, w, n_colors, seed):
    """Low-cardinality random frames through a REAL greedy LZW encoder:
    long runs force table growth, code-width increases and KwKwK."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    min_code = 2
    data = _lzw_encode_greedy(min_code, list(idx.reshape(-1)))
    sub = b"".join(
        bytes([min(255, len(data) - j)]) + data[j : j + 255]
        for j in range(0, len(data), 255)
    ) + b"\x00"
    b = (
        b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x81, 0, 0])
        + pal.tobytes()
        + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        + bytes([min_code]) + sub + b"\x3b"
    )
    assert np.array_equal(decode_gif(b), pal[idx])


def test_resize_nearest_shape_and_identity():
    img = _rand_img(np.random.default_rng(6), 8, 6, 3)
    assert resize_nearest(img, 3, 4).shape == (4, 3, 3)
    assert np.array_equal(resize_nearest(img, 6, 8), img)  # same-size = identity


def test_checked_in_fixtures_decode():
    """The spec-built fixture files decode to their known pixel
    patterns (the PNG's generator formula; the BMP's all-zero rows)."""
    import os

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    png_img = decode_png(open(os.path.join(fix, "tiny_7x5.png"), "rb").read())
    assert png_img.shape == (5, 7, 3)
    for y in range(5):
        for x in range(7):
            assert tuple(png_img[y, x]) == (x * 37 % 256, y * 53 % 256, 128)
    bmp_img = decode_bmp(open(os.path.join(fix, "tiny_6x3.bmp"), "rb").read())
    assert bmp_img.shape == (3, 6, 3) and not bmp_img.any()


def test_checked_in_gif_fixture_decodes_with_padding():
    """tiny_9x4.gif carries a degenerate (truncated) LZW stream — real
    viewers render it; the decoder pads the missing pixels with palette
    entry 0 instead of failing."""
    import os

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    img = decode_gif(open(os.path.join(fix, "tiny_9x4.gif"), "rb").read())
    assert img.shape == (4, 9, 3)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) decode — round-trips against the stdlib wave writer
# ---------------------------------------------------------------------------

from open_instrument_spark.operators.audiocodec import decode_wav  # noqa: E402


def _stdlib_wav(rate, channels, sampwidth, frames_bytes):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(sampwidth)
        f.setframerate(rate)
        f.writeframes(frames_bytes)
    return buf.getvalue()


@settings(max_examples=25, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 2),
    n=st.integers(1, 200),
    seed=st.integers(0, 2**31),
)
def test_wav_16bit_roundtrip_vs_stdlib(rate, channels, n, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(n, channels)).astype("<i2")
    b = _stdlib_wav(rate, channels, 2, pcm.tobytes())
    got_rate, x = decode_wav(b)
    assert got_rate == rate and x.shape == (n, channels)
    assert np.array_equal((x * 32768.0).astype("<i2"), pcm)


def test_wav_8_24_and_float_formats():
    rng = np.random.default_rng(9)
    # unsigned 8-bit via stdlib
    u8 = rng.integers(0, 256, size=(50, 1)).astype(np.uint8)
    rate, x = decode_wav(_stdlib_wav(8000, 1, 1, u8.tobytes()))
    assert np.allclose(x[:, 0], (u8[:, 0].astype(float) - 128) / 128)
    # 24-bit via stdlib (sampwidth 3)
    v = rng.integers(-(1 << 23), 1 << 23, size=40)
    raw = b"".join(int(s).to_bytes(3, "little", signed=True) for s in v)
    rate, x = decode_wav(_stdlib_wav(16000, 1, 3, raw))
    assert np.allclose(x[:, 0] * (1 << 23), v)
    # IEEE float32: hand-build (stdlib wave writes only PCM)
    import struct as _s

    f = rng.random(30).astype("<f4") * 2 - 1
    body = f.tobytes()
    fmt = _s.pack("<HHIIHH", 3, 1, 22050, 22050 * 4, 4, 32)
    wav = (
        b"RIFF" + _s.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", len(body)) + body
    )
    rate, x = decode_wav(wav)
    assert rate == 22050 and np.allclose(x[:, 0], f.astype(np.float64))


def test_wav_rejects_compressed_and_junk():
    import struct as _s

    fmt = _s.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    wav = (
        b"RIFF" + _s.pack("<I", 36) + b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="codec library"):
        decode_wav(wav)
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")


# ---------------------------------------------------------------------------
# video container header parse (AVI RIFF / MP4 box tree), spec-built bytes
# ---------------------------------------------------------------------------

from open_instrument_spark.operators.audiocodec import parse_video_header  # noqa: E402


def _avi(w, h, frames, usec_per_frame):
    avih = struct.pack("<IIIIIIIIIIIIII",
                       usec_per_frame, 0, 0, 0x10, frames, 0, 1, 0, w, h,
                       0, 0, 0, 0)
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + lst + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mp4(w, h, timescale, duration):
    def box(tag, payload):
        return struct.pack(">I", len(payload) + 8) + tag + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = box(b"mvhd", bytes(12) + struct.pack(">II", timescale, duration)
               + bytes(80))
    tkhd = box(b"tkhd", bytes(74) + struct.pack(">II", w << 16, h << 16))
    trak = box(b"trak", tkhd)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov


def test_parse_avi_header():
    b = _avi(640, 480, 300, 33333)
    assert parse_video_header(b) == ("video/x-msvideo", 640, 480, 300, 9.9999)


def test_parse_mp4_header():
    b = _mp4(1280, 720, 1000, 12500)
    assert parse_video_header(b) == ("video/mp4", 1280, 720, 0, 12.5)


def test_parse_video_rejects_non_video():
    assert parse_video_header(b"not a container") is None
    img = _rand_img(np.random.default_rng(1), 2, 2, 3)
    assert parse_video_header(encode_png(img)) is None


def test_gif_interlaced_decodes():
    """Interlaced frames: rows are stored in the 4-pass order; patching
    the encoder's flag byte and permuting rows must decode back to the
    natural-order image."""
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    h, w = 11, 5
    idx = rng.integers(0, 4, size=(h, w), dtype=np.uint8)
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    b = bytearray(encode_gif(idx[order], pal))  # rows in storage order
    depth = 2  # 4-entry palette
    flags_at = 13 + 3 * (1 << depth) + 9  # image-descriptor flags byte
    assert b[flags_at] == 0
    b[flags_at] = 0x40
    assert np.array_equal(decode_gif(bytes(b)), pal[idx])


# ------------------------------------------------------------------- JPEG
def _max_err(a, b):
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31),
)
def test_jpeg_gray_roundtrip_near_lossless(h, w, seed):
    """quality=100 quantizes with all-ones tables: the only loss is
    DCT/rounding noise, bounded to a few LSB."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = _rand_img(np.random.default_rng(seed), h, w, 1)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (h, w, 1)
    assert _max_err(out, img) <= 2


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 17),
    w=st.integers(1, 17),
    seed=st.integers(0, 2**31),
)
def test_jpeg_rgb_roundtrip_near_lossless(h, w, seed):
    """RGB adds two color-space conversions (float, rounded once at the
    end) on top of the DCT noise — still a few LSB at quality=100."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = _rand_img(np.random.default_rng(seed), h, w, 3)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (h, w, 3)
    assert _max_err(out, img) <= 4


def test_jpeg_420_subsampling_decodes():
    """4:2:0 exercises the multi-block MCU layout and the chroma
    upsampling path; on a chroma-constant image subsampling is lossless
    up to the usual rounding."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    # luma varies per pixel, chroma constant (gray image in RGB form)
    y = rng.integers(0, 256, size=(19, 21), dtype=np.uint8)
    img = np.stack([y, y, y], axis=2)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsample=True))
    assert out.shape == (19, 21, 3)
    assert _max_err(out, img) <= 4


def test_jpeg_low_quality_still_decodes_to_right_shape():
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = _rand_img(np.random.default_rng(3), 24, 16, 3)
    out = decode_jpeg(encode_jpeg(img, quality=25))
    assert out.shape == (24, 16, 3)
    # lossy but sane: mean error well under a uniform-noise baseline
    err = np.abs(out.astype(np.int64) - img.astype(np.int64)).mean()
    assert err < 64


def test_jpeg_header_and_pixel_decoders_agree_on_dimensions():
    from open_instrument_spark.operators.jpegcodec import encode_jpeg
    from open_instrument_spark.operators.multimodal import parse_image_header

    img = _rand_img(np.random.default_rng(9), 13, 29, 3)
    blob = encode_jpeg(img, quality=90)
    mime, w, h, _c = parse_image_header(blob)
    assert (mime, w, h) == ("image/jpeg", 29, 13)
    mime2, arr = decode_pixels(blob)
    assert mime2 == "image/jpeg" and arr.shape[:2] == (13, 29)


# ------------------------------------------------------------- progressive
def test_jpeg_progressive_decodes_identically_to_baseline():
    """The 9-scan progressive script carries the same coefficients as
    the baseline scan, so the decoded pixels must be bit-identical —
    across grayscale, 4:4:4, 4:2:0, odd dimensions, and a low quality
    that produces long cross-block EOB runs."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(20)
    cases = [
        (16, 16, 1, False, 100),
        (13, 17, 3, False, 100),
        (13, 17, 3, True, 90),   # 4:2:0: non-interleaved chroma block grids
        (24, 9, 1, False, 25),   # heavy quantization -> EOB-run paths
        (8, 8, 3, False, 50),
    ]
    for h, w, c, sub, q in cases:
        img = _rand_img(rng, h, w, c)
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        prog = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub,
                                       progressive=True))
        assert np.array_equal(base, prog), (h, w, c, sub, q)


def test_jpeg_progressive_flat_image_exercises_pure_eob_stream():
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = np.full((32, 32, 3), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75, progressive=True))
    base = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.array_equal(out, base)
    assert np.abs(out.astype(int) - 77).max() <= 2


def test_jpeg_progressive_marker_is_sof2():
    from open_instrument_spark.operators.jpegcodec import encode_jpeg

    blob = encode_jpeg(_rand_img(np.random.default_rng(21), 8, 8, 3),
                       progressive=True)
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
    # scan script: DC-first + 2 bands x 3 comps + DC-refine + 2 x 3 refine
    assert blob.count(b"\xff\xda") == 1 + 3 * 2 + 1 + 3 * 2


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3]),
    sub=st.booleans(),
    q=st.sampled_from([10, 35, 60, 85, 100]),
    seed=st.integers(0, 2**31),
)
def test_jpeg_progressive_equals_baseline_randomized(h, w, c, sub, q, seed):
    """Hypothesis twin of the pinned cases: for ANY image/layout/quality
    the progressive scan script must decode bit-identically to the
    baseline scan of the same coefficients."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = _rand_img(np.random.default_rng(seed), h, w, c)
    sub = sub and c == 3
    base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
    prog = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub, progressive=True))
    assert np.array_equal(base, prog)


def test_jpeg_corrupt_scan_header_raises_valueerror():
    """An AC scan header with Ss/Se outside 0..63 must surface as the
    contracted ValueError, not an uncaught numpy IndexError."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    blob = bytearray(encode_jpeg(_rand_img(np.random.default_rng(40), 8, 8, 3),
                                 progressive=True))
    # second SOS is the first AC band scan: header = [1, cid, tbls, Ss, Se, AhAl]
    first = blob.index(b"\xff\xda")
    second = blob.index(b"\xff\xda", first + 2)
    seg_len = int.from_bytes(blob[second + 2 : second + 4], "big")
    # last three payload bytes are Ss, Se, AhAl
    blob[second + 2 + seg_len - 3] = 60
    blob[second + 2 + seg_len - 2] = 200
    with pytest.raises(ValueError, match="scan header out of range"):
        decode_jpeg(bytes(blob))


def test_jpeg_decoder_corruption_fuzz_honors_error_contract():
    """Random single-byte corruptions of valid baseline AND progressive
    streams must either decode (harmless bit), raise ValueError, or
    raise NotImplementedError (e.g. the flip lands in the SOF marker) —
    never an uncontracted exception type (IndexError/KeyError/...)."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(55)
    img = _rand_img(rng, 12, 10, 3)
    blobs = [
        encode_jpeg(img, quality=80),
        encode_jpeg(img, quality=80, progressive=True),
    ]
    for blob in blobs:
        for _ in range(120):
            b = bytearray(blob)
            pos = int(rng.integers(2, len(b)))  # keep SOI intact
            b[pos] ^= int(rng.integers(1, 256))
            try:
                out = decode_jpeg(bytes(b))
                assert out.dtype == np.uint8 and out.ndim == 3
            except (ValueError, NotImplementedError):
                pass  # both are the documented failure surface


def test_image_codecs_corruption_fuzz_contract():
    """PNG/BMP/GIF twins of the JPEG corruption fuzz: random multi-byte
    corruptions must decode or raise ValueError/NotImplementedError."""
    rng = np.random.default_rng(9)
    img = _rand_img(rng, 9, 7, 3)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(6, 5)).astype(np.uint8)
    for blob in (encode_png(img), encode_bmp(img), encode_gif(idx, pal)):
        for _ in range(200):
            b = bytearray(blob)
            for _ in range(int(rng.integers(1, 3))):
                pos = int(rng.integers(0, len(b)))
                b[pos] ^= int(rng.integers(1, 256))
            try:
                decode_pixels(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_gif_bad_lzw_min_code_size_fails_fast():
    """Regression: a corrupt LZW minimum-code-size byte (e.g. 69) once
    made fresh_table() build a 2^69-entry dict — a hang, not an error.
    Also: a corrupt frame descriptor claiming huge dimensions must hit
    the decode size limit instead of building a giant pad array."""
    import time

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    blob = bytearray(encode_gif(np.zeros((2, 2), dtype=np.uint8), pal))
    dsc = blob.index(b"\x2c")
    mcs = dsc + 10  # descriptor is 10 bytes; min_code_size follows
    bad = bytes(blob[:mcs]) + bytes([69]) + bytes(blob[mcs + 1 :])
    t0 = time.time()
    with pytest.raises(ValueError, match="minimum code size"):
        decode_gif(bad)
    assert time.time() - t0 < 1.0
    big = bytearray(blob)
    big[dsc + 5 : dsc + 9] = (65535).to_bytes(2, "little") * 2  # w=h=65535
    with pytest.raises(ValueError, match="decode size limit"):
        decode_gif(bytes(big))


# -------------------------------------------- independent-decoder parity
def _imageio_decode_rgb(spark, data: bytes) -> np.ndarray:
    """Decode JPEG bytes with the JVM's javax.imageio codec (an
    independent implementation reachable through the Spark gateway —
    no Python imaging libs exist in this environment)."""
    jvm = spark.sparkContext._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    assert img is not None, "ImageIO could not parse the JPEG"
    h, w = img.getHeight(), img.getWidth()
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            rgb = img.getRGB(x, y)
            out[y, x] = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
    return out


def _smooth_img(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.dstack([r, g, b])


def test_jpeg_progressive_parses_in_independent_decoder(spark):
    """ADVICE r6: the progressive path was only validated
    self-consistently (a symmetric encoder+decoder bug would pass).
    Here our SOF2 output must be parsed by javax.imageio and decode to
    the same pixels both decoders see (small tolerance: the two
    codecs' IDCT/color-convert rounding differs by a few LSBs)."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    for h, w, sub, q in [(16, 16, False, 90), (13, 17, False, 85),
                         (24, 18, True, 90)]:
        img = _smooth_img(h, w)
        blob = encode_jpeg(img, quality=q, subsample=sub, progressive=True)
        assert b"\xff\xc2" in blob
        theirs = _imageio_decode_rgb(spark, blob).astype(int)
        ours = decode_jpeg(blob).astype(int)
        assert theirs.shape == ours.shape
        diff = np.abs(theirs - ours)
        # 4:2:0: T.81 leaves the chroma upsampling filter to the
        # decoder (ours replicates, ImageIO interpolates), so edge
        # pixels legitimately differ more than IDCT rounding alone
        max_tol, mean_tol = (16, 4.0) if sub else (6, 2.0)
        assert diff.max() <= max_tol and diff.mean() < mean_tol, (
            h, w, sub, q, diff.max(), diff.mean())


def test_jpeg_our_decoder_reads_imageio_progressive_output(spark):
    """Round-trip the other way: a progressive JPEG ENCODED by
    javax.imageio (ImageWriteParam MODE_DEFAULT scan script — not our
    9-scan script) must decode in our decoder to the same pixels
    ImageIO itself reads back."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg

    jvm = spark.sparkContext._jvm
    src = _smooth_img(16, 16)
    bi = jvm.java.awt.image.BufferedImage(16, 16, 1)  # TYPE_INT_RGB
    for y in range(16):
        for x in range(16):
            r, g, b = (int(v) for v in src[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    blob = bytes(baos.toByteArray())
    writer.dispose()
    assert b"\xff\xc2" in blob, "ImageIO did not emit a progressive (SOF2) file"

    theirs = _imageio_decode_rgb(spark, blob).astype(int)
    ours = decode_jpeg(blob).astype(int)
    assert ours.shape == theirs.shape
    diff = np.abs(theirs - ours)
    # ImageIO writes 4:2:0 by default — see the upsample-filter note in
    # the sibling test for the wider per-pixel bound
    assert diff.max() <= 16 and diff.mean() < 4.0, (diff.max(), diff.mean())


def test_extract_mjpeg_frames_corrupt_inputs():
    """Corruption contract for the container walker: truncated RIFF,
    lying chunk sizes, and frame-less AVIs must raise ValueError fast
    (dead-letter), never hang or return garbage frames."""
    import time

    from open_instrument_spark.operators.audiocodec import extract_mjpeg_frames
    from open_instrument_spark.sources.media_synth import synth_mjpeg_avi_bytes

    good = synth_mjpeg_avi_bytes(3)

    with pytest.raises(ValueError, match="not an AVI"):
        extract_mjpeg_frames(b"RIFXjunk")
    with pytest.raises(ValueError, match="not an AVI"):
        extract_mjpeg_frames(good[:8])  # too short to carry 'AVI '

    # header-only AVI (no movi) → no video chunks
    hdr_only = bytearray(good)
    movi_at = bytes(hdr_only).index(b"movi")
    trunc = bytes(hdr_only[: movi_at - 8])
    with pytest.raises(ValueError, match="without video chunks"):
        extract_mjpeg_frames(trunc)

    # a chunk size lying past EOF must terminate quickly (slice-safe),
    # not loop or allocate
    lying = bytearray(good)
    dc = bytes(lying).index(b"00dc")
    lying[dc + 4 : dc + 8] = (2**31 - 1).to_bytes(4, "little")
    t0 = time.time()
    frames = extract_mjpeg_frames(bytes(lying))
    assert time.time() - t0 < 1.0
    # the lying chunk swallows the rest; whatever frames it returns are
    # byte-slices, and decoding them surfaces the per-frame error path
    from open_instrument_spark.operators.jpegcodec import decode_jpeg
    for f in frames:
        try:
            decode_jpeg(f)
        except (ValueError, NotImplementedError):
            pass

    # flipping a byte inside a frame's entropy data → decode error, not
    # a hang — the video_frames skip contract path
    flip = bytearray(good)
    flip[dc + 60] ^= 0xFF
    ok = 0
    for f in extract_mjpeg_frames(bytes(flip)):
        try:
            decode_jpeg(f)
            ok += 1
        except (ValueError, NotImplementedError):
            pass
    assert ok >= 0  # parse path exercised; no hang/crash


# ---------------------------------------------------------------------------
# 12-bit JPEG (r14): SOF1/SOF2 precision-12 decode + the fixture encoder
# ---------------------------------------------------------------------------

def _rand12(rng, h, w, c):
    return rng.integers(0, 4096, (h, w, c)).astype(np.uint16).squeeze()


@settings(max_examples=10, deadline=None)
@given(
    h=st.integers(1, 18),
    w=st.integers(1, 18),
    seed=st.integers(0, 2**31),
)
def test_jpeg12_gray_roundtrip_near_lossless(h, w, seed):
    """12-bit grayscale at quality=100: same few-LSB bound as 8-bit —
    but an LSB is now 1/4096, so the absolute fidelity is 16x finer."""
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = np.random.default_rng(seed).integers(
        0, 4096, (h, w)).astype(np.uint16)
    out = decode_jpeg(encode_jpeg(img, quality=100, precision=12))
    assert out.dtype == np.uint16 and out.shape == (h, w, 1)
    assert int(np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()) <= 2


def test_jpeg12_rgb_roundtrip_and_markers():
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 4096, (16, 13, 3)).astype(np.uint16)
    b = encode_jpeg(img, quality=100, precision=12)
    # sequential 12-bit must be SOF1 (extended), never SOF0 baseline
    assert b"\xff\xc1" in b and b"\xff\xc0" not in b
    out = decode_jpeg(b)
    assert out.dtype == np.uint16 and out.shape == (16, 13, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4


def test_jpeg12_progressive_equals_sequential():
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 4096, (24, 17)).astype(np.uint16)
    seq = decode_jpeg(encode_jpeg(img, quality=100, precision=12))
    b = encode_jpeg(img, quality=100, precision=12, progressive=True)
    assert b"\xff\xc2" in b
    prog = decode_jpeg(b)
    assert (prog == seq).all()


def test_jpeg12_validation_and_malformed_baseline():
    from open_instrument_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg(rng.integers(0, 255, (8, 8)).astype(np.uint8),
                    precision=12)
    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg(np.full((8, 8), 5000, dtype=np.uint16), precision=12)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg(rng.integers(0, 255, (8, 8)).astype(np.uint8),
                    precision=10)
    # a stream claiming SOF0 + 12-bit is malformed, not unsupported
    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint16), precision=12)
    bad = good.replace(b"\xff\xc1", b"\xff\xc0", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bad)
    # depths other than 8/12 keep the honest gate
    sof_at = good.index(b"\xff\xc1")
    mang = bytearray(good)
    mang[sof_at + 4] = 16
    with pytest.raises(NotImplementedError, match="depth 16"):
        decode_jpeg(bytes(mang))


def test_jpeg12_decodes_through_decode_image_dispatch():
    from open_instrument_spark.operators.imagecodec import decode_pixels
    from open_instrument_spark.operators.jpegcodec import encode_jpeg

    img = np.random.default_rng(9).integers(
        0, 4096, (10, 11)).astype(np.uint16)
    mime, arr = decode_pixels(encode_jpeg(img, quality=100, precision=12))
    assert mime == "image/jpeg" and arr.dtype == np.uint16
    assert arr.shape == (10, 11, 1)
