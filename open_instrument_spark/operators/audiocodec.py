"""Pure-numpy WAV (RIFF PCM) decode for the multimodal audio leg (§2.9).

Like BMP/PNG/GIF on the image side, PCM WAV needs no codec library:
RIFF chunks + a format header + raw interleaved samples. Supports the
formats that cover real PCM corpora — unsigned 8-bit, signed 16/24/32
integer, and 32/64-bit IEEE float — decoded to float64 in [-1, 1).
Compressed codecs (MP3/AAC/…, or non-PCM WAV like ADPCM/µ-law) raise
``NotImplementedError`` with the reason.

Round-trip tested against the stdlib ``wave`` writer (which produces
canonical PCM files) in tests/test_multimodal_pixels.py.
"""

from __future__ import annotations

import numpy as np


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes → (sample_rate, (n_frames, n_channels) float64
    in [-1, 1)).

    Walks the chunk list (fmt before data, extra chunks skipped), honors
    word-aligned chunk padding. format 1 = integer PCM (8/16/24/32 bit),
    3 = IEEE float (32/64), 0xFFFE (extensible) resolved via its
    SubFormat GUID; anything else raises NotImplementedError."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(b)
    fmt = None
    while i + 8 <= n:
        tag = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        body = b[i + 8 : i + 8 + size]
        if tag == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                audio_fmt = int.from_bytes(body[24:26], "little")
            fmt = (audio_fmt, channels, rate, bits)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            audio_fmt, channels, rate, bits = fmt
            if channels < 1:
                raise ValueError("WAV with zero channels")
            if audio_fmt == 1:  # integer PCM
                if bits == 8:  # unsigned
                    x = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                    x = (x - 128.0) / 128.0
                elif bits == 16:
                    x = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32768.0
                elif bits == 24:
                    raw = np.frombuffer(body[: len(body) // 3 * 3], dtype=np.uint8)
                    raw = raw.reshape(-1, 3).astype(np.int64)
                    v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
                    v = np.where(v >= 1 << 23, v - (1 << 24), v)
                    x = v.astype(np.float64) / float(1 << 23)
                elif bits == 32:
                    x = np.frombuffer(body, dtype="<i4").astype(np.float64) / float(1 << 31)
                else:
                    raise NotImplementedError(f"PCM bit depth {bits}")
            elif audio_fmt == 3:  # IEEE float
                if bits == 32:
                    x = np.frombuffer(body, dtype="<f4").astype(np.float64)
                elif bits == 64:
                    x = np.frombuffer(body, dtype="<f8").astype(np.float64)
                else:
                    raise NotImplementedError(f"float WAV bit depth {bits}")
            else:
                raise NotImplementedError(
                    f"WAV format {audio_fmt} (only PCM/IEEE-float; "
                    "ADPCM/mu-law/compressed need a codec library)"
                )
            frames = len(x) // channels
            return rate, x[: frames * channels].reshape(frames, channels)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV without a data chunk")


# ------------------------------------------------------------------- video
# Header-level (codec-free) video container parsing: AVI is RIFF like
# WAV (avih carries µs-per-frame, frame count, dimensions); MP4 is a
# box tree (mvhd carries timescale+duration, tkhd the track size).
# Frame DATA stays codec-gated; the metadata a manifest/quality pass
# needs is all in the headers.

def parse_video_header(b: bytes):
    """Raw container bytes → (mime, width, height, n_frames, duration_s)
    for AVI and MP4/ISO-BMFF, or None if not a recognized container.
    Pure byte-walking, no codec."""
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        # hdrl LIST → avih chunk: us_per_frame, ..., total_frames,
        # ..., width, height (MainAVIHeader layout)
        i, n = 12, len(b)
        while i + 8 <= n:
            tag = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            if tag == b"LIST" and b[i + 8 : i + 12] == b"hdrl":
                j = i + 12
                while j + 8 <= i + 8 + size:
                    ctag = b[j : j + 4]
                    csize = int.from_bytes(b[j + 4 : j + 8], "little")
                    if ctag == b"avih":
                        body = b[j + 8 : j + 8 + csize]
                        usec = int.from_bytes(body[0:4], "little")
                        frames = int.from_bytes(body[16:20], "little")
                        w = int.from_bytes(body[32:36], "little")
                        h = int.from_bytes(body[36:40], "little")
                        dur = round(frames * usec / 1e6, 6) if usec else 0.0
                        return ("video/x-msvideo", w, h, frames, dur)
                    j += 8 + csize + (csize & 1)
            i += 8 + size + (size & 1)
        return None
    # MP4 / ISO-BMFF: top-level box walk; first box should be ftyp
    if len(b) >= 12 and b[4:8] == b"ftyp":
        def walk(lo: int, hi: int, path: tuple):
            """Yield (path, lo, hi) for boxes, recursing into containers."""
            i = lo
            while i + 8 <= hi:
                size = int.from_bytes(b[i : i + 4], "big")
                tag = b[i + 4 : i + 8]
                if size == 1:  # 64-bit largesize
                    size = int.from_bytes(b[i + 8 : i + 16], "big")
                    body_lo = i + 16
                elif size == 0:  # to end of file
                    size = hi - i
                    body_lo = i + 8
                else:
                    body_lo = i + 8
                if size < 8 or i + size > hi:
                    return
                yield path + (tag,), body_lo, i + size
                if tag in (b"moov", b"trak", b"mdia"):
                    yield from walk(body_lo, i + size, path + (tag,))
                i += size

        dur_s = 0.0
        w = h = 0
        for path, lo, hi in walk(0, len(b), ()):
            box = path[-1]
            if box == b"mvhd" and path[:-1] == (b"moov",):
                ver = b[lo]
                if ver == 1:
                    ts = int.from_bytes(b[lo + 20 : lo + 24], "big")
                    dur = int.from_bytes(b[lo + 24 : lo + 32], "big")
                else:
                    ts = int.from_bytes(b[lo + 12 : lo + 16], "big")
                    dur = int.from_bytes(b[lo + 16 : lo + 20], "big")
                dur_s = round(dur / ts, 6) if ts else 0.0
            elif box == b"tkhd":
                # width/height are 16.16 fixed point at the end of tkhd
                tw = int.from_bytes(b[hi - 8 : hi - 4], "big") >> 16
                th = int.from_bytes(b[hi - 4 : hi], "big") >> 16
                if tw and th:
                    w, h = tw, th
        if dur_s or w:
            return ("video/mp4", w, h, 0, dur_s)
        return None
    return None


def extract_mjpeg_frames(b: bytes) -> list[bytes]:
    """MJPEG-in-AVI → the per-frame JPEG payloads, in stream order.

    Walks the RIFF chunk tree to the ``movi`` LIST and collects video
    chunks (``##dc`` compressed / ``##db`` uncompressed-tag variants —
    both carry the codec bitstream for MJPEG). Pure byte-walking; the
    frames themselves decode with the in-repo JPEG codec. Raises
    ValueError for non-AVI bytes or an AVI without video chunks (an
    MP4's frame data sits behind codec tables we gate on — see
    parse_video_header)."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    frames: list[bytes] = []
    i, n = 12, len(b)
    while i + 8 <= n:
        tag = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if tag == b"LIST" and b[i + 8 : i + 12] == b"movi":
            j = i + 12
            end = min(i + 8 + size, n)
            while j + 8 <= end:
                ctag = b[j : j + 4]
                csize = int.from_bytes(b[j + 4 : j + 8], "little")
                if ctag[2:4] in (b"dc", b"db") and csize:
                    frames.append(b[j + 8 : j + 8 + csize])
                j += 8 + csize + (csize & 1)
        i += 8 + size + (size & 1)
    if not frames:
        raise ValueError("AVI without video chunks (no ##dc/##db in movi)")
    return frames
