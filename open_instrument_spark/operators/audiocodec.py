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
