"""Deterministic spec-built media fixtures keyed on doc_id (§2.9).

The container has no media libraries and the synthetic corpus has no
real audio/video blobs, so the multimodal DECODE operators
(audio_stats / video_stats / resize) need payloads whose bytes are
valid containers AND whose decoded content is pure arithmetic on
doc_id — that makes the decoders' outputs DuckDB-replayable (the
oracle recomputes the same arithmetic in SQL), promoting the codec
paths to the full rows+schema+hash correctness gate.

Every generator here is the write-side twin of a real reader:

- :func:`synth_wav_bytes` — 8-bit mono PCM RIFF/WAVE read back by
  :func:`operators.audiocodec.decode_wav`. Samples are EVEN bytes
  (``2 * ((doc_id*31 + k*17) % 128)``) so every decoded amplitude is
  ``even/128 = k'/64`` — an exact 6-decimal value, immune to
  round-half tie divergence between Python and SQL ``round``.
- :func:`synth_video_bytes` — minimal RIFF-AVI (even doc_id) or
  ISO-BMFF MP4 (odd doc_id) read back by
  :func:`operators.audiocodec.parse_video_header`.
- :func:`synth_png_bytes` — real PNG (via ``encode_png``) whose pixel
  (y, x, c) is ``(doc_id*7 + y*13 + x*3 + c) % 256``, so any
  nearest-neighbor resample of it is index arithmetic an oracle can
  replay.

Reference scope note: the reference has no media pipeline — these
support the training-data extensions, not a ported operator.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# ---- fixture arithmetic (mirrored literally in the registry oracles) ----
WAV_RATE = 8000
WAV_FRAMES_BASE, WAV_FRAMES_MOD = 16, 32          # n = 16 + doc_id % 32

AVI_USEC_PER_FRAME = 40_000                        # 25 fps
AVI_FRAMES_BASE, AVI_FRAMES_MOD = 100, 50
MP4_TIMESCALE = 1000
MP4_TICKS_BASE, MP4_TICKS_MOD = 1000, 977

PNG_W_BASE, PNG_W_MOD = 8, 9                       # w = 8 + doc_id % 9
PNG_H_BASE, PNG_H_MOD = 6, 7                       # h = 6 + doc_id % 7


def synth_wav_bytes(doc_id: int) -> bytes:
    """doc_id → canonical 8-bit mono PCM WAV (rate 8000), sample k =
    ``2 * ((doc_id*31 + k*17) % 128)`` over ``16 + doc_id % 32`` frames."""
    n = WAV_FRAMES_BASE + doc_id % WAV_FRAMES_MOD
    samples = bytes(2 * ((doc_id * 31 + k * 17) % 128) for k in range(n))
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
        + (b"\x00" if len(samples) & 1 else b"")  # RIFF word alignment
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_video_bytes(doc_id: int) -> bytes:
    """doc_id → minimal AVI (even ids) or MP4 (odd ids) container whose
    header fields are doc_id arithmetic (see module doc)."""
    if doc_id % 2 == 0:
        frames = AVI_FRAMES_BASE + doc_id % AVI_FRAMES_MOD
        w = 320 + (doc_id % 8) * 16
        h = 240 + (doc_id % 6) * 16
        avih = struct.pack(
            "<IIIIIIIIIIIIII",
            AVI_USEC_PER_FRAME, 0, 0, 0, frames, 0, 1, 0, w, h, 0, 0, 0, 0,
        )
        hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
        body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        return b"RIFF" + struct.pack("<I", len(body)) + body
    ticks = MP4_TICKS_BASE + doc_id % MP4_TICKS_MOD
    w = 320 + doc_id % 17
    h = 180 + doc_id % 29

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    # mvhd v0: ver+flags, ctime, mtime, timescale, duration, then the
    # fixed remainder (rate, volume, reserved, matrix, next_track_id).
    mvhd = box(
        b"mvhd",
        struct.pack(">BBBBIIII", 0, 0, 0, 0, 0, 0, MP4_TIMESCALE, ticks)
        + bytes(80),
    )
    # tkhd v0: 84-byte body; width/height are 16.16 fixed at the tail.
    tkhd = box(
        b"tkhd", bytes(76) + struct.pack(">II", w << 16, h << 16)
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def synth_png_bytes(doc_id: int) -> bytes:
    """doc_id → real RGB PNG, ``w = 8 + doc_id % 9``/``h = 6 + doc_id % 7``,
    pixel (y, x, c) = ``(doc_id*7 + y*13 + x*3 + c) % 256``."""
    from open_instrument_spark.operators.imagecodec import encode_png

    w = PNG_W_BASE + doc_id % PNG_W_MOD
    h = PNG_H_BASE + doc_id % PNG_H_MOD
    y = np.arange(h).reshape(h, 1, 1)
    x = np.arange(w).reshape(1, w, 1)
    c = np.arange(3).reshape(1, 1, 3)
    arr = ((doc_id * 7 + y * 13 + x * 3 + c) % 256).astype(np.uint8)
    return encode_png(arr)




MJPEG_FRAMES_BASE, MJPEG_FRAMES_MOD = 2, 3
MJPEG_W, MJPEG_H = 16, 8


def mjpeg_frame_array(doc_id: int, f: int) -> np.ndarray:
    """Deterministic RGB frame f of doc_id's clip: pixel (y, x, c) =
    ``(doc_id*7 + f*11 + y*13 + x*3 + c) % 256`` — same index-arithmetic
    family as the PNG fixture, shifted per frame."""
    y = np.arange(MJPEG_H).reshape(MJPEG_H, 1, 1)
    x = np.arange(MJPEG_W).reshape(1, MJPEG_W, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((doc_id * 7 + f * 11 + y * 13 + x * 3 + c) % 256).astype(np.uint8)


def synth_mjpeg_avi_bytes(doc_id: int) -> bytes:
    """doc_id → real MJPEG-in-AVI: ``2 + doc_id % 3`` frames of 16×8
    RGB, each frame a quality-100 4:4:4 JPEG from our own encoder,
    wrapped as ``00dc`` chunks in a movi LIST with a consistent avih.
    This is a decodable VIDEO payload end-to-end — container walk +
    per-frame JPEG decode — not just header metadata."""
    from open_instrument_spark.operators.jpegcodec import encode_jpeg

    n = MJPEG_FRAMES_BASE + doc_id % MJPEG_FRAMES_MOD
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        40000, 0, 0, 0, n, 0, 1, 0, MJPEG_W, MJPEG_H, 0, 0, 0, 0,
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"movi"
    for f in range(n):
        jpg = encode_jpeg(mjpeg_frame_array(doc_id, f), quality=100)
        movi += b"00dc" + struct.pack("<I", len(jpg)) + jpg
        if len(jpg) & 1:
            movi += b"\x00"  # RIFF word alignment
    body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body



_SYNTHS = {
    "wav": synth_wav_bytes,
    "video": synth_video_bytes,
    "png": synth_png_bytes,
    "mjpeg": synth_mjpeg_avi_bytes,
}


def attach_synth_media(docs: DataFrame, kind: str) -> DataFrame:
    """documents → MEDIA-shaped (doc_id, blob, meta) with spec-built
    payloads of ``kind`` ∈ {wav, video, png, mjpeg}. mapInPandas (Arrow
    batches); the generator is per-row but byte-tiny and allocation-
    bound — at 100 TB this stage is a read-side adapter the real
    pipeline replaces with binaryFile/manifest blobs."""
    synth = _SYNTHS[kind]
    mimes = {"wav": "audio/wav", "video": "video/*", "png": "image/png",
             "mjpeg": "video/x-msvideo"}
    mime = mimes[kind]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [synth(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "blob": blobs,
                "mime": mime,
                "n_bytes": [len(b) for b in blobs],
            })

    flat = docs.select("doc_id").mapInPandas(
        run, "doc_id long, blob binary, mime string, n_bytes long"
    )
    from pyspark.sql import functions as F

    meta = F.struct(
        F.col("mime"),
        F.col("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("channels"),
    )
    return flat.select("doc_id", "blob", meta.alias("meta"))
