"""Synthetic media table generators (multimodal fixtures).

Images — one per document id, ``width = 16 + id % 32``, ``height =
16 + (id * 7) % 32``, pixels from a blake2b stream (pure function of the
id — no RNG state). REAL formats: ids ``% 4 == 1`` encode as baseline
JPEG (4:4:4; grayscale when ``id % 8 == 5`` — lossy, so only header
facts are oracle-compared), remaining even ids as PNG (RGB, or grayscale
when ``id % 8 == 2`` — exercises both color types), remaining odd ids as
the synthetic PXM twin. The arithmetic dimensions give the decode
pipeline a DuckDB-expressible oracle: the engine must parse width/height
out of the binary payload (PNG IHDR, JPEG SOF0 or PXM header); the
oracle recomputes them from doc_id.

Audio — ``rate = 8000 + (id % 3) * 4000``, ``n_samples = rate // 2 +
id % 500``, int16 samples from the same blake2b stream. Even ids encode
as RIFF/WAVE (stdlib ``wave`` writer), odd ids as the synthetic PAM twin.
Oracle: ``duration_s = n_samples / rate`` recomputed from the id
arithmetic (identical IEEE division on both sides).
"""

from __future__ import annotations

import hashlib
import io
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.jpeg import encode_jpeg
from ..functions.png import encode_png
from ..stages.multimodal import encode_pam, encode_pxm

__all__ = [
    "generate_media",
    "generate_audio",
    "generate_video",
    "media_dims",
    "audio_params",
    "tone_params",
    "video_params",
]

_VERSION = "6"  # v6: tone clips on id%4 in {0,3}; JPEG mix cycles 444/422/420
_VIDEO_VERSION = "1"  # Y4M (YUV4MPEG2) + VIDX synthetic twin


def media_dims(media_id: int) -> tuple[int, int]:
    return 16 + media_id % 32, 16 + (media_id * 7) % 32


def audio_params(media_id: int) -> tuple[int, int]:
    """(sample_rate, n_samples) from the id arithmetic (the SQL oracle)."""
    rate = 8000 + (media_id % 3) * 4000
    return rate, rate // 2 + media_id % 500


def tone_params(media_id: int) -> int:
    """FFT bin index (1024-point frame) of the pure-sine clips the
    generator plants at ``id % 4 in {0, 3}`` — the spectral oracle."""
    return 20 + media_id % 50


def _byte_stream(tag: str, media_id: int, need: int) -> bytes:
    raw = b""
    counter = 0
    while len(raw) < need:
        raw += hashlib.blake2b(
            f"{tag}-{media_id}-{counter}".encode(), digest_size=64
        ).digest()
        counter += 1
    return raw[:need]


def _pixels(media_id: int, w: int, h: int, c: int = 3) -> np.ndarray:
    raw = _byte_stream("media", media_id, w * h * c)
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)


def _encode_wav(rate: int, samples: np.ndarray) -> bytes:
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def generate_media(out_dir: str, ids: list[int]) -> str:
    """Idempotent media.parquet of PNG/PXM blobs for the given ids."""
    out = Path(out_dir)
    marker = out / "_SUCCESS"
    key = f"{_VERSION}|{len(ids)}|{ids[0] if ids else 0}|{ids[-1] if ids else 0}"
    if marker.exists() and marker.read_text() == key:
        return str(out / "media.parquet")
    out.mkdir(parents=True, exist_ok=True)
    blobs, mimes = [], []
    for i in ids:
        w, h = media_dims(i)
        px = _pixels(i, w, h)
        if i % 4 == 1:
            # real baseline JPEG (Annex-K tables) — lossy, so only header
            # facts (dims) are oracle-compared; every 8th a grayscale
            # stream, and the color streams cycle 4:4:4 / 4:2:2 / 4:2:0
            # chroma subsampling so the MCU-interleaved decode paths are
            # all driver-exercised (real corpora are mostly 4:2:0)
            if i % 8 == 5:
                blobs.append(encode_jpeg(px[:, :, :1]))
            else:
                sub = ("444", "422", "420")[(i // 4) % 3]
                blobs.append(encode_jpeg(px, subsampling=sub))
            mimes.append("image/jpeg")
        elif i % 2 == 0:
            # grayscale every 4th even id: both PNG color types verified
            blobs.append(encode_png(px[:, :, :1] if i % 8 == 2 else px))
            mimes.append("image/png")
        else:
            blobs.append(encode_pxm(px))
            mimes.append("image/x-pxm")
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(mimes, pa.string()),
                "data": pa.array(blobs, pa.binary()),
            }
        ),
        out / "media.parquet",
    )
    marker.write_text(key)
    return str(out / "media.parquet")


def video_params(media_id: int) -> tuple[int, int, int, int]:
    """(width, height, fps, n_frames) from the id arithmetic (the SQL
    oracle): the engine must parse all four out of the Y4M/VIDX header."""
    w = 16 + (media_id % 16) * 2
    h = 16 + ((media_id * 5) % 16) * 2
    fps = 10 + (media_id % 4) * 5
    n_frames = 4 + media_id % 28
    return w, h, fps, n_frames


def _luma_planes(media_id: int, w: int, h: int, n: int) -> np.ndarray:
    """(n, h, w) uint8 luma frames — SAME stream for Y4M and VIDX so a
    given id's per-frame luma means are format-independent."""
    raw = _byte_stream("video", media_id, n * w * h)
    return np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w)


def _encode_y4m(media_id: int) -> bytes:
    """Real-format YUV4MPEG2 (C444: full U/V planes) byte stream."""
    w, h, fps, n = video_params(media_id)
    y = _luma_planes(media_id, w, h, n)
    uv = np.frombuffer(
        _byte_stream("video-uv", media_id, n * w * h * 2), dtype=np.uint8
    ).reshape(n, 2, h, w)
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(y[i].tobytes())
        out.append(uv[i].tobytes())
    return b"".join(out)


def _encode_vidx(media_id: int) -> bytes:
    """Synthetic luma-only twin: ``b"VIDX" + w:i32 + h:i32 + fps:i32 +
    n_frames:i32`` + n·h·w uint8 luma bytes."""
    import struct

    w, h, fps, n = video_params(media_id)
    return (
        b"VIDX"
        + struct.pack("<iiii", w, h, fps, n)
        + _luma_planes(media_id, w, h, n).tobytes()
    )


def generate_video(out_dir: str, ids: list[int]) -> str:
    """Idempotent video.parquet of Y4M/VIDX blobs for the given ids
    (even ids real YUV4MPEG2, odd ids the synthetic twin)."""
    out = Path(out_dir)
    marker = out / "_SUCCESS_VIDEO"
    key = f"{_VIDEO_VERSION}|{len(ids)}|{ids[0] if ids else 0}|{ids[-1] if ids else 0}"
    if marker.exists() and marker.read_text() == key:
        return str(out / "video.parquet")
    out.mkdir(parents=True, exist_ok=True)
    blobs, mimes = [], []
    for i in ids:
        if i % 2 == 0:
            blobs.append(_encode_y4m(i))
            mimes.append("video/x-yuv4mpeg")
        else:
            blobs.append(_encode_vidx(i))
            mimes.append("video/x-vidx")
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(mimes, pa.string()),
                "data": pa.array(blobs, pa.binary()),
            }
        ),
        out / "video.parquet",
    )
    marker.write_text(key)
    return str(out / "video.parquet")


def generate_audio(out_dir: str, ids: list[int]) -> str:
    """Idempotent audio.parquet of WAV/PAM blobs for the given ids."""
    out = Path(out_dir)
    marker = out / "_SUCCESS_AUDIO"
    key = f"{_VERSION}|{len(ids)}|{ids[0] if ids else 0}|{ids[-1] if ids else 0}"
    if marker.exists() and marker.read_text() == key:
        return str(out / "audio.parquet")
    out.mkdir(parents=True, exist_ok=True)
    blobs, mimes = [], []
    for i in ids:
        rate, n = audio_params(i)
        if i % 4 in (0, 3):
            # pure sine pinned to FFT bin CENTER k of a 1024-point frame
            # (f = k*rate/1024): the spectral-analysis oracle can predict
            # the dominant bin from id arithmetic (tone_params). The id
            # class {0, 3} spans both parities, so both the WAV (even id)
            # and PAM (odd id) container paths carry tone clips
            k = tone_params(i)
            t = np.arange(n)
            samples = np.round(
                12000.0 * np.sin(2.0 * np.pi * k * t / 1024.0)
            ).astype(np.int16)
        else:
            samples = (
                np.frombuffer(_byte_stream("audio", i, n * 2), dtype="<i2")
                .astype(np.int16)
            )
        if i % 2 == 0:
            blobs.append(_encode_wav(rate, samples))
            mimes.append("audio/wav")
        else:
            blobs.append(encode_pam(rate, samples))
            mimes.append("audio/x-pam")
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(mimes, pa.string()),
                "data": pa.array(blobs, pa.binary()),
            }
        ),
        out / "audio.parquet",
    )
    marker.write_text(key)
    return str(out / "audio.parquet")
