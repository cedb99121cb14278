"""Multimodal (image/audio) column plumbing + synthetic codecs.

Binary media ride as opaque ``binary`` columns with typed metadata columns
alongside. The Ray-side plumbing — schema, actor-pool signature, small
batch sizes for wide rows, output layout — is REAL and driver-checked; the
codec layer decodes a deterministic SYNTHETIC raster/PCM format (no
image/audio libraries exist in this container — the real-format path is a
clearly-marked ``NotImplementedError`` stub to swap for PIL/torchaudio):

- PXM raster: ``b"PXM1" + width:i32 + height:i32 + channels:u8 + pixels``
  (row-major, uint8). ``DecodeImageStage`` parses the header, decodes the
  pixel matrix, nearest-neighbor resizes, and emits width/height metadata
  plus a 3+4c float feature vector (channel means + 2x2 grid means).
- PAM audio: ``b"PAM1" + rate:i32 + samples:i16[]``. ``DecodeAudioStage``
  emits duration + windowed RMS frames (the frame-sample analog).

At real scale these stages are actor pools (``concurrency=N, num_cpus=c``)
with the codec/model loaded once per actor in ``__init__``; batch_size
stays small (wide binary rows), and Ray's block splitting + object-store
spilling handle memory.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

__all__ = [
    "DecodeImageStage",
    "DecodeAudioStage",
    "MEDIA_SCHEMA",
    "decode_pxm",
    "encode_pxm",
    "decode_pam",
    "encode_pam",
    "media_decode",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("data", pa.binary()),
    ]
)

_PXM_MAGIC = b"PXM1"
_PAM_MAGIC = b"PAM1"


def encode_pxm(pixels: np.ndarray) -> bytes:
    """(h, w, c) uint8 -> PXM bytes."""
    h, w, c = pixels.shape
    return _PXM_MAGIC + struct.pack("<iiB", w, h, c) + pixels.tobytes()


def decode_pxm(data: bytes) -> tuple[int, int, np.ndarray]:
    """PXM bytes -> (width, height, (h, w, c) uint8). Raises ValueError on
    a corrupt header/payload (callers surface it as a decode-error row,
    never a poisoned batch)."""
    if data[:4] != _PXM_MAGIC:
        raise ValueError("not a PXM payload")
    try:
        w, h, c = struct.unpack_from("<iiB", data, 4)
    except struct.error as e:
        raise ValueError("truncated PXM header") from e
    need = w * h * c
    body = data[13 : 13 + need]
    if len(body) != need or w <= 0 or h <= 0:
        raise ValueError("truncated PXM payload")
    return w, h, np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[yi][:, xi]


def encode_pam(rate: int, samples: np.ndarray) -> bytes:
    return _PAM_MAGIC + struct.pack("<i", rate) + samples.astype("<i2").tobytes()


def decode_pam(data: bytes) -> tuple[int, np.ndarray]:
    if data[:4] != _PAM_MAGIC:
        raise ValueError("not a PAM payload")
    (rate,) = struct.unpack_from("<i", data, 4)
    return rate, np.frombuffer(data[8:], dtype="<i2")


class DecodeImageStage:
    """map_batches actor: binary image column -> (width, height, features).

    Decodes the synthetic PXM codec for real; any other payload raises
    ``NotImplementedError`` unless ``fake=True``, in which case a
    deterministic pseudo-feature (blake2b fold) stands in — the
    clearly-marked stub to swap for a real decoder (PIL/torchvision)
    outside this container. Corrupt payloads yield ``ok=False`` rows."""

    def __init__(self, feat_dim: int = 16, fake: bool = True, resize_to: int = 8):
        self.feat_dim = feat_dim
        self.fake = fake
        self.resize_to = resize_to

    def _fake_features(self, data: bytes) -> np.ndarray:
        need = self.feat_dim * 4
        raw = b""
        counter = 0
        while len(raw) < need:
            raw += hashlib.blake2b(
                data + counter.to_bytes(2, "big"), digest_size=32
            ).digest()
            counter += 1
        ints = np.frombuffer(raw[:need], dtype=np.uint32)
        return (ints / np.float64(2**32)).astype(np.float64)

    def _one(self, data: bytes | None) -> tuple[bool, int, int, np.ndarray]:
        if data is None:
            return False, 0, 0, np.zeros(self.feat_dim)
        if data[:4] == _PXM_MAGIC:
            try:
                w, h, img = decode_pxm(bytes(data))
            except ValueError:
                return False, 0, 0, np.zeros(self.feat_dim)
            small = resize_nearest(img, self.resize_to, self.resize_to)
            c = img.shape[2]
            grid = small.reshape(2, self.resize_to // 2, 2, self.resize_to // 2, c)
            feats = np.concatenate(
                [
                    img.mean(axis=(0, 1)) / 255.0,  # c channel means
                    (grid.mean(axis=(1, 3)) / 255.0).reshape(-1),  # 4c grid means
                ]
            )
            return True, w, h, feats
        if self.fake:
            return True, 0, 0, self._fake_features(bytes(data))
        raise NotImplementedError(
            "non-PXM image decode requires an image library not present in "
            "this container; run with fake=True or install a decoder"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        oks, ws, hs, feats = [], [], [], []
        for d in batch.column("data").to_pylist():
            ok, w, h, f = self._one(d)
            oks.append(ok)
            ws.append(w)
            hs.append(h)
            feats.append(f.tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "mime": batch.column("mime"),
                "ok": pa.array(oks, pa.bool_()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class DecodeAudioStage:
    """map_batches actor: binary PCM column -> duration + windowed RMS
    frames (the frame-sample analog for audio payloads)."""

    def __init__(self, window: int = 1024):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        durs, frames = [], []
        for d in batch.column("data").to_pylist():
            try:
                rate, samples = decode_pam(bytes(d))
            except (ValueError, TypeError):
                durs.append(0.0)
                frames.append([])
                continue
            durs.append(len(samples) / rate if rate else 0.0)
            n = len(samples) // self.window
            if n:
                x = samples[: n * self.window].astype(np.float64).reshape(n, -1)
                frames.append(np.sqrt((x**2).mean(axis=1)).tolist())
            else:
                frames.append([])
        return pa.table(
            {
                "media_id": ids,
                "duration_s": pa.array(durs, pa.float64()),
                "rms_frames": pa.array(frames, pa.list_(pa.float64())),
            }
        )


def media_decode(media_path: str, concurrency: int = 2) -> "object":
    """The driver-checked decode pipeline: media table -> actor-pool
    decode -> (media_id, width, height). Small batches: wide binary rows
    (ray_guide memory sizing)."""
    import ray.data as rd

    return (
        rd.read_parquet(media_path, columns=["media_id", "mime", "data"])
        .map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={"fake": False},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=concurrency,
        )
        .select_columns(["media_id", "width", "height"])
    )
