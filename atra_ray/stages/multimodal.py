"""Multimodal (image/audio/video) column plumbing.

Binary media ride as opaque ``binary`` columns with typed metadata columns
alongside (mime, width/height or duration). The Ray-side plumbing — schema,
actor-pool signature, small batch sizes for wide rows, output layout — is
real and tested; the actual codec work is STUBBED because no image/audio
libraries exist in this container:

- ``DecodeImageStage`` raises ``NotImplementedError`` in strict mode, or
  produces a deterministic fake feature vector (blake2b of the bytes,
  folded to ``feat_dim`` floats) in fake mode — enough to exercise the
  full pipeline shape end-to-end.

At real scale these stages are actor pools (``concurrency=N, num_cpus=c``)
with the codec/model loaded once per actor in ``__init__``; batch_size
stays small (wide binary rows), and Ray's block splitting + object-store
spilling handle memory.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["DecodeImageStage", "MEDIA_SCHEMA"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("data", pa.binary()),
    ]
)


class DecodeImageStage:
    """map_batches actor: binary image column -> feature vector column.

    fake=True (default in this sandbox): deterministic pseudo-features so
    the downstream pipeline (ANN over features, dedup by feature hash) is
    testable. fake=False: raises NotImplementedError at the decode site —
    the clearly-marked stub to swap for a real decoder (PIL/torchvision)
    outside this container.
    """

    def __init__(self, feat_dim: int = 16, fake: bool = True):
        self.feat_dim = feat_dim
        self.fake = fake

    def _features(self, data: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "container; run with fake=True or install a decoder"
            )
        # deterministic fake: fold a blake2b digest into feat_dim floats
        need = self.feat_dim * 4
        raw = b""
        counter = 0
        while len(raw) < need:
            raw += hashlib.blake2b(data + counter.to_bytes(2, "big"), digest_size=32).digest()
            counter += 1
        ints = np.frombuffer(raw[:need], dtype=np.uint32)
        return (ints / np.float64(2**32)).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._features(bytes(d)) if d is not None else np.zeros(self.feat_dim)
            for d in batch.column("data").to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "mime": batch.column("mime"),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )
