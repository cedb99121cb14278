"""Synthetic media table generator (multimodal fixtures).

One PXM image per document id: ``width = 16 + id % 32``,
``height = 16 + (id * 7) % 32``, 3 channels, pixels from a blake2b stream
(pure function of the id — no RNG state). The arithmetic dimensions give
the decode pipeline a DuckDB-expressible oracle: the engine must parse
width/height out of the binary header; the oracle recomputes them from
doc_id.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.multimodal import encode_pxm

__all__ = ["generate_media", "media_dims"]

_VERSION = "1"


def media_dims(media_id: int) -> tuple[int, int]:
    return 16 + media_id % 32, 16 + (media_id * 7) % 32


def _pixels(media_id: int, w: int, h: int, c: int = 3) -> np.ndarray:
    need = w * h * c
    raw = b""
    counter = 0
    while len(raw) < need:
        raw += hashlib.blake2b(
            f"media-{media_id}-{counter}".encode(), digest_size=64
        ).digest()
        counter += 1
    return np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, w, c)


def generate_media(out_dir: str, ids: list[int]) -> str:
    """Idempotent media.parquet of PXM blobs for the given ids."""
    out = Path(out_dir)
    marker = out / "_SUCCESS"
    key = f"{_VERSION}|{len(ids)}|{ids[0] if ids else 0}|{ids[-1] if ids else 0}"
    if marker.exists() and marker.read_text() == key:
        return str(out / "media.parquet")
    out.mkdir(parents=True, exist_ok=True)
    blobs = []
    for i in ids:
        w, h = media_dims(i)
        blobs.append(encode_pxm(_pixels(i, w, h)))
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(["image/x-pxm"] * len(ids), pa.string()),
                "data": pa.array(blobs, pa.binary()),
            }
        ),
        out / "media.parquet",
    )
    marker.write_text(key)
    return str(out / "media.parquet")
