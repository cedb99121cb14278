"""The DuckDB ``md5_number_lower``-compatible 64-bit hash.

Every SQL-reproducible operator that needs a deterministic per-value hash
(MinHash token hashes in ``stages/dedup``, train/val buckets in
``packing.doc_split``, stratified-sample order in
``curation.stratified_sample``) MUST use this single definition: bytes
8..16 of the md5 digest, little-endian — exactly what DuckDB's
``md5_number_lower(v)`` returns, which is what lets the driver's SQL
oracles recompute identical values.
"""

from __future__ import annotations

import hashlib

__all__ = ["md5_low64"]


def md5_low64(value: str) -> int:
    """uint64 == DuckDB ``md5_number_lower(value)``."""
    return int.from_bytes(hashlib.md5(value.encode()).digest()[8:], "little")
