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

__all__ = ["md5_low64", "md5_low64_column"]


def md5_low64(value: str) -> int:
    """uint64 == DuckDB ``md5_number_lower(value)``."""
    return int.from_bytes(hashlib.md5(value.encode()).digest()[8:], "little")


def md5_low64_column(col):
    """Vectorized ``md5_low64`` over a pyarrow (Chunked)Array of strings
    -> uint64 (Chunked)Array.

    Values like crawl-graph urls repeat heavily within a block, so each
    chunk is dictionary-encoded and only the DISTINCT values are md5'd,
    then scattered back by code — turning a per-row digest pass into a
    per-distinct-value one (the dominant cost of PageRank id prep,
    VERDICT r4 item 7)."""
    import numpy as np
    import pyarrow as pa

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out = []
    for ch in chunks:
        if len(ch) == 0:
            out.append(pa.array([], pa.uint64()))
            continue
        enc = ch.dictionary_encode()
        uniq = np.fromiter(
            (md5_low64(u) for u in enc.dictionary.to_pylist()),
            dtype=np.uint64,
            count=len(enc.dictionary),
        )
        if ch.null_count:
            # null in, null out — DuckDB md5_number_lower(NULL) semantics
            # (a null index would otherwise surface as an opaque numpy
            # fancy-indexing TypeError)
            mask = np.asarray(enc.indices.is_null())
            idx = np.asarray(
                enc.indices.fill_null(0).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            out.append(pa.array(uniq[idx], pa.uint64(), mask=mask))
        else:
            idx = enc.indices.to_numpy(zero_copy_only=False)
            out.append(pa.array(uniq[idx], pa.uint64()))
    return pa.chunked_array(out, pa.uint64()) if len(out) != 1 else out[0]
