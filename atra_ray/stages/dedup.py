"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the ray_guide patterns, stated per operator):
- exact: content-hash inside ``map_batches`` (combiner) → ``groupby(hash)``
  keep-first — ONE shuffle keyed by a uniform hash (no skew by design).
- MinHash-LSH: shingle → 128 minhashes per doc (vectorized numpy) →
  explode to (band, band_hash, doc_id) rows → ``groupby(band, band_hash)``
  → candidate pairs inside each bucket → exact Jaccard verify. The only
  shuffle is the band groupby; buckets are tiny by construction (a giant
  bucket means near-identical docs — capped per bucket to bound the pair
  blowup).
- SimHash: 64-bit weighted token hash; candidates via 4×16-bit band
  buckets; verify by Hamming distance.

Duplicate *decision* is deterministic: a doc is dropped iff it has a
verified duplicate with a smaller doc_id (min-id survivor rule, the same
rule the exact path and the SQL oracle use).
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .text_analysis import fingerprint_text

__all__ = [
    "dedup_exact",
    "minhash_signatures",
    "minhash_dup_pairs",
    "dedup_minhash",
    "simhash64",
    "simhash_dup_pairs",
    "jaccard",
]

# ---------------------------------------------------------------------------
# exact dedup (A1 analog on the documents table)
# ---------------------------------------------------------------------------


def dedup_exact(docs_path: str) -> rd.Dataset:
    """doc_id of the kept (min-id) document per distinct normalized text."""

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [fingerprint_text(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, pa.string())}
        )

    def _keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id").head(1)[["doc_id"]]

    return (
        rd.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(_fp, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(_keep_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, n: int = 3) -> Iterable[int]:
    """Word n-gram shingles hashed to 64-bit ints."""
    toks = text.lower().split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    for g in grams:
        yield int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(texts: list[str], num_perm: int = 128, ngram: int = 3) -> np.ndarray:
    """(len(texts), num_perm) uint64 signature matrix, vectorized per doc:
    sig[p] = min over shingles s of (a_p * s + b_p mod M)."""
    a, b = _perm_params(num_perm)
    out = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = np.fromiter(_shingles(t, ngram), dtype=np.uint64)
        if len(sh) == 0:
            continue
        # (S, P) broadcast; modular arithmetic via python ints is slow, use
        # float-free uint64 wraparound then mod the Mersenne prime
        v = (sh[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
        out[i] = v.min(axis=0)
    return out


def jaccard(a: str, b: str, ngram: int = 3) -> float:
    sa, sb = set(_shingles(a, ngram)), set(_shingles(b, ngram))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dup_pairs(
    docs_path: str,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
    ngram: int = 3,
    max_bucket: int = 64,
) -> rd.Dataset:
    """Verified near-duplicate pairs (a < b, jaccard >= threshold).

    shingle→minhash per batch → explode to (band, band_hash, doc_id) →
    groupby band bucket → pairs → exact Jaccard verify (re-shingling the
    two candidate texts — at web scale this verify joins back to the text
    store; here texts ride along in the bucket rows).
    """
    import ray

    rows_per_band = num_perm // bands
    # broadcast the doc_id -> shingle-set lookup ONCE (ray.put; read in the
    # verify stage) instead of shipping text through the band shuffle. At
    # web scale this becomes a join back to the text store keyed by doc_id;
    # the band rows stay (band, band_hash, doc_id) either way.
    import pyarrow.parquet as pq

    _t = pq.read_table(docs_path, columns=["doc_id", "text"])
    shingle_sets = {
        d: frozenset(_shingles(t, ngram))
        for d, t in zip(_t.column("doc_id").to_pylist(), _t.column("text").to_pylist())
    }
    sh_ref = ray.put(shingle_sets)

    def _sig(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        sigs = minhash_signatures(texts, num_perm, ngram)
        out = {"band": [], "band_hash": [], "doc_id": []}
        for i, doc in enumerate(ids):
            for bi in range(bands):
                chunk = sigs[i, bi * rows_per_band : (bi + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out["band"].append(bi)
                out["band_hash"].append(h)
                out["doc_id"].append(doc)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "band_hash": pa.array(out["band_hash"], pa.string()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
            }
        )

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        sets = ray.get(sh_ref)
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            sa = sets[ids[i]]
            for j in range(i + 1, len(ids)):
                sb = sets[ids[j]]
                union = len(sa | sb)
                jac = (len(sa & sb) / union) if union else 1.0
                if jac >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(jac)
        return pd.DataFrame({"a": a_out, "b": b_out, "jaccard": j_out})

    def _dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    sig_ds = rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _sig, batch_format="pyarrow", batch_size=512
    )
    # nearly all band buckets are singletons; per-group map_groups overhead
    # on them dwarfs the real work. Semi-join first: a cheap native count
    # aggregate finds buckets with >=2 members, their keys broadcast via
    # ray.put, and only colliding rows enter the expensive pairing groupby.
    counts = sig_ds.groupby(["band", "band_hash"]).count().to_pandas()
    hot = counts[counts["count()"] >= 2]
    hot_keys = ray.put(set(zip(hot["band"].tolist(), hot["band_hash"].tolist())))

    def _only_hot(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_keys)
        mask = [
            (b, h) in keys
            for b, h in zip(batch.column("band").to_pylist(), batch.column("band_hash").to_pylist())
        ]
        return batch.filter(pa.array(mask))

    pairs = (
        sig_ds.map_batches(_only_hot, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    # the same pair can surface from several bands — dedup on (a, b)
    return pairs.groupby(["a", "b"]).map_groups(_dedup_pairs, batch_format="pandas")


def dedup_minhash(docs_path: str, **kwargs) -> rd.Dataset:
    """doc_ids kept under the min-id survivor rule over verified pairs."""
    import pyarrow.parquet as pq  # local: only driver-side small sets below

    pairs = minhash_dup_pairs(docs_path, **kwargs).select_columns(["a", "b"]).to_pandas()
    drop = set(pairs["b"].tolist())  # b > a always: min-id survives

    def _keep(batch: pa.Table) -> pa.Table:
        mask = pa.array([d not in drop for d in batch.column("doc_id").to_pylist()])
        return batch.filter(mask)

    return (
        rd.read_parquet(docs_path, columns=["doc_id"])
        .map_batches(_keep, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over whitespace tokens."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for tok in text.lower().split():
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        )
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_dup_pairs(docs_path: str, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash banding (4 × 16-bit chunks: any pair within
    Hamming distance 3 shares at least one exact chunk) + Hamming verify."""

    def _sig(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sigs = [simhash64(t) for t in batch.column("text").to_pylist()]
        out = {"chunk": [], "chunk_val": [], "doc_id": [], "sig": []}
        for d, s in zip(ids, sigs):
            for c in range(4):
                out["chunk"].append(c)
                out["chunk_val"].append((s >> (16 * c)) & 0xFFFF)
                out["doc_id"].append(d)
                out["sig"].append(s)
        return pa.table(
            {
                "chunk": pa.array(out["chunk"], pa.int32()),
                "chunk_val": pa.array(out["chunk_val"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "sig": pa.array(out["sig"], pa.uint64()),
            }
        )

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        sigs = g["sig"].tolist()
        a_out, b_out, h_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                if ham <= max_hamming:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    h_out.append(ham)
        return pd.DataFrame({"a": a_out, "b": b_out, "hamming": h_out})

    import ray

    sig_ds = rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _sig, batch_format="pyarrow", batch_size=512
    )
    # same singleton-bucket semi-join as the MinHash path
    counts = sig_ds.groupby(["chunk", "chunk_val"]).count().to_pandas()
    hot = counts[counts["count()"] >= 2]
    hot_keys = ray.put(set(zip(hot["chunk"].tolist(), hot["chunk_val"].tolist())))

    def _only_hot(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_keys)
        mask = [
            (c, v) in keys
            for c, v in zip(batch.column("chunk").to_pylist(), batch.column("chunk_val").to_pylist())
        ]
        return batch.filter(pa.array(mask))

    pairs = (
        sig_ds.map_batches(_only_hot, batch_format="pyarrow")
        .groupby(["chunk", "chunk_val"])
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
