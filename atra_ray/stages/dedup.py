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
    "ngram_jaccard_dup_pairs",
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

    def _min_per_fp(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fp", as_index=False)["doc_id"].min()[["doc_id"]]

    from .shuffle import partitioned_map_groups

    return partitioned_map_groups(
        rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
            _fp, batch_format="pyarrow"
        ),
        ["fp"],
        _min_per_fp,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_POLY = np.uint64(1099511628211)  # FNV-ish odd multiplier (uint64 wraparound)


def _token_hashes(toks: list[str]) -> np.ndarray:
    """uint64 hash per token; blake2b runs once per UNIQUE token (documents
    repeat words heavily — this is the difference between O(tokens) and
    O(unique) digest calls)."""
    uniq: dict[str, int] = {}
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = uniq.get(t)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
            )
            uniq[t] = h
        out[i] = h
    return out


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """uint64 hash per word-n-gram shingle, vectorized: hash tokens once,
    then combine each window by a rolling polynomial (wraparound uint64) —
    no per-gram string building or digest calls."""
    toks = text.lower().split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks)
    if len(toks) < n:
        n = len(toks)
    with np.errstate(over="ignore"):
        acc = th[: len(th) - n + 1].copy()
        for k in range(1, n):
            acc = acc * _POLY + th[k : len(th) - n + 1 + k]
    return acc


def _shingles(text: str, n: int = 3) -> Iterable[int]:
    """Word n-gram shingles hashed to 64-bit ints."""
    return _shingle_hashes(text, n)


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
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            sh = np.unique(_shingle_hashes(t, ngram))
            if len(sh) == 0:
                continue
            # (S, P) broadcast; uint64 wraparound then mod the Mersenne prime
            v = (sh[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            out[i] = v.min(axis=0)
    return out


def _band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(docs, bands) uint64: polynomial combine of each band's rows —
    vectorized over the whole batch (no per-doc digest calls)."""
    n, p = sigs.shape
    r = p // bands
    v = sigs.reshape(n, bands, r)
    with np.errstate(over="ignore"):
        acc = v[:, :, 0].copy()
        for k in range(1, r):
            acc = acc * _POLY + v[:, :, k]
    return acc


def jaccard(a: str, b: str, ngram: int = 3) -> float:
    sa = set(_shingle_hashes(a, ngram).tolist())
    sb = set(_shingle_hashes(b, ngram).tolist())
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

    shingle→minhash per batch (vectorized numpy) → explode to
    (band, band_hash:int64, doc_id) → semi-join to colliding buckets →
    groupby bucket → candidate pairs → native groupby(a,b) dedup →
    vectorized verify: signature-estimated Jaccard (mean per-perm equality)
    against the broadcast signature matrix (``ray.put`` of a numpy array —
    zero-copy reads in every verify task). At web scale the matrix is
    sharded and the verify becomes a hash join on doc_id; the band shuffle
    and bucket shapes are unchanged.
    """
    import ray

    # pass 1 (distributed): signatures per doc, collected as ONE numpy
    # matrix (n_docs × num_perm × 8 bytes; 1 GB per million docs — the
    # small side of the verify join at sandbox scale)
    sig_tbl = (
        rd.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "sig": pa.array(
                        list(
                            minhash_signatures(
                                b.column("text").to_pylist(), num_perm, ngram
                            )
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
            batch_size=512,
        )
        .to_pandas()
    )
    all_ids = np.asarray(sig_tbl["doc_id"], dtype=np.int64)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    sig_matrix = np.stack(sig_tbl["sig"].to_numpy()[order]).astype(np.uint64)
    ids_ref = ray.put(all_ids)
    sig_ref = ray.put(sig_matrix)

    band_of = _band_hashes(sig_matrix, bands)
    n = len(all_ids)
    band_tbl = pa.table(
        {
            "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(band_of.T.reshape(-1).view(np.int64)),  # int64 view: uint64 > 2^63-1 breaks pandas->Arrow in map_groups
            "doc_id": pa.array(np.tile(all_ids, bands)),
        }
    )
    sig_ds = rd.from_arrow(band_tbl).repartition(8)

    from .shuffle import partitioned_map_groups

    def _partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """All rows of any (band, band_hash) bucket are co-located here.
        Vectorized singleton drop (duplicated mask), then a Python loop over
        only the COLLIDING buckets (rare by construction)."""
        d = df[df.duplicated(["band", "band_hash"], keep=False)]
        if d.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        a_out, b_out = [], []
        for _, g in d.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g["doc_id"].to_numpy())[:max_bucket]
            i, j = np.triu_indices(len(ids), k=1)
            a_out.append(ids[i])
            b_out.append(ids[j])
        return pd.DataFrame(
            {"a": np.concatenate(a_out), "b": np.concatenate(b_out)}
        ).drop_duplicates()

    def _dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"])

    def _verify(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        sigs = ray.get(sig_ref)
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        ai = np.searchsorted(ids, a)
        bi = np.searchsorted(ids, b)
        est = (sigs[ai] == sigs[bi]).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "jaccard": pa.array(est[keep], pa.float64()),
            }
        )

    pairs = partitioned_map_groups(sig_ds, ["band", "band_hash"], _partition_pairs)
    # the same pair surfaces from several bands — hash-partitioned dedup on
    # (a, b), then one vectorized verify pass over unique candidates
    return partitioned_map_groups(pairs, ["a", "b"], _dedup_pairs).map_batches(
        _verify, batch_format="pyarrow"
    )


def ngram_jaccard_dup_pairs(
    docs_path: str,
    threshold: float = 0.7,
    ngram: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    max_bucket: int = 64,
) -> rd.Dataset:
    """Near-duplicate pairs with EXACT word-n-gram Jaccard (a < b,
    jaccard >= threshold).

    Same MinHash-LSH candidate generation as ``minhash_dup_pairs`` (recall
    governed by the band scheme), but the verify recomputes the true
    shingle-set Jaccard of each candidate pair from the broadcast text
    column — the variant to use when the downstream decision needs the
    exact statistic, at the cost of re-shingling candidates. At web scale
    the text side becomes a doc_id-keyed join against the document store;
    the candidate volume (post-LSH) is what makes exact verify affordable.
    """
    import pyarrow.parquet as pq

    import ray

    candidates = minhash_dup_pairs(
        docs_path,
        num_perm=num_perm,
        bands=bands,
        # estimate-threshold relaxed: exact verify makes the final call
        threshold=max(0.0, threshold - 0.2),
        ngram=ngram,
        max_bucket=max_bucket,
    )
    t = pq.read_table(docs_path, columns=["doc_id", "text"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    texts_ref = ray.put(
        (ids[order], [t.column("text").to_pylist()[i] for i in order])
    )

    def _exact(batch: pa.Table) -> pa.Table:
        ids_, texts_ = ray.get(texts_ref)
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        sets: dict[int, set] = {}

        def _set(doc):
            s = sets.get(doc)
            if s is None:
                idx = int(np.searchsorted(ids_, doc))
                s = set(_shingle_hashes(texts_[idx], ngram).tolist())
                sets[doc] = s
            return s

        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, b):
            sa, sb = _set(int(x)), _set(int(y))
            union = len(sa | sb)
            jac = (len(sa & sb) / union) if union else 1.0
            if jac >= threshold:
                out_a.append(int(x))
                out_b.append(int(y))
                out_j.append(jac)
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return candidates.select_columns(["a", "b"]).map_batches(
        _exact, batch_format="pyarrow"
    )


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
    """Classic 64-bit SimHash over whitespace tokens — vectorized: hash
    unique tokens once, unpack all bits at once, weighted column sums."""
    toks = text.lower().split()
    if not toks:
        return 0
    th = _token_hashes(toks)
    # (T, 64) bit matrix via byte view + unpackbits (little-endian bit 0
    # first to match 1 << i)
    bits = np.unpackbits(
        th.view(np.uint8).reshape(len(th), 8), axis=1, bitorder="little"
    ).astype(np.int32)
    acc = (2 * bits - 1).sum(axis=0)
    out = np.packbits((acc > 0).astype(np.uint8), bitorder="little")
    return int(out.view(np.uint64)[0])


def simhash_dup_pairs(docs_path: str, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash banding (4 × 16-bit chunks: any pair within
    Hamming distance 3 shares at least one exact chunk) + Hamming verify."""

    def _sig(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        sigs = np.array(
            [simhash64(t) for t in batch.column("text").to_pylist()], dtype=np.uint64
        )
        n = len(ids)
        chunks = np.repeat(np.arange(4, dtype=np.int32), n)
        shift = (chunks.astype(np.uint64)) * np.uint64(16)
        tiled = np.tile(sigs, 4)
        return pa.table(
            {
                "chunk": pa.array(chunks),
                "chunk_val": pa.array(
                    ((tiled >> shift) & np.uint64(0xFFFF)).astype(np.int64)
                ),
                "doc_id": pa.array(np.tile(ids, 4)),
                # int64 view: uint64 > 2^63-1 breaks pandas->Arrow round-trips
                "sig": pa.array(tiled.view(np.int64)),
            }
        )

    def _partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized singleton drop, then per-colliding-bucket pair
        generation with numpy Hamming (XOR + unpackbits)."""
        d = df[df.duplicated(["chunk", "chunk_val"], keep=False)]
        if d.empty:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "hamming": pd.Series(dtype="int64"),
                }
            )
        frames = []
        for _, g in d.groupby(["chunk", "chunk_val"], sort=False):
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sigs = g["sig"].to_numpy().astype(np.int64).view(np.uint64)
            i, j = np.triu_indices(len(ids), k=1)
            x = (sigs[i] ^ sigs[j]).copy()
            ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
            keep = ham <= max_hamming
            frames.append(
                pd.DataFrame(
                    {
                        "a": ids[i][keep],
                        "b": ids[j][keep],
                        "hamming": ham[keep].astype(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True).drop_duplicates(["a", "b"])

    from .shuffle import partitioned_map_groups

    sig_ds = rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _sig, batch_format="pyarrow", batch_size=512
    )
    pairs = partitioned_map_groups(sig_ds, ["chunk", "chunk_val"], _partition_pairs)
    # the same pair surfaces from several chunks (identical hamming) —
    # hash-partitioned drop_duplicates
    return partitioned_map_groups(
        pairs, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"])
    )
