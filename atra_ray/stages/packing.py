"""Training-batch preparation operators: sequence packing (global token
offsets via a distributed two-level prefix scan) and deterministic
hash-based train/validation splits.

``pack_sequences`` is the classic scan pattern at 100 TB: no single node
can hold the (doc_id, n_tokens) stream, so the global cumulative sum is
computed hierarchically — ordered doc_id RANGES are the unit, per-range
token totals (one tiny row per range) prefix-sum on the driver, and the
per-document cumsum happens inside each range partition with the range's
starting offset broadcast. Rows cross the wire once (the range
exchange); the driver only ever sees ``num_ranges`` integers.

``doc_split`` is stateless and shuffle-free: the split is a pure
function of the document id (DuckDB-reproducible ``md5_number_lower``),
so it is stable across runs, machines and partitionings — the property a
train/val split must have.
"""

from __future__ import annotations


import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["pack_sequences", "doc_split"]

from .text_analysis import WS_WORD_RE as _WORD_RE  # shared token class


def pack_sequences(
    docs_path: str, seq_len: int = 2048, num_ranges: int = 64
) -> rd.Dataset:
    """(doc_id, n_tokens, token_offset, seq_id): lay every document out in
    one global token stream ordered by doc_id and assign each its starting
    offset and the fixed-length training sequence (``offset // seq_len``)
    it begins in — the greedy document-packing step that turns a cleaned
    corpus into equal-length training rows.

    Two-level prefix scan:

    1. token counts per doc (vectorized RE2, one pass), materialized —
       16 bytes/row metadata, object-store resident/spillable;
    2. per-range totals via a per-batch combiner (one row per range per
       batch), summed on the driver and prefix-scanned into per-range
       starting offsets (``num_ranges`` integers, broadcast);
    3. one partitioned exchange on range_id; inside each partition the
       per-doc cumsum is vectorized pandas over doc_id order.
    """
    import numpy as np
    import pandas as pd
    import ray

    from .shuffle import partitioned_map_groups

    def _count(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(batch.column("text"), _WORD_RE),
                    pa.int64(),
                ),
            }
        )

    counts = (
        rd.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(_count, batch_format="pyarrow")
        .materialize()
    )
    max_id = int(counts.max("doc_id"))
    range_size = max(1, (max_id + num_ranges) // num_ranges)

    def _range_totals(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        # null n_tokens (null text) contributes 0 to the running offsets —
        # the SQL window sum ignores NULL rows; unfilled, one NaN would
        # poison every offset after it in the range
        toks = batch.column("n_tokens").fill_null(0).to_numpy()
        rid = ids // range_size
        uniq, inv = np.unique(rid, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, toks)
        return pa.table(
            {
                "range_id": pa.array(uniq, pa.int64()),
                "total": pa.array(tot, pa.int64()),
            }
        )

    def _sum_ranges(t: pa.Table) -> pa.Table:
        g = t.group_by("range_id").aggregate([("total", "sum")])
        return pa.table(
            {"range_id": g.column("range_id"), "total": g.column("total_sum")}
        )

    from .shuffle import hash_reduce_small

    # per-(block, range) partials are pre-summed per range INSIDE the
    # sortless hash exchange (combine_fn = the associative group-sum), so
    # the driver receives exactly num_ranges rows — never O(blocks x
    # ranges) (ADVICE r3: with millions of input blocks the take_all()
    # partial gather contradicted the docstring's claim)
    totals_t = hash_reduce_small(
        counts.map_batches(_range_totals, batch_format="pyarrow"),
        ["range_id"],
        _sum_ranges,
        num_partitions=8,
        combine_fn=_sum_ranges,
    )
    totals = (
        dict(
            zip(
                totals_t.column("range_id").to_pylist(),
                totals_t.column("total").to_pylist(),
            )
        )
        if totals_t.num_rows
        else {}
    )
    offsets: dict[int, int] = {}
    acc = 0
    for rid in sorted(totals):
        offsets[rid] = acc
        acc += totals[rid]
    off_ref = ray.put(offsets)

    def _tag_range(batch: pa.Table) -> pa.Table:
        rid = pc.divide(batch.column("doc_id"), range_size)
        return batch.append_column("range_id", pc.cast(rid, pa.int64()))

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        # pandas cumsum skips NaN exactly like the SQL window sum skips
        # NULL: a null-text doc gets NULL offset/seq_id, later docs are
        # unaffected. Nullable Int64 keeps the Arrow schema int64 whether
        # or not a partition happened to contain null rows.
        cum = df.groupby("range_id")["n_tokens"].cumsum()
        start = df["range_id"].map(off).astype("int64")
        offset = start + cum - df["n_tokens"]
        df["token_offset"] = offset.astype("Int64")
        df["seq_id"] = (offset // seq_len).astype("Int64")
        df["n_tokens"] = df["n_tokens"].astype("Int64")
        return df[["doc_id", "n_tokens", "token_offset", "seq_id"]]

    tagged = counts.map_batches(_tag_range, batch_format="pyarrow")
    return partitioned_map_groups(
        tagged, ["range_id"], _scan, num_partitions=min(num_ranges, 32)
    )


def doc_split(docs_path: str, val_pct: int = 10) -> rd.Dataset:
    """(doc_id, bucket, split): deterministic hash split — bucket =
    ``md5_number_lower(str(doc_id)) % 100`` (bytes 8..16 of the md5
    digest, little-endian, the same DuckDB-reproducible hash the MinHash
    oracle uses), split = 'val' for buckets below ``val_pct`` else
    'train'. Pure per-row kernel; stable under any repartitioning."""

    def _split(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_low64

        ids = batch.column("doc_id").to_pylist()
        buckets = [md5_low64(str(i)) % 100 for i in ids]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(
                    ["val" if b < val_pct else "train" for b in buckets],
                    pa.string(),
                ),
            }
        )

    return rd.read_parquet(docs_path, columns=["doc_id"]).map_batches(
        _split, batch_format="pyarrow"
    )
