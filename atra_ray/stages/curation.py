"""Training-data curation operators: PII scrubbing, benchmark
decontamination, and stratified sampling.

These are the corpus-hygiene stages a 100-TB training-data pipeline runs
after extraction/dedup and before packing; the reference engine stops at
crawl+extract (its pipeline ends at the WARC/store sink), so these are
additional first-class components per the task brief.

Shapes at scale:

- ``pii_scrub`` is a stateless vectorized ``map_batches`` pass (RE2
  kernels, zero shuffle) — identical regex semantics to the DuckDB
  oracle (both engines run RE2).
- ``decontaminate`` is the GPT-3-style n-gram decontamination check:
  the benchmark side's n-gram set is SMALL by construction (benchmarks
  are thousands of docs, not billions), so it is reduced with the
  sortless ``hash_reduce_small`` exchange and broadcast once via
  ``ray.put``; the training side is then a stateless per-batch probe.
  The corpus crosses the wire zero times.
- ``stratified_sample`` is combiner + tiny reduce: each batch keeps its
  LOCAL top-K per group (deterministic hash order), then one small
  per-group reduce picks the global top-K — no full-corpus shuffle, no
  skew exposure (a hot group costs K rows per block, not its full row
  count).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = [
    "pii_scrub",
    "decontaminate",
    "stratified_sample",
    "weighted_sample",
    "EMAIL_RE",
    "PHONE_RE",
    "IP_RE",
]

# RE2-only constructs (no lookaround) so pyarrow.compute and DuckDB —
# both RE2 — match byte-identically.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# trailing (?:[ \-]?\d{1,6})? : longer subscriber numbers ('+49 170
# 1234567') scrub FULLY instead of leaving residual digits (ADVICE r3);
# shared constant — the DuckDB oracle SQL embeds this same string, so
# engine/oracle parity is structural
PHONE_RE = r"\+\d{1,3}[ \-]\d{3}[ \-]\d{2,6}(?:[ \-]?\d{1,6})?"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(path: str, id_col: str = "url", text_col: str = "text") -> rd.Dataset:
    """(id, text_scrubbed, n_emails, n_phones, n_ips): every text with
    emails, international-format phone numbers and dotted-quad IPs
    replaced by ``<EMAIL>``/``<PHONE>``/``<IP>`` placeholders; counts are
    over the ORIGINAL text. Null text passes through as null (same as
    SQL ``regexp_replace(NULL, ...)``). Replacement order is
    email -> ip -> phone on both sides; the placeholder tokens cannot
    create new matches."""

    def _scrub(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        scrubbed = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
        scrubbed = pc.replace_substring_regex(scrubbed, IP_RE, "<IP>")
        scrubbed = pc.replace_substring_regex(scrubbed, PHONE_RE, "<PHONE>")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_scrubbed": scrubbed,
                "n_emails": pc.cast(
                    pc.count_substring_regex(text, EMAIL_RE), pa.int64()
                ),
                "n_phones": pc.cast(
                    pc.count_substring_regex(text, PHONE_RE), pa.int64()
                ),
                "n_ips": pc.cast(pc.count_substring_regex(text, IP_RE), pa.int64()),
            }
        )

    return rd.read_parquet(path, columns=[id_col, text_col]).map_batches(
        _scrub, batch_format="pyarrow"
    )


def _word_ngrams(text: pa.ChunkedArray | pa.Array, n: int):
    """Vectorized lowercased word n-grams: returns (grams, parents) where
    ``grams`` are space-joined n-word strings and ``parents`` the row index
    each gram came from. Tokenization is ``[a-z0-9]+`` runs of the lowered
    text (== DuckDB ``regexp_extract_all(lower(text), '[a-z0-9]+')``)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text), "[^a-z0-9]+", " "), " "
    )
    # empty docs would split to [""] — null them out so list_flatten skips
    norm = pc.if_else(pc.equal(norm, ""), pa.scalar(None, pa.string()), norm)
    split = pc.split_pattern(norm, " ")
    words = pc.list_flatten(split)
    parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    total = len(words)
    if total < n:
        return pa.array([], pa.string()), np.array([], dtype=np.int64)
    # an n-gram starts at every position whose n-th word is still in the
    # same document: join n shifted views element-wise (one vectorized op)
    shifted = [words.slice(k, total - n + 1) for k in range(n)]
    grams = pc.binary_join_element_wise(*shifted, " ")
    valid = parents[: total - n + 1] == parents[n - 1 :]
    return grams.filter(pa.array(valid)), parents[: total - n + 1][valid]


def decontaminate(
    docs_path: str, ngram: int = 8, bench_mod: int = 50
) -> rd.Dataset:
    """(doc_id, n_hits): training documents sharing at least one
    lowercased word-``ngram``-gram with the benchmark split, with the
    count of DISTINCT shared grams. The benchmark split is the
    deterministic ``doc_id % bench_mod == 0`` slice (standing in for a
    held-out eval set); benchmark docs themselves are excluded from the
    output. This is the GPT-3/PaLM n-gram decontamination check."""
    from .shuffle import hash_reduce_small

    def _bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(ids % bench_mod == 0))
        grams, _ = _word_ngrams(sel.column("text"), ngram)
        return pa.table({"g": grams.unique()})

    def _distinct(t: pa.Table) -> pa.Table:
        return t.group_by("g").aggregate([])

    bench = hash_reduce_small(
        rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
            _bench_grams, batch_format="pyarrow"
        ),
        ["g"],
        _distinct,
        num_partitions=8,
    )
    bench_ref = ray.put(
        bench.column("g").combine_chunks()
        if bench.num_columns
        else pa.array([], pa.string())
    )

    def _probe(batch: pa.Table) -> pa.Table:
        bench_set = ray.get(bench_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % bench_mod != 0))
        grams, parents = _word_ngrams(batch.column("text"), ngram)
        hit = pc.is_in(grams, value_set=bench_set)
        hits = pa.table(
            {
                "parent": pa.array(parents[hit.to_numpy(zero_copy_only=False)]),
                "g": grams.filter(hit),
            }
        )
        # a doc's grams all live in its own batch, so per-batch distinct
        # counting is exact
        agg = (
            hits.group_by(["parent", "g"])
            .aggregate([])
            .group_by("parent")
            .aggregate([("g", "count")])
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(agg.column("parent")),
                "n_hits": pc.cast(agg.column("g_count"), pa.int64()),
            }
        )

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _probe, batch_format="pyarrow"
    )


def _md5_low64(vals: list) -> np.ndarray:
    """Vectorized wrapper over the shared DuckDB-compatible hash
    (functions.hashing.md5_low64 — single point of truth for the
    cross-oracle byte layout)."""
    from ..functions.hashing import md5_low64

    return np.array([md5_low64(str(v)) for v in vals], dtype=np.uint64)


def weighted_sample(
    docs_path: str, cap_tokens: int = 500
) -> rd.Dataset:
    """(doc_id, n_tokens, keep): deterministic weighted subsample — every
    document is kept with probability ``min(1, n_tokens / cap_tokens)``,
    decided by its own hash (keep iff ``md5_low64(doc_id) * cap_tokens <
    n_tokens * 2**64``), so the sample is stable across runs, machines
    and partitionings (the corpus-mixing primitive: token-proportional
    downsampling without RNG state). All-integer comparison — exactly
    reproducible by the SQL oracle in UHUGEINT arithmetic. Stateless
    per-row kernel, no shuffle."""
    from ..functions.hashing import md5_low64

    from .text_analysis import WS_WORD_RE as _WORD_RE

    shift = 1 << 64

    def _sample(batch: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(batch.column("text"), _WORD_RE), pa.int64()
        )
        ids = batch.column("doc_id").to_pylist()
        toks = n_tok.to_pylist()
        # null text -> null n_tokens -> null keep (SQL NULL-comparison
        # semantics, matching the oracle)
        keep = [
            None if t is None else md5_low64(str(i)) * cap_tokens < t * shift
            for i, t in zip(ids, toks)
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n_tok,
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _sample, batch_format="pyarrow"
    )


def stratified_sample(
    docs_path: str, per_group: int = 20, group_col: str = "lang"
) -> rd.Dataset:
    """(doc_id, <group_col>, rk): a deterministic sample of ``per_group``
    documents per group — the ``per_group`` smallest
    ``(md5_low64(doc_id), doc_id)`` keys per group, ranked 1..K. Stable
    under any repartitioning and re-run (pure hash order, no RNG).

    Combiner + small reduce: each batch keeps its local top-K per group,
    the sortless hash exchange reduces K×blocks candidate rows per group
    to the global top-K — the corpus itself is never shuffled."""
    from .shuffle import hash_reduce_small

    # explicit schemas: empty partitions must not degrade string columns
    # to null type (pandas round-trip) or concat_tables fails
    cand_schema = pa.schema(
        [("doc_id", pa.int64()), (group_col, pa.string()), ("h", pa.uint64())]
    )
    out_schema = pa.schema(
        [("doc_id", pa.int64()), (group_col, pa.string()), ("rk", pa.int64())]
    )

    def _local_topk(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", group_col]).to_pandas()
        df["h"] = _md5_low64(df["doc_id"].tolist())
        df = df.sort_values(["h", "doc_id"], kind="mergesort")
        # dropna=False: a null group key is one more stratum (SQL GROUP BY
        # keeps the NULL group; default pandas groupby would drop its rows)
        df = df.groupby(group_col, sort=False, dropna=False).head(per_group)
        return pa.Table.from_pandas(df, schema=cand_schema, preserve_index=False)

    def _final_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["h", "doc_id"], kind="mergesort")
        df = df.groupby(group_col, sort=False, dropna=False).head(per_group)
        df["rk"] = (
            df.groupby(group_col, sort=False, dropna=False).cumcount() + 1
        ).astype("int64")
        return pa.Table.from_pandas(
            df[["doc_id", group_col, "rk"]], schema=out_schema, preserve_index=False
        )

    candidates = rd.read_parquet(
        docs_path, columns=["doc_id", group_col]
    ).map_batches(_local_topk, batch_format="pyarrow")
    out = hash_reduce_small(candidates, [group_col], _final_topk, num_partitions=4)
    if out.num_columns == 0:
        out = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                group_col: pa.array([], pa.string()),
                "rk": pa.array([], pa.int64()),
            }
        )
    return rd.from_arrow(out)
