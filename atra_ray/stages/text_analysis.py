"""Text-analysis operators for large-scale training-data pipelines:
quality counts, token counting, document fingerprinting, language id.

All kernels are vectorized (pyarrow.compute RE2 kernels / hashlib over a
batch) and run as stateless ``map_batches`` tasks — they scale linearly and
shuffle nothing. Regex classes are chosen to be bit-identical between RE2
(pyarrow + DuckDB both use RE2) and the SQL oracles in __ray_entry__.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = [
    "doc_quality",
    "doc_fingerprints",
    "doc_language",
    "hashed_doc_frequency",
    "lang_distribution",
    "term_doc_freq",
    "token_counts",
    "TOKEN_RE",
    "WS_WORD_RE",
    "STOPWORD_RE",
    "BPE_TOKEN_RE",
]

TOKEN_RE = r"[A-Za-z0-9]+"
# the whitespace-delimited word regex shared by gopher_quality,
# pack_sequences and weighted_sample AND their SQL oracles — single point
# of truth (a change here must be mirrored in every oracle string)
WS_WORD_RE = r"[^ \t\n\r\f]+"
# \b word-bounded high-frequency English function words (subset of
# functions/langdetect.py's list — kept short so the SQL mirror stays legible)
_STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "for", "on", "with", "as", "a")
STOPWORD_RE = r"\b(" + "|".join(_STOPWORDS) + r")\b"
PUNCT_RE = r"[.,;:!?]"
_WS_RE = re.compile(r"[ \t\n\r\f]+")  # matches RE2/DuckDB '\s' semantics


def doc_quality(docs_path: str) -> rd.Dataset:
    """doc_id, n_chars, n_tokens, n_stopwords, n_punct, stop_ratio —
    the counting backbone of a quality-scoring stage (length/punct/stopword
    ratios)."""

    def _stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        lower = pc.utf8_lower(text)
        n_tokens = pc.count_substring_regex(text, TOKEN_RE)
        n_stop = pc.count_substring_regex(lower, STOPWORD_RE)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_stopwords": pc.cast(n_stop, pa.int64()),
                "n_punct": pc.cast(
                    pc.count_substring_regex(text, PUNCT_RE), pa.int64()
                ),
                "stop_ratio": pc.divide(
                    pc.cast(n_stop, pa.float64()),
                    pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
                ),
            }
        )

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _stats, batch_format="pyarrow"
    )


def fingerprint_text(text: str) -> str:
    """md5 of the whitespace-collapsed, lowercased text — deterministic
    document identity for exact dedup across storage systems. Mirrors
    DuckDB `md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))`."""
    norm = _WS_RE.sub(" ", text.lower())
    return hashlib.md5(norm.encode("utf-8")).hexdigest()


def doc_fingerprints(docs_path: str) -> rd.Dataset:
    """doc_id, fp (md5 hex of normalized text)."""

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [fingerprint_text(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, pa.string())}
        )

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _fp, batch_format="pyarrow"
    )


# GPT-2-style pre-tokenizer classes, RE2-compatible (no \p{L} shorthand
# differences between pyarrow and DuckDB): word pieces with leading space,
# digit runs, punctuation runs — the unit a BPE tokenizer would split on
BPE_TOKEN_RE = r" ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9 \t\n\r\f]+"


def token_counts(docs_path: str) -> rd.Dataset:
    """doc_id, n_ws_tokens (whitespace split), n_bpe_tokens (BPE-ish
    pre-token count) — the token-budget accounting stage of a training-data
    pipeline. Vectorized RE2 kernels; no shuffle."""

    def _counts(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(text, r"[^ \t\n\r\f]+"), pa.int64()
                ),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(text, BPE_TOKEN_RE), pa.int64()
                ),
            }
        )

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _counts, batch_format="pyarrow"
    )


def doc_language(docs_path: str) -> rd.Dataset:
    """doc_id, detected_lang — the M17 language-id stage over the documents
    table (heuristic detector; compare against the table's own `lang`
    column for accuracy measurement, not equality)."""
    from ..functions.langdetect import detect_language

    def _lang(batch: pa.Table) -> pa.Table:
        langs = [detect_language(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "detected_lang": pa.array(langs, pa.string()),
            }
        )

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _lang, batch_format="pyarrow"
    )


def term_doc_freq(docs_path: str, min_df: int = 2) -> rd.Dataset:
    """term, df — corpus document-frequency statistics (the A6 TF-IDF
    corpus pass, reference ``text_processing/src/tf_idf.rs``): for each
    lowercase ASCII-letter token, the number of documents containing it.

    At-scale shape: the per-batch map emits PARTIAL (term, df) counts
    (each doc's distinct terms counted once — a combiner), so the exchange
    carries one row per (batch, term), not per token; the per-term sum
    runs inside a low-cardinality partitioned groupby
    (``partitioned_map_groups``), never a per-key native combine."""
    import pandas as pd

    from .shuffle import partitioned_map_groups

    term_re = re.compile(r"[a-z]+")

    def _partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counts.update(set(term_re.findall(t.lower())) if t else ())
        return pa.table(
            {
                "term": pa.array(list(counts.keys()), pa.string()),
                "df": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", as_index=False, sort=False)["df"].sum()
        return out[out["df"] >= min_df]

    ds = rd.read_parquet(docs_path, columns=["text"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    return partitioned_map_groups(ds, ["term"], _sum, num_partitions=16)


def hashed_doc_frequency(docs_path: str, text_col: str = "text") -> "tuple":
    """-> (df_vector: np.ndarray[FEATURE_DIM], n_docs: int): document
    frequency in the GDBR model's hashed feature space
    (functions/gdbr_model.featurize), computed distributed: each batch
    emits ONE fixed-size partial vector (FEATURE_DIM int64) regardless of
    batch size, and the driver sums the ~n_blocks tiny partials — the
    vector-combiner form of the ``groupby(term).count()`` DF pass, with
    shuffle bytes independent of corpus size. Feeds tools/train_gdbr.py
    (A6 / VERDICT r2 item 10)."""
    import numpy as np

    from ..functions.gdbr_model import FEATURE_DIM, hashed_term_set

    def _partial(batch: pa.Table) -> pa.Table:
        vec = np.zeros(FEATURE_DIM, dtype=np.int64)
        n = 0
        for t in batch.column(text_col).to_pylist():
            if not t:
                continue
            n += 1
            for idx in hashed_term_set(t):
                vec[idx] += 1
        return pa.table(
            {"df": pa.array([vec.tolist()]), "n_docs": pa.array([n], pa.int64())}
        )

    parts = (
        rd.read_parquet(docs_path, columns=[text_col])
        .map_batches(_partial, batch_format="pyarrow")
        .take_all()
    )  # one tiny row per input block — safe to collect
    df_vec = np.zeros(FEATURE_DIM, dtype=np.int64)
    n_docs = 0
    for row in parts:
        df_vec += np.asarray(row["df"], dtype=np.int64)
        n_docs += int(row["n_docs"])
    return df_vec, n_docs


def lang_distribution(docs_path: str) -> rd.Dataset:
    """lang, n — grouped count (the A4-style aggregate as a shuffle)."""
    return (
        rd.read_parquet(docs_path, columns=["lang"])
        .groupby("lang")
        .count()
        .rename_columns(["lang", "n"])
    )
