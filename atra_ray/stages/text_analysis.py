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
    "tfidf_topk",
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
# Per-language stopword lists — compact vendored subsets of the public
# ISO-639 stopword inventories (the reference vendors full lists in its
# iso_stopwords crate, /root/reference/iso_stopwords/src/lib.rs; these
# are the highest-frequency function words of each list). Keyed by the
# documents table's ISO 639-1 `lang` codes.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "on",
           "with", "as", "a", "it", "was", "at", "by", "this", "be"),
    "es": ("de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
           "las", "por", "un", "para", "con", "no", "una", "su"),
    "de": ("der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "ist", "im", "dem", "nicht", "ein", "als"),
    "fr": ("de", "la", "le", "et", "les", "des", "en", "un", "du", "une",
           "que", "est", "dans", "qui", "par", "pour", "sur", "au"),
    # zh function words are not \b-delimited (RE2's \b is an ASCII word
    # boundary and CJK codepoints are non-word chars, so \b(的)\b can
    # never match) — counted as plain substring occurrences instead
    "zh": ("的", "了", "是", "在", "和", "有", "我", "不", "这", "们",
           "他", "上", "就", "也", "都", "个"),
}
_NO_WORD_BOUNDARY = {"zh"}


def lang_stopword_re(lang: str) -> str:
    """RE2 pattern counting ``lang``'s stopwords (English fallback for
    unknown codes). Shared verbatim with the SQL oracle — both pyarrow
    and DuckDB run RE2, so counts are bit-identical."""
    words = LANG_STOPWORDS.get(lang, LANG_STOPWORDS["en"])
    alt = "(" + "|".join(words) + ")"
    if lang in _NO_WORD_BOUNDARY:
        return alt
    return r"\b" + alt + r"\b"


# legacy single-language export (the English list) — kept for callers
# that count stopwords on text with no language column
STOPWORD_RE = lang_stopword_re("en")
PUNCT_RE = r"[.,;:!?]"
_WS_RE = re.compile(r"[ \t\n\r\f]+")  # matches RE2/DuckDB '\s' semantics


def doc_quality(docs_path: str) -> rd.Dataset:
    """doc_id, n_chars, n_tokens, n_stopwords, n_punct, stop_ratio —
    the counting backbone of a quality-scoring stage (length/punct/stopword
    ratios). Stopword counting is keyed by the document's ``lang`` column
    (per-language vendored lists, English fallback; a corpus with no lang
    column counts everything as English) — multilingual corpora would
    otherwise underweight every non-English page. Each batch groups rows
    by the <=5 languages present and runs ONE vectorized RE2 pass per
    language over that slice (never per row)."""
    import numpy as np
    import pyarrow.parquet as pqt

    try:
        has_lang = "lang" in pqt.ParquetDataset(docs_path).schema.names
    except (OSError, ValueError):  # pragma: no cover - odd layouts
        has_lang = False
    cols = ["doc_id", "text"] + (["lang"] if has_lang else [])

    def _stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        lower = pc.utf8_lower(text)
        n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
        if has_lang:
            langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
            langs[langs == None] = "en"  # noqa: E711 - element-wise None test
        else:
            langs = np.full(len(batch), "en", dtype=object)
        n_stop = np.zeros(len(batch), dtype=np.int64)
        for lg in np.unique(langs):
            m = langs == lg
            sub = lower if m.all() else lower.filter(pa.array(m))
            c = pc.count_substring_regex(sub, lang_stopword_re(str(lg)))
            # fill_null before the numpy copy (a null count would cast to
            # INT64_MIN garbage); the text-null mask below restores NULL
            n_stop[m] = np.asarray(c.cast(pa.int64()).fill_null(0))
        # NULL text -> NULL counts/ratio, mirroring SQL's NULL propagation
        null_mask = np.asarray(pc.is_null(text))
        n_stop_arr = pa.array(n_stop, pa.int64(), mask=null_mask)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_tokens": n_tokens,
                "n_stopwords": n_stop_arr,
                "n_punct": pc.cast(
                    pc.count_substring_regex(text, PUNCT_RE), pa.int64()
                ),
                "stop_ratio": pc.divide(
                    pc.cast(n_stop_arr, pa.float64()),
                    pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
                ),
            }
        )

    return rd.read_parquet(docs_path, columns=cols).map_batches(
        _stats, batch_format="pyarrow"
    )


def fingerprint_text(text: str | None) -> str | None:
    """md5 of the whitespace-collapsed, lowercased text — deterministic
    document identity for exact dedup across storage systems. Mirrors
    DuckDB `md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))` —
    including NULL in, NULL out."""
    if text is None:
        return None
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
    """lang, n — grouped count (the A4-style aggregate). Batches collapse
    to per-lang partials (a combiner) and merge through the sortless hash
    reduce — Ray's native sort-based groupby would both shuffle full rows
    and CRASH on a null lang key (None is not orderable against str);
    here a null lang is one more group, mirroring SQL GROUP BY."""
    from .shuffle import hash_reduce_small

    schema = pa.schema([("lang", pa.string()), ("n", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["lang", "n"]).cast(schema)

    def _merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang"], use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["lang", "n"]).cast(schema)

    out = hash_reduce_small(
        rd.read_parquet(docs_path, columns=["lang"]).map_batches(
            _partial, batch_format="pyarrow"
        ),
        ["lang"],
        _merge,
        num_partitions=4,
        combine_fn=_merge,
    )
    return rd.from_arrow(out)


def tfidf_topk(
    docs_path: str,
    query_terms: tuple[str, ...] = ("data", "hash", "join"),
    k: int = 10,
    scale: int = 10**6,
) -> pa.Table:
    """Top-k document retrieval by FIXED-POINT TF-IDF relevance:
    ``score_fp = Σ_t (tf_{t,doc} * scale * N) // df_t`` over the query
    terms (idf as the exact rational N/df_t, floor-scaled per term —
    integer sums are accumulation-order-independent, so the ranking is
    bit-identical under any partitioning and SQL-oracle-certifiable; a
    float ln()-idf BM25 would differ in last ulps between libms).
    Token contract is the corpus-wide one (``[a-z]+`` on lowered text —
    ``term_doc_freq`` and its SQL twin use the same class).

    Scale shape: pass 1 computes df for the |Q| query terms plus N with a
    per-batch combiner through ``hash_reduce_small`` (driver sees |Q|+1
    integers); pass 2 re-scans docs with the tiny (df, N) broadcast in
    the closure, scores each batch, keeps a LOCAL top-k per block, and a
    single small reduce merges the ≤ blocks×k candidate rows — the
    full score column never leaves the workers, nothing global sorts.

    Returns (doc_id, score_fp, rank) for the k highest-scoring docs with
    score_fp > 0, ties broken by doc_id ascending. Materialized (k rows).
    """
    import pandas as pd

    from .shuffle import hash_reduce_small

    term_re = re.compile(r"[a-z]+")
    qset = set(query_terms)

    def _stats_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        n = 0
        for t in batch.column("text").to_pylist():
            n += 1  # N counts every document row, null text included
            if t:
                counts.update(qset.intersection(term_re.findall(t.lower())))
        terms = list(counts.keys()) + [""]  # "" can't collide with [a-z]+
        vals = [counts[t] for t in counts] + [n]
        return pa.table(
            {"term": pa.array(terms, pa.string()), "c": pa.array(vals, pa.int64())}
        )

    _stats_schema = pa.schema([("term", pa.string()), ("c", pa.int64())])

    def _stats_sum(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("term", as_index=False, sort=False)["c"].sum()
        # explicit schema: an empty partition would otherwise infer
        # term: null and poison the driver-side concat
        return pa.Table.from_pandas(df, schema=_stats_schema, preserve_index=False)

    stats = hash_reduce_small(
        rd.read_parquet(docs_path, columns=["text"]).map_batches(
            _stats_partial, batch_format="pyarrow"
        ),
        ["term"],
        _stats_sum,
        num_partitions=4,
        combine_fn=_stats_sum,
    )
    d = dict(zip(stats.column("term").to_pylist(), stats.column("c").to_pylist()))
    n_docs = int(d.pop("", 0))
    df_of = {t: int(v) for t, v in d.items() if v > 0}
    if not df_of or n_docs == 0 or k < 1:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "score_fp": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )

    def _score_topk(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_pylist()
        out_ids, out_scores = [], []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            if not t:
                continue
            tf = Counter(w for w in term_re.findall(t.lower()) if w in df_of)
            if not tf:
                continue
            s = sum((c * scale * n_docs) // df_of[w] for w, c in tf.items())
            if s > 0:
                out_ids.append(i)
                out_scores.append(s)
        part = pd.DataFrame({"doc_id": out_ids, "score_fp": out_scores})
        part = part.sort_values(
            ["score_fp", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa.table(
            {
                "doc_id": pa.array(part["doc_id"].tolist(), pa.int64()),
                "score_fp": pa.array(part["score_fp"].tolist(), pa.int64()),
            }
        )

    def _merge_topk(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .sort_values(["score_fp", "doc_id"], ascending=[False, True], kind="stable")
            .head(k)
            .reset_index(drop=True)
        )
        df["rank"] = pd.RangeIndex(1, len(df) + 1).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    candidates = rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _score_topk, batch_format="pyarrow"
    )

    def _const_key(t: pa.Table) -> pa.Table:
        return t.append_column("_k", pa.array([0] * t.num_rows, pa.int64()))

    merged = hash_reduce_small(
        candidates.map_batches(_const_key, batch_format="pyarrow"),
        ["_k"],
        lambda t: _merge_topk(t.drop_columns(["_k"])),
        num_partitions=2,  # constant key -> one live partition (min is 2)
        combine_fn=lambda t: _topk_combine(t, k),
    )
    return merged


def _topk_combine(t: pa.Table, k: int) -> pa.Table:
    """Associative tree-combine for the top-k funnel: keep the k best
    (score desc, doc_id asc) rows of an intermediate concat."""
    df = (
        t.to_pandas()
        .sort_values(["score_fp", "doc_id"], ascending=[False, True], kind="stable")
        .head(k)
    )
    return pa.Table.from_pandas(df, preserve_index=False)
