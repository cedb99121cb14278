"""Corpus-level text cleaning and quality filters for training-data
pipelines: duplicated-line removal (CCNet/RefinedWeb-style boilerplate
stripping), per-document repetition signals, and Gopher-rule quality
flags.

Shapes at 100 TB:

- ``line_dedup_clean`` is the canonical heavy-hitter pattern: a per-batch
  COMBINER emits partial ``(line, n)`` counts (one row per distinct line
  per batch, never per occurrence), a low-cardinality partitioned groupby
  sums them, and only the lines over the frequency threshold — the
  boilerplate set, small by construction — are collected and broadcast
  via ``ray.put``. The second pass is a stateless ``map_batches`` filter
  against the broadcast set. Rows cross the wire once; the corpus never
  concentrates anywhere.
- ``page_repetition`` and ``gopher_quality`` are pure per-row kernels
  (no shuffle); everything countable is a vectorized RE2 kernel
  (``pyarrow.compute``), chosen to be bit-identical with the DuckDB SQL
  oracles in ``__ray_entry__`` (both engines run RE2).

Reference parity note: the reference engine has no corpus-level cleaning
stage (its GDBR filter ``atra/src/gdbr/`` is per-page); these operators
are the additional LLM-training-data components the task brief asks for
beyond reference coverage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = [
    "line_dedup_clean",
    "page_repetition",
    "gopher_quality",
]

_WS_CLASS = r"[ \t\n\r\f]"
_WORD_RE = r"[^ \t\n\r\f]+"
# a maximal non-whitespace run containing at least one ASCII letter; used
# subtractively (strip alpha words, count what remains) because RE2 has no
# lookahead to anchor "word with NO letter" directly
_ALPHA_WORD_RE = r"[^ \t\n\r\f]*[A-Za-z][^ \t\n\r\f]*"


# ---------------------------------------------------------------------------
# corpus-level duplicated-line removal
# ---------------------------------------------------------------------------


def line_dedup_clean(
    pages_path: str, max_freq: int = 5, num_partitions: int = 16
) -> rd.Dataset:
    """(url, text_clean): every document's text with lines whose CORPUS-WIDE
    occurrence count exceeds ``max_freq`` removed (exact string match,
    whitespace-only lines never counted or dropped). Documents whose lines
    are all dropped disappear from the output; documents with null text are
    excluded up front.

    This is the cross-document boilerplate strip of a CCNet-style pipeline
    (nav bars, cookie banners, footers repeat across a site; prose does
    not). Two passes over the stored extracted text:

    1. combiner ``map_batches`` -> partial (line, n) counts,
       ``partitioned_map_groups`` sum, filter ``n > max_freq``. The
       surviving heavy-hitter set is tiny (it's the boilerplate), so
       collecting it to the driver and ``ray.put``-broadcasting it is the
       at-scale move — the alternative (a line-keyed anti-join) would
       shuffle the full corpus a second time.
    2. stateless filter ``map_batches`` against the broadcast frozenset.
    """
    import pandas as pd

    from .shuffle import partitioned_map_groups

    def _partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            counts.update(ln for ln in t.split("\n") if ln.strip())
        return pa.table(
            {
                "ln": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("ln", as_index=False, sort=False)["n"].sum()
        return out[out["n"] > max_freq]

    heavy = partitioned_map_groups(
        rd.read_parquet(pages_path, columns=["text"]).map_batches(
            _partial, batch_format="pyarrow"
        ),
        ["ln"],
        _sum,
        num_partitions=num_partitions,
    ).take_all()  # heavy-hitter lines only — bounded by boilerplate volume
    drop_ref = ray.put(frozenset(r["ln"] for r in heavy))
    docs = rd.read_parquet(pages_path, columns=["url", "text"])

    def _strip(batch: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        urls, cleaned = [], []
        for url, t in zip(
            batch.column("url").to_pylist(), batch.column("text").to_pylist()
        ):
            if t is None:
                continue
            kept = [ln for ln in t.split("\n") if ln not in drop]
            if kept:
                urls.append(url)
                cleaned.append("\n".join(kept))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text_clean": pa.array(cleaned, pa.string()),
            }
        )

    return docs.map_batches(_strip, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-document repetition signals
# ---------------------------------------------------------------------------


def page_repetition(pages_path: str) -> rd.Dataset:
    """(url, n_lines, n_distinct_lines, dup_line_frac, dup_line_char_frac)
    over every document with at least one non-whitespace line — the Gopher
    repetition signals (duplicate-line fraction and the fraction of
    characters inside duplicated lines). Pure per-row kernel, no shuffle;
    a downstream filter drops docs over a threshold."""

    def _rep(batch: pa.Table) -> pa.Table:
        from collections import Counter

        urls, n_l, n_d, frac, cfrac = [], [], [], [], []
        for url, t in zip(
            batch.column("url").to_pylist(), batch.column("text").to_pylist()
        ):
            if t is None:
                continue
            lines = [ln for ln in t.split("\n") if ln.strip()]
            if not lines:
                continue
            counts = Counter(lines)
            n_lines = len(lines)
            n_distinct = len(counts)
            chars_all = sum(len(ln) for ln in lines)
            chars_distinct = sum(len(ln) for ln in counts)
            urls.append(url)
            n_l.append(n_lines)
            n_d.append(n_distinct)
            frac.append((n_lines - n_distinct) / n_lines)
            cfrac.append((chars_all - chars_distinct) / chars_all)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "n_lines": pa.array(n_l, pa.int64()),
                "n_distinct_lines": pa.array(n_d, pa.int64()),
                "dup_line_frac": pa.array(frac, pa.float64()),
                "dup_line_char_frac": pa.array(cfrac, pa.float64()),
            }
        )

    return rd.read_parquet(pages_path, columns=["url", "text"]).map_batches(
        _rep, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Gopher-rule quality flags
# ---------------------------------------------------------------------------


def gopher_quality(
    docs_path: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
) -> rd.Dataset:
    """(doc_id, n_words, mean_word_len, frac_alpha_words, passes): the
    Gopher quality-filter rules (word-count bounds, mean-word-length
    bounds, fraction of words containing an alphabetic character). Fully
    vectorized RE2 kernels — the letterless-word count is computed
    subtractively (strip every word containing a letter, count the
    remaining words) because RE2 lacks the lookahead to match them
    directly."""

    def _gopher(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = pc.cast(pc.count_substring_regex(text, _WORD_RE), pa.int64())
        denom = pc.cast(pc.max_element_wise(n_words, 1), pa.float64())
        no_alpha = pc.replace_substring_regex(text, _ALPHA_WORD_RE, "")
        n_letterless = pc.cast(
            pc.count_substring_regex(no_alpha, _WORD_RE), pa.int64()
        )
        n_alpha = pc.subtract(n_words, n_letterless)
        chars_no_ws = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(text, _WS_CLASS + "+", "")),
            pa.float64(),
        )
        mean_len = pc.divide(chars_no_ws, denom)
        alpha_frac = pc.divide(pc.cast(n_alpha, pa.float64()), denom)
        passes = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(n_words, min_words),
                    pc.less_equal(n_words, max_words),
                ),
                pc.and_(
                    pc.greater_equal(mean_len, min_mean_word_len),
                    pc.less_equal(mean_len, max_mean_word_len),
                ),
            ),
            pc.greater_equal(alpha_frac, min_alpha_frac),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": n_words,
                "mean_word_len": mean_len,
                "frac_alpha_words": alpha_frac,
                "passes": passes,
            }
        )

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _gopher, batch_format="pyarrow"
    )
