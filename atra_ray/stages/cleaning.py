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

from .text_analysis import WS_WORD_RE as _WORD_RE  # shared token class

__all__ = [
    "line_dedup_clean",
    "page_repetition",
    "gopher_quality",
]

_WS_CLASS = r"[ \t\n\r\f]"
# explicit ASCII class for "whitespace-only line" so the engine and the
# DuckDB oracles classify identically (utf8_trim_whitespace strips Unicode
# whitespace; DuckDB trim() strips spaces only — both diverge on "\t")
_LINE_WS = " \t\r\f\v"
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
    from .shuffle import hash_reduce_small

    def _partial(batch: pa.Table) -> pa.Table:
        # vectorized: split every doc into lines, flatten, drop
        # whitespace-only lines, then one Arrow hash-aggregate per batch
        lines = pc.list_flatten(
            pc.split_pattern(pc.drop_null(batch.column("text")), "\n")
        )
        lines = lines.filter(pc.not_equal(pc.utf8_trim(lines, _LINE_WS), ""))
        g = pa.table({"ln": lines}).group_by("ln").aggregate([("ln", "count")])
        return pa.table(
            {"ln": g.column("ln"), "n": pc.cast(g.column("ln_count"), pa.int64())}
        )

    def _combine(t: pa.Table) -> pa.Table:
        # associative partial sum (NO threshold — that's only valid on the
        # final total), used at intermediate tree-combine levels
        g = t.group_by("ln").aggregate([("n", "sum")])
        return pa.table(
            {"ln": g.column("ln"), "n": pc.cast(g.column("n_sum"), pa.int64())}
        )

    def _sum(t: pa.Table) -> pa.Table:
        g = t.group_by("ln").aggregate([("n", "sum")])
        return g.filter(pc.greater(g.column("n_sum"), max_freq)).select(["ln"])

    heavy = hash_reduce_small(
        rd.read_parquet(pages_path, columns=["text"]).map_batches(
            _partial, batch_format="pyarrow"
        ),
        ["ln"],
        _sum,
        num_partitions=num_partitions,
        combine_fn=_combine,
    )  # heavy-hitter lines only — bounded by boilerplate volume
    drop_ref = ray.put(
        heavy.column("ln").combine_chunks()
        if heavy.num_columns
        else pa.array([], pa.string())
    )
    docs = rd.read_parquet(pages_path, columns=["url", "text"])

    def _strip(batch: pa.Table) -> pa.Table:
        import numpy as np

        drop = ray.get(drop_ref)
        batch = batch.filter(pc.is_valid(batch.column("text")))
        text = batch.column("text").combine_chunks()
        split = pc.split_pattern(text, "\n")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split)
        keep = pc.invert(pc.is_in(flat, value_set=drop))
        flat_k = flat.filter(keep)
        # rebuild per-doc line lists from the surviving (line, parent)
        # pairs: parent indices are monotone, so kept-line counts per doc
        # give the new list offsets directly
        counts = np.bincount(
            parents.filter(keep).to_numpy(zero_copy_only=False),
            minlength=len(batch),
        )
        offsets = np.zeros(len(batch) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat_k),
            "\n",
        )
        doc_keep = counts > 0  # docs losing every line vanish
        return pa.table(
            {
                "url": batch.column("url").filter(pa.array(doc_keep)),
                "text_clean": pc.cast(joined.filter(pa.array(doc_keep)), pa.string()),
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
        # vectorized: explode (doc, line) pairs, drop whitespace-only
        # lines, two Arrow hash-aggregates — (doc, line) then (doc) —
        # give occurrence counts and distinct-line stats per doc
        batch = batch.filter(pc.is_valid(batch.column("text")))
        split = pc.split_pattern(batch.column("text").combine_chunks(), "\n")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split)
        mask = pc.not_equal(pc.utf8_trim(flat, _LINE_WS), "")
        flat = flat.filter(mask)
        per_line = (
            pa.table(
                {
                    "doc": parents.filter(mask),
                    "chars": pc.cast(pc.utf8_length(flat), pa.int64()),
                    "ln": flat,
                }
            )
            .group_by(["doc", "ln"])
            .aggregate([("ln", "count"), ("chars", "max")])
        )
        per_doc = (
            pa.table(
                {
                    "doc": per_line.column("doc"),
                    "occ": per_line.column("ln_count"),
                    # chars of this distinct line, and chars over all its
                    # occurrences
                    "chars_distinct": per_line.column("chars_max"),
                    "chars_all": pc.multiply(
                        per_line.column("chars_max"),
                        pc.cast(per_line.column("ln_count"), pa.int64()),
                    ),
                }
            )
            .group_by("doc")
            .aggregate(
                [
                    ("occ", "sum"),
                    ("occ", "count"),
                    ("chars_all", "sum"),
                    ("chars_distinct", "sum"),
                ]
            )
            .sort_by("doc")
        )
        n_lines = pc.cast(per_doc.column("occ_sum"), pa.int64())
        n_distinct = pc.cast(per_doc.column("occ_count"), pa.int64())
        chars_all = pc.cast(per_doc.column("chars_all_sum"), pa.float64())
        chars_distinct = pc.cast(per_doc.column("chars_distinct_sum"), pa.float64())
        n_lines_f = pc.cast(n_lines, pa.float64())
        return pa.table(
            {
                "url": batch.column("url").take(per_doc.column("doc")),
                "n_lines": n_lines,
                "n_distinct_lines": n_distinct,
                "dup_line_frac": pc.divide(
                    pc.cast(pc.subtract(n_lines, n_distinct), pa.float64()),
                    n_lines_f,
                ),
                "dup_line_char_frac": pc.divide(
                    pc.subtract(chars_all, chars_distinct), chars_all
                ),
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
