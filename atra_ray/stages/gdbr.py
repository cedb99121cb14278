"""GDBR (GDPR-banner) removal stage (M18) — actor-pool ``map_batches``.

The reference scores DOM subtrees with a per-language liblinear SVR over
TF-IDF of tokenized node text and removes the max-scoring subtree above a
threshold before link extraction (atra/src/gdbr/identifier.rs:80-759,
svm/src/classifier.rs). liblinear and the trained models are not available
in this container, so the MODEL is a clearly-marked deterministic stand-in
(keyword-weight linear scorer); everything Ray-side is real and tested:

- callable CLASS for ``map_batches(GdbrStage, concurrency=N)`` — the model
  table loads ONCE per actor in ``__init__`` (the T5 pattern), never per
  batch;
- segment scoring + max-segment removal semantics mirror the reference's
  subtree logic at paragraph granularity;
- output adds ``gdbr_score`` and returns the cleaned text column.

Swap ``_load_model`` for a real weight file to productionize.
"""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["GdbrStage", "gdbr_clean"]

_SEGMENT_RE = re.compile(r"\n\s*\n")  # paragraph segmentation


def _load_model(lang: str) -> dict[str, float]:
    """Deterministic stand-in for the per-language SVR weights. A real
    deployment loads liblinear weights per language here (once per actor)."""
    base = {
        "cookie": 2.0, "cookies": 2.0, "consent": 2.0, "gdpr": 3.0,
        "privacy": 1.0, "accept": 1.0, "agree": 1.0, "tracking": 1.0,
    }
    if lang == "deu":
        base.update({"zustimmen": 2.0, "datenschutz": 2.0, "akzeptieren": 2.0})
    if lang == "fra":
        base.update({"accepter": 2.0, "confidentialité": 2.0})
    return base


def _score(segment: str, weights: dict[str, float]) -> float:
    toks = segment.lower().split()
    if not toks:
        return 0.0
    return sum(weights.get(t.strip(".,!?;:"), 0.0) for t in toks) / len(toks)


class GdbrStage:
    """``ds.map_batches(GdbrStage, fn_constructor_kwargs={...},
    concurrency=N, batch_format="pyarrow")`` over (text, lang) columns."""

    def __init__(self, threshold: float = 0.5, langs: tuple[str, ...] = ("eng", "deu", "fra")):
        # once per actor: the whole model registry (T5)
        self.threshold = threshold
        self.models = {lang: _load_model(lang) for lang in langs}
        self.default = _load_model("eng")

    def clean_one(self, text: str | None, lang: str) -> tuple[str | None, float]:
        if not text:
            return text, 0.0
        weights = self.models.get(lang, self.default)
        segments = _SEGMENT_RE.split(text)
        if len(segments) < 2:
            s = _score(text, weights)
            return (None, s) if s >= self.threshold else (text, s)
        scores = [_score(s, weights) for s in segments]
        mx = max(scores)
        if mx >= self.threshold:
            keep = [s for s, sc in zip(segments, scores) if sc < mx]
            return "\n\n".join(keep), mx
        return text, mx

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else ["eng"] * len(texts)
        )
        cleaned, scores = [], []
        for t, lg in zip(texts, langs):
            c, s = self.clean_one(t, lg)
            cleaned.append(c)
            scores.append(s)
        out = {name: batch.column(name) for name in batch.column_names}
        out["text"] = pa.array(cleaned, pa.string())
        out["gdbr_score"] = pa.array(scores, pa.float64())
        return pa.table(out)


def gdbr_clean(ds, threshold: float = 0.5, concurrency: int = 4):
    """Attach the GDBR actor-pool stage to a Dataset with (text, lang)."""
    return ds.map_batches(
        GdbrStage,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
