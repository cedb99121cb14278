"""GDBR (GDPR-banner) removal stage (M18/T5) — actor-pool ``map_batches``.

The reference scores DOM subtrees with a per-language liblinear SVR over
TF-IDF of tokenized node text and removes the max-scoring subtree above a
threshold before link extraction (atra/src/gdbr/identifier.rs:80-759,
svm/src/classifier.rs). Our analog:

- per-language L2-loss epsilon-insensitive SVR over hashed TF-IDF
  (functions/gdbr_model.py — same model family as the reference's
  liblinear L2R_L2LOSS_SVR), trained offline by tools/train_gdbr.py;
  the weight registry loads ONCE per actor in ``__init__`` (the T5
  pattern), never per batch;
- scoring at DOM-SUBTREE granularity: a lightweight DOM builder
  (``_DomParser``) mirrors extract_html's text contract exactly (text
  nodes stripped at tag boundaries, script/style skipped, charrefs
  converted), so with no removal the emitted text is byte-identical to
  the extraction pipeline's; each element's subtree text is scored and
  the max-scoring subtree above threshold is removed (document-order
  first on ties — the ancestor of an equal-scoring child);
- ``GdbrStage`` is a callable CLASS for
  ``map_batches(GdbrStage, concurrency=N, batch_format="pyarrow")`` over
  (url, html) rows: it runs format detection + the M9 decode precedence,
  DOM-cleans HTML pages and passes non-HTML text through untouched.
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from ..functions.decoding import decode_bytes
from ..functions.gdbr_model import load_weights, score_text
from ..functions.langdetect import detect_language

__all__ = ["GdbrStage", "gdbr_clean", "clean_html_dom"]


class _DomNode:
    __slots__ = ("tag", "children", "parts")

    def __init__(self, tag: str):
        self.tag = tag
        self.children: list[_DomNode] = []
        self.parts: list[list[str]] = []  # shared one-element cells, doc order

    def subtree_parts(self) -> list[list[str]]:
        out = list(self.parts)
        for c in self.children:
            out.extend(c.subtree_parts())
        return out


_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
_SKIP_TEXT = {"script", "style"}


class _DomParser(HTMLParser):
    """Minimal DOM builder whose flattened text equals extract_html's
    ``text`` byte-for-byte (same flush-at-tag-boundary, strip, drop-empty
    contract)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _DomNode("#root")
        self._stack = [self.root]
        self._buf: list[str] = []
        self._skip = 0
        self.order: list[list[str]] = []  # every text cell in doc order

    def _flush(self):
        if self._buf:
            piece = "".join(self._buf).strip()
            self._buf.clear()
            if piece:
                cell = [piece]
                self._stack[-1].parts.append(cell)
                self.order.append(cell)

    def handle_data(self, data):
        if self._skip:
            return
        self._buf.append(data)

    def handle_starttag(self, tag, attrs):
        self._flush()
        if tag in _SKIP_TEXT:
            self._skip += 1
            return
        node = _DomNode(tag)
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_endtag(self, tag):
        self._flush()
        if tag in _SKIP_TEXT:
            self._skip = max(0, self._skip - 1)
            return
        # pop to the matching open tag (tolerant of mild misnesting)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_startendtag(self, tag, attrs):
        self._flush()
        if tag in _SKIP_TEXT:
            return
        self._stack[-1].children.append(_DomNode(tag))

    def close(self):
        super().close()
        self._flush()


def clean_html_dom(
    html: str,
    weights: tuple[np.ndarray, float, np.ndarray | None],
    threshold: float = 0.5,
    min_tokens: int = 5,
) -> tuple[str, float]:
    """-> (clean_text, max_subtree_score). Scores every element subtree
    (with at least ``min_tokens`` tokens) and removes the max-scoring one
    above ``threshold`` — the reference's identifier.rs removal rule at
    the same granularity. ``min_tokens`` guards against short generic
    fragments (titles, nav items) whose hashed-TF is too sparse to score
    meaningfully."""
    p = _DomParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        p._flush()
    w, b, idf = weights

    best_node, best_score = None, 0.0
    parent: dict[int, _DomNode] = {}
    node_score: dict[int, float] = {}

    def walk(node: _DomNode):
        nonlocal best_node, best_score
        for c in node.children:
            parent[id(c)] = node
            parts = c.subtree_parts()
            if parts:
                text = "\n".join(cell[0] for cell in parts)
                if len(text.split()) >= min_tokens:
                    s = score_text(text, w, b, idf)
                    node_score[id(c)] = s
                    if s > best_score:
                        best_node, best_score = c, s
            walk(c)

    walk(p.root)
    removed: set[int] = set()
    if best_node is not None and best_score >= threshold:
        # expand to the LARGEST enclosing subtree still above threshold
        # (remove the whole banner container, not just its hottest <p>;
        # prose-diluted ancestors like <body> fall below threshold and
        # stop the climb — a page that is mostly banner IS removed whole,
        # which is the reference's behavior for consent interstitials)
        node = best_node
        while True:
            par = parent.get(id(node))
            if par is None or node_score.get(id(par), 0.0) < threshold:
                break
            node = par
        removed = {id(cell) for cell in node.subtree_parts()}
    clean = "\n".join(cell[0] for cell in p.order if id(cell) not in removed)
    return clean, float(best_score)


class GdbrStage:
    """``ds.map_batches(GdbrStage, fn_constructor_kwargs={...},
    concurrency=N, batch_format="pyarrow")`` over (url, html) rows.
    Model registry loads once per actor (T5)."""

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold
        self.models = load_weights()  # once per actor
        self.fallback = self.models.get("*") or next(iter(self.models.values()))

    def _weights_for(self, lang: str):
        return self.models.get(lang, self.fallback)

    def clean_page(self, url: str, body: bytes | None) -> tuple[str | None, float, str]:
        """-> (clean_text, score, lang)."""
        from ..config import ExtractionConfig
        from ..functions.urlkit import Depth
        from ..stages.extract import extract_one

        fmt, enc, err, text, lang, _links = extract_one(
            url, body, Depth(0, 0, 0), ExtractionConfig()
        )
        if text is None:
            return None, 0.0, lang
        if fmt != "html":
            return text, 0.0, lang  # nothing to de-banner in non-HTML
        host = url.split("/")[2] if "://" in url else ""
        host = host.rsplit("@", 1)[-1].split(":", 1)[0]  # strip :port/userinfo
        tld = host.rsplit(".", 1)[-1] if "." in host else None
        decoded, _, _ = decode_bytes(bytes(body), True, tld)
        clean, score = clean_html_dom(
            decoded, self._weights_for(lang), self.threshold
        )
        if score >= self.threshold:
            # language of the CLEANED page (banner words no longer vote)
            lang = detect_language(clean)
            return clean, score, lang
        return text, score, lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        bodies = batch.column("html").to_pylist()
        texts, scores, langs = [], [], []
        for u, bdy in zip(urls, bodies):
            t, s, lg = self.clean_page(u, bdy)
            texts.append(t)
            scores.append(s)
            langs.append(lg)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text": pa.array(texts, pa.string()),
                "gdbr_score": pa.array(scores, pa.float64()),
                "lang": pa.array(langs, pa.string()),
            }
        )


def gdbr_clean(ds, threshold: float = 0.5, concurrency: int = 4):
    """Attach the GDBR actor-pool stage to a Dataset of (url, html)."""
    return ds.map_batches(
        GdbrStage,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
