"""HTML link + text extraction (SURVEY.md M10) in one parse per document.

Link semantics mirror atra/src/extraction/html.rs:38-166 and its selector
table (html.rs:239-256):

- ``meta[name="robots"][content="nofollow"]`` with respect_nofollow on
  -> the page yields no links at all (html.rs:75-80)
- the first ``<base href>`` rebases all relative links (html.rs:82-105)
- HREF holders ``a, area, link`` (skipped when ``rel="nofollow"`` exactly,
  with respect_nofollow on)                       -> origin "href"
- SRC holders ``audio embed iframe img input source track video``
  (when crawl_embedded_data)                      -> origin "embedded"
- ``form[action]`` (when crawl_forms)            -> origin "form"
- ``script src``                                  -> origin "javascript"
  else the inline script body is token-scanned   -> origin "javascript_embedded"
  (when crawl_javascript)
- any element with ``onclick`` matched against
  ``location.href='…'`` (when crawl_onclick_by_heuristic) -> origin "onclick"

Text extraction contract (the north rule's byte-identical column): the
concatenation of all non-script/non-style text nodes, each stripped of
leading/trailing whitespace, empties dropped, joined with "\n". This is the
columnar analog of the reference's ``Html::root_element().text()`` collection
(atra/src/toolkit/language_detection.rs:131-137) with a defined whitespace
normalization so both the generator oracle and the engine agree on the exact
bytes. Built on the stdlib html.parser (no lxml/selectolax in this env).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .extract_js import extract_js_links

__all__ = ["HtmlExtraction", "extract_html", "ORIGIN_KINDS"]

ORIGIN_KINDS = (
    "href", "embedded", "form", "javascript", "javascript_embedded", "onclick"
)

_HREF_HOLDERS = {"a", "area", "link"}
_SRC_HOLDERS = {"audio", "embed", "iframe", "img", "input", "source", "track", "video"}
_SKIP_TEXT = {"script", "style"}

# atra/src/extraction/html.rs:246 — location.href='…' heuristic
_HREF_LOCATION_RE = re.compile(r"location\s*\.\s*href\s*=\s*'\s*([^']*)\s*'\s*;?")


@dataclass
class HtmlExtraction:
    base_href: str | None = None
    nofollow_page: bool = False
    links: set[tuple[str, str]] = field(default_factory=set)  # (origin, raw)
    text_parts: list[str] = field(default_factory=list)
    title: str | None = None

    @property
    def text(self) -> str:
        return "\n".join(self.text_parts)


class _Parser(HTMLParser):
    def __init__(self, cfg):
        super().__init__(convert_charrefs=True)
        self.cfg = cfg
        self.out = HtmlExtraction()
        self._text_buf: list[str] = []
        self._skip_depth = 0
        self._script_buf: list[str] | None = None
        self._in_title = False
        self._title_buf: list[str] = []

    # -- text-node handling: a text node ends at any tag boundary ---------
    def _flush_text(self):
        if self._text_buf:
            piece = "".join(self._text_buf).strip()
            self._text_buf.clear()
            if piece:
                self.out.text_parts.append(piece)

    def handle_data(self, data):
        if self._script_buf is not None:
            self._script_buf.append(data)
            return
        if self._skip_depth:
            return
        if self._in_title:
            self._title_buf.append(data)
        self._text_buf.append(data)

    # -- elements ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._flush_text()
        a = dict(attrs)
        cfg, out = self.cfg, self.out

        if tag == "meta":
            if (
                cfg.respect_nofollow
                and (a.get("name") or "").lower() == "robots"
                and (a.get("content") or "").lower() == "nofollow"
            ):
                out.nofollow_page = True
        elif tag == "base":
            if out.base_href is None and a.get("href"):
                out.base_href = a["href"]
        elif tag == "title":
            self._in_title = True
        elif tag in _HREF_HOLDERS:
            if not (cfg.respect_nofollow and a.get("rel") == "nofollow"):
                if a.get("href") is not None:
                    out.links.add(("href", a["href"]))
        elif tag == "form":
            if cfg.crawl_forms and a.get("action"):
                out.links.add(("form", a["action"]))

        if tag in _SRC_HOLDERS and cfg.crawl_embedded_data:
            if a.get("src") is not None:
                out.links.add(("embedded", a["src"]))

        if tag == "script":
            if a.get("src") is not None:
                if cfg.crawl_javascript:
                    out.links.add(("javascript", a["src"]))
                self._script_buf = None
            else:
                self._script_buf = []
            self._skip_depth += 1
        elif tag == "style":
            self._skip_depth += 1

        if cfg.crawl_onclick_by_heuristic and "onclick" in a and a["onclick"]:
            m = _HREF_LOCATION_RE.search(a["onclick"])
            if m:
                self.out.links.add(("onclick", m.group(1)))

    def handle_endtag(self, tag):
        self._flush_text()
        if tag == "title":
            self._in_title = False
            if self.out.title is None:
                t = "".join(self._title_buf).strip()
                self.out.title = t or None
        elif tag == "script":
            if self._script_buf is not None and self.cfg.crawl_javascript:
                body = "".join(self._script_buf)
                for link in extract_js_links(body):
                    self.out.links.add(("javascript_embedded", link))
            self._script_buf = None
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "style":
            self._skip_depth = max(0, self._skip_depth - 1)

    def handle_startendtag(self, tag, attrs):
        # void elements (<img …/>): start semantics only
        self.handle_starttag(tag, attrs)
        if tag in ("script", "style"):
            self.handle_endtag(tag)

    def close(self):
        super().close()
        self._flush_text()


def extract_html(html: str, cfg) -> HtmlExtraction:
    """Single-pass extraction. ``cfg`` is an ``ExtractionConfig``-shaped
    object (attrs: respect_nofollow, crawl_embedded_data, crawl_forms,
    crawl_javascript, crawl_onclick_by_heuristic)."""
    p = _Parser(cfg)
    try:
        p.feed(html)
        p.close()
    except Exception:
        # parser must never poison a batch; partial output stands
        p._flush_text()
    out = p.out
    if out.nofollow_page and cfg.respect_nofollow:
        out.links = set()
    return out
