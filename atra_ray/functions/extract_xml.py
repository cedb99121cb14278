"""XML / SVG link extraction (M14).

The reference routes XML-family formats through `link_scraper`'s per-format
scrapers (atra/src/extraction/extractor_method.rs:699-788): attribute URLs
(`href`, `xlink:href`, `src`) plus RSS/Atom-style `<link>`/`<loc>` element
text. We implement the same surface with stdlib ``xml.etree`` plus a
regex fallback for non-well-formed documents — never raising into the
batch (a malformed doc extracts nothing, matching the reference's
error-swallowing dispatch, extraction/extractor/mod.rs:130-158).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["extract_xml_links"]

_ATTR_NAMES = ("href", "src")  # namespaced forms matched by localname
_TEXT_ELEMENTS = ("link", "loc", "url")  # RSS/Atom/sitemap URL-bearing tags
_ATTR_RE = re.compile(
    r"""(?:href|src)\s*=\s*["']([^"']+)["']""", re.IGNORECASE
)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower() if isinstance(tag, str) else ""


def extract_xml_links(text: str) -> set[str]:
    """URL candidates from an XML/SVG document (raw attribute/element
    values; canonicalization happens in pack_link like every extractor)."""
    out: set[str] = set()
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        # salvage attribute URLs from broken XML (regex fallback)
        out.update(m.group(1) for m in _ATTR_RE.finditer(text))
        return out
    for el in root.iter():
        for attr, val in el.attrib.items():
            if _localname(attr) in _ATTR_NAMES and val:
                out.add(val)
        if _localname(el.tag) in _TEXT_ELEMENTS:
            body = (el.text or "").strip()
            if body:
                out.add(body)
    return out
