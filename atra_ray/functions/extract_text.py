"""Plain-text and raw/binary link extraction (SURVEY.md M12, M13).

M12: the reference runs the ``linkify`` URL finder over decoded plain text
(atra/src/extraction/extractor_method.rs:371-403). We use an equivalent
scheme-anchored regex with trailing-punctuation trimming.

M13: the raw fallback scans robust-UTF-8 windows for ``://`` tokens then
linkifies (atra/src/extraction/raw.rs:29-111, toolkit/utf8.rs) — applied only
as a fallback when the primary extractor chain found nothing
(ApplyWhen::Fallback, extraction/extractor/command.rs:42-63).
"""

from __future__ import annotations

import re

__all__ = ["extract_text_links", "extract_raw_links"]

_URL_RE = re.compile(r"""https?://[^\s<>"'\)\]]+""", re.IGNORECASE)
_TRAILING = ".,;:!?'\""


def extract_text_links(text: str) -> set[str]:
    out = set()
    for m in _URL_RE.finditer(text):
        out.add(m.group(0).rstrip(_TRAILING))
    return out


def extract_raw_links(body: bytes) -> set[str]:
    """Fallback: lossy-decode then linkify — mirrors the RobustUtf8Reader
    stream scan at batch granularity."""
    if b"://" not in body:
        return set()
    return extract_text_links(body.decode("utf-8", errors="replace"))
