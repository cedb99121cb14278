"""Link packing/classification (SURVEY.md M19).

Reference: ``ExtractedLink::pack`` (atra/src/extraction/links.rs:114-147):

- ``data:`` URLs   -> kind "data"
- otherwise resolve against the effective base and compare
  ``distance_to_seed``: changed -> "outgoing", unchanged -> "on_seed".
- a link equal to the effective base itself is dropped
  (extractor_method.rs:314 ``link.is_not(base_ref)``).

The effective base is the page URL, unless the document carries a
``<base href>`` — then it is ``with_base(page, base_href)`` (whose depth is
one hop below the page, exactly as the reference computes it in
extraction/html.rs:82-105).
"""

from __future__ import annotations

from .urlkit import Depth, with_base

__all__ = ["effective_base", "pack_link"]


def effective_base(page_url: str, page_depth: Depth, base_href: str | None) -> tuple[str, Depth]:
    if base_href:
        resolved = with_base(page_url, page_depth, base_href)
        if resolved is not None:
            return resolved
    return page_url, page_depth


def pack_link(
    base_url: str, base_depth: Depth, raw: str
) -> tuple[str, Depth, str] | None:
    """-> (canonical_url, depth, kind) or None if unparseable/self-link."""
    raw_stripped = raw.strip()
    if raw_stripped.startswith("data:"):
        resolved = with_base(base_url, base_depth, raw_stripped)
        if resolved is None:
            return None
        return resolved[0], resolved[1], "data"
    resolved = with_base(base_url, base_depth, raw_stripped)
    if resolved is None:
        return None
    canon, depth = resolved
    if canon == base_url:
        return None
    kind = "outgoing" if depth.dts != base_depth.dts else "on_seed"
    return canon, depth, kind
