"""JavaScript link extraction (SURVEY.md M11).

The reference token-scans JS source: an identifier ``href`` arms a flag, the
next string literal is captured as a link, a semicolon disarms the flag
(atra/src/extraction/js.rs:22-66). We reproduce that automaton with a small
regex tokenizer instead of a full ECMAScript scanner.
"""

from __future__ import annotations

import re

__all__ = ["extract_js_links"]

_TOKEN_RE = re.compile(
    r"""
    (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<semi>;)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
    """,
    re.VERBOSE | re.DOTALL,
)


def extract_js_links(script: str) -> set[str]:
    links: set[str] = set()
    href_found = False
    for m in _TOKEN_RE.finditer(script):
        if m.lastgroup == "ident":
            if m.group("ident") == "href":
                href_found = True
        elif m.lastgroup == "semi":
            href_found = False
        elif m.lastgroup == "string":
            if href_found:
                links.add(m.group("string")[1:-1])
                href_found = False
    return links
