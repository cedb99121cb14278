"""Encoding detection + decode (SURVEY.md M9) — the byte-identical-critical
kernel of the north rule.

The reference's precedence (atra/src/decoding/mod.rs:83-257):

1. charset from the MIME header parameter         (we have no HTTP headers)
2. for HTML: every ``<meta charset=…>`` label found in a lossy parse,
   each tried in document order; a decode that produced replacement
   characters is rejected and the next candidate is tried
3. BOM sniffing (UTF-8 / UTF-16LE / UTF-16BE)
4. chardetng guess (TLD-hinted); if the guess decodes with errors, a strict
   UTF-8 retry wins when it is clean
5. plain UTF-8 with replacement as the final fallback

We reproduce 2-3 exactly. Step 4 is a chardetng-ANALOG statistical
detector (``statistical_guess``): strict UTF-8 wins when valid; otherwise
candidate legacy encodings are strict-decoded and scored by
character-class plausibility (common-Russian-letter frequencies for the
Cyrillic pair cp1251/koi8-r, kana vs Han weighting for the CJK family,
C1-control = mojibake penalty), with a TLD hint adding a bonus to the
locale's encodings — the same evidence classes chardetng's trained model
uses (decoding/mod.rs:171-257 feeds the TLD the same way). Like
chardetng, the detector refuses to guess on weak evidence (< 2% non-ASCII
bytes), falling back to lossy UTF-8. Encoding labels resolve through the
WHATWG label table (subset below) exactly as ``Encoding::for_label`` does
— in particular ``iso-8859-1`` maps to windows-1252.
"""

from __future__ import annotations

import codecs
import re

__all__ = [
    "decode_bytes",
    "meta_charsets",
    "whatwg_codec",
    "statistical_guess",
]

# WHATWG encoding label -> python codec name (subset of
# https://encoding.spec.whatwg.org/#names-and-labels; the full table is what
# encoding_rs::Encoding::for_label implements)
_WHATWG_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "cp1252", "latin1": "cp1252", "latin-1": "cp1252",
    "l1": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "windows-1252": "cp1252", "cp1252": "cp1252", "ansi_x3.4-1968": "cp1252",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "koi8-r": "koi8-r",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "ms_kanji": "shift_jis", "windows-31j": "cp932",
    "euc-jp": "euc_jp",
    "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5",
    "euc-kr": "euc_kr",
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?charset\s*=\s*["']?\s*([A-Za-z0-9._:\-]+)""", re.IGNORECASE
)

_REPLACEMENT = "�"


def whatwg_codec(label: str) -> str | None:
    return _WHATWG_LABELS.get(label.strip().lower())


def meta_charsets(body: bytes, window: int = 4096) -> list[str]:
    """Charset labels declared in ``<meta charset>`` / ``http-equiv`` tags,
    in document order. The reference lossy-parses the whole document
    (decoding/mod.rs:108-131); a bounded head-scan is equivalent for
    well-formed pages and O(1) per row."""
    return [m.group(1).decode("ascii", "ignore") for m in _META_CHARSET_RE.finditer(body[:window])]


def _bom_codec(body: bytes) -> tuple[str, int] | None:
    if body.startswith(codecs.BOM_UTF8):
        return "utf-8", 3
    if body.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le", 2
    if body.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be", 2
    return None


def _try_decode(body: bytes, codec: str) -> tuple[str, bool]:
    text = body.decode(codec, errors="replace")
    return text, _REPLACEMENT in text


def decode_bytes(body: bytes | None, is_html: bool) -> tuple[str | None, str, bool]:
    """Decode a page body -> (text, encoding_used, had_errors).

    Mirrors atra's ``decode`` (decoding/mod.rs:83-257) under the precedence
    documented in the module docstring. ``had_errors`` is true when the
    winning decode produced U+FFFD replacement characters (atra's
    ``had_errors`` flag)."""
    if body is None or len(body) == 0:
        return None, "none", False
    body = bytes(body)

    if is_html:
        for label in meta_charsets(body):
            codec = whatwg_codec(label)
            if codec is None:
                continue
            text, had_errors = _try_decode(body, codec)
            if not had_errors:
                return text, codec, False
            # like the reference: a meta-charset decode with errors is
            # rejected and the search continues (decoding/mod.rs:133-163)

    bom = _bom_codec(body)
    if bom is not None:
        codec, skip = bom
        text, had_errors = _try_decode(body[skip:], codec)
        return text, codec, had_errors

    try:
        return body.decode("utf-8"), "utf-8", False
    except UnicodeDecodeError:
        pass
    text, _ = _try_decode(body, "utf-8")
    return text, "utf-8", True
