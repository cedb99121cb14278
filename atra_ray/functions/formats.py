"""Format detection (SURVEY.md M8).

The reference merges three evidence sources — HTTP header MIME, magic-byte
detection, and file-extension votes — into one
``InterpretedProcessibleFileFormat`` verdict
(reference: atra/src/format/information.rs:51-72,
format/file_format_detection.rs:41-110, format/supported.rs:203-393).

Our pages table carries no HTTP headers, so the evidence here is: magic
bytes, the reference's HTML sniff heuristic (format/supported.rs:94-132,
reproduced bit-for-bit below), URL extension, and content sniffs for
JSON/XML. Precedence: magic bytes (unambiguous binary formats) > HTML sniff
> extension > content sniff > PlainText/Unknown.
"""

from __future__ import annotations

from urllib.parse import urlsplit

__all__ = ["Format", "detect_format", "html_heuristic"]


class Format:
    """String-enum of the reference's 18 interpreted formats
    (atra/src/format/supported.rs:31-60). We keep them as plain strings so
    they land in Arrow columns without casting."""

    HTML = "html"
    PDF = "pdf"
    JAVASCRIPT = "javascript"
    PLAIN_TEXT = "plain_text"
    STRUCTURED_PLAIN_TEXT = "structured_plain_text"  # csv/tsv-ish
    PROGRAMMING_LANGUAGE = "programming_language"
    MP3_URL = "mp3_url"
    JSON = "json"
    XML = "xml"
    SVG = "svg"
    RTF = "rtf"
    OOXML = "ooxml"
    ODF = "odf"
    IMAGE = "image"
    ZIP = "zip"
    DECODEABLE = "decodeable"
    UNSUPPORTED = "unsupported"
    UNKNOWN = "unknown"


# formats whose bodies we attempt to decode to text
DECODEABLE_FORMATS = {
    Format.HTML, Format.PLAIN_TEXT, Format.STRUCTURED_PLAIN_TEXT,
    Format.PROGRAMMING_LANGUAGE, Format.JAVASCRIPT, Format.JSON, Format.XML,
    Format.SVG, Format.DECODEABLE, Format.MP3_URL,
}

_EXT_MAP = {
    "html": Format.HTML, "htm": Format.HTML, "xhtml": Format.HTML,
    "pdf": Format.PDF,
    "js": Format.JAVASCRIPT, "mjs": Format.JAVASCRIPT,
    "txt": Format.PLAIN_TEXT, "text": Format.PLAIN_TEXT,
    "csv": Format.STRUCTURED_PLAIN_TEXT, "tsv": Format.STRUCTURED_PLAIN_TEXT,
    "json": Format.JSON, "xml": Format.XML, "svg": Format.SVG,
    "rtf": Format.RTF, "zip": Format.ZIP,
    "png": Format.IMAGE, "jpg": Format.IMAGE, "jpeg": Format.IMAGE,
    "gif": Format.IMAGE, "webp": Format.IMAGE, "bmp": Format.IMAGE,
    "ico": Format.IMAGE,
    "docx": Format.OOXML, "xlsx": Format.OOXML, "pptx": Format.OOXML,
    "odt": Format.ODF, "ods": Format.ODF, "odp": Format.ODF,
    "m3u": Format.MP3_URL, "m3u8": Format.MP3_URL,
    "py": Format.PROGRAMMING_LANGUAGE, "rs": Format.PROGRAMMING_LANGUAGE,
    "c": Format.PROGRAMMING_LANGUAGE, "java": Format.PROGRAMMING_LANGUAGE,
}

_MAGIC = [
    (b"%PDF-", Format.PDF),
    (b"\x89PNG\r\n\x1a\n", Format.IMAGE),
    (b"GIF87a", Format.IMAGE),
    (b"GIF89a", Format.IMAGE),
    (b"\xff\xd8\xff", Format.IMAGE),
    (b"RIFF", Format.IMAGE),  # webp container
    (b"PK\x03\x04", Format.ZIP),
    (b"{\\rtf", Format.RTF),
]

_SNIFF_WINDOW = 1024


def html_heuristic(to_check: bytes) -> bool:
    """Faithful translation of the reference sniffer
    (atra/src/format/supported.rs:94-132): DOCTYPE at offset 0 wins; a
    matched <html>..</html> pair wins; a leading <html> wins; a DOCTYPE
    before <html> wins."""
    doctype = to_check.find(b"<!DOCTYPE html")
    if doctype == 0:
        return True
    html_start = to_check.find(b"<html")
    html_end = to_check.find(b"</html>")
    if html_end != -1:
        return html_start != -1 and html_start < html_end
    if html_start != -1:
        if html_start == 0:
            return True
        return doctype != -1 and doctype < html_start
    return False


def _url_extension(url: str) -> str | None:
    try:
        path = urlsplit(url).path
    except ValueError:
        return None
    leaf = path.rsplit("/", 1)[-1]
    if "." not in leaf:
        return None
    return leaf.rsplit(".", 1)[-1].lower()


def _mostly_printable(head: bytes) -> bool:
    if not head:
        return False
    bad = sum(1 for b in head if b < 9 or (13 < b < 32))
    return bad / len(head) < 0.05


_BOMS = [
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]


def detect_format(url: str, body: bytes | None) -> str:
    if not body:
        return Format.UNKNOWN
    head = bytes(body[:_SNIFF_WINDOW])
    for magic, fmt in _MAGIC:
        if head.startswith(magic):
            if fmt == Format.ZIP:
                # OOXML/ODF are ZIP containers: inspect the member table
                # (the reference's file_format magic DB does the same)
                from .extract_docs import zip_kind

                kind = zip_kind(bytes(body))
                if kind == "ooxml":
                    return Format.OOXML
                if kind == "odf":
                    return Format.ODF
            return fmt
    # a Unicode BOM marks the body as text; sniff the DECODED head so that
    # e.g. UTF-16 HTML is still recognized as HTML (the reference gets this
    # from the HTTP mime header, which our pages table does not carry)
    for bom, codec in _BOMS:
        if head.startswith(bom):
            decoded_head = head[len(bom):].decode(codec, errors="replace")
            head = decoded_head.encode("utf-8", errors="replace")
            if html_heuristic(head):
                return Format.HTML
            break
    if html_heuristic(head):
        return Format.HTML
    ext = _url_extension(url)
    if ext is not None and ext in _EXT_MAP:
        fmt = _EXT_MAP[ext]
        # an extension vote of HTML still honors the sniffer's veto only
        # when the body obviously isn't markup; keep the vote (the
        # reference lets extension votes through when magic is inconclusive)
        return fmt
    stripped = head.lstrip()
    if stripped.startswith((b"{", b"[")):
        return Format.JSON
    if stripped.startswith(b"<?xml"):
        return Format.XML
    if stripped.startswith(b"<svg"):
        return Format.SVG
    if _mostly_printable(head):
        return Format.PLAIN_TEXT
    return Format.UNKNOWN
