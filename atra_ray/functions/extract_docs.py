"""Binary-document link kernels (SURVEY.md M14).

The reference delegates PDF/RTF/OOXML/ODF scraping to the ``link_scraper``
crate's per-format scrapers (atra/src/extraction/extractor_method.rs:699-788).
Our kernels implement the same sources of links:

- OOXML (docx/xlsx/pptx): ZIP members ``*/_rels/*.rels`` declare external
  hyperlinks as ``<Relationship ... Target="url" TargetMode="External">``
  (ECMA-376 packaging); plus any xlink/href attributes in the part XML.
- ODF (odt/ods/odp): ZIP member ``content.xml`` carries
  ``<text:a xlink:href="url">`` anchors (OASIS ODF).
- PDF: ``/URI (url)`` action entries scanned from the raw bytes (PDF 32000
  link annotations) — no full object-graph parse needed for link harvest.
- RTF: ``HYPERLINK "url"`` field instructions ({\\field{\\*\\fldinst ...}}).

All kernels are defensive: corrupt archives yield no links and never
poison a batch (the extractor chain then falls to the M13 raw scan,
ApplyWhen::Fallback).
"""

from __future__ import annotations

import io
import re
import zipfile

__all__ = [
    "extract_ooxml_links",
    "extract_odf_links",
    "extract_pdf_links",
    "extract_rtf_links",
    "extract_exif_links",
    "zip_kind",
]

_RELS_TARGET_RE = re.compile(
    r'<Relationship\b[^>]*?Target="([^"]+)"[^>]*?/?>', re.IGNORECASE
)
_RELS_EXTERNAL_RE = re.compile(r'TargetMode="External"', re.IGNORECASE)
_XLINK_HREF_RE = re.compile(r'xlink:href="([^"]+)"', re.IGNORECASE)
_PDF_URI_RE = re.compile(rb"/URI\s*\(\s*([^)]*?)\s*\)")
_RTF_HYPERLINK_RE = re.compile(r'HYPERLINK\s+"?([^"\\}\s]+)"?')


def zip_kind(body: bytes) -> str | None:
    """'ooxml' | 'odf' | None for a PK-zip body — the member-inspection
    step the reference gets from the file_format crate's magic database."""
    try:
        with zipfile.ZipFile(io.BytesIO(body)) as z:
            names = set(z.namelist())
            if "[Content_Types].xml" in names:
                return "ooxml"
            if "mimetype" in names:
                mt = z.read("mimetype")[:64]
                if b"opendocument" in mt:
                    return "odf"
            if "content.xml" in names:
                return "odf"
    except Exception:
        return None
    return None


def extract_ooxml_links(body: bytes) -> list[str]:
    out: list[str] = []
    try:
        with zipfile.ZipFile(io.BytesIO(body)) as z:
            for name in sorted(z.namelist()):
                if name.endswith(".rels"):
                    xml = z.read(name).decode("utf-8", "replace")
                    for m in re.finditer(
                        r"<Relationship\b[^>]*/?>", xml, re.IGNORECASE
                    ):
                        tag = m.group(0)
                        if not _RELS_EXTERNAL_RE.search(tag):
                            continue
                        t = _RELS_TARGET_RE.search(tag)
                        if t:
                            out.append(t.group(1))
                elif name.endswith(".xml"):
                    xml = z.read(name).decode("utf-8", "replace")
                    out.extend(_XLINK_HREF_RE.findall(xml))
    except Exception:
        return []
    seen: set[str] = set()
    return [x for x in out if not (x in seen or seen.add(x))]


def extract_odf_links(body: bytes) -> list[str]:
    out: list[str] = []
    try:
        with zipfile.ZipFile(io.BytesIO(body)) as z:
            for name in ("content.xml", "styles.xml", "meta.xml"):
                if name in z.namelist():
                    xml = z.read(name).decode("utf-8", "replace")
                    out.extend(_XLINK_HREF_RE.findall(xml))
    except Exception:
        return []
    seen: set[str] = set()
    return [x for x in out if not (x in seen or seen.add(x))]


def extract_pdf_links(body: bytes) -> list[str]:
    out = []
    for m in _PDF_URI_RE.finditer(body):
        # PDF string escapes: \( \) \\ are the ones that matter for URIs
        raw = m.group(1).replace(b"\\(", b"(").replace(b"\\)", b")").replace(
            b"\\\\", b"\\"
        )
        out.append(raw.decode("utf-8", "replace"))
    seen: set[str] = set()
    return [x for x in out if not (x in seen or seen.add(x))]


def extract_rtf_links(body: bytes) -> list[str]:
    text = body.decode("latin-1", "replace")
    out = _RTF_HYPERLINK_RE.findall(text)
    seen: set[str] = set()
    return [x for x in out if not (x in seen or seen.add(x))]


# ---------------------------------------------------------------------------
# EXIF (the reference's image scraper reads EXIF text fields for links —
# extractor_method.rs:699-788 via link_scraper's image module)
# ---------------------------------------------------------------------------

import struct as _struct

_URL_IN_TEXT_RE = re.compile(r"https?://[^\s\"'<>\\]+")
# ASCII-typed EXIF tags that commonly carry free text (ImageDescription,
# Make, Model, Software, Artist, Copyright) + the EXIF-IFD pointer tag
_EXIF_SUBIFD_TAG = 0x8769
_ASCII_TYPE = 2


def _walk_ifd(data: bytes, tiff0: int, offset: int, bo: str, out: list[str], depth: int = 0) -> None:
    if depth > 3 or offset <= 0 or tiff0 + offset + 2 > len(data):
        return
    (n,) = _struct.unpack_from(bo + "H", data, tiff0 + offset)
    base = tiff0 + offset + 2
    for i in range(min(n, 256)):
        ent = base + i * 12
        if ent + 12 > len(data):
            return
        tag, typ, count = _struct.unpack_from(bo + "HHI", data, ent)
        if tag == _EXIF_SUBIFD_TAG and typ in (3, 4):
            (sub,) = _struct.unpack_from(bo + "I", data, ent + 8)
            _walk_ifd(data, tiff0, sub, bo, out, depth + 1)
        elif typ == _ASCII_TYPE and count > 0:
            if count <= 4:
                raw = data[ent + 8 : ent + 8 + count]
            else:
                (val_off,) = _struct.unpack_from(bo + "I", data, ent + 8)
                raw = data[tiff0 + val_off : tiff0 + val_off + count]
            out.append(raw.split(b"\x00", 1)[0].decode("utf-8", "replace"))


def extract_exif_links(body: bytes) -> list[str]:
    """URLs found in ASCII EXIF fields of a JPEG (APP1 Exif segment) or
    bare TIFF — a real IFD walk (byte-order aware, EXIF sub-IFD followed),
    not a byte scan."""
    texts: list[str] = []
    try:
        tiff0 = -1
        if body[:3] == b"\xff\xd8\xff":  # JPEG: find the APP1 Exif segment
            i = 2
            while i + 4 < len(body) and len(texts) == 0:
                if body[i] != 0xFF:
                    break
                marker = body[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                (seglen,) = _struct.unpack_from(">H", body, i + 2)
                if marker == 0xE1 and body[i + 4 : i + 10] == b"Exif\x00\x00":
                    tiff0 = i + 10
                    break
                i += 2 + seglen
        elif body[:4] in (b"II*\x00", b"MM\x00*"):
            tiff0 = 0
        if tiff0 >= 0 and tiff0 + 8 <= len(body):
            bo = "<" if body[tiff0 : tiff0 + 2] == b"II" else ">"
            (ifd0,) = _struct.unpack_from(bo + "I", body, tiff0 + 4)
            _walk_ifd(body, tiff0, ifd0, bo, texts)
    except Exception:
        return []
    out: list[str] = []
    for t in texts:
        out.extend(_URL_IN_TEXT_RE.findall(t))
    seen: set[str] = set()
    return [x for x in out if not (x in seen or seen.add(x))]
