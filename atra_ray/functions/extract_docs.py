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
