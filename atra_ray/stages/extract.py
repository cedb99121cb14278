"""The fetch-side page processing kernel (SURVEY.md §7.1 slice):
format detection (M8) → decode (M9) → link extraction (M10-M13, M16) →
language id (M17) → link packing (M19), as ONE ``map_batches`` pass over
zero-copy Arrow batches of the pages table.

Mirrors the per-URL section of ``CrawlTask::run``
(atra/src/crawl/crawler.rs:440-461): determine_format → process/decode →
detect_language → link_extractors.extract_from_response. The extractor
dispatch follows the reference's command chain semantics
(extraction/extractor/mod.rs:37-158): HTML gets the HTML extractor, plain
text gets linkify, everything decodeable-but-unmatched gets the raw
fallback (ApplyWhen::Fallback — only when nothing else extracted).

Output schema (one row per input page):
  url:string, format:string, encoding:string, had_decode_errors:bool,
  text:string(null for undecodable), lang:string,
  links:list<struct<target:string, origin:string, kind:string,
                    dow:uint64, dts:uint64, tds:uint64>>

Input depth columns (dow, dts, tds) are honored when present (crawl mode);
absent they default to 0 (slice mode).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import ExtractionConfig
from ..functions.decoding import decode_bytes
from ..functions.extract_html import extract_html
from ..functions.extract_text import extract_raw_links, extract_text_links
from ..functions.formats import DECODEABLE_FORMATS, Format, detect_format
from ..functions.langdetect import detect_language
from ..functions.links import effective_base, pack_link
from ..functions.urlkit import Depth

__all__ = ["extract_batch", "ExtractStage", "LINK_STRUCT", "EXTRACT_SCHEMA"]

LINK_STRUCT = pa.struct(
    [
        ("target", pa.string()),
        ("origin", pa.string()),
        ("kind", pa.string()),
        ("dow", pa.uint64()),
        ("dts", pa.uint64()),
        ("tds", pa.uint64()),
    ]
)

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("format", pa.string()),
        ("encoding", pa.string()),
        ("had_decode_errors", pa.bool_()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("links", pa.list_(LINK_STRUCT)),
    ]
)


def _extract_zip_links(
    url: str, body: bytes, depth: Depth, cfg: ExtractionConfig, level: int
) -> list:
    """M15: unzip and re-run the extractor chain per member (bounded by
    max_extraction_depth levels / max_zip_members entries); collect links.
    Member links resolve against the ARCHIVE's url (the reference passes the
    response url through, extraction/extractor_method.rs:172-270)."""
    import io
    import zipfile

    links: list = []
    try:
        with zipfile.ZipFile(io.BytesIO(body)) as zf:
            for info in zf.infolist()[: cfg.max_zip_members]:
                if info.is_dir():
                    continue
                try:
                    data = zf.read(info)
                except Exception:
                    continue
                member_fmt = detect_format(info.filename, data)
                if member_fmt == Format.ZIP:
                    if level + 1 < cfg.max_extraction_depth:
                        links.extend(
                            _extract_zip_links(url, data, depth, cfg, level + 1)
                        )
                    continue
                _, _, _, _, _, member_links = extract_one(
                    url, data, depth, cfg, _zip_level=level + 1,
                    _fmt_override=member_fmt,
                )
                links.extend(member_links)
    except Exception:
        return links  # corrupt archive: extract nothing, never poison
    return links


def extract_one(
    url: str,
    body: bytes | None,
    depth: Depth,
    cfg: ExtractionConfig,
    *,
    _zip_level: int = 0,
    _fmt_override: str | None = None,
):
    """Process one page -> (format, encoding, had_errors, text, lang, links).
    links = list[(target, origin, kind, dow, dts, tds)]."""
    fmt = _fmt_override or detect_format(url, body)
    if fmt == Format.ZIP and body is not None and _zip_level < cfg.max_extraction_depth:
        zlinks = _extract_zip_links(url, bytes(body), depth, cfg, _zip_level)
        # per-page dedup (A2) over the merged member links
        seen_z = set()
        uniq = []
        for lk in zlinks:
            key = (lk[0], lk[1])
            if key not in seen_z:
                seen_z.add(key)
                uniq.append(lk)
        return fmt, "none", False, None, "und", uniq
    if fmt == Format.IMAGE and body is not None:
        # M14 EXIF kernel: real IFD walk over JPEG APP1 / TIFF; empty
        # harvest falls to the raw scan (ApplyWhen::Fallback)
        from ..functions.extract_docs import extract_exif_links

        raw_found = extract_exif_links(bytes(body))
        if not raw_found:
            raw_found = list(extract_raw_links(bytes(body)))
        links = []
        seen_i = set()
        for raw in sorted(raw_found):
            packed = pack_link(url, depth, raw)
            if packed is None:
                continue
            target, d, kind = packed
            if target in seen_i:
                continue
            seen_i.add(target)
            links.append((target, "image", kind, d.dow, d.dts, d.tds))
        return fmt, "none", False, None, "und", links
    if fmt in (Format.OOXML, Format.ODF, Format.PDF, Format.RTF) and body is not None:
        # M14 binary-document kernels (extractor_method.rs:699-788): link
        # harvest only, no text (the reference's Decoded::None for these);
        # empty harvest falls to the M13 raw scan (ApplyWhen::Fallback)
        from ..functions.extract_docs import (
            extract_odf_links,
            extract_ooxml_links,
            extract_pdf_links,
            extract_rtf_links,
        )

        kernel = {
            Format.OOXML: extract_ooxml_links,
            Format.ODF: extract_odf_links,
            Format.PDF: extract_pdf_links,
            Format.RTF: extract_rtf_links,
        }[fmt]
        raw_found = kernel(bytes(body))
        if not raw_found:
            raw_found = list(extract_raw_links(bytes(body)))
        links = []
        seen_d = set()
        for raw in sorted(raw_found):
            packed = pack_link(url, depth, raw)
            if packed is None:
                continue
            target, d, kind = packed
            if (target, fmt) in seen_d:
                continue
            seen_d.add((target, fmt))
            links.append((target, fmt, kind, d.dow, d.dts, d.tds))
        return fmt, "none", False, None, "und", links
    if fmt not in DECODEABLE_FORMATS or body is None:
        return fmt, "none", False, None, "und", []

    # strip any :port (and userinfo) before taking the last label, else
    # host.example:8080 yields tld "example:8080" and the locale hint
    # silently never applies to non-default-port URLs
    host = url.split("/")[2] if "://" in url else ""
    host = host.rsplit("@", 1)[-1].split(":", 1)[0]
    tld = host.rsplit(".", 1)[-1] if "." in host else None
    text_decoded, encoding, had_errors = decode_bytes(
        bytes(body), fmt == Format.HTML, tld
    )
    if text_decoded is None:
        return fmt, "none", False, None, "und", []

    raw_links: list[tuple[str, str]] = []  # (origin, raw)
    page_text = text_decoded
    base_url, base_depth = url, depth

    if fmt == Format.HTML:
        ex = extract_html(text_decoded, cfg)
        page_text = ex.text
        base_url, base_depth = effective_base(url, depth, ex.base_href)
        raw_links = sorted(ex.links)
    elif fmt in (Format.PLAIN_TEXT, Format.STRUCTURED_PLAIN_TEXT, Format.DECODEABLE):
        raw_links = sorted(("plain_text", t) for t in extract_text_links(text_decoded))
    elif fmt == Format.JAVASCRIPT:
        from ..functions.extract_js import extract_js_links

        raw_links = sorted(("javascript_embedded", t) for t in extract_js_links(text_decoded))
    elif fmt in (Format.XML, Format.SVG):
        from ..functions.extract_xml import extract_xml_links

        raw_links = sorted(("xml", t) for t in extract_xml_links(text_decoded))
        if not raw_links:  # ApplyWhen::Fallback pass
            raw_links = sorted(("raw", t) for t in extract_raw_links(bytes(body)))
    else:
        # JSON/…: raw fallback scan (ApplyWhen::Fallback)
        raw_links = sorted(("raw", t) for t in extract_raw_links(bytes(body)))

    lang = detect_language(page_text)

    links = []
    seen = set()  # per-page link dedup (A2, crawl/crawler/result.rs:101-105)
    for origin, raw in raw_links:
        packed = pack_link(base_url, base_depth, raw)
        if packed is None:
            continue
        target, d, kind = packed
        key = (target, origin)
        if key in seen:
            continue
        seen.add(key)
        links.append((target, origin, kind, d.dow, d.dts, d.tds))
    return fmt, encoding, had_errors, page_text, lang, links


def extract_batch(batch: pa.Table, cfg: ExtractionConfig) -> pa.Table:
    urls = batch.column("url").to_pylist()
    bodies = batch.column("html").to_pylist()
    if "dow" in batch.column_names:
        dows = batch.column("dow").to_pylist()
        dtss = batch.column("dts").to_pylist()
        tdss = batch.column("tds").to_pylist()
    else:
        dows = dtss = tdss = None

    fmts, encs, errs, texts, langs, links_col = [], [], [], [], [], []
    for i, (url, body) in enumerate(zip(urls, bodies)):
        depth = Depth(dows[i], dtss[i], tdss[i]) if dows is not None else Depth()
        fmt, enc, had_err, text, lang, links = extract_one(url, body, depth, cfg)
        fmts.append(fmt)
        encs.append(enc)
        errs.append(had_err)
        texts.append(text)
        langs.append(lang)
        links_col.append(
            [
                {"target": t, "origin": o, "kind": k, "dow": a, "dts": b, "tds": c}
                for t, o, k, a, b, c in links
            ]
        )

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "format": pa.array(fmts, pa.string()),
            "encoding": pa.array(encs, pa.string()),
            "had_decode_errors": pa.array(errs, pa.bool_()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "links": pa.array(links_col, pa.list_(LINK_STRUCT)),
        }
    )


class ExtractStage:
    """Actor-pool form for ``map_batches(ExtractStage, concurrency=N,
    batch_format="pyarrow")`` — config held once per actor."""

    def __init__(self, cfg: ExtractionConfig | None = None):
        self.cfg = cfg or ExtractionConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, self.cfg)
