"""Sitemap expansion (reference: atra/src/crawl/crawler.rs:234-260,
crawler/sitemaps.rs:35-87): when crawling a seed, the origin's sitemaps are
resolved — robots.txt ``Sitemap:`` declarations first, then the external
per-host table — parsed with the sitemaps.org schema (the reference's
``sitemap`` crate distinguishes ``SiteMapEntity::Url`` from
``SiteMapEntity::SiteMap``), and ``<sitemapindex>`` entries RECURSE into
their child sitemaps. Leaf URLs enter the normal checker chain as children
of the seed. Pure kernel shared by the engine and the simulator (the
distributed parts — seen-check, routing — stay caller-side)."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from ..config import CrawlConfig
from .extract_xml import extract_xml_links
from .links import pack_link
from .urlkit import Depth, origin_of

__all__ = ["sitemap_candidates", "parse_sitemap", "sitemap_lookup_from_table"]


def sitemap_lookup_from_table(t) -> dict[str, bytes]:
    """sitemaps.parquet -> the key->xml lookup ``sitemap_candidates``
    expects. New-format tables carry one row per sitemap DOCUMENT
    (host, sitemap_url, is_root, sitemap_xml): every document is keyed by
    its url, root documents additionally by their bare host. Old-format
    tables (host, sitemap_xml) key by host only."""
    hosts = t.column("host").to_pylist()
    xmls = t.column("sitemap_xml").to_pylist()
    if "sitemap_url" not in t.column_names:
        return dict(zip(hosts, xmls))
    urls = t.column("sitemap_url").to_pylist()
    roots = (
        t.column("is_root").to_pylist()
        if "is_root" in t.column_names
        else [True] * len(hosts)
    )
    lookup: dict[str, bytes] = {}
    for h, u, r, x in zip(hosts, urls, roots, xmls):
        lookup[u] = x
        if r:
            lookup[h] = x
    return lookup

# safety caps on the recursion (real-world index trees can be adversarial):
# depth ≥ 3 covers index→index→urlset; the per-host sitemap budget bounds
# total side-table reads per seed
MAX_INDEX_DEPTH = 4
MAX_SITEMAPS_PER_HOST = 64

_LOC_RE = re.compile(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", re.IGNORECASE)


def parse_sitemap(xml: bytes | str) -> tuple[list[str], list[str]]:
    """One sitemap document -> (page_urls, child_sitemap_urls).

    ``<urlset>`` roots yield page urls; ``<sitemapindex>`` roots yield
    child sitemap urls (crawler/sitemaps.rs:69-77 collects both entity
    kinds). Malformed XML falls back to the generic link scan with no
    children — same lenient behavior the entity parser's Err arm logs
    past (sitemaps.rs:78-80)."""
    if isinstance(xml, (bytes, bytearray)):
        xml = bytes(xml).decode("utf-8", "replace")
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        # lenient scan: <loc> bodies + generic xml links, no recursion
        locs = [m.group(1).strip() for m in _LOC_RE.finditer(xml)]
        return sorted(dict.fromkeys(locs + sorted(extract_xml_links(xml)))), []
    tag = root.tag.rsplit("}", 1)[-1].lower()
    locs = [
        el.text.strip()
        for el in root.iter()
        if el.tag.rsplit("}", 1)[-1].lower() == "loc" and el.text
    ]
    if tag == "sitemapindex":
        return [], locs
    return locs, []


def sitemap_candidates(
    seed_rows: list[dict],
    sitemap_xml_by_key: dict[str, bytes],
    cfg: CrawlConfig,
    robots_by_host: dict | None = None,
) -> list[dict]:
    """Frontier rows for sitemap-listed URLs of each seed's host, depth =
    child-of-seed (same propagation rule as an extracted link), after
    budget + blacklist. Deterministic order (sorted per sitemap).

    ``sitemap_xml_by_key`` maps BOTH bare host names (the host's
    conventional root sitemap) and full sitemap URLs (index children) to
    document bytes. Roots per seed = robots ``Sitemap:`` declarations
    (when ``robots_by_host`` carries parsed RobotsRules) plus the host
    entry; ``<sitemapindex>`` documents recurse breadth-first through the
    url-keyed entries up to MAX_INDEX_DEPTH levels."""
    blacklist = [re.compile(p) for p in cfg.blacklist]
    out, seen_local = [], set()
    # many seeds share a host: walk + parse each host's sitemap tree ONCE
    walk_cache: dict[tuple, list[str]] = {}
    for r in seed_rows:
        host = r["url"].split("/")[2] if "://" in r["url"] else ""
        roots: list[str] = []
        rules = (robots_by_host or {}).get(host)
        if rules is not None:
            roots.extend(getattr(rules, "sitemaps", ()))
        if host in sitemap_xml_by_key:
            roots.append(host)
        roots = list(dict.fromkeys(roots))
        cache_key = (host, tuple(roots))
        page_urls = walk_cache.get(cache_key)
        if page_urls is None:
            # BFS over the index tree; visited-set dedups shared children
            frontier, visited, page_urls = list(roots), set(), []
            depth = 0
            while frontier and depth < MAX_INDEX_DEPTH:
                nxt: list[str] = []
                for key in frontier:
                    if key in visited or len(visited) >= MAX_SITEMAPS_PER_HOST:
                        continue
                    visited.add(key)
                    xml = sitemap_xml_by_key.get(key)
                    if xml is None:
                        continue
                    urls, children = parse_sitemap(xml)
                    page_urls.extend(urls)
                    nxt.extend(children)
                frontier = nxt
                depth += 1
            walk_cache[cache_key] = page_urls
        for raw in sorted(dict.fromkeys(page_urls)):
            packed = pack_link(r["url"], Depth(0, 0, 0), raw)
            if packed is None:
                continue
            target, d, _kind = packed
            if target in seen_local:
                continue
            torigin = origin_of(target)
            if torigin is None:
                continue
            if not cfg.budget_for(torigin).is_in_budget(d):
                continue
            if any(p.search(target) for p in blacklist):
                continue
            seen_local.add(target)
            out.append(
                {
                    "url": target, "origin": torigin, "dow": d.dow,
                    "dts": d.dts, "tds": d.tds, "is_seed": False, "age": 0,
                }
            )
    return out
