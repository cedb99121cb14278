"""Sitemap expansion (reference: atra/src/crawl/crawler.rs:234-260,
crawler/sitemaps.rs:35-87): when crawling a seed, the origin's sitemap is
fetched and its URLs enter the normal checker chain as children of the
seed. Pure kernel shared by the engine and the simulator (the distributed
parts — seen-check, routing — stay caller-side)."""

from __future__ import annotations

import re

from ..config import CrawlConfig
from .extract_xml import extract_xml_links
from .links import pack_link
from .urlkit import Depth, origin_of

__all__ = ["sitemap_candidates"]


def sitemap_candidates(
    seed_rows: list[dict],
    sitemap_xml_by_host: dict[str, bytes],
    cfg: CrawlConfig,
) -> list[dict]:
    """Frontier rows for sitemap-listed URLs of each seed's host, depth =
    child-of-seed (same propagation rule as an extracted link), after
    budget + blacklist. Deterministic order (sorted per seed)."""
    blacklist = [re.compile(p) for p in cfg.blacklist]
    out, seen_local = [], set()
    for r in seed_rows:
        host = r["url"].split("/")[2] if "://" in r["url"] else ""
        xml = sitemap_xml_by_host.get(host)
        if xml is None:
            continue
        try:
            text = bytes(xml).decode("utf-8", "replace")
        except Exception:
            continue
        for raw in sorted(extract_xml_links(text)):
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
