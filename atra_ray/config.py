"""Run configuration — mirrors the reference's config surface
(atra/src/config/crawl.rs:38-120, config/system.rs) as plain dataclasses.
One ``CrawlConfig`` object is built on the driver and shipped to every task
and actor by value (it is tiny); per-origin overrides ride along as dicts.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Optional

from .functions.urlkit import Depth

__all__ = ["BudgetSetting", "ExtractionConfig", "CrawlConfig"]


@dataclass(frozen=True, slots=True)
class BudgetSetting:
    """Budget classes of atra/src/config/crawl.rs:366-471.

    kind ∈ {"single_page", "seed_only", "normal", "absolute"};
    `is_in_budget` reproduces crawl.rs:446-471 exactly:
      seed_only : dts == 0 and (depth_on_website == 0 or dow < depth_on_website)
      normal    : (dow cap as above) and dts <= depth
      absolute  : depth == 0 or tds < depth
      single_page: depth is all-zero (the seed itself)
    recrawl_interval_s: None -> crawl once (crawl.rs:426-442).
    """

    kind: str = "single_page"
    depth_on_website: int = 0
    depth: int = 0
    recrawl_interval_s: Optional[float] = None
    request_timeout_s: Optional[float] = 15.0

    def is_in_budget(self, d: Depth) -> bool:
        if self.kind == "seed_only":
            return d.dts == 0 and (self.depth_on_website == 0 or d.dow < self.depth_on_website)
        if self.kind == "normal":
            return (self.depth_on_website == 0 or d.dow < self.depth_on_website) and d.dts <= self.depth
        if self.kind == "absolute":
            return self.depth == 0 or d.tds < self.depth
        if self.kind == "single_page":
            return d.is_zero()
        raise ValueError(f"unknown budget kind {self.kind!r}")


@dataclass(frozen=True, slots=True)
class ExtractionConfig:
    """Extractor toggles (atra/src/config/crawl.rs:97-107)."""

    respect_nofollow: bool = True
    crawl_embedded_data: bool = False
    crawl_forms: bool = True
    crawl_javascript: bool = True
    crawl_onclick_by_heuristic: bool = True
    # M15: recurse into ZIP members re-running the extractor chain, capped
    # (extraction/deflate.rs; depth cap extractor/mod.rs:116-129)
    max_extraction_depth: int = 10
    max_zip_members: int = 64


@dataclass(frozen=True)
class CrawlConfig:
    budget: BudgetSetting = field(default_factory=BudgetSetting)
    # per-origin budget overrides (crawl.rs:238-253)
    budgets_per_origin: tuple[tuple[str, BudgetSetting], ...] = ()
    extraction: ExtractionConfig = field(default_factory=ExtractionConfig)
    # politeness: fixed delay per origin in (simulated) seconds; robots
    # crawl-delay overrides it upward (intervals.rs:25-96, 1 s fallback)
    delay_s: float = 1.0
    max_queue_age: int = 20          # crawl.rs:96,150 — drop after 20 re-enqueues
    respect_robots_txt: bool = True
    blacklist: tuple[str, ...] = ()  # regex strings (blacklist/lists.rs:112-160)
    use_recrawl: bool = False
    use_sitemaps: bool = False  # seed-origin sitemap expansion (crawler.rs:234-260)
    max_pages_per_host_per_wave: int = 64   # wave-level politeness budget
    user_agent: str = "atra-ray/0.1"
    # J4 per-origin request overrides (config/crawl.rs:161-184: the
    # reference sets custom headers and cookies per configured domain).
    # ``headers`` apply to every request; per-origin entries override
    # same-named global headers; ``cookies_per_origin`` is shorthand for
    # a per-origin Cookie header (exact-origin key match).
    headers: tuple[tuple[str, str], ...] = ()
    headers_per_origin: tuple[tuple[str, tuple[tuple[str, str], ...]], ...] = ()
    cookies_per_origin: tuple[tuple[str, str], ...] = ()

    def request_headers_for(self, origin: str | None) -> dict[str, str]:
        """Effective request headers for one origin: UA + globals,
        overlaid with the origin's own entries and Cookie."""
        out = {"User-Agent": self.user_agent}
        out.update(self.headers)
        if origin is not None:
            for key, hs in self.headers_per_origin:
                if key == origin:
                    out.update(hs)
            for key, c in self.cookies_per_origin:
                if key == origin:
                    out["Cookie"] = c
        return out

    def budget_for(self, origin: str | None) -> BudgetSetting:
        if origin is not None:
            for key, b in self.budgets_per_origin:
                if key == origin:
                    return b
        return self.budget

    def to_dict(self) -> dict:
        return asdict(self)


def store_root() -> str:
    """Root for the co-partitioned build-side stores (MinHash signature /
    text / drop stores, stages/dedup.py). Single-node default is a /tmp
    cache; on a multi-node cluster this MUST point at SHARED storage
    (S3 / NFS) via ``$ATRA_STORE_ROOT`` — the co-partitioned hash joins
    read ``part=K/`` partitions from every node, so a node-local root
    silently breaks the join. The page store (stages/fetch.py) has the
    same contract through its explicit ``store_dir`` argument."""
    import os

    return os.environ.get("ATRA_STORE_ROOT", "/tmp/atra_dedup_store")
