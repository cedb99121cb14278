"""Single-threaded oracle simulator (SURVEY.md §5 "our strategy",
FIXTURES.md §6).

Implements the crawl's BSP semantics (§2.6) in plain Python — no Ray — and
is the conformance target for the distributed engine (§7.4: the relation is
"same wave number and same per-host sequence under the same seed list +
politeness budget"). It reuses the *pure* shard-state classes and extraction
kernels (those are covered by their own generator-oracle tests); what it
does NOT share with the engine is everything distributed: Ray actors,
map_batches stages, object-store routing, checkpoint/resume. Engine vs
simulator equality therefore validates the orchestration, exactly-once
admission and routing — not the kernels against themselves.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from .config import CrawlConfig
from .functions.robots import ALLOW_ALL, parse_robots
from .functions.urlkit import (
    Depth,
    canonicalize,
    origin_of,
    origin_shard,
    url_shard,
)
from .stages.extract import extract_one
from .state.frontier import FrontierShardState
from .state.seen import KIND_ERROR, KIND_PROCESSED, SeenShardState

__all__ = ["simulate_crawl"]


def simulate_crawl(
    pages_path: str,
    robots_path: str | None,
    seeds: list[str],
    cfg: CrawlConfig,
    *,
    sitemaps_path: str | None = None,
    redirects_path: str | None = None,
    cookie_walls_path: str | None = None,
    num_frontier_shards: int = 4,
    num_seen_shards: int = 8,
    max_waves: int | None = None,
) -> dict:
    """-> {seen: pa.Table, order: pa.Table, fetched_ok, statuses, waves}"""
    import re

    pages_t = pq.read_table(pages_path, columns=["url", "html"])
    pages = dict(zip(pages_t.column("url").to_pylist(), pages_t.column("html").to_pylist()))

    redirects = {}
    if redirects_path:
        rt = pq.read_table(redirects_path)
        redirects = dict(
            zip(rt.column("url").to_pylist(), rt.column("final_url").to_pylist())
        )

    walls = {}
    if cookie_walls_path:
        wt = pq.read_table(cookie_walls_path)
        walls = dict(
            zip(wt.column("host").to_pylist(), wt.column("cookie").to_pylist())
        )

    robots = {}
    if robots_path and cfg.respect_robots_txt:
        t = pq.read_table(robots_path)
        for host, body in zip(t.column("host").to_pylist(), t.column("robots_txt").to_pylist()):
            robots[host] = parse_robots(body, cfg.user_agent)

    frontier = [
        FrontierShardState(
            i,
            delay_s=cfg.delay_s,
            max_per_host_per_wave=cfg.max_pages_per_host_per_wave,
            max_queue_age=cfg.max_queue_age,
        )
        for i in range(num_frontier_shards)
    ]
    delays = {h: r.crawl_delay for h, r in robots.items() if r.crawl_delay}
    for f in frontier:
        f.set_delays(delays)
    seen = [SeenShardState(j) for j in range(num_seen_shards)]
    blacklist = [re.compile(p) for p in cfg.blacklist]

    def seen_shard(u: str) -> SeenShardState:
        return seen[url_shard(u, num_seen_shards)]

    def frontier_shard(origin: str) -> FrontierShardState:
        return frontier[origin_shard(origin, num_frontier_shards)]

    # seeds (+ web-graph Seed edges, S6)
    edge_rows = {"src": [], "dst": [], "kind": []}
    seed_rows = []
    for s in seeds:
        canon = canonicalize(s)
        if canon is None:
            continue
        origin = origin_of(canon)
        if origin is None:
            continue
        if seen_shard(canon).check_and_add([canon], [True], [(0, 0, 0)])[0]:
            frontier_shard(origin).push(
                [canon], [origin], [0], [0], [0], [True], [0], [0]
            )
            seed_rows.append({"url": canon, "origin": origin})
            edge_rows["src"].append(origin)
            edge_rows["dst"].append(canon)
            edge_rows["kind"].append("seed")

    if cfg.use_sitemaps and sitemaps_path:
        from .functions.sitemaps import (
            sitemap_candidates,
            sitemap_lookup_from_table,
        )

        sm_map = sitemap_lookup_from_table(pq.read_table(sitemaps_path))
        for c in sitemap_candidates(
            seed_rows, sm_map, cfg,
            robots_by_host=robots if cfg.respect_robots_txt else None,
        ):
            if seen_shard(c["url"]).check_and_add(
                [c["url"]], [False], [(c["dow"], c["dts"], c["tds"])]
            )[0]:
                frontier_shard(c["origin"]).push(
                    [c["url"]], [c["origin"]], [c["dow"]], [c["dts"]],
                    [c["tds"]], [False], [0], [0],
                )

    order_rows = {"url": [], "wave": [], "origin": [], "host_seq": []}
    statuses = {"ok": 0, "miss": 0, "robots_denied": 0}
    wave = 0
    while True:
        if max_waves is not None and wave >= max_waves:
            break
        batch_tables = [f.pop_wave(wave) for f in frontier]
        rows = []
        for t in batch_tables:
            rows.extend(t.to_pylist())
        if not rows:
            pending = sum(f.count() for f in frontier)
            if pending:
                wave += 1
                continue
            # A5 recrawl refill (mirrors crawl.py's _recrawl_refill)
            if cfg.use_recrawl and cfg.budget.recrawl_interval_s is not None:
                wave_seconds = cfg.delay_s * cfg.max_pages_per_host_per_wave
                refilled = 0
                for s_ in seen:
                    t = s_.recrawlable(
                        wave, cfg.budget.recrawl_interval_s, wave_seconds
                    )
                    for r in t.to_pylist():
                        torigin = origin_of(r["url"])
                        if torigin is None:
                            continue
                        frontier_shard(torigin).push(
                            [r["url"]], [torigin], [r["dow"]], [r["dts"]],
                            [r["tds"]], [r["is_seed"]], [0], [wave + 1],
                            [r["n_crawls"]],
                        )
                        refilled += 1
                if refilled:
                    wave += 1
                    continue
            break

        wave_links: dict[str, tuple] = {}  # target -> (depth tuple, origin)
        for r in rows:
            url = r["url"]
            order_rows["url"].append(url)
            order_rows["wave"].append(r["wave"])
            order_rows["origin"].append(r["origin"])
            order_rows["host_seq"].append(r["host_seq"])
            host = url.split("/")[2] if "://" in url else ""
            if cfg.respect_robots_txt and not robots.get(host, ALLOW_ALL).is_allowed(url):
                statuses["robots_denied"] += 1
                continue
            eff = redirects.get(url, url)
            body = pages.get(eff)
            if body is not None and walls and "/wall/" in eff:
                required = walls.get(eff.split("/")[2])
                if required is not None and (
                    cfg.request_headers_for(eff.split("/")[2]).get("Cookie")
                    != required
                ):
                    body = None  # cookie wall refused the request (J4)
            if body is None:
                statuses["miss"] += 1
                seen_shard(url).mark([url], KIND_ERROR)
                continue
            statuses["ok"] += 1
            seen_shard(url).mark([url], KIND_PROCESSED, wave)
            _, _, _, _, _, links = extract_one(
                eff, body, Depth(r["dow"], r["dts"], r["tds"]), cfg.extraction
            )
            for t_, o_, kind, dow, dts, tds in links:
                if kind != "data":
                    # web-graph Link edge: pre budget/blacklist (discovery,
                    # not admission) — mirrors the engine's _edge_stage
                    edge_rows["src"].append(eff)
                    edge_rows["dst"].append(t_)
                    edge_rows["kind"].append(kind)
                if kind == "data" or not t_.startswith(("http://", "https://")):
                    continue
                torigin = origin_of(t_)
                if torigin is None:
                    continue
                if not cfg.budget_for(torigin).is_in_budget(Depth(dow, dts, tds)):
                    continue
                if any(p.search(t_) for p in blacklist):
                    continue
                key = (tds, dow, dts)
                prev = wave_links.get(t_)
                if prev is None or key < prev[0]:
                    wave_links[t_] = (key, torigin)

        for t_ in sorted(wave_links):
            (tds, dow, dts), torigin = wave_links[t_]
            if seen_shard(t_).check_and_add([t_], [False], [(dow, dts, tds)])[0]:
                frontier_shard(torigin).push(
                    [t_], [torigin], [dow], [dts], [tds], [False], [0], [wave + 1]
                )
        wave += 1

    seen_table = pa.concat_tables([s.snapshot_table() for s in seen])
    order_table = pa.table(
        {
            "url": pa.array(order_rows["url"], pa.string()),
            "wave": pa.array(order_rows["wave"], pa.uint32()),
            "origin": pa.array(order_rows["origin"], pa.string()),
            "host_seq": pa.array(order_rows["host_seq"], pa.uint32()),
        }
    )
    edges_table = pa.table(
        {
            "src": pa.array(edge_rows["src"], pa.string()),
            "dst": pa.array(edge_rows["dst"], pa.string()),
            "kind": pa.array(edge_rows["kind"], pa.string()),
        }
    )
    return {
        "seen": seen_table,
        "order": order_table,
        "edges": edges_table,
        "fetched_ok": statuses["ok"],
        "statuses": statuses,
        "waves": wave,
    }
