"""Full BSP crawl vs the single-threaded oracle simulator (FIXTURES.md §6):
URL-seen set equality, crawl-order conformance (wave + per-host sequence),
robots/budget/blacklist effects, and resume-equals-uninterrupted."""

import shutil
from pathlib import Path

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from atra_ray.config import BudgetSetting, CrawlConfig
from atra_ray.pipelines.crawl import run_crawl
from atra_ray.simulator import simulate_crawl

CFG = CrawlConfig(budget=BudgetSetting(kind="absolute", depth=3))


def _seen_map(t):
    return {
        u: (k, a, b, c)
        for u, k, a, b, c in zip(
            t.column("url").to_pylist(),
            t.column("kind").to_pylist(),
            t.column("dow").to_pylist(),
            t.column("dts").to_pylist(),
            t.column("tds").to_pylist(),
        )
    }


def _order_map(t):
    return {
        u: (w, s)
        for u, w, s in zip(
            t.column("url").to_pylist(),
            t.column("wave").to_pylist(),
            t.column("host_seq").to_pylist(),
        )
    }


def _results_table(out_dir, columns):
    files = [str(p) for p in Path(out_dir, "results").rglob("*.parquet")]
    return pads.dataset(files).to_table(columns=columns)


@pytest.fixture(scope="module")
def crawl_pair(ray_session, fixtures_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl") / "run")
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    sim = simulate_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        CFG,
    )
    eng = run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        CFG,
        out,
    )
    return sim, eng, out


def test_seen_set_matches_simulator(crawl_pair):
    sim, eng, out = crawl_pair
    engine_seen = _seen_map(pq.read_table(Path(out) / "link_state.parquet"))
    assert engine_seen == _seen_map(sim["seen"])
    assert eng["seen_urls"] == sim["seen"].num_rows


def test_crawl_order_matches_simulator(crawl_pair):
    sim, eng, out = crawl_pair
    engine_order = _order_map(_results_table(out, ["url", "wave", "host_seq"]))
    assert engine_order == _order_map(sim["order"])


def test_web_graph_edges_match_simulator(crawl_pair):
    """S6 web-graph sink: seed edges + per-wave link edges (pre
    budget/blacklist) equal the simulator's edge multiset."""
    from atra_ray.pipelines.dump import edges_of_crawl

    sim, eng, out = crawl_pair
    t = edges_of_crawl(out)
    eng_edges = sorted(zip(*[t.column(c).to_pylist() for c in ("src", "dst", "kind")]))
    st = sim["edges"]
    sim_edges = sorted(zip(*[st.column(c).to_pylist() for c in ("src", "dst", "kind")]))
    assert eng_edges == sim_edges
    assert any(k == "seed" for _, _, k in eng_edges)


def test_statuses_match(crawl_pair):
    sim, eng, out = crawl_pair
    t = _results_table(out, ["status"])
    import collections

    counts = collections.Counter(t.column("status").to_pylist())
    assert dict(counts) == {k: v for k, v in sim["statuses"].items() if v}
    assert eng["fetched_ok"] == sim["statuses"]["ok"]


def test_robots_blocked_pages_not_fetched(crawl_pair):
    sim, eng, out = crawl_pair
    t = _results_table(out, ["url", "status"])
    for url, status in zip(t.column("url").to_pylist(), t.column("status").to_pylist()):
        if "/blocked/" in url:
            assert status == "robots_denied", url


def test_budget_limits_depth(crawl_pair):
    sim, eng, out = crawl_pair
    seen = pq.read_table(Path(out) / "link_state.parquet")
    assert max(seen.column("tds").to_pylist()) < 3  # absolute depth 3


def test_backlog_waves_use_big_path(ray_session, fixtures_small, tmp_path):
    """Politeness-capped crawls carry a BACKLOG: later waves pop many rows
    while admitting ~0 fresh links. Path selection must key on the wave's
    actual popped rows, never on last-wave admissions — a backlog wave
    funneled through the single-task small path would serialize the whole
    fetch. Also conformance-checks the capped crawl against the simulator."""
    cfg = CrawlConfig(
        budget=BudgetSetting(kind="absolute", depth=3),
        max_pages_per_host_per_wave=2,  # tight cap -> multi-wave backlog
    )
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    out = str(tmp_path / "backlog")
    eng = run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        cfg,
        out,
        small_wave_max=4,
    )
    waves = [l for l in eng["lineage"] if "small_path" in l]
    assert any(l["emitted"] > 4 for l in waves)  # backlog waves exist
    for l in waves:
        if l["emitted"] > 4:
            assert l["small_path"] is False, l
    sim = simulate_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        cfg,
    )
    engine_seen = _seen_map(pq.read_table(Path(out) / "link_state.parquet"))
    assert engine_seen == _seen_map(sim["seen"])


@pytest.mark.parametrize("small_wave_max", [None, 0])
def test_blacklist_filters_host(ray_session, fixtures_small, tmp_path, small_wave_max):
    """Both orchestration paths (small-wave raw task: default at this
    corpus size; Dataset path: forced via small_wave_max=0) must apply
    the blacklist at link admission AND at poll time."""
    cfg = CrawlConfig(
        budget=BudgetSetting(kind="absolute", depth=2),
        blacklist=(r"host3\.example",),
    )
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    sim = simulate_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        cfg,
    )
    out = str(tmp_path / "bl")
    eng = run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        cfg,
        out,
        small_wave_max=small_wave_max,
    )
    engine_seen = _seen_map(pq.read_table(Path(out) / "link_state.parquet"))
    assert engine_seen == _seen_map(sim["seen"])
    # host3 can only appear via its seed (blacklist filters discovered links,
    # not the seed list itself — seeds enter before the link filters)
    non_seed_host3 = [
        u for u, (k, a, b, c) in engine_seen.items()
        if "host3.example" in u and (a, b, c) != (0, 0, 0)
    ]
    assert non_seed_host3 == []


def test_resume_equals_uninterrupted(ray_session, fixtures_small, tmp_path):
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    pages = str(fixtures_small / "pages.parquet")
    robots = str(fixtures_small / "robots.parquet")

    full_out = str(tmp_path / "full")
    full = run_crawl(pages, robots, seeds, CFG, full_out)

    part_out = str(tmp_path / "part")
    run_crawl(pages, robots, seeds, CFG, part_out, max_waves=1)  # "kill" after wave 0
    resumed = run_crawl(pages, robots, seeds, CFG, part_out, resume=True)

    a = _seen_map(pq.read_table(Path(full_out) / "link_state.parquet"))
    b = _seen_map(pq.read_table(Path(part_out) / "link_state.parquet"))
    assert a == b
    assert resumed["last_wave"] == full["last_wave"]


def test_recrawl_refill(ray_session, fixtures_small, tmp_path_factory):
    """A5: with use_recrawl + a short interval, drained frontiers refill
    from PROCESSED link states and pages are re-fetched in later waves —
    engine and simulator agree on the re-fetch trace."""
    cfg = CrawlConfig(
        budget=BudgetSetting(kind="absolute", depth=2, recrawl_interval_s=1.0),
        use_recrawl=True,
    )
    out = str(tmp_path_factory.mktemp("recrawl") / "run")
    seeds = (fixtures_small / "seeds.txt").read_text().split()[:2]
    sim = simulate_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds, cfg, max_waves=6,
    )
    eng = run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds, cfg, out, max_waves=6,
    )
    t = _results_table(out, ["url", "wave"])
    eng_trace = sorted(zip(t.column("url").to_pylist(), t.column("wave").to_pylist()))
    sim_trace = sorted(
        zip(sim["order"].column("url").to_pylist(), sim["order"].column("wave").to_pylist())
    )
    assert eng_trace == sim_trace
    # at least one url fetched in more than one wave
    from collections import Counter

    counts = Counter(u for u, _ in eng_trace)
    assert max(counts.values()) >= 2
    # the recrawl-score plumbing: re-fetched urls carry n_crawls >= 2 in
    # the exported link state (the frontier orders by it within a host)
    import pyarrow.parquet as _pq

    ls = _pq.read_table(Path(out) / "link_state.parquet")
    nc = dict(zip(ls.column("url").to_pylist(), ls.column("n_crawls").to_pylist()))
    refetched = [u for u, c in counts.items() if c >= 2]
    assert refetched and all(nc[u] >= 2 for u in refetched)


def test_sitemap_expansion(ray_session, fixtures_small, tmp_path):
    """Sitemap-listed pages (including link-unreachable ones) enter the
    frontier as children of the seed; engine equals simulator."""
    cfg = CrawlConfig(
        budget=BudgetSetting(kind="absolute", depth=3), use_sitemaps=True
    )
    pages = str(fixtures_small / "pages.parquet")
    robots = str(fixtures_small / "robots.parquet")
    sitemaps = str(fixtures_small / "sitemaps.parquet")
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    sim = simulate_crawl(pages, robots, seeds, cfg, sitemaps_path=sitemaps)
    out = str(tmp_path / "sm")
    run_crawl(pages, robots, seeds, cfg, out, sitemaps_path=sitemaps)
    a = _seen_map(pq.read_table(Path(out) / "link_state.parquet"))
    assert a == _seen_map(sim["seen"])
    # without sitemaps, strictly fewer urls are discovered
    base = simulate_crawl(pages, robots, seeds, CFG)
    assert sim["seen"].num_rows > base["seen"].num_rows
    # host0 publishes a TWO-LEVEL <sitemapindex> tree whose root is
    # discoverable only through its robots ``Sitemap:`` declaration —
    # the leaf urlsets' pages must still land in the engine's seen set
    # (index recursion + robots discovery, VERDICT r2 item 8)
    from atra_ray.sources.fixtures import _page_path

    leaf_pages = {f"https://host0.example{_page_path(0, k)}" for k in range(10)}
    assert leaf_pages <= set(a), "sitemapindex leaves missing from crawl_seen"


def test_redirects_resolved(ray_session, fixtures_small, tmp_path):
    """Fetch resolves /r{j} through redirects.parquet: body + link base are
    the FINAL url, frontier identity stays the original; engine == sim."""
    pages = str(fixtures_small / "pages.parquet")
    robots = str(fixtures_small / "robots.parquet")
    redirects = str(fixtures_small / "redirects.parquet")
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    sim = simulate_crawl(pages, robots, seeds, CFG, redirects_path=redirects)
    out = str(tmp_path / "rd")
    run_crawl(pages, robots, seeds, CFG, out, redirects_path=redirects)
    assert _seen_map(pq.read_table(Path(out) / "link_state.parquet")) == _seen_map(sim["seen"])
    t = _results_table(out, ["url", "final_url", "status"])
    redirected = [
        (u, f) for u, f, s in zip(
            t.column("url").to_pylist(),
            t.column("final_url").to_pylist(),
            t.column("status").to_pylist(),
        )
        if f is not None and s == "ok"
    ]
    assert redirected, "at least one /r{j} url crawled through a redirect"
    assert all("/r" in u and f.split("/")[2] == u.split("/")[2] for u, f in redirected)


@pytest.mark.usefixtures("ray_session")
def test_blacklist_hot_append(fixtures_small, tmp_path):
    """T4: patterns appended to the blacklist file between runs take
    effect on resume (the per-wave reload path)."""
    from atra_ray.config import BudgetSetting, CrawlConfig
    from atra_ray.pipelines.crawl import run_crawl

    bl = tmp_path / "blacklist.txt"
    bl.write_text("")  # starts empty
    cfg = CrawlConfig(budget=BudgetSetting(kind="absolute", depth=3))
    out = str(tmp_path / "crawl")
    s1 = run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        (fixtures_small / "seeds.txt").read_text().split(),
        cfg,
        out,
        blacklist_path=str(bl),
        max_waves=1,
        fetch_concurrency=2,
    )
    assert s1["fetched_ok"] > 0
    # append a pattern that kills every host3 link, then continue
    bl.write_text("host3\\.example\n")
    s2 = run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        (fixtures_small / "seeds.txt").read_text().split(),
        cfg,
        out,
        blacklist_path=str(bl),
        resume=True,
        fetch_concurrency=2,
    )
    import pyarrow.parquet as pq

    seen = pq.read_table(f"{out}/link_state.parquet")
    later = [
        u
        for u, cw in zip(
            seen.column("url").to_pylist(), seen.column("kind").to_pylist()
        )
        if "host3.example" in u
    ]
    # host3 urls discovered in wave 0 may exist; none admitted after the
    # append should appear beyond what wave 0 registered
    results = [
        str(p) for p in (tmp_path / "crawl" / "results").rglob("*.parquet")
    ]
    import pyarrow.dataset as pads

    t = pads.dataset(results).to_table(columns=["url", "wave"])
    fetched_after = [
        u
        for u, w in zip(t.column("url").to_pylist(), t.column("wave").to_pylist())
        if "host3.example" in u and w >= 1
    ]
    # poll-time check: even urls already queued before the append are
    # stopped (UrlChecker semantics), so nothing host3 after wave 0
    assert fetched_after == []
    assert s2["waves"] >= 1


def test_big_wave_path_equals_small_path(ray_session, fixtures_small, tmp_path, crawl_pair):
    """The small-wave fast path (one raw task per wave) and the Dataset
    path (repartition + map_batches + partitioned link exchange) share
    their kernel closures but not their orchestration; force EVERY wave
    through the Dataset path (small_wave_max=0) and the link state, crawl
    order and results rows must be identical to the default run (which at
    this corpus size takes the small path on every wave)."""
    _, _, full_out = crawl_pair
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    out = str(tmp_path / "bigpath")
    run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        CFG,
        out,
        small_wave_max=0,
    )
    assert _seen_map(pq.read_table(Path(out) / "link_state.parquet")) == _seen_map(
        pq.read_table(Path(full_out) / "link_state.parquet")
    )
    big = _results_table(out, ["url", "status", "text"])
    small = _results_table(full_out, ["url", "status", "text"])
    to_map = lambda t: dict(  # noqa: E731
        zip(
            t.column("url").to_pylist(),
            zip(t.column("status").to_pylist(), t.column("text").to_pylist()),
        )
    )
    assert to_map(big) == to_map(small)


def test_capped_frontier_equals_unbounded(ray_session, fixtures_small, tmp_path, crawl_pair):
    """At-scale frontier memory model (the reference's file-backed queue
    analog): cap each origin's resident heap at 2 entries — far below the
    per-origin queue depths this corpus produces — and the crawl's link
    state and crawl order must be IDENTICAL to the unbounded run (exact
    Parquet-spill refill, state/frontier.py)."""
    _, _, full_out = crawl_pair
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    out = str(tmp_path / "fcapped")
    run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        CFG,
        out,
        frontier_max_resident=2,
    )
    assert _seen_map(pq.read_table(Path(out) / "link_state.parquet")) == _seen_map(
        pq.read_table(Path(full_out) / "link_state.parquet")
    )
    assert Path(out, "frontier_spill").exists()


def test_capped_seen_memory_equals_unbounded(ray_session, fixtures_small, tmp_path, crawl_pair):
    """VERDICT r3 item 1 done-criterion: cap each seen shard's resident
    record cache far below the corpus size (~240 urls over 8 shards with
    a 8-record cap) and the crawl's authoritative link state must be
    IDENTICAL to the unbounded run — bloom fast path, Parquet spill and
    exact anti-join answering exactly like the all-resident dict."""
    _, _, full_out = crawl_pair
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    out = str(tmp_path / "capped")
    run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        CFG,
        out,
        seen_max_resident=8,
    )
    capped = _seen_map(pq.read_table(Path(out) / "link_state.parquet"))
    full = _seen_map(pq.read_table(Path(full_out) / "link_state.parquet"))
    assert capped == full
    # spill actually engaged (corpus >> cap)
    assert list(Path(out, "seen_spill").rglob("spill-*.parquet"))


def test_cookie_wall_per_origin_overrides(ray_session, fixtures_small, tmp_path):
    """J4 per-origin request overrides (config/crawl.rs:161-184): with the
    wall table served, /wall/ pages fetch ONLY when
    ``cfg.cookies_per_origin`` carries the host's cookie — and engine ==
    simulator in both configurations (misses and order alike)."""
    import pyarrow.parquet as _pq

    walls_t = _pq.read_table(fixtures_small / "cookies.parquet")
    assert walls_t.num_rows >= 1
    wall_host = walls_t.column("host")[0].as_py()
    cookie = walls_t.column("cookie")[0].as_py()
    seeds = [f"https://{wall_host}/p0"]
    base = dict(budget=BudgetSetting(kind="absolute", depth=4))
    results = {}
    for label, cfg in (
        ("locked", CrawlConfig(**base)),
        ("keyed", CrawlConfig(**base, cookies_per_origin=((wall_host, cookie),))),
    ):
        sim = simulate_crawl(
            str(fixtures_small / "pages.parquet"),
            str(fixtures_small / "robots.parquet"),
            seeds, cfg,
            cookie_walls_path=str(fixtures_small / "cookies.parquet"),
        )
        out = str(tmp_path / label)
        run_crawl(
            str(fixtures_small / "pages.parquet"),
            str(fixtures_small / "robots.parquet"),
            seeds, cfg, out,
            cookie_walls_path=str(fixtures_small / "cookies.parquet"),
            fetch_concurrency=2,
        )
        t = _results_table(out, ["url", "status"])
        eng = dict(zip(t.column("url").to_pylist(), t.column("status").to_pylist()))
        ls = _pq.read_table(Path(out) / "link_state.parquet")
        sim_kinds = dict(
            zip(sim["seen"].column("url").to_pylist(), sim["seen"].column("kind").to_pylist())
        )
        eng_kinds = dict(zip(ls.column("url").to_pylist(), ls.column("kind").to_pylist()))
        assert eng_kinds == sim_kinds, label
        results[label] = eng
    # only REAL wall pages gate on the cookie — dir-relative links from a
    # /wall/ page also resolve under /wall/ but point at nonexistent urls
    # (miss in both configurations, engine == sim above)
    existing = set(
        _pq.read_table(fixtures_small / "pages.parquet", columns=["url"])
        .column("url")
        .to_pylist()
    )
    locked_wall = {
        u: s for u, s in results["locked"].items()
        if "/wall/" in u and u in existing
    }
    keyed_wall = {
        u: s for u, s in results["keyed"].items()
        if "/wall/" in u and u in existing
    }
    assert locked_wall and set(locked_wall.values()) == {"miss"}
    assert keyed_wall and set(keyed_wall.values()) == {"ok"}


def test_request_headers_merge_order():
    """Per-origin headers override same-named globals; cookies ride as
    the origin's Cookie header; unconfigured origins see globals only."""
    cfg = CrawlConfig(
        headers=(("Accept-Language", "en"), ("X-Trace", "g")),
        headers_per_origin=(("h1.example", (("Accept-Language", "de"),)),),
        cookies_per_origin=(("h1.example", "sid=abc"),),
    )
    h1 = cfg.request_headers_for("h1.example")
    assert h1["Accept-Language"] == "de" and h1["Cookie"] == "sid=abc"
    assert h1["X-Trace"] == "g" and h1["User-Agent"] == cfg.user_agent
    other = cfg.request_headers_for("h2.example")
    assert other["Accept-Language"] == "en" and "Cookie" not in other


@pytest.mark.usefixtures("ray_session")
def test_randomized_config_conformance(fixtures_small, tmp_path):
    """Seeded random CONFIG sweep: budget kind/depths, wave quota,
    robots on/off, blacklist, per-origin budget override — for each
    sampled config the engine's URL-seen set and crawl order must equal
    the single-threaded simulator's under the same seeds."""
    import random

    rng = random.Random(20260819)
    seeds = (fixtures_small / "seeds.txt").read_text().split()
    kinds = ["absolute", "normal", "seed_only"]
    for trial in range(4):
        kind = kinds[trial % len(kinds)]
        budget = BudgetSetting(
            kind=kind,
            depth=rng.randint(1, 3),
            depth_on_website=rng.choice([0, rng.randint(1, 3)]),
        )
        cfg = CrawlConfig(
            budget=budget,
            budgets_per_origin=(
                ("host1.example", BudgetSetting(kind="absolute", depth=1)),
            )
            if rng.random() < 0.5
            else (),
            respect_robots_txt=rng.random() < 0.7,
            blacklist=("host3",) if rng.random() < 0.4 else (),
            max_pages_per_host_per_wave=rng.choice([2, 7, 64]),
        )
        out = str(tmp_path / f"run{trial}")
        sim = simulate_crawl(
            str(fixtures_small / "pages.parquet"),
            str(fixtures_small / "robots.parquet"),
            seeds,
            cfg,
        )
        eng = run_crawl(
            str(fixtures_small / "pages.parquet"),
            str(fixtures_small / "robots.parquet"),
            seeds,
            cfg,
            out,
        )
        got_seen = _seen_map(pq.read_table(Path(out) / "link_state.parquet"))
        want_seen = _seen_map(sim["seen"])
        assert got_seen == want_seen, f"trial {trial} cfg={cfg}"
        got_order = _order_map(
            _results_table(out, ["url", "wave", "host_seq"])
        )
        want_order = _order_map(sim["order"])
        assert got_order == want_order, f"trial {trial} cfg={cfg}"
