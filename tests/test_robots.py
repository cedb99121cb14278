"""robots.txt semantics (atra/src/robots/* contract)."""

from atra_ray.functions.robots import ALLOW_ALL, parse_robots


def test_missing_robots_allows_all():
    assert parse_robots(None).is_allowed("https://x.example/anything")
    assert ALLOW_ALL.is_allowed("/x")


def test_disallow_prefix():
    r = parse_robots(b"User-agent: *\nDisallow: /blocked/\n")
    assert not r.is_allowed("https://h.example/blocked/p5")
    assert r.is_allowed("https://h.example/p5")
    assert r.is_allowed("https://h.example/")


def test_allow_overrides_longer_match():
    r = parse_robots(b"User-agent: *\nDisallow: /a/\nAllow: /a/ok/\n")
    assert not r.is_allowed("/a/x")
    assert r.is_allowed("/a/ok/x")


def test_allow_wins_ties():
    r = parse_robots(b"User-agent: *\nDisallow: /dir/\nAllow: /dir/\n")
    assert r.is_allowed("/dir/x")


def test_crawl_delay():
    r = parse_robots(b"User-agent: *\nCrawl-delay: 2\n")
    assert r.crawl_delay == 2.0
    assert r.is_allowed("/x")


def test_specific_agent_group_wins():
    body = b"User-agent: atra-ray\nDisallow: /private/\n\nUser-agent: *\nDisallow: /\n"
    r = parse_robots(body, "atra-ray/0.1")
    assert not r.is_allowed("/private/x")
    assert r.is_allowed("/public")
    other = parse_robots(body, "otherbot/1.0")
    assert not other.is_allowed("/anything")


def test_empty_disallow_means_allow():
    r = parse_robots(b"User-agent: *\nDisallow:\n")
    assert r.is_allowed("/x")


def test_wildcard_star():
    r = parse_robots(b"User-agent: *\nDisallow: /*.php\n")
    assert not r.is_allowed("/index.php")
    assert not r.is_allowed("/a/b/page.php?x=1")
    assert r.is_allowed("/index.html")


def test_wildcard_end_anchor():
    r = parse_robots(b"User-agent: *\nDisallow: /*.php$\n")
    assert not r.is_allowed("/index.php")
    assert r.is_allowed("/index.php?x=1")  # $ anchors the end
    assert r.is_allowed("/index.phpx")


def test_wildcard_mid_pattern():
    r = parse_robots(b"User-agent: *\nDisallow: /fish*.html\n")
    assert not r.is_allowed("/fishheads/catfish.html")
    assert not r.is_allowed("/fish.html")
    assert r.is_allowed("/fish.txt")


def test_wildcard_allow_beats_disallow_by_length():
    r = parse_robots(b"User-agent: *\nDisallow: /*.htm\nAllow: /public/*.htm\n")
    assert r.is_allowed("/public/a.htm")
    assert not r.is_allowed("/private/a.htm")


def test_percent_encoding_normalized():
    r = parse_robots(b"User-agent: *\nDisallow: /%7Ejoe/\n")
    assert not r.is_allowed("/~joe/file")
    assert not r.is_allowed("/%7Ejoe/file")
    r2 = parse_robots(b"User-agent: *\nDisallow: /~joe/\n")
    assert not r2.is_allowed("/%7Ejoe/file")


def test_dollar_only_matters_at_end():
    # '$' not at the end is literal per REP
    r = parse_robots(b"User-agent: *\nDisallow: /a$b\n")
    assert r.is_allowed("/ab")
    assert not r.is_allowed("/a$b/c")


def test_encoded_slash_stays_distinct():
    """ADVICE r2: RFC 9309 keeps %2F distinct from the path separator — a
    rule /a%2Fb must NOT match the path /a/b (and vice versa)."""
    from atra_ray.functions.robots import parse_robots

    r = parse_robots(b"User-agent: *\nDisallow: /a%2Fb\n")
    assert r.is_allowed("/a/b")
    assert not r.is_allowed("/a%2Fb")
    assert not r.is_allowed("/a%2fb")  # case-insensitive escape
    r2 = parse_robots(b"User-agent: *\nDisallow: /a/b\n")
    assert not r2.is_allowed("/a/b")
    assert r2.is_allowed("/a%2Fb")
    # normalization of OTHER escapes still applies around the kept ones
    r3 = parse_robots(b"User-agent: *\nDisallow: /%7Ejoe%2Fx\n")
    assert not r3.is_allowed("/~joe%2Fx")
    assert r3.is_allowed("/~joe/x")


def test_robots_sitemap_discovery():
    """``Sitemap:`` is a file-wide directive (RFC 9309 §2.3): collected
    regardless of group position, and surviving even when no UA group
    matches."""
    body = (
        b"Sitemap: https://a.example/sitemap.xml\n"
        b"User-agent: *\nDisallow: /x\n"
        b"Sitemap: https://a.example/sitemap-news.xml\n"
    )
    r = parse_robots(body, "atra-ray")
    assert r.sitemaps == (
        "https://a.example/sitemap.xml",
        "https://a.example/sitemap-news.xml",
    )
    assert not r.is_allowed("/x")
    only_other_group = b"User-agent: bingbot\nDisallow: /\nSitemap: https://b.example/s.xml\n"
    r2 = parse_robots(only_other_group, "atra-ray")
    assert r2.sitemaps == ("https://b.example/s.xml",)
    assert r2.is_allowed("/anything")


def test_parse_sitemap_urlset_vs_index():
    from atra_ray.functions.sitemaps import parse_sitemap

    urlset = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://h/p1</loc></url><url><loc>https://h/p2</loc></url>"
        "</urlset>"
    )
    assert parse_sitemap(urlset) == (["https://h/p1", "https://h/p2"], [])
    index = (
        '<?xml version="1.0"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://h/a.xml</loc></sitemap>"
        "<sitemap><loc>https://h/b.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert parse_sitemap(index) == ([], ["https://h/a.xml", "https://h/b.xml"])
    # malformed XML: lenient link scan, no recursion
    urls, children = parse_sitemap(b"<urlset><url><loc>https://h/p3</loc>")
    assert children == [] and urls == ["https://h/p3"]


def test_sitemap_candidates_recursion_capped():
    """A self-referential index never loops: the visited set and depth cap
    bound the walk."""
    from atra_ray.config import CrawlConfig
    from atra_ray.functions.sitemaps import sitemap_candidates

    idx = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://h.example/sitemap.xml</loc></sitemap>"
        "<sitemap><loc>https://h.example/leaf.xml</loc></sitemap>"
        "</sitemapindex>"
    ).encode()
    leaf = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://h.example/p9</loc></url></urlset>"
    ).encode()
    lookup = {
        "h.example": idx,
        "https://h.example/sitemap.xml": idx,  # self-loop
        "https://h.example/leaf.xml": leaf,
    }
    cfg = CrawlConfig()
    from atra_ray.config import BudgetSetting

    cfg = CrawlConfig(budget=BudgetSetting(kind="absolute", depth=3))
    rows = [{"url": "https://h.example/p0"}]
    cand = sitemap_candidates(rows, lookup, cfg)
    assert [c["url"] for c in cand] == ["https://h.example/p9"]
