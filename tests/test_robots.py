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
