"""robots.txt parsing + checking (SURVEY.md M6/T3).

The reference delegates to the ``texting_robots`` crate with a RocksDB +
moka-LRU cache (atra/src/robots/manager_impl.rs:33-155). We implement the
same contract: standard robots.txt group selection (most specific
user-agent group wins; we match our UA token or ``*``), REP wildcard rule
paths (``*`` matches any char run, ``$`` anchors the end — the Google REP
/ RFC 9309 semantics texting_robots implements), longest-pattern-match
rule precedence with Allow winning ties, percent-encoding normalization,
and ``Crawl-delay``. A missing robots.txt allows everything
(robots/manager_impl.rs:120-125).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import quote, unquote, urlsplit

__all__ = ["RobotsRules", "parse_robots", "ALLOW_ALL"]

# characters that stay literal when re-percent-encoding a rule/path for
# comparison (RFC 9309: compare in a consistent encoding; we normalize both
# sides with urllib's quote over the unquoted form, keeping sub-delims)
_SAFE = "/:@!$&'()*+,;=~-._"


_KEEP_ESCAPED_RE = re.compile(r"%2F|%23", re.IGNORECASE)


def _normalize_path(path: str) -> str:
    """Percent-decoding + consistent re-encoding so '%7Ejoe' and '~joe'
    compare equal on both the rule and the URL side. ``%2F`` and ``%23``
    stay ESCAPED: RFC 9309 (and texting_robots) keep an encoded slash
    distinct from the path separator, so a rule ``/a%2Fb`` must not match
    the path ``/a/b`` — the pieces around them are normalized, the escape
    itself survives verbatim (uppercased)."""
    try:
        pieces = _KEEP_ESCAPED_RE.split(path)
        seps = [m.group(0).upper() for m in _KEEP_ESCAPED_RE.finditer(path)]
        out = []
        for i, piece in enumerate(pieces):
            out.append(quote(unquote(piece), safe=_SAFE))
            if i < len(seps):
                out.append(seps[i])
        return "".join(out)
    except Exception:  # pragma: no cover - malformed escapes stay literal
        return path


def _compile_rule(pattern: str) -> "re.Pattern | None":
    """Rule path -> anchored regex. ``*`` -> ``.*``; trailing ``$`` anchors
    the end; everything else is literal (after percent normalization).
    Returns None for patterns that can never match (empty)."""
    if not pattern:
        return None
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    parts = [re.escape(_normalize_path(p)) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored_end else ""))


@dataclass
class RobotsRules:
    # (is_allow, raw_pattern) rules of the matched group
    rules: tuple[tuple[bool, str], ...] = ()
    crawl_delay: float | None = None
    # ``Sitemap:`` declarations — file-wide per RFC 9309 §2.3 / the
    # sitemaps.org protocol (not scoped to any user-agent group); the
    # crawler seeds sitemap expansion from these (crawler/sitemaps.rs:43-49
    # reads robot.sitemaps() first)
    sitemaps: tuple[str, ...] = ()
    _compiled: tuple = field(default=None, repr=False, compare=False)  # type: ignore[assignment]

    def _rules_compiled(self):
        """(is_allow, specificity, regex) triples, compiled once.
        Specificity = pattern length (texting_robots/Google REP: the
        longest matching pattern wins; Allow wins equal-length ties)."""
        if self._compiled is None:
            compiled = []
            for allow, pat in self.rules:
                rx = _compile_rule(pat)
                if rx is not None:
                    compiled.append((allow, len(pat), rx))
            object.__setattr__(self, "_compiled", tuple(compiled))
        return self._compiled

    def is_allowed(self, url_or_path: str) -> bool:
        path = url_or_path
        if "://" in url_or_path:
            try:
                p = urlsplit(url_or_path)
                path = p.path or "/"
                if p.query:
                    path += "?" + p.query
            except ValueError:
                path = "/"
        path = _normalize_path(path)
        best_spec, best_allow = -1, True
        for allow, spec, rx in self._rules_compiled():
            if rx.match(path) and (
                spec > best_spec or (spec == best_spec and allow)
            ):
                best_spec, best_allow = spec, allow
        return best_allow


ALLOW_ALL = RobotsRules()


def parse_robots(body: bytes | str | None, user_agent: str = "atra-ray") -> RobotsRules:
    if body is None:
        return ALLOW_ALL
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    ua_token = user_agent.split("/")[0].lower()

    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    last_was_agent = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    sitemap_urls: list[str] = []
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "sitemap":
            # file-wide directive: collected regardless of group position
            # and never alters group-parsing state
            if val:
                sitemap_urls.append(val)
            continue
        if key == "user-agent":
            if not last_was_agent:
                flush()
            cur_agents.append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "allow":
            cur_rules.append((True, val))
        elif key == "disallow":
            cur_rules.append((False, val))
        elif key == "crawl-delay":
            try:
                cur_delay = float(val)
            except ValueError:
                pass
    flush()

    # pick the most specific matching group: exact UA token > '*'
    chosen = None
    for agents, rules, delay in groups:
        if any(a != "*" and a in ua_token for a in agents):
            chosen = (rules, delay)
            break
    if chosen is None:
        for agents, rules, delay in groups:
            if "*" in agents:
                chosen = (rules, delay)
                break
    if chosen is None:
        if sitemap_urls:
            return RobotsRules(sitemaps=tuple(sitemap_urls))
        return ALLOW_ALL
    return RobotsRules(
        rules=tuple(chosen[0]),
        crawl_delay=chosen[1],
        sitemaps=tuple(sitemap_urls),
    )
