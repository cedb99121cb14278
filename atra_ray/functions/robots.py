"""robots.txt parsing + checking (SURVEY.md M6/T3).

The reference delegates to the ``texting_robots`` crate with a RocksDB +
moka-LRU cache (atra/src/robots/manager_impl.rs:33-155). We implement the
same contract: standard robots.txt group selection (most specific
user-agent group wins; we match our UA token or ``*``), longest-path-match
rule precedence with Allow winning ties, and ``Crawl-delay``. A missing
robots.txt allows everything (robots/manager_impl.rs:120-125).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit

__all__ = ["RobotsRules", "parse_robots", "ALLOW_ALL"]


@dataclass
class RobotsRules:
    # (is_allow, path_prefix) rules of the matched group
    rules: tuple[tuple[bool, str], ...] = ()
    crawl_delay: float | None = None

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
        best_len, best_allow = -1, True
        for allow, prefix in self.rules:
            if not prefix:
                continue
            if path.startswith(prefix):
                if len(prefix) > best_len or (len(prefix) == best_len and allow):
                    best_len, best_allow = len(prefix), allow
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

    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
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
        return ALLOW_ALL
    return RobotsRules(rules=tuple(chosen[0]), crawl_delay=chosen[1])
