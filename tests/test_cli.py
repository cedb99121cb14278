"""CLI surface (__main__.py) — config loading + one end-to-end subprocess
run of crawl/dump/view over the smoke fixture."""

import json
import subprocess
import sys

from atra_ray.__main__ import _load_config


def test_config_from_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "budget": {"kind": "absolute", "depth": 2},
        "extraction": {"crawl_javascript": False},
        "budgets_per_origin": {"host3.example": {"kind": "single_page"}},
        "blacklist": ["bad\\.example"],
        "delay_s": 2.0,
        "use_sitemaps": True,
    }))
    cfg = _load_config(str(p))
    assert cfg.budget.kind == "absolute" and cfg.budget.depth == 2
    assert cfg.extraction.crawl_javascript is False
    assert cfg.budget_for("host3.example").kind == "single_page"
    assert cfg.blacklist == ("bad\\.example",)
    assert cfg.delay_s == 2.0 and cfg.use_sitemaps
    assert _load_config(None).budget.kind == "single_page"


def test_cli_crawl_dump_view(fixtures_small, tmp_path):
    out = str(tmp_path / "crawl")
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps({"budget": {"kind": "absolute", "depth": 2}}))
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "atra_ray", "crawl",
         "--pages", str(fixtures_small / "pages.parquet"),
         "--seeds", str(fixtures_small / "seeds.txt"),
         "--robots", str(fixtures_small / "robots.parquet"),
         "--config", str(cfgp), "--out", out, "--concurrency", "2"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["fetched_ok"] > 0

    r = subprocess.run(
        [sys.executable, "-m", "atra_ray", "dump",
         "--crawl-out", out, "--out", str(tmp_path / "dump")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    dump_rows = json.loads(r.stdout.strip().splitlines()[-1])["rows"]
    assert dump_rows >= summary["fetched_ok"]  # results include misses/denied

    r = subprocess.run(
        [sys.executable, "-m", "atra_ray", "view", "--crawl-out", out, "--limit", "3"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.strip().splitlines()]
    assert len(rows) == 3 and "url" in rows[0]
