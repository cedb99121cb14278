"""CLI entry points — the Ray-Data analog of the reference's
``atra multi|recover|dump|view`` commands (atra/src/main.rs:49-51,
app/args.rs:66-125).

    python -m atra_ray crawl   --pages P --seeds F --out D [--robots R]
                               [--sitemaps S] [--redirects R] [--config C]
                               [--resume] [--max-waves N] [--concurrency N]
    python -m atra_ray extract --pages P --out D            (§7.1 slice)
    python -m atra_ray dump    --crawl-out D --out D [--include-text]
    python -m atra_ray view    --crawl-out D [--limit N]

This module OWNS its Ray session (guarded init — the library never calls
ray.init); every command shuts Ray down so the next run starts clean.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _load_config(path: str | None):
    from .config import BudgetSetting, CrawlConfig, ExtractionConfig

    if path is None:
        return CrawlConfig()
    raw = json.loads(open(path).read())
    budget = BudgetSetting(**raw.pop("budget", {}))
    extraction = ExtractionConfig(**raw.pop("extraction", {}))
    overrides = tuple(
        (origin, BudgetSetting(**b))
        for origin, b in raw.pop("budgets_per_origin", {}).items()
    )
    raw.pop("blacklist_list", None)
    blacklist = tuple(raw.pop("blacklist", ()))
    return CrawlConfig(
        budget=budget,
        extraction=extraction,
        budgets_per_origin=overrides,
        blacklist=blacklist,
        **raw,
    )


def cmd_crawl(args) -> int:
    from .pipelines.crawl import run_crawl

    cfg = _load_config(args.config)
    seeds = [s for s in open(args.seeds).read().split() if s]
    _init_ray()
    try:
        summary = run_crawl(
            args.pages,
            args.robots,
            seeds,
            cfg,
            args.out,
            sitemaps_path=args.sitemaps,
            redirects_path=args.redirects,
            fetch_concurrency=args.concurrency,
            max_waves=args.max_waves,
            resume=args.resume,
        )
    finally:
        import ray

        ray.shutdown()
    print(json.dumps({k: v for k, v in summary.items() if k != "lineage"}))
    return 0


def cmd_extract(args) -> int:
    from .pipelines.slice import extract_pages

    _init_ray()
    try:
        ds = extract_pages(args.pages).drop_columns(["links"])
        ds.write_parquet(args.out)
        n = ds.count()
    finally:
        import ray

        ray.shutdown()
    print(json.dumps({"rows": n, "out": args.out}))
    return 0


def cmd_dump(args) -> int:
    from .pipelines.dump import dump_crawl

    _init_ray()
    try:
        n = dump_crawl(args.crawl_out, args.out, include_text=args.include_text)
    finally:
        import ray

        ray.shutdown()
    print(json.dumps({"rows": n, "out": args.out}))
    return 0


def cmd_view(args) -> int:
    """Driver-side row browse (S8) — plain pyarrow, no Ray session."""
    from pathlib import Path

    import pyarrow.dataset as pads

    files = [str(p) for p in Path(args.crawl_out, "results").rglob("*.parquet")]
    t = pads.dataset(files).head(args.limit)
    for row in t.to_pylist():
        row.pop("links", None)
        row.pop("text", None)
        print(json.dumps(row, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="atra_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--pages", required=True)
    c.add_argument("--seeds", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--robots", default=None)
    c.add_argument("--sitemaps", default=None)
    c.add_argument("--redirects", default=None)
    c.add_argument("--config", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--max-waves", type=int, default=None)
    c.add_argument("--concurrency", type=int, default=8)
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("extract")
    e.add_argument("--pages", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_extract)

    d = sub.add_parser("dump")
    d.add_argument("--crawl-out", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--include-text", action="store_true")
    d.set_defaults(fn=cmd_dump)

    v = sub.add_parser("view")
    v.add_argument("--crawl-out", required=True)
    v.add_argument("--limit", type=int, default=10)
    v.set_defaults(fn=cmd_view)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
