"""BSP crawl driver (SURVEY.md §2.6, §3.1, §7.2 steps 4-8).

The reference's crawl loop is an incremental fixpoint over a shared queue
with a cooperative termination barrier (atra/src/sync/barrier.rs:33-130,
crawl/mod.rs:62-165, app/atra.rs:268-341). In Ray Data that becomes
driver-side BSP rounds ("waves"):

    while frontier non-empty:
        wave     = union of FrontierShard.pop_wave(w)        (politeness-bounded)
        results  = wave →  map_batches(fetch task pool)      (fetch ⋈ pages + extract)
        write      results → out/results/round=w/            (Parquet, resumable)
        mark       crawled urls in seen shards               (link-state upsert)
        links    = per-block tasks: explode(results.links) → budget/
                   blacklist filter → local min(depth) combine → split by
                   seen-shard url hash                       (map side, A1)
                   → SeenShard.admit_blocks: global min + check_and_add
                     (ownership = url-hash partition ⇒ per-shard min is
                     the global min; global exactly-once)
                   → FrontierShard.push (routed by origin hash)
        checkpoint frontier + seen + lineage → out/chk/round=w/ (+_SUCCESS)

Scale notes (10^10 frontier / 256 nodes):
- a wave never touches the driver: frontier batches are Arrow tables in
  the object store (`from_arrow_refs`), results stream to Parquet, link
  routing happens inside map_batches tasks that talk to the shard actors
  directly. Driver state is O(#shards) counters.
- the ONE materialize() is the current wave's results (bounded by the
  politeness budget: ≤ max_per_host × active_hosts rows), reused for the
  write, the mark pass and the link pass — three streaming passes over
  object-store blocks instead of three re-fetches.
- shuffles: NONE in the steady-state wave loop. The link-candidate
  exchange is map-side-split by seen-shard url hash (each shard pulls
  only its own split — the table crosses the network exactly once), and
  the A1 global min-depth dedup folds into the shards' admission pass,
  because shard ownership is itself a url-hash partition. Input was
  already budget/blacklist-filtered + locally combined in the map tasks,
  so skew = hot-page in-degree only.
- resume: max round with a _SUCCESS marker wins; seen shards rebuild
  their blooms from the authoritative Parquet (recover-mode semantics,
  app/atra.rs:179-199 — unfinished work re-enters the frontier because
  only checkpointed state counts).
"""

from __future__ import annotations

import json
import re
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..functions.urlkit import (
    Depth,
    canonicalize,
    origin_of,
    origin_shard,
    url_shard,
)
from ..stages.fetch import (
    build_page_store,
    make_fetch_task,
    make_pagestore_actor_cls,
)
from ..state.frontier import make_frontier_actor_cls
from ..state.seen import (
    KIND_ERROR,
    KIND_PROCESSED,
    make_seen_actor_cls,
)

__all__ = ["run_crawl", "CrawlHandles"]


def _stub_fsspec_http() -> None:
    """Ray's write_parquet path-resolution retries
    ``from fsspec.implementations.http import HTTPFileSystem`` on EVERY
    call (failed imports aren't cached); without aiohttp in the container,
    two concurrent writes race on the partial module and one gets a bare
    ImportError that Ray's ``except ModuleNotFoundError`` doesn't catch.
    Pre-seeding a stub makes the import deterministic; the isinstance
    check it feeds can never match a local filesystem anyway."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        stub = types.ModuleType("fsspec.implementations.http")

        class _UnavailableHTTPFileSystem:  # never instantiated
            pass

        stub.HTTPFileSystem = _UnavailableHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub


_stub_fsspec_http()


def _select_url_status_fn(num_shards, block):
    """(url, status) projection of one wave block, pre-split by seen-shard
    url hash — run as a raw Ray task per block instead of a whole Dataset
    execution (each per-wave execution costs a fixed ~0.3s of
    plan/schedule overhead; a 15-wave crawl was paying ~5s total just to
    project two columns). Each seen shard pulls ONLY its own split
    (VERDICT r2 item 2 plus: the ownership hash is computed once here,
    not once per shard, and the side table crosses the network exactly
    once instead of S times)."""
    t = block.select(["url", "status"])
    if num_shards == 1:
        return [t]
    from ..functions.urlkit import url_shards_batch

    sh = url_shards_batch(t.column("url"), num_shards)
    return [t.filter(pa.array(sh == s)) for s in range(num_shards)]


def _min_depth_combine(links: pa.Table) -> pa.Table:
    """(target, depth_key) per-block min-depth combine, Arrow-native
    (VERDICT r3 item 5: the former pandas groupby round-tripped a copy per
    block per wave). ``use_threads=False`` keeps group order deterministic
    (first appearance), preserving the big/small-path byte-parity
    invariant."""
    g = links.group_by("target", use_threads=False).aggregate(
        [("depth_key", "min")]
    )
    return pa.table(
        {"target": g.column("target"), "depth_key": g.column("depth_key_min")}
    )


def _link_combine_fn(link_fn, num_shards, block):
    """Map-side link pass for one wave block, as a raw Ray task: explode/
    filter links (the identical ``_link_stage`` kernel the Dataset path
    used) + LOCAL min-depth combine + split by seen-shard url hash.
    There is no reduce exchange anymore: seen-shard ownership is itself a
    url-hash partition, so the per-shard min taken inside
    ``SeenShardState.admit_blocks`` IS the global min (A1). Each shard
    pulls ONLY its own split — on a multi-node cluster the candidate
    table crosses the network exactly once, same as the old exchange,
    minus a whole Dataset execution (+ sort) per wave."""
    from ..functions.urlkit import url_shards_batch

    links = link_fn(block)
    if links.num_rows == 0:
        empty = pa.table(
            {
                "target": pa.array([], pa.string()),
                "depth_key": pa.array([], pa.int64()),
            }
        )
        return [empty] * num_shards
    t = _min_depth_combine(links)
    if num_shards == 1:
        return [t]
    sh = url_shards_batch(t.column("target"), num_shards)
    return [t.filter(pa.array(sh == s)) for s in range(num_shards)]


def _chk_write_fn(payload, dir_path: str) -> bool:
    """Checkpoint writer task: persist one shard's snapshot (the actor's
    ``checkpoint_data`` output, resolved by Ray before this runs) —
    the write overlaps the next wave's fetch instead of serializing the
    wave loop. _SUCCESS is the driver's job, after ALL shards land."""
    stem, table, meta = payload
    p = Path(dir_path)
    pq.write_table(table, p / f"{stem}.parquet")
    (p / f"{stem}.json").write_text(meta)
    return True


def _small_wave_fn(fetch_fn, link_fn, bl_pats, *pop_blocks):
    """Whole-wave fast path for SMALL waves (≲1k urls): poll-filter +
    fetch/extract + link explode/filter + min-depth dedup in ONE Ray task,
    reusing the IDENTICAL kernel closures the Dataset path maps
    (make_fetch_task / _make_link_stage / the groupby-min reduce) — only
    the orchestration differs, so results, marks and admissions are
    byte-identical. Rationale: a wave costs 3 Dataset executions
    (~0.3-0.7s fixed overhead each); crawl tails are long chains of
    near-empty waves where that fixed cost dominated wall time.

    Returns (emitted, status_block, deduped_links_block); the full results
    table never enters the object store — the fetch kernel already wrote
    it to the round's Parquet in-task."""
    import numpy as np

    blocks = [b for b in pop_blocks if b.num_rows]
    t = pa.concat_tables(blocks) if blocks else pop_blocks[0].slice(0, 0)
    if bl_pats and t.num_rows:
        keep = np.ones(t.num_rows, dtype=bool)
        for pat in bl_pats:
            keep &= ~np.asarray(pc.match_substring_regex(t.column("url"), pat))
        t = t.filter(pa.array(keep))
    results = fetch_fn(t)
    status = results.select(["url", "status"])
    return results.num_rows, status, _min_depth_combine(link_fn(results))


class CrawlHandles:
    """The crawl's distributed state: fixed-count shard actors, all created
    ONCE per crawl and reused across every wave (pool restarts per wave
    would dominate the wall clock — the page/robots state must outlive each
    Dataset execution)."""

    def __init__(
        self,
        num_frontier: int,
        num_seen: int,
        cfg: CrawlConfig,
        seen_bits: int,
        store_dir: str | None = None,
        num_partitions: int = 8,
        num_store_actors: int = 4,
        seen_max_resident: int | None = None,
        seen_spill_root: str | None = None,
        frontier_max_resident: int | None = None,
        frontier_spill_root: str | None = None,
    ):
        import ray  # noqa: F401

        FrontierShard = make_frontier_actor_cls()
        SeenShard = make_seen_actor_cls()
        self.frontier = [
            FrontierShard.remote(
                i,
                delay_s=cfg.delay_s,
                max_per_host_per_wave=cfg.max_pages_per_host_per_wave,
                max_queue_age=cfg.max_queue_age,
                max_resident_per_origin=frontier_max_resident,
                spill_dir=(
                    f"{frontier_spill_root}/shard-{i}"
                    if frontier_spill_root
                    else None
                ),
            )
            for i in range(num_frontier)
        ]
        self.seen = [
            SeenShard.remote(
                j,
                num_bits=seen_bits,
                max_resident=seen_max_resident,
                spill_dir=(
                    f"{seen_spill_root}/shard-{j}" if seen_spill_root else None
                ),
            )
            for j in range(num_seen)
        ]
        self.stores = []
        if store_dir is not None:
            PageStoreShard = make_pagestore_actor_cls()
            self.stores = [
                PageStoreShard.remote(i, store_dir, num_partitions)
                for i in range(num_store_actors)
            ]

    def kill(self):
        import ray

        for a in self.frontier + self.seen + self.stores:
            ray.kill(a)


def _push_routed(frontier_handles, rows: list[dict]) -> list:
    """Group rows by origin-hash shard and push; returns refs."""
    import ray  # noqa: F401

    byshard: dict[int, list[dict]] = {}
    nf = len(frontier_handles)
    for r in rows:
        byshard.setdefault(origin_shard(r["origin"], nf), []).append(r)
    refs = []
    for s, rs in byshard.items():
        refs.append(
            frontier_handles[s].push.remote(
                [r["url"] for r in rs],
                [r["origin"] for r in rs],
                [r["dow"] for r in rs],
                [r["dts"] for r in rs],
                [r["tds"] for r in rs],
                [r["is_seed"] for r in rs],
                [r["age"] for r in rs],
                [r["born"] for r in rs],
            )
        )
    return refs


def _seen_check(seen_handles, urls, is_seed, depths) -> list[bool]:
    """Route check_and_add by url-hash shard; preserves input order."""
    import ray

    ns = len(seen_handles)
    byshard: dict[int, list[int]] = {}
    for i, u in enumerate(urls):
        byshard.setdefault(url_shard(u, ns), []).append(i)
    result = [False] * len(urls)
    refs, keys = [], []
    for s, idxs in byshard.items():
        refs.append(
            seen_handles[s].check_and_add.remote(
                [urls[i] for i in idxs],
                [is_seed[i] for i in idxs],
                [depths[i] for i in idxs],
            )
        )
        keys.append(idxs)
    for idxs, flags in zip(keys, ray.get(refs)):
        for i, f in zip(idxs, flags):
            result[i] = f
    return result


def find_resume_round(out_dir: str) -> int | None:
    chk = Path(out_dir) / "chk"
    if not chk.exists():
        return None
    rounds = [
        int(p.name.split("=")[1])
        for p in chk.glob("round=*")
        if (p / "_SUCCESS").exists()
    ]
    return max(rounds) if rounds else None


def run_crawl(
    pages_path: str,
    robots_path: str | None,
    seeds: list[str],
    cfg: CrawlConfig,
    out_dir: str,
    *,
    sitemaps_path: str | None = None,
    redirects_path: str | None = None,
    cookie_walls_path: str | None = None,
    blacklist_path: str | None = None,
    num_frontier_shards: int = 4,
    num_seen_shards: int = 8,
    fetch_concurrency: int = 4,
    page_store_partitions: int = 8,
    seen_bits: int = 1 << 22,
    batch_size: int = 256,
    max_waves: int | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
    page_store_dir: str | None = None,
    seen_max_resident: int | None = None,
    frontier_max_resident: int | None = None,
    small_wave_max: int | None = None,
    async_checkpoint: bool = True,
) -> dict:
    """Run (or resume) a crawl; returns a summary dict. Ray must already be
    initialised by the caller (never initialised here)."""
    import ray
    import ray.data as rd

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # page store is INPUT-derived (pages table partitioned by host hash) —
    # callers may point several runs at one cached layout
    store_dir = build_page_store(
        pages_path,
        page_store_dir or str(out / "page_store"),
        page_store_partitions,
    )

    # seen_max_resident caps each seen shard's resident record cache
    # (bloom-negative fast path + Parquet-spill exact lookups beyond it);
    # None keeps everything resident — right whenever the shard's share
    # of the frontier fits in its node's heap. Spill segments live under
    # the crawl's out dir, i.e. the same (shared at multi-node) storage
    # as checkpoints.
    # frontier_max_resident symmetrically caps each origin's resident
    # priority-heap head (cold tail in Parquet spill segments, exact
    # refill — state/frontier.py module docstring).
    handles = CrawlHandles(
        num_frontier_shards, num_seen_shards, cfg, seen_bits,
        seen_max_resident=seen_max_resident,
        seen_spill_root=(
            str(out / "seen_spill") if seen_max_resident is not None else None
        ),
        frontier_max_resident=frontier_max_resident,
        frontier_spill_root=(
            str(out / "frontier_spill")
            if frontier_max_resident is not None
            else None
        ),
    )
    frontier, seen = handles.frontier, handles.seen

    # robots parsed ONCE driver-side: crawl-delays feed the frontier
    # politeness clocks (T1); the parsed rule set is broadcast (ray.put)
    # to the stateless fetch tasks (T3's cache analog)
    robots_ref = None
    robots_rules = None
    if robots_path and cfg.respect_robots_txt:
        from ..functions.robots import parse_robots

        t = pq.read_table(robots_path)
        robots_rules = {}
        delays = {}
        for host, body in zip(t.column("host").to_pylist(), t.column("robots_txt").to_pylist()):
            rules = parse_robots(body, cfg.user_agent)
            robots_rules[host] = rules
            if rules.crawl_delay:
                delays[host] = rules.crawl_delay
        robots_ref = ray.put(robots_rules)
        if delays:
            ray.get([f.set_delays.remote(delays) for f in frontier])

    redirects_ref = None
    if redirects_path:
        rt = pq.read_table(redirects_path)
        redirects_ref = ray.put(
            dict(zip(rt.column("url").to_pylist(), rt.column("final_url").to_pylist()))
        )

    # cookie-wall table (J4 observable end): host -> required Cookie,
    # broadcast once like robots; fetch compares it against
    # cfg.request_headers_for(origin)
    walls_ref = None
    if cookie_walls_path:
        wt = pq.read_table(cookie_walls_path)
        walls_ref = ray.put(
            dict(zip(wt.column("host").to_pylist(), wt.column("cookie").to_pylist()))
        )

    from ..state.metrics import make_counter_actor_cls

    counter = make_counter_actor_cls().remote()

    def make_wave_fetch(wave_no: int):
        """Per-wave fetch closure: same worker-level caches (module
        globals), but the wave's results dir baked in. The task is pure
        except the idempotent results write; marks/counts derive from the
        materialized blocks afterwards (seen.mark_blocks)."""
        return make_fetch_task(
            store_dir, robots_ref, cfg, page_store_partitions,
            redirects_ref=redirects_ref,
            results_dir=str(out / "results" / f"round={wave_no}"),
            wave=wave_no,
            slim_output=True,
            walls_ref=walls_ref,
        )

    start_wave = 0
    lineage: list[dict] = []
    if resume:
        r = find_resume_round(out_dir)
        if r is not None:
            chk_dir = str(out / "chk" / f"round={r}")
            # seen checkpoints are INCREMENTAL: build the replay chain
            # from the latest FULL checkpoint (shard meta "full") forward
            rounds = sorted(
                int(p.name.split("=")[1])
                for p in (out / "chk").glob("round=*")
                if (p / "_SUCCESS").exists() and int(p.name.split("=")[1]) <= r
            )
            base = rounds[0]
            for rr in reversed(rounds):
                meta_p = out / "chk" / f"round={rr}" / "seen_shard_0.json"
                if meta_p.exists() and json.loads(meta_p.read_text()).get("full"):
                    base = rr
                    break
            chain = [
                str(out / "chk" / f"round={rr}") for rr in rounds if rr >= base
            ]
            ray.get(
                [f.restore.remote(chk_dir) for f in frontier]
                + [s.restore.remote(chain) for s in seen]
            )
            lineage = json.loads((Path(chk_dir) / "lineage.json").read_text())
            start_wave = r + 1

    if start_wave == 0:
        # ---- seed the frontier (S1: seed/input/seed_data.rs:46-58) ------
        rows = []
        for s in seeds:
            canon = canonicalize(s)
            if canon is None:
                continue
            origin = origin_of(canon)
            if origin is None:
                continue
            rows.append(
                {"url": canon, "origin": origin, "dow": 0, "dts": 0, "tds": 0,
                 "is_seed": True, "age": 0, "born": 0}
            )
        fresh = _seen_check(
            seen,
            [r["url"] for r in rows],
            [True] * len(rows),
            [(0, 0, 0)] * len(rows),
        )
        rows = [r for r, f in zip(rows, fresh) if f]
        ray.get(_push_routed(frontier, rows))
        if cfg.use_sitemaps and sitemaps_path:
            from ..functions.sitemaps import (
                sitemap_candidates,
                sitemap_lookup_from_table,
            )

            sm_map = sitemap_lookup_from_table(pq.read_table(sitemaps_path))
            cand = [
                dict(c, born=0)
                for c in sitemap_candidates(
                    rows, sm_map, cfg, robots_by_host=robots_rules,
                )
            ]
            sm_fresh = _seen_check(
                seen,
                [c["url"] for c in cand],
                [False] * len(cand),
                [(c["dow"], c["dts"], c["tds"]) for c in cand],
            )
            cand = [c for c, f in zip(cand, sm_fresh) if f]
            if cand:
                ray.get(_push_routed(frontier, cand))
        # web-graph seed edges (S6: web_graph.rs:36-44 Seed{origin, seed})
        edir = out / "edges"
        edir.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "src": pa.array([r["origin"] for r in rows], pa.string()),
                    "dst": pa.array([r["url"] for r in rows], pa.string()),
                    "kind": pa.array(["seed"] * len(rows), pa.string()),
                }
            ),
            edir / "seeds.parquet",
        )

    blacklist = [re.compile(p) for p in cfg.blacklist]
    _bl_version: list = [None]

    def _reload_blacklist() -> None:
        """T4 hot-append (blacklist/manager/manager_impl.rs:109-120): the
        blacklist file is append-only and versioned by (mtime, size); a
        change between waves recompiles the pattern set, and the next
        wave's link stage ships the new set (the per-wave closure IS the
        version broadcast)."""
        nonlocal blacklist
        if blacklist_path is None:
            return
        import os

        try:
            st = os.stat(blacklist_path)
        except FileNotFoundError:
            return
        v = (st.st_mtime_ns, st.st_size)
        if v == _bl_version[0]:
            return
        _bl_version[0] = v
        pats = [
            ln.strip()
            for ln in Path(blacklist_path).read_text().splitlines()
            if ln.strip() and not ln.startswith("#")
        ]
        blacklist = [re.compile(p) for p in (*cfg.blacklist, *pats)]

    _reload_blacklist()
    cfg_ref = cfg  # closure capture (tiny)
    seen_handles = seen
    frontier_handles = frontier

    # lexicographic (tds, dow, dts) packed into one int64 so the per-wave
    # min-depth dedup (A1) is a NATIVE vectorized groupby().min() — a
    # per-group pandas map_groups pays ~ms per target and dominates wall
    # time on large waves. Depth components are tiny (≤ budget caps), 21
    # bits each is beyond safe.
    _SHIFT1, _SHIFT2 = 1 << 42, 1 << 21

    def _make_link_stage(link_wave: int):
      def _link_stage(batch: pa.Table) -> pa.Table:
        """Explode + filter links inside the map task (combiner before the
        groupby shuffle): budget (M4), blacklist (M5), data-link drop.
        Budget runs PRE-dedup (a deeper duplicate may pass budget while the
        min-depth one fails under seed_only — the simulator filters before
        min too). Drop reasons are reported per batch to the metrics actor
        (lineage's dropped{reason} accounting)."""
        import numpy as np

        flat = pc.list_flatten(batch["links"])
        if len(flat) == 0:
            return pa.table(
                {
                    "target": pa.array([], pa.string()),
                    "depth_key": pa.array([], pa.int64()),
                }
            )
        target = pc.struct_field(flat, "target")
        kind = pc.struct_field(flat, "kind")
        dow = np.asarray(pc.struct_field(flat, "dow"), dtype=np.int64)
        dts = np.asarray(pc.struct_field(flat, "dts"), dtype=np.int64)
        tds = np.asarray(pc.struct_field(flat, "tds"), dtype=np.int64)

        # data links aren't crawlable (context.rs:261-269); scheme filter
        mask = np.asarray(pc.not_equal(kind, "data"))
        mask &= np.asarray(
            pc.or_(
                pc.starts_with(target, "http://"), pc.starts_with(target, "https://")
            )
        )
        n_scheme = int((~mask).sum())

        # budget (M4), vectorized for the common single-budget config;
        # per-origin overrides fall back to the scalar checker
        if cfg_ref.budgets_per_origin:
            tl = target.to_pylist()
            bmask = np.fromiter(
                (
                    cfg_ref.budget_for(origin_of(t)).is_in_budget(
                        Depth(a, b, c)
                    )
                    for t, a, b, c in zip(tl, dow, dts, tds)
                ),
                dtype=bool,
                count=len(tl),
            )
            mask &= bmask
        else:
            b = cfg_ref.budget
            if b.kind == "absolute":
                if b.depth:
                    mask &= tds < b.depth
            elif b.kind == "seed_only":
                mask &= (dts == 0) & (
                    (dow < b.depth_on_website)
                    if b.depth_on_website
                    else np.ones(len(dow), dtype=bool)
                )
            elif b.kind == "normal":
                if b.depth_on_website:
                    mask &= dow < b.depth_on_website
                mask &= dts <= b.depth
            else:  # single_page
                mask &= (dow == 0) & (dts == 0) & (tds == 0)

        n_budget = int((~mask).sum()) - n_scheme

        for p in blacklist:  # M5: RE2 unanchored search per pattern
            mask &= ~np.asarray(pc.match_substring_regex(target, p.pattern))
        n_blacklist = int((~mask).sum()) - n_scheme - n_budget

        if n_scheme or n_budget or n_blacklist:
            import hashlib as _hl

            bid = _hl.blake2b(
                (str(len(flat)) + str(link_wave) + str(target[0])).encode(),
                digest_size=12,
            ).hexdigest()
            counter.add_drops.remote(
                link_wave,
                {"scheme_or_data": n_scheme, "budget": n_budget,
                 "blacklist": n_blacklist},
                bid,
            )

        keep = pa.array(mask)
        return pa.table(
            {
                "target": target.filter(keep),
                "depth_key": pa.array(
                    (tds * _SHIFT1 + dow * _SHIFT2 + dts)[mask], pa.int64()
                ),
            }
        )

      return _link_stage

    def _block_refs_of(ds) -> list:
        """Materialized dataset -> flat list of object-store block refs."""
        try:
            return [
                b
                for bundle in ds.iter_internal_ref_bundles()
                for b in bundle.block_refs
            ]
        except AttributeError:  # older Ray
            return ds.get_internal_block_refs()

    def _recrawl_refill(at_wave: int) -> int:
        """A5 recrawl scan: re-frontier every PROCESSED url whose cooldown
        elapsed (simulated time = wave × wave_seconds). Bypasses the seen
        check — recrawl is a deliberate re-visit, state stays PROCESSED
        until the re-fetch re-stamps it. SHARD-TO-SHARD: each seen shard
        pushes its recrawlable rows straight to the owning frontier shards
        (SeenShardState.refill_recrawl); the driver only sums counts."""
        wave_seconds = cfg.delay_s * cfg.max_pages_per_host_per_wave
        interval = cfg.budget.recrawl_interval_s
        return sum(
            ray.get(
                [
                    s.refill_recrawl.remote(
                        at_wave, interval, wave_seconds,
                        frontier_handles, len(frontier_handles),
                    )
                    for s in seen_handles
                ]
            )
        )

    t0 = time.monotonic()
    total_fetched = 0
    # raw-task wrappers for the per-wave hot path (see the module-level
    # kernels' docstrings): projection per block, and the one-task
    # small-wave path
    _small_wave = ray.remote(num_returns=3)(_small_wave_fn)
    _table_rows = ray.remote(lambda t: t.num_rows)
    _num_seen = len(seen_handles)
    if _num_seen == 1:
        _select_status = ray.remote(
            lambda n, b: _select_url_status_fn(n, b)[0]
        )
        _link_combine = ray.remote(
            lambda fn, n, b: _link_combine_fn(fn, n, b)[0]
        )
    else:
        _select_status = ray.remote(num_returns=_num_seen)(_select_url_status_fn)
        _link_combine = ray.remote(num_returns=_num_seen)(_link_combine_fn)
    if small_wave_max is None:
        small_wave_max = max(1024, batch_size)
    # writer tasks are IO-bound (parquet flush): fractional CPU so they
    # never displace a fetch task from the schedule while overlapping
    _chk_write = ray.remote(num_cpus=0.25)(_chk_write_fn)
    pending_chk: tuple | None = None

    def _finalize_chk(pending) -> None:
        if pending is None:
            return
        refs, p_dir, lineage_json = pending
        ray.get(refs)  # every shard's parquet+json landed
        (p_dir / "lineage.json").write_text(lineage_json)
        (p_dir / "_SUCCESS").touch()

    prev_admitted = len(seeds)  # last wave's fresh admissions (seeds now)
    wave = start_wave
    while True:
        if max_waves is not None and wave >= start_wave + max_waves:
            break
        t_wave = time.monotonic()
        _reload_blacklist()  # T4: pick up appended patterns between waves
        import shutil as _shutil

        round_dir = out / "results" / f"round={wave}"
        _shutil.rmtree(round_dir, ignore_errors=True)  # partial-wave re-run
        pop_refs = [f.pop_wave.remote(wave) for f in frontier]
        # ONE Dataset execution per wave: stateless fetch tasks (warm
        # worker reuse; page bodies via the module-level partition cache)
        # that also mark link states, report status counts and write the
        # round's results Parquet in-task. The wave table arrives as ONE
        # block per frontier shard — far fewer than the CPU count — so the
        # (tiny, url+ints) rows are repartitioned to fan the fetch out to
        # the full pool; politeness was already enforced at pop time.
        _bl_now = (
            [p.pattern for p in blacklist]
            if (blacklist_path is not None and blacklist)
            else None
        )
        # Path selection. When last wave's admissions alone guarantee a big
        # wave, launch the Dataset path immediately — the driver never
        # blocks on the pops, which overlap with fetch scheduling (barrier
        # cost on a 128k-row wave ≈ 0.5 s, measured). Otherwise (small or
        # ambiguous estimate — including the politeness-capped-backlog case
        # where fresh admits are ~0 but the frontier still holds a full
        # wave) pay one cheap barrier for the ACTUAL popped row count: an
        # admits-only estimate would funnel the whole backlog wave through
        # the single-task small path while the pool idles.
        if prev_admitted > small_wave_max:
            # actual rows unknown here (could far exceed prev_admitted when
            # a backlog carries over) — use the full fan-out, never a
            # row-estimate-scaled one that would serialize a big wave
            wave_rows = None
            use_small = False
        else:
            wave_rows = sum(ray.get([_table_rows.remote(r) for r in pop_refs]))
            use_small = wave_rows <= small_wave_max
        if use_small:
            # small-wave fast path: ONE raw task runs poll-filter + fetch +
            # link stage + min-depth dedup (identical kernels; see
            # _small_wave_fn) — crawl tails are chains of near-empty waves
            # where the 3 Dataset executions' fixed overhead dominated
            em_ref, st_ref, lk_ref = _small_wave.remote(
                make_wave_fetch(wave), _make_link_stage(wave), _bl_now, *pop_refs
            )
            emitted = ray.get(em_ref)
            t_fetch0_end = t_mark_launch = time.monotonic()
            status_refs_by_shard = [[st_ref]] * _num_seen
            small_link_refs = [lk_ref]
        else:
            fanout = (
                fetch_concurrency * 2
                if wave_rows is None
                else max(
                    1,
                    min(
                        fetch_concurrency * 2,
                        wave_rows // max(batch_size // 4, 1) + 1,
                    ),
                )
            )
            wave_ds = rd.from_arrow_refs(pop_refs).repartition(fanout)
            if _bl_now:
                # fetch-time blacklist check (UrlChecker in
                # crawler.rs:640-709): with hot-append (T4), URLs queued
                # BEFORE a pattern landed must still be stopped at poll
                # time, not only at link admission
                def _poll_filter(batch: pa.Table) -> pa.Table:
                    import numpy as np

                    keep = np.ones(batch.num_rows, dtype=bool)
                    for pat in _bl_now:
                        keep &= ~np.asarray(
                            pc.match_substring_regex(batch.column("url"), pat)
                        )
                    return batch.filter(pa.array(keep))

                wave_ds = wave_ds.map_batches(_poll_filter, batch_format="pyarrow")
            wave_results = (
                wave_ds
                .map_batches(
                    make_wave_fetch(wave), batch_format="pyarrow", batch_size=batch_size
                )
                .materialize()  # pinned for the link pass
            )

            emitted = wave_results.count()
            # column-pruned projection as one raw task per block (zero-copy
            # Arrow select; a Dataset execution here cost a fixed ~0.3s/wave)
            t_fetch0_end = time.monotonic()
            wave_block_refs = _block_refs_of(wave_results)
            souts = [
                _select_status.remote(_num_seen, b) for b in wave_block_refs
            ]
            if _num_seen == 1:
                status_refs_by_shard = [souts]
            else:
                status_refs_by_shard = [
                    [o[s] for o in souts] for s in range(_num_seen)
                ]
            small_link_refs = None
            t_mark_launch = time.monotonic()
        # mark pass (T6/A3): the seen shards PULL the wave's COLUMN-PRUNED
        # (url, status) side table in parallel — each marks the urls it
        # owns and returns their status counts (fetch tasks stay pure; no
        # blocked ray.get in data tasks -> no cold-worker spawn storms).
        # The projection drops text/links/html-size columns BEFORE any
        # block reaches a seen shard: on a multi-node cluster only the two
        # tiny columns cross nodes (VERDICT r2 item 2).
        mark_refs = [
            s.mark_blocks.remote(status_refs_by_shard[i], len(seen_handles), wave)
            for i, s in enumerate(seen_handles)
        ]
        t_fetch = time.monotonic()
        if emitted == 0:
            pending = sum(ray.get([f.count.remote() for f in frontier]))
            if pending == 0:
                if cfg.use_recrawl and cfg.budget.recrawl_interval_s is not None:
                    refilled = _recrawl_refill(wave)
                    if refilled:
                        lineage.append(
                            {"wave": wave, "recrawl_refill": refilled}
                        )
                        prev_admitted = refilled
                        wave += 1
                        continue
                break
            wave += 1
            continue

        if small_link_refs is not None:
            # small path already produced the combined (target, depth_key)
            # block inside the wave task; every shard pulls it (tiny) and
            # keeps its own rows
            t_links0 = t_links = time.monotonic()
            link_refs_by_shard = [small_link_refs] * _num_seen
        else:
            # results write + link-state mark + status counts already
            # happened INSIDE the fetch tasks; the only remaining pass is
            # the link chain, as RAW TASKS per materialized block:
            # explode/filter + local min-depth combine + split by
            # seen-shard url hash (_link_combine_fn). The former
            # partitioned exchange is gone — seen-shard ownership is
            # itself a url-hash partition, so the per-shard min inside
            # admit_blocks IS the global A1 min, and each shard pulls
            # only its own split. Web-graph edges are NOT a separate
            # sink: they're a projection of the results' links column,
            # derived on demand (dump.edges_of_crawl).
            t_links0 = time.monotonic()
            _link_stage_fn = _make_link_stage(wave)
            outs = [
                _link_combine.remote(_link_stage_fn, _num_seen, b)
                for b in wave_block_refs
            ]
            if _num_seen == 1:
                link_refs_by_shard = [outs]
            else:
                link_refs_by_shard = [
                    [o[s] for o in outs] for s in range(_num_seen)
                ]
            t_links = time.monotonic()
        # admission (J1): seen shards pull their candidate splits, dedup,
        # admit locally and push shard-to-shard to the frontier. No
        # map_batches task on the crawl path ever blocks on ray.get
        # (VERDICT r2 item 3).
        admit_refs = [
            s.admit_blocks.remote(
                link_refs_by_shard[i], len(seen_handles), frontier_handles,
                len(frontier_handles), wave,
            )
            for i, s in enumerate(seen_handles)
        ]

        from collections import Counter as _Counter

        status_counts_all = _Counter()
        for c in ray.get(mark_refs):  # barrier: marks land before checkpoint
            status_counts_all.update(c)
        t_mark = time.monotonic()
        status_counts = {k: v for k, v in status_counts_all.items() if v}
        checked = admitted = 0
        for ck, ad in ray.get(admit_refs):  # barrier: admits before checkpoint
            checked += ck
            admitted += ad
        prev_admitted = admitted
        t_admit = time.monotonic()

        t_passes = time.monotonic()
        total_fetched += status_counts.get("ok", 0)
        lineage.append(
            {
                "round": wave,
                "emitted": emitted,
                "small_path": use_small,
                "status": status_counts,
                "links_checked": checked,
                "links_admitted": admitted,
                "links_dropped": ray.get(counter.get_drops.remote(wave)),
                "t_fetch_s": round(t_fetch - t_wave, 3),
                "t_passes_s": round(t_passes - t_fetch, 3),
                # sub-phase split of the passes window (diagnosis aid):
                # status-projection execution / link dedup exchange /
                # mark barrier / admit barrier
                "t_status_proj_s": round(t_mark_launch - t_fetch0_end, 3),
                "t_linkdedup_s": round(t_links - t_links0, 3),
                "t_mark_wait_s": round(t_mark - t_links, 3),
                "t_admit_wait_s": round(t_admit - t_mark, 3),
            }
        )

        if (wave - start_wave) % checkpoint_every == 0:
            # ASYNC checkpoint: the actors return snapshot tables (cheap,
            # ordered by their mailboxes — the delta is fixed before any
            # wave-w+1 mark), plain writer tasks persist them OVERLAPPED
            # with the next wave's fetch, and _SUCCESS lands only at
            # finalize once every shard's write completed — resume never
            # sees a half-written round. Only one round is ever in
            # flight: the next checkpoint (or loop exit) finalizes the
            # previous one first.
            t_chk_wait = time.monotonic()
            _finalize_chk(pending_chk)
            chk_wait = time.monotonic() - t_chk_wait
            chk_dir = out / "chk" / f"round={wave}"
            chk_dir.mkdir(parents=True, exist_ok=True)
            # seen checkpoints are deltas (urls touched this wave); every
            # 8th round a FULL compaction bounds the restore chain
            full = (wave - start_wave) % (checkpoint_every * 8) == 0
            if async_checkpoint:
                write_refs = [
                    _chk_write.remote(f.checkpoint_data.remote(), str(chk_dir))
                    for f in frontier
                ] + [
                    _chk_write.remote(s.checkpoint_data.remote(full), str(chk_dir))
                    for s in seen
                ]
                pending_chk = (write_refs, chk_dir, json.dumps(lineage))
            else:
                ray.get(
                    [f.checkpoint.remote(str(chk_dir)) for f in frontier]
                    + [s.checkpoint.remote(str(chk_dir), full) for s in seen]
                )
                (chk_dir / "lineage.json").write_text(json.dumps(lineage))
                (chk_dir / "_SUCCESS").touch()
            lineage[-1]["t_checkpoint_s"] = round(time.monotonic() - t_passes, 3)
            lineage[-1]["t_chk_drain_s"] = round(chk_wait, 3)
        wave += 1

    _finalize_chk(pending_chk)
    pending_chk = None
    wall = time.monotonic() - t0
    # final link-state export: shard-parallel writes into a parquet DIR
    # (readers use pq.read_table / read_parquet on the directory); the
    # state never concatenates through the driver
    ls_dir = out / "link_state.parquet"
    import shutil as _sh

    if ls_dir.is_file():
        ls_dir.unlink()
    _sh.rmtree(ls_dir, ignore_errors=True)
    seen_rows = sum(ray.get([s.write_link_state.remote(str(ls_dir)) for s in seen]))
    dropped = sum(s["dropped_by_age"] for s in ray.get([f.stats.remote() for f in frontier]))
    summary = {
        "waves": wave - start_wave,
        "last_wave": wave - 1,
        "fetched_ok": int(total_fetched),
        "seen_urls": seen_rows,
        "dropped_by_age": int(dropped),
        "wall_s": wall,
        "lineage": lineage,
        "out_dir": str(out),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    handles.kill()
    ray.kill(counter)
    return summary
