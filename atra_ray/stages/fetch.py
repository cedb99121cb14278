"""Fetch + extract wave stage (SURVEY.md S2/J5/M6) — a stateful
``map_batches`` actor pool over frontier batches.

The reference fetches live HTTP with reqwest under per-origin politeness
(atra/src/client/classic.rs:30-104, fetching/requests.rs). This sandbox has
no network, so per the survey's mapping (J5) the fetch is a **hash join
frontier ⋈ pages on url**: the pages table is pre-partitioned once by
``stable_hash64(host) % P`` into a Parquet "page store"
(`build_page_store`), and each fetch actor lazily loads + caches only the
partitions its batches touch. Because frontier batches arrive routed by the
same host-hash, an actor touches few partitions — this is the broadcast-
small-side / partitioned-lookup pattern, NOT a per-batch re-ship. At real
scale the same layout holds: partitions stream from shared storage, the
actor cache is an LRU.

Robots checking (M6) runs here, where the reference's UrlChecker runs it
(crawl/crawler.rs:640-709): the robots table is tiny (one row per host) and
loaded once per actor in ``__init__`` (T3's cache analog).

Output rows: the frontier columns + fetch/extraction results. Statuses:
``ok`` (fetched + extracted), ``miss`` (url not in the pages table — the
reference's fetch error path, link-state InternalError), ``robots_denied``
(blocked before fetch — link-state stays Discovered).
"""

from __future__ import annotations

from collections import OrderedDict
from itertools import repeat as _repeat
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..functions.robots import ALLOW_ALL, parse_robots
from ..functions.urlkit import Depth, stable_hash64
from ..stages.extract import LINK_STRUCT, extract_one
from ..state.frontier import FRONTIER_SCHEMA

__all__ = ["make_fetch_task", "build_page_store", "RESULT_SCHEMA"]

RESULT_SCHEMA = pa.schema(
    list(FRONTIER_SCHEMA)
    + [
        ("status", pa.string()),
        ("format", pa.string()),
        ("encoding", pa.string()),
        ("had_decode_errors", pa.bool_()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("links", pa.list_(LINK_STRUCT)),
    ]
)


def build_page_store(pages_path: str, store_dir: str, num_partitions: int = 8) -> str:
    """One-time layout: pages.parquet → ``store_dir/part={i}/`` by host
    hash. Idempotent via _SUCCESS marker. Runs as a Ray Data pipeline so it
    streams at scale (no driver materialization)."""
    import ray.data as rd

    store = Path(store_dir)
    if (store / "_SUCCESS").exists():
        return str(store)
    store.mkdir(parents=True, exist_ok=True)

    def _part(batch: pa.Table) -> pa.Table:
        parts = [
            stable_hash64(u.split("/")[2]) % num_partitions if "://" in u else 0
            for u in batch.column("url").to_pylist()
        ]
        return batch.append_column("part", pa.array(parts, pa.int32()))

    # coalesce the read into few blocks: `partition_cols` writes one file
    # per (task, partition), and shard loads pay an open() per file — with
    # ~2×P read blocks the store stays ≲2P files per partition without any
    # shuffle of the html payload
    (
        rd.read_parquet(
            pages_path,
            columns=["url", "html"],
            override_num_blocks=num_partitions * 2,
        )
        .map_batches(_part, batch_format="pyarrow")
        .write_parquet(str(store), partition_cols=["part"])
    )
    (store / "_SUCCESS").touch()
    return str(store)


class PageStoreShardState:
    """Persistent page-store shard: owns a subset of the host-hash
    partitions (``part % num_shards == shard_id``) and serves body lookups.
    Created ONCE per crawl (not per wave) so the partition cache survives
    the BSP loop — the J5 hash-join's build side. At web scale each shard
    holds its partitions' url->offset index and streams bodies from shared
    storage; here partitions are small enough to hold decoded."""

    def __init__(self, shard_id: int, store_dir: str, num_partitions: int):
        self.shard_id = shard_id
        self.store_dir = Path(store_dir)
        self.num_partitions = num_partitions
        self._parts: dict[int, "_PartIndex"] = {}

    def _load(self, part: int) -> "_PartIndex":
        hit = self._parts.get(part)
        if hit is not None:
            return hit
        tables, index = [], {}
        pdir = self.store_dir / f"part={part}"
        if pdir.exists():
            for f in sorted(pdir.glob("*.parquet")):
                t = pq.read_table(f, columns=["url", "html"])
                ti = len(tables)
                tables.append(t)
                # dict build runs in C (zip/repeat), not a per-row Python
                # loop — cold worker joins on big partitions (VERDICT r3)
                index.update(
                    zip(
                        t.column("url").to_pylist(),
                        zip(_repeat(ti), range(t.num_rows)),
                    )
                )
        lookup = _PartIndex(tables, index)
        self._parts[part] = lookup
        return lookup

    def get_bodies(self, part: int, urls: list[str]) -> list[bytes | None]:
        lookup = self._load(part)
        return [lookup.get(u) for u in urls]


def make_pagestore_actor_cls():
    import ray

    # num_cpus=0: state shards are lightweight lookup/scheduling state
    # that must never crowd out the 1-CPU data-plane map tasks; their
    # work is O(batch) dict/heap ops, overlapped with fetch compute.
    @ray.remote(num_cpus=0)
    class PageStoreShard(PageStoreShardState):
        pass

    return PageStoreShard


# Per-WORKER-PROCESS caches, module-level so they survive across the
# per-wave fetch closures (a closure-level slot would reset every wave):
# store_dir -> LRU of partition dicts; object-ref hex -> deserialized value.
_WORKER_PART_CACHE: dict[str, OrderedDict] = {}
_WORKER_REF_CACHE: dict[str, object] = {}


def _cached_ref(ref):
    import ray

    if ref is None:
        return {}
    key = ref.hex()
    if key not in _WORKER_REF_CACHE:
        _WORKER_REF_CACHE[key] = ray.get(ref)
    return _WORKER_REF_CACHE[key]


class _PartIndex:
    """Lazy partition view: url -> row index over Arrow tables; bodies are
    sliced OUT OF THE ARROW BUFFERS on demand. Cold cost is the parquet
    read + a string index — never a bulk bytes materialization (each url
    is fetched at most once per crawl, so eager body conversion is pure
    waste; this is also why a freshly spawned Ray worker joining mid-wave
    is cheap). At web scale the same object holds an url→offset index and
    range-reads bodies from shared storage."""

    __slots__ = ("tables", "index")

    def __init__(self, tables, index):
        self.tables = tables
        self.index = index

    def get(self, url: str):
        hit = self.index.get(url)
        if hit is None:
            return None
        ti, row = hit
        return self.tables[ti].column("html")[row].as_py()


def _cached_partition(
    store_dir: str, part: int, max_cached: int = 16
) -> _PartIndex:
    parts = _WORKER_PART_CACHE.setdefault(store_dir, OrderedDict())
    hit = parts.get(part)
    if hit is not None:
        parts.move_to_end(part)
        return hit
    tables, index = [], {}
    pdir = Path(store_dir) / f"part={part}"
    if pdir.exists():
        for f in sorted(pdir.glob("*.parquet")):
            t = pq.read_table(f, columns=["url", "html"], use_threads=False)
            ti = len(tables)
            tables.append(t)
            index.update(
                zip(
                    t.column("url").to_pylist(),
                    zip(_repeat(ti), range(t.num_rows)),
                )
            )
    lookup = _PartIndex(tables, index)
    parts[part] = lookup
    if len(parts) > max_cached:
        parts.popitem(last=False)
    return lookup


def make_fetch_task(
    store_dir: str,
    robots_ref,
    cfg: CrawlConfig,
    num_partitions: int,
    redirects_ref=None,
    results_dir: str | None = None,
    wave: int = -1,
    slim_output: bool = False,
    walls_ref=None,
):
    """Build the fetch+extract map_batches function for ONE WAVE.

    Stateless tasks reuse warm Ray worker processes across waves (unlike an
    actor pool, which restarts per Dataset execution). Page bodies are read
    DIRECTLY from the host-hash-partitioned page store through a
    module-level per-worker LRU cache of lazy Arrow indexes (frontier
    batches arrive routed by origin hash, so a batch touches few
    partitions; at web scale the index range-reads from shared storage).
    Parsed robots rules + the redirect map are ONE broadcast object each
    (``ray.put``, fetched once per worker process).

    The task is deliberately PURE except for the idempotent results-Parquet
    write (S3/S4, one deterministically-named file per batch under
    ``results_dir``): it never calls ``ray.get`` — a fetch task blocking on
    actor RPCs makes Ray spawn extra (cold) worker processes mid-wave,
    which was the round-1 crawl's hidden scale cost. Link-state marking
    (T6) and status counts (A3) are derived AFTER the wave materializes,
    by the seen shards pulling the wave's blocks straight from the object
    store (SeenShardState.mark_blocks) — exactly-once by construction
    (marks come from the one materialized copy, not from possibly-retried
    tasks)."""

    def _robots():
        return _cached_ref(robots_ref)

    def _redirects():
        return _cached_ref(redirects_ref)

    def _walls():
        return _cached_ref(walls_ref)

    def _partition(part):
        return _cached_partition(store_dir, part)

    def fetch_extract(batch: pa.Table) -> pa.Table:
        robots = _robots()
        redirects = _redirects()
        urls = batch.column("url").to_pylist()
        dows = batch.column("dow").to_pylist()
        dtss = batch.column("dts").to_pylist()
        tdss = batch.column("tds").to_pylist()
        n = len(urls)
        # redirect resolution (final_redirect_destination): body fetch and
        # link-base use the FINAL url; frontier identity stays the original
        finals = [redirects.get(u) for u in urls]
        eff = [f if f is not None else u for f, u in zip(finals, urls)]
        hosts = [u.split("/")[2] if "://" in u else "" for u in eff]

        allowed = [True] * n
        if cfg.respect_robots_txt:
            # robots checked on the ORIGINAL url (pre-redirect, like the
            # reference's pre-fetch check) against its own host
            for i, u in enumerate(urls):
                h = u.split("/")[2] if "://" in u else ""
                r = robots.get(h)
                if r is not None and not r.is_allowed(u):
                    allowed[i] = False

        # body lookup: group rows by page-store partition, one (cached)
        # partition load per partition touched (the probe side of the hash
        # join; frontier routing makes batches partition-local)
        by_part: dict[int, list[int]] = {}
        for i, h in enumerate(hosts):
            if allowed[i]:
                by_part.setdefault(stable_hash64(h) % num_partitions, []).append(i)
        bodies: list[bytes | None] = [None] * n
        for part, idxs in by_part.items():
            lookup = _partition(part)
            for i in idxs:
                bodies[i] = lookup.get(eff[i])

        # J4 per-origin request overrides (config/crawl.rs:161-184): the
        # effective header set (UA + globals + per-origin headers/cookies)
        # is attached to every request; cookie-wall hosts serve their
        # /wall/ pages only when the request's Cookie matches (the
        # observable end of the override surface — walls_ref is the
        # fixture server's cookie table, broadcast once)
        walls = _walls()
        if walls:
            hdr_cache: dict[str, dict] = {}
            for i in range(n):
                if bodies[i] is None:
                    continue
                h = hosts[i]
                required = walls.get(h)
                if required is None or "/wall/" not in eff[i]:
                    continue
                sent = hdr_cache.get(h)
                if sent is None:
                    sent = hdr_cache[h] = cfg.request_headers_for(h)
                if sent.get("Cookie") != required:
                    bodies[i] = None  # wall refused the request

        statuses, fmts, encs, errs, texts, langs, links_col = [], [], [], [], [], [], []
        ecfg = cfg.extraction
        for i in range(n):
            if not allowed[i]:
                statuses.append("robots_denied")
            elif bodies[i] is None:
                statuses.append("miss")
            else:
                statuses.append("ok")
            if statuses[-1] != "ok":
                fmts.append("unknown")
                encs.append("none")
                errs.append(False)
                texts.append(None)
                langs.append("und")
                links_col.append([])
                continue
            fmt, enc, had_err, text, lang, links = extract_one(
                eff[i], bodies[i], Depth(dows[i], dtss[i], tdss[i]), ecfg
            )
            fmts.append(fmt)
            encs.append(enc)
            errs.append(had_err)
            texts.append(text)
            langs.append(lang)
            links_col.append(
                [
                    {"target": t, "origin": o, "kind": k, "dow": a, "dts": b, "tds": c}
                    for t, o, k, a, b, c in links
                ]
            )

        out = {name: batch.column(name) for name in batch.column_names}
        out["final_url"] = pa.array(finals, pa.string())
        out["status"] = pa.array(statuses, pa.string())
        out["format"] = pa.array(fmts, pa.string())
        out["encoding"] = pa.array(encs, pa.string())
        out["had_decode_errors"] = pa.array(errs, pa.bool_())
        out["text"] = pa.array(texts, pa.string())
        out["lang"] = pa.array(langs, pa.string())
        out["links"] = pa.array(links_col, pa.list_(LINK_STRUCT))
        result = pa.table(out)

        if results_dir is not None and result.num_rows > 0:
            import hashlib as _hl
            import os

            # deterministic batch id (urls are unique within a wave) so a
            # retried/recomputed task overwrites its own file instead of
            # duplicating rows
            bid = _hl.blake2b(
                ("|".join(urls[:8]) + str(n) + str(wave)).encode(), digest_size=12
            ).hexdigest()
            os.makedirs(results_dir, exist_ok=True)
            pq.write_table(result, Path(results_dir) / f"batch-{bid}.parquet")
        if slim_output:
            # the crawl's downstream passes need ONLY (url, status, links):
            # status projection for the mark pass, links for admission. The
            # full row (text/encoding/format/...) already went to the
            # round's Parquet above — shipping the text column back through
            # the object store would be pure serialization cost (~MBs per
            # block) for data nothing reads.
            return result.select(["url", "status", "links"])
        return result

    return fetch_extract
