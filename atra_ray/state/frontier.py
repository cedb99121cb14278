"""Frontier shards (SURVEY.md T1/T2/T7 + §2.5 priority semantics) — the
distributed URL frontier of the north rule.

The reference's frontier is one file-backed FIFO queue with racing
consumers, a per-origin guard map enforcing ≤1 in-flight worker per origin,
a per-origin interval clock (robots crawl-delay → config delay → 1 s
fallback), and aging (entries re-enqueued while their host is busy gain
``age``; age > 20 drops the entry)
(atra/src/queue/*, url/guard/mod.rs:37-102, crawl/crawler/intervals.rs:25-96,
contexts/helper/polling.rs:49-136, config/crawl.rs:94-96,150).

Ours upgrades this to the north rule's explicit design: each origin hashes
to exactly ONE shard (``stable_hash64(origin) % num_shards``), so per-host
mutual exclusion is structural, not locked. Each shard keeps a per-origin
priority heap ordered by ``(total_distance_to_seed, depth_on_website,
recrawl_score, url)`` — the north star's "(depth, recrawl-score, age)"
per-host ordering: seeds first, then BFS by discovery wave; at equal depth
FRESH urls (score 0) beat recrawls, and lower recrawl generations beat
higher ones (score = how many times the url was already crawled, stamped
by the seen shard's refill); url last for a deterministic total order
— and a per-origin politeness budget: a wave spans ``wave_seconds`` of
simulated time, so an origin with delay ``d`` may emit at most
``wave_seconds / d`` URLs per wave (the BSP analog of the reference's
1-page-per-delay interval clock). Entries passed over by a full origin age
by 1 per wave and drop past ``max_queue_age`` — the same starvation rule as
the reference's missed-host cache.

Politeness runs on SIMULATED time (BASELINE.md protocol): correctness tests
verify ordering/rate structure; wall-clock benches measure compute, not
sleeps.

At-scale memory model (the 10^10-URL frontier of the north rule; mirrors
the reference's FILE-BACKED queue, queue/file.rs): with
``max_resident_per_origin`` set, each origin keeps only its best ~R
entries in the heap; colder entries live in append-only Parquet spill
segments under ``spill_dir``. The split is EXACT, not approximate, via
the invariant *every resident entry < every spilled entry of its origin*
(priority order ``(tds, dow, rc, url)``):

- a push worse than the origin's best spilled entry goes STRAIGHT to
  spill (deep links are cold by construction);
- heap overflow (> 2R) sorts once and spills the worst half — amortized
  O(log R) per push;
- when a wave drains an origin's heap with spilled entries remaining,
  the shard runs a BATCHED refill pass: one scan over its segments
  reloads the top R per needy origin and compacts the rest. Politeness
  makes refills rare — an origin emits ≤ capacity/wave, so a full head
  lasts ~R/capacity waves.

``pop_wave`` output is therefore byte-identical to the unbounded
frontier (test_frontier_spill_equals_unbounded), and ``count()`` /
termination include spilled entries.
"""

from __future__ import annotations

import heapq
import json
from collections import defaultdict
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["FrontierShardState", "make_frontier_actor_cls", "FRONTIER_SCHEMA"]

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("origin", pa.string()),
        ("dow", pa.uint64()),
        ("dts", pa.uint64()),
        ("tds", pa.uint64()),
        ("is_seed", pa.bool_()),
        ("age", pa.uint32()),
        ("wave", pa.uint32()),
        ("host_seq", pa.uint32()),
    ]
)


class FrontierShardState:
    def __init__(
        self,
        shard_id: int,
        delay_s: float = 1.0,
        wave_seconds: float | None = None,
        max_per_host_per_wave: int = 64,
        max_queue_age: int = 20,
        max_resident_per_origin: int | None = None,
        spill_dir: str | None = None,
    ):
        self.shard_id = shard_id
        self.default_delay = delay_s
        self.max_per_host = max_per_host_per_wave
        self.wave_seconds = wave_seconds if wave_seconds is not None else delay_s * max_per_host_per_wave
        self.max_queue_age = max_queue_age
        # origin -> heap of [tds, dow, rc, url, dts, is_seed, age, born]
        self.queues: dict[str, list] = defaultdict(list)
        self.delays: dict[str, float] = {}      # robots crawl-delay overrides (T3→T1)
        self.host_seq: dict[str, int] = defaultdict(int)   # per-origin emit counter
        self.last_access: dict[str, float] = {}  # origin -> simulated ts (T7)
        self.dropped_by_age = 0
        # ---- spill plane (None = unbounded resident heaps) ----
        self.max_resident = max_resident_per_origin
        self.spill_dir = Path(spill_dir) if spill_dir is not None else None
        if self.max_resident is not None and self.spill_dir is None:
            raise ValueError("max_resident_per_origin requires spill_dir")
        if self.spill_dir is not None:
            self.spill_dir.mkdir(parents=True, exist_ok=True)
        self._spill_buf: list[tuple] = []   # rows awaiting a segment write
        self._spill_seq = 0
        self.spilled_count: dict[str, int] = {}
        self.spilled_best: dict[str, tuple] = {}  # origin -> min (tds, dow, rc, url)

    # ---- spill plane ----------------------------------------------------
    _SPILL_COLS = ("url", "origin", "dow", "dts", "tds", "rc", "is_seed", "age", "born")

    def _spill_rows(self, origin: str, entries) -> None:
        """Move entries (heap-format lists) of one origin to the spill
        buffer, maintaining spilled_count/spilled_best."""
        best = self.spilled_best.get(origin)
        for tds, dow, rc, url, dts, seed, age, born in entries:
            self._spill_buf.append((url, origin, dow, dts, tds, rc, seed, age, born))
            key = (tds, dow, rc, url)
            if best is None or key < best:
                best = key
        self.spilled_best[origin] = best
        self.spilled_count[origin] = self.spilled_count.get(origin, 0) + len(entries)
        if len(self._spill_buf) >= 65536:
            self._flush_spill()

    def _flush_spill(self) -> None:
        if not self._spill_buf:
            return
        cols = list(zip(*self._spill_buf))
        t = pa.table(
            {
                "url": pa.array(cols[0], pa.string()),
                "origin": pa.array(cols[1], pa.string()),
                "dow": pa.array(cols[2], pa.int64()),
                "dts": pa.array(cols[3], pa.int64()),
                "tds": pa.array(cols[4], pa.int64()),
                "rc": pa.array(cols[5], pa.int64()),
                "is_seed": pa.array(cols[6], pa.bool_()),
                "age": pa.array(cols[7], pa.int64()),
                "born": pa.array(cols[8], pa.int64()),
            }
        )
        pq.write_table(t, self.spill_dir / f"spill-{self._spill_seq:06d}.parquet")
        self._spill_seq += 1
        self._spill_buf.clear()

    def _spilled_tables(self):
        self._flush_spill()
        segs = sorted(self.spill_dir.glob("spill-*.parquet")) if self.spill_dir else []
        return [pq.read_table(s) for s in segs], segs

    def _refill(self, needy: list[str]) -> None:
        """ONE batched scan over this shard's spill segments: reload the
        top max_resident entries of every needy origin into its heap and
        compact everything else into a fresh segment set. Exact by the
        resident≤spilled invariant — the reloaded top-K becomes the new
        resident head, the remainder's min becomes the new spilled_best."""
        tables, segs = self._spilled_tables()
        needy_set = set(needy)
        keep_rows: list[tuple] = []
        by_origin: dict[str, list] = {o: [] for o in needy_set}
        for t in tables:
            for url, origin, dow, dts, tds, rc, seed, age, born in zip(
                *(t.column(c).to_pylist() for c in self._SPILL_COLS)
            ):
                if origin in needy_set:
                    by_origin[origin].append([tds, dow, rc, url, dts, seed, age, born])
                else:
                    keep_rows.append((url, origin, dow, dts, tds, rc, seed, age, born))
        for s in segs:
            s.unlink()
        self._spill_buf = keep_rows
        for origin in needy_set:
            rows = sorted(by_origin[origin])
            head = rows[: self.max_resident]
            tail = rows[self.max_resident:]
            q = self.queues[origin]
            for e in head:
                heapq.heappush(q, e)
            self.spilled_count.pop(origin, None)
            self.spilled_best.pop(origin, None)
            if tail:
                self._spill_rows(origin, tail)
        if self._spill_buf:
            self._flush_spill()

    # ---- configuration --------------------------------------------------
    def set_delays(self, delays: dict[str, float]) -> None:
        """Per-origin crawl-delay from robots (intervals.rs:72-82: robots
        delay wins over config delay when larger)."""
        self.delays.update(delays)

    def _delay_for(self, origin: str) -> float:
        return max(self.default_delay, self.delays.get(origin, 0.0))

    # ---- enqueue --------------------------------------------------------
    def push(self, urls, origins, dows, dtss, tdss, is_seeds, ages, borns=None, rcs=None) -> int:
        """Enqueue entries. ``borns`` = the first wave each entry is
        poppable (callers pushing during wave w pass w+1; seeding passes
        0). ``rcs`` = per-entry recrawl score (0 = fresh, the default;
        recrawl refills pass the url's crawl count so the heap's
        depth-then-recrawl-score order holds). Age is LAZY: an entry's
        effective age at pop_wave(w) is ``age0 + (w - born)`` — the
        number of waves it was passed over — so nothing re-touches
        pending entries per wave (the eager aging loop was
        O(waves x frontier) Python, VERDICT r1 item 4)."""
        if borns is None:
            borns = [0] * len(urls)
        if rcs is None:
            rcs = [0] * len(urls)
        n = 0
        R = self.max_resident
        for url, origin, dow, dts, tds, seed, age, born, rc in zip(
            urls, origins, dows, dtss, tdss, is_seeds, ages, borns, rcs
        ):
            entry = [tds, dow, rc, url, dts, bool(seed), age, born]
            if R is not None:
                best = self.spilled_best.get(origin)
                if best is not None and (tds, dow, rc, url) >= best:
                    # worse than the best spilled entry -> straight to
                    # spill (keeps the resident<=spilled invariant)
                    self._spill_rows(origin, [entry])
                    n += 1
                    continue
            q = self.queues[origin]
            heapq.heappush(q, entry)
            n += 1
            if R is not None and len(q) > 2 * R:
                # amortized overflow: sort once, keep the best R resident,
                # spill the worse half
                q.sort()
                self.queues[origin] = q[:R]
                self._spill_rows(origin, q[R:])
        return n

    # ---- wave emission --------------------------------------------------
    def pop_wave(self, wave: int) -> pa.Table:
        """Emit this wave's batch: per origin, up to
        min(max_per_host, wave_seconds/delay) URLs in priority order.
        Entries whose lazy age ``age0 + (wave - born)`` exceeds
        max_queue_age drop at pop time (same emitted/dropped SETS as the
        eager per-wave aging loop, without touching pending entries every
        wave); stale entries do not consume politeness capacity. Origins
        iterated in sorted order over NON-EMPTY heaps only (empty heaps
        are deleted — the frontier never rescans dead origins).
        Deterministic: heaps give a total order."""
        now = wave * self.wave_seconds
        emitted_by: dict[str, int] = {}
        rows_by: dict[str, list] = {}   # origin -> emitted row tuples
        all_origins = sorted(
            set(self.queues.keys())
            | {o for o, c in self.spilled_count.items() if c}
        )
        pending = all_origins
        while pending:
            needy = []
            for origin in pending:
                q = self.queues.get(origin)
                capacity = min(self.max_per_host, max(1, int(self.wave_seconds / self._delay_for(origin))))
                emitted = emitted_by.get(origin, 0)
                out = rows_by.setdefault(origin, [])
                while q and emitted < capacity:
                    tds, dow, rc, url, dts, seed, age0, born = heapq.heappop(q)
                    eff_age = age0 + (wave - born)
                    if eff_age > self.max_queue_age:
                        self.dropped_by_age += 1
                        continue
                    seq = self.host_seq[origin]
                    self.host_seq[origin] = seq + 1
                    out.append((url, origin, dow, dts, tds, seed, eff_age, seq))
                    emitted += 1
                    self.last_access[origin] = now + emitted * self._delay_for(origin)
                emitted_by[origin] = emitted
                if q is not None and not q:
                    del self.queues[origin]
                if emitted < capacity and not self.queues.get(origin) and self.spilled_count.get(origin):
                    # head drained with politeness capacity left and cold
                    # entries spilled -> exactness requires a refill before
                    # this origin's wave batch is complete
                    needy.append(origin)
            if not needy:
                break
            self._refill(needy)
            pending = needy
        # assemble in stable sorted-origin order so refill passes never
        # change the emitted table (bounded == unbounded byte-identical)
        cols = {k: [] for k in ("url", "origin", "dow", "dts", "tds", "is_seed", "age", "wave", "host_seq")}
        for origin in all_origins:
            for url, o, dow, dts, tds, seed, eff_age, seq in rows_by.get(origin, ()):
                cols["url"].append(url)
                cols["origin"].append(o)
                cols["dow"].append(dow)
                cols["dts"].append(dts)
                cols["tds"].append(tds)
                cols["is_seed"].append(seed)
                cols["age"].append(eff_age)
                cols["wave"].append(wave)
                cols["host_seq"].append(seq)
        return pa.table(
            {name: pa.array(vals, FRONTIER_SCHEMA.field(name).type) for name, vals in cols.items()}
        )

    def count(self) -> int:
        # spilled entries are pending work — termination must see them
        return sum(len(q) for q in self.queues.values()) + sum(
            self.spilled_count.values()
        )

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "pending": self.count(),
            "spilled": sum(self.spilled_count.values()),
            "origins": len([q for q in self.queues.values() if q]),
            "dropped_by_age": self.dropped_by_age,
        }

    # ---- checkpoint -----------------------------------------------------
    def checkpoint_data(self) -> tuple:
        """(file_stem, snapshot_table, meta_json) — the in-actor part of a
        checkpoint is ONLY the state snapshot; persisting it is a plain
        task the crawl driver overlaps with the next wave's fetch (the
        actor returns immediately and is free to serve wave w+1 pops
        while round w's parquet writes in parallel)."""
        cols = {k: [] for k in ("url", "origin", "dow", "dts", "tds", "rc", "is_seed", "age", "born")}
        for origin, q in self.queues.items():
            for tds, dow, rc, url, dts, seed, age, born in q:
                cols["url"].append(url)
                cols["origin"].append(origin)
                cols["dow"].append(dow)
                cols["dts"].append(dts)
                cols["tds"].append(tds)
                cols["rc"].append(rc)
                cols["is_seed"].append(seed)
                cols["age"].append(age)
                cols["born"].append(born)
        t = pa.table({k: pa.array(v) for k, v in cols.items()}) if cols["url"] else pa.table(
            {k: pa.array([], pa.string() if k in ("url", "origin") else pa.int64()) for k in cols}
        )
        if self.spilled_count:
            # the checkpoint is the full pending set: resident + spilled
            # (restore() re-pushes everything and the spill plane
            # re-engages on overflow). At web scale you would hard-link
            # the immutable spill segments instead of rewriting rows.
            spilled, _ = self._spilled_tables()
            t = pa.concat_tables(
                [t.cast(spilled[0].schema), *spilled]
            ) if spilled else t
        meta = {
            "host_seq": dict(self.host_seq),
            "last_access": self.last_access,
            "dropped_by_age": self.dropped_by_age,
            "delays": self.delays,
        }
        return f"frontier_shard_{self.shard_id}", t, json.dumps(meta)

    def checkpoint(self, dir_path: str) -> None:
        """Synchronous convenience form (tests / non-overlapped callers)."""
        stem, t, meta = self.checkpoint_data()
        p = Path(dir_path)
        p.mkdir(parents=True, exist_ok=True)
        pq.write_table(t, p / f"{stem}.parquet")
        (p / f"{stem}.json").write_text(meta)

    def restore(self, dir_path: str) -> int:
        p = Path(dir_path)
        t = pq.read_table(p / f"frontier_shard_{self.shard_id}.parquet")
        meta = json.loads((p / f"frontier_shard_{self.shard_id}.json").read_text())
        self.queues.clear()
        # reset the spill plane — the checkpoint parquet carries the FULL
        # pending set; push() below re-spills past the resident bound
        self._spill_buf.clear()
        self.spilled_count.clear()
        self.spilled_best.clear()
        if self.spill_dir is not None:
            for s in self.spill_dir.glob("spill-*.parquet"):
                s.unlink()
        if t.num_rows:
            self.push(
                t.column("url").to_pylist(),
                t.column("origin").to_pylist(),
                t.column("dow").to_pylist(),
                t.column("dts").to_pylist(),
                t.column("tds").to_pylist(),
                t.column("is_seed").to_pylist(),
                t.column("age").to_pylist(),
                t.column("born").to_pylist(),
                t.column("rc").to_pylist(),
            )
        self.host_seq = defaultdict(int, {k: int(v) for k, v in meta["host_seq"].items()})
        self.last_access = meta["last_access"]
        self.dropped_by_age = meta["dropped_by_age"]
        self.delays = meta["delays"]
        return self.count()


def make_frontier_actor_cls():
    import ray

    # num_cpus=0: state shards are lightweight lookup/scheduling state
    # that must never crowd out the 1-CPU data-plane map tasks; their
    # work is O(batch) dict/heap ops, overlapped with fetch compute.
    @ray.remote(num_cpus=0)
    class FrontierShard(FrontierShardState):
        pass

    return FrontierShard
