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
url)`` — seeds first, then BFS by discovery wave, deterministic total order
— and a per-origin politeness budget: a wave spans ``wave_seconds`` of
simulated time, so an origin with delay ``d`` may emit at most
``wave_seconds / d`` URLs per wave (the BSP analog of the reference's
1-page-per-delay interval clock). Entries passed over by a full origin age
by 1 per wave and drop past ``max_queue_age`` — the same starvation rule as
the reference's missed-host cache.

Politeness runs on SIMULATED time (BASELINE.md protocol): correctness tests
verify ordering/rate structure; wall-clock benches measure compute, not
sleeps.
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
    ):
        self.shard_id = shard_id
        self.default_delay = delay_s
        self.max_per_host = max_per_host_per_wave
        self.wave_seconds = wave_seconds if wave_seconds is not None else delay_s * max_per_host_per_wave
        self.max_queue_age = max_queue_age
        # origin -> heap of [tds, dow, url, dts, is_seed, age]
        self.queues: dict[str, list] = defaultdict(list)
        self.delays: dict[str, float] = {}      # robots crawl-delay overrides (T3→T1)
        self.host_seq: dict[str, int] = defaultdict(int)   # per-origin emit counter
        self.last_access: dict[str, float] = {}  # origin -> simulated ts (T7)
        self.dropped_by_age = 0

    # ---- configuration --------------------------------------------------
    def set_delays(self, delays: dict[str, float]) -> None:
        """Per-origin crawl-delay from robots (intervals.rs:72-82: robots
        delay wins over config delay when larger)."""
        self.delays.update(delays)

    def _delay_for(self, origin: str) -> float:
        return max(self.default_delay, self.delays.get(origin, 0.0))

    # ---- enqueue --------------------------------------------------------
    def push(self, urls, origins, dows, dtss, tdss, is_seeds, ages, borns=None) -> int:
        """Enqueue entries. ``borns`` = the first wave each entry is
        poppable (callers pushing during wave w pass w+1; seeding passes
        0). Age is LAZY: an entry's effective age at pop_wave(w) is
        ``age0 + (w - born)`` — the number of waves it was passed over —
        so nothing re-touches pending entries per wave (the eager aging
        loop was O(waves x frontier) Python, VERDICT r1 item 4)."""
        if borns is None:
            borns = [0] * len(urls)
        n = 0
        for url, origin, dow, dts, tds, seed, age, born in zip(
            urls, origins, dows, dtss, tdss, is_seeds, ages, borns
        ):
            heapq.heappush(
                self.queues[origin], [tds, dow, url, dts, bool(seed), age, born]
            )
            n += 1
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
        cols = {k: [] for k in ("url", "origin", "dow", "dts", "tds", "is_seed", "age", "wave", "host_seq")}
        now = wave * self.wave_seconds
        for origin in sorted(self.queues.keys()):
            q = self.queues[origin]
            capacity = min(self.max_per_host, max(1, int(self.wave_seconds / self._delay_for(origin))))
            emitted = 0
            while q and emitted < capacity:
                tds, dow, url, dts, seed, age0, born = heapq.heappop(q)
                eff_age = age0 + (wave - born)
                if eff_age > self.max_queue_age:
                    self.dropped_by_age += 1
                    continue
                seq = self.host_seq[origin]
                self.host_seq[origin] = seq + 1
                cols["url"].append(url)
                cols["origin"].append(origin)
                cols["dow"].append(dow)
                cols["dts"].append(dts)
                cols["tds"].append(tds)
                cols["is_seed"].append(seed)
                cols["age"].append(eff_age)
                cols["wave"].append(wave)
                cols["host_seq"].append(seq)
                emitted += 1
                self.last_access[origin] = now + emitted * self._delay_for(origin)
            if not q:
                del self.queues[origin]
        return pa.table(
            {name: pa.array(vals, FRONTIER_SCHEMA.field(name).type) for name, vals in cols.items()}
        )

    def count(self) -> int:
        return sum(len(q) for q in self.queues.values())

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "pending": self.count(),
            "origins": len([q for q in self.queues.values() if q]),
            "dropped_by_age": self.dropped_by_age,
        }

    # ---- checkpoint -----------------------------------------------------
    def checkpoint(self, dir_path: str) -> None:
        p = Path(dir_path)
        p.mkdir(parents=True, exist_ok=True)
        cols = {k: [] for k in ("url", "origin", "dow", "dts", "tds", "is_seed", "age", "born")}
        for origin, q in self.queues.items():
            for tds, dow, url, dts, seed, age, born in q:
                cols["url"].append(url)
                cols["origin"].append(origin)
                cols["dow"].append(dow)
                cols["dts"].append(dts)
                cols["tds"].append(tds)
                cols["is_seed"].append(seed)
                cols["age"].append(age)
                cols["born"].append(born)
        t = pa.table({k: pa.array(v) for k, v in cols.items()}) if cols["url"] else pa.table(
            {k: pa.array([], pa.string() if k in ("url", "origin") else pa.int64()) for k in cols}
        )
        pq.write_table(t, p / f"frontier_shard_{self.shard_id}.parquet")
        meta = {
            "host_seq": dict(self.host_seq),
            "last_access": self.last_access,
            "dropped_by_age": self.dropped_by_age,
            "delays": self.delays,
        }
        (p / f"frontier_shard_{self.shard_id}.json").write_text(json.dumps(meta))

    def restore(self, dir_path: str) -> int:
        p = Path(dir_path)
        t = pq.read_table(p / f"frontier_shard_{self.shard_id}.parquet")
        meta = json.loads((p / f"frontier_shard_{self.shard_id}.json").read_text())
        self.queues.clear()
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
