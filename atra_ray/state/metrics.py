"""Per-wave metrics accumulator (A3) — fetch tasks report their batch's
status counts here (fire-and-forget actor calls), the driver reads the
wave's totals after the fetch pass materializes. Replaces a whole extra
Dataset execution per wave that existed only to count statuses."""

from __future__ import annotations

from collections import defaultdict

__all__ = ["CounterState", "make_counter_actor_cls"]


class CounterState:
    def __init__(self) -> None:
        self.by_wave: dict[int, dict[str, int]] = defaultdict(
            lambda: {"ok": 0, "miss": 0, "robots_denied": 0}
        )
        self._seen_batches: set[str] = set()
        self.drops_by_wave: dict[int, dict[str, int]] = {}

    def add(
        self, wave: int, ok: int, miss: int, denied: int, batch_id: str | None = None
    ) -> None:
        # idempotent under Ray task retries: a re-executed fetch task
        # re-reports its batch; the batch_id dedups it (marks are already
        # monotone upserts, so only the counters needed this guard)
        if batch_id is not None:
            if batch_id in self._seen_batches:
                return
            self._seen_batches.add(batch_id)
        c = self.by_wave[wave]
        c["ok"] += ok
        c["miss"] += miss
        c["robots_denied"] += denied

    def add_drops(self, wave: int, drops: dict, batch_id: str | None = None) -> None:
        """Link-filter drop accounting per wave ({reason: n})."""
        if batch_id is not None:
            if batch_id in self._seen_batches:
                return
            self._seen_batches.add(batch_id)
        d = self.drops_by_wave.setdefault(wave, {})
        for k, v in drops.items():
            d[k] = d.get(k, 0) + int(v)

    def get(self, wave: int) -> dict[str, int]:
        return dict(self.by_wave[wave])

    def get_drops(self, wave: int) -> dict[str, int]:
        return dict(self.drops_by_wave.get(wave, {}))


def make_counter_actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class Counter(CounterState):
        pass

    return Counter
