"""Seen-shard + frontier-shard unit semantics (no Ray — pure state classes;
the actors wrap these 1:1)."""

import pyarrow as pa

from atra_ray.state.frontier import FrontierShardState
from atra_ray.state.seen import (
    KIND_DISCOVERED,
    KIND_ERROR,
    KIND_PROCESSED,
    SeenShardState,
)


def test_seen_exactly_once():
    s = SeenShardState(0, num_bits=1 << 12)
    urls = ["https://a/1", "https://a/2", "https://a/1"]
    got = s.check_and_add(urls, [True, False, False], [(0, 0, 0), (1, 0, 1), (2, 0, 2)])
    assert got == [True, True, False]
    # second call: nothing new
    assert s.check_and_add(urls, [False] * 3, [(9, 9, 9)] * 3) == [False] * 3
    # first registration's depth is kept
    assert s.exact["https://a/1"] == [KIND_DISCOVERED, True, 0, 0, 0, -1, 0]


def test_seen_mark_is_monotone():
    s = SeenShardState(0, num_bits=1 << 12)
    s.check_and_add(["u"], [False], [(0, 0, 0)])
    s.mark(["u"], KIND_PROCESSED)
    s.mark(["u"], KIND_DISCOVERED)  # downgrade ignored
    assert s.exact["u"][0] == KIND_PROCESSED
    s2 = SeenShardState(1, num_bits=1 << 12)
    s2.mark(["v"], KIND_ERROR)  # mark on unknown url registers it
    assert s2.exact["v"][0] == KIND_ERROR


def test_seen_checkpoint_restore(tmp_path):
    s = SeenShardState(3, num_bits=1 << 12)
    s.check_and_add(["a", "b"], [True, False], [(0, 0, 0), (1, 0, 1)])
    s.mark(["a"], KIND_PROCESSED)
    s.checkpoint(str(tmp_path))
    r = SeenShardState(3, num_bits=1 << 12)
    assert r.restore(str(tmp_path)) == 2
    assert r.exact == s.exact
    # bloom rebuilt: duplicates still rejected
    assert r.check_and_add(["a"], [False], [(5, 5, 5)]) == [False]


def test_frontier_priority_and_politeness():
    f = FrontierShardState(0, delay_s=1.0, wave_seconds=4.0, max_per_host_per_wave=4)
    f.push(
        ["https://h/p3", "https://h/p1", "https://h/deep", "https://i/x"],
        ["h", "h", "h", "i"],
        [1, 1, 2, 0],
        [0, 0, 0, 0],
        [1, 1, 2, 0],
        [False, False, False, True],
        [0, 0, 0, 0],
    )
    t = f.pop_wave(0)
    # per-origin order: lower tds first, then url; origins sorted
    rows = t.to_pylist()
    h_rows = [r for r in rows if r["origin"] == "h"]
    assert [r["url"] for r in h_rows] == ["https://h/p1", "https://h/p3", "https://h/deep"]
    assert [r["host_seq"] for r in h_rows] == [0, 1, 2]
    assert all(r["wave"] == 0 for r in rows)
    assert f.count() == 0


def test_frontier_recrawl_score_ordering():
    """North-star per-host priority is (depth, recrawl-score, age): at
    equal depth FRESH entries (score 0) precede recrawls, and lower
    recrawl generations precede higher ones; depth still dominates (a
    shallow recrawl beats a deeper fresh url)."""
    f = FrontierShardState(0, delay_s=1.0, wave_seconds=8.0, max_per_host_per_wave=8)
    f.push(
        ["https://h/re-gen2", "https://h/zfresh", "https://h/re-gen1",
         "https://h/deep-fresh"],
        ["h"] * 4,
        [1, 1, 1, 2],
        [0] * 4,
        [1, 1, 1, 2],
        [False] * 4,
        [0] * 4,
        None,
        [2, 0, 1, 0],
    )
    urls = [r["url"] for r in f.pop_wave(0).to_pylist()]
    assert urls == [
        "https://h/zfresh",      # tds=1, rc=0 (fresh wins at equal depth)
        "https://h/re-gen1",     # tds=1, rc=1
        "https://h/re-gen2",     # tds=1, rc=2
        "https://h/deep-fresh",  # tds=2 (depth dominates the score)
    ]


def test_frontier_recrawl_score_survives_spill_and_checkpoint(tmp_path):
    """The rc term must round-trip through the spill plane and the
    checkpoint parquet — bounded and restored frontiers keep the same
    fresh-before-recrawl order."""
    f = FrontierShardState(
        0, delay_s=1.0, wave_seconds=8.0, max_per_host_per_wave=8,
        max_resident_per_origin=1, spill_dir=str(tmp_path / "spill"),
    )
    f.push(
        ["https://h/re", "https://h/a-fresh", "https://h/b-fresh"],
        ["h"] * 3, [1] * 3, [0] * 3, [1] * 3, [False] * 3, [0] * 3,
        None, [1, 0, 0],
    )
    f.checkpoint(str(tmp_path / "chk"))
    r = FrontierShardState(
        0, delay_s=1.0, wave_seconds=8.0, max_per_host_per_wave=8,
        max_resident_per_origin=1, spill_dir=str(tmp_path / "spill2"),
    )
    r.restore(str(tmp_path / "chk"))
    for fr in (f, r):
        assert [row["url"] for row in fr.pop_wave(0).to_pylist()] == [
            "https://h/a-fresh", "https://h/b-fresh", "https://h/re",
        ]


def test_frontier_capacity_and_aging():
    # delay 2 s in a 4 s wave -> capacity 2 per origin per wave
    f = FrontierShardState(0, delay_s=1.0, wave_seconds=4.0, max_per_host_per_wave=64, max_queue_age=1)
    f.set_delays({"h": 2.0})
    urls = [f"https://h/p{i}" for i in range(5)]
    f.push(urls, ["h"] * 5, [1] * 5, [0] * 5, [1] * 5, [False] * 5, [0] * 5)
    w0 = f.pop_wave(0)
    assert w0.num_rows == 2
    assert f.count() == 3  # leftovers lazily aged to 1 (== max, kept)
    w1 = f.pop_wave(1)
    assert w1.num_rows == 2
    assert [r["age"] for r in w1.to_pylist()] == [1, 1]  # passed over once
    # last survivor's lazy age hits 2 > max_queue_age=1 at the NEXT pop:
    # it stays pending until examined, then drops without consuming
    # politeness capacity (same emitted/dropped sets as eager aging)
    assert f.count() == 1
    w2 = f.pop_wave(2)
    assert w2.num_rows == 0
    assert f.count() == 0
    assert f.dropped_by_age == 1
    assert [r["host_seq"] for r in w1.to_pylist()] == [2, 3]


def test_frontier_checkpoint_restore(tmp_path):
    f = FrontierShardState(2, delay_s=1.0, max_per_host_per_wave=2)
    f.push(
        ["https://h/a", "https://h/b", "https://h/c"],
        ["h"] * 3,
        [1, 1, 1],
        [0, 0, 0],
        [1, 1, 1],
        [False] * 3,
        [0, 0, 0],
    )
    f.pop_wave(0)  # emits 2, ages 1
    f.checkpoint(str(tmp_path))
    r = FrontierShardState(2, delay_s=1.0, max_per_host_per_wave=2)
    assert r.restore(str(tmp_path)) == 1
    t = r.pop_wave(1)
    assert t.num_rows == 1
    # host_seq continues from the checkpointed counter
    assert t.to_pylist()[0]["host_seq"] == 2


def test_frontier_emits_arrow_schema():
    f = FrontierShardState(0)
    t = f.pop_wave(0)
    assert isinstance(t, pa.Table)
    assert t.num_rows == 0
    assert "host_seq" in t.column_names


def test_mark_tables_rejects_unpruned_blocks():
    """The mark pass contract (VERDICT r2 item 2): seen shards only ever
    receive the column-pruned (url, status) side table — a full-width
    result block (text/links on board) must be refused loudly."""
    s = SeenShardState(0)
    full = pa.table(
        {
            "url": ["https://h/a"],
            "status": ["ok"],
            "text": ["never ship me to a seen shard"],
        }
    )
    try:
        s.mark_tables([full], 1, 0)
        raise SystemExit("unpruned block accepted")
    except ValueError:  # hard raise (survives python -O, unlike assert)
        pass
    pruned = pa.table({"url": ["https://h/a"], "status": ["ok"]})
    counts = s.mark_tables([pruned], 1, 0)
    assert counts["ok"] == 1
    assert s.exact["https://h/a"][0] == KIND_PROCESSED


def test_mark_tables_vectorized_ownership():
    """Each shard marks exactly the urls it owns; the union over shards
    covers every row once (routing = url_shards_batch)."""
    from atra_ray.functions.urlkit import url_shards_batch

    urls = [f"https://h{i}.example/p{i}" for i in range(64)]
    status = ["ok" if i % 3 else "miss" for i in range(64)]
    t = pa.table({"url": urls, "status": status})
    num = 4
    shards = [SeenShardState(i) for i in range(num)]
    total = {}
    for s in shards:
        c = s.mark_tables([t], num, 5)
        for k, v in c.items():
            total[k] = total.get(k, 0) + v
    assert total["ok"] == sum(1 for st in status if st == "ok")
    assert total["miss"] == sum(1 for st in status if st == "miss")
    owner = url_shards_batch(urls, num)
    for i, u in enumerate(urls):
        assert u in shards[int(owner[i])].exact
        assert sum(u in s.exact for s in shards) == 1


def _drive(shard, cycles=6, per=40, chk_dir=None):
    """Admit/mark/checkpoint cycles with cross-cycle duplicate probes."""
    answers = []
    for c in range(cycles):
        urls = [f"https://h{i % 7}.example/c{c}/p{i}" for i in range(per)]
        dups = [f"https://h{i % 7}.example/c{max(0, c - 2)}/p{i}" for i in range(0, per, 3)]
        batch = urls + dups
        fresh = shard.check_and_add(
            batch, [False] * len(batch), [(1, 0, c)] * len(batch)
        )
        answers.append(tuple(fresh))
        shard.mark(urls[::2], KIND_PROCESSED, wave=c)
        shard.mark(urls[1::4], KIND_ERROR, wave=c)
        if chk_dir is not None:
            shard.checkpoint(f"{chk_dir}/round={c}")
    return answers


def test_seen_bounded_cache_matches_unbounded(tmp_path):
    """The at-scale memory model (bloom fast path + Parquet spill + exact
    anti-join) answers IDENTICALLY to the all-resident shard, while the
    resident cache stays bounded on a corpus larger than the cap."""
    cap = 50
    capped = SeenShardState(
        0, max_resident=cap, spill_dir=str(tmp_path / "spill")
    )
    plain = SeenShardState(0)
    a1 = _drive(capped, chk_dir=str(tmp_path / "chk"))
    a2 = _drive(plain)
    assert a1 == a2
    # 240 distinct urls were admitted; the capped shard keeps at most
    # cap + the since-last-checkpoint dirty set resident
    assert len(plain.exact) == 240
    assert len(capped.exact) < 240
    assert len(capped.exact) <= cap + 80  # cap + one cycle's dirty slack
    # authoritative state identical (merged view vs resident view)
    import pandas as pd

    t1 = capped.snapshot_table().to_pandas().sort_values("url").reset_index(drop=True)
    t2 = plain.snapshot_table().to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(t1, t2)
    assert capped.counts_by_kind() == plain.counts_by_kind()
    # recrawl scan sees spilled PROCESSED records too
    r1 = capped.recrawlable(10, 1.0, 5.0).to_pandas().sort_values("url").reset_index(drop=True)
    r2 = plain.recrawlable(10, 1.0, 5.0).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(r1, r2)


def test_seen_bounded_restore_stays_bounded(tmp_path):
    """Bounded-mode restore registers the checkpoint chain as spill
    segments and rebuilds only the bloom — the resident cache starts
    empty and membership answers stay exact."""
    src = SeenShardState(0)
    _drive(src, chk_dir=str(tmp_path / "chk"))
    chain = [str(tmp_path / "chk" / f"round={c}") for c in range(6)]
    r = SeenShardState(
        0, max_resident=50, spill_dir=str(tmp_path / "rspill")
    )
    n = r.restore(chain)
    assert n == 240
    assert len(r.exact) == 0  # nothing resident after restore
    # every restored url is seen; a new url is fresh
    old = [f"https://h{i % 7}.example/c3/p{i}" for i in range(40)]
    flags = r.check_and_add(
        old + ["https://new.example/x"], [False] * 41, [(0, 0, 0)] * 41
    )
    assert flags == [False] * 40 + [True]
    src.check_and_add(
        old + ["https://new.example/x"], [False] * 41, [(0, 0, 0)] * 41
    )
    # marks on spilled records promote with full fidelity
    r.mark([old[0]], KIND_PROCESSED, wave=9)
    assert r.exact[old[0]][0] == KIND_PROCESSED
    assert r.exact[old[0]][5] == 9
    src.mark([old[0]], KIND_PROCESSED, wave=9)
    import pandas as pd

    pd.testing.assert_frame_equal(
        r.snapshot_table().to_pandas().sort_values("url").reset_index(drop=True),
        src.snapshot_table().to_pandas().sort_values("url").reset_index(drop=True),
    )


def test_frontier_spill_equals_unbounded(tmp_path):
    """At-scale frontier memory model: cap each origin's resident heap at
    4 entries (cold tail in Parquet spill segments) and every pop_wave
    table, count() and final drain must be IDENTICAL to the unbounded
    frontier — the resident<=spilled invariant + exact batched refill.
    Workload exercises direct-to-spill pushes (worse than spilled best),
    overflow spills, multi-wave refills and age-drops inside spill."""
    import random

    rng = random.Random(7)
    kw = dict(delay_s=1.0, wave_seconds=4.0, max_per_host_per_wave=4,
              max_queue_age=6)
    ref = FrontierShardState(0, **kw)
    cap = FrontierShardState(
        0, **kw, max_resident_per_origin=4, spill_dir=str(tmp_path / "sp")
    )

    def push_batch(f, rows):
        f.push(
            [r[0] for r in rows], [r[1] for r in rows],
            [r[2] for r in rows], [r[3] for r in rows], [r[4] for r in rows],
            [r[5] for r in rows], [r[6] for r in rows],
            borns=[r[7] for r in rows],
        )

    # 3 origins x 60 entries, interleaved pushes across waves with mixed
    # priorities so late pushes land both above and below the spill line
    rows = []
    for i in range(180):
        o = f"h{i % 3}.example"
        tds = rng.randint(0, 5)
        rows.append(
            (f"https://{o}/p{i}", o, rng.randint(0, 3), tds, tds, False, 0, 0)
        )
    push_batch(ref, rows[:90])
    push_batch(cap, rows[:90])
    assert ref.count() == cap.count()

    spilled_seen = 0
    wave = 0
    while ref.count() or cap.count():
        t_ref = ref.pop_wave(wave)
        t_cap = cap.pop_wave(wave)
        assert t_ref.equals(t_cap), f"wave {wave} diverged"
        if wave == 1:  # mid-crawl pushes (worse AND better than spilled)
            push_batch(ref, rows[90:])
            push_batch(cap, rows[90:])
        spilled_seen = max(spilled_seen, sum(cap.spilled_count.values()))
        assert ref.count() == cap.count()
        wave += 1
        assert wave < 100
    assert spilled_seen > 0, "cap never engaged — test is vacuous"
    assert ref.dropped_by_age == cap.dropped_by_age


def test_frontier_spill_checkpoint_restore(tmp_path):
    """Checkpoint of a spilling frontier carries the FULL pending set;
    restore into a fresh capped shard reproduces the unbounded shard's
    pops exactly."""
    kw = dict(delay_s=1.0, wave_seconds=2.0, max_per_host_per_wave=2)
    ref = FrontierShardState(1, **kw)
    cap = FrontierShardState(
        1, **kw, max_resident_per_origin=2, spill_dir=str(tmp_path / "sp")
    )
    urls = [f"https://h.example/p{i:03d}" for i in range(30)]
    for f in (ref, cap):
        f.push(urls, ["h.example"] * 30, [0] * 30, [1] * 30, [1] * 30,
               [False] * 30, [0] * 30, borns=[0] * 30)
    ref.pop_wave(0)
    cap.pop_wave(0)
    chk = tmp_path / "chk"
    cap.checkpoint(str(chk))
    r = FrontierShardState(
        1, **kw, max_resident_per_origin=2, spill_dir=str(tmp_path / "sp2")
    )
    r.restore(str(chk))
    assert r.count() == ref.count()
    for w in range(1, 20):
        assert ref.pop_wave(w).equals(r.pop_wave(w))
        if not ref.count():
            break
