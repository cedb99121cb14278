"""Curation operators: PII scrub, n-gram decontamination, stratified
sampling, and the sortless hash_reduce_small exchange they ride on."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pii_docs_parquet(tmp_path_factory):
    p = tmp_path_factory.mktemp("pii") / "docs.parquet"
    texts = [
        "write to alice.smith+spam@mail.example.com or bob@sub.host.org now",
        "call +49 170 1234567 or +1 555 0100 about server 10.1.2.3 tomorrow",
        "no pii here at all",
        None,
        "version 1.2.3.4 is an ip-shaped string and 999.999.999.999 too",
    ]
    pq.write_table(
        pa.table(
            {
                "url": pa.array([f"u{i}" for i in range(len(texts))], pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        p,
    )
    return str(p)


def test_pii_scrub_replaces_and_counts(ray_session, pii_docs_parquet):
    from atra_ray.stages.curation import pii_scrub

    rows = {r["url"]: r for r in pii_scrub(pii_docs_parquet).take_all()}
    r0 = rows["u0"]
    assert r0["n_emails"] == 2 and r0["n_phones"] == 0 and r0["n_ips"] == 0
    assert "<EMAIL>" in r0["text_scrubbed"]
    assert "alice" not in r0["text_scrubbed"] and "bob@" not in r0["text_scrubbed"]
    r1 = rows["u1"]
    assert r1["n_phones"] == 2 and r1["n_ips"] == 1
    assert "<PHONE>" in r1["text_scrubbed"] and "<IP>" in r1["text_scrubbed"]
    assert "10.1.2.3" not in r1["text_scrubbed"]
    r2 = rows["u2"]
    assert r2["text_scrubbed"] == "no pii here at all"
    assert r2["n_emails"] == r2["n_phones"] == r2["n_ips"] == 0
    # null text passes through as null (SQL regexp_replace(NULL) semantics)
    assert rows["u3"]["text_scrubbed"] is None and rows["u3"]["n_emails"] is None
    # dotted-quad pattern is syntactic (matches ip-shaped version strings,
    # same as the SQL oracle — \d{1,3} quads)
    assert rows["u4"]["n_ips"] == 2


@pytest.fixture(scope="module")
def contaminated_docs_parquet(tmp_path_factory):
    p = tmp_path_factory.mktemp("decon") / "docs.parquet"
    bench_span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    texts = {
        0: f"benchmark question: {bench_span} answer follows",     # bench (0%50)
        1: f"a training doc quoting {bench_span} verbatim here",   # contaminated
        2: "a clean training doc with entirely original phrasing today",
        3: f"another copy: {bench_span} and {bench_span} twice",   # 1 distinct gram
        50: "second benchmark doc with different content entirely unique",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        ),
        p,
    )
    return str(p)


def test_decontaminate_flags_ngram_overlap(ray_session, contaminated_docs_parquet):
    from atra_ray.stages.curation import decontaminate

    rows = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(contaminated_docs_parquet, ngram=8).take_all()
    }
    assert rows[1] == 1          # shares exactly the one 8-gram
    assert rows[3] == 1          # distinct-gram count, not occurrences
    assert 2 not in rows         # clean doc not flagged
    assert 0 not in rows and 50 not in rows  # bench docs excluded


def test_word_ngrams_vectorized_matches_naive():
    from atra_ray.stages.curation import _word_ngrams

    texts = pa.array(
        ["The quick! brown fox-jumps", "a b", None, "", "x y z w"], pa.string()
    )
    grams, parents = _word_ngrams(texts, 3)
    got = sorted(zip(grams.to_pylist(), parents.tolist()))
    assert got == [
        ("brown fox jumps", 0),
        ("quick brown fox", 0),
        ("the quick brown", 0),
        ("x y z", 4),
        ("y z w", 4),
    ]


@pytest.fixture(scope="module")
def lang_docs_parquet(tmp_path_factory):
    p = tmp_path_factory.mktemp("strat") / "docs.parquet"
    n = 300
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array(
                    ["en" if i % 3 else "de" for i in range(n)], pa.string()
                ),
            }
        ),
        p,
    )
    return str(p)


def test_stratified_sample_deterministic_topk(ray_session, lang_docs_parquet):
    from atra_ray.stages.curation import stratified_sample

    out = stratified_sample(lang_docs_parquet, per_group=5).take_all()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de"}
    assert all(len(v) == 5 for v in by_lang.values())
    # ranks are 1..K in md5-hash order — recompute the expectation
    def h(i):
        return int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")

    for lang, rows in by_lang.items():
        ids = [i for i in range(300) if (["de", "en"][bool(i % 3)]) == lang]
        expect = sorted(ids, key=lambda i: (h(i), i))[:5]
        got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rk"])]
        assert got == expect
    # deterministic under re-run
    out2 = stratified_sample(lang_docs_parquet, per_group=5).take_all()
    assert sorted((r["doc_id"], r["rk"]) for r in out2) == sorted(
        (r["doc_id"], r["rk"]) for r in out
    )


def test_weighted_sample_deterministic_threshold(ray_session, tmp_path):
    from atra_ray.functions.hashing import md5_low64
    from atra_ray.stages.curation import weighted_sample

    p = tmp_path / "docs.parquet"
    texts = {
        0: " ".join(["w"] * 600),   # >= cap -> always kept
        1: " ".join(["w"] * 250),   # kept iff h < 2^64/2
        2: "",                      # 0 tokens -> never kept
        3: None,                    # null text -> never kept
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        ),
        p,
    )
    rows = {r["doc_id"]: r for r in weighted_sample(str(p), cap_tokens=500).take_all()}
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] == (md5_low64("1") * 500 < 250 * (1 << 64))
    assert rows[2]["keep"] is False
    assert rows[3]["keep"] is None  # SQL NULL-comparison semantics
    again = {r["doc_id"]: r["keep"] for r in weighted_sample(str(p)).take_all()}
    assert again == {k: v["keep"] for k, v in rows.items()}


def test_hash_reduce_small_sums_match_naive(ray_session):
    import ray.data as rd
    import pyarrow.compute as pc
    from atra_ray.stages.shuffle import hash_reduce_small

    ds = rd.from_items(
        [{"k": f"key{i % 37}", "n": i % 5} for i in range(2000)]
    ).map_batches(lambda t: t, batch_format="pyarrow")

    def _sum(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("n", "sum")])
        return pa.table({"k": g.column("k"), "n": pc.cast(g.column("n_sum"), pa.int64())})

    out = hash_reduce_small(ds, ["k"], _sum, num_partitions=4)
    got = dict(zip(out.column("k").to_pylist(), out.column("n").to_pylist()))
    expect = {}
    for i in range(2000):
        expect[f"key{i % 37}"] = expect.get(f"key{i % 37}", 0) + i % 5
    assert got == expect
    # tree-combine path (fan_in smaller than the block count), with and
    # without an associative combine_fn — identical result
    out2 = hash_reduce_small(ds, ["k"], _sum, num_partitions=4, fan_in=2)
    assert dict(zip(out2.column("k").to_pylist(), out2.column("n").to_pylist())) == expect
    out3 = hash_reduce_small(
        ds, ["k"], _sum, num_partitions=4, fan_in=2, combine_fn=_sum
    )
    assert dict(zip(out3.column("k").to_pylist(), out3.column("n").to_pylist())) == expect


def test_windowed_event_agg(ray_session, tmp_path):
    import datetime as dt

    from atra_ray.stages.events import windowed_event_agg

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        ("click", base + dt.timedelta(minutes=5), 1.0),
        ("click", base + dt.timedelta(minutes=50), 3.0),
        ("click", base + dt.timedelta(minutes=70), 9.0),   # next hour
        ("view", base + dt.timedelta(minutes=10), -2.0),
    ]
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    p = tmp_path / "events.parquet"
    pq.write_table(t, p)
    out = {
        (r["event_type"], r["window_start"].hour): r
        for r in windowed_event_agg(str(p)).take_all()
    }
    assert out[("click", 10)]["n"] == 2
    assert out[("click", 10)]["min_value"] == 1.0
    assert out[("click", 10)]["max_value"] == 3.0
    assert out[("click", 11)]["n"] == 1
    assert out[("view", 10)]["min_value"] == -2.0


def test_windowed_event_agg_keeps_null_groups(ray_session, tmp_path):
    """Null ts / event_type form their own groups (SQL GROUP BY
    semantics; pandas groupby would silently drop them by default)."""
    import datetime as dt

    from atra_ray.stages.events import windowed_event_agg

    t = pa.table(
        {
            "event_type": pa.array(["click", None, "click"], pa.string()),
            "ts": pa.array(
                [dt.datetime(2026, 1, 1, 10, 5), dt.datetime(2026, 1, 1, 10, 6), None],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    p = tmp_path / "events.parquet"
    pq.write_table(t, p)
    rows = windowed_event_agg(str(p)).take_all()
    assert len(rows) == 3  # (click,10h), (None,10h), (click,NaT)
    null_type = [r for r in rows if r["event_type"] is None]
    assert len(null_type) == 1 and null_type[0]["n"] == 1


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, ts, event_type, value)"""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    p = tmp_path / "events.parquet"
    pq.write_table(t, p)
    return str(p)


def test_asof_join_events_tie_semantics(ray_session, tmp_path):
    """Prior-or-equal: a click at the same instant as the purchase IS the
    match; among same-instant clicks the max event_id wins; a purchase
    before any click carries nulls; users never cross."""
    import datetime as dt

    from atra_ray.stages.events import asof_join_events

    b = dt.datetime(2026, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 7, b + 0 * m, "purchase", 10.0),      # before any click -> null
        (2, 7, b + 5 * m, "click", 1.0),
        (3, 7, b + 5 * m, "click", 2.0),          # same instant, higher id
        (4, 7, b + 5 * m, "purchase", 11.0),      # equal-ts tie -> click id 3
        (5, 7, b + 9 * m, "purchase", 12.0),      # later -> still click id 3
        (6, 8, b + 1 * m, "click", 5.0),
        (7, 8, b + 2 * m, "purchase", 13.0),      # other user's own click
        (8, 9, b + 3 * m, "purchase", 14.0),      # user with no clicks at all
    ]
    p = _write_events(tmp_path, rows)
    out = (
        asof_join_events(p, num_partitions=3)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(out) == 5  # purchases only
    assert pd.isna(out.loc[1, "prior_ts"]) and pd.isna(out.loc[1, "prior_value"])
    assert out.loc[4, "prior_value"] == 2.0 and out.loc[4, "prior_ts"] == b + 5 * m
    assert out.loc[5, "prior_value"] == 2.0
    assert out.loc[7, "prior_value"] == 5.0
    assert pd.isna(out.loc[8, "prior_value"])


def test_sessionize_gap_boundary(ray_session, tmp_path):
    """A gap of exactly 30 min keeps the session; 30 min + 1 us splits.
    session_id numbers 1..k per user in time order."""
    import datetime as dt

    from atra_ray.stages.events import sessionize

    b = dt.datetime(2026, 1, 1)
    rows = [
        (1, 1, b, "click", 1.0),
        (2, 1, b + dt.timedelta(minutes=30), "click", 2.0),            # exactly gap: same session
        (3, 1, b + dt.timedelta(minutes=60, microseconds=1), "click", 3.0),  # gap+1us: new session
        (4, 2, b, "view", 9.0),
    ]
    p = _write_events(tmp_path, rows)
    out = (
        sessionize(p, gap_minutes=30, num_partitions=2)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    u1 = out[out.user_id == 1]
    assert list(u1.session_id) == [1, 2]
    assert list(u1.n_events) == [2, 1]
    assert u1.iloc[0].session_start == b
    assert u1.iloc[0].session_end == b + dt.timedelta(minutes=30)
    assert u1.iloc[0].min_value == 1.0 and u1.iloc[0].max_value == 2.0
    assert out[out.user_id == 2].iloc[0].n_events == 1


def test_interval_join_count_inclusive_bounds(ray_session, tmp_path):
    """[ts, ts+10min] inclusive at BOTH ends; same-instant click counts;
    a click 10min+1us later does not; users never cross."""
    import datetime as dt

    from atra_ray.stages.events import interval_join_count

    b = dt.datetime(2026, 1, 1)
    rows = [
        (1, 1, b, "view", 0.0),
        (2, 1, b, "click", 0.0),                                     # same instant: in
        (3, 1, b + dt.timedelta(minutes=10), "click", 0.0),          # boundary: in
        (4, 1, b + dt.timedelta(minutes=10, microseconds=1), "click", 0.0),  # out
        (5, 1, b - dt.timedelta(microseconds=1), "click", 0.0),      # before: out
        (6, 2, b + dt.timedelta(minutes=5), "click", 0.0),           # other user
        (7, 2, b + dt.timedelta(minutes=4), "view", 0.0),
        (8, 3, b, "view", 0.0),                                      # user with no clicks
    ]
    p = _write_events(tmp_path, rows)
    out = (
        interval_join_count(p, num_partitions=3)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(out) == 3
    assert out.loc[1, "n_followups"] == 2
    assert out.loc[7, "n_followups"] == 1
    assert out.loc[8, "n_followups"] == 0


def test_rolling_user_agg_window(ray_session, tmp_path):
    """Running max over the last 3 events per user; occupancy ramps 1..3;
    ordering is (ts, event_id) within user."""
    import datetime as dt

    from atra_ray.stages.events import rolling_user_agg

    b = dt.datetime(2026, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 1, b + 0 * m, "click", 5.0),
        (2, 1, b + 1 * m, "click", 1.0),
        (3, 1, b + 2 * m, "click", 2.0),
        (4, 1, b + 3 * m, "click", 3.0),   # 5.0 leaves the window here
        (5, 2, b + 0 * m, "view", 9.0),
    ]
    p = _write_events(tmp_path, rows)
    out = (
        rolling_user_agg(p, window=3, num_partitions=2)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert list(out.loc[[1, 2, 3, 4], "rolling_max"]) == [5.0, 5.0, 5.0, 3.0]
    assert list(out.loc[[1, 2, 3, 4], "n_in_window"]) == [1, 2, 3, 3]
    assert out.loc[5, "rolling_max"] == 9.0 and out.loc[5, "n_in_window"] == 1


def test_tfidf_topk_fixed_point(ray_session, tmp_path):
    """Hand-checkable fixed-point TF-IDF: idf = N/df floor-scaled per
    term, score ties break by doc_id, docs without query terms excluded,
    null text tolerated (still counts toward N)."""
    from atra_ray.stages.text_analysis import tfidf_topk

    texts = [
        "data data hash",   # doc 0: tf(data)=2, tf(hash)=1
        "data join",        # doc 1
        "hash hash hash",   # doc 2
        "nothing relevant", # doc 3
        None,               # doc 4 (counts toward N only)
        "join",             # doc 5: same score as doc 1's join part? no: doc1 has data too
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    p = tmp_path / "documents.parquet"
    pq.write_table(t, p)
    out = tfidf_topk(str(p), query_terms=("data", "hash", "join"), k=3, scale=100)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    N = 6
    df = {"data": 2, "hash": 2, "join": 2}
    score = lambda tf: sum((c * 100 * N) // df[w] for w, c in tf.items())
    exp0 = score({"data": 2, "hash": 1})  # 900
    exp1 = score({"data": 1, "join": 1})  # 600
    exp2 = score({"hash": 3})             # 900
    assert rows[0]["score_fp"] == exp0 and rows[2]["score_fp"] == exp2
    # tie 900 vs 900: doc 0 before doc 2
    assert rows[0]["rank"] == 1 and rows[2]["rank"] == 2
    assert rows[1]["score_fp"] == exp1 and rows[1]["rank"] == 3
    assert 3 not in rows and 4 not in rows and 5 not in rows  # k=3 cut: doc5 (300) out


def test_group_quantiles_discrete_selection(ray_session, tmp_path):
    """p50/p90 are SELECTED order statistics at 0-indexed position
    ((n-1)*q_num)//q_den — verified against hand-computed indices for
    even and odd group sizes."""
    import datetime as dt

    from atra_ray.stages.events import group_quantiles

    b = dt.datetime(2026, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = []
    # group "a": values 10..1 reversed, n=10 -> p50 = sorted[4] = 5, p90 = sorted[8] = 9
    for i in range(10):
        rows.append((i, 1, b + i * m, "a", float(10 - i)))
    # group "b": n=3 -> p50 = sorted[1], p90 = sorted[1]  ((2*9)//10 = 1)
    for j, v in enumerate([7.0, 3.0, 5.0]):
        rows.append((100 + j, 2, b + j * m, "b", v))
    p = _write_events(tmp_path, rows)
    out = (
        group_quantiles(p, num_partitions=3)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert out.loc["a", "n"] == 10
    assert out.loc["a", "p50"] == 5.0 and out.loc["a", "p90"] == 9.0
    assert out.loc["b", "n"] == 3
    assert out.loc["b", "p50"] == 5.0 and out.loc["b", "p90"] == 5.0


def test_sessionize_bucketed_boundary_stitch(ray_session, tmp_path):
    """The (user, time-bucket) sub-partitioned path: ONE user's events
    span many 1-hour buckets, with sessions that cross bucket boundaries
    (25-min steps chain across the hour line) and sessions fully inside
    a bucket — the stitched result is byte-identical to the
    one-exchange path."""
    import datetime as dt

    from atra_ray.stages.events import sessionize

    b = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # user 1: a 10-hour chain of 25-min steps (one long session crossing
    # every bucket boundary), then a 2-hour pause, then a tight burst
    t = b
    for _ in range(24):
        rows.append((eid, 1, t, "view", float(eid)))
        eid += 1
        t += dt.timedelta(minutes=25)
    t += dt.timedelta(hours=2)
    for _ in range(5):
        rows.append((eid, 1, t, "click", float(100 - eid)))
        eid += 1
        t += dt.timedelta(minutes=5)
    # exactly-gap pause ON a bucket boundary keeps the session (>gap
    # starts one): event at :30 then next at 01:00:00 with gap=30min
    rows.append((1000, 2, b + dt.timedelta(minutes=30), "view", 1.0))
    rows.append((1001, 2, b + dt.timedelta(hours=1), "view", 2.0))
    rows.append((1002, 2, b + dt.timedelta(hours=1, minutes=31), "view", 3.0))
    p = _write_events(tmp_path, rows)

    def canon(ds):
        return (
            ds.to_pandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )

    one = canon(sessionize(p, num_partitions=3))
    bucketed = canon(sessionize(p, num_partitions=5, bucket_hours=1))
    pd.testing.assert_frame_equal(one, bucketed)
    # sanity: user 1 really spans many buckets but only 2 sessions
    assert one.loc[one.user_id == 1, "session_id"].tolist() == [1, 2]
    # user 2: the exactly-30-min seam merges, the 31-min one splits
    assert one.loc[one.user_id == 2, "n_events"].tolist() == [2, 1]


def test_group_quantiles_histogram_path_large_group(ray_session, tmp_path):
    """The two-pass histogram selection: ONE group larger than a batch
    (and far larger than rescan_cap), num_partitions=8 — no partition
    ever holds the group's values; the bucket passes + bounded rescan
    still return the exact numpy order statistics."""
    import datetime as dt

    import numpy as np

    from atra_ray.stages.events import group_quantiles

    rng = np.random.RandomState(7)
    n = 50_000
    vals = np.round(rng.lognormal(3.0, 1.2, n), 4)  # skewed, many ties
    b = dt.datetime(2026, 1, 1)
    m = dt.timedelta(seconds=1)
    rows = [(i, i % 97, b + i * m, "solo", float(vals[i])) for i in range(n)]
    p = _write_events(tmp_path, rows)
    out = (
        group_quantiles(p, num_partitions=8, n_buckets=64, rescan_cap=200)
        .to_pandas()
        .set_index("event_type")
    )
    s = np.sort(vals)
    assert out.loc["solo", "n"] == n
    assert out.loc["solo", "p50"] == s[(n - 1) // 2]
    assert out.loc["solo", "p90"] == s[((n - 1) * 9) // 10]


def test_group_quantiles_infinite_values(ray_session, tmp_path):
    """±inf values must be EXACT, not NaN-bin garbage: a histogram
    interval containing an infinity has infinite bucket width, so the
    min/max pass keeps finite bounds and the driver answers inf-landing
    ranks from the per-group ±inf counts. Sort order contract:
    -inf < finite < +inf < NaN. Checked against numpy selection on the
    same data across partition counts, with groups whose p50/p90 land
    in the -inf prefix, the finite middle (via the histogram path) and
    the +inf suffix."""
    import datetime as dt

    import numpy as np

    from atra_ray.stages.events import group_quantiles

    b = dt.datetime(2026, 1, 1)
    m = dt.timedelta(seconds=1)
    rng = np.random.RandomState(3)
    groups = {
        # p50 lands on a finite value (histogram path forced: 2000 values
        # >> rescan_cap), p90 lands inside the +inf suffix
        "mid": np.concatenate(
            [[-np.inf] * 100, np.round(rng.rand(2000) * 50, 3), [np.inf] * 400]
        ),
        # p50 inside the -inf prefix
        "neg": np.concatenate([[-np.inf] * 30, rng.rand(10)]),
        # only infs, no finite values at all (vmin/vmax are NaN)
        "allinf": np.array([-np.inf] * 5 + [np.inf] * 5),
    }
    rows, eid = [], 0
    for et, vals in groups.items():
        for v in vals:
            rows.append((eid, eid % 13, b + eid * m, et, float(v)))
            eid += 1
    p = _write_events(tmp_path, rows)
    for parts in (2, 5):
        out = (
            group_quantiles(p, num_partitions=parts, n_buckets=32, rescan_cap=64)
            .to_pandas()
            .set_index("event_type")
        )
        for et, vals in groups.items():
            s = np.sort(vals)  # numpy: -inf < finite < +inf (no NaN here)
            n = len(vals)
            assert out.loc[et, "n"] == n
            assert out.loc[et, "p50"] == s[(n - 1) // 2], et
            assert out.loc[et, "p90"] == s[((n - 1) * 9) // 10], et


def test_group_quantiles_ulp_adjacent_heavy_ties(ray_session, tmp_path):
    """Histogram-unsplittable interval: every value is one of three
    ULP-ADJACENT doubles, each duplicated far beyond rescan_cap — bucket
    width (hi-lo)/n_buckets underflows to 0, so the pass can never
    narrow. The force-collect path must resolve via the count-based
    gather (distinct values + counts, never raw rows) and still return
    the exact order statistics."""
    import datetime as dt

    import numpy as np

    from atra_ray.stages.events import group_quantiles

    a = 1.5
    b = np.nextafter(a, np.inf)
    c = np.nextafter(b, np.inf)
    vals = np.array([a] * 700 + [b] * 900 + [c] * 400)
    base = dt.datetime(2026, 1, 1)
    m = dt.timedelta(seconds=1)
    rows = [(i, i % 11, base + i * m, "ulp", float(vals[i]))
            for i in range(len(vals))]
    p = _write_events(tmp_path, rows)
    out = (
        group_quantiles(p, num_partitions=3, n_buckets=32, rescan_cap=50)
        .to_pandas()
        .set_index("event_type")
    )
    s = np.sort(vals)
    n = len(vals)
    assert out.loc["ulp", "n"] == n
    assert out.loc["ulp", "p50"] == s[(n - 1) // 2]
    assert out.loc["ulp", "p90"] == s[((n - 1) * 9) // 10]


def test_group_quantiles_heavy_ties_and_nan_tail(ray_session, tmp_path):
    """Degenerate cases of the histogram path: a bucket of identical
    values resolves without a rescan (min == max short-circuit), and
    null values order last — a rank landing in the null tail yields a
    null quantile (SQL ASC NULLS LAST mirror)."""
    import datetime as dt

    import numpy as np

    from atra_ray.stages.events import group_quantiles

    b = dt.datetime(2026, 1, 1)
    m = dt.timedelta(seconds=1)
    rows = []
    # group "tie": 3000 copies of 7.5 plus tails — p50 sits inside the
    # tied run, far above rescan_cap=100, so only the min==max
    # short-circuit can resolve it
    vals_tie = [1.0] * 500 + [7.5] * 3000 + [9.0] * 500
    for i, v in enumerate(vals_tie):
        rows.append((i, 1, b + i * m, "tie", v))
    # group "nul": 4 numbers + 6 nulls -> p50 = sorted[4] = null tail
    vals_nul = [4.0, 2.0, 3.0, 1.0] + [None] * 6
    for j, v in enumerate(vals_nul):
        rows.append((10_000 + j, 2, b + j * m, "nul", v))
    p = _write_events(tmp_path, rows)
    out = (
        group_quantiles(p, num_partitions=4, n_buckets=16, rescan_cap=100)
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["tie", "n"] == 4000
    assert out.loc["tie", "p50"] == 7.5
    assert out.loc["tie", "p90"] == 9.0
    assert out.loc["nul", "n"] == 10
    assert np.isnan(out.loc["nul", "p50"])  # rank 4 is in the null tail
    assert np.isnan(out.loc["nul", "p90"])
    # p-quantile landing among numerics still exact: p25-equivalent check
    # via a third group with nulls but rank inside numerics
    rows2 = [(i, 3, b + i * m, "mix", v)
             for i, v in enumerate([5.0, 1.0, 3.0, None])]
    p2 = _write_events(tmp_path, rows2 + rows)
    out2 = (
        group_quantiles(p2, num_partitions=4, n_buckets=16, rescan_cap=100)
        .to_pandas()
        .set_index("event_type")
    )
    assert out2.loc["mix", "p50"] == 3.0  # k=(4-1)//2=1 -> sorted[1]=3.0


def test_json_field_stats_exclusions(ray_session, tmp_path):
    """Null props, unparseable JSON, missing field, and non-integer
    values are excluded; counts/min/max/distinct are exact."""
    from atra_ray.stages.events import json_field_stats

    props = [
        '{"k": 5}', '{"k": 9}', '{"k": 5}',   # a: n=3, distinct {5,9}
        None,                                  # a: null props
        '{not json',                           # a: unparseable
        '{"other": 1}',                        # a: missing field
        '{"k": true}',                         # a: bool is not an int
        '{"k": 2.5}',                          # a: float excluded
        '{"k": -3}',                           # b: negative int fine
    ]
    types = ["a"] * 8 + ["b"]
    t = pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "props": pa.array(props, pa.string()),
        }
    )
    p = tmp_path / "events.parquet"
    pq.write_table(t, p)
    out = (
        json_field_stats(str(p))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert len(out) == 2
    assert out.loc["a", "n"] == 3
    assert out.loc["a", "min_k"] == 5 and out.loc["a", "max_k"] == 9
    assert out.loc["a", "n_distinct_k"] == 2
    assert out.loc["b", "n"] == 1 and out.loc["b", "min_k"] == -3


def test_group_topk_users_tiebreak(ray_session, tmp_path):
    """Equal counts rank by user_id ascending; k cuts per group."""
    import datetime as dt

    from atra_ray.stages.events import group_topk_users

    b = dt.datetime(2026, 1, 1)
    m = dt.timedelta(minutes=1)
    rows, eid = [], 0
    for u, n in [(9, 3), (2, 3), (5, 1), (7, 2)]:  # type "a"
        for i in range(n):
            rows.append((eid, u, b + eid * m, "a", 0.0)); eid += 1
    rows.append((eid, 1, b, "b", 0.0)); eid += 1
    p = _write_events(tmp_path, rows)
    out = (
        group_topk_users(p, k=3, num_partitions=2)
        .to_pandas()
        .sort_values(["event_type", "rank"])
        .reset_index(drop=True)
    )
    a = out[out.event_type == "a"]
    # counts: u2=3, u9=3 (tie -> u2 first), u7=2; u5 (1) cut by k=3
    assert list(a.user_id) == [2, 9, 7]
    assert list(a.n_events) == [3, 3, 2]
    assert list(a["rank"]) == [1, 2, 3]
    assert out[out.event_type == "b"].iloc[0].user_id == 1


def test_value_histogram_clamps_edges(ray_session, tmp_path):
    """Underflow/overflow land in the first/last bin; bin_lo derives
    from (lo, width)."""
    import datetime as dt

    from atra_ray.stages.events import value_histogram

    b = dt.datetime(2026, 1, 1)
    vals = [-5.0, 0.0, 9.99, 10.0, 199.9, 200.0, 1e6]
    rows = [(i, 1, b, "a", v) for i, v in enumerate(vals)]
    p = _write_events(tmp_path, rows)
    out = (
        value_histogram(p, lo=0.0, hi=200.0, n_bins=20)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert out.loc[0, "n"] == 3       # -5 (clamped), 0.0, 9.99
    assert out.loc[1, "n"] == 1       # 10.0
    assert out.loc[19, "n"] == 3      # 199.9, 200.0 (clamped), 1e6 (clamped)
    assert out.loc[19, "bin_lo"] == 190.0


def test_sliding_window_agg_membership(ray_session, tmp_path):
    """An event belongs to exactly window/slide epoch-aligned windows;
    counts/extrema aggregate across the hop; bad window/slide rejected."""
    import datetime as dt

    from atra_ray.stages.events import sliding_window_agg

    b = dt.datetime(2026, 1, 1, 10, 7)   # inside bucket 10:00
    rows = [
        (1, 1, b, "a", 5.0),
        (2, 1, b + dt.timedelta(minutes=10), "a", 9.0),  # bucket 10:15
    ]
    p = _write_events(tmp_path, rows)
    out = (
        sliding_window_agg(p, window_minutes=60, slide_minutes=15)
        .to_pandas()
        .set_index("window_start")
        .sort_index()
    )
    # event 1 -> windows starting 09:15..10:00; event 2 -> 09:30..10:15
    h = lambda hh, mm: dt.datetime(2026, 1, 1, hh, mm)
    assert set(out.index) == {
        h(9, 15), h(9, 30), h(9, 45), h(10, 0), h(10, 15),
    }
    assert out.loc[h(9, 15), "n"] == 1 and out.loc[h(9, 15), "max_value"] == 5.0
    assert out.loc[h(9, 30), "n"] == 2
    assert out.loc[h(9, 30), "min_value"] == 5.0
    assert out.loc[h(9, 30), "max_value"] == 9.0
    assert out.loc[h(10, 15), "n"] == 1 and out.loc[h(10, 15), "min_value"] == 9.0
    with pytest.raises(ValueError):
        sliding_window_agg(p, window_minutes=50, slide_minutes=15)


def test_revenue_by_nation_exact_cents(ray_session, tmp_path):
    """Two-hop co-partitioned join rolls lineitem revenue to nations with
    exact integer-cents math; customers without orders and orders without
    lineitems drop out (inner-join semantics)."""
    from atra_ray.stages.relational import revenue_by_nation

    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 100, 200, 300], pa.int64()),
        "l_extendedprice": pa.array([10.004, 20.006, 5.0, 7.77], pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.1, 0.0], pa.float64()),
    }), tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 200, 300, 400], pa.int64()),  # 400: no items
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),  # 3: no orders
        "c_nationkey": pa.array([7, 8, 9], pa.int32()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([7, 8, 9], pa.int32()),
        "n_name": pa.array(["FR", "DE", "JP"], pa.string()),
    }), tmp_path / "nation.parquet")
    out = (
        revenue_by_nation(str(tmp_path), num_partitions=3)
        .to_pandas()
        .set_index("n_name")
        .sort_index()
    )
    import math
    cents = lambda p, d: math.floor(p * (1 - d) * 100 + 0.5)
    # FR: order 100 (1000 + 1000) + order 200 (450) ; DE: order 300 (777)
    assert out.loc["FR", "revenue_cents"] == cents(10.004, 0) + cents(20.006, 0.5) + cents(5.0, 0.1)
    assert out.loc["FR", "n_items"] == 3
    assert out.loc["DE", "revenue_cents"] == cents(7.77, 0) and out.loc["DE", "n_items"] == 1
    assert "JP" not in out.index


def test_brand_region_revenue_exact_cents(ray_session, tmp_path):
    """Two co-partitioned hops (partkey, suppkey) roll lineitem revenue to
    (supplier region, part brand); nations sharing a region collapse, and
    lines whose part or supplier is missing drop out (inner joins)."""
    from atra_ray.stages.relational import brand_region_revenue

    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([10, 11, 10, 99, 11], pa.int64()),  # 99: no supplier
        "l_extendedprice": pa.array([10.004, 20.006, 5.0, 4.0, 7.77], pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.1, 0.0, 0.0], pa.float64()),
    }), tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 4], pa.int64()),  # part 3 missing, 4 unsold
        "p_brand": pa.array(["B1", "B2", "B9"], pa.string()),
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11], pa.int64()),
        "s_nationkey": pa.array([7, 8], pa.int32()),
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([7, 8], pa.int32()),
        "n_name": pa.array(["FR", "DE"], pa.string()),
        "n_regionkey": pa.array([1, 1], pa.int32()),  # same region
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([1], pa.int32()),
        "r_name": pa.array(["EUROPE"], pa.string()),
    }), tmp_path / "region.parquet")
    out = (
        brand_region_revenue(str(tmp_path), num_partitions=3)
        .to_pandas()
        .set_index(["r_name", "p_brand"])
        .sort_index()
    )
    import math
    cents = lambda p, d: math.floor(p * (1 - d) * 100 + 0.5)
    # B1: supp 10 (FR) + supp 11 (DE) -> one EUROPE row (regions collapse)
    assert out.loc[("EUROPE", "B1"), "revenue_cents"] == cents(10.004, 0) + cents(20.006, 0.5)
    assert out.loc[("EUROPE", "B1"), "n_items"] == 2
    # B2: only the supp-10 line survives (supp 99 has no supplier row)
    assert out.loc[("EUROPE", "B2"), "revenue_cents"] == cents(5.0, 0.1)
    assert out.loc[("EUROPE", "B2"), "n_items"] == 1
    # part 3 (no part row) and B9 (unsold) never appear
    assert len(out) == 2


def test_brand_region_revenue_random_conformance(ray_session, tmp_path):
    """Seeded randomized conformance vs DuckDB: skewed fact table (one hot
    part, one hot supplier), dangling foreign keys on both dimensions, and
    a nation->region collapse — the exact-cents rollup must hash-match the
    SQL recomputation row for row."""
    import duckdb

    from atra_ray.stages.relational import brand_region_revenue

    rng = np.random.RandomState(11)
    n = 3000
    # skew: part 1 takes ~40% of lines, supplier 10 ~30%; keys 90+/990+
    # dangle (no dimension row)
    partk = np.where(rng.rand(n) < 0.4, 1, rng.randint(1, 100, n))
    suppk = np.where(rng.rand(n) < 0.3, 10, rng.randint(10, 1000, n))
    li = pa.table({
        "l_partkey": pa.array(partk, pa.int64()),
        "l_suppkey": pa.array(suppk, pa.int64()),
        "l_extendedprice": pa.array(
            np.round(rng.rand(n) * 1000, 3), pa.float64()
        ),
        "l_discount": pa.array(
            np.round(rng.randint(0, 11, n) / 100.0, 2), pa.float64()
        ),
    })
    part = pa.table({
        "p_partkey": pa.array(np.arange(1, 90), pa.int64()),
        "p_brand": pa.array([f"B{k % 7}" for k in range(1, 90)], pa.string()),
    })
    supp = pa.table({
        "s_suppkey": pa.array(np.arange(10, 990), pa.int64()),
        "s_nationkey": pa.array((np.arange(10, 990) % 25).astype("int32"), pa.int32()),
    })
    # nations 23/24 are MISSING: suppliers with those nationkeys dangle
    # at the nation hop and must drop (inner-join semantics), not raise
    nat = pa.table({
        "n_nationkey": pa.array(np.arange(23, dtype="int32"), pa.int32()),
        "n_name": pa.array([f"N{k}" for k in range(23)], pa.string()),
        "n_regionkey": pa.array((np.arange(23) % 5).astype("int32"), pa.int32()),
    })
    reg = pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype="int32"), pa.int32()),
        "r_name": pa.array([f"R{k}" for k in range(5)], pa.string()),
    })
    for name, t in [("lineitem", li), ("part", part), ("supplier", supp),
                    ("nation", nat), ("region", reg)]:
        pq.write_table(t, tmp_path / f"{name}.parquet")

    got = (
        brand_region_revenue(str(tmp_path), num_partitions=7)
        .to_pandas()
        .sort_values(["r_name", "p_brand"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        SELECT r_name, p_brand,
               SUM(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT)::BIGINT
                   AS revenue_cents,
               count(*)::BIGINT AS n_items
        FROM read_parquet('{tmp_path}/lineitem.parquet') li
        JOIN read_parquet('{tmp_path}/part.parquet') p ON p_partkey = l_partkey
        JOIN read_parquet('{tmp_path}/supplier.parquet') s ON s_suppkey = l_suppkey
        JOIN read_parquet('{tmp_path}/nation.parquet') n ON n_nationkey = s_nationkey
        JOIN read_parquet('{tmp_path}/region.parquet') r ON r_regionkey = n_regionkey
        GROUP BY r_name, p_brand
        ORDER BY r_name, p_brand
    """).df().reset_index(drop=True)
    assert got["revenue_cents"].tolist() == want["revenue_cents"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()
    assert got["r_name"].tolist() == want["r_name"].tolist()
    assert got["p_brand"].tolist() == want["p_brand"].tolist()


def test_temporal_ops_match_naive_reference_on_random_events(ray_session, tmp_path):
    """Randomized conformance: 600 events across 12 users with FORCED
    ts collisions (coarse time grid) — asof / interval / rolling results
    must equal brute-force per-user Python references."""
    import datetime as dt

    from atra_ray.stages.events import (
        asof_join_events,
        interval_join_count,
        rolling_user_agg,
    )

    rng = np.random.RandomState(42)
    n = 600
    base = dt.datetime(2026, 3, 1)
    rows = []
    for eid in range(n):
        u = int(rng.randint(0, 12))
        ts = base + dt.timedelta(minutes=int(rng.randint(0, 120)))  # ties likely
        et = ["purchase", "click", "view"][int(rng.randint(0, 3))]
        rows.append((eid, u, ts, et, float(rng.randint(0, 1000)) / 10))
    p = _write_events(tmp_path, rows)

    by_user: dict = {}
    for eid, u, ts, et, v in rows:
        by_user.setdefault(u, []).append((eid, ts, et, v))

    # --- asof: prior-or-equal click per purchase, right-before-left at
    # equal ts, max event_id among same-instant clicks
    out = asof_join_events(p, num_partitions=5).to_pandas().set_index("event_id")
    for u, evs in by_user.items():
        clicks = sorted(
            [(ts, eid, v) for eid, ts, et, v in evs if et == "click"]
        )
        for eid, ts, et, v in evs:
            if et != "purchase":
                continue
            cand = [(cts, ceid, cv) for cts, ceid, cv in clicks if cts <= ts]
            row = out.loc[eid]
            if not cand:
                assert pd.isna(row["prior_value"]), eid
            else:
                want = max(cand)  # latest ts, then max event_id
                assert row["prior_value"] == want[2], eid
                assert row["prior_ts"] == want[0], eid

    # --- interval: clicks in [ts, ts+10min] inclusive per view
    ic = interval_join_count(p, num_partitions=5).to_pandas().set_index("event_id")
    H = dt.timedelta(minutes=10)
    for u, evs in by_user.items():
        clicks = [ts for eid, ts, et, v in evs if et == "click"]
        for eid, ts, et, v in evs:
            if et != "view":
                continue
            want = sum(1 for c in clicks if ts <= c <= ts + H)
            assert ic.loc[eid, "n_followups"] == want, eid

    # --- rolling: last-5 max / occupancy ordered (ts, event_id)
    ro = rolling_user_agg(p, window=5, num_partitions=5).to_pandas().set_index("event_id")
    for u, evs in by_user.items():
        ordered = sorted(evs, key=lambda e: (e[1], e[0]))
        for i, (eid, ts, et, v) in enumerate(ordered):
            win = [x[3] for x in ordered[max(0, i - 4) : i + 1]]
            assert ro.loc[eid, "rolling_max"] == max(win), eid
            assert ro.loc[eid, "n_in_window"] == len(win), eid
