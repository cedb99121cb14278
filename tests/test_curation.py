"""Curation operators: PII scrub, n-gram decontamination, stratified
sampling, and the sortless hash_reduce_small exchange they ride on."""

import hashlib

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
