"""End-to-end Ray Data slice (SURVEY.md §7.1): read_parquet → map_batches
extraction → compare against oracle columns / write_parquet round trip."""

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from atra_ray.pipelines.slice import exploded_links, extract_pages


@pytest.mark.usefixtures("ray_session")
def test_slice_text_byte_identical(fixtures_small):
    ds = extract_pages(str(fixtures_small / "pages.parquet"))
    got = ds.select_columns(["url", "text"]).to_pandas().set_index("url")["text"]
    oracle = (
        pq.read_table(fixtures_small / "pages.parquet", columns=["url", "text"])
        .to_pandas()
        .set_index("url")["text"]
    )
    assert len(got) == len(oracle)
    for url, text in oracle.items():
        assert got[url] == text, url


@pytest.mark.usefixtures("ray_session")
def test_slice_links_exact(fixtures_small):
    links = exploded_links(extract_pages(str(fixtures_small / "pages.parquet")))
    got = {
        (r["url"], r["target"], r["origin"], r["kind"])
        for r in links.to_pandas().to_dict("records")
    }
    lo = pq.read_table(fixtures_small / "links_oracle.parquet")
    oracle = set(
        zip(*[lo.column(c).to_pylist() for c in ["url", "target", "origin", "kind"]])
    )
    assert got == oracle


@pytest.mark.usefixtures("ray_session")
def test_langid_matches_fixture_truth(fixtures_small):
    """Detected language equals the generator's truth label on EVERY page of
    the de-correlated corpus (M17 accuracy oracle: fixture prose is composed
    from a vocabulary independent of the detector's trigram profiles, and
    includes nld/swe/pol adversaries). The driver checks the same equality as
    the detect_language_pages hash-MATCH; this is the in-repo equivalent.

    Note the driver's documents.parquet carries NO such truth: its `lang`
    column is uncorrelated with the text (all rows share one English-ish
    vocabulary), which is why doc_language stays a rows-only query."""
    df = (
        extract_pages(str(fixtures_small / "pages.parquet"))
        .select_columns(["url", "lang"])
        .to_pandas()
    )
    got = dict(zip(df["url"], df["lang"]))
    truth = pq.read_table(fixtures_small / "pages.parquet", columns=["url", "lang"])
    truth_map = dict(zip(truth["url"].to_pylist(), truth["lang"].to_pylist()))
    assert len(got) == len(truth_map)
    wrong = {u: (got[u], t) for u, t in truth_map.items() if got[u] != t}
    assert not wrong, f"{len(wrong)} misdetected: {dict(list(wrong.items())[:5])}"
    # the corpus genuinely exercises the adversarial languages
    assert {"nld", "swe", "pol"} <= set(truth_map.values())


@pytest.mark.usefixtures("ray_session")
def test_slice_write_parquet_roundtrip(fixtures_small, tmp_path):
    out = tmp_path / "extracted"
    ds = extract_pages(str(fixtures_small / "pages.parquet"))
    ds.write_parquet(str(out))
    back = pq.read_table(str(out))
    n_pages = pq.read_table(fixtures_small / "pages.parquet", columns=["url"]).num_rows
    assert back.num_rows == n_pages
    # nested links survive the round trip
    assert pc.sum(pc.list_value_length(back["links"])).as_py() > 0


@pytest.mark.usefixtures("ray_session")
def test_fused_extract_equals_generic(fixtures_small):
    """extract_pages_fused (per-shard in-task read, the scaling-bench path)
    produces exactly the rows of the generic read_parquet path."""
    from atra_ray.pipelines.slice import extract_pages, extract_pages_fused

    shards = sorted(str(p) for p in (fixtures_small / "pages.parquet").glob("*.parquet"))
    a = (
        extract_pages_fused(shards)
        .select_columns(["url", "format", "encoding", "text", "lang"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        extract_pages(str(fixtures_small / "pages.parquet"))
        .select_columns(["url", "format", "encoding", "text", "lang"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) == 241
