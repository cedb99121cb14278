"""Extraction kernel vs the fixture oracle — byte-identical text, exact link
sets, language id (FIXTURES.md §6, north-rule per-row invariant). Pure
Python (no Ray): the same kernel the Dataset pipeline runs per batch."""

import collections

import pyarrow.parquet as pq
import pytest

from atra_ray.config import ExtractionConfig
from atra_ray.functions.extract_html import extract_html
from atra_ray.functions.extract_js import extract_js_links
from atra_ray.functions.urlkit import Depth
from atra_ray.stages.extract import extract_one


def _oracle_links(fx_dir):
    lo = pq.read_table(fx_dir / "links_oracle.parquet")
    out = collections.defaultdict(set)
    for u, t, o, k in zip(
        *[lo.column(c).to_pylist() for c in ["url", "target", "origin", "kind"]]
    ):
        out[u].add((t, o, k))
    return out


def test_corpus_text_byte_identical(fixtures_small):
    pages = pq.read_table(fixtures_small / "pages.parquet")
    cfg = ExtractionConfig()
    for i in range(pages.num_rows):
        url = pages["url"][i].as_py()
        _, _, _, text, _, _ = extract_one(url, pages["html"][i].as_py(), Depth(), cfg)
        oracle = pages["text"][i].as_py()
        if oracle is None:
            # M14 binary-document pages: links only, no text
            assert text is None, url
            continue
        assert text is not None, url
        assert text.encode("utf-8") == oracle.encode("utf-8"), url


def test_corpus_links_exact(fixtures_small):
    pages = pq.read_table(fixtures_small / "pages.parquet")
    oracle = _oracle_links(fixtures_small)
    cfg = ExtractionConfig()
    for i in range(pages.num_rows):
        url = pages["url"][i].as_py()
        _, _, _, _, _, links = extract_one(url, pages["html"][i].as_py(), Depth(), cfg)
        got = {(t, o, k) for t, o, k, _, _, _ in links}
        assert got == oracle.get(url, set()), url


def test_corpus_language(fixtures_small):
    pages = pq.read_table(fixtures_small / "pages.parquet")
    cfg = ExtractionConfig()
    for i in range(pages.num_rows):
        url = pages["url"][i].as_py()
        _, _, _, _, lang, _ = extract_one(url, pages["html"][i].as_py(), Depth(), cfg)
        assert lang == pages["lang"][i].as_py(), url


# ---- targeted unit tests mirroring the reference's fixtures ---------------

_CFG = ExtractionConfig()


def test_nofollow_meta_drops_all_links():
    html = '<html><head><meta name="robots" content="nofollow"></head><body><a href="/x">x</a></body></html>'
    assert extract_html(html, _CFG).links == set()


def test_nofollow_rel_drops_anchor():
    html = '<html><body><a rel="nofollow" href="/x">x</a><a href="/y">y</a></body></html>'
    assert extract_html(html, _CFG).links == {("href", "/y")}


def test_nofollow_disabled_keeps_links():
    cfg = ExtractionConfig(respect_nofollow=False)
    html = '<html><head><meta name="robots" content="nofollow"></head><body><a rel="nofollow" href="/x">x</a></body></html>'
    assert extract_html(html, cfg).links == {("href", "/x")}


def test_embedded_gated_by_config():
    html = '<html><body><img src="/i.png"><iframe src="/f"></iframe></body></html>'
    assert extract_html(html, _CFG).links == set()
    cfg = ExtractionConfig(crawl_embedded_data=True)
    assert extract_html(html, cfg).links == {("embedded", "/i.png"), ("embedded", "/f")}


def test_script_src_and_inline():
    html = "<html><body><script src=\"/app.js\"></script><script>a.href = '/inline';</script></body></html>"
    assert extract_html(html, _CFG).links == {
        ("javascript", "/app.js"),
        ("javascript_embedded", "/inline"),
    }


def test_onclick_heuristic():
    # matches the reference's own test html (extraction/html.rs:262-270)
    html = "<html><body><button onclick=\"javascript:location.href = '  http://www.google.com/'\"></button></body></html>"
    assert extract_html(html, _CFG).links == {("onclick", "http://www.google.com/")}


def test_base_href_reported():
    html = '<html><head><base href="https://cdn.example/"></head><body><a href="x">x</a></body></html>'
    ex = extract_html(html, _CFG)
    assert ex.base_href == "https://cdn.example/"
    assert ("href", "x") in ex.links


def test_script_text_not_in_page_text():
    html = "<html><body><p>visible</p><script>var hidden = 1;</script><style>.x{}</style></body></html>"
    ex = extract_html(html, _CFG)
    assert ex.text == "visible"


def test_js_automaton():
    # mirrors atra/src/extraction/js.rs test: href ident arms, string captures,
    # semicolon disarms
    script = "var e = x; e.href = 'https://a11ywatch.com'; var s = 'not-a-link';"
    assert extract_js_links(script) == {"https://a11ywatch.com"}
    assert extract_js_links("href\n= \"/two\"") == {"/two"}
    assert extract_js_links("notahref = 'x'; var y = 'z'") == set()
