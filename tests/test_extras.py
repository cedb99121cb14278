"""M14 XML extraction, M18 GDBR stage, S7 dump."""

import pytest

from atra_ray.functions.extract_xml import extract_xml_links


def test_xml_links_wellformed():
    xml = """<?xml version="1.0"?>
    <rss><channel>
      <link>https://a.example/feed</link>
      <item><link>https://a.example/item1</link>
        <enclosure src="https://a.example/audio.mp3"/></item>
    </channel></rss>"""
    got = extract_xml_links(xml)
    assert "https://a.example/feed" in got
    assert "https://a.example/item1" in got
    assert "https://a.example/audio.mp3" in got


def test_xml_links_svg_and_broken():
    svg = '<svg xmlns:xlink="http://www.w3.org/1999/xlink"><a xlink:href="https://s.example/x">x</a></svg>'
    assert "https://s.example/x" in extract_xml_links(svg)
    broken = '<root><a href="https://b.example/y">'  # unclosed
    assert "https://b.example/y" in extract_xml_links(broken)


def test_xml_format_routed_through_extractor():
    from atra_ray.config import ExtractionConfig
    from atra_ray.functions.urlkit import Depth
    from atra_ray.stages.extract import extract_one

    body = b'<?xml version="1.0"?><urlset><url><loc>https://a.example/p1</loc></url></urlset>'
    fmt, enc, err, text, lang, links = extract_one(
        "https://a.example/sitemap.xml", body, Depth(), ExtractionConfig()
    )
    assert fmt == "xml"
    assert any(t == "https://a.example/p1" for t, *_ in links)


def test_gdbr_removes_banner_segment():
    from atra_ray.stages.gdbr import GdbrStage

    st = GdbrStage(threshold=0.5)
    text = "real content about crawling engines\n\nwe use cookies accept consent gdpr tracking"
    cleaned, score = st.clean_one(text, "eng")
    assert "cookies" not in cleaned
    assert "real content" in cleaned
    assert score >= 0.5
    # benign text untouched
    same, s2 = st.clean_one("nothing suspicious here\n\njust words", "eng")
    assert "nothing suspicious" in same and s2 < 0.5


@pytest.mark.usefixtures("ray_session")
def test_gdbr_stage_over_dataset():
    import pyarrow as pa
    import ray.data as rd
    from atra_ray.stages.gdbr import gdbr_clean

    t = pa.table(
        {
            "text": ["body text\n\ncookies consent accept gdpr", "plain body"],
            "lang": ["eng", "eng"],
        }
    )
    out = gdbr_clean(rd.from_arrow(t), concurrency=2).to_pandas()
    assert "cookies" not in out["text"][0]
    assert out["text"][1] == "plain body"
    assert "gdbr_score" in out.columns


@pytest.mark.usefixtures("ray_session")
def test_dump_crawl_jsonl(fixtures_small, tmp_path):
    import json
    from pathlib import Path

    from atra_ray.config import BudgetSetting, CrawlConfig
    from atra_ray.pipelines.crawl import run_crawl
    from atra_ray.pipelines.dump import dump_crawl

    out = str(tmp_path / "crawl")
    seeds = (fixtures_small / "seeds.txt").read_text().split()[:2]
    run_crawl(
        str(fixtures_small / "pages.parquet"),
        str(fixtures_small / "robots.parquet"),
        seeds,
        CrawlConfig(budget=BudgetSetting(kind="absolute", depth=2)),
        out,
    )
    n = dump_crawl(out, str(tmp_path / "dump"))
    lines = []
    for f in Path(tmp_path / "dump").glob("*.json"):
        lines += [json.loads(line) for line in f.read_text().splitlines()]
    assert len(lines) == n > 0
    assert {"url", "status", "wave"} <= set(lines[0].keys())


def test_zip_recursive_extraction():
    """M15: links from HTML/text members of a (nested) zip, re-running the
    extractor chain per member against the archive's url."""
    import io
    import zipfile

    from atra_ray.config import ExtractionConfig
    from atra_ray.functions.urlkit import Depth
    from atra_ray.stages.extract import extract_one

    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as z:
        z.writestr("deep.html", '<html><body><a href="https://z.example/deep">d</a></body></html>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("page.html", '<html><body><a href="/rel">r</a></body></html>')
        z.writestr("notes.txt", "see https://t.example/plain for details")
        z.writestr("nested.zip", inner.getvalue())
    fmt, enc, err, text, lang, links = extract_one(
        "https://a.example/bundle.zip", buf.getvalue(), Depth(), ExtractionConfig()
    )
    assert fmt == "zip" and text is None
    targets = {t for t, *_ in links}
    assert "https://a.example/rel" in targets          # html member, resolved vs archive url
    assert "https://t.example/plain" in targets        # text member
    assert "https://z.example/deep" in targets         # nested zip member
    # depth cap: 0 allowed levels -> no links
    _, _, _, _, _, none_links = extract_one(
        "https://a.example/bundle.zip", buf.getvalue(), Depth(),
        ExtractionConfig(max_extraction_depth=0),
    )
    assert none_links == []
