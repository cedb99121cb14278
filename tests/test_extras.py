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


def test_gdbr_removes_banner_subtree():
    from atra_ray.functions.gdbr_model import load_weights
    from atra_ray.stages.gdbr import clean_html_dom

    w = load_weights()["eng"]
    html = (
        "<html><head><title>my page title words</title></head><body>"
        "<h1>my page title words</h1>"
        '<div class="cookie-banner"><p>we use cookies to improve your experience on our site</p>'
        "<p>by clicking accept you agree to our use of cookies</p></div>"
        "<p>real content about crawling engines and data processing systems</p>"
        "<p>the index stores every page and the search returns each result</p>"
        "<p>more words about links text tables and images on the website</p>"
        "</body></html>"
    )
    clean, score = clean_html_dom(html, w)
    assert score >= 0.5
    assert "cookies" not in clean
    assert "real content about crawling" in clean
    assert "my page title words" in clean
    # benign page untouched, and text contract matches extract_html
    benign = "<html><body><p>real content about crawling engines</p></body></html>"
    clean2, s2 = clean_html_dom(benign, w)
    assert s2 < 0.5 and clean2 == "real content about crawling engines"


def test_gdbr_dom_text_contract_matches_extract_html(fixtures_small):
    """With no removal, the DOM builder's flattened text must be
    byte-identical to extract_html's text for every fixture page."""
    import pyarrow.parquet as pq

    from atra_ray.config import ExtractionConfig
    from atra_ray.functions.decoding import decode_bytes
    from atra_ray.functions.extract_html import extract_html
    from atra_ray.functions.formats import detect_format
    from atra_ray.stages.gdbr import _DomParser

    t = pq.read_table(str(fixtures_small / "pages.parquet"))
    cfg = ExtractionConfig()
    n = 0
    for url, body in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        if detect_format(url, body) != "html":
            continue
        decoded, _, _ = decode_bytes(bytes(body), True)
        p = _DomParser()
        p.feed(decoded)
        p.close()
        dom_text = "\n".join(c[0] for c in p.order)
        assert dom_text == extract_html(decoded, cfg).text, url
        n += 1
    assert n > 50


@pytest.mark.usefixtures("ray_session")
def test_gdbr_stage_over_dataset(fixtures_small):
    import pyarrow.parquet as pq
    import ray.data as rd

    from atra_ray.stages.gdbr import gdbr_clean

    ds = rd.read_parquet(
        str(fixtures_small / "pages.parquet"), columns=["url", "html"]
    )
    out = gdbr_clean(ds, concurrency=2).to_pandas().set_index("url")
    oracle = pq.read_table(str(fixtures_small / "gdbr_oracle.parquet")).to_pandas().set_index("url")
    joined = out.join(oracle)
    eq = (joined["text"] == joined["clean_text"]) | (
        joined["text"].isna() & joined["clean_text"].isna()
    )
    assert eq.all()
    assert (joined["gdbr_score"] >= 0.5).sum() > 0  # some banners removed


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


def test_pxm_codec_roundtrip_and_resize():
    import numpy as np

    from atra_ray.stages.multimodal import decode_pxm, encode_pxm, resize_nearest

    img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3)
    w, h, back = decode_pxm(encode_pxm(img))
    assert (w, h) == (30, 20)
    assert (back == img).all()
    small = resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_pxm(b"JUNKJUNKJUNK")


def test_audio_pam_rms_frames():
    import numpy as np

    from atra_ray.stages.multimodal import DecodeAudioStage, encode_pam
    import pyarrow as pa

    samples = (np.sin(np.linspace(0, 60, 4096)) * 1000).astype(np.int16)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "data": pa.array([encode_pam(8000, samples)], pa.binary()),
        }
    )
    out = DecodeAudioStage(window=1024)(t)
    row = out.to_pylist()[0]
    assert abs(row["duration_s"] - 4096 / 8000) < 1e-9
    assert len(row["rms_frames"]) == 4
    assert all(f > 0 for f in row["rms_frames"])


@pytest.mark.usefixtures("ray_session")
def test_media_decode_pipeline(tmp_path):
    """Actor-pool decode over the synthetic media table: header-parsed
    dimensions must equal the generator arithmetic; corrupt rows surface
    as ok=False, never a poisoned batch."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from atra_ray.sources.media import generate_media, media_dims
    from atra_ray.stages.multimodal import DecodeImageStage, media_decode

    path = generate_media(str(tmp_path / "media"), list(range(40)))
    out = media_decode(path).to_pandas().set_index("media_id")
    for i in range(40):
        assert (out.loc[i, "width"], out.loc[i, "height"]) == media_dims(i)

    corrupt = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "mime": pa.array(["image/x-pxm"] * 2),
            "data": pa.array([b"PXM1\x00\x00", None], pa.binary()),
        }
    )
    p2 = tmp_path / "bad.parquet"
    pq.write_table(corrupt, p2)
    bad = (
        rd.read_parquet(str(p2))
        .map_batches(
            DecodeImageStage,
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert (~bad["ok"]).all()


def test_exif_kernel_ifd_walk():
    """EXIF links come from a real IFD walk (byte-order aware, EXIF
    sub-IFD), not a raw byte scan."""
    import struct

    from atra_ray.functions.extract_docs import extract_exif_links

    # big-endian TIFF with one ASCII ImageDescription
    desc = b"visit https://a.example/x now\x00"
    ifd = (
        struct.pack(">H", 1)
        + struct.pack(">HHI", 0x010E, 2, len(desc))
        + struct.pack(">I", 26)
        + struct.pack(">I", 0)
    )
    tiff = b"MM\x00*" + struct.pack(">I", 8) + ifd + desc
    assert extract_exif_links(tiff) == ["https://a.example/x"]
    # corrupt bodies never raise
    assert extract_exif_links(b"\xff\xd8\xff\xe1\x00\x04Ex") == []
    assert extract_exif_links(b"II*\x00\xff\xff\xff\xff") == []
