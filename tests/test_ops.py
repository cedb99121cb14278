"""Training-data-pipeline operators: dedup (exact/minhash/simhash),
similarity search, text analysis — small-table semantics + DuckDB parity
for SQL-mirrored kernels."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from atra_ray.stages.dedup import (
    jaccard,
    minhash_signatures,
    simhash64,
)
from atra_ray.stages.text_analysis import fingerprint_text


@pytest.fixture(scope="module")
def docs_parquet(tmp_path_factory):
    p = tmp_path_factory.mktemp("docs") / "documents.parquet"
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",      # exact dup of 0
        "the quick brown fox jumps over the lazy cat",      # near dup of 0
        "completely different content about ray data engines",
        "another unrelated document with words and text inside",
        "The  Quick   Brown fox jumps over the lazy dog",   # dup of 0 after normalize? (case+ws)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, p)
    return str(p)


def test_fingerprint_normalizes_ws_and_case():
    assert fingerprint_text("A  b\tc") == fingerprint_text("a b c")
    assert fingerprint_text("a b") != fingerprint_text("a c")


def test_fingerprint_matches_duckdb():
    import duckdb

    text = "The  Quick   Brown\tfox\n jumps"
    got = duckdb.sql(
        "SELECT md5(regexp_replace(lower($1), '[ \t\n\r\f]+', ' ', 'g'))",
        params=[text],
    ).fetchone()[0]
    assert got == fingerprint_text(text)


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog and runs away fast"
    b = "the quick brown fox jumps over the lazy cat and runs away fast"
    c = "totally different words appear in this entirely other sentence here"
    sigs = minhash_signatures([a, b, c], num_perm=256)
    est_ab = (sigs[0] == sigs[1]).mean()
    est_ac = (sigs[0] == sigs[2]).mean()
    true_ab = jaccard(a, b)
    assert abs(est_ab - true_ab) < 0.15
    assert est_ac < 0.1
    # identical text -> identical signature
    sigs2 = minhash_signatures([a, a], num_perm=64)
    assert (sigs2[0] == sigs2[1]).all()


def test_sketch_hashes_match_duckdb():
    """The minhash/simhash SQL oracles recompute signatures in DuckDB; that
    only works while the python token hash equals md5_number_lower and the
    minhash permutation arithmetic is exact. Pin both equivalences."""
    import duckdb

    from atra_ray.stages.dedup import _perm_params, _shingle_hashes, _token_hashes

    con = duckdb.connect()
    toks = ["hello", "quick", "a", "1919", "brown-fox"]
    py = _token_hashes(toks)
    for t, h in zip(toks, py):
        assert con.execute("SELECT md5_number_lower(?)", [t]).fetchone()[0] == int(h)

    # rolling shingle combine mod 2^64 matches the UHUGEINT SQL expression
    text = "the quick brown fox jumps"
    th = [int(x) for x in _token_hashes(text.split())]
    expect = []
    for i in range(len(th) - 2):
        acc = th[i]
        for k in (1, 2):
            acc = (acc * 1099511628211 + th[i + k]) % (1 << 64)
        expect.append(acc)
    assert [int(x) for x in _shingle_hashes(text)] == expect

    # permutation arithmetic is exact (no uint64 wraparound): max product
    # of (s31, a) plus b stays below 2^63
    a, b = _perm_params(128)
    m31 = (1 << 31) - 1
    assert int(a.max()) < m31 and int(b.max()) < m31
    assert (m31 - 1) * (m31 - 1) + (m31 - 1) < (1 << 63)


def test_simhash_properties():
    a = simhash64("the quick brown fox jumps over the lazy dog " * 5)
    b = simhash64("the quick brown fox jumps over the lazy dog " * 5)
    c = simhash64("completely unrelated text with other tokens entirely " * 5)
    assert a == b
    assert bin(a ^ c).count("1") > 10


@pytest.mark.usefixtures("ray_session")
def test_dedup_exact(docs_parquet):
    from atra_ray.stages.dedup import dedup_exact

    kept = sorted(dedup_exact(docs_parquet).to_pandas()["doc_id"].tolist())
    # doc 1 (exact dup) and doc 5 (dup after normalize) collapse into doc 0
    assert kept == [0, 2, 3, 4]


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_finds_near_dups(docs_parquet):
    from atra_ray.stages.dedup import dedup_minhash, minhash_dup_pairs

    pairs = minhash_dup_pairs(docs_parquet, threshold=0.5).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got          # exact dup
    assert (0, 2) in got          # near dup (1 word differs)
    assert not any(3 in p or 4 in p for p in got)
    kept = sorted(dedup_minhash(docs_parquet, threshold=0.5).to_pandas()["doc_id"])
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert 3 in kept and 4 in kept


@pytest.mark.usefixtures("ray_session")
def test_minhash_excludes_shingleless_docs(tmp_path):
    """Empty/whitespace-only docs carry the uint64-max sentinel signature;
    they must never pair with each other (the SQL oracle's len(w) > 0
    excludes them — exact dedup owns empty-vs-empty duplicates)."""
    import pyarrow.parquet as pq
    from atra_ray.stages.dedup import minhash_dup_pairs

    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["", "   ", None, "real prose text here"], pa.string()),
            }
        ),
        p,
    )
    pairs = minhash_dup_pairs(str(p), threshold=0.5).to_pandas()
    assert len(pairs) == 0


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs(docs_parquet):
    from atra_ray.stages.dedup import simhash_dup_pairs

    pairs = simhash_dup_pairs(docs_parquet, max_hamming=3).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got
    assert (0, 5) in got or (1, 5) in got  # normalization-insensitive tokens


@pytest.fixture(scope="module")
def emb_parquet(tmp_path_factory):
    rng = np.random.RandomState(7)
    n, d = 200, 16
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[1] = m[0] + 0.01 * rng.normal(size=d).astype(np.float32)  # near-dup of 0
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row.tolist() for row in m], pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    p = tmp_path_factory.mktemp("emb") / "embeddings.parquet"
    pq.write_table(t, p)
    return str(p), m


@pytest.mark.usefixtures("ray_session")
def test_ann_bruteforce_matches_numpy(emb_parquet):
    from atra_ray.stages.similarity import ann_bruteforce_topk

    path, m = emb_parquet
    got = ann_bruteforce_topk(path, num_queries=5, k=10).to_pandas()
    x = m.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    for q in range(5):
        sims = x @ x[q]
        expect = [
            v for _, v in sorted(((-s, v) for v, s in enumerate(sims) if v != q))
        ][:10]
        mine = got[got["query_id"] == q].sort_values("rank")["vec_id"].tolist()
        assert mine == expect, q
    # vector 1 is a near-copy of 0 -> rank-1 neighbor both ways
    assert got[(got["query_id"] == 0) & (got["rank"] == 1)]["vec_id"].iloc[0] == 1


@pytest.mark.usefixtures("ray_session")
def test_ann_lsh_recall(emb_parquet):
    from atra_ray.stages.similarity import ann_bruteforce_topk, ann_lsh_topk

    path, _ = emb_parquet
    exact = ann_bruteforce_topk(path, num_queries=5, k=5).to_pandas()
    approx = ann_lsh_topk(path, num_queries=5, k=5, num_planes=4).to_pandas()
    # multiprobe LSH with 4 planes on 200 vectors: expect decent recall
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    assert len(e & a) / len(e) >= 0.5


@pytest.mark.usefixtures("ray_session")
def test_doc_quality_counts(docs_parquet):
    from atra_ray.stages.text_analysis import doc_quality

    df = doc_quality(docs_parquet).to_pandas().set_index("doc_id")
    assert df.loc[0, "n_tokens"] == 9
    assert df.loc[0, "n_stopwords"] == 2  # "the" twice (en fallback: no lang col)
    assert df.loc[0, "n_chars"] == len("the quick brown fox jumps over the lazy dog")


@pytest.mark.usefixtures("ray_session")
def test_doc_quality_per_language_stopwords(tmp_path):
    """Stopword counting keys on the row's lang: the same token counts
    differently under different language lists, zh counts plain CJK
    substrings (no \\b — RE2 word boundaries are ASCII-only), and an
    unknown lang falls back to the English list."""
    from atra_ray.stages.text_analysis import doc_quality

    rows = [
        (0, "la casa de la colina", "es"),   # es: la x2, de -> 3
        (1, "la casa de la colina", "fr"),   # fr: la x2, de -> 3 (same words!)
        (2, "la casa de la colina", "en"),   # en: none of these -> 0
        (3, "这是我的书和他的笔", "zh"),        # zh: 这,是,我,的x2,和,他 -> 7
        (4, "the cat and the hat", "xx"),    # unknown -> en list: the x2, and
    ]
    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        p,
    )
    df = doc_quality(str(p)).to_pandas().set_index("doc_id")
    assert df.loc[0, "n_stopwords"] == 3
    assert df.loc[1, "n_stopwords"] == 3
    assert df.loc[2, "n_stopwords"] == 0
    assert df.loc[3, "n_stopwords"] == 7
    assert df.loc[4, "n_stopwords"] == 3


def test_png_roundtrip_all_color_types():
    from atra_ray.functions.png import decode_png, encode_png

    rng = np.random.RandomState(7)
    for c in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(13, 9, c), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px), c


def test_png_all_filter_types_decode():
    """Hand-build a PNG whose scanlines use filters 0-4 (the encoder only
    emits 0) and check against a reference unfiltered image."""
    import struct
    import zlib

    from atra_ray.functions.png import PNG_MAGIC, decode_png, encode_png

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    h, w, c = px.shape
    bpp = c
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int16)
    lines = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
        enc = np.zeros(stride, dtype=np.int16)
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            cc = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else cc)
            enc[x] = (int(cur[x]) - pred) & 0xFF
        lines.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())

    def chunk(ct, body):
        return struct.pack(">I", len(body)) + ct + body + struct.pack(
            ">I", zlib.crc32(ct + body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)
    # palette image: encode indices + PLTE by hand
    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(6, 5), dtype=np.uint8)
    ihdr3 = struct.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, 0)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    data3 = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr3)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data3), pal[idx])
    # defense: valid encoder output round-trips through the header sniff
    from atra_ray.stages.multimodal import DecodeImageStage

    ok, ww, hh, _ = DecodeImageStage()._one(encode_png(px))
    assert (ok, ww, hh) == (True, w, h)


def test_wav_roundtrip_and_garbage():
    from atra_ray.sources.media import _encode_wav
    from atra_ray.stages.multimodal import DecodeAudioStage, decode_wav

    rng = np.random.RandomState(3)
    samples = rng.randint(-30000, 30000, size=4096, dtype=np.int16)
    data = _encode_wav(16000, samples)
    rate, x = decode_wav(data)
    assert rate == 16000
    assert np.allclose(x * 32768.0, samples)
    s = DecodeAudioStage(window=1024)
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "data": pa.array([data, b"not-audio-at-all"], pa.binary()),
        }
    )
    out = s(t).to_pylist()
    assert abs(out[0]["duration_s"] - 4096 / 16000) < 1e-12
    assert len(out[0]["rms_frames"]) == 4
    assert out[1]["duration_s"] == 0.0 and out[1]["rms_frames"] == []


@pytest.mark.usefixtures("ray_session")
def test_multimodal_real_format_pipeline(ray_session, tmp_path):
    """PNG (RGB + gray) and PXM payloads decode through the actor-pool
    stage to identical (w, h, features); garbage rows come back ok=False
    — never an exception."""
    import ray.data as rd

    from atra_ray.functions.png import encode_png
    from atra_ray.stages.multimodal import DecodeImageStage, encode_pxm

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(12, 10, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(8, 8, 1), dtype=np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "mime": pa.array(
                ["image/png", "image/x-pxm", "image/png", "application/junk"],
                pa.string(),
            ),
            "data": pa.array(
                [encode_png(px), encode_pxm(px), encode_png(gray), b"\x00garbage"],
                pa.binary(),
            ),
        }
    )
    p = tmp_path / "media.parquet"
    pq.write_table(t, p)
    out = (
        rd.read_parquet(str(p))
        .map_batches(DecodeImageStage, batch_format="pyarrow",
                     batch_size=2, concurrency=1)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert out.loc[1, "ok"] and out.loc[2, "ok"] and out.loc[3, "ok"]
    assert not out.loc[4, "ok"]
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (10, 12)
    # PNG and PXM carry the SAME pixels -> identical decoded features
    assert np.allclose(list(out.loc[1, "features"]), list(out.loc[2, "features"]))
    assert len(out.loc[3, "features"]) == 5  # grayscale: 5c with c=1


def test_y4m_decode_colorspaces_and_garbage():
    """Real-format Y4M parse: C444/C420/C422/Cmono plane strides, header
    parameters, and corrupt-input behavior."""
    from atra_ray.sources.media import _encode_y4m, _luma_planes, video_params
    from atra_ray.stages.multimodal import FrameSampleStage, decode_y4m

    w, h, fps, n = video_params(6)
    ww, hh, f, luma = decode_y4m(_encode_y4m(6))
    assert (ww, hh, f, len(luma)) == (w, h, float(fps), n)
    assert np.array_equal(luma, _luma_planes(6, w, h, n))
    # hand-built C420 (quarter chroma), C422 (half) and Cmono (none)
    y = np.arange(4 * 6 * 2, dtype=np.uint8).reshape(2, 4, 6)
    for cs, chroma_per_frame in (("C420", 12), ("C422", 24), ("Cmono", 0)):
        data = f"YUV4MPEG2 W6 H4 F30:1 {cs}\n".encode() + b"".join(
            b"FRAME\n" + y[i].tobytes() + b"\x80" * chroma_per_frame
            for i in range(2)
        )
        ww, hh, f, luma = decode_y4m(data)
        assert (ww, hh, f) == (6, 4, 30.0)
        assert np.array_equal(luma, y)
    # default colorspace (no C param) is C420jpeg
    data = b"YUV4MPEG2 W6 H4 F25:1\n" + b"FRAME\n" + y[0].tobytes() + b"\x80" * 12
    assert decode_y4m(data)[3].shape == (1, 4, 6)
    for bad in (
        b"YUV4MPEG2 W6 H4 F25:1\n" + b"FRAME\n" + y[0].tobytes(),  # short chroma
        b"YUV4MPEG2 W6 F25:1\nFRAME\n",  # missing H
        b"YUV4MPEG2 W6 H4 F25:1 C999\nFRAME\n",  # unknown colorspace
        b"YUV4MPEG2 W6 H4 F25:1\nFRAXE\n" + y[0].tobytes() + b"\x80" * 12,
    ):
        with pytest.raises(ValueError):
            decode_y4m(bad)
    # the stage never raises: garbage and None become ok=False rows
    st = FrameSampleStage(stride=2)
    assert st._one(b"\x00junk")[0] is False
    assert st._one(None)[0] is False


@pytest.mark.usefixtures("ray_session")
def test_video_frames_pipeline(tmp_path):
    """Y4M (even ids) and VIDX (odd ids) payloads frame-sample through the
    actor-pool stage; dims/fps/frame counts match the id arithmetic and the
    sampled luma means match a direct recomputation from the generator."""
    from atra_ray.sources.media import _luma_planes, generate_video, video_params
    from atra_ray.stages.multimodal import FrameSampleStage
    import ray.data as rd

    ids = list(range(41))
    path = generate_video(str(tmp_path), ids)
    out = (
        rd.read_parquet(path)
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"stride": 4},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=1,
        )
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert out["ok"].all()
    for i in ids:
        w, h, fps, n = video_params(i)
        row = out.loc[i]
        assert (row["width"], row["height"], row["fps"], row["n_frames"]) == (
            w, h, float(fps), n,
        )
        want = _luma_planes(i, w, h, n)[::4].mean(axis=(1, 2)) / 255.0
        assert np.allclose(list(row["luma_means"]), want)
        assert len(row["luma_means"]) == (n + 3) // 4  # ceil(n / stride)


@pytest.mark.usefixtures("ray_session")
def test_token_counts():
    import pyarrow.parquet as pq_
    from atra_ray.stages.text_analysis import token_counts

    got = token_counts("/root/testdata/sf0.001/documents.parquet").to_pandas()
    src = pq_.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    assert len(got) == len(src)
    row = got.set_index("doc_id").loc[src["doc_id"].iloc[0]]
    text = src["text"].iloc[0]
    assert row["n_ws_tokens"] == len(text.split())
    assert row["n_bpe_tokens"] >= row["n_ws_tokens"]  # punctuation splits off


@pytest.mark.usefixtures("ray_session")
def test_embedding_dup_pairs_matches_bruteforce():
    import numpy as np_
    import pyarrow.parquet as pq_
    from atra_ray.stages.similarity import embedding_dup_pairs

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    got = embedding_dup_pairs(emb, threshold=0.4, method="exact").to_pandas()
    t = pq_.read_table(emb, columns=["vec_id", "embedding"])
    ids = np_.asarray(t.column("vec_id").to_pylist())
    m = np_.asarray(t.column("embedding").to_pylist(), dtype=np_.float64)
    m = m / np_.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    i, j = np_.nonzero(np_.triu(sims >= 0.4, k=1))
    want = {(int(ids[a]), int(ids[b])) for a, b in zip(i, j)}
    assert {(int(a), int(b)) for a, b in zip(got["a"], got["b"])} == want
    assert (got["a"] < got["b"]).all()


@pytest.mark.usefixtures("ray_session")
def test_ann_ivf_recall():
    from atra_ray.stages.similarity import ann_bruteforce_topk, ann_ivf_topk

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    exact = ann_bruteforce_topk(emb, num_queries=5, k=10).to_pandas()
    approx = ann_ivf_topk(emb, num_queries=5, k=10).to_pandas()
    # IVF probes 4/16 centroids: require decent recall, not equality
    e = {(q, v) for q, v in zip(exact["query_id"], exact["vec_id"])}
    a = {(q, v) for q, v in zip(approx["query_id"], approx["vec_id"])}
    assert len(a & e) / len(e) >= 0.5


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_exact_pairs(docs_parquet):
    from atra_ray.stages.dedup import jaccard, ngram_jaccard_dup_pairs

    pairs = ngram_jaccard_dup_pairs(docs_parquet, threshold=0.5).to_pandas()
    got = {(int(a), int(b)): j for a, b, j in zip(pairs["a"], pairs["b"], pairs["jaccard"])}
    assert (0, 1) in got and got[(0, 1)] == 1.0          # exact dup
    assert (0, 2) in got                                  # near dup
    # jaccard column is the EXACT statistic
    import pyarrow.parquet as pq_

    t = pq_.read_table(docs_parquet, columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(t["doc_id"], t["text"]))
    for (a, b), j in got.items():
        assert abs(j - jaccard(texts[a], texts[b])) < 1e-12


def test_partitioned_map_groups_coalesces_duplicates_across_fused_stages(ray_session):
    """Regression: fused pandas map stages hand the upstream fn's frame to
    _tag verbatim (no Arrow round-trip); a gapped index (drop_duplicates /
    boolean filter in the upstream fn) must not misroute partition ids."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from atra_ray.stages.shuffle import partitioned_map_groups

    df = pd.DataFrame(
        {
            "a": np.repeat(np.arange(40, dtype=np.int64), 3),
            "b": np.repeat(np.arange(40, 80, dtype=np.int64), 3),
        }
    )
    ds = rd.from_pandas([df.iloc[i::5].reset_index(drop=True) for i in range(5)])
    # stage 1 leaves a GAPPED index on purpose; stage 2 must still co-locate
    first = partitioned_map_groups(ds, ["a"], lambda d: d[d["b"] % 2 == 0])
    out = partitioned_map_groups(
        first, ["a", "b"], lambda d: d.drop_duplicates(["a", "b"])
    ).to_pandas()
    assert len(out) == 20
    assert not out.duplicated(["a", "b"]).any()


def test_dedup_distributed_matches_duckdb_exact_jaccard(ray_session, tmp_path):
    """ngram_jaccard_dup_pairs (LSH candidates + co-partitioned text join)
    equals the full cross-join exact Jaccard computed by DuckDB."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from atra_ray.stages.dedup import dedup_minhash, ngram_jaccard_dup_pairs

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(60):
        toks = [vocab[j] for j in rng.randint(0, 50, size=30)]
        texts.append(" ".join(toks))
    # create near-dups: copy with small edits
    for i in range(0, 20, 2):
        toks = texts[i].split()
        toks[3] = "xx"
        texts.append(" ".join(toks))
    n = len(texts)
    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts, pa.string())}), p
    )
    got = (
        ngram_jaccard_dup_pairs(str(p), threshold=0.5)
        .to_pandas()[["a", "b"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    sql = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \t\n\r\f\v]+'), x -> x <> '') AS w
      FROM read_parquet('%s')
    ), grams AS (
      SELECT doc_id, list_distinct(
        [array_to_string(w[i : i + least(3, len(w)) - 1], ' ')
         FOR i IN generate_series(1, len(w) - least(3, len(w)) + 1)]) AS g
      FROM toks
    )
    SELECT x.doc_id a, y.doc_id b FROM grams x JOIN grams y ON x.doc_id < y.doc_id
    WHERE len(list_intersect(x.g, y.g))::DOUBLE
          / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)))::DOUBLE >= 0.5
    ORDER BY a, b
    """ % p
    want = duckdb.sql(sql).df().astype("int64")
    assert got.equals(want)
    assert len(want) >= 10  # the synthetic near-dups actually collide

    survivors = dedup_minhash(str(p), threshold=0.5).to_pandas()["doc_id"]
    assert set(survivors) == set(range(n)) - set(want["b"])


def test_embedding_dup_pairs_lsh_matches_bruteforce(ray_session, tmp_path):
    """OR-table LSH bucketing recovers the brute-force pair set on planted
    near-dups (high-recall parametrization for the loose threshold)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from atra_ray.stages.similarity import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    rng = np.random.RandomState(3)
    base = rng.normal(size=(80, 32))
    dups = base[:15] + rng.normal(scale=0.05, size=(15, 32))  # cosine ~0.99
    m = np.vstack([base, dups])
    p = tmp_path / "emb.parquet"
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(m)), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in m]),
            }
        ),
        p,
    )
    exact = embedding_dup_pairs(str(p), threshold=0.9, method="exact").to_pandas()[
        ["a", "b"]
    ]
    lsh = embedding_dup_pairs_lsh(str(p), threshold=0.9).to_pandas()[["a", "b"]]
    se = set(map(tuple, exact.values))
    sl = set(map(tuple, lsh.values))
    assert len(se) >= 15
    assert sl == se  # defaults: miss prob ~1.6e-4/pair at cosine 0.95+
    # the UNSUFFIXED entry point defaults to the LSH route (the scale
    # path), not the O(N²) baseline — and recovers the same pair set here
    default = embedding_dup_pairs(str(p), threshold=0.9).to_pandas()[["a", "b"]]
    assert set(map(tuple, default.values)) == se


def test_store_root_honored(ray_session, tmp_path, monkeypatch):
    """VERDICT r2 item 7: the co-partitioned build-side stores honor a
    non-default root ($ATRA_STORE_ROOT → shared storage on multi-node)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from atra_ray.config import store_root
    from atra_ray.stages.dedup import build_signature_store, dedup_minhash

    root = tmp_path / "shared_store"
    monkeypatch.setenv("ATRA_STORE_ROOT", str(root))
    assert store_root() == str(root)

    docs = tmp_path / "docs.parquet"
    texts = [f"alpha beta gamma delta {i}" for i in range(20)]
    texts += texts[:5]  # 5 exact dups -> near-dup pairs
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        docs,
    )
    sig = build_signature_store(str(docs), num_partitions=4)
    assert sig.startswith(str(root))
    survivors = dedup_minhash(
        str(docs), threshold=0.9, num_partitions=4
    ).to_pandas()
    assert len(survivors) == 20
    # signature + text + drop stores all landed under the custom root
    kinds = {p.name.split("-")[0] for p in root.iterdir()}
    assert "drop" in kinds and len(list(root.iterdir())) >= 3


# ---------------------------------------------------------------------------
# cleaning stage: corpus-level line dedup, repetition signals, Gopher rules
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lined_pages_parquet(tmp_path_factory):
    """Pages-shaped table (url, text) with known cross-doc boilerplate."""
    p = tmp_path_factory.mktemp("lined") / "pages.parquet"
    boiler = "ACCEPT COOKIES TO CONTINUE"
    texts = [
        f"{boiler}\nunique prose line one\nunique prose line two",
        f"{boiler}\ndifferent article text here\n{boiler}",
        f"{boiler}\nrepeated inside\nrepeated inside\ntail line",
        boiler,                      # only boilerplate -> doc vanishes
        "   \nno boilerplate at all\n ",  # ws-only lines survive untouched
        None,                        # null text -> excluded
    ]
    t = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(texts))], pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, p)
    return str(p)


def test_line_dedup_strips_corpus_boilerplate(ray_session, lined_pages_parquet):
    from atra_ray.stages.cleaning import line_dedup_clean

    out = {
        r["url"]: r["text_clean"]
        for r in line_dedup_clean(lined_pages_parquet, max_freq=3).take_all()
    }
    # 5 occurrences of the banner > max_freq=3 -> stripped everywhere
    assert out["u0"] == "unique prose line one\nunique prose line two"
    assert out["u1"] == "different article text here"
    # within-doc repeats below the corpus threshold are kept
    assert out["u2"] == "repeated inside\nrepeated inside\ntail line"
    assert "u3" not in out            # all lines dropped -> doc vanishes
    assert out["u4"] == "   \nno boilerplate at all\n "  # ws lines exempt
    assert "u5" not in out            # null text excluded


def test_line_dedup_tab_only_lines_are_whitespace(ray_session, tmp_path):
    """Tab/CR/FF-only lines classify as whitespace-only (exempt from
    counting and dropping) — the explicit ASCII class both the engine and
    the DuckDB oracle use (plain trim() would diverge on '\\t')."""
    import pyarrow.parquet as pq
    from atra_ray.stages.cleaning import line_dedup_clean

    p = tmp_path / "pages.parquet"
    texts = ["\t\nkeep one", "\t\nkeep two", "\t\nkeep three", "\t"]
    pq.write_table(
        pa.table(
            {
                "url": pa.array([f"u{i}" for i in range(len(texts))], pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        p,
    )
    out = {
        r["url"]: r["text_clean"]
        for r in line_dedup_clean(str(p), max_freq=2).take_all()
    }
    # "\t" appears 4x > max_freq but is whitespace-only -> never dropped
    assert out["u0"] == "\t\nkeep one"
    assert out["u3"] == "\t"


def test_line_dedup_keeps_everything_below_threshold(ray_session, lined_pages_parquet):
    from atra_ray.stages.cleaning import line_dedup_clean

    out = {
        r["url"]: r["text_clean"]
        for r in line_dedup_clean(lined_pages_parquet, max_freq=100).take_all()
    }
    assert out["u0"].startswith("ACCEPT COOKIES")
    assert len(out) == 5              # only the null-text doc is excluded


def test_page_repetition_fractions(ray_session, lined_pages_parquet):
    from atra_ray.stages.cleaning import page_repetition

    rows = {r["url"]: r for r in page_repetition(lined_pages_parquet).take_all()}
    r = rows["u2"]  # lines: boiler, repeated inside x2, tail line
    assert r["n_lines"] == 4 and r["n_distinct_lines"] == 3
    assert r["dup_line_frac"] == pytest.approx(0.25)
    chars_all = len("ACCEPT COOKIES TO CONTINUE") + 2 * len("repeated inside") + len("tail line")
    chars_distinct = chars_all - len("repeated inside")
    assert r["dup_line_char_frac"] == pytest.approx(
        (chars_all - chars_distinct) / chars_all
    )
    assert rows["u0"]["dup_line_frac"] == 0.0
    assert "u5" not in rows           # null text excluded
    # u4 has one non-ws line
    assert rows["u4"]["n_lines"] == 1


def test_gopher_quality_rules(ray_session, tmp_path):
    from atra_ray.stages.cleaning import gopher_quality

    texts = {
        0: " ".join(["word"] * 60),                  # passes all rules
        1: " ".join(["word"] * 10),                  # too few words
        2: " ".join(["ab"] * 60),                    # mean word len 2 < 3
        3: " ".join(["word"] * 48 + ["12", "99"] * 6),  # alpha frac 0.8 exactly
        4: " ".join(["word"] * 12 + ["123"] * 48),   # alpha frac 0.2 < 0.8
        5: " ".join(["extraordinarily"] * 60),       # mean word len 15 > 10
    }
    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        ),
        p,
    )
    rows = {r["doc_id"]: r for r in gopher_quality(str(p)).take_all()}
    assert rows[0]["passes"] and rows[0]["n_words"] == 60
    assert not rows[1]["passes"]
    assert not rows[2]["passes"]
    assert rows[3]["passes"] and rows[3]["frac_alpha_words"] == pytest.approx(0.8)
    assert not rows[4]["passes"]
    assert not rows[5]["passes"]
    # mixed alnum words count as alpha words (contain a letter)
    assert rows[3]["n_words"] == 60


# ---------------------------------------------------------------------------
# packing stage: two-level prefix scan + deterministic hash split
# ---------------------------------------------------------------------------


def test_pack_sequences_prefix_scan(ray_session, tmp_path):
    from atra_ray.stages.packing import pack_sequences

    # token counts 3, 5, 2, 7, 4 -> offsets 0, 3, 8, 10, 17 (doc_id order)
    texts = ["a b c", "a b c d e", "x y", "a b c d e f g", "p q r s"]
    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10, 3, 7, 0, 20], pa.int64()),
                "text": pa.array(
                    [texts[3], texts[1], texts[2], texts[0], texts[4]], pa.string()
                ),
            }
        ),
        p,
    )
    # doc order by id: 0->"a b c"(3), 3->"a b c d e"(5), 7->"x y"(2),
    # 10->7 tokens, 20->4 tokens
    rows = {r["doc_id"]: r for r in pack_sequences(str(p), seq_len=8, num_ranges=3).take_all()}
    assert [rows[i]["token_offset"] for i in (0, 3, 7, 10, 20)] == [0, 3, 8, 10, 17]
    assert [rows[i]["seq_id"] for i in (0, 3, 7, 10, 20)] == [0, 0, 1, 1, 2]
    assert rows[10]["n_tokens"] == 7


def test_pack_sequences_matches_window_cumsum(ray_session, tmp_path):
    """Many ranges/partitions must agree with a single-node window scan."""
    import duckdb

    rng = np.random.default_rng(7)
    n = 400
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 50, n)]
    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(0, 2 * n, 2), pa.int64()),  # gaps
                "text": pa.array(texts, pa.string()),
            }
        ),
        p,
    )
    from atra_ray.stages.packing import pack_sequences

    got = (
        pack_sequences(str(p), seq_len=128, num_ranges=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        r"""
        WITH c AS (SELECT doc_id,
          len(regexp_extract_all(text, '[^ \t\n\r\f]+'))::BIGINT AS n_tokens
          FROM read_parquet('"""
        + str(p)
        + r"""')),
        s AS (SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS token_offset
          FROM c)
        SELECT doc_id, n_tokens, token_offset::BIGINT AS token_offset,
               (token_offset // 128)::BIGINT AS seq_id FROM s ORDER BY doc_id
        """
    ).df()
    # engine emits nullable Int64 (NULL-text docs carry NULL offsets);
    # with no nulls here the values are identical to the oracle's int64
    cols = ["doc_id", "n_tokens", "token_offset", "seq_id"]
    assert got[cols].astype("int64").equals(want[cols].astype("int64"))


def test_doc_split_deterministic_and_disjoint(ray_session, tmp_path):
    import hashlib as _hl

    from atra_ray.stages.packing import doc_split

    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(range(200), pa.int64())}), p
    )
    rows = {r["doc_id"]: r for r in doc_split(str(p), val_pct=10).take_all()}
    assert len(rows) == 200
    for i in (0, 7, 199):
        b = int.from_bytes(_hl.md5(str(i).encode()).digest()[8:], "little") % 100
        assert rows[i]["bucket"] == b
        assert rows[i]["split"] == ("val" if b < 10 else "train")
    splits = {r["split"] for r in rows.values()}
    assert splits == {"train", "val"}


@pytest.mark.usefixtures("ray_session")
def test_connected_components_chain_star_multihop():
    """Min-label propagation must close TRANSITIVE chains (multi-hop
    label travel over several BSP rounds) and leave separate components
    apart."""
    import ray.data as rd
    from atra_ray.stages.dedup import connected_components

    # chain 10-11-12-13-14 (diameter 4 -> several rounds), star 20<-{21,22},
    # separate pair (30,31); 12-13-14 never pair with 10 directly
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (20, 21), (20, 22), (30, 31)]
    pairs = rd.from_items([{"a": a, "b": b} for a, b in edges]).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    out = {
        r["doc_id"]: r["cluster"]
        for r in connected_components(pairs, num_partitions=4).take_all()
    }
    assert out == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


@pytest.mark.usefixtures("ray_session")
def test_connected_components_long_chain_pointer_doubling():
    """A chain far longer than max_iters must still converge: the
    shortcut pass (lab[x] <- lab[lab[x]], pointer doubling) makes
    convergence O(log diameter) rounds — plain one-hop propagation would
    need diameter rounds and trip the 64-round guard."""
    import ray.data as rd

    from atra_ray.stages.dedup import connected_components

    L = 1500  # diameter 1500 >> max_iters=64; log2(1500) ~ 11 rounds
    edges = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(range(0, L), pa.int64()),
                "b": pa.array(range(1, L + 1), pa.int64()),
            }
        )
    )
    out = connected_components(edges, num_partitions=4).to_pandas()
    assert len(out) == L + 1
    assert (out["cluster"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_dup_clusters_transitive(docs_parquet):
    """dup_clusters puts pairwise-linked near-dups into one min-id
    cluster; docs in no pair are omitted."""
    from atra_ray.stages.dedup import dup_clusters

    out = {
        r["doc_id"]: r["cluster"]
        for r in dup_clusters(docs_parquet, threshold=0.5).take_all()
    }
    # docs 0,1,2 are the near-dup family (see docs_parquet fixture)
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert 3 not in out and 4 not in out


def test_truncated_headers_are_data_not_crashes():
    """A truncated PNG IHDR or PAM header must become an ok=False /
    duration-0 row, never a struct.error that poisons the batch
    (code-review r4 findings 1-2)."""
    import struct
    import zlib

    import pyarrow as pa_

    from atra_ray.functions.png import PNG_MAGIC
    from atra_ray.stages.multimodal import DecodeAudioStage, DecodeImageStage

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    bad_png = PNG_MAGIC + chunk(b"IHDR", b"\x00" * 5) + chunk(b"IEND", b"")
    img = DecodeImageStage(resize_to=4)
    assert img._one(bad_png)[0] is False  # not struct.error

    bad_pam = b"PAM1\x00"  # header cut mid-rate
    batch = pa_.table(
        {
            "media_id": pa_.array([1], pa_.int64()),
            "mime": pa_.array(["audio/x-pam"], pa_.string()),
            "data": pa_.array([bad_pam], pa_.binary()),
        }
    )
    out = DecodeAudioStage(window=16)(batch).to_pylist()[0]
    assert out["duration_s"] == 0.0 and out["rms_frames"] == []


def test_jpeg_codec_roundtrip_and_limits():
    """Pure-stdlib baseline JPEG: flat blocks reconstruct exactly,
    gradients within a few levels, noise within quant-table error;
    odd dims crop correctly; non-baseline / truncated streams raise
    ValueError (never struct.error)."""
    from atra_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(3)
    flat = np.full((24, 17, 3), 130, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat)), flat)
    g = np.linspace(0, 255, 32 * 40).reshape(32, 40).astype(np.uint8)
    og = decode_jpeg(encode_jpeg(g))
    assert og.shape == (32, 40, 1)
    assert np.abs(og[:, :, 0].astype(int) - g.astype(int)).max() <= 4
    r = rng.randint(0, 256, (16, 16, 3), np.uint8)
    orr = decode_jpeg(encode_jpeg(r))
    assert orr.shape == r.shape
    assert np.abs(orr.astype(int) - r.astype(int)).mean() < 40  # Q50 noise bound
    odd = rng.randint(0, 256, (9, 13), np.uint8)
    assert decode_jpeg(encode_jpeg(odd)).shape == (9, 13, 1)
    good = encode_jpeg(flat)
    for bad in (
        b"\xff\xd8\xffjunk", good[:40], good[:-20],
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),   # progressive SOF
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00",         # SOF body too short
        b"\xff\xd8\xff\xc4\x00\x03\x00",            # truncated DHT
        # DRI with a nonzero restart interval: rejected, never corrupted
        good.replace(b"\xff\xda", b"\xff\xdd\x00\x04\x00\x08\xff\xda", 1),
    ):
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    # T.81 B.1.1.2 fill bytes before a marker are legal — still decodes
    filled = good.replace(b"\xff\xdb", b"\xff\xff\xdb", 1)
    assert np.array_equal(decode_jpeg(filled), flat)


@pytest.mark.usefixtures("ray_session")
def test_jpeg_through_decode_stage(tmp_path):
    """JPEG payloads flow through the actor-pool image stage: dims from
    SOF0, features close to the source pixels (lossy tolerance), corrupt
    JPEG rows ok=False."""
    import ray.data as rd

    from atra_ray.functions.jpeg import encode_jpeg
    from atra_ray.stages.multimodal import DecodeImageStage

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (20, 14, 3), np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "mime": pa.array(["image/jpeg"] * 2, pa.string()),
            "data": pa.array(
                [encode_jpeg(px), b"\xff\xd8\xff\xe0broken"], pa.binary()
            ),
        }
    )
    p = tmp_path / "m.parquet"
    pq.write_table(t, p)
    out = (
        rd.read_parquet(str(p))
        .map_batches(DecodeImageStage, batch_format="pyarrow",
                     batch_size=2, concurrency=1)
        .to_pandas()
        .set_index("media_id")
    )
    assert out.loc[1, "ok"] and (out.loc[1, "width"], out.loc[1, "height"]) == (14, 20)
    want = px.mean(axis=(0, 1)) / 255.0
    got = np.array(out.loc[1, "features"])[:3]
    assert np.abs(got - want).max() < 0.05  # channel means survive Q50
    assert not out.loc[2, "ok"]


def test_jpeg_roundtrip_size_sweep():
    """Dims survive exactly and reconstruction stays within Q50 bounds
    across block-aligned, odd, tiny and skinny shapes, both channel
    counts."""
    from atra_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(17)
    for h, w, c in [(8, 8, 1), (8, 8, 3), (1, 1, 3), (1, 17, 1), (23, 1, 3),
                    (15, 9, 3), (32, 24, 1), (19, 33, 3)]:
        # smooth-ish content: low-frequency base + mild noise (the web's
        # actual distribution; pure noise is the worst case covered above)
        base = np.linspace(0, 200, h * w).reshape(h, w)
        px = np.clip(
            base[:, :, None] + rng.randint(-20, 20, (h, w, c)), 0, 255
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        assert out.shape == (h, w, c), (h, w, c)
        assert np.abs(out.astype(int) - px.astype(int)).mean() < 16, (h, w, c)


def test_jpeg_subsampled_roundtrip():
    """4:2:0 and 4:2:2 chroma subsampling: MCU-interleaved scan decodes
    with exact dims at odd/block-straddling shapes, luma survives near-
    losslessly on smooth content (chroma is box-averaged down then
    sample-replicated up, so color error is bounded but nonzero), and
    grayscale ignores the subsampling parameter entirely."""
    from atra_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(31)
    for h, w in [(16, 16), (17, 23), (8, 8), (1, 1), (9, 40), (33, 15)]:
        base = np.linspace(30, 220, h * w).reshape(h, w)
        px = np.clip(
            base[:, :, None] + rng.randint(-15, 15, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        for sub in ("420", "422"):
            out = decode_jpeg(encode_jpeg(px, subsampling=sub))
            assert out.shape == (h, w, 3), (h, w, sub)
            err = np.abs(out.astype(int) - px.astype(int))
            assert err.mean() < 16, (h, w, sub, err.mean())
    # flat color: chroma constant, so subsampling is exactly invertible
    flat = np.full((24, 17, 3), 130, np.uint8)
    for sub in ("420", "422"):
        assert np.array_equal(decode_jpeg(encode_jpeg(flat, subsampling=sub)), flat)
    g = np.linspace(0, 255, 24 * 24).reshape(24, 24).astype(np.uint8)
    assert np.array_equal(
        encode_jpeg(g, subsampling="420"), encode_jpeg(g, subsampling="444")
    )
    with pytest.raises(ValueError):
        encode_jpeg(flat, subsampling="411")


@pytest.mark.usefixtures("ray_session")
def test_media_tone_detection(tmp_path):
    """Bin-center sine clips resolve to the planted FFT bin through the
    actor-pool stage (WAV and PAM containers); noise clips are excluded
    by the id filter; corrupt payloads come back ok=False."""
    from atra_ray.sources.media import generate_audio, tone_params, audio_params
    from atra_ray.stages.multimodal import ToneDetectStage, media_tone

    ids = list(range(24))
    path = generate_audio(str(tmp_path), ids)
    out = media_tone(path, nfft=1024).to_pandas().set_index("media_id")
    tone_ids = [i for i in ids if i % 4 in (0, 3)]
    assert sorted(out.index) == tone_ids
    # both container decode paths are exercised: even tone ids are WAV,
    # odd tone ids are PAM
    assert any(i % 2 == 0 for i in tone_ids) and any(i % 2 == 1 for i in tone_ids)
    for i in tone_ids:
        k = tone_params(i)
        rate, _ = audio_params(i)
        assert out.loc[i, "dominant_bin"] == k, i
        assert out.loc[i, "dominant_hz"] == (k * rate) / 1024.0, i
    st = ToneDetectStage(nfft=1024)
    assert st._one(b"\x00junk")[0] is False
    assert st._one(None)[0] is False
    with pytest.raises(ValueError):
        ToneDetectStage(nfft=1000)  # not a power of two


@pytest.mark.usefixtures("ray_session")
def test_dedup_giant_identical_cluster_over_bucket_cap(tmp_path):
    """A near-identical cluster far larger than max_bucket: over-cap LSH
    buckets emit a star to the bucket min, so the min-id survivor set and
    the transitive cluster stay EXACT (the old truncation dropped members
    past the cap from candidacy entirely — they survived dedup as false
    uniques)."""
    import pyarrow.parquet as pq2

    from atra_ray.stages.dedup import dedup_minhash, dup_clusters

    n = 150  # >> max_bucket=8 below
    text = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table(
        {
            "doc_id": pa.array(range(n + 2), pa.int64()),
            "text": pa.array(
                [text] * n + ["totally different words here entirely", "x y z"],
                pa.string(),
            ),
            "lang": pa.array(["en"] * (n + 2), pa.string()),
        }
    )
    p = tmp_path / "documents.parquet"
    pq2.write_table(t, p)
    survivors = sorted(
        r["doc_id"]
        for r in dedup_minhash(
            str(p), threshold=0.5, bands=16, max_bucket=8
        ).take_all()
    )
    # doc 0 survives for the cluster; the two non-dup docs survive
    assert survivors == [0, n, n + 1]
    clusters = {
        r["doc_id"]: r["cluster"]
        for r in dup_clusters(
            str(p), threshold=0.5, bands=16, max_bucket=8
        ).take_all()
    }
    assert set(clusters) == set(range(n))  # every cluster member present
    assert set(clusters.values()) == {0}
