"""Adversarial-content conformance for the documents-table driver
queries: null / empty / whitespace-only text, unicode (CJK, emoji,
combining accents), exact and near duplicates, a pathologically long
doc, null and unknown lang codes — engine output must match the
registry's OWN oracle SQL row for row.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_QUERIES = [
    "doc_quality",
    "token_counts",
    "doc_fingerprints",
    "lang_distribution",
    "dedup_exact",
    "term_doc_freq",
    "tfidf_search_topk",
    "gopher_quality",
    "pack_sequences",
    "doc_split",
    "decontaminate",
    "stratified_sample",
    "weighted_sample",
    "minhash_dup_pairs",
    "simhash_dup_pairs",
    "dup_clusters",
    "dedup_minhash",
    "ngram_jaccard_dup_pairs",
]

_WORDS = [
    "data", "hash", "join", "table", "scan", "merge", "sort", "query",
    "batch", "value", "fast", "slow", "key", "row", "line", "the", "and",
]


def _nasty_docs(out_dir: Path) -> str:
    rng = np.random.RandomState(17)
    texts: list[str | None] = [
        None,
        "",
        " \t\n ",
        "a",
        "...!!!???",
        "12345 67890",
        "这是一个测试 数据 的 文本",
        "emoji 🦀 test 🚀 done",
        "café naïve résumé über",
        ("data hash join " * 2000).strip(),  # pathologically long
    ]
    # random normal docs + planted exact/near duplicates
    for i in range(260):
        n = int(rng.randint(3, 40))
        texts.append(" ".join(_WORDS[int(j)] for j in rng.randint(0, len(_WORDS), n)))
    dup_base = "the quick data hash join over the sorted table scan rows"
    texts += [dup_base, dup_base, dup_base + " extra", "  " + dup_base + "  "]
    langs = []
    for i in range(len(texts)):
        r = rng.rand()
        if r < 0.05:
            langs.append(None)
        elif r < 0.1:
            langs.append("xx")  # unknown code -> English fallback
        elif r < 0.2:
            langs.append("zh")
        else:
            langs.append(["en", "de", "fr", "es"][int(rng.randint(0, 4))])
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [f"src{i % 7}" for i in range(len(texts))], pa.string()
            ),
            "n_chars": pa.array(
                [len(x) if x is not None else 0 for x in texts], pa.int64()
            ),
        }
    )
    path = out_dir / "documents.parquet"
    pq.write_table(t, path)
    return str(out_dir)


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname", _QUERIES)
def test_docs_query_nasty_content_matches_oracle(qname, tmp_path_factory):
    import duckdb
    import pandas as pd

    import __ray_entry__ as em

    sf_dir = _nasty_docs(tmp_path_factory.mktemp("nastydocs"))
    res = em.queries()[qname](sf_dir)
    if isinstance(res, pd.DataFrame):
        got = res
    else:
        got = res.to_pandas()
        if got.empty and not len(got.columns) and hasattr(res, "schema"):
            # Ray to_pandas drops columns on an all-empty dataset
            got = pd.DataFrame({n: [] for n in res.schema().names})

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(em.oracle_sql()[qname]).df()

    got, want = _canon(got), _canon(want)
    assert sorted(got.columns) == sorted(want.columns), qname
    assert len(got) == len(want), f"{qname}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype("float64").to_numpy()
            b = b.astype("float64").to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            assert bool(np.all(both_nan | (a == b))), f"{qname}.{c}"
        else:
            import pandas as pd

            norm = lambda s: [
                "<null>" if pd.isna(x) else str(x) for x in s.tolist()
            ]
            assert norm(a) == norm(b), f"{qname}.{c}" 
