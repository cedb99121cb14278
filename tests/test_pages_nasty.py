"""Adversarial-pages conformance for the fixture-pages cleaning/scrub
operators (line_dedup / page_repetition / pii_scrub): null and empty
text, whitespace-only lines (frequency-exempt), lines at exactly the
max_freq boundary, docs reduced to nothing by the strip, unicode lines,
and PII spans at string edges. The registry's oracle SQL is reused
verbatim with its fixture path rewritten to the generated table.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _nasty_pages(out_dir: Path) -> Path:
    rng = np.random.RandomState(31)
    boiler = "© 2026 example corp all rights reserved"
    boundary5 = "exactly five occurrences line"   # kept (n <= 5)
    boundary6 = "exactly six occurrences line"    # stripped (n > 5)
    texts: list[str | None] = [
        None,
        "",
        " \t ",
        "\n\n\n",
        boiler,  # doc that is ONLY boilerplate -> vanishes
        "unicode 数据 line\nemoji 🦀 line\nunicode 数据 line",
        "call +1 (555) 123-4567 now\nmail a.b@test.example\nip 10.0.0.1 end",
        "a.b@test.example",  # PII span == whole text
    ]
    n5 = n6 = 0
    for i in range(60):
        lines = [f"unique line {i}-{j}" for j in range(int(rng.randint(1, 6)))]
        if rng.rand() < 0.5:
            lines.append(boiler)
        if n5 < 5 and rng.rand() < 0.5:
            lines.append(boundary5)
            n5 += 1
        if n6 < 6 and rng.rand() < 0.5:
            lines.append(boundary6)
            n6 += 1
        if rng.rand() < 0.3:
            lines.append("   ")  # whitespace-only line: freq-exempt
        texts.append("\n".join(lines))
    # top up the boundary lines to exactly 5 and 6 occurrences
    while n5 < 5:
        texts.append(boundary5)
        n5 += 1
    while n6 < 6:
        texts.append(boundary6)
        n6 += 1
    pages_dir = out_dir / "pages.parquet"
    pages_dir.mkdir(parents=True)
    t = pa.table(
        {
            "url": pa.array(
                [f"https://h{i % 7}.example/p{i}" for i in range(len(texts))],
                pa.string(),
            ),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, pages_dir / "part-0.parquet")
    return pages_dir


def _oracle_for(qname: str, pages_dir: Path) -> str:
    import re

    import __ray_entry__ as em

    sql = em.oracle_sql()[qname]
    # rewrite the fixture path to the generated table (same glob shape)
    return re.sub(
        r"read_parquet\('[^']*pages\.parquet/\*\.parquet'\)",
        f"read_parquet('{pages_dir}/*.parquet')",
        sql,
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname", ["line_dedup", "page_repetition", "pii_scrub"])
def test_pages_query_nasty_text_matches_oracle(qname, tmp_path_factory):
    import duckdb
    import pandas as pd

    from atra_ray.stages.cleaning import line_dedup_clean, page_repetition
    from atra_ray.stages.curation import pii_scrub

    pages_dir = _nasty_pages(tmp_path_factory.mktemp("nastypages"))
    if qname == "line_dedup":
        got = line_dedup_clean(str(pages_dir), max_freq=5)
    elif qname == "page_repetition":
        got = page_repetition(str(pages_dir))
    else:
        got = pii_scrub(str(pages_dir))
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()

    want = duckdb.connect().execute(_oracle_for(qname, pages_dir)).df()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    got, want = canon(got), canon(want)
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
            norm = lambda s: [
                "<null>" if pd.isna(x) else str(x) for x in s.tolist()
            ]
            assert norm(a) == norm(b), f"{qname}.{c}"
