"""Adversarial-vector conformance for the embeddings-table queries:
zero-norm vectors (cosine undefined — both sides pin to DuckDB's -1.0
convention so they rank LAST), exact-duplicate vectors (similarity ties
resolve by vec_id on both sides), negative components, and a couple of
near-parallel vectors around the dup threshold.

Float-boundary caveat (multi-seed shakeout finding): a pair whose
cosine lands within ~1e-7 of the threshold, or two candidates whose
sims differ by less than the summation-order epsilon, is NOT bit-stable
between numpy's matmul and DuckDB's list_cosine_similarity — no two
float computation orders agree there. The seed below (like the driver
testdata) keeps an epsilon margin around the threshold; exact ties
(duplicate vectors) are fine because both sides tie-break on vec_id.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_ORACLE_QUERIES = [
    "ann_cosine_topk",
    "ann_ivf_exact_topk",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
]


def _nasty_embeddings(out_dir: Path) -> str:
    rng = np.random.RandomState(5)
    d = 16
    vecs = []
    # ids 0..9 are the queries; make query 3 a ZERO vector
    for i in range(10):
        v = rng.randn(d)
        vecs.append(np.zeros(d) if i == 3 else v)
    base = rng.randn(d)
    for i in range(10, 150):
        r = rng.rand()
        if r < 0.06:
            vecs.append(np.zeros(d))  # zero-norm candidates
        elif r < 0.16:
            vecs.append(vecs[4].copy())  # exact dup of query 4 (ties)
        elif r < 0.3:
            # near-parallel to base: clusters around the dup threshold
            vecs.append(base + rng.randn(d) * 0.18)
        else:
            vecs.append(rng.randn(d))
    m = np.stack(vecs).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float32()), d
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(
                (np.arange(len(vecs)) % 3).astype("int32"), pa.int32()
            ),
        }
    )
    pq.write_table(t, out_dir / "embeddings.parquet")
    return str(out_dir)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname", _ORACLE_QUERIES)
def test_embeddings_query_nasty_vectors_match_oracle(qname, tmp_path_factory):
    import duckdb
    import pandas as pd

    import __ray_entry__ as em

    sf_dir = _nasty_embeddings(tmp_path_factory.mktemp("nastyemb"))
    got = em.queries()[qname](sf_dir)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = con.execute(em.oracle_sql()[qname]).df()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    got, want = canon(got), canon(want)
    assert sorted(got.columns) == sorted(want.columns), qname
    assert len(got) == len(want), f"{qname}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        assert got[c].astype("int64").tolist() == want[c].astype(
            "int64"
        ).tolist(), f"{qname}.{c}"
