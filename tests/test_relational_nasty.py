"""Adversarial conformance for the relational pipelines: NULL join keys
(dropped by every inner join), NULL prices/discounts (contribute no
revenue but still count rows), heavy key skew, and dangling foreign keys
on every dimension — engine results must match the registry's oracle SQL
over the same seven TPC-H-ish tables.
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
    "orders_revenue_by_nation",
    "segment_order_stats",
    "brand_region_revenue",
]


def _nasty_tables(out: Path) -> str:
    rng = np.random.RandomState(23)
    n_li, n_ord, n_cust = 4000, 800, 120

    def _mask(vals, frac):
        # real NULLs (not float NaN): the parquet tables carry nullable
        # doubles, and the oracles' floor(x)::BIGINT tolerates NULL but
        # not NaN — matching the fixture/testdata shape
        return [
            None if rng.rand() < frac else float(v)
            for v in np.asarray(vals, dtype="float64")
        ]

    # lineitem: skewed orderkey/partkey/suppkey, ~3% null prices and
    # discounts, ~2% null keys
    ok = np.where(rng.rand(n_li) < 0.3, 7, rng.randint(1, n_ord + 40, n_li))
    pk = np.where(rng.rand(n_li) < 0.25, 3, rng.randint(1, 90, n_li))
    sk = np.where(rng.rand(n_li) < 0.2, 11, rng.randint(10, 400, n_li))
    li = pa.table(
        {
            "l_orderkey": pa.array(
                [None if rng.rand() < 0.02 else int(v) for v in ok], pa.int64()
            ),
            "l_partkey": pa.array(
                [None if rng.rand() < 0.02 else int(v) for v in pk], pa.int64()
            ),
            "l_suppkey": pa.array(
                [None if rng.rand() < 0.02 else int(v) for v in sk], pa.int64()
            ),
            "l_extendedprice": pa.array(
                _mask(np.round(rng.rand(n_li) * 900, 3), 0.03), pa.float64()
            ),
            "l_discount": pa.array(
                _mask(np.round(rng.randint(0, 11, n_li) / 100.0, 2), 0.03),
                pa.float64(),
            ),
            "l_quantity": pa.array(rng.randint(1, 50, n_li), pa.int64()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n_ord + 1), pa.int64()),
            "o_custkey": pa.array(
                [
                    None if rng.rand() < 0.03 else int(v)
                    for v in rng.randint(1, n_cust + 30, n_ord)
                ],
                pa.int64(),
            ),
            "o_orderstatus": pa.array(
                [["O", "F", "P"][int(v)] for v in rng.randint(0, 3, n_ord)],
                pa.string(),
            ),
            "o_totalprice": pa.array(
                _mask(np.round(rng.rand(n_ord) * 9000, 2), 0.05), pa.float64()
            ),
            # timestamp[us] like the driver testdata (TESTDATA.md schema)
            "o_orderdate": pa.array(
                (
                    np.datetime64("1995-01-01")
                    + rng.randint(0, 2000, n_ord).astype("timedelta64[D]")
                ).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n_cust + 1), pa.int64()),
            "c_nationkey": pa.array(
                (np.arange(1, n_cust + 1) % 23).astype("int32"), pa.int32()
            ),
            "c_mktsegment": pa.array(
                [
                    ["BUILDING", "MACHINERY", None][int(v)]
                    for v in rng.randint(0, 3, n_cust)
                ],
                pa.string(),
            ),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(1, 80), pa.int64()),
            "p_brand": pa.array(
                [f"Brand#{k % 5}" for k in range(1, 80)], pa.string()
            ),
        }
    )
    supp = pa.table(
        {
            "s_suppkey": pa.array(np.arange(10, 380), pa.int64()),
            "s_nationkey": pa.array(
                (np.arange(10, 380) % 25).astype("int32"), pa.int32()
            ),
        }
    )
    nat = pa.table(
        {
            "n_nationkey": pa.array(np.arange(23, dtype="int32"), pa.int32()),
            "n_name": pa.array([f"NATION{k}" for k in range(23)], pa.string()),
            "n_regionkey": pa.array(
                (np.arange(23) % 5).astype("int32"), pa.int32()
            ),
        }
    )
    reg = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype="int32"), pa.int32()),
            "r_name": pa.array([f"REGION{k}" for k in range(5)], pa.string()),
        }
    )
    for name, t in [
        ("lineitem", li), ("orders", orders), ("customer", cust),
        ("part", part), ("supplier", supp), ("nation", nat), ("region", reg),
    ]:
        pq.write_table(t, out / f"{name}.parquet")
    return str(out)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname", _QUERIES)
def test_relational_query_nasty_tables_match_oracle(qname, tmp_path_factory):
    import duckdb
    import pandas as pd

    import __ray_entry__ as em

    sf_dir = _nasty_tables(tmp_path_factory.mktemp("nastyrel"))
    got = em.queries()[qname](sf_dir)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()

    con = duckdb.connect()
    for name in ("lineitem", "orders", "customer", "part", "supplier",
                 "nation", "region"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
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
