"""Adversarial-value conformance for every events_* driver query:
nulls and ±inf in `value`, null `ts`, tied timestamps, one giant skew
user, single-event users, null/empty `props` — the engine result must
hash-match the registry's OWN oracle SQL (the exact strings the driver
runs), so no edge class can drift between the two sides.

Null-ts contract (stages/events.py module docstring): the four temporal
operators (sessionize / asof / interval / rolling) DROP null-ts rows —
their oracles here run over a ts-NOT-NULL view; the aggregate operators
keep null-ts groups and run over the full table.
"""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_TEMPORAL = {
    "events_sessionize",
    "events_asof_join",
    "events_interval_join",
    "events_rolling",
}
_AGG = {
    "events_windowed",
    "events_sliding_window",
    "events_quantiles",
    "events_topk_users",
    "events_histogram",
    "events_json_stats",
}


def _nasty_events(out_dir: Path, seed: int = 99) -> str:
    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 1, 1)
    n = 4000
    rows = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
            "value": [], "props": []}
    types = ["view", "click", "purchase", "error"]
    for eid in range(n):
        # skew: user 0 takes ~30% of events; users 50.. are singletons
        r = rng.rand()
        if r < 0.3:
            uid = 0
        elif r < 0.9:
            uid = int(rng.randint(1, 40))
        else:
            uid = 50 + eid  # singleton user
        # tied timestamps: coarse 5-minute grid forces collisions, and
        # ~2% null ts exercises the aggregate null-group path
        ts = (
            None
            if rng.rand() < 0.02
            else base + dt.timedelta(minutes=5 * int(rng.randint(0, 400)))
        )
        v = rng.rand()
        if v < 0.05:
            value = None
        elif v < 0.08:
            value = float("inf")
        elif v < 0.11:
            value = float("-inf")
        else:
            value = float(np.round(rng.rand() * 200 - 10, 3))  # spills bins
        p = rng.rand()
        if p < 0.1:
            props = None
        elif p < 0.15:
            props = "{}"  # no extractable field
        else:
            props = '{"k": %d}' % int(rng.randint(-5, 100))
        rows["event_id"].append(eid)
        rows["ts"].append(ts)
        # ~1.5% null user_id: SQL PARTITION BY / GROUP BY puts them in
        # one NULL group; temporal ops treat them like any other user
        rows["user_id"].append(None if rng.rand() < 0.015 else uid)
        # ~1.5% null event_type: one more GROUP BY group on both sides
        rows["event_type"].append(
            None if rng.rand() < 0.015
            else types[int(rng.randint(0, len(types)))]
        )
        rows["value"].append(value)
        rows["props"].append(props)
    t = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "props": pa.array(rows["props"], pa.string()),
        }
    )
    path = out_dir / "events.parquet"
    pq.write_table(t, path)
    return str(out_dir)


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.usefixtures("ray_session")
# seed 7 regression-pins the interval-join NaN-user finding (merge_asof
# matches NaN 'by' groups while SQL's JOIN ON never matches NULL)
@pytest.mark.parametrize("seed", [99, 7])
@pytest.mark.parametrize("qname", sorted(_TEMPORAL | _AGG))
def test_events_query_nasty_values_match_oracle(qname, seed, tmp_path_factory):
    import duckdb
    import pandas as pd

    import __ray_entry__ as em

    sf_dir = _nasty_events(tmp_path_factory.mktemp("nasty"), seed)
    got = em.queries()[qname](sf_dir)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()

    con = duckdb.connect()
    src = f"read_parquet('{sf_dir}/events.parquet')"
    if qname in _TEMPORAL:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM {src} WHERE ts IS NOT NULL"
        )
    else:
        con.execute(f"CREATE VIEW events AS SELECT * FROM {src}")
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
