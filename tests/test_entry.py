"""Driver-contract smoke: __ray_entry__ must import without touching
ray.init, entry() must produce rows with a stable schema, and the
queries()/oracle_sql() registries must stay consistent."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.usefixtures("ray_session")
def test_entry_runs_and_registries_consistent():
    import __ray_entry__ as em

    res = em.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert list(df.columns) == ["url", "format", "encoding", "text", "lang"]

    q = em.queries()
    o = em.oracle_sql()
    assert set(o) <= set(q), "oracle without a query"
    rows_only = set(q) - set(o)
    # the three documented rows-only queries and nothing else
    assert rows_only == {"ann_ivf_topk", "ann_lsh_topk", "doc_language"}
    # driver-snapshot contract (SURVEY §2.9): the collector caps at ~50
    # entries, so oracle-backed queries fill the leading positions and
    # ONLY the rows-only trio may occupy the tail. At 51 oracle entries
    # the 51st oracle query + trio fall past a 50-entry snapshot — they
    # remain covered by tools/check_correctness.py (54/54) and pytest.
    assert len(q) == len(o) + len(rows_only) == 54
    names = list(q)
    assert set(names[: len(o)]) == set(o), "a rows-only query sits before an oracle-backed one"
    assert set(names[len(o) :]) == rows_only
    # every callable takes one positional arg (sf_dir)
    import inspect

    for name, fn in q.items():
        assert len(inspect.signature(fn).parameters) == 1, name
