"""Property-based tests (hypothesis) for the pure URL kernels — the
reference's own depth/ordering unit tests (url/url_with_depth.rs:298-389)
generalized over generated inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from atra_ray.functions.links import pack_link
from atra_ray.functions.urlkit import Depth, canonicalize, origin_of

_seg = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=10,
)


@st.composite
def _urls(draw):
    host = draw(_seg) + ".example"
    path = "/" + "/".join(draw(st.lists(_seg, max_size=3)))
    frag = draw(st.one_of(st.just(""), st.just("#x"), st.just("#frag")))
    query = draw(st.one_of(st.just(""), st.just("?a=1")))
    return f"https://{host}{path}{query}{frag}"


@settings(max_examples=200, deadline=None)
@given(_urls())
def test_canonicalize_idempotent_and_fragment_free(url):
    c = canonicalize(url)
    assert c is not None
    assert "#" not in c  # fragment always stripped (url_with_depth.rs:44-47)
    assert canonicalize(c) == c  # idempotent


@settings(max_examples=200, deadline=None)
@given(_urls(), _urls())
def test_depth_propagation_rule(base, raw):
    """same host → dow+1, dts same; host change → dow=0, dts+1; tds always
    +1 (url_with_depth.rs:69-110)."""
    base = canonicalize(base)  # crawl flow precondition: bases are canonical
    d0 = Depth(2, 1, 3)
    packed = pack_link(base, d0, raw)
    if canonicalize(raw) == base:
        assert packed is None  # self-links are dropped
        return
    assert packed is not None
    target, d, kind = packed
    assert d.tds == d0.tds + 1
    if origin_of(target) == origin_of(base):
        assert d.dow == d0.dow + 1 and d.dts == d0.dts
    else:
        assert d.dow == 0 and d.dts == d0.dts + 1


@settings(max_examples=100, deadline=None)
@given(_urls())
def test_origin_is_host_cased(url):
    o = origin_of(url)
    assert o is not None and o == o.lower()
    assert o in url.lower()


# ---------------------------------------------------------------------------
# partition-hash dtype stability + null-safe multi-key grouping
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


_int_keys = st.lists(
    st.one_of(st.integers(min_value=-10**6, max_value=10**6), st.none()),
    min_size=1,
    max_size=60,
)


@settings(max_examples=120, deadline=None)
@given(_int_keys)
def test_part_id_dtype_stable_for_nullable_int_keys(vals):
    """The same key value must land in the same partition whether its
    block materialized as int64 (no nulls in that block), float64 (a
    null somewhere promoted the column), or nullable Int64 — the
    invariant the sortless exchanges' co-location rests on (round 5:
    hash_pandas_object hashes BY DTYPE, so unnormalized int vs float
    blocks split a key's rows)."""
    from atra_ray.stages.shuffle import _part_id

    as_float = pd.DataFrame({"k": pd.Series(vals, dtype="float64")})
    as_nullable = pd.DataFrame({"k": pd.Series(vals, dtype="Int64")})
    p_float = _part_id(as_float, ["k"], 7).tolist()
    p_nullable = _part_id(as_nullable, ["k"], 7).tolist()
    assert p_float == p_nullable
    if all(v is not None for v in vals):
        as_int = pd.DataFrame({"k": pd.Series(vals, dtype="int64")})
        assert _part_id(as_int, ["k"], 7).tolist() == p_float
    # per-value determinism: splitting the frame anywhere changes nothing
    half = len(vals) // 2
    p_a = _part_id(as_float.iloc[:half].reset_index(drop=True), ["k"], 7)
    p_b = _part_id(as_float.iloc[half:].reset_index(drop=True), ["k"], 7)
    assert p_a.tolist() + p_b.tolist() == p_float


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.sampled_from(["a", "b", "c", ""]), st.none()),
            st.one_of(st.integers(min_value=0, max_value=5), st.none()),
        ),
        min_size=1,
        max_size=900,
    )
)
def test_group_by_nullsafe_matches_pandas(rows):
    """group_by_nullsafe == pandas groupby(dropna=False) on any two-key
    table with nulls — the property pyarrow 16.1.0's multi-key hash
    grouper violates (duplicate null-key groups past hash resizes)."""
    from atra_ray.stages.shuffle import group_by_nullsafe

    t = pa.table(
        {
            "k1": pa.array([r[0] for r in rows], pa.string()),
            "k2": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    g = group_by_nullsafe(t, ["k1", "k2"], [([], "count_all")]).to_pandas()
    assert not g.duplicated(["k1", "k2"]).sum()
    want = (
        pd.DataFrame({"k1": [r[0] for r in rows], "k2": [r[1] for r in rows]})
        .groupby(["k1", "k2"], dropna=False, as_index=False)
        .size()
    )
    got = {
        (a, b): int(n)
        for a, b, n in zip(
            [None if pd.isna(x) else x for x in g["k1"]],
            [None if pd.isna(x) else int(x) for x in g["k2"]],
            g["count_all"],
        )
    }
    exp = {
        (None if pd.isna(a) else a, None if pd.isna(b) else int(b)): int(n)
        for a, b, n in zip(want["k1"], want["k2"], want["size"])
    }
    assert got == exp
