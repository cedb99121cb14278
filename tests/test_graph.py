"""Fixed-point PageRank: exactness vs a dense single-process reference
running the identical integer arithmetic, plus semantics edges (dup
edges, self-loops, dangling nodes) and partition-count invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

SCALE = 10**12


def _dense_fp_pagerank(edge_list, iters):
    """Same arithmetic as stages/graph.pagerank_fp, dense numpy."""
    edges = sorted(set((s, d) for s, d in edge_list if s != d))
    nodes = sorted(set([s for s, _ in edges] + [d for _, d in edges]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    r = np.full(n, SCALE // n, dtype=np.int64)
    base = (3 * SCALE) // (20 * n)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    for _ in range(iters):
        agg = np.zeros(n, np.int64)
        for s, d in edges:
            agg[idx[d]] += r[idx[s]] // deg[s]
        r = base + (17 * agg) // 20
    return dict(zip(nodes, (int(v) for v in r)))


def _edges_ds(edge_list):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edge_list], pa.uint64()),
                "dst": pa.array([e[1] for e in edge_list], pa.uint64()),
            }
        )
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("num_partitions", [1, 3])
def test_pagerank_fp_matches_dense_reference(num_partitions):
    from atra_ray.stages.graph import pagerank_fp

    # dup edges collapse, self-loop (3,3) drops, 4 is dangling, 5 only-src
    edge_list = [
        (0, 1), (0, 2), (1, 2), (2, 0), (2, 3),
        (3, 3), (3, 4), (1, 2), (5, 1),
    ]
    out = (
        pagerank_fp(_edges_ds(edge_list), num_partitions=num_partitions, iters=8)
        .to_pandas()
    )
    got = dict(zip(out["node"].astype("uint64"), out["rank_fp"].astype("int64")))
    assert got == _dense_fp_pagerank(edge_list, 8)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_fp_partition_invariance_random_graph():
    """Bit-identical across partition counts — the property the
    fixed-point formulation exists to guarantee."""
    from atra_ray.stages.graph import pagerank_fp

    rng = np.random.default_rng(7)
    edge_list = [tuple(map(int, e)) for e in rng.integers(0, 60, size=(400, 2))]
    ref = _dense_fp_pagerank(edge_list, 6)
    for p in (2, 8):
        out = pagerank_fp(_edges_ds(edge_list), num_partitions=p, iters=6).to_pandas()
        got = dict(zip(out["node"].astype("uint64"), out["rank_fp"].astype("int64")))
        assert got == ref, f"partition count {p} changed the result"


@pytest.mark.usefixtures("ray_session")
def test_pagerank_fp_empty_and_degenerate():
    from atra_ray.stages.graph import pagerank_fp

    empty = pagerank_fp(_edges_ds([]), num_partitions=2)
    assert empty.count() == 0
    # only self-loops -> no effective nodes
    only_self = pagerank_fp(_edges_ds([(1, 1), (2, 2)]), num_partitions=2)
    assert only_self.count() == 0


def test_md5_low64_column_matches_scalar():
    """The dictionary-encoded column digest equals the per-row scalar on
    repeat-heavy, unique-only, chunked and empty inputs."""
    import pyarrow as pa

    from atra_ray.functions.hashing import md5_low64, md5_low64_column

    vals = ["http://a/x", "http://b/y", "http://a/x", "", "http://c",
            "http://a/x", "http://b/y"]
    arr = pa.array(vals, pa.string())
    got = md5_low64_column(arr).to_pylist()
    assert got == [md5_low64(v) for v in vals]
    chunked = pa.chunked_array(
        [pa.array(vals[:3]), pa.array([], pa.string()), pa.array(vals[3:])]
    )
    assert md5_low64_column(chunked).to_pylist() == [md5_low64(v) for v in vals]
    assert md5_low64_column(pa.array([], pa.string())).to_pylist() == []
