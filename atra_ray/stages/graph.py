"""Web-graph analytics over the crawl's edge table (S6 output).

``pagerank_fp`` is PageRank in FIXED-POINT integer arithmetic: every
rank is an int64 in units of 1/``scale``, contributions are floor
divisions, and the damping update is ``base + (17 * sum) // 20``
(d = 0.85 as the exact rational 17/20). The float formulation would be
accumulation-order-dependent — a different partitioning or reduce-tree
shape changes the last ulps, so no two cluster layouts agree bit-for-bit
and no SQL oracle can certify the result. Integer sums are associative
and commutative, so THIS formulation is bit-identical on 1 core or 256
nodes, and the driver's DuckDB oracle (the same iterations unrolled as
chained CTEs over the simulator's edge parquet) hash-MATCHes it. The
cost is bounded quantization: each node's rank absorbs < 1/scale error
per floor division per iteration (≤ iters·(1+17/20)/scale ≈ 1.5e-11 at
the default scale=1e12) — far below anything that reorders ranking.

Execution shape is the label-only BSP of ``dedup.connected_components``
(dedup.py:763): edges are hash-partitioned by SOURCE node once into
per-partition object-store tables with their out-degree attached; every
iteration exchanges ONLY rank rows (propose: one task per partition
joins its cached edges against its resident ranks and splits (dst,
contrib) by destination hash; reduce: one task per partition sums its
incoming contributions). Per-iteration network is O(|ranks| +
|boundary edges|), never O(iters × |E|); nothing materializes on the
driver except the node count N (one integer per partition).

Semantics (stated because every engine chooses): parallel duplicate
edges collapse to one, self-loops are dropped, and dangling-node mass
is NOT redistributed (a dangling node keeps contributing nothing; total
mass decays toward base — the variant whose fixed-point arithmetic
stays exactly reproducible without a global mass sum per iteration).

Reference: the crawl's web-graph sink (atra/src/link_state + the S6
surface in SURVEY §2.1) produces the edge table; PageRank itself is
the Page/Brin/Motwani/Winograd 1999 formulation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .dedup import _split_by_node

__all__ = ["pagerank_fp"]

_EDGE_SCHEMA = pa.schema(
    [("src", pa.uint64()), ("dst", pa.uint64()), ("deg", pa.int64())]
)
_RANK_SCHEMA = pa.schema([("node", pa.uint64()), ("rank_fp", pa.int64())])


def pagerank_fp(
    edges: rd.Dataset,
    num_partitions: int = 32,
    iters: int = 8,
    scale: int = 10**12,
) -> rd.Dataset:
    """(node, rank_fp) over an (src, dst) uint64 edge Dataset — ranks in
    units of 1/``scale`` after ``iters`` damped iterations (d = 17/20).

    ``edges`` must carry uint64 ``src``/``dst`` node ids (callers hash
    string urls through ``functions.hashing.md5_low64`` — the DuckDB
    ``md5_number_lower`` twin — so the SQL oracle derives identical ids).
    """
    import ray

    P = num_partitions
    if P < 1:
        raise ValueError("num_partitions must be >= 1")
    if iters < 0:
        raise ValueError("iters must be >= 0")

    @ray.remote(num_returns=2 * P if P > 1 else 2)
    def _split(block):
        """Block -> P edge slices by hash(src) + P node slices by
        hash(node) (nodes = every id appearing as src OR dst)."""
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0:
            return (None,) * (2 * P)
        src = block.column("src").combine_chunks()
        dst = block.column("dst").combine_chunks()
        e = pa.table({"src": src.cast(pa.uint64()), "dst": dst.cast(pa.uint64())})
        # self-loops drop HERE so the node universe derives from effective
        # edges only (a node appearing solely in self-loops does not exist
        # — the oracle's eraw-derived node set says the same)
        import pyarrow.compute as pc

        e = e.filter(pc.invert(pc.equal(e.column("src"), e.column("dst"))))
        if e.num_rows == 0:
            return (None,) * (2 * P)
        nodes = pa.table(
            {
                "node": pa.concat_arrays(
                    [e.column("src").combine_chunks(), e.column("dst").combine_chunks()]
                )
            }
        )
        return tuple(_split_by_node(e, "src", P)) + tuple(
            _split_by_node(nodes, "node", P)
        )

    @ray.remote
    def _build_edges(*splits):
        """One partition's edges: dedupe (src, dst), drop self-loops,
        attach out-degree (valid globally — a src's every edge lands in
        hash(src)'s partition)."""
        parts = [s for s in splits if s is not None and s.num_rows]
        if not parts:
            return _EDGE_SCHEMA.empty_table()
        t = pa.concat_tables(parts)
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        # dedupe parallel edges: lexicographic sort + neighbor test
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        if len(s):
            first = np.empty(len(s), bool)
            first[0] = True
            first[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
            s, d = s[first], d[first]
        # out-degree per src (s is sorted): run-length via boundaries
        if len(s):
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            counts = np.diff(np.r_[starts, len(s)])
            deg = np.repeat(counts, counts).astype(np.int64)
        else:
            deg = np.empty(0, np.int64)
        return pa.table(
            {
                "src": pa.array(s, pa.uint64()),
                "dst": pa.array(d, pa.uint64()),
                "deg": pa.array(deg, pa.int64()),
            }
        )

    @ray.remote(num_returns=2)
    def _build_nodes(*splits):
        """One partition's resident node set (unique) + its count."""
        parts = [s for s in splits if s is not None and s.num_rows]
        if not parts:
            return np.empty(0, np.uint64), 0
        nodes = np.unique(
            pa.concat_tables(parts).column("node").to_numpy(zero_copy_only=False)
        )
        return nodes, len(nodes)

    @ray.remote(num_returns=P if P > 1 else 1)
    def _propose(edge_t: pa.Table, ranks: pa.Table):
        """contrib = rank(src) // deg for this partition's edges, split
        (dst, contrib) by destination hash. Every src is resident here
        (same hash keys edges and ranks), so the lookup is exact."""
        if edge_t.num_rows == 0:
            return (None,) * P if P > 1 else None
        nodes = ranks.column("node").to_numpy(zero_copy_only=False)
        r = ranks.column("rank_fp").to_numpy(zero_copy_only=False)
        src = edge_t.column("src").to_numpy(zero_copy_only=False)
        r_of_src = r[np.searchsorted(nodes, src)]  # nodes sorted by build
        contrib = r_of_src // edge_t.column("deg").to_numpy(zero_copy_only=False)
        props = pa.table(
            {
                "node": edge_t.column("dst"),
                "c": pa.array(contrib, pa.int64()),
            }
        )
        out = _split_by_node(props, "node", P)
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def _reduce(nodes: np.ndarray, base: int, *incoming):
        """rank' = base + (17 * Σ contrib) // 20 for every resident node
        (missing nodes get base — integer sums, order-independent)."""
        total = np.zeros(len(nodes), np.int64)
        for t in incoming:
            if t is None or t.num_rows == 0:
                continue
            idx = np.searchsorted(nodes, t.column("node").to_numpy(zero_copy_only=False))
            np.add.at(total, idx, t.column("c").to_numpy(zero_copy_only=False))
        r = base + (17 * total) // 20
        return pa.table(
            {"node": pa.array(nodes, pa.uint64()), "rank_fp": pa.array(r, pa.int64())}
        )

    @ray.remote
    def _init_ranks(nodes: np.ndarray, r0: int):
        return pa.table(
            {
                "node": pa.array(nodes, pa.uint64()),
                "rank_fp": pa.array(np.full(len(nodes), r0, np.int64), pa.int64()),
            }
        )

    block_refs = [
        br for bundle in edges.iter_internal_ref_bundles() for br in bundle.block_refs
    ]
    if not block_refs:
        return rd.from_arrow(_RANK_SCHEMA.empty_table())
    splits = [list(_split.remote(b)) for b in block_refs]
    edge_refs = [
        _build_edges.remote(*[s[p] for s in splits]) for p in range(P)
    ]
    node_built = [
        _build_nodes.remote(*[s[P + p] for s in splits]) for p in range(P)
    ]
    node_refs = [b[0] for b in node_built]
    n_total = sum(ray.get([b[1] for b in node_built]))  # one int per partition
    if n_total == 0:
        return rd.from_arrow(_RANK_SCHEMA.empty_table())
    r0 = scale // n_total
    base = (3 * scale) // (20 * n_total)
    rank_refs = [_init_ranks.remote(node_refs[p], r0) for p in range(P)]
    for _ in range(iters):
        props = [_propose.remote(edge_refs[p], rank_refs[p]) for p in range(P)]
        if P == 1:
            props = [[r] for r in props]
        rank_refs = [
            _reduce.remote(node_refs[q], base, *[props[p][q] for p in range(P)])
            for q in range(P)
        ]
    return rd.from_arrow_refs(rank_refs)
