"""Relational join/aggregate pipelines over the TPC-H-ish tables.

The crawl engine's exchange primitives generalize to classic warehouse
joins; this module is the demonstration, shaped for scale rather than
convenience:

- **Chained co-partitioned hash joins, never a broadcast of a scaling
  side.** ``revenue_by_nation`` runs lineitem ⋈ orders on orderkey, then
  ⋈ customer on custkey — each hop is ONE ``partitioned_map_groups``
  exchange (both sides tagged into a shared superset schema so all rows
  of a key co-locate, then a vectorized ``pd.merge`` per partition).
  Only the constant-size nation table (25 rows) is a driver-side lookup.
- **Combiner pre-aggregation at every hop.** lineitem collapses to one
  (orderkey, cents, n) row per batch-key before the first exchange, and
  hop outputs re-collapse per partition before the next — the wire
  carries partial aggregates, not fact rows.
- **Exact money math.** revenue is summed as integer cents with
  ``floor(x * 100 + 0.5)`` spelled out on BOTH sides (DuckDB ``round``
  is half-away-from-zero while numpy's is banker's — the explicit floor
  form is the same IEEE op sequence in both engines), so the aggregate
  is accumulation-order-independent and hash-MATCHable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["brand_region_revenue", "revenue_by_nation", "segment_order_stats"]


def _cents(price: np.ndarray, discount: np.ndarray) -> np.ndarray:
    # null price/discount contributes 0 cents (SQL SUM ignores the NULL
    # term; count(*) still counts the row) — unmasked, floor(NaN) would
    # cast to INT64_MIN and poison the whole group's sum
    v = np.floor(price * (1.0 - discount) * 100.0 + 0.5)
    return np.where(np.isnan(v), 0, v).astype(np.int64)


def revenue_by_nation(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """(n_name, revenue_cents, n_items): lineitem revenue rolled up to the
    customer's nation — lineitem ⋈ orders ⋈ customer ⋈ nation."""
    from .shuffle import hash_reduce_small, partitioned_map_groups

    # hop 1 build: per-batch combiner collapses lineitem to (orderkey,
    # cents, n) — the fact table never crosses the wire row-for-row
    def _li_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False),
            batch.column("l_discount").to_numpy(zero_copy_only=False),
        )
        df = pd.DataFrame(
            {"k": batch.column("l_orderkey").to_numpy(zero_copy_only=False),
             "cents": cents}
        )
        g = df.groupby("k", as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("cents", "size")
        )
        return pa.table(
            {
                "k": pa.array(g["k"], pa.int64()),
                "cents": pa.array(g["cents"], pa.int64()),
                "n": pa.array(g["n"].astype("int64"), pa.int64()),
                "cust": pa.array([None] * len(g), pa.int64()),
                "_side": pa.array(np.zeros(len(g), np.int8), pa.int8()),
            }
        )

    def _orders_tag(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "k": batch.column("o_orderkey").cast(pa.int64()),
                "cents": pa.array([None] * m, pa.int64()),
                "n": pa.array([None] * m, pa.int64()),
                "cust": batch.column("o_custkey").cast(pa.int64()),
                "_side": pa.array(np.ones(m, np.int8), pa.int8()),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(_li_partial, batch_format="pyarrow")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(_orders_tag, batch_format="pyarrow")

    def _join_orderkey(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 0]
        right = df[df["_side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame(
                {"cust": pd.Series(dtype="int64"),
                 "cents": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        # pre-sum the lineitem partials per orderkey, then one merge
        lg = left.groupby("k", as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("n", "sum")
        )
        m = lg.merge(right[["k", "cust"]], on="k", how="inner")
        out = m.groupby("cust", as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("n", "sum")
        )
        for c in ("cust", "cents", "n"):
            out[c] = out[c].astype("int64")
        return out

    hop1 = partitioned_map_groups(
        li.union(orders), ["k"], _join_orderkey, num_partitions=num_partitions
    )

    def _hop1_tag(batch) -> pa.Table:
        if not isinstance(batch, pa.Table):
            batch = pa.Table.from_pandas(batch, preserve_index=False)
        m = batch.num_rows
        return pa.table(
            {
                "k": batch.column("cust").cast(pa.int64()),
                "cents": batch.column("cents").cast(pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
                "nat": pa.array([None] * m, pa.int64()),
                "_side": pa.array(np.zeros(m, np.int8), pa.int8()),
            }
        )

    def _cust_tag(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "k": batch.column("c_custkey").cast(pa.int64()),
                "cents": pa.array([None] * m, pa.int64()),
                "n": pa.array([None] * m, pa.int64()),
                "nat": batch.column("c_nationkey").cast(pa.int64()),
                "_side": pa.array(np.ones(m, np.int8), pa.int8()),
            }
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_cust_tag, batch_format="pyarrow")

    def _join_custkey(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 0]
        right = df[df["_side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame(
                {"nat": pd.Series(dtype="int64"),
                 "cents": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        m = left[["k", "cents", "n"]].merge(
            right[["k", "nat"]], on="k", how="inner"
        )
        out = m.groupby("nat", as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("n", "sum")
        )
        for c in ("nat", "cents", "n"):
            out[c] = out[c].astype("int64")
        return out

    hop2 = partitioned_map_groups(
        hop1.map_batches(_hop1_tag, batch_format="pyarrow").union(cust),
        ["k"],
        _join_custkey,
        num_partitions=num_partitions,
    )

    nat_schema = pa.schema(
        [("nat", pa.int64()), ("cents", pa.int64()), ("n", pa.int64())]
    )

    def _nat_sum(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("nat", as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("n", "sum")
        )
        for c in ("nat", "cents", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, schema=nat_schema, preserve_index=False)

    totals = hash_reduce_small(
        hop2, ["nat"], _nat_sum, num_partitions=4, combine_fn=_nat_sum
    )
    # nation is 25 rows by spec — the one legitimate driver-side lookup
    import pyarrow.parquet as pq

    nt = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    name_of = dict(
        zip(nt.column("n_nationkey").to_pylist(), nt.column("n_name").to_pylist())
    )
    out = pa.table(
        {
            "n_name": pa.array(
                [name_of[int(v)] for v in totals.column("nat").to_pylist()],
                pa.string(),
            ),
            "revenue_cents": totals.column("cents"),
            "n_items": totals.column("n"),
        }
    )
    return rd.from_arrow(out)


def segment_order_stats(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """(c_mktsegment, o_orderstatus, n_orders, max_totalprice,
    first_orderdate): orders ⋈ customer on custkey (one exchange), then a
    small grouped reduce — count/extrema only (order-free, bit-exact)."""
    from .shuffle import hash_reduce_small, partitioned_map_groups

    def _orders_tag(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "k": batch.column("o_custkey").cast(pa.int64()),
                "status": batch.column("o_orderstatus"),
                "price": batch.column("o_totalprice"),
                "odate": batch.column("o_orderdate"),
                "seg": pa.array([None] * m, pa.string()),
                "_side": pa.array(np.zeros(m, np.int8), pa.int8()),
            }
        )

    def _cust_tag(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "k": batch.column("c_custkey").cast(pa.int64()),
                "status": pa.array([None] * m, pa.string()),
                "price": pa.array([None] * m, pa.float64()),
                "odate": pa.array([None] * m, pa.timestamp("us")),
                "seg": batch.column("c_mktsegment"),
                "_side": pa.array(np.ones(m, np.int8), pa.int8()),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    ).map_batches(_orders_tag, batch_format="pyarrow")
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(_cust_tag, batch_format="pyarrow")

    def _join(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 0]
        right = df[df["_side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "seg": pd.Series(dtype="object"),
                    "status": pd.Series(dtype="object"),
                    "n_orders": pd.Series(dtype="int64"),
                    "max_totalprice": pd.Series(dtype="float64"),
                    "first_orderdate": pd.Series(dtype="datetime64[us]"),
                }
            )
        m = left[["k", "status", "price", "odate"]].merge(
            right[["k", "seg"]], on="k", how="inner"
        )
        # dropna=False: a NULL segment (or status) is one more group,
        # exactly like SQL GROUP BY
        out = m.groupby(
            ["seg", "status"], as_index=False, sort=False, dropna=False
        ).agg(
            n_orders=("k", "size"),
            max_totalprice=("price", "max"),
            first_orderdate=("odate", "min"),
        )
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    joined = partitioned_map_groups(
        orders.union(cust), ["k"], _join, num_partitions=num_partitions
    )
    schema = pa.schema(
        [
            ("seg", pa.string()),
            ("status", pa.string()),
            ("n_orders", pa.int64()),
            ("max_totalprice", pa.float64()),
            ("first_orderdate", pa.timestamp("ns")),
        ]
    )

    def _merge(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(
            ["seg", "status"], as_index=False, sort=False, dropna=False
        ).agg(
            n_orders=("n_orders", "sum"),
            max_totalprice=("max_totalprice", "max"),
            first_orderdate=("first_orderdate", "min"),
        )
        g["n_orders"] = g["n_orders"].astype("int64")
        return pa.Table.from_pandas(g, schema=schema, preserve_index=False)

    out = hash_reduce_small(
        joined, ["seg", "status"], _merge, num_partitions=4, combine_fn=_merge
    )

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["c_mktsegment", "o_orderstatus", "n_orders", "max_totalprice",
             "first_orderdate"]
        )

    return rd.from_arrow(_rename(out))


def brand_region_revenue(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """(r_name, p_brand, revenue_cents, n_items): lineitem revenue rolled
    up to (SUPPLIER's region, part brand) — lineitem ⋈ part ⋈ supplier ⋈
    nation ⋈ region. The query that touches every dimension table the
    other two relational pipelines don't (part, supplier, region).

    Scale shape: part (SF x 200k) and supplier (SF x 10k) both grow with
    the corpus, so BOTH join hops are co-partitioned exchanges over the
    shared superset schema — never a broadcast of a scaling side. Only
    nation (25 rows) + region (5 rows) are driver-side lookups. The
    lineitem combiner collapses to (partkey, suppkey) partials per batch
    before hop 1, hop outputs re-collapse per partition, and the final
    (nation, brand) reduce sees ~25 x 125 rows. Revenue is exact integer
    cents (see module docstring) so the rollup is order-independent and
    hash-MATCHable."""
    from .shuffle import hash_reduce_small, partitioned_map_groups

    # ---- hop 1: partkey --------------------------------------------------
    def _li_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False),
            batch.column("l_discount").to_numpy(zero_copy_only=False),
        )
        df = pd.DataFrame(
            {
                "k": batch.column("l_partkey").to_numpy(zero_copy_only=False),
                "supp": batch.column("l_suppkey").to_numpy(zero_copy_only=False),
                "cents": cents,
            }
        )
        g = df.groupby(["k", "supp"], as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("cents", "size")
        )
        m = len(g)
        return pa.table(
            {
                "k": pa.array(g["k"].astype("int64"), pa.int64()),
                "supp": pa.array(g["supp"].astype("int64"), pa.int64()),
                "cents": pa.array(g["cents"].astype("int64"), pa.int64()),
                "n": pa.array(g["n"].astype("int64"), pa.int64()),
                "brand": pa.array([None] * m, pa.string()),
                "_side": pa.array(np.zeros(m, np.int8), pa.int8()),
            }
        )

    def _part_tag(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "k": batch.column("p_partkey").cast(pa.int64()),
                "supp": pa.array([None] * m, pa.int64()),
                "cents": pa.array([None] * m, pa.int64()),
                "n": pa.array([None] * m, pa.int64()),
                "brand": batch.column("p_brand"),
                "_side": pa.array(np.ones(m, np.int8), pa.int8()),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(_li_partial, batch_format="pyarrow")
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(_part_tag, batch_format="pyarrow")

    def _join_partkey(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 0]
        right = df[df["_side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "supp": pd.Series(dtype="int64"),
                    "brand": pd.Series(dtype="object"),
                    "cents": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        m = left[["k", "supp", "cents", "n"]].merge(
            right[["k", "brand"]], on="k", how="inner"
        )
        out = m.groupby(["supp", "brand"], as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("n", "sum")
        )
        for c in ("supp", "cents", "n"):
            out[c] = out[c].astype("int64")
        return out

    hop1 = partitioned_map_groups(
        li.union(part), ["k"], _join_partkey, num_partitions=num_partitions
    )

    # ---- hop 2: suppkey --------------------------------------------------
    def _hop1_tag(batch) -> pa.Table:
        if not isinstance(batch, pa.Table):
            batch = pa.Table.from_pandas(batch, preserve_index=False)
        m = batch.num_rows
        return pa.table(
            {
                "k": batch.column("supp").cast(pa.int64()),
                "brand": batch.column("brand"),
                "cents": batch.column("cents").cast(pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
                "nat": pa.array([None] * m, pa.int64()),
                "_side": pa.array(np.zeros(m, np.int8), pa.int8()),
            }
        )

    def _supp_tag(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "k": batch.column("s_suppkey").cast(pa.int64()),
                "brand": pa.array([None] * m, pa.string()),
                "cents": pa.array([None] * m, pa.int64()),
                "n": pa.array([None] * m, pa.int64()),
                "nat": batch.column("s_nationkey").cast(pa.int64()),
                "_side": pa.array(np.ones(m, np.int8), pa.int8()),
            }
        )

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_supp_tag, batch_format="pyarrow")

    def _join_suppkey(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 0]
        right = df[df["_side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "nat": pd.Series(dtype="int64"),
                    "brand": pd.Series(dtype="object"),
                    "cents": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        m = left[["k", "brand", "cents", "n"]].merge(
            right[["k", "nat"]], on="k", how="inner"
        )
        out = m.groupby(["nat", "brand"], as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("n", "sum")
        )
        for c in ("nat", "cents", "n"):
            out[c] = out[c].astype("int64")
        return out

    hop2 = partitioned_map_groups(
        hop1.map_batches(_hop1_tag, batch_format="pyarrow").union(supp),
        ["k"],
        _join_suppkey,
        num_partitions=num_partitions,
    )

    # ---- final (nation, brand) reduce + 30-row dimension lookup ---------
    schema = pa.schema(
        [("nat", pa.int64()), ("brand", pa.string()),
         ("cents", pa.int64()), ("n", pa.int64())]
    )

    def _sum(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["nat", "brand"], as_index=False, sort=False).agg(
            cents=("cents", "sum"), n=("n", "sum")
        )
        for c in ("nat", "cents", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, schema=schema, preserve_index=False)

    totals = hash_reduce_small(
        hop2, ["nat", "brand"], _sum, num_partitions=4, combine_fn=_sum
    )

    import pyarrow.parquet as pq

    nt = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    rt = pq.read_table(f"{sf_dir}/region.parquet")
    region_of = dict(
        zip(nt.column("n_nationkey").to_pylist(), nt.column("n_regionkey").to_pylist())
    )
    rname_of = dict(
        zip(rt.column("r_regionkey").to_pylist(), rt.column("r_name").to_pylist())
    )
    # inner-join semantics: a nationkey with no nation row (or a region
    # key with no region row) drops the group, exactly like the oracle's
    # JOIN chain — never a KeyError
    r_names = [
        rname_of.get(region_of.get(int(v)))
        for v in totals.column("nat").to_pylist()
    ]
    keep = pa.array([rn is not None for rn in r_names])
    out = pa.table(
        {
            "r_name": pa.array(r_names, pa.string()),
            "p_brand": totals.column("brand"),
            "revenue_cents": totals.column("cents"),
            "n_items": totals.column("n"),
        }
    ).filter(keep)
    # region x brand re-collapse (several nations share a region)
    df = out.to_pandas().groupby(["r_name", "p_brand"], as_index=False, sort=False).agg(
        revenue_cents=("revenue_cents", "sum"), n_items=("n_items", "sum")
    )
    for c in ("revenue_cents", "n_items"):
        df[c] = df[c].astype("int64")
    return rd.from_pandas(df)
