"""Windowed event aggregation (time-bucketed group stats).

The classic pre-aggregation shape: a per-batch COMBINER collapses each
block to one row per (event_type, window) — bounded by the key space,
not the row count — and the sortless ``hash_reduce_small`` exchange
merges the partials (sum/min/max are associative, so the same merge
runs at the tree-combine levels). The events table crosses the wire as
partial aggregates only; nothing is ever sorted. Key cardinality
(event types × time windows) is bounded and driver-small by
construction, which is what makes the materialized reduce output valid
at any input scale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["windowed_event_agg"]


def windowed_event_agg(events_path: str, freq: str = "h") -> rd.Dataset:
    """(event_type, window_start, n, min_value, max_value): count and
    value extrema per event type per time window (default hourly)."""
    from .shuffle import hash_reduce_small

    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("window_start", pa.timestamp("ns")),
            ("n", pa.int64()),
            ("min_value", pa.float64()),
            ("max_value", pa.float64()),
        ]
    )

    def _partial(df: pd.DataFrame) -> pa.Table:
        df = df.copy(deep=False)
        df["window_start"] = df["ts"].dt.floor(freq)
        g = df.groupby(
            ["event_type", "window_start"], sort=False, as_index=False, dropna=False
        ).agg(
            n=("value", "size"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        g["n"] = g["n"].astype("int64")
        # explicit schema: an all-null group column in one block would
        # otherwise degrade to null type and break the reduce concat
        return pa.Table.from_pandas(g, schema=schema, preserve_index=False)

    def _merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(
            ["event_type", "window_start"], sort=False, as_index=False, dropna=False
        ).agg(
            n=("n", "sum"),
            min_value=("min_value", "min"),
            max_value=("max_value", "max"),
        )
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, schema=schema, preserve_index=False)

    partials = rd.read_parquet(
        events_path, columns=["event_type", "ts", "value"]
    ).map_batches(_partial, batch_format="pandas")
    out = hash_reduce_small(
        partials,
        ["event_type", "window_start"],
        _merge,
        num_partitions=8,
        combine_fn=_merge,
    )
    return rd.from_arrow(out)
