"""Event-stream operators: windowed aggregation, as-of join,
sessionization, interval (range) join, rolling windows.

``windowed_event_agg`` is the classic pre-aggregation shape: a per-batch
COMBINER collapses each block to one row per (event_type, window) —
bounded by the key space, not the row count — and the sortless
``hash_reduce_small`` exchange merges the partials (sum/min/max are
associative, so the same merge runs at the tree-combine levels). The
events table crosses the wire as partial aggregates only; nothing is
ever sorted. Key cardinality (event types × time windows) is bounded
and driver-small by construction, which is what makes the materialized
reduce output valid at any input scale.

The temporal operators below (``asof_join_events``, ``sessionize``,
``interval_join_count``, ``rolling_user_agg``) are the custom operators
Ray Data has no native verb for. All four share one partitioning
assumption, stated once: rows are hash-partitioned on ``user_id`` by the
sortless ``partitioned_map_groups`` exchange — ONE all-to-all in which
each row moves exactly once — and every per-key computation happens
inside a partition with vectorized pandas kernels (``merge_asof``,
grouped ``ffill``/``shift``/``rolling``), never a Python loop over rows
or keys. There is no global sort: ordering is established per partition
after the exchange, which is valid because every operator here orders
WITHIN a user's timeline only. All four DROP rows whose ``ts`` is null
(documented contract): a NaT would break the sorted-timeline kernels
(``merge_asof`` raises mid-task) and SQL engines' NULL window ordering
is engine-specific anyway — one bad row must not fail an operator.
At 100 TB the residual assumption is that
one user's history fits a partition's worker heap; the standard
escape-hatch — sub-partition by (user, time-bucket) and stitch
boundary state in a second tiny exchange — composes with the same
primitives but is not needed for web-event-shaped skew (a single user's
events are bounded by human/bot rates, not corpus size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = [
    "windowed_event_agg",
    "asof_join_events",
    "sessionize",
    "interval_join_count",
    "rolling_user_agg",
    "group_quantiles",
    "json_field_stats",
    "group_topk_users",
    "value_histogram",
    "sliding_window_agg",
]


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


def _read_events(events_path: str, columns: list[str], event_types: list[str] | None):
    """Column-pruned, predicate-pushed read: only the named columns leave
    storage, and when ``event_types`` is given the row filter runs inside
    the Parquet fragment scanner (row-group / dictionary pushdown), not as
    a post-read Ray filter stage."""
    import pyarrow.compute as pc

    kwargs = {}
    if event_types is not None:
        kwargs["filter"] = pc.field("event_type").isin(event_types)
    return rd.read_parquet(events_path, columns=columns, **kwargs)


def asof_join_events(
    events_path: str,
    left_type: str = "purchase",
    right_type: str = "click",
    num_partitions: int = 32,
) -> rd.Dataset:
    """As-of join within the events table: each ``left_type`` event is
    joined to the most recent ``right_type`` event of the SAME user with
    ``right.ts <= left.ts`` (prior-or-equal semantics; ties at equal ts
    resolve to the right row, and among right rows at one instant to the
    largest event_id — the deterministic contract the SQL oracle mirrors
    with ``last_value(... IGNORE NULLS)`` over ``ORDER BY ts, is_right
    DESC, event_id``).

    Shape: one hash exchange on user_id, then a per-partition stable sort
    of the user timeline + grouped forward-fill — a merge-asof without a
    global sort. Output: (event_id, user_id, ts, value, prior_ts,
    prior_value); left events with no prior right event carry nulls.
    """
    ds = _read_events(
        events_path,
        ["event_id", "user_id", "ts", "event_type", "value"],
        [left_type, right_type],
    )

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        # contract: rows with null ts are dropped (a NaT would break the
        # sorted-timeline kernels mid-task; see module docstring)
        df = df[df["ts"].notna()]
        if df.empty:
            out = df.reindex(
                columns=["event_id", "user_id", "ts", "value", "prior_ts", "prior_value"]
            )
            out["prior_ts"] = out["ts"]
            out["prior_value"] = out["value"]
            return out
        df = df.assign(_r=df["event_type"].eq(right_type))
        df = df.sort_values(
            ["user_id", "ts", "_r", "event_id"],
            ascending=[True, True, False, True],
            kind="stable",
        ).reset_index(drop=True)
        df["prior_ts"] = df["ts"].where(df["_r"])
        df["prior_value"] = df["value"].where(df["_r"])
        g = df.groupby("user_id", sort=False, dropna=False)
        df["prior_ts"] = g["prior_ts"].ffill()
        df["prior_value"] = g["prior_value"].ffill()
        return df.loc[
            ~df["_r"], ["event_id", "user_id", "ts", "value", "prior_ts", "prior_value"]
        ].reset_index(drop=True)

    from .shuffle import partitioned_map_groups

    return partitioned_map_groups(ds, ["user_id"], _fn, num_partitions=num_partitions)


def sessionize(
    events_path: str,
    gap_minutes: int = 30,
    num_partitions: int = 32,
    bucket_hours: int | None = None,
) -> rd.Dataset:
    """Gap-based sessionization: a user's events ordered by (ts, event_id)
    start a new session whenever the gap to the previous event EXCEEDS
    ``gap_minutes`` (an exactly-``gap``-sized pause keeps the session).
    Emits one row per session: (user_id, session_id, session_start,
    session_end, n_events, min_value, max_value) with session_id numbered
    1..k per user in time order. Aggregates are count/extrema on purpose —
    order-insensitive and float-exact, so the result is bit-stable under
    any partitioning (a float SUM would not be).

    ``bucket_hours`` selects the AT-SCALE escape hatch (the module
    docstring's "sub-partition by (user, time-bucket) and stitch
    boundary state"): rows are hash-partitioned on (user_id, floor(ts)
    time bucket) instead of user_id alone — so ONE user's history no
    longer has to fit a single worker — each sub-partition emits its
    candidate session SEGMENTS, and a second, segments-only exchange on
    user_id merges consecutive segments whose boundary gap is <= gap and
    numbers the final sessions. The merge is exact because (a) a
    bucket's events all precede the next bucket's (floor(ts) is monotone
    in ts), so segment start-order equals event order, and (b) every
    aggregate is mergeable (count sums; extrema take min/max). The
    second exchange carries one row per candidate segment — O(sessions),
    never O(events)."""
    ds = _read_events(events_path, ["event_id", "user_id", "ts", "value"], None)
    gap = pd.Timedelta(minutes=gap_minutes)
    if bucket_hours is not None:
        return _sessionize_bucketed(ds, gap, bucket_hours, num_partitions)

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["ts"].notna()]  # null-ts contract, see module docstring
        if df.empty:
            out = df.reindex(columns=["user_id", "ts", "value"])
            out = out.assign(session_id=pd.Series(dtype="int64"))
            return out.reindex(
                columns=[
                    "user_id", "session_id", "session_start", "session_end",
                    "n_events", "min_value", "max_value",
                ]
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(
            drop=True
        )
        prev = df.groupby("user_id", sort=False, dropna=False)["ts"].shift()
        new_s = prev.isna() | ((df["ts"] - prev) > gap)
        df["session_id"] = new_s.astype("int64").groupby(
            df["user_id"], sort=False, dropna=False
        ).cumsum()
        out = df.groupby(
            ["user_id", "session_id"], as_index=False, sort=False, dropna=False
        ).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    from .shuffle import partitioned_map_groups

    return partitioned_map_groups(ds, ["user_id"], _fn, num_partitions=num_partitions)


def _sessionize_bucketed(
    ds: rd.Dataset,
    gap: pd.Timedelta,
    bucket_hours: int,
    num_partitions: int,
) -> rd.Dataset:
    """(user, time-bucket) sub-partitioned sessionize with boundary-state
    stitching — see ``sessionize(bucket_hours=...)``. Byte-identical to
    the one-exchange path (tests/test_curation.py proves it on a single
    user spanning many buckets)."""
    from .shuffle import partitioned_map_groups

    freq = f"{bucket_hours}h"

    def _add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = df["ts"].dt.floor(freq)
        return df

    _seg_cols = [
        "user_id", "session_start", "session_end",
        "n_events", "min_value", "max_value",
    ]

    def _segments(df: pd.DataFrame) -> pd.DataFrame:
        # candidate sessions WITHIN one (user, bucket) sub-partition —
        # identical kernel to the one-pass path, minus the numbering
        df = df[df["ts"].notna()]
        if df.empty:
            out = df.reindex(columns=["user_id", "ts", "value"])
            return out.reindex(columns=_seg_cols)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(
            drop=True
        )
        grp = ["user_id", "_bucket"]
        prev = df.groupby(grp, sort=False, dropna=False)["ts"].shift()
        new_s = prev.isna() | ((df["ts"] - prev) > gap)
        df["_seg"] = new_s.astype("int64").groupby(
            [df["user_id"], df["_bucket"]], sort=False, dropna=False
        ).cumsum()
        out = df.groupby(
            grp + ["_seg"], as_index=False, sort=False, dropna=False
        ).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[_seg_cols]

    def _stitch(df: pd.DataFrame) -> pd.DataFrame:
        # merge consecutive segments of a user whose boundary gap <= gap;
        # segments from earlier buckets strictly precede later ones, so
        # start-order == event order and the gap test at the seam is the
        # exact one-pass test
        cols = [
            "user_id", "session_id", "session_start", "session_end",
            "n_events", "min_value", "max_value",
        ]
        if df.empty:
            return df.assign(session_id=pd.Series(dtype="int64")).reindex(
                columns=cols
            )
        df = df.sort_values(
            ["user_id", "session_start", "session_end"], kind="stable"
        ).reset_index(drop=True)
        prev_end = df.groupby(
            "user_id", sort=False, dropna=False
        )["session_end"].shift()
        new_s = prev_end.isna() | ((df["session_start"] - prev_end) > gap)
        df["session_id"] = new_s.astype("int64").groupby(
            df["user_id"], sort=False, dropna=False
        ).cumsum()
        out = df.groupby(
            ["user_id", "session_id"], as_index=False, sort=False, dropna=False
        ).agg(
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
            n_events=("n_events", "sum"),
            min_value=("min_value", "min"),
            max_value=("max_value", "max"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[cols]

    segs = partitioned_map_groups(
        ds.map_batches(_add_bucket, batch_format="pandas"),
        ["user_id", "_bucket"],
        _segments,
        num_partitions=num_partitions,
    )
    return partitioned_map_groups(
        segs, ["user_id"], _stitch, num_partitions=num_partitions
    )


def interval_join_count(
    events_path: str,
    left_type: str = "view",
    right_type: str = "click",
    horizon_minutes: int = 10,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Range (interval) join, counted: for every ``left_type`` event,
    the number of ``right_type`` events by the same user inside the
    inclusive window ``[ts, ts + horizon]`` — the M:N temporal join Ray
    Data has no verb for, reduced to two vectorized ``pd.merge_asof``
    passes per partition against a per-user cumulative rank:
    ``n = rank(last right <= ts+h) - rank(last right < ts)``. Rows cross
    the wire once (the user_id exchange); nothing is ever globally
    sorted; no pairwise blow-up is materialized."""
    ds = _read_events(
        events_path,
        ["event_id", "user_id", "ts", "event_type"],
        [left_type, right_type],
    )
    horizon = pd.Timedelta(minutes=horizon_minutes)

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts", "n_followups"]
        # contract: null-ts rows are dropped — a single NaT would violate
        # merge_asof's sorted-key requirement and fail the whole partition
        df = df[df["ts"].notna()]
        if df.empty:
            out = df.reindex(columns=["event_id", "user_id", "ts"])
            return out.assign(n_followups=pd.Series(dtype="int64"))
        left = (
            df.loc[df["event_type"] == left_type, ["event_id", "user_id", "ts"]]
            .sort_values("ts", kind="stable")
            .reset_index(drop=True)
        )
        # JOIN semantics, not PARTITION BY: SQL's ON b.user_id = a.user_id
        # never matches NULL, but pandas merge_asof(by=...) MATCHES NaN
        # groups — a null-user right row must never count, and a null-user
        # left row keeps n_followups = 0 (it stays in the output)
        right = (
            df.loc[
                (df["event_type"] == right_type) & df["user_id"].notna(),
                ["user_id", "ts"],
            ]
            .sort_values("ts", kind="stable")
            .reset_index(drop=True)
        )
        if left.empty:
            return left.assign(n_followups=pd.Series(dtype="int64"))[cols]
        if right.empty:
            return left.assign(n_followups=pd.Series(0, index=left.index, dtype="int64"))[cols]
        # per-user 1-based rank of right events in time order (global ts
        # sort makes each user's subsequence sorted too)
        right = right.assign(
            _k=right.groupby("user_id", sort=False, dropna=False).cumcount() + 1
        )
        right = right.rename(columns={"ts": "_rts"})
        # keep the shifted key in ts's own unit (us-parquet + ns-Timedelta
        # would otherwise promote and break merge_asof's dtype match)
        hi = pd.merge_asof(
            left.assign(_t=(left["ts"] + horizon).astype(left["ts"].dtype)),
            right,
            left_on="_t",
            right_on="_rts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )["_k"].fillna(0).to_numpy()
        lo = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="_rts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )["_k"].fillna(0).to_numpy()
        left["n_followups"] = (hi - lo).astype("int64")
        return left[cols]

    from .shuffle import partitioned_map_groups

    return partitioned_map_groups(ds, ["user_id"], _fn, num_partitions=num_partitions)


def rolling_user_agg(
    events_path: str,
    window: int = 5,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Per-user rolling-window aggregate over the last ``window`` events
    (inclusive of the current one), ordered by (ts, event_id): running
    max of ``value`` and the actual window occupancy. Max/count are
    chosen over mean/sum for the same bit-stability reason as
    ``sessionize`` — they select or count existing values, so the result
    is independent of accumulation order. Output: (event_id, user_id,
    ts, rolling_max, n_in_window)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    ds = _read_events(events_path, ["event_id", "user_id", "ts", "value"], None)

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["ts"].notna()]  # null-ts contract, see module docstring
        if df.empty:
            out = df.reindex(columns=["event_id", "user_id", "ts"])
            return out.assign(
                rolling_max=pd.Series(dtype="float64"),
                n_in_window=pd.Series(dtype="int64"),
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(
            drop=True
        )
        # shift-based running max instead of pandas rolling().max():
        # the rolling cython kernel treats NON-FINITE values as missing,
        # so a window containing +inf would report the largest finite
        # value — SQL's max() OVER w says inf. np.fmax propagates ±inf
        # and skips NaN (null) exactly like the SQL frame max; window is
        # small (default 5), so w-1 group-bounded shifts stay vectorized.
        g = df.groupby("user_id", sort=False, dropna=False)["value"]
        acc = df["value"].to_numpy(dtype="float64", copy=True)
        for k in range(1, window):
            acc = np.fmax(acc, g.shift(k).to_numpy(dtype="float64"))
        df["rolling_max"] = acc
        # occupancy = rows in the window (SQL count(*) OVER w), computed
        # from the per-user row index — NOT rolling .count(), which counts
        # non-NaN values and would diverge on rows with null value
        occ = df.groupby("user_id", sort=False, dropna=False).cumcount() + 1
        df["n_in_window"] = occ.clip(upper=window).astype("int64")
        return df[["event_id", "user_id", "ts", "rolling_max", "n_in_window"]]

    from .shuffle import partitioned_map_groups

    return partitioned_map_groups(ds, ["user_id"], _fn, num_partitions=num_partitions)


def group_quantiles(
    events_path: str,
    num_partitions: int = 8,
    n_buckets: int = 512,
    rescan_cap: int = 1024,
) -> rd.Dataset:
    """EXACT per-group quantiles of ``value`` by event_type: the discrete
    selection contract ``p_q = sorted_values[((n-1) * q_num) // q_den]``
    (0-indexed, integer index arithmetic, NaN/null values ordered last —
    numpy's sort and SQL's ASC NULLS LAST agree) for p50 and p90 — a
    selected element, not an interpolation, so the result is bit-exact
    and SQL-oracle-certifiable.

    Scale shape — TWO-PASS HISTOGRAM SELECTION: no partition (and no
    worker) ever holds a whole group's values.

    1. One combiner pass computes per-group (count, nan count, min, max)
       — partial rows per batch, sortless merge, driver sees one row per
       group.
    2. Bucket passes: each remaining (group, quantile) target holds a
       closed value interval [lo, hi] known to contain its order
       statistic at relative rank r. A scan bins each group's in-interval
       values into ``n_buckets`` fixed buckets (count + min/max per
       bucket; the batch combiner emits at most states x buckets rows),
       the driver locates the bucket holding rank r and narrows the
       interval to that bucket's ACTUAL [min, max] (binning is monotone
       in v, so a bucket is a contiguous value interval and equal values
       share a bucket — the narrowed interval contains exactly the
       bucket's values). A bucket whose min == max resolves immediately
       (the degenerate heavy-tie case). Each pass divides the candidate
       count by ~n_buckets for non-degenerate data.
    3. Once a target's candidate count is <= ``rescan_cap``, one filtered
       collect pass gathers just those values to the driver (bounded by
       cap x targets), which sorts and selects index r.

    Candidate intervals are driver-tiny (2 floats per group x quantile)
    and ship in the task closure — with unbounded group cardinality they
    would go through ``ray.put`` instead. Scan count is
    1 + levels + 1 with levels = ceil(log_buckets(n_group / cap)),
    i.e. 1 bucket pass covers groups up to cap * n_buckets ~ 0.5M values
    and 2 passes up to ~270M at the defaults.

    Output: (event_type, n, p50, p90) — n counts ALL rows of the group
    (null values included, mirroring the oracle's count(*) OVER).

    ±inf values are exact: pass 1 counts them per group and keeps
    vmin/vmax FINITE (an interval containing an infinity has infinite
    bucket width), the driver answers ranks landing in the -inf prefix /
    +inf suffix from the counts alone, and the finite-interval passes
    exclude infs by construction (lo/hi are finite bounds). Sort order
    matches numpy/SQL: -inf < finite < +inf < NaN-or-NULL.
    """
    import numpy as np

    from .shuffle import hash_reduce_small

    _QUANTS = (("p50", 1, 2), ("p90", 9, 10))

    # ---- pass 1: per-group n / n_nan / min / max --------------------
    _mm_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("n_num", pa.int64()),
            ("n_neg", pa.int64()),
            ("n_pos", pa.int64()),
            ("vmin", pa.float64()),
            ("vmax", pa.float64()),
        ]
    )

    def _mm_partial(df: pd.DataFrame) -> pa.Table:
        # ±inf are counted separately and vmin/vmax cover FINITE values
        # only: a histogram interval containing an infinity has infinite
        # width, so (v - lo) / w would mint NaN bins. Sorted non-NaN
        # order is [-inf×n_neg, finite..., +inf×n_pos]; the driver
        # resolves inf-landing ranks directly from the counts.
        v = df["value"].to_numpy()
        df = df[["event_type", "value"]].copy(deep=False)
        df["_neg"] = (v == -np.inf).astype("int64")
        df["_pos"] = (v == np.inf).astype("int64")
        df["_fin"] = np.where(np.isfinite(v), v, np.nan)
        g = df.groupby("event_type", sort=False, dropna=False, as_index=False).agg(
            n=("value", "size"),
            n_num=("value", "count"),  # non-NaN (infs included)
            n_neg=("_neg", "sum"),
            n_pos=("_pos", "sum"),
            vmin=("_fin", "min"),
            vmax=("_fin", "max"),
        )
        for c in ("n", "n_num", "n_neg", "n_pos"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, schema=_mm_schema, preserve_index=False)

    def _mm_merge(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(
            "event_type", sort=False, dropna=False, as_index=False
        ).agg(n=("n", "sum"), n_num=("n_num", "sum"), n_neg=("n_neg", "sum"),
              n_pos=("n_pos", "sum"), vmin=("vmin", "min"), vmax=("vmax", "max"))
        for c in ("n", "n_num", "n_neg", "n_pos"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, schema=_mm_schema, preserve_index=False)

    stats = hash_reduce_small(
        rd.read_parquet(events_path, columns=["event_type", "value"]).map_batches(
            _mm_partial, batch_format="pandas"
        ),
        ["event_type"],
        _mm_merge,
        num_partitions=num_partitions,
        combine_fn=_mm_merge,
    ).to_pandas()

    # driver state: one entry per (group, quantile) still being located
    results: dict = {}  # event_type -> {"n": int, "p50": float|None, ...}
    states: dict = {}  # sid -> {et, q, lo, hi, c, r}
    sid = 0
    for row in stats.itertuples(index=False):
        et, n, n_num = row.event_type, int(row.n), int(row.n_num)
        n_neg, n_pos = int(row.n_neg), int(row.n_pos)
        n_fin = n_num - n_neg - n_pos
        res = results.setdefault(et, {"n": n})
        for q, num, den in _QUANTS:
            k = ((n - 1) * num) // den
            if k >= n_num:  # order statistic lands in the NaN tail
                res[q] = None
            elif k < n_neg:  # rank inside the -inf prefix
                res[q] = float("-inf")
            elif k >= n_neg + n_fin:  # rank inside the +inf suffix
                res[q] = float("inf")
            elif row.vmin == row.vmax:  # all finite values equal
                res[q] = float(row.vmin)
            else:
                states[sid] = {
                    "et": et, "q": q,
                    "lo": float(row.vmin), "hi": float(row.vmax),
                    "c": n_fin, "r": k - n_neg,
                }
                sid += 1

    # ---- pass 2..L: histogram refinement ----------------------------
    _bk_schema = pa.schema(
        [
            ("sid", pa.int64()),
            ("bin", pa.int64()),
            ("c", pa.int64()),
            ("bmin", pa.float64()),
            ("bmax", pa.float64()),
        ]
    )

    def _bucket_pass(pending: dict) -> pd.DataFrame:
        specs = [
            (s, st["et"], st["lo"], st["hi"]) for s, st in pending.items()
        ]

        def _partial(df: pd.DataFrame) -> pa.Table:
            parts = []
            v_all = df["value"].to_numpy()
            et_all = df["event_type"].to_numpy()
            for s, et, lo, hi in specs:
                m = (et_all == et) & (v_all >= lo) & (v_all <= hi)
                vv = v_all[m]
                if not len(vv):
                    continue
                w = (hi - lo) / n_buckets
                bins = np.clip(
                    np.floor((vv - lo) / w), 0, n_buckets - 1
                ).astype("int64")
                p = pd.DataFrame({"bin": bins, "v": vv})
                g = p.groupby("bin", sort=False, as_index=False).agg(
                    c=("v", "size"), bmin=("v", "min"), bmax=("v", "max")
                )
                g.insert(0, "sid", s)
                parts.append(g)
            if not parts:
                return _bk_schema.empty_table()
            out = pd.concat(parts, ignore_index=True)
            for c in ("sid", "bin", "c"):
                out[c] = out[c].astype("int64")
            return pa.Table.from_pandas(out, schema=_bk_schema, preserve_index=False)

        def _merge(t: pa.Table) -> pa.Table:
            g = t.to_pandas().groupby(
                ["sid", "bin"], sort=False, as_index=False
            ).agg(c=("c", "sum"), bmin=("bmin", "min"), bmax=("bmax", "max"))
            for c in ("sid", "bin", "c"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, schema=_bk_schema, preserve_index=False)

        return hash_reduce_small(
            rd.read_parquet(
                events_path, columns=["event_type", "value"]
            ).map_batches(_partial, batch_format="pandas"),
            ["sid"],
            _merge,
            num_partitions=num_partitions,
            combine_fn=_merge,
        ).to_pandas()

    level = 0
    while True:
        # an interval so narrow that (hi - lo) / n_buckets underflows to 0
        # cannot be histogram-split (ulp-adjacent values under heavy ties);
        # it holds <= ~n_buckets distinct doubles, so the count-based
        # gather below resolves it exactly — mark it force-collected
        for st in states.values():
            if st["c"] > rescan_cap and (st["hi"] - st["lo"]) / n_buckets == 0.0:
                st["force"] = True
        pending = {
            s: st
            for s, st in states.items()
            if st["c"] > rescan_cap and not st.get("force")
        }
        if not pending:
            break
        level += 1
        if level > 64:  # float64 ranges split long before 64 levels
            raise RuntimeError("group_quantiles failed to converge")
        bk = _bucket_pass(pending)
        for s, st in pending.items():
            rows = bk[bk["sid"] == s].sort_values("bin")
            cum = 0
            for b, c, bmin, bmax in zip(rows["bin"], rows["c"], rows["bmin"],
                                        rows["bmax"]):
                if st["r"] < cum + c:
                    st["r"] -= cum
                    st["c"] = int(c)
                    st["lo"], st["hi"] = float(bmin), float(bmax)
                    if bmin == bmax:  # heavy-tie bucket: resolved exactly
                        results[st["et"]][st["q"]] = float(bmin)
                        st["c"] = 0  # mark done (drops from pending/collect)
                    break
                cum += int(c)
            else:  # pragma: no cover - counts must cover rank r
                raise RuntimeError("group_quantiles rank fell outside buckets")

    # ---- pass L+1: bounded rescan of the located intervals ----------
    # COUNT-BASED gather: each batch emits distinct (sid, value, count)
    # partials, never raw rows — the driver payload is bounded by the
    # interval's DISTINCT values (<= rescan_cap normally; <= ~n_buckets
    # doubles for a force-collected underflow interval) even when one
    # value is duplicated millions of times
    collect = {s: st for s, st in states.items() if st["c"] > 0}
    if collect:
        specs = [(s, st["et"], st["lo"], st["hi"]) for s, st in collect.items()]

        def _gather(df: pd.DataFrame) -> pa.Table:
            v_all = df["value"].to_numpy()
            et_all = df["event_type"].to_numpy()
            sids, vals, cnts = [], [], []
            for s, et, lo, hi in specs:
                m = (et_all == et) & (v_all >= lo) & (v_all <= hi)
                uniq, cc = np.unique(v_all[m], return_counts=True)
                sids.append(np.full(len(uniq), s, dtype="int64"))
                vals.append(uniq)
                cnts.append(cc)
            if not sids:
                sids, vals, cnts = (
                    [np.empty(0, "int64")], [np.empty(0)], [np.empty(0, "int64")]
                )
            return pa.table(
                {
                    "sid": pa.array(np.concatenate(sids), pa.int64()),
                    "v": pa.array(
                        np.concatenate(vals).astype("float64"), pa.float64()
                    ),
                    "c": pa.array(
                        np.concatenate(cnts).astype("int64"), pa.int64()
                    ),
                }
            )

        got = (
            rd.read_parquet(events_path, columns=["event_type", "value"])
            .map_batches(_gather, batch_format="pandas")
            .to_pandas()
            .groupby(["sid", "v"], as_index=False, sort=False)["c"]
            .sum()
        )
        for s, st in collect.items():
            g = got[got["sid"] == s].sort_values("v")
            counts = g["c"].to_numpy()
            if int(counts.sum()) != st["c"]:  # pragma: no cover
                raise RuntimeError("group_quantiles rescan count mismatch")
            pos = int(np.searchsorted(np.cumsum(counts), st["r"] + 1))
            results[st["et"]][st["q"]] = float(g["v"].to_numpy()[pos])

    out = pd.DataFrame(
        [
            (et, res["n"], res.get("p50"), res.get("p90"))
            for et, res in results.items()
        ],
        columns=["event_type", "n", "p50", "p90"],
    )
    out["n"] = out["n"].astype("int64")
    out["p50"] = out["p50"].astype("float64")
    out["p90"] = out["p90"].astype("float64")
    return rd.from_arrow(
        pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n", pa.int64()),
                    ("p50", pa.float64()),
                    ("p90", pa.float64()),
                ]
            ),
            preserve_index=False,
        )
    )


def json_field_stats(
    events_path: str,
    field: str = "k",
    num_partitions: int = 4,
) -> rd.Dataset:
    """Semi-structured column handling: parse the ``props`` JSON column,
    extract integer field ``field``, and aggregate per event_type —
    (event_type, n, min_k, max_k, n_distinct_k). Rows whose props is
    null, unparseable, or missing the field are excluded (SQL
    ``json_extract IS NOT NULL`` semantics).

    Scale shape: the per-batch COMBINER collapses each block to distinct
    (event_type, k, count) triples — bounded by type × field cardinality,
    not row count — and the sortless ``hash_reduce_small`` exchange merges
    partials; count/min/max/distinct are all exact integers, so the
    result is bit-stable and SQL-certifiable. The raw JSON strings never
    leave their block. Parsing uses the C parser (orjson) when present,
    stdlib ``json`` otherwise — both yield identical dict/int values for
    the integer-field contract, so the result is parser-independent.
    """
    try:  # C JSON parser if available; semantics identical for this use
        import orjson as _json
    except ImportError:  # pragma: no cover - environment-dependent
        import json as _json

    from .shuffle import hash_reduce_small

    schema = pa.schema(
        [("event_type", pa.string()), ("k", pa.int64()), ("c", pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        types = batch.column("event_type").to_pylist()
        for et, p in zip(types, batch.column("props").to_pylist()):
            if p is None:
                continue
            try:
                v = _json.loads(p).get(field)
            except (ValueError, AttributeError):
                continue
            if isinstance(v, bool) or not isinstance(v, int):
                continue
            counts[(et, v)] += 1
        keys = list(counts.keys())
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in keys], pa.string()),
                "k": pa.array([k[1] for k in keys], pa.int64()),
                "c": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    def _combine(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["event_type", "k"], as_index=False, sort=False,
                     dropna=False)["c"]
            .sum()
        )
        return pa.Table.from_pandas(df, schema=schema, preserve_index=False)

    def _reduce(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["event_type", "k"], as_index=False, sort=False,
                     dropna=False)["c"]
            .sum()
        )
        out = df.groupby("event_type", as_index=False, sort=False,
                         dropna=False).agg(
            n=("c", "sum"),
            min_k=("k", "min"),
            max_k=("k", "max"),
            n_distinct_k=("k", "size"),
        )
        for col in ("n", "min_k", "max_k", "n_distinct_k"):
            out[col] = out[col].astype("int64")
        # explicit schema: an empty partition would otherwise infer
        # event_type: null and poison the driver-side concat
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n", pa.int64()),
                    ("min_k", pa.int64()),
                    ("max_k", pa.int64()),
                    ("n_distinct_k", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    partials = rd.read_parquet(
        events_path, columns=["event_type", "props"]
    ).map_batches(_partial, batch_format="pyarrow")
    out = hash_reduce_small(
        partials,
        ["event_type"],
        _reduce,
        num_partitions=num_partitions,
        combine_fn=_combine,
    )
    return rd.from_arrow(out)


def group_topk_users(
    events_path: str,
    k: int = 5,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Heavy hitters per group: the top-``k`` users by event count within
    each event_type, ranked (count desc, user_id asc — fully
    deterministic, so SQL-certifiable).

    Scale shape: per-batch combiner emits (event_type, user_id, partial
    count) — bounded by the batch's distinct pairs — then ONE exchange
    keyed by event_type sums the partials and keeps k rows per group.
    The exchange payload is distinct (type, user) pairs, never raw
    events; the k-row-per-group result is small by construction. (With
    billions of distinct users per type, the refinement is a first
    exchange keyed (type, user) to finish the counts, then a local
    top-k + tiny per-type merge — same primitives, one more hop.)
    """
    from .shuffle import partitioned_map_groups

    def _partial(batch: pa.Table) -> pa.Table:
        from .shuffle import group_by_nullsafe

        t = group_by_nullsafe(
            batch, ["event_type", "user_id"], [("event_id", "count")]
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "user_id": t.column("user_id"),
                "c": t.column("event_id_count").cast(pa.int64()),
            }
        )

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "user_id": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "rank": pd.Series(dtype="int64"),
                }
            )
        g = df.groupby(
            ["event_type", "user_id"], as_index=False, sort=False, dropna=False
        )["c"].sum()
        g = g.sort_values(
            ["event_type", "c", "user_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        g["rank"] = g.groupby("event_type", sort=False, dropna=False).cumcount() + 1
        g = g[g["rank"] <= k].rename(columns={"c": "n_events"})
        g["n_events"] = g["n_events"].astype("int64")
        g["rank"] = g["rank"].astype("int64")
        return g.reset_index(drop=True)

    partials = rd.read_parquet(
        events_path, columns=["event_type", "user_id", "event_id"]
    ).map_batches(_partial, batch_format="pyarrow")
    return partitioned_map_groups(
        partials, ["event_type"], _fn, num_partitions=num_partitions
    )


def value_histogram(
    events_path: str,
    lo: float = 0.0,
    hi: float = 200.0,
    n_bins: int = 20,
    num_partitions: int = 4,
) -> rd.Dataset:
    """Distributed fixed-bin histogram of ``value`` per event_type:
    (event_type, bin, bin_lo, n) with ``bin = floor((value - lo) /
    width)`` clamped into [0, n_bins-1] (under/overflow land in the edge
    bins — SQL ``least/greatest`` mirror). Bin edges are derived from
    (lo, hi, n_bins) by the same double arithmetic on both sides, and
    counts are integers, so the result is bit-stable.

    The classic combiner: each batch collapses to at most types×bins
    partial rows; the sortless exchange sums them. Raw values never
    cross the wire. Fully Arrow-native — the batch never converts to
    pandas. Null/NaN values carry no bin (they are dropped before
    binning, mirroring the oracle's ``WHERE value IS NOT NULL``;
    unmasked, np.floor(NaN).astype(int64) would mint a garbage bin)."""
    import numpy as np

    from .shuffle import group_by_nullsafe, hash_reduce_small

    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    width = (hi - lo) / n_bins
    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bin", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v)
        if not keep.all():
            batch = batch.filter(pa.array(keep))
            v = v[keep]
        bins = np.clip(np.floor((v - lo) / width), 0, n_bins - 1).astype("int64")
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "bin": pa.array(bins, pa.int64()),
            }
        )
        g = group_by_nullsafe(t, ["event_type", "bin"], [([], "count_all")])
        return g.rename_columns(["event_type", "bin", "n"]).cast(schema)

    def _merge(t: pa.Table) -> pa.Table:
        g = group_by_nullsafe(t, ["event_type", "bin"], [("n", "sum")])
        return g.rename_columns(["event_type", "bin", "n"]).cast(schema)

    partials = rd.read_parquet(
        events_path, columns=["event_type", "value"]
    ).map_batches(_partial, batch_format="pyarrow")
    # keys are disjoint across partitions, so the reduce output is
    # already fully merged per (event_type, bin)
    out = hash_reduce_small(
        partials,
        ["event_type", "bin"],
        _merge,
        num_partitions=num_partitions,
        combine_fn=_merge,
    )
    out = out.append_column(
        "bin_lo",
        pa.array(
            (lo + out.column("bin").to_numpy(zero_copy_only=False) * width),
            pa.float64(),
        ),
    )
    return rd.from_arrow(out)


def sliding_window_agg(
    events_path: str,
    window_minutes: int = 60,
    slide_minutes: int = 15,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Sliding (hopping) window aggregate: count and value extrema per
    event_type per ``window_minutes`` window sliding every
    ``slide_minutes`` (window must be a multiple of slide). An event at
    ``ts`` belongs to exactly ``window/slide`` windows — the combiner
    EXPLODES each batch by that constant factor into (type, window_start)
    partials, then the sortless reduce merges them; the explode happens
    on already-collapsed per-batch groups, so the exchange carries
    ≤ F × types × buckets rows per batch, never F × events. Aggregates
    are count/extrema (order-free, bit-stable). Window starts are
    epoch-aligned buckets (pandas ``dt.floor`` == DuckDB
    ``time_bucket``)."""
    from .shuffle import hash_reduce_small

    if window_minutes % slide_minutes:
        raise ValueError("window_minutes must be a multiple of slide_minutes")
    factor = window_minutes // slide_minutes
    slide = pd.Timedelta(minutes=slide_minutes)
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
        df["_b"] = df["ts"].dt.floor(f"{slide_minutes}min")
        # dropna=False: a null-ts event keeps its NULL window group —
        # SQL time_bucket(NULL) - i*slide is NULL for every i, so the
        # oracle carries one NULL-window row per event_type (at 4x the
        # event count, matching the explode below: NaT - i*slide = NaT)
        g = df.groupby(
            ["event_type", "_b"], sort=False, as_index=False, dropna=False
        ).agg(
            n=("value", "size"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        parts = []
        for i in range(factor):  # explode AFTER collapsing to buckets
            p = g.copy(deep=False)
            p["window_start"] = p["_b"] - i * slide
            parts.append(p.drop(columns=["_b"]))
        out = pd.concat(parts, ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(
            out[["event_type", "window_start", "n", "min_value", "max_value"]],
            schema=schema,
            preserve_index=False,
        )

    def _merge(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby(["event_type", "window_start"], sort=False,
                     as_index=False, dropna=False)
            .agg(n=("n", "sum"), min_value=("min_value", "min"),
                 max_value=("max_value", "max"))
        )
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, schema=schema, preserve_index=False)

    partials = rd.read_parquet(
        events_path, columns=["event_type", "ts", "value"]
    ).map_batches(_partial, batch_format="pandas")
    return rd.from_arrow(
        hash_reduce_small(
            partials,
            ["event_type", "window_start"],
            _merge,
            num_partitions=num_partitions,
            combine_fn=_merge,
        )
    )
