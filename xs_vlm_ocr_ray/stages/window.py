"""Ordered-stream / window operators (SURVEY.md §2.10 + the custom-
operator family: windowed aggregate, sessionization, lag-based dedup).

The reference's only streaming-state operator is the clipboard
monitor's consecutive-duplicate drop (D2,
src/managers/ClipboardManager.cpp:78-95) — a last-value compare over an
ordered stream. Generalized here to corpus scale together with the two
standard event-stream companions (tumbling windows, gap sessions), each
built from Ray Data primitives with an explicit partitioning story:

- ``tumbling_window_agg``: stateless — the window key is a pure row
  function, so it's a partial per-batch reduce + tiny groupby (no
  ordered state at all);
- ``sessionize``: grouped by a COARSE user-hash prefix (``user mod
  4096``), with the exact per-user session logic fully vectorized in
  pandas inside each coarse group — the shuffle key count is bounded by
  the bucket constant, not by user cardinality (Ray's ``map_groups``
  pays per-group Python overhead; millions of tiny per-user groups is
  the known cliff). State never crosses a user boundary because a
  user's rows always share a bucket;
- ``drop_consecutive``: the one TRUE ordered-stream op. Exact
  distributed plan: bucket rows by coarse time range →
  ``groupby(bucket)`` resolves all within-bucket adjacencies → the
  only unresolved comparisons are each bucket's FIRST row vs the
  previous non-empty bucket's LAST row — one row per bucket, stitched
  driver-side (boundary set is tiny by construction).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


# --- tumbling window aggregate ------------------------------------------


def tumbling_window_agg(
    events: rd.Dataset,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> pd.DataFrame:
    """Per (day, key): count + value sum/min/max. Partial per-batch
    reduce → small groupby (one row per window×key per batch crosses
    the shuffle)."""

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t[ts_col], unit="day")
        t2 = pa.table(
            {"window": day, key_col: t[key_col], value_col: t[value_col]}
        )
        g = t2.group_by(["window", key_col]).aggregate(
            [
                (value_col, "count"),
                (value_col, "sum"),
                (value_col, "min"),
                (value_col, "max"),
            ]
        )
        return g.rename_columns(["window", key_col, "n_part", "sum_part", "min_part", "max_part"])

    partials = events.map_batches(partial, batch_format="pyarrow")
    out = (
        partials.groupby(["window", key_col])
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("sum_part", alias_name="sum_value"),
            Min("min_part", alias_name="min_value"),
            Max("max_part", alias_name="max_value"),
        )
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["window", key_col]).reset_index(drop=True)


# --- gap-based sessionization -------------------------------------------


def sessionize(
    events: rd.Dataset,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> pd.DataFrame:
    """Per-user gap sessions: a new session starts when the time since
    the previous event of the SAME user exceeds ``gap_seconds``.

    Returns one row per session: (user_id, session_id, n_events,
    session_start, session_end). session_id numbers sessions per user in
    time order starting at 0 — deterministic via the total sort key
    (ts, event_id).

    Shuffle key = coarse user-hash bucket (≤ ``buckets`` groups total);
    the per-user gap logic inside each bucket is a single vectorized
    pandas pass (sort + grouped diff + cumsum), no per-user Python
    loop."""
    buckets = 4096

    def add_bucket(t: pa.Table) -> pa.Table:
        if pa.types.is_integer(t[user_col].type):
            b = pc.cast(
                pc.bit_wise_and(
                    pc.cast(t[user_col], pa.int64()), pa.scalar(buckets - 1, pa.int64())
                ),
                pa.int32(),
            )
        else:
            # non-numeric keys: deterministic vectorized hash (stable
            # across processes for a fixed pandas version — the cluster
            # runs one env). Bucketing only needs same-user→same-bucket.
            import pandas as _pd

            h = _pd.util.hash_pandas_object(
                t[user_col].to_pandas(), index=False, hash_key="0123456789123456"
            )
            b = pa.array((h.to_numpy() % buckets).astype("int32"))
        return t.append_column("_bucket", b)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col, id_col], kind="mergesort")
        gaps = df.groupby(user_col, sort=False)[ts_col].diff().dt.total_seconds()
        new_session = (gaps > gap_seconds).fillna(False)
        sid = new_session.groupby(df[user_col], sort=False).cumsum().astype("int64")
        g = df.groupby([df[user_col], sid], sort=False)
        out = g.agg(
            n_events=(id_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        )
        out.index.names = [user_col, "session_id"]
        return out.reset_index()

    out = (
        events.select_columns([user_col, ts_col, id_col])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values([user_col, "session_id"]).reset_index(drop=True)


# --- consecutive-duplicate drop (D2 at scale) ---------------------------


def drop_consecutive(
    events: rd.Dataset,
    value_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket: str = "day",
) -> pd.DataFrame:
    """Keep each row unless its ``value_col`` equals the immediately
    preceding row's (global (ts, id) order) — the reference's
    last-value clipboard dedup (D2) over a corpus.

    Exact two-level plan: within-bucket adjacency resolved by
    ``groupby(time bucket)``; cross-bucket adjacency involves only each
    bucket's first row vs the previous bucket's last row — a
    one-row-per-bucket stitch done driver-side."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], kind="mergesort")
        prev = df[value_col].shift()
        keep = df[value_col].ne(prev)
        keep.iloc[0] = True  # provisional: fixed by the boundary stitch
        out = df[keep].copy()
        # carry bucket boundary info for the stitch
        out["_first_id"] = df[id_col].iloc[0]
        out["_last_value"] = df[value_col].iloc[-1]
        out["_bucket"] = df["_bucket"].iloc[0]
        return out

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pc.floor_temporal(t[ts_col], unit=bucket))

    bucketed = events.select_columns([id_col, ts_col, value_col]).map_batches(
        add_bucket, batch_format="pyarrow"
    )
    kept = (
        bucketed.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
    ).to_pandas()
    if kept.empty:
        return kept
    # boundary stitch: for each bucket (ordered), drop its first kept row
    # iff its value equals the previous bucket's last value
    info = (
        kept.groupby("_bucket")
        .agg(first_id=("_first_id", "first"), last_value=("_last_value", "first"))
        .sort_index()
    )
    drop_ids = []
    prev_last = None
    first_rows = kept.set_index(id_col)
    for b, row in info.iterrows():
        fid = row["first_id"]
        if prev_last is not None and fid in first_rows.index:
            if first_rows.loc[fid, value_col] == prev_last:
                drop_ids.append(fid)
        prev_last = row["last_value"]
    out = kept[~kept[id_col].isin(drop_ids)]
    return (
        out[[id_col, ts_col, value_col]]
        .sort_values([ts_col, id_col], kind="mergesort")
        .reset_index(drop=True)
    )
