"""Windowed / sessionized operators over the events stream table.

- ``event_windows``: per-user sliding context window — for each event,
  the previous up-to-3 event_ids of the same user in (ts, event_id)
  order. This is the batch re-expression of Graphiti's episode context
  window (EPISODE_WINDOW_LEN=3, graphiti_core/utils/maintenance/
  graph_data_operations.py:26,104-159; bulk variant
  utils/bulk_utils.py:73-88 — SURVEY.md §2.6 T4): partition by the
  session key, order by event time, lag-3.
- ``events_hourly``: tumbling-window aggregate (hour x event_type) with
  in-batch PARTIAL aggregation before the shuffle, so the exchange
  carries one row per (hour, type) per block. Money values are summed
  as integer cents (floor(v*100+0.5) — identical IEEE ops in numpy and
  DuckDB) so the oracle hash-compare is float-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from .io import read_events

WINDOW = 3
HOUR_US = 3_600_000_000



def event_windows(sf_dir: str):
    """(event_id, prev1, prev2, prev3): per-user lag window.

    groupby(user_id).map_groups — user_id is the session/partition key;
    each group is sorted by (ts, event_id) and shifted. At CC scale the
    key is (user_id) hash-partitioned; skewed users would be range-split
    with carry-over of the last WINDOW rows."""
    import ray.data as rd

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(group.column("ts"), pa.int64()))
        ids = np.asarray(group.column("event_id"))
        order = np.lexsort((ids, ts))
        ids = ids[order]
        cols = {"event_id": pa.array(ids, pa.int64())}
        for lag in range(1, WINDOW + 1):
            prev = np.full(len(ids), -1, dtype=np.int64)
            if len(ids) > lag:
                prev[lag:] = ids[:-lag]
            cols[f"prev{lag}"] = pa.array(
                [None if v < 0 else int(v) for v in prev], pa.int64()
            )
        return pa.table(cols)

    ds = read_events(sf_dir, ["event_id", "ts", "user_id"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def events_hourly(sf_dir: str):
    """(hour_epoch_s, event_type, n_events, sum_cents): tumbling hourly
    aggregate, partial-combined per block before the groupby shuffle."""
    from ray.data.aggregate import Sum
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = np.asarray(pc.cast(batch.column("ts"), pa.int64()))
        hour = (ts_us // HOUR_US) * 3600
        cents = np.floor(np.asarray(batch.column("value"), dtype=np.float64) * 100 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "hour_epoch_s": pa.array(hour, pa.int64()),
                "event_type": batch.column("event_type"),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        g = t.group_by(["hour_epoch_s", "event_type"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return g.rename_columns(["hour_epoch_s", "event_type", "n_events", "sum_cents"])

    ds = read_events(sf_dir, ["ts", "event_type", "value"]).map_batches(partial, batch_format="pyarrow", batch_size=None)
    return ds.groupby(["hour_epoch_s", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_cents", alias_name="sum_cents"),
    )


SLIDE_HOURS = 3  # sliding window: 3h span, 1h slide


def events_sliding(sf_dir: str):
    """(window_start_s, event_type, n_events, sum_cents): SLIDING
    3-hour / 1-hour-slide aggregate — the windowed-aggregate shape Ray
    Data has no primitive for. Each event explodes into the
    SLIDE_HOURS windows containing it (vectorized np.repeat/tile), is
    partial-combined per block (group_by window x type inside the
    batch), and ONE small groupby finishes — the shuffle carries
    window-cardinality rows, not events x SLIDE_HOURS."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = np.asarray(pc.cast(batch.column("ts"), pa.int64()))
        hour = (ts_us // HOUR_US) * 3600
        cents = np.floor(
            np.asarray(batch.column("value"), dtype=np.float64) * 100 + 0.5
        ).astype(np.int64)
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        starts = np.concatenate(
            [hour - 3600 * k for k in range(SLIDE_HOURS)]
        )
        ets = pa.concat_arrays([et] * SLIDE_HOURS)
        t = pa.table(
            {
                "window_start_s": pa.array(starts, pa.int64()),
                "event_type": ets,
                "cents": pa.array(np.tile(cents, SLIDE_HOURS), pa.int64()),
            }
        )
        g = t.group_by(["window_start_s", "event_type"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return g.rename_columns(
            ["window_start_s", "event_type", "n_events", "sum_cents"]
        )

    ds = read_events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    return ds.groupby(["window_start_s", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_cents", alias_name="sum_cents"),
    )


SESSION_GAP_S = 1800  # 30-minute inactivity gap


def sessionize(sf_dir: str):
    """(event_id, user_id, session_seq): gap-based sessions — a new
    session starts when >30 min passes between a user's consecutive
    events. session_seq = running count of gap-starts (0-based), the
    batch analog of Graphiti's per-group sequential ingestion sessions
    (server ingest queues, SURVEY.md §2.8 ordering note)."""
    import ray.data as rd

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(group.column("ts"), pa.int64()))
        ids = np.asarray(group.column("event_id"))
        uid = group.column("user_id")[0].as_py()
        order = np.lexsort((ids, ts))
        ts, ids = ts[order], ids[order]
        gaps = np.zeros(len(ids), dtype=np.int64)
        if len(ids) > 1:
            gaps[1:] = ((ts[1:] - ts[:-1]) > SESSION_GAP_S * 1_000_000).astype(np.int64)
        seq = np.cumsum(gaps)
        return pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "user_id": pa.array([uid] * len(ids), pa.int64()),
                "session_seq": pa.array(seq, pa.int64()),
            }
        )

    ds = read_events(sf_dir, ["event_id", "ts", "user_id"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def events_json_extract(sf_dir: str):
    """(event_id, k_val): JSON scalar extraction from the props column —
    the engine's JSON-function surface (SURVEY.md §2.8)."""
    import json

    import ray.data as rd

    def ext(batch: pa.Table) -> pa.Table:
        ks = [
            json.loads(p).get("k") if p else None
            for p in batch.column("props").to_pylist()
        ]
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "k_val": pa.array(ks, pa.int64()),
            }
        )

    return read_events(sf_dir, ["event_id", "props"]).map_batches(ext, batch_format="pyarrow")


QUANTILES = (0.5, 0.9, 0.99)


def events_quantiles(sf_dir: str):
    """(event_type, q_pct, cents_q): EXACT distributed quantiles of the
    event value (in half-up cents) per type — k-th order statistic via
    value histogram, not sampling. Scale shape: map-side (type, cents)
    counts, ONE histogram-cardinality groupby (bounded by the value
    range x type count, corpus-size-independent), then a per-type
    vectorized cumsum walk in map_groups. Index rule pinned to DuckDB
    quantile_disc: sorted[ceil(q*n) - 1] in IEEE double math."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(batch.column("value"), dtype=np.float64) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pa.array(cents, pa.int64()),
                "n": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        )
        g = t.group_by(["event_type", "cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "cents", "n"])

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("cents").reset_index(drop=True)
        cum = df["n"].to_numpy().cumsum()
        ntot = int(cum[-1])
        cents = df["cents"].to_numpy()
        rows = []
        for q in QUANTILES:
            k = math.ceil(q * ntot)  # 1-based rank, duckdb float math
            idx = int(np.searchsorted(cum, k, "left"))
            rows.append((df["event_type"].iat[0], int(q * 100), int(cents[idx])))
        return pd.DataFrame(rows, columns=["event_type", "q_pct", "cents_q"])

    hist = (
        read_events(sf_dir, ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return hist.groupby("event_type").map_groups(per_type, batch_format="pandas")
