"""Distributed as-of join — the canonical timeseries operator Ray Data
has no primitive for (task brief names it explicitly; reference analog:
the point-in-time episode lookup `retrieve_episodes`,
graphiti_core/graphiti.py:230-252, which is an as-of probe per key).

Semantics (attribution shape): for every `purchase` event, the same
user's latest `view` event with view.ts <= purchase.ts, plus the gap in
microseconds; purchases with no prior view keep nulls (left as-of).

Scale shape: ONE hash-bucket exchange on user_id (64 buckets — the key
subdivides, so skew spreads); each bucket reducer does one global sort
per side and ONE vectorized `pd.merge_asof(by=user_id)` — no per-user
group iteration (the ~1-2 ms/group pandas tax). Right side is deduped
to max event_id per (user_id, ts) so tie-breaks are deterministic and
the DuckDB `ASOF LEFT JOIN` oracle matches exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .io import read_events

N_BUCKETS = 64
LEFT_TYPE, RIGHT_TYPE = "purchase", "view"


def _tag_buckets(batch: pa.Table) -> pa.Table:
    keep = pc.is_in(
        batch.column("event_type"),
        value_set=pa.array([LEFT_TYPE, RIGHT_TYPE]),
    )
    t = batch.filter(keep).select(["event_id", "ts", "user_id", "event_type"])
    bucket = pc.cast(
        pc.bit_wise_and(t.column("user_id"), N_BUCKETS - 1), pa.int32()
    )
    return t.append_column("bucket", bucket)


def _asof_bucket(df: pd.DataFrame) -> pd.DataFrame:
    left = df[df["event_type"] == LEFT_TYPE].sort_values(["ts", "event_id"])
    right = (
        df[df["event_type"] == RIGHT_TYPE]
        .sort_values(["ts", "event_id"])
        .drop_duplicates(["user_id", "ts"], keep="last")  # max event_id tie-break
    )
    out = pd.merge_asof(
        left[["event_id", "user_id", "ts"]],
        right[["event_id", "user_id", "ts"]].rename(
            columns={"event_id": "view_event_id", "ts": "view_ts"}
        ),
        left_on="ts",
        right_on="view_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    gap = (out["ts"] - out["view_ts"]).dt.total_seconds() * 1_000_000
    # unmatched rows: -1 sentinels for the int columns (keeps the
    # driver's value-hash over plain int64, no nullable-int ambiguity)
    out["gap_us"] = gap.round().fillna(-1).astype("int64")
    out["view_event_id"] = out["view_event_id"].fillna(-1).astype("int64")
    return out[["event_id", "user_id", "ts", "view_event_id", "view_ts", "gap_us"]]


def events_asof_join(sf_dir: str):
    """(event_id, user_id, ts, view_event_id, view_ts, gap_us): each
    purchase joined as-of to the user's latest prior-or-equal view."""
    ev = read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    return (
        ev.map_batches(_tag_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_asof_bucket, batch_format="pandas")
    )


EVENTS_ASOF_SQL = f"""WITH v AS (
  SELECT user_id, ts, max(event_id) AS event_id
  FROM events WHERE event_type = '{RIGHT_TYPE}' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts,
       CAST(COALESCE(v.event_id, -1) AS BIGINT) AS view_event_id,
       v.ts AS view_ts,
       CAST(COALESCE(epoch_us(p.ts) - epoch_us(v.ts), -1) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = '{LEFT_TYPE}') p
ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


# -------------------------------------------------------- range join

RANGE_US = 3_600_000_000  # 1-hour lookback interval


def _range_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized interval self-join for one user bucket: ONE global
    sort + per-user-segment np.searchsorted — no per-user pandas
    group iteration."""
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
    uid = df["user_id"].to_numpy()
    bounds = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1], True])
    n_prev = np.empty(len(df), dtype=np.int64)
    for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
        seg = ts[s:e]
        lo = np.searchsorted(seg, seg - RANGE_US, "left")
        hi = np.searchsorted(seg, seg, "left")  # excludes ties/self
        n_prev[s:e] = hi - lo
    return pd.DataFrame(
        {"event_id": df["event_id"], "user_id": df["user_id"], "n_prev_1h": n_prev}
    )


def events_range_join(sf_dir: str):
    """(event_id, user_id, n_prev_1h): for every event, how many of the
    same user's events fall in [ts - 1h, ts) — a distributed interval
    (range) self-join, the third custom operator Ray Data lacks a
    primitive for (as-of join and windowed aggregate are its siblings
    here). Scale shape: ONE hash-bucket exchange on user_id; each
    bucket reducer is one sort + vectorized searchsorted per user
    segment. DuckDB mirrors it with an inequality-predicate join
    (IEJoin)."""
    ev = read_events(sf_dir, ["event_id", "ts", "user_id"])

    def tag(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), N_BUCKETS - 1), pa.int32()
        )
        return batch.append_column("bucket", bucket)

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_range_bucket, batch_format="pandas")
    )


EVENTS_RANGE_SQL = """
SELECT a.event_id, a.user_id,
       CAST(count(b.event_id) AS BIGINT) AS n_prev_1h
FROM events a LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
GROUP BY a.event_id, a.user_id
"""
