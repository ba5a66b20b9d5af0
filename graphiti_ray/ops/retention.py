"""Cohort retention over the event stream — the week-k retention
table every growth/behavior pipeline reports: cohort users by their
signup week, then count how many are RETAINED AS PAYING (>= 1
purchase event) in cohort week + k for k = 0..HORIZON. Purchase—not
any-event—activity is the retention definition here because the dense
synthetic stream makes any-event retention saturate at ~100%
(a retention curve that drops nothing pins nothing).

Integer-exact week arithmetic (identical on both engines, no
date_trunc semantics to match): week(ts) = (epoch_us // 86_400_000_000
+ 3) // 7 — Monday-aligned epoch-week number (1970-01-01 was a
Thursday; +3 days shifts the boundary to Monday). Cohort = week of
the user's FIRST signup event; k = week(event) - cohort.

Scale shape: one streaming projection (user, week, is_signup — 3 int
columns), ONE user-bucketed exchange; the per-bucket kernel is
vectorized pandas (per-user min for the anchor, merge, distinct
(user, k) drop_duplicates); buckets emit per-(cohort, k) partial
counts so the final exchange is cohort×horizon-sized. User skew is
bounded by events-per-user, same contract as ops/funnel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.exchange import bounded_group_map
from .io import read_events

RETENTION_HORIZON_W = 3  # weeks 0..3
_US_PER_DAY = 86_400_000_000
_USER_BUCKETS = 256


def _project(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    uid = np.asarray(batch.column("user_id"), np.int64)
    ts_us = np.asarray(
        pc.cast(batch.column("ts"), pa.int64()), np.int64
    )
    week = (ts_us // _US_PER_DAY + 3) // 7
    is_signup = np.asarray(
        pc.equal(batch.column("event_type"), "signup")
    )
    is_purchase = np.asarray(
        pc.equal(batch.column("event_type"), "purchase")
    )
    return pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "week": pa.array(week, pa.int64()),
            "is_signup": pa.array(is_signup, pa.bool_()),
            "is_purchase": pa.array(is_purchase, pa.bool_()),
            "bucket": pa.array(uid % _USER_BUCKETS, pa.int32()),
        }
    )


def _bucket_retention(df: pd.DataFrame) -> pd.DataFrame:
    anchor = (
        df[df["is_signup"]]
        .groupby("user_id", as_index=False)["week"]
        .min()
        .rename(columns={"week": "cohort_week"})
    )
    act = df[df["is_purchase"]].merge(anchor, on="user_id")
    act["week_k"] = act["week"] - act["cohort_week"]
    act = act[
        (act["week_k"] >= 0) & (act["week_k"] <= RETENTION_HORIZON_W)
    ]
    act = act[["user_id", "cohort_week", "week_k"]].drop_duplicates()
    g = (
        act.groupby(["cohort_week", "week_k"], as_index=False)
        .size()
        .rename(columns={"size": "n_active"})
    )
    g["n_active"] = g["n_active"].astype(np.int64)
    return g


def events_retention(sf_dir: str):
    """(cohort_week, week_k, n_active): Monday-aligned epoch-week
    signup cohorts x weekly activity, k = 0..3."""
    ev = read_events(sf_dir, ["user_id", "ts", "event_type"]).map_batches(
        _project, batch_format="pyarrow"
    )
    partial = bounded_group_map(
        ev, "bucket", _bucket_retention, batch_format="pandas"
    )
    return (
        partial.groupby(["cohort_week", "week_k"])
        .sum("n_active")
        .map_batches(
            lambda t: t.rename_columns(
                ["cohort_week", "week_k", "n_active"]
            ),
            batch_format="pyarrow",
        )
    )


EVENTS_RETENTION_SQL = f"""WITH w AS (
  SELECT user_id, event_type,
         ((epoch_us(ts) // {_US_PER_DAY}) + 3) // 7 AS week
  FROM events
),
anchor AS (
  SELECT user_id, MIN(week) AS cohort_week
  FROM w WHERE event_type = 'signup' GROUP BY user_id
),
act AS (
  SELECT DISTINCT w.user_id, a.cohort_week,
         (w.week - a.cohort_week) AS week_k
  FROM w JOIN anchor a ON a.user_id = w.user_id
  WHERE w.event_type = 'purchase'
    AND w.week - a.cohort_week BETWEEN 0 AND {RETENTION_HORIZON_W}
)
SELECT cohort_week::BIGINT AS cohort_week, week_k::BIGINT AS week_k,
       COUNT(*)::BIGINT AS n_active
FROM act GROUP BY cohort_week, week_k"""
