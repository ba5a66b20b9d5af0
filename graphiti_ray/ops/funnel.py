"""Funnel analysis over the event stream — the ordered-conversion
count every product/behavior pipeline reports: how many users did
signup, then (strictly later) viewed, then clicked, then purchased.
Stage k's anchor is the EARLIEST qualifying time (min ts of stage-k
events after the user's stage-(k-1) anchor and within the CONVERSION
WINDOW of it) — the standard windowed strict-funnel semantics,
deterministic and SQL-mirrorable with chained min-in-window joins.
The window is what makes the funnel discriminative: without it this
dense synthetic stream converts every user at every stage.

Scale shape: one streaming filter pass (only funnel event types
survive, 3 short columns), then ONE user-bucketed exchange; the
per-bucket kernel is pure vectorized pandas (per-stage groupby-min +
merge — no per-user Python). Buckets emit per-stage partial counts,
so the final exchange is 4 rows per bucket. User skew is bounded by
events-per-user, the same contract as ops/windows sessionize.

Reference analog: none (graphiti has no event analytics); extends the
events family of SURVEY.md §2.10.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.exchange import bounded_group_map
from .io import read_events

FUNNEL_STAGES = ["signup", "view", "click", "purchase"]
FUNNEL_WINDOW_H = 72  # conversion window between consecutive stages
_USER_BUCKETS = 256


def _project(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    keep = pc.is_in(
        batch.column("event_type"),
        value_set=pa.array(FUNNEL_STAGES, pa.string()),
    )
    t = batch.filter(keep)
    uid = np.asarray(t.column("user_id"), np.int64)
    return pa.table(
        {
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "event_type": t.column("event_type"),
            "bucket": pa.array(uid % _USER_BUCKETS, pa.int32()),
        }
    )


def _bucket_funnel(df: pd.DataFrame) -> pd.DataFrame:
    anchor = (
        df[df["event_type"] == FUNNEL_STAGES[0]]
        .groupby("user_id", as_index=False)["ts"]
        .min()
    )
    counts = [len(anchor)]
    for stage in FUNNEL_STAGES[1:]:
        ev = df[df["event_type"] == stage].merge(
            anchor, on="user_id", suffixes=("", "_prev")
        )
        ev = ev[
            (ev["ts"] > ev["ts_prev"])
            & (ev["ts"] <= ev["ts_prev"] + pd.Timedelta(hours=FUNNEL_WINDOW_H))
        ]
        anchor = ev.groupby("user_id", as_index=False)["ts"].min()
        counts.append(len(anchor))
    return pd.DataFrame(
        {
            "stage": [
                f"{i + 1}_{s}" for i, s in enumerate(FUNNEL_STAGES)
            ],
            "n_users": np.asarray(counts, np.int64),
        }
    )


def events_funnel(sf_dir: str):
    """(stage, n_users): strict ordered-conversion funnel counts over
    signup -> view -> click -> purchase."""
    ev = read_events(sf_dir, ["user_id", "ts", "event_type"]).map_batches(
        _project, batch_format="pyarrow"
    )
    partial = bounded_group_map(
        ev, "bucket", _bucket_funnel, batch_format="pandas"
    )
    return (
        partial.groupby("stage")
        .sum("n_users")
        .map_batches(
            lambda t: t.rename_columns(["stage", "n_users"]),
            batch_format="pyarrow",
        )
    )


def _funnel_sql() -> str:
    ctes = [
        f"s0 AS (SELECT user_id, MIN(ts) AS t FROM events "
        f"WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id)"
    ]
    for i, stage in enumerate(FUNNEL_STAGES[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            f"JOIN s{i - 1} p ON p.user_id = e.user_id AND e.ts > p.t "
            f"AND e.ts <= p.t + INTERVAL {FUNNEL_WINDOW_H} HOUR "
            f"WHERE e.event_type = '{stage}' GROUP BY e.user_id)"
        )
    selects = " UNION ALL ".join(
        f"SELECT '{i + 1}_{s}' AS stage, COUNT(*)::BIGINT AS n_users "
        f"FROM s{i}"
        for i, s in enumerate(FUNNEL_STAGES)
    )
    return "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (" + selects + ")"


EVENTS_FUNNEL_SQL = _funnel_sql()
