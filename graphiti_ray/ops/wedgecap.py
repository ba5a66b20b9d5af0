"""The hub degree cap for wedge-expanding operators.

two_hop_paths / link_prediction / entity_cooccurrence (and
kg_multihop_qa, which consumes two-hop paths) all expand a per-hub
cross product inside ONE reducer: a hub with degree d contributes
O(d^2) wedge rows to the group that owns it. On web-scale KGs a
celebrity entity with degree 1e5 would put 1e10 rows in a single
reducer — the classic all-pairs skew killer. The bound here is an
ACTUAL cap, not a docstring promise: each hub's neighbor/edge list is
deterministically truncated to ``WEDGE_DEGREE_CAP`` entries (sorted,
keep-first — identical across task retries and resumes) and every
truncation logs its drop count (the repo's "no silent caps" rule).

Cap sizing: 1024 bounds one hub's expansion to ~1M pair rows
(~10^2 MB as a pandas frame) — safely inside a reducer's heap at any
corpus size, while sitting 2 orders of magnitude above the synthetic
fixtures' max degree (11 at sf0.1, 5 mentions/episode), so every
oracle compare still sees the exact, uncapped semantics. Production
alternative for exact results on hot hubs: salt the pivot and merge
partial intersections; the cap is the bounded-cost default.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

WEDGE_DEGREE_CAP = 1024

_log = logging.getLogger("graphiti_ray.wedgecap")


def cap_frame(
    df: pd.DataFrame,
    cap: int | None,
    sort_cols: list[str],
    what: str,
    hub: str = "",
) -> pd.DataFrame:
    """Bound one hub's expansion list: stable-sort by ``sort_cols``,
    keep the first ``cap`` rows, log the drop. ``cap=None`` disables
    (used only by tests that prove the uncapped == capped equality
    below the bound)."""
    if cap is None or len(df) <= cap:
        return df
    kept = df.sort_values(sort_cols, kind="mergesort").head(cap)
    _log.warning(
        "%s: hub %r degree %d capped to %d (%d rows dropped)",
        what, hub, len(df), cap, len(df) - cap,
    )
    return kept


def cap_sorted_array(arr: np.ndarray, cap: int | None, what: str,
                     hub: str = "") -> np.ndarray:
    """Same bound for an already-sorted neighbor array."""
    if cap is None or len(arr) <= cap:
        return arr
    _log.warning(
        "%s: hub %r degree %d capped to %d (%d neighbors dropped)",
        what, hub, len(arr), cap, len(arr) - cap,
    )
    return arr[:cap]


def cap_per_key(
    df: pd.DataFrame,
    key: str,
    cap: int | None,
    sort_cols: list[str],
    what: str,
) -> pd.DataFrame:
    """Bound EVERY key's row count inside one bucket frame (vectorized
    — one sort + one groupby-head for the whole bucket, no per-key
    Python). Used where a reducer owns many hubs (episode buckets)."""
    if cap is None or len(df) <= cap:
        return df
    sizes = df.groupby(key)[key].transform("size")
    if (sizes <= cap).all():
        return df
    out = (
        df.sort_values([key] + sort_cols, kind="mergesort")
        .groupby(key, sort=False)
        .head(cap)
    )
    n_hubs = int((df.groupby(key).size() > cap).sum())
    _log.warning(
        "%s: %d keys over the %d cap in this bucket (%d rows dropped)",
        what, n_hubs, cap, len(df) - len(out),
    )
    return out
