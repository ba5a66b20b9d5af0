"""Contradiction audit table — WHICH fact invalidated which.

The reference resolves contradictions edge-by-edge at ingest time
(graphiti_core/utils/maintenance/edge_operations.py,
resolve_extracted_edge: invalidation candidates + invalid_at stamping)
but never materializes the lineage; a batch engine auditing a 100-TB
sweep needs the (closed fact, closing fact) pair table — who replaced
whom, and when — e.g. to review extraction quality or build
change-event training data.

Semantics (fixed, derived from the CANONICAL OUTPUT alone, so both
engines compute it from the same swept table): a pair (e, n) is a
contradiction record iff they share (group, subj, pred) with pred
exclusive, e was closed exactly at n's validity start
(e.invalid_at == n.valid_at), objects differ, e's own validity
started strictly earlier, and n's interval had not already ended at
e's start — the precise conditions under which the temporal sweep
(stages/edges._sweep_frame) picks n as e's earliest contradictor.
Ties (two facts starting at the same instant both "closing" e) emit
one row each: the sweep's min() made them jointly responsible.

Distributed shape: ONE (group, subj, pred)-bucketed exchange; the
per-group kernel is a vectorized pandas merge on invalid_at ==
valid_at — no corpus-sized state, no driver collect.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.extraction import EXCLUSIVE_PREDICATES


def contradiction_pairs(edges_named_ds):
    """(group_id, subj, pred, obj_closed, closed_valid_at, invalid_at,
    obj_new, new_invalid_at) for every sweep-closing pair."""
    import pyarrow.compute as pc

    from ..functions.exchange import bounded_group_map

    preds = sorted(EXCLUSIVE_PREDICATES)

    def proj(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("name"), value_set=pa.array(preds, pa.string())
        )
        out = t.filter(keep)
        k = pc.binary_join_element_wise(
            out.column("group_id").cast(pa.string()),
            out.column("subj").cast(pa.string()),
            out.column("name").cast(pa.string()),
            "\x1f",
        )
        return pa.table(
            {
                "group_id": out.column("group_id"),
                "subj": out.column("subj"),
                "pred": out.column("name"),
                "obj": out.column("obj"),
                "valid_at": out.column("valid_at"),
                "invalid_at": out.column("invalid_at"),
                "sk": k,
            }
        )

    edges = edges_named_ds.map_batches(proj, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        closed = df[df["invalid_at"].notna() & df["valid_at"].notna()]
        cand = df[df["valid_at"].notna()]
        if closed.empty or cand.empty:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype=object)
                    for c in (
                        "group_id", "subj", "pred", "obj_closed",
                        "closed_valid_at", "invalid_at", "obj_new",
                        "new_invalid_at",
                    )
                }
            )
        m = closed.merge(
            cand,
            left_on="invalid_at",
            right_on="valid_at",
            suffixes=("", "_n"),
        )
        m = m[
            (m["obj"] != m["obj_n"])
            & (m["valid_at"] < m["valid_at_n"])
            & (
                m["invalid_at_n"].isna()
                | (m["invalid_at_n"] > m["valid_at"])
            )
        ]
        out = pd.DataFrame(
            {
                "group_id": m["group_id"],
                "subj": m["subj"],
                "pred": m["pred"],
                "obj_closed": m["obj"],
                "closed_valid_at": m["valid_at"],
                "invalid_at": m["invalid_at"],
                "obj_new": m["obj_n"],
                "new_invalid_at": m["invalid_at_n"],
            }
        )
        return out.drop_duplicates()

    return bounded_group_map(edges, "sk", pairs, batch_format="pandas")


def _ctr_pairs_cte() -> str:
    preds = ", ".join(f"'{p}'" for p in sorted(EXCLUSIVE_PREDICATES))
    return f"""
, ctr_e AS (
  SELECT DISTINCT grp, subj, pred, obj, valid_at, invalid_at
  FROM swept WHERE pred IN ({preds})
), ctr_pairs AS (
  SELECT DISTINCT e.grp AS group_id, e.subj, e.pred,
    e.obj AS obj_closed, e.valid_at AS closed_valid_at, e.invalid_at,
    n.obj AS obj_new, n.invalid_at AS new_invalid_at
  FROM ctr_e e JOIN ctr_e n
    ON n.grp = e.grp AND n.subj = e.subj AND n.pred = e.pred
    AND n.valid_at = e.invalid_at
    AND n.obj <> e.obj
    AND e.valid_at IS NOT NULL
    AND e.valid_at < n.valid_at
    AND (n.invalid_at IS NULL OR n.invalid_at > e.valid_at)
)"""


def contradiction_pairs_sql_body() -> str:
    return _ctr_pairs_cte() + "\nSELECT * FROM ctr_pairs"


# --------------------------------------------------- change captions

# KELM-style verbalization of the lineage pairs: "what changed, when" —
# temporal-change caption data a trainer can consume directly.
CHANGE_TEMPLATES = {
    "WORKS_FOR": (" left ", " and joined "),
    "LIVES_IN": (" moved away from ", " and settled in "),
    "HOLDS_ROLE": (" stepped down as ", " and became "),
}


def change_events(contradictions_ds):
    """(group_id, subj, pred, obj_closed, obj_new, change_date,
    caption): one deduped caption per distinct change."""
    from .graph import _distinct_by_key

    def templ(df: pd.DataFrame) -> pd.DataFrame:
        # empty map_groups blocks arrive object-dtyped — to_datetime
        # keeps the .dt accessor valid in both the empty and the
        # timestamp case
        d = pd.to_datetime(df["invalid_at"]).dt.strftime("%Y-%m-%d")
        mid = df["pred"].map(lambda p: CHANGE_TEMPLATES[p][0])
        mid2 = df["pred"].map(lambda p: CHANGE_TEMPLATES[p][1])
        out = pd.DataFrame(
            {
                "group_id": df["group_id"],
                "subj": df["subj"],
                "pred": df["pred"],
                "obj_closed": df["obj_closed"],
                "obj_new": df["obj_new"],
                "change_date": d,
                "caption": (
                    df["subj"] + mid + df["obj_closed"] + mid2
                    + df["obj_new"] + " on " + d + "."
                ),
            }
        )
        return out

    keyed = contradictions_ds.map_batches(templ, batch_format="pandas")
    cols = [
        "group_id", "subj", "pred", "obj_closed", "obj_new",
        "change_date", "caption",
    ]
    # same change can arise from two closed validity starts — global
    # distinct on the projected row
    return _distinct_by_key(keyed, cols, "ck")


def change_events_sql_body() -> str:
    whens = "\n".join(
        f"    WHEN '{p}' THEN subj || '{a}' || obj_closed || '{b}' ||"
        f" obj_new || ' on ' || strftime(invalid_at, '%Y-%m-%d') || '.'"
        for p, (a, b) in sorted(CHANGE_TEMPLATES.items())
    )
    return f"""{_ctr_pairs_cte()}
SELECT DISTINCT group_id, subj, pred, obj_closed, obj_new,
  strftime(invalid_at, '%Y-%m-%d') AS change_date,
  CASE pred
{whens}
  END AS caption
FROM ctr_pairs
"""
