"""M4 node summaries + episode context windows (T4).

- ``summarize_nodes``: per-entity summary built deterministically from
  graph evidence (mention count + per-predicate relation counts) — the
  batch stand-in for the LLM summary prompt
  (graphiti_core/utils/maintenance/node_operations.py:329-376,
  prompts/summarize_nodes.py:68-106), behind the same output surface
  (uuid, name, summary) so an LLM actor pool can drop in.
- ``episode_windows``: for each episode, the previous up-to-3 episode
  urls of the same group in (valid_at, url) order — Graphiti's
  EPISODE_WINDOW_LEN=3 context retrieval
  (graphiti_core/utils/maintenance/graph_data_operations.py:26,104-159)
  re-expressed as a per-group lag window (SURVEY.md §2.6 T4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WINDOW = 3  # EPISODE_WINDOW_LEN


NUM_BUCKETS = 256  # uuid-hash exchange granularity for the histogram


def summarize_nodes(nodes_ds, edges_ds):
    """(uuid, name, summary): summary = mentions + sorted predicate
    histogram over incident canonical edges.

    Shape: per-batch partial (uuid, pred) counts -> ONE bucketed
    groupby(hash(uuid)) whose reducer renders each entity's top-5
    relation string -> the node side reads it through the TIERED lookup
    (stages/joins.lookup_column). The per-entity histogram never
    assembles on the driver (it is O(nodes))."""

    def explode(t: pa.Table) -> pa.Table:
        rows_u, rows_p = [], []
        for s, g, p in zip(
            t.column("source_node_uuid").to_pylist(),
            t.column("target_node_uuid").to_pylist(),
            t.column("name").to_pylist(),
        ):
            rows_u.append(s)
            rows_p.append(p)
            rows_u.append(g)
            rows_p.append(p)
        out = pa.table(
            {
                "uuid": pa.array(rows_u, pa.string()),
                "pred": pa.array(rows_p, pa.string()),
            }
        )
        g = out.group_by(["uuid", "pred"]).aggregate([("pred", "count")])
        g = g.rename_columns(["uuid", "pred", "cnt"])
        from ..functions.hashing import bucket_array

        return g.append_column(
            "bucket",
            pa.array(bucket_array(g.column("uuid"), NUM_BUCKETS, salt="sumbkt"), pa.int32()),
        )

    def render(df: pd.DataFrame) -> pa.Table:
        """All uuids of one bucket -> rendered top-5 relation strings."""
        uuids, rels = [], []
        for u, g in df.groupby("uuid", sort=False):
            agg = g.groupby("pred")["cnt"].sum()
            top = sorted(agg.items(), key=lambda x: (-x[1], x[0]))[:5]
            uuids.append(u)
            rels.append(", ".join(f"{p} x{int(c)}" for p, c in top))
        return pa.table(
            {
                "uuid": pa.array(uuids, pa.string()),
                "rel": pa.array(rels, pa.string()),
            }
        )

    rel_ds = (
        edges_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(render, batch_format="pandas")
    )

    from .joins import lookup_column

    with_rel = lookup_column(nodes_ds, "uuid", rel_ds, "uuid", "rel", "rel")

    def build(t: pa.Table) -> pa.Table:
        summaries = []
        for name, nm, rel in zip(
            t.column("name").to_pylist(),
            t.column("n_mentions").to_pylist(),
            t.column("rel").to_pylist(),
        ):
            s = f"{name}: mentioned in {nm} episodes"
            if rel:
                s += f"; relations: {rel}"
            summaries.append(s)
        return pa.table(
            {
                "uuid": t.column("uuid"),
                "name": t.column("name"),
                "summary": pa.array(summaries, pa.string()),
            }
        )

    return with_rel.map_batches(build, batch_format="pyarrow")


def episode_windows(episodes_ds):
    """(url, prev1, prev2, prev3): per-group chronological lag window."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["valid_at", "url"])
        out = {"url": g["url"].tolist()}
        for lag in range(1, WINDOW + 1):
            out[f"prev{lag}"] = g["url"].shift(lag).tolist()
        return pd.DataFrame(out)

    ds = episodes_ds.map_batches(
        lambda t: t.select(["group_id", "url", "valid_at"]), batch_format="pyarrow"
    )
    return ds.groupby("group_id").map_groups(per_group, batch_format="pandas")
