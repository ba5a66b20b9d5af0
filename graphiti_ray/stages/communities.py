"""Community detection: distributed label propagation + deterministic
summarization (SURVEY.md §2.5 D9/D10, §2.2 M10).

Semantics rebuilt from the reference
(graphiti_core/utils/maintenance/community_operations.py:83-127
label_propagation):
  1. every node starts in its own community, numbered by SORTED uuid
     order within its group (the reference numbers by dict insertion
     order — sorting makes the batch run deterministic);
  2. each sync iteration a node adopts the edge-count-weighted
     plurality of its neighbors' communities, ties to the larger
     community id, and never decreases its label
     (new = max(candidate, current), community_operations.py:110);
  3. stop when nothing changes.

Ray Data shape: communities are per-`group_id` by construction (the
reference projects each group separately,
community_operations.py:49-66), so the pipeline is one
``groupby(group_id).map_groups`` — each group's projection runs the
exact reference algorithm in-worker. The partitioning assumption: one
group's entity graph fits in a worker (same assumption the reference
makes by materializing the projection dict). A pathological group
would fall back to the iterated-label-join path in stages/cc.py.

Summaries/names are deterministic aggregations of member evidence
(top-degree member names) standing in for the LLM tree-summarize
(community_operations.py:128-157) behind the same output schema.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pyarrow as pa

from ..functions.hashing import sha1_hex

MAX_LP_ITERS = 50  # monotone labels converge well before this
SUMMARY_MAX_CHARS = 500  # reference summary budget (<=500 words; we cap chars)


def tree_summarize(texts: list[str], max_chars: int = SUMMARY_MAX_CHARS) -> str:
    """Hierarchical pairwise summary merge — the deterministic analog
    of the reference's summarize_pair reduction tree
    (community_operations.py:128-157): adjacent summaries merge
    pairwise (log-depth) with deduplicated clauses and a length budget,
    so the result is order-stable and bounded regardless of community
    size. An LLM pair-summarizer drops in at the _merge_pair seam."""

    def _merge_pair(a: str, b: str) -> str:
        parts: list[str] = []
        seen = set()
        for p in (a + "; " + b).split("; "):
            if p and p not in seen:
                seen.add(p)
                parts.append(p)
        out = "; ".join(parts)
        return out[:max_chars]

    level = [t for t in texts if t]
    if not level:
        return ""
    while len(level) > 1:
        nxt = [
            _merge_pair(level[i], level[i + 1]) if i + 1 < len(level) else level[i]
            for i in range(0, len(level), 2)
        ]
        level = nxt
    return level[0]


def label_propagation(
    neighbors: dict[str, dict[str, int]], order: list[str]
) -> dict[str, int]:
    """Reference algorithm verbatim on one group's projection.

    neighbors: uuid -> {neighbor_uuid: edge_count}; order: sorted uuids.
    Returns uuid -> community label (int index into order)."""
    community = {u: i for i, u in enumerate(order)}
    for _ in range(MAX_LP_ITERS):
        changed = False
        new_map: dict[str, int] = {}
        for u in order:
            cand: dict[int, int] = defaultdict(int)
            for v, w in neighbors.get(u, {}).items():
                cand[community[v]] += w
            best = -1
            if cand:
                best = sorted(((c, lbl) for lbl, c in cand.items()), reverse=True)[0][1]
            new = max(best, community[u])
            new_map[u] = new
            if new != community[u]:
                changed = True
        community = new_map
        if not changed:
            break
    return community


def _group_lp(df: pd.DataFrame) -> pd.DataFrame:
    """One group's edges+nodes -> (entity_uuid, community_uuid, ...).

    Input rows: kind='node' (uuid, name, n_mentions) plus kind='edge'
    (src, tgt) — unioned so one shuffle ships both."""
    grp = df["group_id"].iloc[0]
    nodes = df[df["kind"] == "node"]
    edges = df[df["kind"] == "edge"]
    order = sorted(nodes["uuid"])
    info = {
        r.uuid: (r.name, int(r.n_mentions))
        for r in nodes.itertuples(index=False)
    }
    neighbors: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for r in edges.itertuples(index=False):
        a, b = r.src, r.tgt
        if a == b or a not in info or b not in info:
            continue
        neighbors[a][b] += 1
        neighbors[b][a] += 1
    labels = label_propagation({u: dict(n) for u, n in neighbors.items()}, order)

    clusters: dict[int, list[str]] = defaultdict(list)
    for u, lbl in labels.items():
        clusters[lbl].append(u)

    rows = []
    for lbl in sorted(clusters):
        members = sorted(clusters[lbl])
        cuuid = sha1_hex("community", grp, *members)
        # deterministic naming: the highest-degree member leads
        top = sorted(members, key=lambda u: (-info[u][1], info[u][0]))
        name = f"{info[top[0]][0]} community"
        summary = tree_summarize([info[u][0] for u in top])
        for u in members:
            rows.append(
                {
                    "community_uuid": cuuid,
                    "entity_uuid": u,
                    "group_id": grp,
                    "community_name": name,
                    "summary": summary,
                    "n_members": len(members),
                }
            )
    return pd.DataFrame(
        rows,
        columns=[
            "community_uuid", "entity_uuid", "group_id",
            "community_name", "summary", "n_members",
        ],
    )


def build_communities(nodes_ds, edges_ds):
    """(nodes, edges) -> community membership table (one row per
    entity: HAS_MEMBER edge M10 + community metadata).

    Shuffle: one groupby(group_id) over the unioned projection rows."""
    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["node"] * t.num_rows, pa.string()),
                "group_id": t.column("group_id"),
                "uuid": t.column("uuid"),
                "name": t.column("name"),
                "n_mentions": t.column("n_mentions"),
                "src": pa.array([None] * t.num_rows, pa.string()),
                "tgt": pa.array([None] * t.num_rows, pa.string()),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["edge"] * t.num_rows, pa.string()),
                "group_id": t.column("group_id"),
                "uuid": pa.array([None] * t.num_rows, pa.string()),
                "name": pa.array([None] * t.num_rows, pa.string()),
                "n_mentions": pa.array([0] * t.num_rows, pa.int64()),
                "src": t.column("source_node_uuid"),
                "tgt": t.column("target_node_uuid"),
            }
        )

    proj = nodes_ds.map_batches(node_rows, batch_format="pyarrow").union(
        edges_ds.map_batches(edge_rows, batch_format="pyarrow")
    )
    return proj.groupby("group_id").map_groups(_group_lp, batch_format="pandas")
