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


OUT_COLUMNS = [
    "community_uuid", "entity_uuid", "group_id",
    "community_name", "summary", "n_members",
]


def _community_rows(grp: str, members: list[str], info: dict) -> list[dict]:
    """One converged community -> output rows (shared by the in-worker
    and distributed paths so both emit byte-identical results).
    info: uuid -> (name, n_mentions)."""
    members = sorted(members)
    cuuid = sha1_hex("community", grp, *members)
    # deterministic naming: the highest-degree member leads
    top = sorted(members, key=lambda u: (-info[u][1], info[u][0]))
    name = f"{info[top[0]][0]} community"
    summary = tree_summarize([info[u][0] for u in top])
    return [
        {
            "community_uuid": cuuid,
            "entity_uuid": u,
            "group_id": grp,
            "community_name": name,
            "summary": summary,
            "n_members": len(members),
        }
        for u in members
    ]


def _group_lp(df: pd.DataFrame, order_key: str = "uuid") -> pd.DataFrame:
    """One group's edges+nodes -> (entity_uuid, community_uuid, ...).

    Input rows: kind='node' (uuid, name, n_mentions) plus kind='edge'
    (src, tgt) — unioned so one shuffle ships both.

    order_key picks the column whose sorted order numbers the initial
    labels (reference: dict insertion order; default: uuid). Every LP
    comparison is order-only, so any strictly-ordered key yields the
    same algorithm over a relabeled domain — order_key='name' makes
    the iteration mirrorable by a SQL engine that cannot compute the
    sha1 uuids (labels become names, unique per group by construction:
    uuid = sha1(group, name_norm))."""
    grp = df["group_id"].iloc[0]
    nodes = df[df["kind"] == "node"]
    edges = df[df["kind"] == "edge"]
    if order_key == "uuid":
        order = sorted(nodes["uuid"])
    else:
        order = list(nodes.sort_values([order_key, "uuid"])["uuid"])
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
        rows.extend(_community_rows(grp, clusters[lbl], info))
    return pd.DataFrame(rows, columns=OUT_COLUMNS)


NUM_BUCKETS = 256  # exchange granularity for the distributed-LP path
# A group whose projection (nodes + edges) exceeds this row count takes
# the distributed-LP path instead of one map_groups task — the hot-domain
# guard (BASELINE.md records ~10% of rows in one domain; at 100x a single
# worker cannot hold that group's projection).
HOT_GROUP_ROWS = 500_000


def _bkt(vals) -> pa.Array:
    from ..functions.hashing import bucket_array

    return pa.array(bucket_array(vals, NUM_BUCKETS, salt="lpbkt"), pa.int32())


def _lp_distributed(
    proj_ds, max_iters: int = MAX_LP_ITERS, order_key: str = "uuid"
):
    """Distributed label propagation for hot groups: the EXACT reference
    iteration (weighted plurality, tie to larger label, monotone max)
    expressed as two bucketed exchanges per sync round. Labels carry the
    node's ``order_key`` value (uuid by default) instead of the
    reference's insertion-order index — the initial index assignment is
    a strictly order-preserving bijection of the sorted key, and every
    update uses only order comparisons, so the two label domains
    converge to identical member partitions."""
    import pyarrow.compute as pc

    def node_label_rows(t: pa.Table) -> pa.Table:
        n = t.filter(pc.equal(t.column("kind"), "node"))
        return pa.table(
            {
                "group_id": n.column("group_id"),
                "uuid": n.column("uuid"),
                "name": n.column("name"),
                "n_mentions": n.column("n_mentions"),
                "label": n.column(order_key),
            }
        )

    def edge_both_rows(t: pa.Table) -> pa.Table:
        e = t.filter(
            pc.and_(
                pc.equal(t.column("kind"), "edge"),
                pc.not_equal(t.column("src"), t.column("tgt")),
            )
        )
        fwd = pa.table(
            {"group_id": e.column("group_id"), "u": e.column("src"), "v": e.column("tgt")}
        )
        rev = pa.table(
            {"group_id": e.column("group_id"), "u": e.column("tgt"), "v": e.column("src")}
        )
        return pa.concat_tables([fwd, rev])

    labels = proj_ds.map_batches(node_label_rows, batch_format="pyarrow").materialize()
    edges2 = proj_ds.map_batches(edge_both_rows, batch_format="pyarrow").materialize()

    def tag_edge_by_v(t: pa.Table) -> pa.Table:
        gs = t.column("group_id").to_pylist()
        vs = t.column("v").to_pylist()
        return pa.table(
            {
                "tag": pa.array(["e"] * t.num_rows, pa.string()),
                "group_id": t.column("group_id"),
                "key": t.column("v"),
                "u": t.column("u"),
                "label": pa.array([None] * t.num_rows, pa.string()),
                "kb": _bkt([g + "|" + v for g, v in zip(gs, vs)]),
            }
        )

    def tag_label_by_uuid(t: pa.Table) -> pa.Table:
        gs = t.column("group_id").to_pylist()
        us = t.column("uuid").to_pylist()
        return pa.table(
            {
                "tag": pa.array(["l"] * t.num_rows, pa.string()),
                "group_id": t.column("group_id"),
                "key": t.column("uuid"),
                "u": pa.array([None] * t.num_rows, pa.string()),
                "label": t.column("label"),
                "kb": _bkt([g + "|" + u for g, u in zip(gs, us)]),
            }
        )

    def attach(df: pd.DataFrame) -> pa.Table:
        """One kb bucket: label(v) onto each (u, v) edge row — a plain
        vectorized hash join (inner: a v with no label row, i.e. an
        edge endpoint outside the node set, drops — the same guard as
        the in-worker path)."""
        e = df[df["tag"] == "e"][["group_id", "key", "u"]]
        l = df[df["tag"] == "l"][["group_id", "key", "label"]]
        j = e.merge(l, on=["group_id", "key"], how="inner")
        return pa.table(
            {
                "group_id": pa.array(j["group_id"].tolist(), pa.string()),
                "u": pa.array(j["u"].tolist(), pa.string()),
                "nbr_label": pa.array(j["label"].tolist(), pa.string()),
            }
        )

    def tag_msg_by_u(t: pa.Table) -> pa.Table:
        gs = t.column("group_id").to_pylist()
        us = t.column("u").to_pylist()
        return pa.table(
            {
                "tag": pa.array(["m"] * t.num_rows, pa.string()),
                "group_id": t.column("group_id"),
                "uuid": t.column("u"),
                "name": pa.array([None] * t.num_rows, pa.string()),
                "n_mentions": pa.array([0] * t.num_rows, pa.int64()),
                "label": t.column("nbr_label"),
                "ub": _bkt([g + "|" + u for g, u in zip(gs, us)]),
            }
        )

    def tag_self(t: pa.Table) -> pa.Table:
        gs = t.column("group_id").to_pylist()
        us = t.column("uuid").to_pylist()
        return pa.table(
            {
                "tag": pa.array(["s"] * t.num_rows, pa.string()),
                "group_id": t.column("group_id"),
                "uuid": t.column("uuid"),
                "name": t.column("name"),
                "n_mentions": t.column("n_mentions"),
                "label": t.column("label"),
                "ub": _bkt([g + "|" + u for g, u in zip(gs, us)]),
            }
        )

    def update(df: pd.DataFrame) -> pa.Table:
        """One ub bucket: per node, weighted plurality of neighbor
        labels (ties to the LARGER label), then new = max(best, cur)
        — community_operations.py:110 semantics, fully vectorized:
        count (g,u,label) triples, pick each node's max (count, label)
        by sort + keep-last, then row-wise max with the current label."""
        import numpy as np

        selfs = df[df["tag"] == "s"][
            ["group_id", "uuid", "name", "n_mentions", "label"]
        ].rename(columns={"label": "cur"})
        msgs = df[df["tag"] == "m"][["group_id", "uuid", "label"]]
        if len(msgs):
            cnt = (
                msgs.groupby(["group_id", "uuid", "label"], sort=False)
                .size()
                .reset_index(name="w")
            )
            cnt = cnt.sort_values(["group_id", "uuid", "w", "label"])
            best = cnt.drop_duplicates(["group_id", "uuid"], keep="last")[
                ["group_id", "uuid", "label"]
            ].rename(columns={"label": "best"})
            out = selfs.merge(best, on=["group_id", "uuid"], how="left")
        else:
            out = selfs.copy()
            out["best"] = None
        hb = out["best"].notna().to_numpy()
        new = out["cur"].to_numpy(dtype=object).copy()
        bb = out["best"].to_numpy(dtype=object)
        take = np.zeros(len(out), dtype=bool)
        if hb.any():  # compare only where a plurality exists (None > str raises)
            take[hb] = bb[hb] > new[hb]
        new[take] = bb[take]
        changed = (new != out["cur"].to_numpy(dtype=object)).astype(np.int64)
        return pa.table(
            {
                "group_id": pa.array(out["group_id"].tolist(), pa.string()),
                "uuid": pa.array(out["uuid"].tolist(), pa.string()),
                "name": pa.array(out["name"].tolist(), pa.string()),
                "n_mentions": pa.array(
                    [int(x) for x in out["n_mentions"]], pa.int64()
                ),
                "label": pa.array(new.tolist(), pa.string()),
                "changed": pa.array(changed.tolist(), pa.int64()),
            }
        )

    # Both per-iteration exchanges run behind a CLUSTER-width block
    # coalesce (bounded_group_map): a sync round costs two K-wide sort
    # shuffles regardless of how many blocks the upstream union emits.
    # Without the bound each round schedules O(blocks^2) shuffle
    # objects and map_groups fans out one task per kb/ub bucket (256),
    # which at low parallelism turns a tiny corpus into minutes of
    # pure task-scheduling per iteration (the round-4 "hang").
    from ..functions.exchange import bounded_group_map

    for _ in range(max_iters):
        msgs = bounded_group_map(
            labels.map_batches(tag_label_by_uuid, batch_format="pyarrow")
            .union(edges2.map_batches(tag_edge_by_v, batch_format="pyarrow")),
            "kb",
            attach,
            batch_format="pandas",
        )
        new_labels = bounded_group_map(
            labels.map_batches(tag_self, batch_format="pyarrow")
            .union(msgs.map_batches(tag_msg_by_u, batch_format="pyarrow")),
            "ub",
            update,
            batch_format="pandas",
        ).materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
            break

    def tag_by_label(t: pa.Table) -> pa.Table:
        gs = t.column("group_id").to_pylist()
        ls = t.column("label").to_pylist()
        return t.append_column(
            "cb", _bkt([g + "|" + l for g, l in zip(gs, ls)])
        )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for (grp, _), c in df.groupby(["group_id", "label"], sort=True):
            info = {
                r.uuid: (r.name, int(r.n_mentions))
                for r in c.itertuples(index=False)
            }
            rows.extend(_community_rows(grp, list(info.keys()), info))
        return pd.DataFrame(rows, columns=OUT_COLUMNS)

    return bounded_group_map(
        labels.map_batches(tag_by_label, batch_format="pyarrow"),
        "cb",
        emit,
        batch_format="pandas",
    )


def build_communities(
    nodes_ds,
    edges_ds,
    hot_group_rows: int = HOT_GROUP_ROWS,
    order_key: str = "uuid",
    group_ids: list[str] | None = None,
):
    """(nodes, edges) -> community membership table (one row per
    entity: HAS_MEMBER edge M10 + community metadata).

    ``group_ids``: restrict clustering to the listed graph partitions,
    mirroring ``Graphiti.build_communities(group_ids)``
    (graphiti.py:606-613 -> community_operations.py:49-66's per-group
    projection filter); None clusters the whole graph.

    Shuffle: one groupby(group_id) over the unioned projection rows.
    Groups whose projection exceeds ``hot_group_rows`` rows are split
    off to the distributed-LP path (_lp_distributed) so one hot domain
    cannot become the makespan bound / blow a worker's heap."""
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

    from functools import partial

    import pyarrow.compute as pc

    group_lp = partial(_group_lp, order_key=order_key)
    proj = nodes_ds.map_batches(node_rows, batch_format="pyarrow").union(
        edges_ds.map_batches(edge_rows, batch_format="pyarrow")
    )
    if group_ids is not None:
        want = pa.array(sorted(group_ids), pa.string())
        proj = proj.map_batches(
            lambda t: t.filter(pc.is_in(t.column("group_id"), value_set=want)),
            batch_format="pyarrow",
        )
    from ..functions.exchange import coalesced

    proj = coalesced(proj.materialize())
    counts = proj.groupby("group_id").count().to_pandas()
    hot = sorted(counts[counts["count()"] > hot_group_rows]["group_id"])
    if not hot:
        return proj.groupby("group_id").map_groups(group_lp, batch_format="pandas")

    hot_arr = pa.array(hot, pa.string())
    cold_ds = proj.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t.column("group_id"), value_set=hot_arr))
        ),
        batch_format="pyarrow",
    )
    hot_ds = proj.map_batches(
        lambda t: t.filter(pc.is_in(t.column("group_id"), value_set=hot_arr)),
        batch_format="pyarrow",
    )
    cold_out = cold_ds.groupby("group_id").map_groups(
        group_lp, batch_format="pandas"
    )
    return cold_out.union(_lp_distributed(hot_ds, order_key=order_key))


def update_communities(membership_ds, new_nodes_ds, edges_ds):
    """Incremental community fold — the batch analog of the reference's
    ``update_community`` (community_operations.py:240-325), vectorized
    over a SET of new entities instead of one node at a time:

      1. a new entity already present in the membership keeps its
         community (determine_entity_community's first lookup,
         community_operations.py:242-258);
      2. otherwise it joins the PLURALITY community among its direct
         neighbors' communities (:262-297), counted once per incident
         edge like the Cypher MATCH row count; ties break to the
         SMALLEST (community_name, community_uuid) — the reference
         takes dict-iteration first-max, which is insertion-order-
         dependent; a sorted tie-break makes the batch run
         reproducible, and name-first keeps it expressible by a SQL
         oracle that cannot compute the member-set sha1 uuids;
      3. an entity with no community-bearing neighbor stays unassigned
         (:291-292 returns None, nothing is written);
      4. each affected community folds its new members' evidence into
         the summary (the summarize_pair seam -> tree_summarize) and
         re-counts n_members (:301-325). community_uuid and name are
         PRESERVED — the reference updates the community node in place
         rather than re-deriving identity from the member set.

    Inputs: membership (OUT_COLUMNS rows, e.g. from build_communities),
    the new canonical nodes (uuid, group_id, name), and the canonical
    edges of the graph AFTER the incremental build (so new->existing
    links exist).

    Shuffle shape: three lookup joins (member?, neighbor->community,
    affected?) — all broadcast-tier for typical incremental batches,
    degrading to the sharded tiers at scale — plus ONE bucketed
    exchange for the per-entity plurality and ONE groupby over the
    affected communities only; unaffected membership rows stream
    through untouched.
    """
    import pyarrow.compute as pc

    from .joins import lookup_column

    def keep_null(col):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_null(t.column(col))).drop_columns([col])

        return f

    def keep_hit(col, drop: bool = True):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t.column(col)))
            return t.drop_columns([col]) if drop else t

        return f

    # 1. candidates = new entities not already members
    cand = lookup_column(
        new_nodes_ds.select_columns(["uuid", "group_id", "name"]),
        "uuid", membership_ds, "entity_uuid", "community_uuid", "__have",
    ).map_batches(keep_null("__have"), batch_format="pyarrow").materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        fwd = pa.table(
            {"e": t.column("source_node_uuid"), "nbr": t.column("target_node_uuid")}
        )
        rev = pa.table(
            {"e": t.column("target_node_uuid"), "nbr": t.column("source_node_uuid")}
        )
        return pa.concat_tables([fwd, rev])

    # 2. incident edges of candidates, 3. neighbors' communities
    pairs = lookup_column(
        edges_ds.map_batches(both_dirs, batch_format="pyarrow"),
        "e", cand, "uuid", "group_id", "__is_cand",
    ).map_batches(keep_hit("__is_cand"), batch_format="pyarrow")
    def cv_rows(t: pa.Table) -> pa.Table:
        # composite lookup value: name first so the tie-break sorts on
        # the SQL-computable component (\x1f never appears in names)
        return pa.table(
            {
                "entity_uuid": t.column("entity_uuid"),
                "cv": pc.binary_join_element_wise(
                    t.column("community_name"),
                    t.column("community_uuid"),
                    "\x1f",
                ),
            }
        )

    pairs = lookup_column(
        pairs,
        "nbr",
        membership_ds.map_batches(cv_rows, batch_format="pyarrow"),
        "entity_uuid", "cv", "cv",
    ).map_batches(keep_hit("cv", drop=False), batch_format="pyarrow")

    # 4. plurality per candidate (bucketed: one exchange, vectorized
    # count -> sort -> keep-last inside each bucket)
    def tag_eb(t: pa.Table) -> pa.Table:
        return t.append_column("eb", _bkt(t.column("e").to_pylist()))

    def plurality(df: pd.DataFrame) -> pd.DataFrame:
        cnt = (
            df.groupby(["e", "cv"], sort=False).size().reset_index(name="w")
        )
        # max count, tie -> smallest (name, uuid): sort (w asc, cv
        # desc), keep last
        cnt = cnt.sort_values(["e", "w", "cv"], ascending=[True, True, False])
        best = cnt.drop_duplicates(["e"], keep="last")
        return pd.DataFrame(
            {
                "entity_uuid": best["e"],
                "community_uuid": best["cv"].str.split("\x1f", n=1).str[1],
            }
        )

    assigned = (
        pairs.map_batches(tag_eb, batch_format="pyarrow")
        .groupby("eb")
        .map_groups(plurality, batch_format="pandas")
        .materialize()
    )
    if not assigned.count():
        return membership_ds

    # 5. split membership: only communities gaining members re-fold
    mem = lookup_column(
        membership_ds, "community_uuid",
        assigned, "community_uuid", "entity_uuid", "__aff",
    )
    unaffected = mem.map_batches(keep_null("__aff"), batch_format="pyarrow")
    affected_old = mem.map_batches(keep_hit("__aff"), batch_format="pyarrow")

    new_rows = lookup_column(
        cand, "uuid", assigned, "entity_uuid", "community_uuid", "community_uuid"
    ).map_batches(keep_hit("community_uuid", drop=False), batch_format="pyarrow")

    def shape_old(t: pa.Table) -> pa.Table:
        return t.append_column("new_name", pa.nulls(t.num_rows, pa.string()))

    def shape_new(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "community_uuid": t.column("community_uuid"),
                "entity_uuid": t.column("uuid"),
                "group_id": t.column("group_id"),
                "community_name": pa.nulls(t.num_rows, pa.string()),
                "summary": pa.nulls(t.num_rows, pa.string()),
                "n_members": pa.nulls(t.num_rows, pa.int64()),
                "new_name": t.column("name"),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        old = df[df["new_name"].isna()]
        new = df[df["new_name"].notna()]
        summary = old["summary"].iloc[0]
        if len(new):
            summary = tree_summarize([summary] + sorted(new["new_name"]))
        ents = sorted(set(old["entity_uuid"]) | set(new["entity_uuid"]))
        return pd.DataFrame(
            {
                "community_uuid": df["community_uuid"].iloc[0],
                "entity_uuid": ents,
                "group_id": old["group_id"].iloc[0],
                "community_name": old["community_name"].iloc[0],
                "summary": summary,
                "n_members": len(ents),
            },
            columns=OUT_COLUMNS,
        )

    folded = (
        affected_old.map_batches(shape_old, batch_format="pyarrow")
        .union(new_rows.map_batches(shape_new, batch_format="pyarrow"))
        .groupby("community_uuid")
        .map_groups(fold, batch_format="pandas")
    )
    return unaffected.union(folded)
