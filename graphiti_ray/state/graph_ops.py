"""Graph read/maintenance operations over the materialized KG store
(SURVEY.md §2.1 S6/S8).

The reference exposes point lookups (get_by_uuid(s), get_by_group_ids
with cursor+limit — graphiti_core/nodes.py:161-252, edges.py:232-365)
and destructive ops (clear_data, delete by group, remove_episode
cascade — utils/maintenance/graph_data_operations.py:95-101,
graphiti.py:758-787) against Neo4j. The batch analogs work on the
partitioned parquet layout written by pipelines.kg.run_kg_to_dir:

- lookups: predicate-pushdown filters over the table Datasets
  (`uuid IN (...)` / `group_id IN (...) LIMIT n OFFSET cursor`);
- group delete: drop whole hive partitions (partition pruning — a
  group lives in exactly one partition_id by construction);
- remove_episode cascade: anti-join semantics — drop the episode row,
  drop its MENTIONS rows, drop provenance from edge episode lists and
  delete edges whose provenance becomes empty, then drop orphaned
  entities (nodes mentioned by no surviving episode).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------- lookups

def get_by_uuids(ds, uuids: list[str], col: str = "uuid"):
    """Point lookup: rows whose `col` is in uuids (vectorized is_in)."""
    vs = pa.array(sorted(set(uuids)), pa.string())

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(col), value_set=vs))

    return ds.map_batches(f, batch_format="pyarrow")


def get_by_group_ids(ds, group_ids: list[str], limit: int | None = None,
                     cursor_uuid: str | None = None, sort_col: str = "uuid"):
    """Group-scoped scan with the reference's uuid-cursor + limit
    pagination (nodes.py:220-252): rows after cursor_uuid in sort_col
    order, up to limit."""
    vs = pa.array(sorted(set(group_ids)), pa.string())

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("group_id"), value_set=vs))
        if cursor_uuid is not None:
            t = t.filter(pc.greater(t.column(sort_col), cursor_uuid))
        return t

    out = ds.map_batches(f, batch_format="pyarrow").sort(sort_col)
    return out.limit(limit) if limit is not None else out


EPISODE_WINDOW_LEN = 3  # reference graph_data_operations.py:26


def retrieve_episodes(
    episodes_ds,
    reference_time,
    last_n: int = EPISODE_WINDOW_LEN,
    group_ids: list[str] | None = None,
):
    """The last ``last_n`` episodes at/before ``reference_time``,
    optionally scoped to ``group_ids``, in chronological order —
    reference ``retrieve_episodes``
    (graph_data_operations.py:104-160). This engine stamps episode
    created_at = valid_at at ingestion, so valid_at orders recency
    exactly like the reference's created_at DESC. Distributed shape:
    per-block top-n prune inside map_batches, then one tiny driver
    sort over <= n rows per block — no global shuffle.

    Returns a pandas DataFrame (small by construction)."""
    gset = (
        pa.array(sorted(set(group_ids)), pa.string())
        if group_ids is not None else None
    )
    ref = pa.scalar(reference_time, pa.timestamp("us"))

    def prune(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.less_equal(t.column("valid_at"), ref), False)
        if gset is not None:
            mask = pc.and_(mask, pc.is_in(t.column("group_id"), value_set=gset))
        t = t.filter(mask)
        if t.num_rows <= last_n:
            return t
        order = pc.sort_indices(
            t, sort_keys=[("valid_at", "descending"), ("url", "ascending")]
        )
        return t.take(order[:last_n])

    top = episodes_ds.map_batches(prune, batch_format="pyarrow").to_pandas()
    top = top.sort_values(
        ["valid_at", "url"], ascending=[False, True]
    ).head(last_n)
    return top.sort_values(["valid_at", "url"]).reset_index(drop=True)


def get_by_episode(kg, episode_uuid: str):
    """Q13 provenance query (graphiti.py:710-721
    get_nodes_and_edges_by_episode): the edges carrying this episode in
    their provenance list plus the entities it mentions."""

    def edge_filter(t: pa.Table) -> pa.Table:
        keep = [
            i
            for i, lst in enumerate(t.column("episodes").to_pylist())
            if episode_uuid in (lst or [])
        ]
        return t.take(pa.array(keep, pa.int64()))  # typed: [] infers null

    edges = kg.edges.map_batches(edge_filter, batch_format="pyarrow")
    ment = kg.mentions.map_batches(
        lambda t: t.filter(pc.equal(t.column("episode_uuid"), episode_uuid)),
        batch_format="pyarrow",
    )
    entity_uuids = ment.to_pandas()["entity_uuid"].tolist()
    nodes = get_by_uuids(kg.nodes, entity_uuids)
    return {"edges": edges, "nodes": nodes}


# ------------------------------------------------------------- destructive

def delete_group_partitions(kg_dir: str, partition_ids: list[int]) -> list[str]:
    """S8 delete-by-group at the storage layer: a group_id maps to one
    partition_id (hash), so deletion = removing those hive directories
    from every table. Returns removed paths."""
    removed = []
    for table in ("episodes", "nodes", "edges", "mentions", "triples"):
        for p in partition_ids:
            path = os.path.join(kg_dir, table, f"partition_id={p}")
            if os.path.isdir(path):
                shutil.rmtree(path)
                removed.append(path)
    return removed


def remove_episode(kg, episode_uuid: str):
    """S8 remove_episode cascade (graphiti.py:758-787) on in-memory KG
    Datasets. Returns a dict of the four rebuilt Datasets.

    Cascade: episode row out; MENTIONS of it out; the episode removed
    from every edge's provenance list, edges left with no provenance
    deleted; entities with no surviving mention deleted; triples
    rebuilt implicitly by the edge filter."""
    eps = kg.episodes.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("episode_uuid"), episode_uuid)),
        batch_format="pyarrow",
    )
    mentions = kg.mentions.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("episode_uuid"), episode_uuid)),
        batch_format="pyarrow",
    )

    def drop_provenance(t: pa.Table) -> pa.Table:
        eps_col = t.column("episodes").to_pylist()
        new_eps = [[e for e in (lst or []) if e != episode_uuid] for lst in eps_col]
        keep = [i for i, lst in enumerate(new_eps) if lst]
        t = t.set_column(
            t.schema.get_field_index("episodes"), "episodes",
            pa.array(new_eps, pa.list_(pa.string())),
        )
        return t.take(pa.array(keep, pa.int64()))  # typed: [] infers null

    edges = kg.edges.map_batches(drop_provenance, batch_format="pyarrow")

    surviving = mentions.groupby("entity_uuid").count()
    alive = pa.array(sorted(set(surviving.to_pandas()["entity_uuid"])), pa.string())

    def keep_alive(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("uuid"), value_set=alive))

    nodes = kg.nodes.map_batches(keep_alive, batch_format="pyarrow")
    return {"episodes": eps, "mentions": mentions, "edges": edges, "nodes": nodes}
