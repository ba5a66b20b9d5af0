"""GraphitiRay — the top-level facade mirroring the reference's
``Graphiti`` class surface (graphiti_core/graphiti.py:92-787) on the
batch engine, so a user of the reference maps their calls directly:

| reference (Graphiti)            | GraphitiRay                         |
|---------------------------------|-------------------------------------|
| ``add_episode`` / ``add_episode_bulk`` | ``build(pages_ds)`` / ``build_from_episodes(eps_ds)`` (batch is the only mode) |
| ``search`` (hybrid)             | ``search(query, config=...)``       |
| ``get_nodes_by_query``          | ``search_nodes(query)``             |
| ``retrieve_episodes``           | ``retrieve_episodes(ref_time, n, group_ids)`` (+ ``episode_windows()`` for the T4 lag table) |
| ``build_communities``           | ``build_communities()``             |
| ``update_community`` (per node) | ``update_communities(mem, new_nodes)`` |
| ``add_triplet``                 | ``add_triplet(...)`` / ``add_triplets(ds)`` |
| ``build_indices_and_constraints`` | ``build_indices_and_constraints(dir)`` |
| ``get_nodes_and_edges_by_episode`` | ``get_by_episode(uuid)``         |
| ``remove_episode``              | ``remove_episode(uuid)``            |
| constructor client injection    | ``extractor_factory`` / ``embedder_factory`` kwargs |

Construction is lazy; ``build`` runs the full pipeline and caches the
KG tables. The class owns NO Ray session (driver contract).
"""

from __future__ import annotations

from datetime import datetime

from .pipelines.kg import (
    DEFAULT_NOW,
    KGResult,
    build_kg,
    build_kg_incremental,
    run_kg_to_dir,
)


class GraphitiRay:
    def __init__(
        self,
        *,
        now: datetime = DEFAULT_NOW,
        concurrency=4,
        extractor_factory=None,
        embedder_factory=None,
        entity_types: dict | None = None,
        with_context: bool = False,
        embed: bool = False,
    ):
        self.now = now
        self.concurrency = concurrency
        self.extractor_factory = extractor_factory
        self.embedder_factory = embedder_factory
        self.entity_types = entity_types
        self.with_context = with_context
        self.embed = embed
        self.kg: KGResult | None = None

    # ------------------------------------------------------- construction

    def build(self, pages_ds) -> KGResult:
        """pages (url, warc_ts, html, text, lang) -> full KG."""
        self.kg = build_kg(
            pages_ds,
            now=self.now,
            concurrency=self.concurrency,
            embed=self.embed,
            client_factory=self.extractor_factory,
            embedder_factory=self.embedder_factory,
            entity_types=self.entity_types,
            with_context=self.with_context,
        )
        return self.kg

    def build_incremental(self, pages_ds) -> KGResult:
        """Add pages ON TOP of the current graph (build() / load()
        first) — add_episode-vs-existing-graph semantics
        (graphiti.py:351-375); see pipelines.kg.build_kg_incremental."""
        self.kg = build_kg_incremental(
            self._require(),
            pages_ds,
            now=self.now,
            concurrency=self.concurrency,
            client_factory=self.extractor_factory,
            entity_types=self.entity_types,
        )
        return self.kg

    def add_triplets(self, triples_ds) -> KGResult:
        """Insert user-supplied facts directly — the batch analog of
        ``Graphiti.add_triplet`` (graphiti.py:723-757). Rows:
        (group_id, subj, pred, obj, fact[, valid_at, invalid_at,
        created_at]). Endpoints resolve against the current canonical
        graph, the edge enters the same dedupe + contradiction sweep,
        no episodic provenance is created."""
        from .pipelines.kg import add_triplets

        self.kg = add_triplets(
            self._require(), triples_ds, now=self.now,
            entity_types=self.entity_types,
        )
        return self.kg

    def add_triplet(
        self, subj: str, pred: str, obj: str, *, fact: str | None = None,
        group_id: str = "", valid_at=None, invalid_at=None,
    ) -> KGResult:
        """Single-triple convenience over :meth:`add_triplets`."""
        import pandas as pd
        import ray.data as rd

        row = {
            "group_id": [group_id],
            "subj": [subj],
            "pred": [pred],
            "obj": [obj],
            "fact": [fact if fact is not None else f"{subj} {pred} {obj}"],
        }
        if valid_at is not None:
            row["valid_at"] = [valid_at]
        if invalid_at is not None:
            row["invalid_at"] = [invalid_at]
        return self.add_triplets(rd.from_pandas(pd.DataFrame(row)))

    def load(self, kg_dir: str) -> KGResult:
        """Load a materialized store (run_kg_to_dir layout) as the
        current graph — enables build_incremental on top of a past
        run. The uuid_map is not persisted (aliases are already
        applied); it loads as empty."""
        import pyarrow as pa
        import ray.data as rd

        from .state import store

        empty_map = rd.from_arrow(
            pa.table(
                {
                    "old_uuid": pa.array([], pa.string()),
                    "canonical_uuid": pa.array([], pa.string()),
                    "group_id": pa.array([], pa.string()),
                    "old_name": pa.array([], pa.string()),
                }
            )
        )
        self.kg = KGResult(
            episodes=store.load_table(kg_dir, "episodes"),
            nodes=store.load_table(kg_dir, "nodes"),
            edges=store.load_table(kg_dir, "edges"),
            mentions=store.load_table(kg_dir, "mentions"),
            triples=store.load_table(kg_dir, "triples"),
            uuid_map=empty_map,
        )
        return self.kg

    def build_from_episodes(self, episodes_ds) -> KGResult:
        """Episodes from any source (pages / messages / json —
        sources/episodes.py) -> full KG."""
        from .stages import canonicalize, edges as edge_stage, extract
        from .pipelines.kg import _dedupe_mentions, build_triples

        extracted = extract.extract_all(
            episodes_ds,
            concurrency=self.concurrency,
            client_factory=self.extractor_factory,
        ).materialize()
        nodes_raw, edges_raw, mentions_raw = extract.split_extracted(extracted)
        nodes, uuid_map, alias = canonicalize.canonicalize_nodes(nodes_raw)
        nodes = nodes.materialize()
        edges = edge_stage.resolve_edges(
            edges_raw, alias, self.now, uuid_map_ds=uuid_map
        ).materialize()
        mentions = _dedupe_mentions(mentions_raw, alias, uuid_map_ds=uuid_map).materialize()
        triples = build_triples(edges, nodes, nodes_count=nodes.count())
        self.kg = KGResult(
            episodes=episodes_ds, nodes=nodes, edges=edges,
            mentions=mentions, triples=triples, uuid_map=uuid_map,
        )
        return self.kg

    def build_to_dir(self, pages_ds, out_dir: str, resume: bool = True) -> dict:
        """Materialize with checkpoint-resume + lineage (S4/S5)."""
        return run_kg_to_dir(
            pages_ds, out_dir, now=self.now, resume=resume, concurrency=self.concurrency
        )

    # ------------------------------------------------------------ queries

    def _require(self) -> KGResult:
        if self.kg is None:
            raise RuntimeError("call build() first")
        return self.kg

    def search(
        self, query: str, config=None, filters=None,
        group_ids: list[str] | None = None,
    ) -> dict[str, list[str]]:
        """Hybrid 3-way search (Q1). ``group_ids`` scopes every lane to
        the listed partitions (graphiti.py:630-640)."""
        from dataclasses import replace

        from .search.config import hybrid_search
        from .search.search import SearchFilters

        if group_ids is not None:
            filters = replace(
                filters or SearchFilters(), group_ids=group_ids
            )
        kg = self._require()
        return hybrid_search(
            query, nodes_ds=kg.nodes, edges_ds=kg.edges, config=config, filters=filters
        )

    def retrieve_episodes(
        self, reference_time, last_n: int = 3,
        group_ids: list[str] | None = None,
    ):
        """Last ``last_n`` episodes at/before ``reference_time``
        (chronological), optionally scoped to ``group_ids`` —
        reference ``retrieve_episodes`` (graphiti.py:221-252)."""
        from .state.graph_ops import retrieve_episodes

        return retrieve_episodes(
            self._require().episodes, reference_time,
            last_n=last_n, group_ids=group_ids,
        )

    def search_nodes(self, query: str, limit: int = 10) -> list[str]:
        from .search import node_search

        return node_search(self._require().nodes, query, limit=limit)

    def search_edges(self, query: str, limit: int = 10) -> list[str]:
        from .search import edge_search

        return edge_search(self._require().edges, query, limit=limit)

    def episode_windows(self):
        from .stages.summarize import episode_windows

        return episode_windows(self._require().episodes)

    def build_communities(self, group_ids: list[str] | None = None):
        """Cluster entities into communities; ``group_ids`` restricts
        the run to the listed partitions (graphiti.py:606-613)."""
        from .stages.communities import build_communities

        kg = self._require()
        return build_communities(kg.nodes, kg.edges, group_ids=group_ids)

    def update_communities(self, membership_ds, new_nodes_ds):
        """Incrementally fold NEW entities into an existing membership
        (reference ``update_community``, community_operations.py:240-325)
        instead of re-running label propagation: each new entity joins
        the plurality community of its neighbors in the CURRENT graph
        (call after build_incremental so the new edges exist); affected
        communities re-summarize, everything else streams through.
        D10 SURVEY.md §2.5."""
        from .stages.communities import update_communities

        return update_communities(
            membership_ds, new_nodes_ds, self._require().edges
        )

    def get_by_episode(self, episode_uuid: str) -> dict:
        from .state.graph_ops import get_by_episode

        return get_by_episode(self._require(), episode_uuid)

    def remove_episode(self, episode_uuid: str) -> dict:
        from .state.graph_ops import remove_episode

        return remove_episode(self._require(), episode_uuid)

    def summaries(self):
        from .stages.summarize import summarize_nodes

        kg = self._require()
        return summarize_nodes(kg.nodes, kg.edges)

    def build_indices_and_constraints(self, index_dir: str) -> dict:
        """The batch analog of the reference's index DDL
        (graphiti.py:181-190 -> graph_data_operations.py:31-92): builds
        the PERSISTED search indices over the current graph — a BM25
        inverted index over edge facts and one over node names
        (search/index.py), plus an IVF vector index over node name
        embeddings when the graph carries them (build(embed=True)).
        Queries then hit partition-pruned postings/lists instead of
        rescanning the tables."""
        import os

        from .search.index import build_text_index

        kg = self._require()
        out = {
            "edge_facts": build_text_index(
                kg.edges, "fact", "uuid", os.path.join(index_dir, "edge_facts")
            ),
            "node_names": build_text_index(
                kg.nodes, "name", "uuid", os.path.join(index_dir, "node_names")
            ),
        }
        base = kg.nodes.schema()
        names = getattr(base, "names", None) or base.base_schema.names
        if "name_embedding" in names:
            from .search.vindex import build_vector_index

            out["node_vectors"] = build_vector_index(
                kg.nodes.map_batches(
                    lambda t: t.select(["uuid", "name_embedding"]),
                    batch_format="pyarrow",
                ),
                "name_embedding", "uuid", os.path.join(index_dir, "node_vectors"),
            )
        return out
