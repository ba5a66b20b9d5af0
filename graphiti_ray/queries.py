"""Registry of driver-checkable queries (one per implemented operator /
pipeline from SURVEY.md §2) and their DuckDB oracle SQL.

Conventions (driver contract):
- every callable takes sf_dir and returns a Dataset / DataFrame / Table;
- computed columns are named identically in the Ray code and the SQL;
- genuinely non-SQL-expressible pipelines (the KG construction chain:
  hash-uuid minting, alias canonicalization, temporal sweep) have no
  oracle entry -> the driver records a rows-only check; their strong
  correctness gate is tests/test_pipeline_e2e.py against the
  single-process oracle (P/R == 1.0).
"""

from __future__ import annotations

from datetime import datetime
from functools import lru_cache

NOW = datetime(2026, 1, 1)


# --------------------------------------------------------------- KG cache

@lru_cache(maxsize=2)
def _kg(sf_dir: str):
    from .pipelines.kg import build_kg
    from .sources.pages import synthetic_pages

    return build_kg(synthetic_pages(sf_dir), now=NOW, concurrency=4)


# ----------------------------------------------------------- KG queries

def kg_triples(sf_dir: str):
    """Flagship: full construction -> (subj, pred, obj) triples."""
    return _kg(sf_dir).triples


def kg_nodes(sf_dir: str):
    return _kg(sf_dir).nodes


def kg_edges(sf_dir: str):
    """Canonical bi-temporal edges; episodes list rendered as count for
    schema stability."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "uuid": t.column("uuid"),
                "name": t.column("name"),
                "fact": pc.cast(t.column("fact"), pa.string()),
                "n_episodes": pc.list_value_length(t.column("episodes")),
                "valid_at": t.column("valid_at"),
                "invalid_at": t.column("invalid_at"),
                "expired_at": t.column("expired_at"),
            }
        )

    return _kg(sf_dir).edges.map_batches(proj, batch_format="pyarrow")


def kg_mentions(sf_dir: str):
    return _kg(sf_dir).mentions


def kg_uuid_map(sf_dir: str):
    return _kg(sf_dir).uuid_map


def kg_episodes_docs(sf_dir: str):
    """S3/M5 surface with a SQL oracle: pages derived arithmetically from
    the documents table -> html->text extraction. Byte-identical content
    is exactly what the value-hash compare proves."""
    import pyarrow as pa

    from .sources.pages import pages_from_documents
    from .stages.extract import pages_to_episodes

    eps = pages_to_episodes(pages_from_documents(sf_dir))

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["url", "group_id", "content", "lang"])

    return eps.map_batches(proj, batch_format="pyarrow")


KG_EPISODES_DOCS_SQL = """
SELECT 'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/doc' || CAST(doc_id AS VARCHAR) AS url,
       'site' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS group_id,
       text AS content,
       lang
FROM documents
"""


QUERIES = {
    "kg_triples": kg_triples,
    "kg_nodes": kg_nodes,
    "kg_edges": kg_edges,
    "kg_mentions": kg_mentions,
    "kg_uuid_map": kg_uuid_map,
    "kg_episodes_docs": kg_episodes_docs,
}

ORACLE_SQL = {
    "kg_episodes_docs": KG_EPISODES_DOCS_SQL,
}
