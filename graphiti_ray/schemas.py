"""Arrow schemas for every logical table (SURVEY.md §1.4).

Graphiti models records as Pydantic objects persisted to Neo4j
(graphiti_core/nodes.py:78-140, edges.py:41-197). Here each record type
is one Arrow-schema'd table; blocks are ``pyarrow.Table``.

Timestamp convention: ``timestamp[us]``, naive UTC. The reference forces
tz-aware UTC everywhere (graphiti_core/utils/datetime_utils.py:25-42);
naive-UTC is the Arrow/DuckDB-friendly equivalent and is documented as
the engine-wide convention.
"""

from __future__ import annotations

import pyarrow as pa

TS = pa.timestamp("us")

# Primary input: Common-Crawl-style web pages (BASELINE.json input_hint).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", TS),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# EpisodicNode analog (graphiti_core/nodes.py:130-140). One row per page.
# episode_uuid is deterministic: sha1(url|warc_ts) -- reruns are idempotent.
EPISODES = pa.schema(
    [
        ("episode_uuid", pa.string()),
        ("group_id", pa.string()),  # domain of the url ("partition of the graph", nodes.py:81)
        ("url", pa.string()),
        ("content", pa.string()),  # extracted text; byte-identical per url
        ("valid_at", TS),  # = warc_ts ("when the original document was created", nodes.py:137)
        ("source", pa.string()),  # EpisodeType analog: text|json|message (nodes.py:42-64)
        ("lang", pa.string()),
        ("partition_id", pa.int32()),
    ]
)

# EntityNode analog, pre-canonicalization (graphiti_core/nodes.py:255-260).
# uuid is deterministic: sha1('node'|group_id|name_norm) -- so exact
# duplicates (node_name_match, bulk_utils.py:243-253) collide by key.
NODES_RAW = pa.schema(
    [
        ("uuid", pa.string()),
        ("name", pa.string()),
        ("name_norm", pa.string()),
        ("group_id", pa.string()),
        ("labels", pa.list_(pa.string())),
        ("created_at", TS),
        ("partition_id", pa.int32()),
    ]
)

NODES = pa.schema(
    [
        ("uuid", pa.string()),
        ("name", pa.string()),
        ("name_norm", pa.string()),
        ("group_id", pa.string()),
        ("labels", pa.list_(pa.string())),
        ("summary", pa.large_string()),
        ("created_at", TS),
        ("n_mentions", pa.int64()),
        ("partition_id", pa.int32()),
    ]
)

# EntityEdge analog (graphiti_core/edges.py:181-197): the fact triple with
# bi-temporal validity. valid_at/invalid_at are event time, created_at/
# expired_at ingestion time (README.md:66 "Bi-Temporal Data Model").
EDGES_RAW = pa.schema(
    [
        ("uuid", pa.string()),
        ("source_node_uuid", pa.string()),
        ("target_node_uuid", pa.string()),
        ("name", pa.string()),  # ALL-CAPS predicate
        ("fact", pa.large_string()),
        ("fact_norm", pa.string()),
        ("episodes", pa.list_(pa.string())),
        ("group_id", pa.string()),
        ("created_at", TS),
        ("valid_at", TS),  # nullable
        ("invalid_at", TS),  # nullable
        ("partition_id", pa.int32()),
    ]
)

EDGES = pa.schema(
    list(EDGES_RAW)
    + [
        ("expired_at", TS),  # transaction-time tombstone (edges.py:190-192)
    ]
)

# EpisodicEdge / MENTIONS analog (graphiti_core/edges.py:77-91).
MENTIONS = pa.schema(
    [
        ("episode_uuid", pa.string()),
        ("entity_uuid", pa.string()),
        ("group_id", pa.string()),
        ("created_at", TS),
        ("partition_id", pa.int32()),
    ]
)

# uuid remap produced by canonicalization (bulk_utils.py:352-374) -- a
# Dataset (or broadcast dict when small), never driver-only state.
UUID_MAP = pa.schema(
    [
        ("old_uuid", pa.string()),
        ("canonical_uuid", pa.string()),
        ("group_id", pa.string()),
    ]
)

# Final (subj, pred, obj) triples with validity intervals.
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("fact", pa.large_string()),
        ("valid_at", TS),
        ("invalid_at", TS),
        ("group_id", pa.string()),
        ("episode_uuid", pa.string()),  # first provenance episode
        ("partition_id", pa.int32()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
