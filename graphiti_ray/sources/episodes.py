"""Episode sources beyond web pages: message and json episode types
(S1-S3 parity).

The reference's EpisodeType enum is text | message | json
(graphiti_core/nodes.py:42-64); message content is rendered
"actor(role): content" by the ingest service
(server/graph_service/routers/ingest.py:60), json episodes carry the
raw serialized object (examples/ecommerce, manybirds_products.json).
Each source here is a stateless map_batches producing the SAME episode
schema the page path produces (stages/extract.pages_to_episodes), so
the extraction actor pool and everything downstream run unchanged on
any mix of sources.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import episode_uuid, partition_of
from ..stages.extract import DEFAULT_NUM_PARTITIONS


def _episode_table(names, groups, contents, ts_col, source: str, lang: str) -> pa.Table:
    ts_us = pc.cast(ts_col, pa.int64()).to_pylist()
    return pa.table(
        {
            "episode_uuid": pa.array(
                [episode_uuid(n, t) for n, t in zip(names, ts_us)], pa.string()
            ),
            "group_id": pa.array(groups, pa.string()),
            "url": pa.array(names, pa.string()),
            "content": pa.array(contents, pa.string()),
            "valid_at": ts_col,
            "source": pa.array([source] * len(names), pa.string()),
            "lang": pa.array([lang] * len(names), pa.string()),
            "partition_id": pa.array(
                [partition_of(g, DEFAULT_NUM_PARTITIONS) for g in groups], pa.int32()
            ),
        }
    )


def episodes_from_messages(
    msgs_ds,
    *,
    group_col: str = "conversation_id",
    actor_col: str = "actor",
    role_col: str | None = "role",
    content_col: str = "content",
    ts_col: str = "ts",
    id_col: str | None = None,
    lang: str = "en",
):
    """message episodes: content = "actor(role): content" (or
    "actor: content" without a role column).

    ``id_col``: optional stable per-message id column used for the
    episode name. Without one, the name is derived from the row's OWN
    data — sha1(group|ts|actor|content) — never from a batch-local
    index, so episode identity is invariant to block layout and two
    same-timestamp messages in one conversation cannot collide (they
    differ in actor/content)."""

    def f(t: pa.Table) -> pa.Table:
        from ..functions.hashing import sha1_hex

        actors = t.column(actor_col).to_pylist()
        roles = t.column(role_col).to_pylist() if role_col and role_col in t.schema.names else None
        bodies = t.column(content_col).to_pylist()
        groups = [str(g) for g in t.column(group_col).to_pylist()]
        if roles:
            contents = [f"{a}({r}): {c}" for a, r, c in zip(actors, roles, bodies)]
        else:
            contents = [f"{a}: {c}" for a, c in zip(actors, bodies)]
        if id_col and id_col in t.schema.names:
            mids = [str(m) for m in t.column(id_col).to_pylist()]
        else:
            ts_us = pc.cast(t.column(ts_col), pa.int64()).to_pylist()
            mids = [
                sha1_hex("msg", g, str(ts), a, c)[:16]
                for g, ts, a, c in zip(groups, ts_us, actors, bodies)
            ]
        names = [f"msg://{g}/{m}" for g, m in zip(groups, mids)]
        return _episode_table(names, groups, contents, t.column(ts_col), "message", lang)

    return msgs_ds.map_batches(f, batch_format="pyarrow")


def episodes_from_json(
    json_ds,
    *,
    group_col: str,
    id_col: str,
    payload_col: str,
    ts_col: str,
    lang: str = "en",
):
    """json episodes: content = canonical (sorted-keys) JSON string of
    the payload — deterministic across reruns."""

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        groups = [str(g) for g in t.column(group_col).to_pylist()]
        payloads = t.column(payload_col).to_pylist()
        contents = []
        for p in payloads:
            obj = json.loads(p) if isinstance(p, str) else p
            contents.append(json.dumps(obj, sort_keys=True))
        names = [f"json://{g}/{i}" for g, i in zip(groups, ids)]
        return _episode_table(names, groups, contents, t.column(ts_col), "json", lang)

    return json_ds.map_batches(f, batch_format="pyarrow")
