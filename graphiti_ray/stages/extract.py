"""Extraction stages: pages -> episodes -> (nodes_raw | edges_raw | mentions).

Ray-Data shape:
- ``pages_to_episodes``: stateless ``map_batches`` (zero-copy Arrow in),
  html->text (byte-identical per url, S3 analog), deterministic
  ``episode_uuid = sha1(url|warc_ts)`` (episode construction, S1/S2:
  graphiti_core/graphiti.py:254-335, 493-604).
- ``MentionRelationExtractor``: a stateful ACTOR-POOL class for
  ``map_batches(cls, concurrency=N)`` — patterns compiled once per actor
  in ``__init__`` (the batch analog of the model/LLM-client state the
  reference holds per process, llm_client/client.py:47-114), one fused
  pass per Arrow batch emitting entity mentions (M1,
  node_operations.py:121-212), fact triples (M2,
  edge_operations.py:73-148), edge dates (M3,
  temporal_operations.py:32-68) and MENTIONS provenance edges (M9,
  edge_operations.py:37-52).

The three record kinds come out of ONE extraction pass as a union table
with a ``kind`` column (node|edge|mention) so the expensive stage runs
once; downstream splits with cheap vectorized filters.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import edge_uuid, episode_uuid, node_uuid, partition_of
from ..functions.text import html_to_text, normalize_fact, normalize_name
from ..schemas import TS

DEFAULT_NUM_PARTITIONS = 32

EXTRACTED_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # node | edge | mention
        ("uuid", pa.string()),
        ("episode_uuid", pa.string()),
        ("group_id", pa.string()),
        ("partition_id", pa.int32()),
        ("created_at", TS),
        # node fields
        ("name", pa.string()),  # also the edge predicate for kind=edge
        ("name_norm", pa.string()),
        # edge fields
        ("source_node_uuid", pa.string()),
        ("target_node_uuid", pa.string()),
        ("fact", pa.large_string()),
        ("fact_norm", pa.string()),
        ("valid_at", TS),
        ("invalid_at", TS),
        # mention fields
        ("entity_uuid", pa.string()),
    ]
)


def group_id_of(url: str) -> str:
    """group_id = registrable host of the url — Graphiti's 'partition of
    the graph' (nodes.py:81); one web domain = one graph partition."""
    return urlparse(url).netloc or "unknown"


def pages_to_episodes_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    ts = batch.column("warc_ts")
    ts_us = pc.cast(ts, pa.int64()).to_pylist()
    html = batch.column("html").to_pylist()
    text = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()

    groups = [group_id_of(u) for u in urls]
    return pa.table(
        {
            "episode_uuid": pa.array(
                [episode_uuid(u, t) for u, t in zip(urls, ts_us)], pa.string()
            ),
            "group_id": pa.array(groups, pa.string()),
            "url": batch.column("url"),
            "content": pa.array(
                [html_to_text(h, t) for h, t in zip(html, text)], pa.string()
            ),
            "valid_at": ts,
            "source": pa.array(["text"] * len(urls), pa.string()),
            "lang": pa.array(langs, pa.string()),
            "partition_id": pa.array(
                [partition_of(g, DEFAULT_NUM_PARTITIONS) for g in groups], pa.int32()
            ),
        }
    )


def pages_to_episodes(pages_ds, batch_size: int = 2048):
    """pages -> episodes. Stateless tasks; Arrow in/out."""
    return pages_ds.map_batches(
        pages_to_episodes_batch, batch_format="pyarrow", batch_size=batch_size
    )


def filter_pages_by_partition(pages_ds, skip: set[int]):
    """Drop pages whose partition is in ``skip`` BEFORE the html->text
    parse: partition_id is a pure function of the url
    (partition_of(group_id_of(url))), so checkpoint-resume and wave
    scheduling can prune the input at the raw-pages stage instead of
    paying the parse for rows that are immediately filtered out."""
    skip_arr = pa.array(sorted(skip), pa.int32())

    def f(t: pa.Table) -> pa.Table:
        pids = pa.array(
            [
                partition_of(group_id_of(u), DEFAULT_NUM_PARTITIONS)
                for u in t.column("url").to_pylist()
            ],
            pa.int32(),
        )
        return t.filter(pc.invert(pc.is_in(pids, value_set=skip_arr)))

    return pages_ds.map_batches(f, batch_format="pyarrow")


class MentionRelationExtractor:
    """Fused M1+M2+M3+M9 actor. State (extractor client with response
    cache; in production an NER/LLM model) built once per actor;
    __call__ handles one Arrow batch of episodes and emits the union
    extraction table. ``client_factory`` is the §2.9 pluggability seam
    (functions/clients.py — any ExtractorClient drops in; clients whose
    ``extract`` accepts ``previous_episodes`` receive the T4 context
    window when the batch carries a ``prev_episodes`` column)."""

    def __init__(self, langs: tuple[str, ...] = ("en",), client_factory=None):
        import inspect

        from ..functions.clients import DeterministicExtractorClient

        self.client = (client_factory or DeterministicExtractorClient)()
        self.langs = set(langs)
        # batched-protocol check ONCE per actor: a client exposing
        # ``extract_batch(contents, reference_times,
        # previous_episodes=None)`` gets the whole Arrow batch in one
        # call (the client chunks into its own request_batch) — with a
        # remote model this is one request per chunk instead of one per
        # episode, the same scale fix the embedder already has
        self.batched = callable(getattr(self.client, "extract_batch", None))
        # signature check ONCE per actor (not per row): does the client
        # take the context-window argument on the method we will call?
        try:
            meth = self.client.extract_batch if self.batched else self.client.extract
            params = inspect.signature(meth).parameters
            self.passes_context = "previous_episodes" in params
        except (TypeError, ValueError):
            self.passes_context = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in EXTRACTED_SCHEMA.names}

        def emit(kind: str, **kw) -> None:
            cols["kind"].append(kind)
            for name in EXTRACTED_SCHEMA.names:
                if name != "kind":
                    cols[name].append(kw.get(name))

        ep_uuids = batch.column("episode_uuid").to_pylist()
        groups = batch.column("group_id").to_pylist()
        contents = batch.column("content").to_pylist()
        valid_ats = batch.column("valid_at").to_pylist()
        langs = batch.column("lang").to_pylist()
        parts = batch.column("partition_id").to_pylist()
        if self.passes_context and "prev_episodes" in batch.schema.names:
            ctxs = batch.column("prev_episodes").to_pylist()
        else:
            ctxs = [None] * batch.num_rows

        rows = [
            (ep, grp, content, ref_ts, part, ctx)
            for ep, grp, content, ref_ts, lang, part, ctx in zip(
                ep_uuids, groups, contents, valid_ats, langs, parts, ctxs
            )
            if lang in self.langs
        ]
        if self.batched and rows:
            exs = self.client.extract_batch(
                [r[2] for r in rows],
                [r[3] for r in rows],
                previous_episodes=(
                    [r[5] for r in rows] if self.passes_context else None
                ),
            )
        elif self.passes_context:
            exs = [
                self.client.extract(content, ref_ts, previous_episodes=ctx)
                for _, _, content, ref_ts, _, ctx in rows
            ]
        else:
            exs = [
                self.client.extract(content, ref_ts)
                for _, _, content, ref_ts, _, _ in rows
            ]

        for (ep, grp, content, ref_ts, part, ctx), ex in zip(rows, exs):
            name_to_uuid: dict[str, str] = {}
            for ent in ex.entities:
                norm = normalize_name(ent)
                nuid = node_uuid(grp, norm)
                name_to_uuid[ent] = nuid
                emit(
                    "node",
                    uuid=nuid,
                    episode_uuid=ep,
                    group_id=grp,
                    partition_id=part,
                    created_at=ref_ts,
                    name=ent,
                    name_norm=norm,
                )
                emit(
                    "mention",
                    uuid=None,
                    episode_uuid=ep,
                    group_id=grp,
                    partition_id=part,
                    created_at=ref_ts,
                    entity_uuid=nuid,
                )
            for rel in ex.relations:
                src = name_to_uuid[rel.subj]
                tgt = name_to_uuid[rel.obj]
                fnorm = normalize_fact(rel.fact)
                emit(
                    "edge",
                    uuid=edge_uuid(grp, src, tgt, rel.pred, fnorm),
                    episode_uuid=ep,
                    group_id=grp,
                    partition_id=part,
                    created_at=ref_ts,
                    name=rel.pred,
                    source_node_uuid=src,
                    target_node_uuid=tgt,
                    fact=rel.fact,
                    fact_norm=fnorm,
                    valid_at=rel.valid_at,
                    invalid_at=rel.invalid_at,
                )
        arrays = [
            pa.array(cols[f.name], type=f.type) for f in EXTRACTED_SCHEMA
        ]
        return pa.Table.from_arrays(arrays, schema=EXTRACTED_SCHEMA)


def episodes_with_context(episodes_ds):
    """Attach the T4 context window to every episode: a
    ``prev_episodes`` list column holding the previous up-to-3 episode
    CONTENTS of the same group in chronological order — the batch
    analog of the reference feeding previous_episodes into each
    extraction prompt (graphiti.py:318-341).

    Shape: episode_windows (one per-group lag shuffle) -> three tiered
    lookups prev-url -> content -> one list column -> one tiered lookup
    back onto the episode stream. Opt-in (extract_all with_context) —
    context-free extraction stays the zero-extra-shuffle default."""
    from .joins import lookup_column
    from .summarize import WINDOW, episode_windows

    eps = episodes_ds.materialize()
    n = eps.count()
    w = episode_windows(eps)
    for k in range(1, WINDOW + 1):
        w = lookup_column(
            w, f"prev{k}", eps, "url", "content", f"c{k}", mapping_rows=n
        )

    def to_ctx(t: pa.Table) -> pa.Table:
        ctx = [
            [c for c in cs if c is not None]
            for cs in zip(
                *[t.column(f"c{k}").to_pylist() for k in range(1, WINDOW + 1)]
            )
        ]
        return pa.table(
            {
                "url": t.column("url"),
                "ctx": pa.array(ctx, pa.list_(pa.string())),
            }
        )

    ctx_map = w.map_batches(to_ctx, batch_format="pyarrow")
    return lookup_column(
        eps, "url", ctx_map, "url", "ctx", "prev_episodes", mapping_rows=n
    )


def extract_all(episodes_ds, concurrency=4, batch_size: int = 512,
                client_factory=None, with_context: bool = False):
    """episodes -> union extracted table (kind in node|edge|mention).
    ``client_factory``: ExtractorClient constructor injected per actor.
    ``with_context``: wire the T4 window into the client (clients that
    do not accept previous_episodes silently ignore it)."""
    if with_context:
        episodes_ds = episodes_with_context(episodes_ds)
    kwargs = {}
    if client_factory is not None:
        kwargs["fn_constructor_kwargs"] = {"client_factory": client_factory}
    if isinstance(concurrency, int):
        # a fixed pool >= the cluster CPU count starves the upstream
        # read tasks of CPU slots and deadlocks (observed at
        # num_cpus=4 with concurrency=4) — autoscale in that case only;
        # a fitting fixed pool keeps deterministic ramp/throughput
        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 0) or 0)
            if ray.is_initialized()
            else 0
        )
        if cpus and concurrency >= cpus:
            concurrency = (1, concurrency)
    return episodes_ds.map_batches(
        MentionRelationExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **kwargs,
    )


def split_extracted(extracted_ds):
    """Split the union table into (nodes_raw, edges_raw, mentions) views.

    Cheap vectorized filters; caller should checkpoint/materialize the
    union first so extraction runs once (pipelines/kg.py does)."""

    def keep(kind: str, columns: list[str]):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind)).select(columns)

        return f

    nodes = extracted_ds.map_batches(
        keep("node", ["uuid", "name", "name_norm", "group_id", "episode_uuid",
                      "created_at", "partition_id"]),
        batch_format="pyarrow",
    )
    edges = extracted_ds.map_batches(
        keep("edge", ["uuid", "source_node_uuid", "target_node_uuid", "name",
                      "fact", "fact_norm", "episode_uuid", "group_id",
                      "created_at", "valid_at", "invalid_at", "partition_id"]),
        batch_format="pyarrow",
    )
    mentions = extracted_ds.map_batches(
        keep("mention", ["episode_uuid", "entity_uuid", "group_id",
                         "created_at", "partition_id"]),
        batch_format="pyarrow",
    )
    return nodes, edges, mentions
