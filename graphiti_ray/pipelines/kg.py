"""Flagship pipeline: pages -> canonical knowledge graph.

Composition (SURVEY.md §7; the batch re-expression of
Graphiti.add_episode_bulk, graphiti_core/graphiti.py:493-604, PLUS the
temporal invalidation the bulk path skips — graphiti.py:526-528
documents that gap; here T2/T3 run on the bulk shape):

  pages --map_batches--> episodes          (S1/S2/S3; html->text)
        --actor-pool--> extracted union    (M1/M2/M3/M9)
        --split-->  nodes_raw | edges_raw | mentions_raw
  nodes_raw  --groupby(uuid) + blocking + CC--> nodes, uuid_map, alias
  edges_raw  --broadcast rewrite + groupby(pair) + groupby(subj,pred)-->
               edges (bi-temporal, expired_at stamped)
  mentions   --broadcast rewrite + groupby dedupe--> mentions
  edges x node-names --> triples

`now` (the expired_at stamp, reference utc_now at
edge_operations.py:257) is a parameter so outputs are deterministic;
default = max(warc_ts) + 1 day computed from the episodes.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.compute as pc

from ..stages import canonicalize, edges as edge_stage, extract
from ..stages.joins import lookup_column
from ..state import checkpoint as ckpt

DEFAULT_NOW = datetime(2026, 1, 1)


@dataclass
class KGResult:
    episodes: object
    nodes: object
    edges: object
    mentions: object
    triples: object
    uuid_map: object


def _dedupe_mentions(mentions_ds, alias, uuid_map_ds=None):
    """Rewrite mention pointers through the alias map (broadcast
    SortedKV, or the uuid_map hash join past the broadcast threshold —
    mandatory when alias is None because canonicalize skipped building
    it), then collapse duplicate (episode, entity) rows (aliases of one
    entity mentioned in the same episode merge after
    canonicalization)."""
    import ray

    from ..stages.edges import rewrite_pointers_join
    from ..stages.joins import BROADCAST_MAX_ROWS

    if alias is None and uuid_map_ds is None:
        raise ValueError("alias=None requires uuid_map_ds for the join path")
    if uuid_map_ds is not None and (
        alias is None or len(alias) > BROADCAST_MAX_ROWS
    ):
        mentions_ds = rewrite_pointers_join(mentions_ds, uuid_map_ds, ["entity_uuid"])

        def rewrite(t: pa.Table) -> pa.Table:
            return t

    else:
        from ..stages.joins import get_broadcast

        ref = ray.put(alias)

        def rewrite(t: pa.Table) -> pa.Table:
            a = get_broadcast(ref)
            if not len(a):
                return t
            return t.set_column(
                t.schema.get_field_index("entity_uuid"), "entity_uuid",
                a.rewrite_pa(t.column("entity_uuid")),
            )

    from ..functions.hashing import bucket_hex40

    NUM_BUCKETS = 256

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["episode_uuid", "entity_uuid"]).aggregate(
            [("group_id", "min"), ("created_at", "min"), ("partition_id", "min")]
        )
        g = g.rename_columns(
            ["episode_uuid", "entity_uuid", "group_id", "created_at", "partition_id"]
        )
        # bucketed exchange + one Arrow group_by per bucket (faster than
        # the sort-based per-key aggregate at this key cardinality).
        # Bucket = splitmix64 mix of the two uuid columns' u64 prefixes:
        # no concatenated key strings, no Python objects in the tag.
        return g.append_column(
            "mb",
            pa.array(
                bucket_hex40(
                    [g.column("episode_uuid"), g.column("entity_uuid")],
                    NUM_BUCKETS,
                    salt="mnb",
                ),
                pa.int32(),
            ),
        )

    def reduce_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["episode_uuid", "entity_uuid"]).aggregate(
            [("group_id", "min"), ("created_at", "min"), ("partition_id", "min")]
        )
        return g.rename_columns(
            ["episode_uuid", "entity_uuid", "group_id", "created_at", "partition_id"]
        )

    rewritten = mentions_ds.map_batches(rewrite, batch_format="pyarrow").map_batches(
        partial, batch_format="pyarrow"
    )
    from ..functions.exchange import bounded_group_map

    return bounded_group_map(rewritten, "mb", reduce_bucket, batch_format="pyarrow")


def build_triples(edges_ds, nodes_ds, nodes_count: int | None = None):
    """edges + node names -> (subj, pred, obj) triples.

    Node-name lookup is a broadcast (ray.put once) below
    joins.BROADCAST_MAX_ROWS distinct entities, else a hash join."""
    e = lookup_column(
        edges_ds, "source_node_uuid", nodes_ds, "uuid", "name", "subj",
        mapping_rows=nodes_count,
    )
    e = lookup_column(
        e, "target_node_uuid", nodes_ds, "uuid", "name", "obj",
        mapping_rows=nodes_count,
    )

    def project(t: pa.Table) -> pa.Table:
        eps = t.column("episodes")
        first_ep = pc.list_element(eps, 0)
        return pa.table(
            {
                "subj": t.column("subj"),
                "pred": t.column("name"),
                "obj": t.column("obj"),
                "fact": t.column("fact"),
                "valid_at": t.column("valid_at"),
                "invalid_at": t.column("invalid_at"),
                "group_id": t.column("group_id"),
                "episode_uuid": first_ep,
                "partition_id": t.column("partition_id"),
            }
        )

    return e.map_batches(project, batch_format="pyarrow")


def build_kg(
    pages_ds,
    *,
    now: datetime = DEFAULT_NOW,
    concurrency=4,
    skip_partitions: set[int] | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    embed: bool = False,
    client_factory=None,
    embedder_factory=None,
    entity_types: dict | None = None,
    with_context: bool = False,
) -> KGResult:
    """Run the full construction over a pages Dataset.

    checkpoint_dir: when set, the episodes and extraction stage outputs
    are spilled to parquet stage checkpoints (so the expensive extractor
    runs once even though three tables branch off it, and a rerun with
    resume=True skips completed stages). When None, the extraction union
    is materialized in the object store instead.

    client_factory: ExtractorClient constructor injected into each
    extraction actor (functions/clients.py seam); embedder_factory: the
    EmbedderClient constructor used when embed=True; entity_types: user
    type specs merged into node labels/attributes (classify_with);
    with_context: feed the T4 previous-episodes window to clients that
    accept it.
    """
    if skip_partitions:
        # prune at the RAW pages stage: partition_id is a pure function
        # of the url, so skipped partitions never pay the html parse
        pages_ds = extract.filter_pages_by_partition(pages_ds, skip_partitions)
    episodes = extract.pages_to_episodes(pages_ds)
    if checkpoint_dir:
        episodes = ckpt.stage_checkpoint(
            episodes, os.path.join(checkpoint_dir, "episodes"), resume
        )
    extracted = extract.extract_all(
        episodes, concurrency=concurrency, client_factory=client_factory,
        with_context=with_context,
    )
    import time as _time

    _t0 = _time.time()
    if checkpoint_dir:
        extracted = ckpt.stage_checkpoint(
            extracted, os.path.join(checkpoint_dir, "extracted"), resume
        )
    else:
        extracted = extracted.materialize()
    _t1 = _time.time()

    nodes_raw, edges_raw, mentions_raw = extract.split_extracted(extracted)
    nodes, uuid_map, alias = canonicalize.canonicalize_nodes(
        nodes_raw, entity_types=entity_types
    )
    _t_canon = _time.time()
    # canonical nodes/edges/mentions are orders of magnitude smaller
    # than the input; materializing lets every downstream consumer
    # (triples, communities, search, degree aggregates) reuse them
    # instead of re-running the resolution shuffles. The three branches
    # are independent -> materialize CONCURRENTLY so their stages share
    # the cluster instead of running as back-to-back barriers.
    from concurrent.futures import ThreadPoolExecutor

    def _timed(fn):
        def run():
            out = fn()
            return out, _time.time()

        return run

    from ..functions.exchange import coalesced

    with ThreadPoolExecutor(max_workers=3) as ex:
        # coalesced(): the canonical tables are orders of magnitude
        # smaller than the extraction output but inherit its BLOCK
        # COUNT — rebounding to cluster width here keeps every
        # downstream exchange (communities, summaries, search lanes,
        # degree aggregates) at O(width^2) scheduling instead of
        # O(extraction_blocks^2)
        f_nodes = ex.submit(_timed(lambda: coalesced(nodes.materialize())))
        f_edges = ex.submit(
            _timed(lambda: coalesced(edge_stage.resolve_edges(
                edges_raw, alias, now, uuid_map_ds=uuid_map
            ).materialize()))
        )
        f_mentions = ex.submit(
            _timed(lambda: coalesced(_dedupe_mentions(
                mentions_raw, alias, uuid_map_ds=uuid_map
            ).materialize()))
        )
        nodes, tn = f_nodes.result()
        edges, te = f_edges.result()
        mentions, tm = f_mentions.result()
    if os.environ.get("GRAFT_BENCH_PHASES"):
        import sys as _sys

        print(f"# build_kg phases: extract={_t1 - _t0:.1f}s "
              f"canon-eager={_t_canon - _t1:.1f}s "
              f"branches={_time.time() - _t_canon:.1f}s "
              f"(nodes +{tn - _t_canon:.1f}s, edges +{te - _t_canon:.1f}s, "
              f"mentions +{tm - _t_canon:.1f}s)", file=_sys.stderr)
    triples = build_triples(edges, nodes, nodes_count=nodes.count())
    if embed:
        # A3: fill embedding columns via the actor-pool embed stage
        # (name_embedding on nodes, fact_embedding on edges); the
        # search cosine lane reads the stored columns when present
        from ..stages.embed_stage import HashEmbedder, add_embeddings

        ef = embedder_factory or HashEmbedder
        nodes = add_embeddings(nodes, "name", "name_embedding", embedder_factory=ef)
        edges = add_embeddings(edges, "fact", "fact_embedding", embedder_factory=ef)
    return KGResult(
        episodes=episodes,
        nodes=nodes,
        edges=edges,
        mentions=mentions,
        triples=triples,
        uuid_map=uuid_map,
    )


RAW_EDGE_COLS = [
    "uuid", "source_node_uuid", "target_node_uuid", "name", "fact",
    "fact_norm", "episode_uuid", "group_id", "created_at", "valid_at",
    "invalid_at", "partition_id",
]
MENTION_COLS = ["episode_uuid", "entity_uuid", "group_id", "created_at", "partition_id"]


def _explode_prior_edges(t: pa.Table) -> pa.Table:
    """Canonical edges -> raw-shaped rows (one per provenance episode)
    so a prior graph's edges re-enter the pair-group merge; the merge
    re-collapses them and unions provenance with any new facts."""
    eps = t.column("episodes").to_pylist()
    take_idx: list[int] = []
    ep_out: list[str | None] = []
    for i, lst in enumerate(eps):
        for e in lst if lst else [None]:
            take_idx.append(i)
            ep_out.append(e)
    x = t.take(pa.array(take_idx, pa.int64()))  # typed: [] infers null otherwise
    cols = {c: x.column(c) for c in RAW_EDGE_COLS if c != "episode_uuid"}
    cols["episode_uuid"] = pa.array(ep_out, pa.string())
    return pa.table({c: cols[c] for c in RAW_EDGE_COLS})


def build_kg_incremental(
    prior: KGResult,
    pages_ds,
    *,
    now: datetime = DEFAULT_NOW,
    concurrency=4,
    client_factory=None,
    entity_types: dict | None = None,
) -> KGResult:
    """Add new pages ON TOP of an existing graph — the batch analog of
    add_episode against an existing store (graphiti.py:351-375): new
    extraction resolves against the prior CANONICAL nodes (exact merge
    unions them as pre-combined rows; blocking/alias matching sees
    prior + new entities together, so a new surface form can merge into
    — or win over — an existing node), prior canonical edges re-enter
    the pair merge as exploded provenance rows, and the temporal sweep
    re-runs over the union (its closes are stable: a stored invalid_at
    is kept unless a NEW earlier contradiction exists, matching a
    from-scratch rebuild).

    Matching scope mirrors the reference: new names resolve against the
    existing graph's canonical nodes, not against aliases already
    merged away in the prior build. Likewise 'ended'-marker facts stay
    folded into whichever open edge existed WHEN THEY ARRIVED (the
    reference's per-arrival semantic, edge_operations.py:308-381) — a
    from-scratch rebuild may re-attribute a marker's provenance to a
    newer fact the increment introduced; everything else (nodes,
    mentions, triple facts and temporal closes) matches the rebuild
    exactly (pinned by tests/test_extensions.py)."""
    from ..stages import extract

    episodes_new = extract.pages_to_episodes(pages_ds)
    extracted = extract.extract_all(
        episodes_new, concurrency=concurrency, client_factory=client_factory
    ).materialize()
    nodes_raw, edges_raw, mentions_raw = extract.split_extracted(extracted)
    return _assemble_on_prior(
        prior, nodes_raw, edges_raw, mentions_raw,
        episodes_new=episodes_new, now=now, entity_types=entity_types,
    )


def _assemble_on_prior(
    prior: KGResult,
    nodes_raw,
    edges_raw,
    mentions_raw,
    *,
    episodes_new=None,
    now: datetime = DEFAULT_NOW,
    entity_types: dict | None = None,
) -> KGResult:
    """Shared resolve-against-existing-graph tail of the incremental
    paths (build_kg_incremental / add_triplets): canonicalize new raw
    nodes vs the prior canonical set, re-enter prior edges into the
    pair merge, re-run the sweep, rewrite mention pointers."""
    from ..stages import canonicalize, edges as edge_stage

    nodes, uuid_map, alias = canonicalize.canonicalize_nodes(
        nodes_raw, entity_types=entity_types, prior_nodes_ds=prior.nodes
    )
    nodes = nodes.materialize()

    edges_input = edges_raw.map_batches(
        lambda t: t.select(RAW_EDGE_COLS), batch_format="pyarrow"
    ).union(prior.edges.map_batches(_explode_prior_edges, batch_format="pyarrow"))
    mentions_input = mentions_raw.map_batches(
        lambda t: t.select(MENTION_COLS), batch_format="pyarrow"
    ).union(
        prior.mentions.map_batches(
            lambda t: t.select(MENTION_COLS), batch_format="pyarrow"
        )
    )

    edges = edge_stage.resolve_edges(
        edges_input, alias, now, uuid_map_ds=uuid_map
    ).materialize()
    mentions = _dedupe_mentions(mentions_input, alias, uuid_map_ds=uuid_map).materialize()
    triples = build_triples(edges, nodes, nodes_count=nodes.count())
    if episodes_new is None:
        episodes = prior.episodes
    elif prior.episodes is not None:
        episodes = prior.episodes.union(episodes_new)
    else:
        episodes = episodes_new
    return KGResult(
        episodes=episodes,
        nodes=nodes,
        edges=edges,
        mentions=mentions,
        triples=triples,
        uuid_map=uuid_map,
    )


TRIPLET_COLS = ["group_id", "subj", "pred", "obj", "fact"]


def add_triplets(
    prior: KGResult,
    triples_ds,
    *,
    now: datetime = DEFAULT_NOW,
    entity_types: dict | None = None,
) -> KGResult:
    """Direct fact insertion — the batch analog of Graphiti.add_triplet
    (graphiti.py:723-757), vectorized over a Dataset of rows
    ``(group_id, subj, pred, obj, fact[, valid_at, invalid_at,
    created_at])`` instead of one (node, edge, node) object at a time:

      - both endpoint surfaces resolve against the EXISTING canonical
        graph exactly like extracted entities (resolve_extracted_nodes
        semantics — the same exact-merge + blocking/alias match the
        pipeline uses, so 'Ana Barton' merges into an existing Ana node);
      - the edge enters the same pair merge as extraction output
        (dedupe_extracted_edge semantics: an identical fact folds into
        the existing edge's provenance) and the contradiction sweep
        re-runs (get_edge_contradictions/resolve_edge_contradictions);
      - NO episodic provenance is created — the reference saves no
        EpisodicEdges on this path (graphiti.py:755-757), so mentions
        and episodes pass through unchanged.

    Missing optional columns default to: valid_at/invalid_at NULL,
    created_at = ``now``. partition_id is inherited as 0 (this path has
    no source partition; the store treats it as the catch-all shard).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import edge_uuid, node_uuid
    from ..functions.text import normalize_fact, normalize_name

    def synth(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = set(t.schema.names)
        grps = t.column("group_id").to_pylist()
        subjs = t.column("subj").to_pylist()
        preds = t.column("pred").to_pylist()
        objs = t.column("obj").to_pylist()
        facts = t.column("fact").to_pylist()

        def opt(col, default):
            return t.column(col).to_pylist() if col in names else [default] * n

        valid = opt("valid_at", None)
        invalid = opt("invalid_at", None)
        created = opt("created_at", now)

        rows: dict[str, list] = {k: [] for k in (
            "kind", "uuid", "source_node_uuid", "target_node_uuid", "name",
            "name_norm", "fact", "fact_norm", "episode_uuid", "entity_uuid",
            "group_id", "created_at", "valid_at", "invalid_at", "partition_id",
        )}

        def emit(kind, **kw):
            rows["kind"].append(kind)
            for k in rows:
                if k != "kind":
                    rows[k].append(kw.get(k))

        for g, s, p, o, f, va, ia, ca in zip(
            grps, subjs, preds, objs, facts, valid, invalid, created
        ):
            su = node_uuid(g, normalize_name(s))
            ou = node_uuid(g, normalize_name(o))
            for name, uid in ((s, su), (o, ou)):
                emit("node", uuid=uid, name=name,
                     name_norm=normalize_name(name), group_id=g,
                     created_at=ca, partition_id=0)
            fn = normalize_fact(f)
            emit("edge", uuid=edge_uuid(g, su, ou, p, fn),
                 source_node_uuid=su, target_node_uuid=ou, name=p,
                 fact=f, fact_norm=fn, group_id=g, created_at=ca,
                 valid_at=va, invalid_at=ia, partition_id=0)
        return pa.table(
            {
                "kind": pa.array(rows["kind"], pa.string()),
                "uuid": pa.array(rows["uuid"], pa.string()),
                "source_node_uuid": pa.array(rows["source_node_uuid"], pa.string()),
                "target_node_uuid": pa.array(rows["target_node_uuid"], pa.string()),
                "name": pa.array(rows["name"], pa.string()),
                "name_norm": pa.array(rows["name_norm"], pa.string()),
                "fact": pa.array(rows["fact"], pa.large_string()),
                "fact_norm": pa.array(rows["fact_norm"], pa.string()),
                "episode_uuid": pa.array(rows["episode_uuid"], pa.string()),
                "entity_uuid": pa.array(rows["entity_uuid"], pa.string()),
                "group_id": pa.array(rows["group_id"], pa.string()),
                "created_at": pa.array(rows["created_at"], pa.timestamp("us")),
                "valid_at": pa.array(rows["valid_at"], pa.timestamp("us")),
                "invalid_at": pa.array(rows["invalid_at"], pa.timestamp("us")),
                "partition_id": pa.array(rows["partition_id"], pa.int32()),
            }
        )

    union = triples_ds.map_batches(synth, batch_format="pyarrow").materialize()

    def keep(kind, cols):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind)).select(cols)

        return f

    nodes_raw = union.map_batches(
        keep("node", ["uuid", "name", "name_norm", "group_id", "episode_uuid",
                      "created_at", "partition_id"]),
        batch_format="pyarrow",
    )
    edges_raw = union.map_batches(
        keep("edge", RAW_EDGE_COLS), batch_format="pyarrow"
    )
    mentions_raw = union.map_batches(
        keep("mention", MENTION_COLS), batch_format="pyarrow"
    )  # always empty: no episodic provenance on this path
    return _assemble_on_prior(
        prior, nodes_raw, edges_raw, mentions_raw,
        episodes_new=None, now=now, entity_types=entity_types,
    )


def run_kg_to_dir(
    pages_ds,
    out_dir: str,
    *,
    now: datetime = DEFAULT_NOW,
    resume: bool = True,
    concurrency=4,
    wave_size: int | None = None,
) -> dict:
    """Materialize the KG to partitioned parquet with per-partition
    lineage and checkpoint-resume (state/checkpoint.py docstring).

    ``wave_size`` bounds the checkpoint interval: partitions are
    processed in sequential waves of that many partition_ids, with a
    manifest appended after EACH wave — so a kill (SIGKILL, OOM,
    preemption) loses at most one in-flight wave, not the whole run.
    This is the production shape for a 100-TB run (you cannot stream
    the entire corpus inside one un-checkpointed execution and hope);
    the default (None = one wave) keeps the single-execution fast path
    for small corpora. Each wave re-runs the cheap vectorized
    partition filter at the episodes stage; the expensive stages
    (extraction, canonicalization, temporal sweep) see only the wave's
    rows. bench.py --resume-proof kills a waved run mid-flight for
    real and measures that the resume pays only for the missing waves.
    """
    t0 = time.time()
    completed = ckpt.completed_partitions(out_dir) if resume else set()
    ckpt.clean_incomplete(out_dir, completed)

    if wave_size:
        from ..stages.extract import DEFAULT_NUM_PARTITIONS

        remaining = [
            p for p in range(DEFAULT_NUM_PARTITIONS) if p not in completed
        ]
        agg = {"partitions_processed": [], "skipped": sorted(completed),
               "waves": 0}
        for i in range(0, len(remaining), wave_size):
            wave = set(remaining[i : i + wave_size])
            skip = set(range(DEFAULT_NUM_PARTITIONS)) - wave
            r = _run_kg_once(pages_ds, out_dir, now, skip, concurrency)
            agg["partitions_processed"].extend(r["partitions_processed"])
            agg["waves"] += 1
        agg["partitions_processed"].sort()
        agg["wall_s"] = time.time() - t0
        return agg

    r = _run_kg_once(pages_ds, out_dir, now, completed, concurrency)
    r["skipped"] = sorted(completed)
    r["wall_s"] = time.time() - t0
    return r


def _run_kg_once(pages_ds, out_dir, now, skip_partitions, concurrency) -> dict:
    """One build+write+manifest execution over every partition NOT in
    ``skip_partitions``; returns the ids it manifested."""
    t0 = time.time()
    result = build_kg(
        pages_ds,
        now=now,
        concurrency=concurrency,
        skip_partitions=skip_partitions or None,
        checkpoint_dir=None,
    )

    counts: dict[int, dict[str, int]] = {}

    def write(ds, name: str):
        if ds.schema() is None:  # empty dataset (e.g. everything resumed)
            os.makedirs(os.path.join(out_dir, name), exist_ok=True)
            return
        ds.write_parquet(os.path.join(out_dir, name), partition_cols=["partition_id"])
        per = ds.groupby("partition_id").count().take_all()
        for r in per:
            counts.setdefault(int(r["partition_id"]), {})[name] = int(r["count()"])

    write(result.episodes, "episodes")
    if not counts:  # no partitions left to process
        return {"partitions_processed": [], "wall_s": time.time() - t0}
    write(result.nodes, "nodes")
    write(result.edges, "edges")
    write(result.mentions, "mentions")
    write(result.triples, "triples")

    wall = time.time() - t0
    new_parts = sorted(counts)
    rows = [
        {
            "partition_id": p,
            "episodes": counts[p].get("episodes", 0),
            "nodes": counts[p].get("nodes", 0),
            "edges": counts[p].get("edges", 0),
            "mentions": counts[p].get("mentions", 0),
            "triples": counts[p].get("triples", 0),
            "wall_s": wall / max(1, len(new_parts)),
            "run_ts": time.time(),
        }
        for p in new_parts
    ]
    if rows:
        ckpt.write_manifest(out_dir, rows)
    return {"partitions_processed": new_parts, "wall_s": wall}
