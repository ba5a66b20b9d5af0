"""Entity canonicalization: exact dedup + blocked near-dup + uuid_map.

Semantics rebuilt (never ported) from the reference bulk dedupe chain:
- exact tier  = node_name_match (bulk_utils.py:243-253): first-wins by
  name. Here node uuids are ALREADY content-keyed
  (sha1(group|name_norm), functions/hashing.py:node_uuid) so the exact
  tier is a pure merge-by-uuid aggregation — no uuid_map entries, no
  shuffle of a separate map.
- near tier   = compress_nodes / dedupe_node_list / resolve_extracted_node
  (bulk_utils.py:256-327, node_operations.py:215-459): the O(n^2)
  all-pairs + LLM chunk dedupe + fixpoint recursion becomes
  blocking (surname key + MinHash-LSH bands on name trigrams)
  -> per-block deterministic pair matching (alias_match)
  -> connected components (stages/cc.py)
  -> one canonical node per component, most-complete name wins,
     uuid_map: member -> canonical (flat by construction, i.e. already
     path-compressed per compress_uuid_map, bulk_utils.py:352-361).

Shuffle keys (SURVEY.md §4 table, shuffle ①):
  phase 1: uuid (= hash(group,name_norm))  — exact merge groupby.
           Per-batch partial aggregation runs first, so the shuffle
           moves one row per distinct (batch, uuid) — the combiner
           pattern; hot names (skew) collapse inside every batch before
           the exchange, which is the salting equivalent for an
           associative merge.
  phase 2: block_key — candidate generation groupby.
  phase 3: component id — merge groupby (tiny).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.extraction import alias_match, decode_name_key, name_sort_key, surname_key
from ..functions.hashing import (
    char_shingles,
    lsh_band_keys,
    minhash_params31,
    minhash_signature_fast,
    token_hashes31,
)

MAX_BLOCK = 256  # safety cap on a blocking group (hot-key guard)
# Shuffle granularity: blocks are small, so the exchange key is
# hash(block_key) % NUM_BUCKETS and one reducer call handles every
# block of its bucket (per-group scheduling overhead amortized ~50x).
NUM_BUCKETS = 256
LSH_BANDS, LSH_ROWS = 8, 2  # 16 perms; P(candidate) = 1-(1-J^2)^8 — high recall at J>=0.5
_MH_A, _MH_B = minhash_params31(LSH_BANDS * LSH_ROWS)


def _name_key_col(names) -> pa.Array:
    """Length-then-lexicographic sort key (name_sort_key, vectorized)."""
    return pc.binary_join_element_wise(
        pc.utf8_lpad(pc.cast(pc.utf8_length(names), pa.string()), 4, "0"),
        names,
        "|",
    )


def _partial_exact(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate uuids before the shuffle."""
    t = batch.append_column("name_key", _name_key_col(batch.column("name")))
    g = t.group_by("uuid").aggregate(
        [
            ("name_key", "max"),
            ("name_norm", "min"),
            ("group_id", "min"),
            ("partition_id", "min"),
            ("created_at", "min"),
            ("uuid", "count"),
        ]
    )
    return g.rename_columns(
        ["uuid", "name_key", "name_norm", "group_id", "partition_id", "created_at", "cnt"]
    )


def _prior_partial(t: pa.Table) -> pa.Table:
    """Canonical nodes from a PRIOR build re-entering the exact merge as
    pre-combined rows (cnt = accumulated n_mentions) — the aggregation
    is associative, so union-before-groupby equals a from-scratch merge
    over the combined raw streams."""
    return pa.table(
        {
            "uuid": t.column("uuid"),
            "name_key": _name_key_col(t.column("name")),
            "name_norm": t.column("name_norm"),
            "group_id": t.column("group_id"),
            "partition_id": t.column("partition_id"),
            "created_at": t.column("created_at"),
            "cnt": pc.cast(t.column("n_mentions"), pa.int64()),
        }
    )


def exact_merge(nodes_raw_ds, prior_nodes_ds=None):
    """Distinct canonical row per uuid; n_mentions = row count.

    Two-phase aggregation: map-side combiner (above) then a global
    groupby(uuid) with associative aggregates only — Max on the
    length-encoded name key picks the most complete surface form.
    ``prior_nodes_ds``: canonical nodes of an existing graph to build on
    top of (incremental mode) — unioned into the combined stream before
    the global groupby.
    """
    partial = nodes_raw_ds.map_batches(
        _partial_exact, batch_format="pyarrow", batch_size=None
    )  # whole-block batches: the combiner dedupes across the full block
    if prior_nodes_ds is not None:
        partial = partial.union(
            prior_nodes_ds.map_batches(_prior_partial, batch_format="pyarrow")
        )

    # The global exchange is hash(uuid)-bucketed with the associative
    # aggregation done by ONE Arrow group_by per bucket — measured ~3-4x
    # faster than Dataset.groupby(uuid).aggregate at this shape (the
    # sort-based per-key aggregate pays per-distinct-key overhead; the
    # bucket reducer pays it once per bucket). Bucket ids parse the
    # hex40 uuid to uint64 via a numpy view (bucket_hex40): no per-row
    # Python objects in the tag stage.
    from ..functions.hashing import bucket_hex40

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "xb",
            pa.array(bucket_hex40(t.column("uuid"), NUM_BUCKETS, salt="xmb"), pa.int32()),
        )

    def reduce_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("uuid").aggregate(
            [
                ("name_key", "max"),
                ("name_norm", "min"),
                ("group_id", "min"),
                ("partition_id", "min"),
                ("created_at", "min"),
                ("cnt", "sum"),
            ]
        )
        g = g.rename_columns(
            ["uuid", "name_key", "name_norm", "group_id", "partition_id",
             "created_at", "n_mentions"]
        )
        names = [decode_name_key(k) for k in g.column("name_key").to_pylist()]
        g = g.append_column("name", pa.array(names, pa.string()))
        return g.drop_columns(["name_key"])

    from ..functions.exchange import bounded_group_map

    return bounded_group_map(
        partial.map_batches(tag, batch_format="pyarrow"),
        "xb", reduce_bucket, batch_format="pyarrow",
    )


def _block_rows(batch: pa.Table) -> pa.Table:
    """flat-map each distinct entity to its blocking keys: the surname
    key (person-alias families) plus MinHash-LSH band keys over name
    char-trigrams (generic near-dup candidates, the 'MinHash/ANN top-k'
    blocking of the north star). Replaces the reference's all-pairs
    embedding dot-products (bulk_utils.py:269-273)."""
    a, b = _MH_A, _MH_B
    keys, uuids, norms, names, groups = [], [], [], [], []
    for uuid, norm, name, grp in zip(
        batch.column("uuid").to_pylist(),
        batch.column("name_norm").to_pylist(),
        batch.column("name").to_pylist(),
        batch.column("group_id").to_pylist(),
    ):
        bks = [f"s|{grp}|{surname_key(norm)}"]
        if len(norm.split()) >= 2:
            sig = minhash_signature_fast(token_hashes31(char_shingles(norm)), a, b)
            bks += [f"m|{grp}|{k}" for k in lsh_band_keys(sig, LSH_BANDS, LSH_ROWS)]
        for bk in bks:
            keys.append(bk)
            uuids.append(uuid)
            norms.append(norm)
            names.append(name)
            groups.append(grp)
    from ..functions.hashing import bucket_array

    return pa.table(
        {
            "block_key": pa.array(keys, pa.string()),
            "block_bucket": pa.array(
                bucket_array(keys, NUM_BUCKETS, salt="bbkt"), pa.int32()
            ),
            "uuid": pa.array(uuids, pa.string()),
            "name_norm": pa.array(norms, pa.string()),
            "name": pa.array(names, pa.string()),
            "group_id": pa.array(groups, pa.string()),
        }
    )


def _pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """All blocks of one bucket -> matched candidate pairs (a<b by uuid).

    The deterministic alias_match verdict stands in for the LLM dedupe
    prompt (prompts/dedupe_nodes.py:47-128). Blocks larger than
    MAX_BLOCK keep only the lexicographically-first MAX_BLOCK names
    (deterministic hot-key guard).

    Each pair row also carries both endpoints' (name_key, group_id):
    the driver collects pairs anyway for union-find, and those two
    columns are exactly what it needs to derive the winner-per-component
    alias map and the uuid_map WITHOUT waiting on the distributed
    member-merge exchange (driver_alias_and_map) — one full pipeline
    barrier removed from the critical path.

    Implementation note: a bucket holds ~1e5+ TINY blocks, so per-block
    pandas slicing (groupby iteration, sort_values per group) costs
    milliseconds per block and dominated the whole pipeline (measured
    380 s single-thread at 320k docs). One global sort + numpy boundary
    scan brings the reducer to ~seconds."""
    import numpy as np

    df = df.sort_values(["block_key", "uuid"]).drop_duplicates(
        ["block_key", "uuid"]
    )
    keys = df["block_key"].to_numpy()
    uuids = df["uuid"].to_numpy()
    norms = df["name_norm"].to_numpy()
    names = df["name"].to_numpy()
    groups = df["group_id"].to_numpy()
    n = len(keys)
    ia: list[int] = []
    ib: list[int] = []
    if n:
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
            if e - s < 2:
                continue
            if e - s > MAX_BLOCK:
                e = s + MAX_BLOCK
            for i in range(s, e):
                ui, ni = uuids[i], norms[i]
                for j in range(i + 1, e):
                    if alias_match(ni, norms[j]):
                        if ui < uuids[j]:
                            ia.append(i)
                            ib.append(j)
                        else:
                            ia.append(j)
                            ib.append(i)
    iag = np.asarray(ia, dtype=np.int64)
    ibg = np.asarray(ib, dtype=np.int64)
    out = pd.DataFrame(
        {
            "a": uuids[iag],
            "b": uuids[ibg],
            "nka": [name_sort_key(x) for x in names[iag]],
            "nkb": [name_sort_key(x) for x in names[ibg]],
            "ga": groups[iag],
            "gb": groups[ibg],
        }
    )
    return out.drop_duplicates(["a", "b"])


def candidate_pairs(nodes_ds):
    """nodes -> distinct matched pairs. Shuffle key: hash(block_key)
    bucket (one reducer call per bucket, all its blocks inside).

    Works on RAW extracted nodes too (uuids repeat across episodes): a
    cheap per-batch distinct runs first, and the bucket reducer
    re-dedupes within each block, so the pair set is identical to
    running on the exact-merged table — which lets this phase run
    CONCURRENTLY with the exact merge instead of after it."""

    def distinct(t: pa.Table) -> pa.Table:
        t = t.select(["uuid", "name_norm", "name", "group_id"])
        g = t.group_by("uuid").aggregate(
            [("name_norm", "min"), ("name", "min"), ("group_id", "min")]
        )
        return g.rename_columns(["uuid", "name_norm", "name", "group_id"])

    blocks = nodes_ds.map_batches(
        distinct, batch_format="pyarrow", batch_size=None
    ).map_batches(_block_rows, batch_format="pyarrow")
    # No global distinct pass: a pair can surface from blocks in two
    # different buckets, but downstream union-find / label propagation
    # is idempotent on duplicate pairs — a dedupe shuffle would cost an
    # extra all-to-all for nothing.
    from ..functions.exchange import bounded_group_map

    return bounded_group_map(
        blocks, "block_bucket", _pairs_in_bucket, batch_format="pandas"
    )


NODE_STAGE_SCHEMA = pa.schema(
    [
        ("uuid", pa.string()),
        ("name_norm", pa.string()),
        ("group_id", pa.string()),
        ("partition_id", pa.int32()),
        ("created_at", pa.timestamp("us")),
        ("n_mentions", pa.int64()),
        ("name", pa.string()),
    ]
)


_MERGED_SCHEMA = pa.schema(
    [("kind", pa.string())]
    + list(NODE_STAGE_SCHEMA)
    + [("old_uuid", pa.string()), ("canonical_uuid", pa.string())]
)


def _merge_components_bucket(df: "pd.DataFrame") -> pa.Table:
    """All components of one bucket: winner pick + merge + map rows."""
    rows: list[dict] = []
    for cid, g in df.groupby("comp_id", sort=True):
        recs = g.to_dict("records")
        win = max(recs, key=lambda r: (name_sort_key(r["name"]), r["uuid"]))
        merged = {k: win[k] for k in NODE_STAGE_SCHEMA.names}
        merged["n_mentions"] = int(g["n_mentions"].sum())
        merged["created_at"] = g["created_at"].min()
        rows.append({"kind": "node", **merged, "old_uuid": None, "canonical_uuid": None})
        for r in recs:
            if r["uuid"] != win["uuid"]:
                rows.append(
                    {
                        "kind": "map",
                        **{k: r[k] for k in NODE_STAGE_SCHEMA.names},
                        "old_uuid": r["uuid"],
                        "canonical_uuid": win["uuid"],
                    }
                )
    return pa.Table.from_pylist(rows, schema=_MERGED_SCHEMA)


def _merge_tagged_members(members_tagged_ds):
    """members (rows carrying comp_id + comp_bucket) -> (merged canonical
    nodes, uuid_map) via ONE bucketed exchange."""
    from ..functions.exchange import bounded_group_map

    merged = bounded_group_map(
        members_tagged_ds, "comp_bucket", _merge_components_bucket,
        batch_format="pandas",
    ).materialize()

    merged_nodes = merged.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "node")).select(
            NODE_STAGE_SCHEMA.names
        ),
        batch_format="pyarrow",
    )

    def _map_rows(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t.column("kind"), "map"))
        # old_name (the merged-away member's surface form) rides along so
        # the alias map is projectable by NAME for oracle checks / audits
        return pa.table(
            {
                "old_uuid": m.column("old_uuid"),
                "canonical_uuid": m.column("canonical_uuid"),
                "group_id": m.column("group_id"),
                "old_name": m.column("name"),
            }
        )

    return merged_nodes, merged.map_batches(_map_rows, batch_format="pyarrow")


def build_uuid_map_and_nodes_ds(nodes_exact_ds, labels_ds, labels_rows=None):
    """The distributed-components twin of build_uuid_map_and_nodes: the
    membership map stays a DATASET (uuid -> component label from
    cc.connected_components_ds) and reaches workers through
    joins.lookup_column's tiered broadcast/shard/parquet lookups — the
    driver never materializes an O(duplicates) structure. Members are
    the rows whose lookup hit; survivors are the misses. alias is None
    by construction (this path runs only past cc.DRIVER_THRESHOLD
    pairs, far beyond the broadcast-rewrite threshold), so every
    pointer consumer takes the uuid_map hash-join path."""
    from ..functions.hashing import bucket_array
    from .joins import lookup_column

    tagged = lookup_column(
        nodes_exact_ds, "uuid", labels_ds, "uuid", "label", "comp_id",
        mapping_rows=labels_rows,
    )
    survivors = tagged.map_batches(
        lambda t: t.filter(pc.is_null(t.column("comp_id"))).drop_columns(
            ["comp_id"]
        ),
        batch_format="pyarrow",
    )

    def keep_members(t: pa.Table) -> pa.Table:
        m = t.filter(pc.is_valid(t.column("comp_id")))
        return m.append_column(
            "comp_bucket",
            pa.array(bucket_array(m.column("comp_id"), NUM_BUCKETS, salt="cbkt"),
                     pa.int32()),
        )

    members = tagged.map_batches(keep_members, batch_format="pyarrow")
    merged_nodes, uuid_map = _merge_tagged_members(members)
    nodes = survivors.map_batches(
        lambda t: t.select(NODE_STAGE_SCHEMA.names).cast(NODE_STAGE_SCHEMA),
        batch_format="pyarrow",
    ).union(merged_nodes)
    return nodes, uuid_map, None


_UUID_MAP_SCHEMA = pa.schema(
    [
        ("old_uuid", pa.string()),
        ("canonical_uuid", pa.string()),
        ("group_id", pa.string()),
        ("old_name", pa.string()),
    ]
)


def driver_alias_and_map(comp: dict, pairs_df: "pd.DataFrame"):
    """Derive (alias KV, uuid_map Arrow table) ON THE DRIVER from the
    union-find components and the already-collected pairs frame.

    The winner of a component is the member with the most complete name
    (max (name_sort_key, uuid)) — identical to _merge_components_bucket,
    which still picks the same winner when it merges the node ROWS; the
    parity is pinned by tests. Every component member appears in >= 1
    pair (pairs define the components), so the pairs frame carries the
    (name_key, group_id) of every member.

    Why driver-side: the pairs are on the driver anyway (union-find),
    both outputs are O(duplicate-candidates) — bounded by
    cc.DRIVER_THRESHOLD on this path — and deriving them here means
    edge/mention pointer rewrites start IMMEDIATELY after union-find
    instead of behind a full member-merge pipeline barrier. The merge
    exchange itself stays distributed and overlaps with the other
    branches (pipelines/kg.py)."""
    from .joins import U64KV

    if not comp:
        return U64KV.empty(), pa.table(
            {f.name: pa.array([], f.type) for f in _UUID_MAP_SCHEMA}
        )
    name_key: dict[str, str] = {}
    group_of: dict[str, str] = {}
    for u_col, k_col, g_col in (("a", "nka", "ga"), ("b", "nkb", "gb")):
        name_key.update(zip(pairs_df[u_col], pairs_df[k_col]))
        group_of.update(zip(pairs_df[u_col], pairs_df[g_col]))
    members_by_root: dict[str, list[str]] = {}
    for u, r in comp.items():
        members_by_root.setdefault(r, []).append(u)
    olds: list[str] = []
    winners: list[str] = []
    for r, members in members_by_root.items():
        win = max(members, key=lambda u: (name_key[u], u))
        for u in members:
            if u != win:
                olds.append(u)
                winners.append(win)
    order = sorted(range(len(olds)), key=lambda i: olds[i])
    olds = [olds[i] for i in order]
    winners = [winners[i] for i in order]
    from ..functions.extraction import decode_name_key

    from .joins import make_kv

    uuid_map_tbl = pa.table(
        {
            "old_uuid": pa.array(olds, pa.string()),
            "canonical_uuid": pa.array(winners, pa.string()),
            "group_id": pa.array([group_of[u] for u in olds], pa.string()),
            "old_name": pa.array(
                [decode_name_key(name_key[u]) for u in olds], pa.string()
            ),
        }
    )
    return make_kv(olds, winners), uuid_map_tbl


def build_uuid_map_and_nodes(nodes_exact_ds, comp_kv):
    """Apply components: merge member nodes into canonical nodes.

    comp_kv (a joins.U64KV/SortedKV) maps member uuid -> component
    representative. The canonical NODE of a component is the member
    with the most complete name (name_sort_key max; ties by uuid),
    matching the reference's keep-the-more-complete-node merge
    (node_operations.py:298-412) — its uuid survives, the others remap
    to it.

    Returns a LAZY nodes Dataset (survivors ∪ merged): the member-merge
    exchange executes when the caller materializes nodes, CONCURRENTLY
    with the edge/mention branches (pipelines/kg.py) instead of as its
    own barrier. The alias map and uuid_map are no longer derived from
    this exchange — driver_alias_and_map builds both straight from the
    collected pairs."""
    import ray

    if comp_kv is None or len(comp_kv) == 0:  # no duplicate candidates
        return nodes_exact_ds.map_batches(
            lambda t: t.select(NODE_STAGE_SCHEMA.names).cast(NODE_STAGE_SCHEMA),
            batch_format="pyarrow",
        )

    from ..functions.hashing import bucket_hex40
    from .joins import get_broadcast

    comp_ref = ray.put(comp_kv)

    def split(keep_members: bool):
        def f(t: pa.Table) -> pa.Table:
            ms = get_broadcast(comp_ref)
            mask = pa.array(ms.contains_mask(t.column("uuid")))
            return t.filter(mask if keep_members else pc.invert(mask))

        return f

    survivors = nodes_exact_ds.map_batches(split(False), batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        ms = get_broadcast(comp_ref)
        cids = ms.lookup_pa(t.column("uuid"))
        t = t.append_column("comp_id", cids)
        return t.append_column(
            "comp_bucket",
            pa.array(bucket_hex40(cids, NUM_BUCKETS, salt="cbkt"), pa.int32()),
        )

    members = nodes_exact_ds.map_batches(split(True), batch_format="pyarrow").map_batches(
        tag, batch_format="pyarrow"
    )
    from ..functions.exchange import bounded_group_map

    merged = bounded_group_map(
        members, "comp_bucket", _merge_components_bucket, batch_format="pandas"
    )
    merged_nodes = merged.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "node")).select(
            NODE_STAGE_SCHEMA.names
        ),
        batch_format="pyarrow",
    )
    return survivors.map_batches(
        lambda t: t.select(NODE_STAGE_SCHEMA.names).cast(NODE_STAGE_SCHEMA),
        batch_format="pyarrow",
    ).union(merged_nodes)


def canonicalize_nodes(nodes_raw_ds, entity_types: dict | None = None,
                       prior_nodes_ds=None):
    """Full canonicalization: (nodes_ds, uuid_map_ds, alias_dict).

    alias_dict (old->canonical, broadcast via ray.put downstream) powers
    the J3 pointer rewrite (bulk_utils.py:367-374). Driver union-find is
    used below cc.DRIVER_THRESHOLD pairs; above it the distributed
    label-propagation path (stages/cc.py) computes components.
    ``entity_types``: user type specs merged into labels/attributes
    (functions/classify.classify_with — the reference's entity_types=
    surface). ``prior_nodes_ds``: canonical nodes of an existing graph
    (incremental mode) — new extraction resolves against them exactly
    like the reference's resolve_extracted_node resolves against the
    existing graph (graphiti.py:351-375).
    """
    from . import cc

    # Blocking runs AFTER the exact merge on purpose: the merged table
    # has one row per distinct entity, so the blocking shuffle ships
    # ~8x fewer rows than raw extraction would (running the two
    # concurrently on the raw stream was measured slower — the extra
    # shuffled volume beats the overlap win).
    from .joins import make_kv

    exact = exact_merge(nodes_raw_ds, prior_nodes_ds=prior_nodes_ds).materialize()
    pairs = candidate_pairs(exact)
    comp, pairs_df = cc.components_with_pairs(pairs)
    if comp is None:  # very large duplicate set: fully distributed path
        labels = cc.connected_components_ds(pairs).materialize()
        nodes, uuid_map, alias = build_uuid_map_and_nodes_ds(
            exact, labels, labels_rows=labels.count()
        )
    else:
        import ray.data as rd

        # alias + uuid_map derive on the driver from the collected
        # pairs (driver_alias_and_map): nodes stays LAZY so the
        # member-merge exchange overlaps the edge/mention branches.
        # The alias is always broadcastable on this path: members <=
        # 2 * pairs <= 2 * cc.DRIVER_THRESHOLD < joins.BROADCAST_MAX_ROWS.
        alias, uuid_map_tbl = driver_alias_and_map(comp, pairs_df)
        uuid_map = rd.from_arrow(uuid_map_tbl)
        comp_kv = make_kv(list(comp.keys()), list(comp.values())) if comp else None
        nodes = build_uuid_map_and_nodes(exact, comp_kv)

    def with_labels(t: pa.Table) -> pa.Table:
        # entity-type labels + open-schema attributes (nodes.py:82,
        # 258-260); rule-based classification (plus any user-supplied
        # entity_types specs) stands in for the LLM custom-entity-type
        # pass (functions/classify.py)
        from ..functions.classify import attributes_json, labels_of

        names = t.column("name").to_pylist()
        t = t.append_column(
            "labels",
            pa.array(
                [labels_of(n, entity_types) for n in names], pa.list_(pa.string())
            ),
        )
        return t.append_column(
            "attributes",
            pa.array(
                [attributes_json(n, entity_types) for n in names], pa.string()
            ),
        )

    return nodes.map_batches(with_labels, batch_format="pyarrow"), uuid_map, alias
