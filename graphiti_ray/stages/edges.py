"""Edge resolution: pointer rewrite -> pair-group dedupe -> temporal sweep.

Semantics rebuilt from the reference:
- J3 resolve_edge_pointers (bulk_utils.py:367-374): src/tgt uuids
  rewritten through the alias map. Implemented as a BROADCAST lookup
  (ray.put once, read per actor) because the alias map covers only
  duplicate-candidate names; a bucketed hash-join fallback
  (stages/joins.py) exists for when it cannot be broadcast.
- J4 chunk_edges_by_nodes (bulk_utils.py:417-434): self-loops dropped,
  direction-agnostic sorted (src,tgt) pair key. Our shuffle key ②.
- D5/D6/D7 dedupe (bulk_utils.py:330-349, edge_operations.py:151-192,
  308-381): within a pair group, edges with the same (predicate,
  normalized fact) merge; provenance lists union
  (edge.episodes += ...); canonical uuid is re-minted from the
  canonical key so merges are replay-stable. 'Ended' marker facts
  (invalid_at set, valid_at null — e.g. "X no longer works for Y")
  fold their invalid_at into the open edge of the same (pair,
  predicate), the deterministic analog of the LLM reusing the existing
  edge and landing its extracted end date on it.
- T2 resolve_edge_contradictions (edge_operations.py:234-261) +
  T3 resolve_extracted_edge (edge_operations.py:264-305): a single
  deterministic sweep per (group_id, subject, predicate) for EXCLUSIVE
  predicates. The reference applies these rules per arriving edge
  against candidates; sorted by valid_at the same rules become
  order-free:
      for each edge e with valid_at != null:
          among contradicting edges n (different object) with
          n.valid_at > e.valid_at and NOT disjoint
          (skip when e.invalid_at <= n.valid_at or
           n.invalid_at <= e.valid_at — the T2 skip conditions),
          the earliest n closes e: e.invalid_at = n.valid_at,
          e.expired_at = now.
  This reproduces both directions of the reference logic (older edge
  closed by newer fact; new edge immediately closed when a more recent
  fact already exists) — pinned by the ported cases of
  tests/utils/maintenance/test_edge_operations.py:94-237.

Deterministic `now`: the reference stamps expired_at with utc_now()
(edge_operations.py:257). Batch engine takes `now` as a pipeline
parameter so reruns are byte-identical.
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pyarrow as pa

from ..functions.extraction import EXCLUSIVE_PREDICATES
from ..functions.hashing import sha1_hex

_TS = pa.timestamp("us")
EDGE_STAGE_FIELDS = [
    ("uuid", pa.string()),
    ("source_node_uuid", pa.string()),
    ("target_node_uuid", pa.string()),
    ("name", pa.string()),
    ("fact", pa.large_string()),
    ("fact_norm", pa.string()),
    ("episodes", pa.list_(pa.string())),
    ("group_id", pa.string()),
    ("created_at", _TS),
    ("valid_at", _TS),
    ("invalid_at", _TS),
    ("partition_id", pa.int32()),
]
PAIR_STAGE_SCHEMA = pa.schema(EDGE_STAGE_FIELDS)
SWEPT_SCHEMA = pa.schema(EDGE_STAGE_FIELDS + [("expired_at", _TS)])


def _df_to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """pandas -> Arrow with explicit schema; list columns (episodes)
    converted row-wise (Ray's automatic pandas-block conversion treats
    object columns of lists as ragged tensors, which Arrow rejects)."""
    arrays = []
    for f in schema:
        col = df[f.name]
        if pa.types.is_list(f.type):
            vals = [None if v is None else list(v) for v in col]
            arrays.append(pa.array(vals, type=f.type))
        elif pa.types.is_timestamp(f.type):
            vals = [None if pd.isna(v) else v for v in col]
            arrays.append(pa.array(vals, type=f.type))
        else:
            arrays.append(pa.array(col.tolist(), type=f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def rewrite_pointers_join(ds, uuid_map_ds, cols: list[str]):
    """J3 at scale: rewrite pointer columns through the uuid_map
    Dataset with hash joins (one per column) + coalesce — the fallback
    when the alias map exceeds joins.BROADCAST_MAX_ROWS and can no
    longer be ray.put as a dict."""
    import pyarrow.compute as pc

    from .joins import lookup_column

    for col in cols:
        ds = lookup_column(
            ds, col, uuid_map_ds, "old_uuid", "canonical_uuid", f"__new_{col}"
        )

        def coalesce(t: pa.Table, col=col) -> pa.Table:
            new = pc.coalesce(t.column(f"__new_{col}"), t.column(col))
            i = t.schema.get_field_index(col)
            return t.set_column(i, col, new).drop_columns([f"__new_{col}"])

        ds = ds.map_batches(coalesce, batch_format="pyarrow")
    return ds


def rewrite_pointers(edges_ds, alias):
    """J3: rewrite src/tgt through the broadcast alias map (a
    joins.SortedKV — zero-copy from plasma, vectorized searchsorted
    rewrite; no per-worker dict deserialization)."""
    import ray

    from .joins import get_broadcast

    ref = ray.put(alias)

    def f(t: pa.Table) -> pa.Table:
        a = get_broadcast(ref)
        if not len(a):
            return t
        t = t.set_column(
            t.schema.get_field_index("source_node_uuid"), "source_node_uuid",
            a.rewrite_pa(t.column("source_node_uuid")),
        )
        return t.set_column(
            t.schema.get_field_index("target_node_uuid"), "target_node_uuid",
            a.rewrite_pa(t.column("target_node_uuid")),
        )

    return edges_ds.map_batches(f, batch_format="pyarrow")


# Shuffle granularity: groups are tiny (one entity pair / one subject),
# so shuffling per-KEY would pay per-group scheduling+pandas overhead
# thousands of times. Instead the exchange key is hash(key) % NUM_BUCKETS
# and the reducer handles ALL keys of one bucket in one vectorized pass —
# identical semantics (every key lives in exactly one bucket), ~50x less
# per-group overhead. Bucket count bounds per-task memory at scale:
# bucket size ≈ |edges| / NUM_BUCKETS.
NUM_BUCKETS = 256


def _bucket_of_col(values) -> pa.Array:
    """Bucket ids for a canonical-uuid column: u64-prefix parse + mix,
    no per-row Python objects (functions/hashing.bucket_hex40)."""
    from ..functions.hashing import bucket_hex40

    return pa.array(bucket_hex40(values, NUM_BUCKETS, salt="ebkt"), pa.int32())


def add_pair_key(edges_ds):
    """J4: drop self-loops, tag the exchange bucket.

    The SHUFFLE key is hash(source_node_uuid): the merge key
    (src,tgt,pred,fact_norm), the marker-fold key (src,tgt,pred) and
    the sweep key (group,src,pred) are all functions of the source
    uuid, so ONE src-bucketed exchange feeds the fused
    dedupe+invalidate reducer (two chained all-to-alls collapsed).
    The direction-agnostic pair key itself (bulk_utils.py:417-434) is
    NOT materialized as a column: it was an 81-byte string per row
    riding through the all-to-all purely as dead weight — the reducer
    groups on (src,tgt,pred,fact_norm) directly."""

    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.not_equal(
                t.column("source_node_uuid"), t.column("target_node_uuid")
            )
        )
        return t.append_column(
            "pair_bucket", _bucket_of_col(t.column("source_node_uuid"))
        )

    return edges_ds.map_batches(f, batch_format="pyarrow")


def _merge_pair_group(g: pd.DataFrame) -> pa.Table:
    """D5/D6/D7 for one BUCKET of pair groups, vectorized pandas.

    Merge rule per (direction, predicate, fact_norm): episodes =
    sorted distinct union; created_at/valid_at/invalid_at = min
    non-null; canonical uuid = sha1 of the canonical key; surviving
    fact = the earliest (created_at, uuid) surface form.
    Then fold 'ended' markers into the open positive edge.
    """
    import numpy as np

    keys = ["source_node_uuid", "target_node_uuid", "name", "fact_norm"]
    g = g.sort_values(["created_at", "uuid"])
    gb = g.groupby(keys, sort=True)
    res = gb.agg(
        fact=("fact", "first"),
        group_id=("group_id", "first"),
        created_at=("created_at", "min"),
        valid_at=("valid_at", "min"),  # min skips NaT
        invalid_at=("invalid_at", "min"),
        partition_id=("partition_id", "first"),
    ).reset_index()
    # provenance union (sorted distinct episodes) via ONE global sort +
    # numpy boundary scan — a per-group lambda here paid ~1 ms per
    # group and dominated edge resolution at scale
    ep = (
        g[keys + ["episode_uuid"]]
        .drop_duplicates()
        .sort_values(keys + ["episode_uuid"], kind="mergesort")
    )
    ep_vals = ep["episode_uuid"].to_numpy()
    if len(ep):
        kcols = [ep[k].to_numpy() for k in keys]
        diff = np.zeros(len(ep) - 1, dtype=bool)
        for kc in kcols:
            diff |= kc[1:] != kc[:-1]
        bounds = np.flatnonzero(np.r_[True, diff, True])
        eps_lists = [
            ep_vals[s:e].tolist()
            for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist())
        ]
    else:
        eps_lists = []
    # ep group order == res group order: both are the lexicographic
    # sort of the same key tuple
    res["episodes"] = eps_lists
    res["uuid"] = [
        sha1_hex("cedge", r.group_id, r.source_node_uuid, r.target_node_uuid,
                 r.name, r.fact_norm)
        for r in res.itertuples(index=False)
    ]
    # fold ended markers (valid_at null, invalid_at set) into the open
    # positive edge of the same (direction, predicate). The fold is
    # order-free — candidates are rows with valid_at set (markers never
    # qualify), folding touches only invalid_at (min-accumulates) and
    # episodes (set-union), neither of which affects candidate
    # selection — so it vectorizes as ONE merge_asof instead of a
    # per-marker full-frame mask scan (the scan was O(markers x rows):
    # 849 CPU·s of the edge exchange at 2.56M docs; this is O(n log n)).
    for c in ("valid_at", "invalid_at", "created_at"):
        res[c] = pd.to_datetime(res[c])
    mmask = res["valid_at"].isna() & res["invalid_at"].notna()
    if mmask.any():
        by = ["source_node_uuid", "target_node_uuid", "name"]
        mk = res.loc[mmask, by + ["invalid_at"]].reset_index(names="mi")
        facts = res.loc[res["valid_at"].notna(), by + ["valid_at", "fact_norm"]]
        facts = facts.reset_index(names="fi")
        # "latest open fact" = last row in (valid_at, fact_norm) order
        # with valid_at < marker.invalid_at (strict: allow_exact=False);
        # fact_norm is distinct within a pair group by construction, so
        # the tie-break is deterministic
        mk = mk.sort_values("invalid_at", kind="mergesort")
        facts = facts.sort_values(["valid_at", "fact_norm"], kind="mergesort")
        m = pd.merge_asof(
            mk, facts, left_on="invalid_at", right_on="valid_at",
            by=by, direction="backward", allow_exact_matches=False,
        )
        m = m[m["fi"].notna()]  # markers with no open fact stay as rows
        if len(m):
            fi = m["fi"].astype(np.int64)
            upd = m.groupby(fi)["invalid_at"].min()
            cur = res.loc[upd.index, "invalid_at"]
            res.loc[upd.index, "invalid_at"] = np.where(
                cur.isna() | (upd < cur), upd, cur
            )
            eps = res["episodes"]
            for f_idx, g in m.groupby(fi)["mi"]:
                s = set(eps.at[f_idx])
                for mi in g:
                    s |= set(eps.at[mi])
                eps.at[f_idx] = sorted(s)
            res = res.drop(index=m["mi"].tolist())
    return _df_to_arrow(res, PAIR_STAGE_SCHEMA)


def dedupe_pair_groups(edges_with_pair_ds):
    """Shuffle key ②: hash(source uuid) bucket; the reducer merges all
    pair groups of a bucket in one vectorized pass."""
    from ..functions.exchange import bounded_group_map

    return bounded_group_map(
        edges_with_pair_ds, "pair_bucket", _merge_pair_group,
        batch_format="pandas",
    )


def _merge_and_sweep_bucket(df: pd.DataFrame, now: datetime, preds: frozenset) -> pa.Table:
    """Fused reducer: pair-group dedupe (D5/D6/D7), then the T2/T3
    temporal sweep for exclusive predicates — all keys of one
    src-bucket, ONE shuffle upstream."""
    merged = _merge_pair_group(df).to_pandas()
    excl = merged[merged["name"].isin(preds)]
    rest = merged[~merged["name"].isin(preds)].copy()
    # explicit datetime64[us] (matching _sweep_frame's expired column):
    # a bare pd.NaT assignment makes ns dtype, and the us/ns mix is the
    # all-NA-column dtype ambiguity pandas deprecation-warns about
    rest["expired_at"] = pd.Series(pd.NaT, index=rest.index, dtype="datetime64[us]")
    rest.loc[rest["invalid_at"].notna(), "expired_at"] = now
    # concat only non-empty frames: pandas deprecates dtype inference
    # over empty/all-NA entries and warns on every bucket otherwise
    frames = [f for f in (_sweep_frame(excl, now), rest) if len(f)]
    if not frames:
        return _df_to_arrow(rest.iloc[:0], SWEPT_SCHEMA)
    out = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    return _df_to_arrow(out, SWEPT_SCHEMA)


def _sweep_frame(df: pd.DataFrame, now: datetime) -> pd.DataFrame:
    """T2/T3 sweep over a frame holding ANY number of (group_id,
    subject, predicate) groups.

    Every close decision reads only ORIGINAL row values (in the
    reference's per-arrival loop, a row is mutated only in its own
    iteration and candidates are always later rows), so the sweep is an
    independent per-row query:
      close(e) = earliest later-valid contradicting fact n
                 (n.obj != e.obj, n.valid > e.valid) with the T2
                 disjointness skips (edge_operations.py:240-250):
                 skip all n once e.invalid <= n.valid; skip n with
                 n.invalid <= e.valid.
    Implemented as one global sort + numpy scans per group — the
    per-group pandas version paid ~1.5 ms per group and dominated edge
    resolution at 320k docs."""
    import numpy as np

    if not len(df):
        out = df.copy()
        out["expired_at"] = pd.Series([], dtype="datetime64[us]")
        return out

    kcols = ["group_id", "source_node_uuid", "name"]
    df = df.sort_values(
        kcols + ["valid_at", "created_at", "uuid"], na_position="last"
    ).reset_index(drop=True)
    n = len(df)
    keys = [df[c].to_numpy() for c in kcols]
    valid = df["valid_at"].to_numpy()
    inv = df["invalid_at"].to_numpy()
    obj = df["target_node_uuid"].to_numpy()
    isnat_v = pd.isna(valid)
    isnat_inv = pd.isna(inv)
    new_inv = inv.copy()
    closed = np.zeros(n, dtype=bool)

    diff = np.zeros(n - 1, dtype=bool)
    for kc in keys:
        diff |= kc[1:] != kc[:-1]
    bounds = np.flatnonzero(np.r_[True, diff, True])
    for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
        for i in range(s, e):
            if isnat_v[i]:
                break  # NaT valid_at sorts last: no row after has one
            vi, oi = valid[i], obj[i]
            ei_nat, ei = isnat_inv[i], inv[i]
            for j in range(i + 1, e):
                if isnat_v[j]:
                    break
                vj = valid[j]
                if vj <= vi or obj[j] == oi:
                    continue
                if not ei_nat and ei <= vj:
                    break  # later candidates only grow: all skipped
                if not isnat_inv[j] and inv[j] <= vi:
                    continue
                new_inv[i] = vj
                closed[i] = True
                break
    out = df
    out["invalid_at"] = new_inv
    # extraction-time invalid -> expired (edge_operations.py:285-287);
    # sweep closes -> expired
    expired = np.full(n, np.datetime64("NaT"), dtype="datetime64[us]")
    expired[closed | ~isnat_inv] = np.datetime64(now, "us")
    out["expired_at"] = expired
    return out


def _sweep_group(g: pd.DataFrame, now: datetime) -> pd.DataFrame:
    """T2/T3 sweep for one (group_id, subject, predicate) group —
    kept as the single-group view of _sweep_frame."""
    return _sweep_frame(g, now)


def _sweep_bucket(df: pd.DataFrame, now: datetime) -> pa.Table:
    """All (group_id, subject, predicate) groups of one bucket; one
    Arrow conversion per bucket."""
    out = _sweep_frame(df, now)
    return _df_to_arrow(out, SWEPT_SCHEMA)


def temporal_sweep(deduped_ds, now: datetime):
    """Shuffle key ③: (group_id, source_node_uuid, name) for exclusive
    predicates; non-exclusive edges bypass the shuffle entirely."""
    import pyarrow.compute as pc

    preds = list(EXCLUSIVE_PREDICATES)

    def add_expired(t: pa.Table) -> pa.Table:
        if "expired_at" in t.schema.names:
            return t
        inv = t.column("invalid_at")
        exp = pc.if_else(
            pc.is_valid(inv),
            pa.scalar(now, pa.timestamp("us")),
            pa.scalar(None, pa.timestamp("us")),
        )
        return t.append_column("expired_at", exp)

    from ..functions.hashing import bucket_array

    def tag_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("name"), value_set=pa.array(preds)))
        key_col = pc.binary_join_element_wise(
            t.column("group_id"), t.column("source_node_uuid"), t.column("name"), "|"
        )
        return t.append_column(
            "sweep_bucket",
            pa.array(bucket_array(key_col, NUM_BUCKETS, salt="sbkt"), pa.int32()),
        )

    exclusive = deduped_ds.map_batches(tag_bucket, batch_format="pyarrow")
    rest = deduped_ds.map_batches(
        lambda t: add_expired(
            t.filter(pc.invert(pc.is_in(t.column("name"), value_set=pa.array(preds))))
        ),
        batch_format="pyarrow",
    )
    from ..functions.exchange import bounded_group_map

    swept = bounded_group_map(
        exclusive, "sweep_bucket", lambda df: _sweep_bucket(df, now),
        batch_format="pandas",
    )
    return swept.union(rest)


def resolve_edges(edges_raw_ds, alias, now: datetime,
                  uuid_map_ds=None):
    """Full edge resolution chain — ONE src-bucketed shuffle feeding
    the fused dedupe+temporal reducer. Returns canonical edges Dataset
    with expired_at populated.

    Pointer rewrite: broadcast SortedKV below BROADCAST_MAX_ROWS, else
    the uuid_map hash-join path (pass uuid_map_ds). ``alias is None``
    means the map was too large to broadcast (canonicalize skipped
    building it) — the join path is then mandatory."""
    from .joins import BROADCAST_MAX_ROWS

    if alias is None and uuid_map_ds is None:
        raise ValueError("alias=None requires uuid_map_ds for the join path")
    if uuid_map_ds is not None and (
        alias is None or len(alias) > BROADCAST_MAX_ROWS
    ):
        e = rewrite_pointers_join(
            edges_raw_ds, uuid_map_ds, ["source_node_uuid", "target_node_uuid"]
        )
    else:
        e = rewrite_pointers(edges_raw_ds, alias)
    e = add_pair_key(e)
    preds = frozenset(EXCLUSIVE_PREDICATES)
    from ..functions.exchange import bounded_group_map

    e = bounded_group_map(
        e, "pair_bucket",
        lambda df: _merge_and_sweep_bucket(df, now, preds),
        batch_format="pandas",
    )
    final_cols = [
        "uuid", "source_node_uuid", "target_node_uuid", "name", "fact", "fact_norm",
        "episodes", "group_id", "created_at", "valid_at", "invalid_at", "expired_at",
        "partition_id",
    ]
    return e.map_batches(lambda t: t.select(final_cols), batch_format="pyarrow")
