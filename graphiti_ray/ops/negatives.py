"""Negative sampling over the canonical KG — the corrupted-triple
generator every KG-embedding trainer runs (TransE, Bordes et al. 2013
"Translating Embeddings...": for each positive (s, p, o), replace the
head OR the tail with a random entity from the same graph). Random
here means HASH-deterministic (md5 of the triple + sample slot, the
functions/hashing.md5_hash64 == DuckDB md5_number_lower pairing), so
every rerun/retry/resume emits byte-identical negatives and the DuckDB
oracle reproduces the sample exactly.

Contract (mirrored bit-for-bit in SQL):
- entity index = dense rank of canonical node names per group
  (ORDER BY name ASC), n = group entity count; groups with n < 2 are
  skipped (nothing to corrupt with).
- side: corrupt the head iff md5('ns-side|' key) is even, else tail.
- replacement: ridx = md5('ns-ent|' key) % (n-1), bumped by 1 when
  >= the original entity's index — skip-original sampling, so a
  negative never equals its positive. (When the corrupted side is not
  in the node table — possible for literal-valued objects — oidx
  falls back to n and no bump applies; the last-index entity is then
  unreachable for that row: deterministic, documented, mirrored.)

Scale shape: NOTHING is collected on the driver. The per-group dense
index is one bounded group exchange over the node table; the three
entity-table-sized folds (group count n, original-entity index,
replacement name by (group, ridx)) all route through
stages/joins.lookup_column's byte-capped broadcast / parquet-shard
tiers. The sample stream itself is edges x K rows, embarrassingly
parallel. Hashing is the vectorized single-block md5
(functions/hashing.md5_hash64_vec) — bit-identical to the DuckDB
image at numpy speed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import md5_hash64_vec

NEG_K = 2
_SEP = "\x1f"


def _entity_index(nodes_ds):
    """(group_id, name, idx) with idx = dense per-group rank by name."""
    from ..functions.exchange import bounded_group_map

    def idx(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("name").reset_index(drop=True)
        df["idx"] = np.arange(len(df), dtype=np.int64)
        return df[["group_id", "name", "idx"]]

    base = nodes_ds.select_columns(["group_id", "name"])
    return bounded_group_map(base, "group_id", idx, batch_format="pandas")


def negative_samples(nodes_ds, edges_named_ds, k: int = NEG_K):
    """(group_id, subj, pred, obj, sample_id, corrupt_side, neg_subj,
    neg_obj): k hash-deterministic corrupted triples per canonical
    edge. ``edges_named_ds`` carries (group_id, subj, name, obj)."""
    from ..stages.joins import lookup_column

    ents = _entity_index(nodes_ds).materialize()

    def keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "ik",
            pc.binary_join_element_wise(
                t.column("group_id").cast(pa.string()),
                pc.cast(t.column("idx"), pa.string()),
                _SEP,
            ),
        ).append_column(
            "nk",
            pc.binary_join_element_wise(
                t.column("group_id").cast(pa.string()),
                t.column("name").cast(pa.string()),
                _SEP,
            ),
        )

    ents_k = ents.map_batches(keys, batch_format="pyarrow").materialize()
    n_per_group = ents.groupby("group_id").count()

    def explode(t: pa.Table) -> pa.Table:
        grp = t.column("group_id").to_pylist()
        subj = t.column("subj").to_pylist()
        pred = t.column("name").to_pylist()
        obj = t.column("obj").to_pylist()
        rows = {
            "group_id": [], "subj": [], "pred": [], "obj": [],
            "sample_id": [],
        }
        for s in range(k):
            rows["group_id"] += grp
            rows["subj"] += subj
            rows["pred"] += pred
            rows["obj"] += obj
            rows["sample_id"] += [s] * len(grp)
        return pa.table(
            {
                "group_id": pa.array(rows["group_id"], pa.string()),
                "subj": pa.array(rows["subj"], pa.string()),
                "pred": pa.array(rows["pred"], pa.string()),
                "obj": pa.array(rows["obj"], pa.string()),
                "sample_id": pa.array(rows["sample_id"], pa.int64()),
            }
        )

    from .graph import _distinct_by_key

    ded = _distinct_by_key(
        edges_named_ds.select_columns(["group_id", "subj", "name", "obj"]),
        ["group_id", "subj", "name", "obj"],
        "ek",
    )
    samples = ded.map_batches(explode, batch_format="pyarrow")

    samples = lookup_column(
        samples, "group_id", n_per_group, "group_id", "count()", "n",
        val_type=pa.int64(),
    )

    def side_and_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t.column("n"), 2))
        grp = np.asarray(t.column("group_id").to_pylist(), object)
        subj = np.asarray(t.column("subj").to_pylist(), object)
        obj = np.asarray(t.column("obj").to_pylist(), object)
        key_arr = pc.binary_join_element_wise(
            t.column("group_id").cast(pa.string()),
            t.column("subj").cast(pa.string()),
            t.column("pred").cast(pa.string()),
            t.column("obj").cast(pa.string()),
            pc.cast(t.column("sample_id"), pa.string()),
            _SEP,
        )
        chead = md5_hash64_vec(key_arr, salt="ns-side|") % np.uint64(
            2
        ) == 0
        h2 = md5_hash64_vec(key_arr, salt="ns-ent|")
        orig = np.where(chead, subj, obj)
        onk = np.char.add(
            np.char.add(grp.astype(str), _SEP), orig.astype(str)
        )
        t = t.append_column("chead", pa.array(chead, pa.bool_()))
        t = t.append_column(
            "h2", pa.array(h2.astype(np.int64), pa.int64())
        )
        return t.append_column("onk", pa.array(onk, pa.string()))

    samples = samples.map_batches(side_and_key, batch_format="pyarrow")
    samples = lookup_column(
        samples, "onk", ents_k, "nk", "idx", "oidx", val_type=pa.int64()
    )

    def ridx(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = np.asarray(t.column("n"), np.int64)
        h2 = np.asarray(t.column("h2"), np.int64).astype(np.uint64)
        oidx = np.asarray(
            t.column("oidx").combine_chunks().fill_null(-1), np.int64
        )
        oidx = np.where(oidx < 0, n, oidx)  # miss -> n (no bump)
        r = (h2 % (n - 1).astype(np.uint64)).astype(np.int64)
        r = r + (r >= oidx)
        rk = pc.binary_join_element_wise(
            t.column("group_id").cast(pa.string()),
            pa.array(r.astype(str), pa.string()),
            _SEP,
        )
        return t.append_column("rk", rk)

    samples = samples.map_batches(ridx, batch_format="pyarrow")
    samples = lookup_column(
        samples, "rk", ents_k, "ik", "name", "repl", val_type=pa.string()
    )

    def finish(t: pa.Table) -> pa.Table:
        chead = np.asarray(t.column("chead"), bool)
        subj = np.asarray(t.column("subj").to_pylist(), object)
        obj = np.asarray(t.column("obj").to_pylist(), object)
        repl = np.asarray(t.column("repl").to_pylist(), object)
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "subj": t.column("subj"),
                "pred": t.column("pred"),
                "obj": t.column("obj"),
                "sample_id": t.column("sample_id"),
                "corrupt_side": pa.array(
                    np.where(chead, "head", "tail"), pa.string()
                ),
                "neg_subj": pa.array(
                    np.where(chead, repl, subj), pa.string()
                ),
                "neg_obj": pa.array(
                    np.where(chead, obj, repl), pa.string()
                ),
            }
        )

    return samples.map_batches(finish, batch_format="pyarrow")


NEGATIVE_SAMPLES_SQL_BODY = f"""
, ns_ne AS (
  SELECT DISTINCT e.grp, c.cname AS name
  FROM ent_d e JOIN canon c ON c.grp = e.grp AND c.comp = e.comp
),
ns_ni AS (
  SELECT grp, name,
         (row_number() OVER (PARTITION BY grp ORDER BY name) - 1)::BIGINT
           AS idx
  FROM ns_ne
),
ns_nc AS (SELECT grp, COUNT(*)::BIGINT AS n FROM ns_ne GROUP BY grp),
ns_ed AS (SELECT DISTINCT grp, subj, pred, obj FROM swept),
ns_sl AS (
  SELECT ns_ed.*, u.s::BIGINT AS sample_id
  FROM ns_ed, unnest([{", ".join(str(i) for i in range(NEG_K))}]) AS u(s)
),
ns_hh AS (
  SELECT ns_sl.*,
    (md5_number_lower('ns-side|' || grp || chr(31) || subj || chr(31) ||
       pred || chr(31) || obj || chr(31) || sample_id::VARCHAR)
       % 2 = 0) AS chead,
    md5_number_lower('ns-ent|' || grp || chr(31) || subj || chr(31) ||
       pred || chr(31) || obj || chr(31) || sample_id::VARCHAR) AS h2
  FROM ns_sl
),
ns_ox AS (
  SELECT ns_hh.*, ns_nc.n,
         COALESCE(ns_ni.idx, ns_nc.n) AS oidx
  FROM ns_hh
  JOIN ns_nc ON ns_nc.grp = ns_hh.grp AND ns_nc.n >= 2
  LEFT JOIN ns_ni ON ns_ni.grp = ns_hh.grp
    AND ns_ni.name = CASE WHEN chead THEN subj ELSE obj END
),
ns_rx AS (
  SELECT ns_ox.*,
    ((h2 % (n - 1)::UBIGINT)::BIGINT +
     CASE WHEN (h2 % (n - 1)::UBIGINT)::BIGINT >= oidx
          THEN 1 ELSE 0 END) AS ridx
  FROM ns_ox
)
SELECT ns_rx.grp AS group_id, subj, pred, obj, sample_id,
       CASE WHEN chead THEN 'head' ELSE 'tail' END AS corrupt_side,
       CASE WHEN chead THEN r.name ELSE subj END AS neg_subj,
       CASE WHEN chead THEN obj ELSE r.name END AS neg_obj
FROM ns_rx JOIN ns_ni r ON r.grp = ns_rx.grp AND r.idx = ns_rx.ridx
"""
