"""Distributed graph analytics over the canonical KG (PageRank).

The reference exposes its graph only through search (BM25 / cosine /
BFS) and community detection; a batch KG engine at web scale also
needs whole-graph analytics — PageRank is the canonical one (Page et
al. 1999, "The PageRank Citation Ranking") and the standard centrality
feature for entity-importance weighting in retrieval pipelines.

Determinism contract (same trick as ops/clustering.py's unrolled
Lloyd): the iteration count is FIXED (PR_ITERS), ranks are ROUNDED to
PR_ROUND decimals after every update, and the output is an integer
(round(rank * 1e9)) so the driver's value-hash compare is float-free.
Every arithmetic step is an identical IEEE-754 double expression in
both engines; the only order-dependent op is the in-neighbor SUM,
whose cross-engine drift (~1e-17) collapses on the 1e-9 rounding grid.
That makes the whole algorithm SQL-expressible: PAGERANK_SQL_BODY
unrolls the iterations as a CTE chain over the shared KG oracle CTEs.

Semantics (fixed, documented):
- The graph is the DISTINCT (group_id, subj, obj) canonical edge set —
  multi-edges (same pair, different predicate/fact) collapse to one
  link; self-loops are kept. Each group_id is an independent graph.
- r0(v) = round(1/N_g, PR_ROUND); r_{i+1}(v) = round((1-d)/N_g +
  d * sum_{u->v} r_i(u)/outdeg(u), PR_ROUND).
- Dangling-node mass is DROPPED (ranks need not sum to 1) — the
  simplest contract that is bit-identical across engines; both sides
  implement exactly it.

Scale shape (the 100-TB story — Pregel-style, per-iteration cost
bounded):
- The edge list is deduped and annotated with out-degree ONCE
  (one composite-key exchange), then reused across iterations — the
  corpus-sized table never moves again.
- Each iteration ships only the O(nodes) rank vector: a tiered
  lookup (stages/joins.lookup_column — zero-copy broadcast under the
  byte cap, hash-sharded parquet join above it) lands r(u)/outdeg(u)
  on each edge, per-block PARTIAL sums shrink the exchange to
  O(blocks x distinct targets per block), and ONE groupby(target)
  exchange produces the new vector. Nothing corpus-sized reaches the
  driver; the only driver state is the tiny per-group node-count dict.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PR_DAMP = 0.85
PR_ITERS = 3
PR_ROUND = 9
_SEP = "\x1f"


def _key2(t: pa.Table, a: str, b: str) -> pa.ChunkedArray:
    return pc.binary_join_element_wise(
        pc.cast(t.column(a), pa.string()), pc.cast(t.column(b), pa.string()), _SEP
    )


def _distinct_by_key(ds, cols: list[str], key: str):
    """DISTINCT over ``cols`` as ONE exchange, fully vectorized: encode
    the tuple into a \\x1f-joined key per block (map-side dedupe), a
    groupby(key).count() global exchange, then split the key back into
    columns — no per-group Python callable."""

    def block_dedupe(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            *[pc.cast(t.column(c), pa.string()) for c in cols], _SEP
        )
        return pa.table({key: k}).group_by(key).aggregate([])

    ded = ds.map_batches(block_dedupe, batch_format="pyarrow").groupby(key).count()

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column(key), _SEP)
        out = {c: pc.list_element(parts, i) for i, c in enumerate(cols)}
        return pa.table(out)

    return ded.map_batches(split, batch_format="pyarrow")


def _distinct_edges(edges_ds):
    """DISTINCT (group_id, subj, obj) + source/target composite keys."""
    ded = _distinct_by_key(edges_ds, ["group_id", "subj", "obj"], "ek")

    def keys(t: pa.Table) -> pa.Table:
        return t.append_column("sk", _key2(t, "group_id", "subj")).append_column(
            "tk", _key2(t, "group_id", "obj")
        )

    return ded.map_batches(keys, batch_format="pyarrow")


def _distinct_nodes(nodes_ds):
    """DISTINCT (group_id, name) + composite key nk."""
    ded = _distinct_by_key(nodes_ds, ["group_id", "name"], "nk")

    def keys(t: pa.Table) -> pa.Table:
        return t.append_column("nk", _key2(t, "group_id", "name"))

    return ded.map_batches(keys, batch_format="pyarrow")


def pagerank(nodes_ds, edges_ds):
    """PageRank over (group_id, name) nodes / (group_id, subj, obj)
    edges -> Dataset (group_id, name, pr_e9:int64). Each group_id is an
    independent graph; see the module docstring for the exact contract.
    """
    import ray

    from ..stages.joins import broadcast_map, get_broadcast, lookup_column

    nodes = _distinct_nodes(nodes_ds).materialize()
    ed = _distinct_edges(edges_ds)

    # out-degree per source, folded onto the edge table ONCE
    deg = ed.groupby("sk").count()
    ed = lookup_column(
        ed, "sk", deg, "sk", "count()", "deg", val_type=pa.int64()
    ).materialize()

    # per-group node count: #groups rows -> driver dict -> object store
    ng = nodes.groupby("group_id").count()
    n_ref = ray.put(broadcast_map(ng, "group_id", "count()"))

    def init_ranks(t: pa.Table) -> pa.Table:
        n_of = get_broadcast(n_ref)
        n = np.array(
            [n_of[g] for g in t.column("group_id").to_pylist()], dtype=np.float64
        )
        r = np.round(1.0 / n, PR_ROUND)
        return pa.table(
            {"nk": t.column("nk"), "group_id": t.column("group_id"), "r": pa.array(r)}
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        r = t.column("r").to_numpy(zero_copy_only=False)
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        w = r / d
        part = pa.table({"tk": t.column("tk"), "w": pa.array(w)})
        # map-side combine: one row per distinct target per block
        return part.group_by("tk").aggregate([("w", "sum")])

    for _ in range(PR_ITERS):
        ed_r = lookup_column(
            ed, "sk", ranks, "nk", "r", "r", val_type=pa.float64()
        )
        sums = ed_r.map_batches(contrib, batch_format="pyarrow").groupby(
            "tk"
        ).sum("w_sum")
        withs = lookup_column(
            nodes, "nk", sums, "tk", "sum(w_sum)", "s", val_type=pa.float64()
        )

        def update(t: pa.Table) -> pa.Table:
            n_of = get_broadcast(n_ref)
            n = np.array(
                [n_of[g] for g in t.column("group_id").to_pylist()],
                dtype=np.float64,
            )
            s = t.column("s").to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s), 0.0, s)
            r = np.round((1.0 - PR_DAMP) / n + PR_DAMP * s, PR_ROUND)
            return pa.table(
                {
                    "nk": t.column("nk"),
                    "group_id": t.column("group_id"),
                    "r": pa.array(r),
                }
            )

        ranks = withs.map_batches(update, batch_format="pyarrow").materialize()

    final = lookup_column(
        nodes, "nk", ranks, "nk", "r", "r", val_type=pa.float64()
    )

    def out(t: pa.Table) -> pa.Table:
        r = t.column("r").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "name": t.column("name"),
                "pr_e9": pa.array(np.rint(r * 1e9).astype(np.int64)),
            }
        )

    return final.map_batches(out, batch_format="pyarrow")


# ------------------------------------------------------- SQL mirror

def pagerank_sql_body() -> str:
    """Unrolled-iteration PageRank over the shared KG oracle CTEs
    (expects ``swept``/``ent_d``/``canon`` in scope — compose with
    queries._kg_docs_sql). Expressions match ops/graph.pagerank
    bit-for-bit modulo in-neighbor summation order (collapsed by the
    PR_ROUND grid)."""
    d = PR_DAMP
    parts = [
        ", pr_nodes AS (SELECT DISTINCT e.grp, c.cname AS name"
        "  FROM ent_d e JOIN canon c ON c.grp = e.grp AND c.comp = e.comp)",
        ", pr_ng AS (SELECT grp, count(*) AS n FROM pr_nodes GROUP BY grp)",
        ", pr_ed AS (SELECT DISTINCT grp, subj, obj FROM swept)",
        ", pr_od AS (SELECT grp, subj, count(*) AS deg FROM pr_ed"
        "  GROUP BY grp, subj)",
        f", pr_r0 AS (SELECT n.grp, n.name, round(1.0/g.n, {PR_ROUND}) AS r"
        "  FROM pr_nodes n JOIN pr_ng g ON g.grp = n.grp)",
    ]
    prev = "pr_r0"
    for i in range(1, PR_ITERS + 1):
        cur = f"pr_r{i}"
        parts.append(f""", {cur} AS (
  SELECT n.grp, n.name,
    round((1.0 - {d})/g.n + {d} * COALESCE(s.s, 0.0), {PR_ROUND}) AS r
  FROM pr_nodes n JOIN pr_ng g ON g.grp = n.grp
  LEFT JOIN (
    SELECT e.grp, e.obj AS name, sum(r.r / od.deg) AS s
    FROM pr_ed e
    JOIN {prev} r ON r.grp = e.grp AND r.name = e.subj
    JOIN pr_od od ON od.grp = e.grp AND od.subj = e.subj
    GROUP BY e.grp, e.obj) s ON s.grp = n.grp AND s.name = n.name)""")
        prev = cur
    parts.append(
        f"\nSELECT grp AS group_id, name,"
        f" CAST(round(r * 1e9) AS BIGINT) AS pr_e9 FROM {prev}"
    )
    return "".join(parts)
