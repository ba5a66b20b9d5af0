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


def pagerank(nodes_ds, edges_ds, force_dataset_tier: bool = False):
    """PageRank over (group_id, name) nodes / (group_id, subj, obj)
    edges -> Dataset (group_id, name, pr_e9:int64). Each group_id is an
    independent graph; see the module docstring for the exact contract.

    Two tiers, same contract (forced-tier equality is pytest-pinned):
    - broadcast tier (node count <= joins.BROADCAST_MAX_ROWS): the
      O(nodes) rank vector lives on the driver/object store like the
      k-means centroids — each iteration is ONE streaming pass over
      the edge table (broadcast ranks in, per-block partial sums out)
      + one tiny groupby whose O(nodes) result returns to the driver.
      3 exchanges total for 3 iterations.
    - dataset tier (above the cap): ranks stay a Dataset; the
      per-iteration join runs through lookup_column's tiered
      broadcast/shard machinery and one groupby(target) exchange.
    """
    from ..stages.joins import BROADCAST_MAX_ROWS, lookup_column

    nodes = _distinct_nodes(nodes_ds).materialize()
    ed = _distinct_edges(edges_ds)

    # out-degree per source, folded onto the edge table ONCE
    deg = ed.groupby("sk").count()
    ed = lookup_column(
        ed, "sk", deg, "sk", "count()", "deg", val_type=pa.int64()
    ).materialize()

    n_nodes = nodes.count()
    if not force_dataset_tier and n_nodes <= BROADCAST_MAX_ROWS:
        return _pagerank_broadcast(nodes, ed)
    return _pagerank_dataset(nodes, ed)


def _pagerank_broadcast(nodes, ed):
    import ray

    from ..stages.joins import get_broadcast

    # O(nodes) driver state: sorted node keys, group sizes, rank vector
    nd = nodes.to_pandas()
    order = np.argsort(nd["nk"].to_numpy())
    nk = nd["nk"].to_numpy()[order]
    grp = nd["group_id"].to_numpy()[order]
    n_of_grp = nd.groupby("group_id")["nk"].size()
    n = n_of_grp.reindex(grp).to_numpy().astype(np.float64)
    r = np.round(1.0 / n, PR_ROUND)

    def partials(t: pa.Table, rref) -> pa.Table:
        keys, rank = get_broadcast(rref)
        sk = t.column("sk").to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(keys, sk), 0, max(len(keys) - 1, 0))
        ok = keys[idx] == sk  # edges from unknown sources contribute 0
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.where(ok, rank[idx] / d, 0.0)
        part = pa.table({"tk": t.column("tk"), "w": pa.array(w)})
        return part.group_by("tk").aggregate([("w", "sum")])

    for _ in range(PR_ITERS):
        rref = ray.put((nk, r))
        rows = (
            ed.map_batches(partials, fn_args=(rref,), batch_format="pyarrow")
            .groupby("tk")
            .sum("w_sum")
            .to_pandas()
        )  # O(nodes) rows — the only driver traffic of the iteration
        s = np.zeros(len(nk))
        tks = rows["tk"].to_numpy()
        idx = np.clip(np.searchsorted(nk, tks), 0, max(len(nk) - 1, 0))
        ok = nk[idx] == tks  # mass flowing to non-node targets is dropped
        s[idx[ok]] = rows["sum(w_sum)"].to_numpy()[ok]
        r = np.round((1.0 - PR_DAMP) / n + PR_DAMP * s, PR_ROUND)

    fref = ray.put((nk, r))

    def out(t: pa.Table, rref) -> pa.Table:
        keys, rank = get_broadcast(rref)
        idx = np.searchsorted(keys, t.column("nk").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "name": t.column("name"),
                "pr_e9": pa.array(np.rint(rank[idx] * 1e9).astype(np.int64)),
            }
        )

    return nodes.map_batches(out, fn_args=(fref,), batch_format="pyarrow")


def _pagerank_dataset(nodes, ed):
    import ray

    from ..stages.joins import broadcast_map, get_broadcast, lookup_column

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


def _undirected_edges(edges_ds):
    """DISTINCT undirected edge set per group: (group_id, u, v) with
    u < v (name order), self-loops dropped — the standard graph-ified
    view of the multi-digraph."""

    def orient(t: pa.Table) -> pa.Table:
        s = t.column("subj").cast(pa.string())
        o = t.column("obj").cast(pa.string())
        keep = pc.not_equal(s, o)
        t2 = pa.table(
            {
                "group_id": pc.filter(t.column("group_id"), keep),
                "u": pc.filter(pc.min_element_wise(s, o), keep),
                "v": pc.filter(pc.max_element_wise(s, o), keep),
            }
        )
        return t2

    return _distinct_by_key(
        edges_ds.map_batches(orient, batch_format="pyarrow"),
        ["group_id", "u", "v"],
        "uk",
    )


def _adjacency_rows(und):
    """(group_id, node, nbr): both directions of the undirected
    distinct edge set — the shared symmetrization step of bfs_reach /
    link_prediction / transitivity / modularity."""

    def sym(t: pa.Table) -> pa.Table:
        g = t.column("group_id").combine_chunks()
        return pa.table(
            {
                "group_id": pa.chunked_array([g, g]),
                "node": pa.chunked_array(
                    [
                        t.column("u").combine_chunks(),
                        t.column("v").combine_chunks(),
                    ]
                ),
                "nbr": pa.chunked_array(
                    [
                        t.column("v").combine_chunks(),
                        t.column("u").combine_chunks(),
                    ]
                ),
            }
        )

    return und.map_batches(sym, batch_format="pyarrow")


def triangle_count(edges_ds, und=None):
    """(group_id, n_triangles) over the undirected distinct edge set.

    Distributed shape (the 100-TB story): the name-order orientation
    (u < v) means each triangle {x<y<z} is counted exactly once as the
    wedge (x-y, y-z) closed by the edge (x, z). Wedges are generated
    per PIVOT node (one groupby(group, mid) exchange; per-group kernel
    is a vectorized triu_indices pair expansion), then closed by ONE
    more exchange that co-locates wedges with the edge set on the
    (group, endpoints) key — count = wedges landing on a real edge.
    Hot pivots are the known skew (a celebrity entity's wedge set is
    O(deg^2)); production would cap/bucketize pivot degree — at this
    corpus's degrees the exact path is the right default.

    ``und``: pass an already-materialized _undirected_edges dataset to
    skip the dedup exchange (transitivity shares one).
    """
    und = und if und is not None else _undirected_edges(edges_ds).materialize()

    # wedges pivoted at the LOWER endpoint u: for u's neighbor set
    # {n1 < n2 < ...}, every pair (ni, nj) is a candidate closing edge
    def mid_key(t: pa.Table) -> pa.Table:
        return t.append_column("mk", _key2(t, "group_id", "u"))

    def wedges(g: pa.Table) -> pa.Table:
        grp = g.column("group_id")[0].as_py()
        nbrs = np.sort(
            np.asarray(g.column("v").to_numpy(zero_copy_only=False), dtype=object)
        )
        m = len(nbrs)
        if m < 2:
            return pa.table(
                {
                    "group_id": pa.array([], pa.string()),
                    "u": pa.array([], pa.string()),
                    "v": pa.array([], pa.string()),
                }
            )
        i, j = np.triu_indices(m, k=1)
        return pa.table(
            {
                "group_id": pa.array([grp] * len(i), pa.string()),
                "u": pa.array(nbrs[i], pa.string()),
                "v": pa.array(nbrs[j], pa.string()),
            }
        )

    w = (
        und.map_batches(mid_key, batch_format="pyarrow")
        .groupby("mk")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def tag(is_edge: bool):
        def f(t: pa.Table) -> pa.Table:
            k = pc.binary_join_element_wise(
                t.column("group_id").cast(pa.string()),
                t.column("u").cast(pa.string()),
                t.column("v").cast(pa.string()),
                _SEP,
            )
            n = t.num_rows
            out = pa.table(
                {
                    "k": k,
                    "w": pa.array(np.full(n, 0 if is_edge else 1), pa.int64()),
                    "e": pa.array(np.full(n, 1 if is_edge else 0), pa.int64()),
                }
            )
            # map-side combine: per-block wedge multiplicity is 1 by
            # construction, but blocks of wedges from different pivots
            # can repeat a key
            return out.group_by("k").aggregate([("w", "sum"), ("e", "sum")])

        return f

    both = w.map_batches(tag(False), batch_format="pyarrow").union(
        und.map_batches(tag(True), batch_format="pyarrow")
    )

    from ray.data.aggregate import Sum

    per_key = both.groupby("k").aggregate(Sum("w_sum"), Sum("e_sum"))

    def close(t: pa.Table) -> pa.Table:
        # vectorized: a wedge key contributes its wedge count iff the
        # closing edge exists; group_id is the key's first component
        parts = pc.split_pattern(t.column("k"), _SEP)
        wn = t.column("sum(w_sum)").to_numpy(zero_copy_only=False)
        en = t.column("sum(e_sum)").to_numpy(zero_copy_only=False)
        tri = np.where(en > 0, wn, 0).astype(np.int64)
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "tri": pa.array(tri),
            }
        )

    agg = (
        per_key.map_batches(close, batch_format="pyarrow")
        .groupby("group_id")
        .sum("tri")
    )

    def out(t: pa.Table) -> pa.Table:
        n = t.column("sum(tri)").cast(pa.int64())
        keep = pc.greater(n, 0)
        return pa.table(
            {
                "group_id": pc.filter(t.column("group_id"), keep),
                "n_triangles": pc.filter(n, keep),
            }
        )

    return agg.map_batches(out, batch_format="pyarrow")


def degree_histogram(edges_ds):
    """(group_id, degree, n_nodes) over the undirected distinct edge
    set — degree distribution per group. Two tiny exchanges (node
    degree, then histogram)."""
    und = _undirected_edges(edges_ds)

    def endpoints(t: pa.Table) -> pa.Table:
        gcol = t.column("group_id").cast(pa.string())
        halves = [
            pa.table({"group_id": gcol, "name": t.column(c).cast(pa.string())})
            for c in ("u", "v")
        ]
        out = pa.concat_tables(halves)
        out = out.append_column(
            "nk",
            pc.binary_join_element_wise(
                out.column("group_id"), out.column("name"), _SEP
            ),
        )
        # map-side combine (access by NAME — pyarrow group_by column
        # order is an implementation detail)
        g = out.group_by("nk").aggregate([([], "count_all")])
        return pa.table(
            {"nk": g.column("nk"), "d": g.column("count_all").cast(pa.int64())}
        )

    deg = (
        und.map_batches(endpoints, batch_format="pyarrow")
        .groupby("nk")
        .sum("d")
    )

    def gk(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("nk"), _SEP)
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "degree": t.column("sum(d)").cast(pa.int64()),
            }
        )

    hist = (
        deg.map_batches(gk, batch_format="pyarrow")
        .groupby(["group_id", "degree"])
        .count()
    )

    def out(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "degree": t.column("degree"),
                "n_nodes": t.column("count()").cast(pa.int64()),
            }
        )

    return hist.map_batches(out, batch_format="pyarrow")


def two_hop_paths(edges_ds, degree_cap: int | None = -1):
    """Every directed 2-hop path (src -pred1-> mid -pred2-> dst) over
    the DISTINCT (group, subj, pred, obj) canonical edge set — the
    basic KG path query (the reference reaches 2-hop neighborhoods
    only via per-query BFS, search_utils edge BFS; a batch engine
    needs the whole path table, e.g. as training signal for KG-aware
    retrieval or multi-hop QA candidates).

    Distributed shape: edges deduped (one composite-key exchange),
    then BOTH sides stream once, tagged with the join key
    (group, mid-entity) — incoming edges key on their object, outgoing
    on their subject — and meet in ONE bounded groupby exchange whose
    per-group kernel is a vectorized numpy cross product (every row in
    a group shares the same mid, so the join IS the cross product).
    Hot mid-entities are the known skew (a hub contributes
    in-deg x out-deg paths): each hub's in- and out-edge lists are
    capped to ``degree_cap`` entries (default ops/wedgecap
    WEDGE_DEGREE_CAP; keep-first on a deterministic sort, drop count
    logged), so one reducer group never exceeds cap^2 output rows at
    any corpus size. ``degree_cap=None`` disables the cap;
    the fixtures' max degree sits far below the default, so oracle
    compares exercise exact semantics.
    """
    import pandas as pd

    from ..functions.exchange import bounded_group_map
    from .wedgecap import WEDGE_DEGREE_CAP, cap_frame

    cap = WEDGE_DEGREE_CAP if degree_cap == -1 else degree_cap

    ded = _distinct_by_key(
        edges_ds.select_columns(["group_id", "subj", "name", "obj"]),
        ["group_id", "subj", "name", "obj"],
        "ek",
    )

    def tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        core = pa.table(
            {
                "group_id": t.column("group_id"),
                "subj": t.column("subj"),
                "pred": t.column("name"),
                "obj": t.column("obj"),
            }
        )
        both = pa.concat_tables([core, core])
        jk = pa.chunked_array(
            [
                _key2(t, "group_id", "obj").combine_chunks(),
                _key2(t, "group_id", "subj").combine_chunks(),
            ]
        )
        side = pa.array(
            np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
        )
        return both.append_column("jk", jk).append_column("side", side)

    tagged = ded.map_batches(tag, batch_format="pyarrow")

    def close(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]  # edges INTO the shared mid
        b = df[df["side"] == 1]  # edges OUT of the shared mid
        if a.empty or b.empty:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype=object)
                    for c in ("group_id", "src", "pred1", "mid",
                              "pred2", "dst")
                }
            )
        hub = str(df["jk"].iloc[0])
        a = cap_frame(a, cap, ["subj", "pred"], "two_hop in-edges", hub)
        b = cap_frame(b, cap, ["pred", "obj"], "two_hop out-edges", hub)
        na, nb = len(a), len(b)
        return pd.DataFrame(
            {
                "group_id": np.repeat(a["group_id"].to_numpy(), nb),
                "src": np.repeat(a["subj"].to_numpy(), nb),
                "pred1": np.repeat(a["pred"].to_numpy(), nb),
                "mid": np.repeat(a["obj"].to_numpy(), nb),
                "pred2": np.tile(b["pred"].to_numpy(), na),
                "dst": np.tile(b["obj"].to_numpy(), na),
            }
        )

    return bounded_group_map(tagged, "jk", close, batch_format="pandas")


# ------------------------------------------------------- SQL mirrors

TWO_HOP_SQL_BODY = """
, th AS (SELECT DISTINCT grp, subj, pred, obj FROM swept)
SELECT a.grp AS group_id, a.subj AS src, a.pred AS pred1,
       a.obj AS mid, b.pred AS pred2, b.obj AS dst
FROM th a JOIN th b ON b.grp = a.grp AND b.subj = a.obj
"""

TRIANGLES_SQL_BODY = """
, tri_und AS (
  SELECT DISTINCT grp, least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM swept WHERE subj <> obj)
SELECT a.grp AS group_id, count(*) AS n_triangles
FROM tri_und a
JOIN tri_und b ON b.grp = a.grp AND b.u = a.v
JOIN tri_und c ON c.grp = a.grp AND c.u = a.u AND c.v = b.v
GROUP BY a.grp
"""

DEGREE_HIST_SQL_BODY = """
, dh_und AS (
  SELECT DISTINCT grp, least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM swept WHERE subj <> obj),
dh_deg AS (
  SELECT grp, name, count(*) AS degree FROM (
    SELECT grp, u AS name FROM dh_und
    UNION ALL SELECT grp, v FROM dh_und)
  GROUP BY grp, name)
SELECT grp AS group_id, degree, count(*) AS n_nodes
FROM dh_deg GROUP BY grp, degree
"""


def pagerank_sql_over(nodes_rel: str, edges_rel: str) -> str:
    """Unrolled-iteration PageRank body over arbitrary relations:
    ``nodes_rel`` yields (grp, name), ``edges_rel`` yields
    (grp, subj, obj). Expressions match ops/graph.pagerank bit-for-bit
    modulo in-neighbor summation order (collapsed by the PR_ROUND
    grid). Shared by the KG oracle and the host link-graph oracle."""
    d = PR_DAMP
    parts = [
        f", pr_nodes AS ({nodes_rel})",
        ", pr_ng AS (SELECT grp, count(*) AS n FROM pr_nodes GROUP BY grp)",
        f", pr_ed AS ({edges_rel})",
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


def pagerank_sql_body() -> str:
    """Unrolled-iteration PageRank over the shared KG oracle CTEs
    (expects ``swept``/``ent_d``/``canon`` in scope — compose with
    queries._kg_docs_sql)."""
    return pagerank_sql_over(
        "SELECT DISTINCT e.grp, c.cname AS name"
        "  FROM ent_d e JOIN canon c ON c.grp = e.grp AND c.comp = e.comp",
        "SELECT DISTINCT grp, subj, obj FROM swept",
    )


# ------------------------------------------------------------- BFS reach

BFS_MAX_DEPTH = 3


def bfs_reach(edges_ds, max_depth: int = BFS_MAX_DEPTH):
    """Min-depth BFS reachability (group_id, seed, node, depth<=3) from
    the per-group max-degree entity over the symmetrized distinct edge
    set — the batch analog of the reference's per-query edge BFS
    (graphiti_core search_utils edge_bfs_search, depth<=3), exposed as
    an oracle-checkable TABLE (Q6's driver-facing promotion).

    Semantics (fixed, documented): graph = undirected distinct edges,
    self-loops dropped; seed = argmax distinct-neighbor degree, ties
    by name; each hop expands the DISTINCT frontier (revisits allowed
    across depths — the final min(depth) groupby resolves them, which
    is exactly what the mirror's UNION ALL + GROUP BY does).

    Distributed shape: max_depth bounded frontier-x-adjacency
    exchanges — frontier and adjacency are bucketed by
    pid = hash(group, node) % width and each reducer joins EVERY key
    in its bucket with one vectorized pandas merge (the repo's
    many-tiny-groups convention: never one pandas round-trip per
    node), plus one pre-aggregated min-depth groupby at the end. The
    adjacency is re-exchanged per hop — at 100 TB you'd co-partition
    it once by (group, node) and keep it resident; the per-hop join
    key is already that partitioning key, so the upgrade is a cache,
    not a redesign.
    """
    import pandas as pd

    from ..functions.exchange import bounded_group_map, exchange_width
    from ..functions.hashing import bucket_array
    from .cooccur import _counted

    und = _undirected_edges(edges_ds)
    adj = _adjacency_rows(und).materialize()

    def split_deg(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("dk"), _SEP)
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "node": pc.list_element(parts, 1),
                "d": t.column("sum(cnt)"),
            }
        )

    deg = _counted(adj, ["group_id", "node"], "dk").map_batches(
        split_deg, batch_format="pyarrow"
    )

    def pick_seed(df: pd.DataFrame) -> pd.DataFrame:
        top = df.sort_values(["d", "node"], ascending=[False, True]).iloc[0]
        return pd.DataFrame(
            [{"group_id": top["group_id"], "seed": top["node"],
              "node": top["node"]}]
        )

    frontier = bounded_group_map(
        deg, "group_id", pick_seed, batch_format="pandas"
    )

    width = exchange_width()

    def tag_adj(t: pa.Table) -> pa.Table:
        jk = _key2(t, "group_id", "node")
        n = t.num_rows
        return pa.table(
            {
                "pid": pa.array(bucket_array(jk, width, salt="bfs")),
                "side": pa.array(np.zeros(n, np.int8)),
                "group_id": t.column("group_id"),
                "seed": pa.nulls(n, pa.string()),
                "node": t.column("node"),
                "nbr": t.column("nbr"),
            }
        )

    adj_tagged = adj.map_batches(tag_adj, batch_format="pyarrow")

    def tag_frontier(t: pa.Table) -> pa.Table:
        jk = _key2(t, "group_id", "node")
        n = t.num_rows
        return pa.table(
            {
                "pid": pa.array(bucket_array(jk, width, salt="bfs")),
                "side": pa.array(np.ones(n, np.int8)),
                "group_id": t.column("group_id"),
                "seed": t.column("seed").cast(pa.string()),
                "node": t.column("node"),
                "nbr": pa.nulls(n, pa.string()),
            }
        )

    levels = [frontier]
    for _ in range(max_depth):

        def hop(df: pd.DataFrame) -> pd.DataFrame:
            fr = df[df["side"] == 1][["group_id", "seed", "node"]]
            ad = df[df["side"] == 0][["group_id", "node", "nbr"]]
            m = fr.merge(ad, on=["group_id", "node"])
            return pd.DataFrame(
                {
                    "group_id": m["group_id"].to_numpy(),
                    "seed": m["seed"].to_numpy(),
                    "node": m["nbr"].to_numpy(),
                }
            )

        tagged = levels[-1].map_batches(
            tag_frontier, batch_format="pyarrow"
        ).union(adj_tagged)
        # bounded_group_map coalesces to data-sized blocks before the
        # exchange; pid has only `width` distinct values, so the
        # per-key pandas merge runs `width` times, not per node
        nxt = bounded_group_map(tagged, "pid", hop, batch_format="pandas")
        levels.append(
            _distinct_by_key(nxt, ["group_id", "seed", "node"], "vk")
        )

    def with_depth(k: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "group_id": t.column("group_id"),
                    "seed": t.column("seed").cast(pa.string()),
                    "node": t.column("node").cast(pa.string()),
                    "depth": pa.array(
                        np.full(t.num_rows, k, np.int64)
                    ),
                }
            )

        return f

    allv = levels[0].map_batches(with_depth(0), batch_format="pyarrow")
    for k, lv in enumerate(levels[1:], start=1):
        allv = allv.union(
            lv.map_batches(with_depth(k), batch_format="pyarrow")
        )

    # min depth per (group, seed, node): map-side pre-min per block,
    # ONE groupby(key).min exchange, vectorized key split — no
    # per-node pandas kernel
    def pre_min(t: pa.Table) -> pa.Table:
        vk = pc.binary_join_element_wise(
            t.column("group_id").cast(pa.string()),
            t.column("seed").cast(pa.string()),
            t.column("node").cast(pa.string()),
            _SEP,
        )
        agg = (
            pa.table({"vk": vk, "depth": t.column("depth")})
            .group_by("vk")
            .aggregate([("depth", "min")])
        )
        return pa.table(
            {"vk": agg.column("vk"), "depth": agg.column("depth_min")}
        )

    from ..functions.exchange import coalesced

    merged = (
        coalesced(
            allv.map_batches(pre_min, batch_format="pyarrow").materialize()
        )
        .groupby("vk")
        .min("depth")
    )

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("vk"), _SEP)
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "seed": pc.list_element(parts, 1),
                "node": pc.list_element(parts, 2),
                "depth": pc.cast(t.column("min(depth)"), pa.int64()),
            }
        )

    return merged.map_batches(split, batch_format="pyarrow")


def bfs_reach_sql_body(max_depth: int = BFS_MAX_DEPTH) -> str:
    levels = []
    prev = "bfs_r0"
    for k in range(1, max_depth + 1):
        levels.append(
            f"bfs_r{k} AS (\n"
            f"  SELECT DISTINCT a.grp, a.seed, j.nbr AS node\n"
            f"  FROM {prev} a JOIN bfs_adj j\n"
            f"    ON j.grp = a.grp AND j.node = a.node\n)"
        )
        prev = f"bfs_r{k}"
    union = "\n  UNION ALL ".join(
        f"SELECT *, {k} AS depth FROM bfs_r{k}"
        for k in range(0, max_depth + 1)
    )
    chain = ",\n".join(levels)
    return f"""
, bfs_und AS (
  SELECT DISTINCT grp, least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM swept WHERE subj <> obj
), bfs_adj AS (
  SELECT grp, u AS node, v AS nbr FROM bfs_und
  UNION ALL SELECT grp, v AS node, u AS nbr FROM bfs_und
), bfs_deg AS (
  SELECT grp, node, count(*) AS d FROM bfs_adj GROUP BY 1, 2
), bfs_seed AS (
  SELECT grp, node AS seed FROM bfs_deg
  QUALIFY row_number() OVER (PARTITION BY grp ORDER BY d DESC, node) = 1
), bfs_r0 AS (
  SELECT grp, seed, seed AS node FROM bfs_seed
),
{chain}
SELECT grp AS group_id, seed, node,
  CAST(min(depth) AS BIGINT) AS depth
FROM ({union})
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------- link prediction

def link_prediction(edges_ds, degree_cap: int | None = -1):
    """Common-neighbors + Jaccard link prediction over the symmetrized
    distinct edge set: every NON-adjacent pair (u < v) sharing >= 1
    neighbor, scored cn = |N(u) ∩ N(v)| and
    jaccard_milli = cn * 1000 // (d(u) + d(v) - cn) — the classic KG
    completion candidate generator (Liben-Nowell & Kleinberg 2003),
    in pure integer arithmetic so the SQL mirror is exact.

    Distributed shape: candidate pairs come from ONE pivot-bucketed
    wedge expansion — vectorized triu per pivot, with each pivot's
    neighbor list capped to ``degree_cap`` (default ops/wedgecap
    WEDGE_DEGREE_CAP; keep-first on the sorted list, drop count
    logged) so one pivot group emits at most cap*(cap-1)/2 pairs at
    any corpus size. Common-neighbor counts come from one
    pre-aggregated count exchange, adjacency filtering and degree
    fetch from byte-capped lookup folds. Nothing driver-side.
    A capped pivot under-counts that hub's wedges only; the fixtures'
    max degree sits far below the default, so oracle compares exercise
    exact semantics (``degree_cap=None`` disables)."""
    import pandas as pd

    from ..functions.exchange import bounded_group_map
    from ..stages.joins import lookup_column
    from .cooccur import _counted
    from .wedgecap import WEDGE_DEGREE_CAP, cap_sorted_array

    cap = WEDGE_DEGREE_CAP if degree_cap == -1 else degree_cap

    und = _undirected_edges(edges_ds).materialize()

    def with_pk(t: pa.Table) -> pa.Table:
        return t.append_column("pk", _key2(t, "group_id", "node"))

    adj = _adjacency_rows(und).map_batches(
        with_pk, batch_format="pyarrow"
    )

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        nbrs = np.sort(df["nbr"].unique())
        nbrs = cap_sorted_array(
            nbrs, cap, "link_prediction pivot", str(df["pk"].iloc[0])
        )
        if len(nbrs) < 2:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object)
                 for c in ("group_id", "u", "v")}
            )
        i, j = np.triu_indices(len(nbrs), k=1)
        return pd.DataFrame(
            {
                "group_id": df["group_id"].iloc[0],
                "u": nbrs[i],
                "v": nbrs[j],
            }
        )

    pairs = bounded_group_map(adj, "pk", wedges, batch_format="pandas")
    cn = _counted(pairs, ["group_id", "u", "v"], "ck")

    # degree map + adjacency map for the filter
    deg = _counted(adj, ["group_id", "node"], "dk")
    n_deg = deg.count()

    def edge_keys(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column("group_id"), pa.string()),
            pc.cast(t.column("u"), pa.string()),
            pc.cast(t.column("v"), pa.string()),
            _SEP,
        )
        return pa.table(
            {"ek": k, "one": pa.array(np.ones(t.num_rows, np.int64))}
        )

    edge_map = und.map_batches(edge_keys, batch_format="pyarrow")
    n_edges = edge_map.count()

    def split_cn(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("ck"), _SEP)
        g = pc.list_element(parts, 0)
        u = pc.list_element(parts, 1)
        v = pc.list_element(parts, 2)
        return pa.table(
            {
                "group_id": g,
                "u": u,
                "v": v,
                "cn": t.column("sum(cnt)"),
                "ek": t.column("ck"),
                "uk": pc.binary_join_element_wise(g, u, _SEP),
                "vk": pc.binary_join_element_wise(g, v, _SEP),
            }
        )

    rows = cn.map_batches(split_cn, batch_format="pyarrow")
    rows = lookup_column(rows, "ek", edge_map, "ek", "one", "is_edge",
                         mapping_rows=n_edges, val_type=pa.int64())
    rows = lookup_column(rows, "uk", deg, "dk", "sum(cnt)", "du",
                         mapping_rows=n_deg, val_type=pa.int64())
    rows = lookup_column(rows, "vk", deg, "dk", "sum(cnt)", "dv",
                         mapping_rows=n_deg, val_type=pa.int64())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["is_edge"].isna()]
        union = df["du"] + df["dv"] - df["cn"]
        out = pd.DataFrame(
            {
                "group_id": df["group_id"],
                "u": df["u"],
                "v": df["v"],
                "cn": df["cn"].astype(np.int64),
                "jaccard_milli": (
                    df["cn"] * 1000 // union
                ).astype(np.int64),
            }
        )
        return out

    return rows.map_batches(finish, batch_format="pandas")


LINK_PREDICTION_SQL_BODY = """
, lp2_und AS (
  SELECT DISTINCT grp, least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM swept WHERE subj <> obj
), lp2_adj AS (
  SELECT grp, u AS node, v AS nbr FROM lp2_und
  UNION ALL SELECT grp, v AS node, u AS nbr FROM lp2_und
), lp2_deg AS (
  SELECT grp, node, count(*) AS d FROM lp2_adj GROUP BY 1, 2
), lp2_cn AS (
  SELECT a.grp, a.nbr AS u, b.nbr AS v, count(*) AS cn
  FROM lp2_adj a JOIN lp2_adj b
    ON b.grp = a.grp AND b.node = a.node AND b.nbr > a.nbr
  GROUP BY 1, 2, 3
)
SELECT c.grp AS group_id, c.u, c.v, CAST(c.cn AS BIGINT) AS cn,
  CAST(c.cn * 1000 // (du.d + dv.d - c.cn) AS BIGINT) AS jaccard_milli
FROM lp2_cn c
JOIN lp2_deg du ON du.grp = c.grp AND du.node = c.u
JOIN lp2_deg dv ON dv.grp = c.grp AND dv.node = c.v
WHERE NOT EXISTS (
  SELECT 1 FROM lp2_und e
  WHERE e.grp = c.grp AND e.u = c.u AND e.v = c.v
)
"""


# ------------------------------------------------------- transitivity

def transitivity(edges_ds):
    """Global clustering coefficient per group in EXACT integer
    arithmetic: transitivity_milli = 3 * triangles * 1000 // wedges,
    wedges = sum_v d(v)*(d(v)-1)/2 over the symmetrized distinct edge
    set — the one-number cohesion audit beside kg_triangles /
    kg_degree_hist. Degrees are one pre-aggregated count exchange,
    the wedge sum one tiny per-group fold, triangles reuse
    triangle_count (sharing the SAME materialized undirected edge set,
    not a second dedup exchange); the final arithmetic joins ride
    lookup_column. Zero-wedge groups (all degrees <= 1) are EXCLUDED —
    transitivity is undefined there — matching the mirror's
    n_wedges > 0 filter."""
    import pandas as pd

    from ..stages.joins import lookup_column
    from .cooccur import _counted

    und = _undirected_edges(edges_ds).materialize()

    deg = _counted(
        _adjacency_rows(und), ["group_id", "node"], "dk"
    )

    def wedge_rows(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("dk"), _SEP)
        d = t.column("sum(cnt)")
        w = pc.divide(
            pc.multiply(d, pc.subtract(d, pa.scalar(1, pa.int64()))),
            pa.scalar(2, pa.int64()),
        )
        return pa.table(
            {"group_id": pc.list_element(parts, 0), "w": w}
        )

    from .modularity import _sum_by_key

    def gk(t: pa.Table) -> pa.Table:
        return pa.table({"gk": t.column("group_id"), "w": t.column("w")})

    wedges = _sum_by_key(
        deg.map_batches(wedge_rows, batch_format="pyarrow").map_batches(
            gk, batch_format="pyarrow"
        ),
        "gk",
        "w",
    )
    tri = triangle_count(edges_ds, und=und)
    n_tri = tri.count()

    # base on wedges (every group with >= 1 wedge appears, triangles
    # default 0 on miss — groups can be triangle-free); zero-wedge
    # groups are dropped (0 // 0 is undefined; the mirror filters too)
    def as_rows(t: pa.Table) -> pa.Table:
        out = t.filter(
            pc.greater(t.column("sum(w)"), pa.scalar(0, pa.int64()))
        )
        return pa.table(
            {
                "group_id": out.column("gk"),
                "n_wedges": out.column("sum(w)"),
            }
        )

    rows = wedges.map_batches(as_rows, batch_format="pyarrow")
    rows = lookup_column(rows, "group_id", tri, "group_id",
                         "n_triangles", "n_triangles",
                         mapping_rows=n_tri, val_type=pa.int64())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        t3 = df["n_triangles"].fillna(0).astype(np.int64)
        df["n_triangles"] = t3
        df["transitivity_milli"] = (
            3 * t3 * 1000 // df["n_wedges"]
        ).astype(np.int64)
        return df[
            ["group_id", "n_triangles", "n_wedges", "transitivity_milli"]
        ]

    return rows.map_batches(finish, batch_format="pandas")


TRANSITIVITY_SQL_BODY = """
, tr_und AS (
  SELECT DISTINCT grp, least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM swept WHERE subj <> obj
), tr_deg AS (
  SELECT grp, node, count(*) AS d FROM (
    SELECT grp, u AS node FROM tr_und
    UNION ALL SELECT grp, v FROM tr_und
  ) GROUP BY 1, 2
), tr_w AS (
  SELECT grp, CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
  FROM tr_deg GROUP BY 1
), tr_tri AS (
  SELECT a.grp, count(*) AS n_triangles
  FROM tr_und a
  JOIN tr_und b ON b.grp = a.grp AND b.u = a.v
  JOIN tr_und c ON c.grp = a.grp AND c.u = a.u AND c.v = b.v
  GROUP BY a.grp
)
SELECT w.grp AS group_id,
  CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
  w.n_wedges,
  CAST(3 * COALESCE(t.n_triangles, 0) * 1000 // w.n_wedges AS BIGINT)
    AS transitivity_milli
FROM tr_w w LEFT JOIN tr_tri t ON t.grp = w.grp
WHERE w.n_wedges > 0
"""


# ------------------------------------------- personalized PageRank

def personalized_pagerank(nodes_ds, edges_ds):
    """Personalized PageRank from the per-group hub seed (same seed
    rule as bfs_reach: max symmetrized distinct-neighbor degree, ties
    by name) — the graph-proximity feature retrieval pipelines weight
    candidates with (teleport always returns to the seed, so rank
    decays with distance from it). Determinism contract: STRONGER than
    pagerank's rounding grid — the whole iteration runs in INTEGER e9
    units (r0 = 1e9 * e(v); contribution = r // outdeg; update =
    0.15e9 * e(v) + (85 * s) // 100, all floor division), so the two
    engines agree bit-for-bit by construction instead of relying on a
    float grid to absorb summation-order drift (a grid-boundary case
    showed up in testing). Quantization error vs real PPR is
    <= PR_ITERS ulps of 1e-9 — invisible at the output resolution.
    Fixed PR_ITERS, dangling mass dropped, per-group independence, as
    in pagerank.

    Broadcast-tier implementation (the rank vector AND the degree
    table are O(nodes) driver/object-store state, the same budget the
    uniform-PageRank broadcast tier already spends); each iteration is
    ONE streaming pass over the edge table + one tiny groupby. The
    dataset-tier upgrade mirrors _pagerank_dataset with e carried as a
    rank-table column.
    """
    import ray

    from ..stages.joins import get_broadcast, lookup_column
    from .cooccur import _counted

    nodes = _distinct_nodes(nodes_ds).materialize()
    ed = _distinct_edges(edges_ds)
    deg = ed.groupby("sk").count()
    ed = lookup_column(
        ed, "sk", deg, "sk", "count()", "deg", val_type=pa.int64()
    ).materialize()

    # per-group seed via the bfs_reach rule (O(nodes) driver table —
    # within the broadcast tier's stated budget)
    und = _undirected_edges(edges_ds)
    dd = _counted(
        _adjacency_rows(und), ["group_id", "node"], "dk"
    ).to_pandas()
    parts = dd["dk"].str.split(_SEP)
    dd["grp"] = parts.str[0]
    dd["node"] = parts.str[1]
    top = (
        dd.sort_values(
            ["grp", "sum(cnt)", "node"], ascending=[True, False, True]
        )
        .groupby("grp", as_index=False)
        .first()
    )
    seed_nk = set(top["grp"] + _SEP + top["node"])
    # groups whose canonical edges are all self-loops have no
    # symmetrized edge, hence no seed — the SQL mirror's INNER JOIN on
    # ppr_seed drops them, so the engine must drop them too (they'd
    # otherwise surface as all-zero ppr_e9 rows and hash-mismatch)
    seeded_groups = np.sort(top["grp"].to_numpy().astype(str))

    nd = nodes.to_pandas()
    order = np.argsort(nd["nk"].to_numpy())
    nk = nd["nk"].to_numpy()[order]
    e = np.isin(nk, list(seed_nk)).astype(np.int64)
    r = e * np.int64(1_000_000_000)

    def partials(t: pa.Table, rref) -> pa.Table:
        keys, rank = get_broadcast(rref)
        sk = t.column("sk").to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(keys, sk), 0, max(len(keys) - 1, 0))
        ok = keys[idx] == sk
        d = t.column("deg").to_numpy(zero_copy_only=False)
        w = np.where(ok, rank[idx] // d, 0).astype(np.int64)
        part = pa.table({"tk": t.column("tk"), "w": pa.array(w)})
        return part.group_by("tk").aggregate([("w", "sum")])

    for _ in range(PR_ITERS):
        rref = ray.put((nk, r))
        rows = (
            ed.map_batches(partials, fn_args=(rref,), batch_format="pyarrow")
            .groupby("tk")
            .sum("w_sum")
            .to_pandas()
        )
        s = np.zeros(len(nk), dtype=np.int64)
        tks = rows["tk"].to_numpy()
        idx = np.clip(np.searchsorted(nk, tks), 0, max(len(nk) - 1, 0))
        ok = nk[idx] == tks
        s[idx[ok]] = rows["sum(w_sum)"].to_numpy()[ok]
        r = e * np.int64(150_000_000) + (np.int64(85) * s) // np.int64(100)

    fref = ray.put((nk, r, seeded_groups))

    def out(t: pa.Table, rref) -> pa.Table:
        keys, rank, seeded = get_broadcast(rref)
        idx = np.searchsorted(
            keys, t.column("nk").to_numpy(zero_copy_only=False)
        )
        grp = t.column("group_id").to_numpy(zero_copy_only=False)
        gi = np.clip(
            np.searchsorted(seeded, grp), 0, max(len(seeded) - 1, 0)
        )
        keep = (
            seeded[gi] == grp
            if len(seeded)
            else np.zeros(len(grp), dtype=bool)
        )
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "name": t.column("name"),
                "ppr_e9": pa.array(rank[idx].astype(np.int64)),
            }
        ).filter(pa.array(keep))

    return nodes.map_batches(out, fn_args=(fref,), batch_format="pyarrow")


def ppr_sql_body() -> str:
    """Unrolled personalized PageRank over the shared KG oracle CTEs
    (seed CTE + the pagerank chain with the seed-indicator teleport)."""
    d = PR_DAMP
    parts = [
        """
, ppr_nodes AS (
  SELECT DISTINCT e.grp, c.cname AS name
  FROM ent_d e JOIN canon c ON c.grp = e.grp AND c.comp = e.comp
), ppr_ed AS (SELECT DISTINCT grp, subj, obj FROM swept),
ppr_od AS (
  SELECT grp, subj, count(*) AS deg FROM ppr_ed GROUP BY grp, subj
), ppr_und AS (
  SELECT DISTINCT grp, least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM swept WHERE subj <> obj
), ppr_dg AS (
  SELECT grp, node, count(*) AS dd FROM (
    SELECT grp, u AS node FROM ppr_und
    UNION ALL SELECT grp, v FROM ppr_und
  ) GROUP BY 1, 2
), ppr_seed AS (
  SELECT grp, node AS seed FROM ppr_dg
  QUALIFY row_number() OVER (
    PARTITION BY grp ORDER BY dd DESC, node
  ) = 1
), ppr_r0 AS (
  SELECT n.grp, n.name,
    CAST(CASE WHEN n.name = sd.seed THEN 1000000000 ELSE 0 END
         AS BIGINT) AS r
  FROM ppr_nodes n JOIN ppr_seed sd ON sd.grp = n.grp
)""",
    ]
    prev = "ppr_r0"
    for i in range(1, PR_ITERS + 1):
        cur = f"ppr_r{i}"
        parts.append(f""", {cur} AS (
  SELECT n.grp, n.name,
    CAST(CASE WHEN n.name = sd.seed THEN 150000000 ELSE 0 END
         + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
  FROM ppr_nodes n JOIN ppr_seed sd ON sd.grp = n.grp
  LEFT JOIN (
    SELECT e.grp, e.obj AS name, sum(r.r // od.deg) AS s
    FROM ppr_ed e
    JOIN {prev} r ON r.grp = e.grp AND r.name = e.subj
    JOIN ppr_od od ON od.grp = e.grp AND od.subj = e.subj
    GROUP BY e.grp, e.obj) s ON s.grp = n.grp AND s.name = n.name)""")
        prev = cur
    parts.append(
        f"\nSELECT grp AS group_id, name,"
        f" CAST(r AS BIGINT) AS ppr_e9 FROM {prev}"
    )
    return "".join(parts)
