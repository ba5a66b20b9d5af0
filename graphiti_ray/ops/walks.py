"""Hash-deterministic random-walk corpus over the canonical KG
(DeepWalk, Perozzi et al. 2014 / node2vec p=q=1): the
graph→embedding-training bridge — each walk is a "sentence" a
skip-gram trainer consumes.

Distributed shape: adjacency build is ONE (group,node)-bucketed
exchange (sorted unique neighbors + rank + degree per node); the walk
itself is WALK_LEN frontier extensions, each TWO byte-capped
``lookup_column`` folds (degree fetch, then neighbor-at-rank fetch)
over the walker table — no driver collect, no per-step shuffle of the
adjacency. At 100 TB the adjacency mapping exceeds the broadcast cap
and lookup_column's parquet-shard tier takes over; the frontier
stays (nodes × walks_per_node) rows throughout.

Determinism contract: the step choice is
``md5_hash64(f"{grp}|{start}|{wi}|{step}|{cur}", salt="walk|") % deg``
(== DuckDB ``md5_number_lower('walk|' || ...)``), neighbors are ranked
by name sort, and the graph is symmetrized with self-loops dropped —
so the SQL mirror (WALK_LEN chained joins against the ranked
adjacency) reproduces every walk bit-for-bit, and reruns/retries are
idempotent (no RNG state anywhere).

Reference parity: the reference has no graph-embedding surface; this
extends SURVEY.md §2's beyond-reference graph-ML family
(kg_negative_samples, kg_two_hop, kg_multihop_qa).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

WALKS_PER_NODE = 2
WALK_LEN = 4  # steps; a walk visits WALK_LEN + 1 nodes
WALK_SALT = "walk|"
_SEP = "\x1f"


def _adjacency(edges_named):
    """(grp, node, gk, nbr, rnk, deg): symmetrized, self-loops dropped,
    neighbors deduped + name-sorted + dense-ranked per node."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.exchange import bounded_group_map

    def sym(t: pa.Table) -> pa.Table:
        g, s, o = (
            t.column("group_id"),
            t.column("subj"),
            t.column("obj"),
        )
        both = pa.concat_tables(
            [
                pa.table({"grp": g, "node": s, "nbr": o}),
                pa.table({"grp": g, "node": o, "nbr": s}),
            ]
        )
        both = both.filter(
            pc.invert(pc.equal(both.column("node"), both.column("nbr")))
        )
        gk = pc.binary_join_element_wise(
            both.column("grp").cast(pa.string()),
            both.column("node").cast(pa.string()),
            _SEP,
        )
        return both.append_column("gk", gk)

    pairs = edges_named.map_batches(sym, batch_format="pyarrow")

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        nbrs = np.sort(df["nbr"].unique())
        return pd.DataFrame(
            {
                "grp": df["grp"].iloc[0],
                "node": df["node"].iloc[0],
                "gk": df["gk"].iloc[0],
                "nbr": nbrs,
                "rnk": np.arange(len(nbrs), dtype=np.int64),
                "deg": np.int64(len(nbrs)),
            }
        )

    return bounded_group_map(pairs, "gk", rank_group, batch_format="pandas")


def random_walks(
    edges_named,
    *,
    walks_per_node: int = WALKS_PER_NODE,
    walk_len: int = WALK_LEN,
):
    """One row per (start node, walk index): the visited node columns
    n1..n{walk_len} plus the space-joined walk_text sentence."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.joins import lookup_column

    adj = _adjacency(edges_named).materialize()  # reused 2×walk_len times
    n_adj = adj.count()

    def with_gkr(t: pa.Table) -> pa.Table:
        gkr = pc.binary_join_element_wise(
            t.column("gk"), pc.cast(t.column("rnk"), pa.string()), _SEP
        )
        return t.append_column("gkr", gkr)

    adj_by_rank = adj.map_batches(with_gkr, batch_format="pyarrow")
    degrees = adj.map_batches(
        lambda t: t.filter(pc.equal(t.column("rnk"), 0)),
        batch_format="pyarrow",
    )
    n_nodes = degrees.count()

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df.index.repeat(walks_per_node)].reset_index(drop=True)
        df["wi"] = np.tile(
            np.arange(walks_per_node, dtype=np.int64),
            len(df) // walks_per_node,
        )
        out = df.rename(columns={"node": "start"})
        out["cur"] = out["start"]
        return out[["grp", "start", "wi", "cur"]]

    frontier = degrees.map_batches(expand, batch_format="pandas")

    for k in range(1, walk_len + 1):

        def key_cur(df: pd.DataFrame) -> pd.DataFrame:
            df["ck"] = df["grp"] + _SEP + df["cur"]
            return df

        frontier = frontier.map_batches(key_cur, batch_format="pandas")
        frontier = lookup_column(
            frontier, "ck", degrees, "gk", "deg", "deg_k",
            mapping_rows=n_nodes,
        )

        def pick(df: pd.DataFrame, k=k) -> pd.DataFrame:
            import pyarrow as pa

            from ..functions.hashing import md5_hash64_vec

            keys = (
                df["grp"] + "|" + df["start"] + "|"
                + df["wi"].astype(str) + "|" + str(k) + "|" + df["cur"]
            )
            h = md5_hash64_vec(
                pa.array(keys.to_numpy(), pa.string()), salt=WALK_SALT
            )
            idx = h % df["deg_k"].to_numpy().astype(np.uint64)
            df["gkr"] = (
                df["ck"] + _SEP
                + pd.Series(idx.astype(np.int64), index=df.index).astype(str)
            )
            return df.drop(columns=["ck", "deg_k"])

        frontier = frontier.map_batches(pick, batch_format="pandas")
        frontier = lookup_column(
            frontier, "gkr", adj_by_rank, "gkr", "nbr", f"n{k}",
            mapping_rows=n_adj,
        )

        def advance(df: pd.DataFrame, k=k) -> pd.DataFrame:
            df["cur"] = df[f"n{k}"]
            return df.drop(columns=["gkr"])

        frontier = frontier.map_batches(advance, batch_format="pandas")

    ncols = [f"n{k}" for k in range(1, walk_len + 1)]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"grp": "group_id", "wi": "walk_i"})
        out["walk_text"] = out["start"].str.cat(
            [out[c] for c in ncols], sep=" "
        )
        return out[["group_id", "start", "walk_i", *ncols, "walk_text"]]

    return frontier.map_batches(finish, batch_format="pandas")


def _step_sql(k: int, prev: str) -> str:
    h = (
        f"md5_number_lower('{WALK_SALT}' || w.grp || '|' || w.start || "
        f"'|' || CAST(w.wi AS VARCHAR) || '|{k}|' || w.cur)"
    )
    ns = ", ".join(f"w.n{i}" for i in range(1, k))
    ns = ns + ", " if ns else ""
    return f"""s{k} AS (
  SELECT w.grp, w.start, w.wi, {ns}a.nbr AS n{k}, a.nbr AS cur
  FROM {prev} w JOIN adjr a ON a.grp = w.grp AND a.node = w.cur
    AND a.rnk = CAST({h} % CAST(a.deg AS UBIGINT) AS BIGINT)
)"""


def random_walks_sql_body(
    walks_per_node: int = WALKS_PER_NODE, walk_len: int = WALK_LEN
) -> str:
    wis = " UNION ALL ".join(
        f"SELECT {i} AS wi" for i in range(walks_per_node)
    )
    steps = ",\n".join(
        _step_sql(k, f"s{k - 1}" if k > 1 else "w0")
        for k in range(1, walk_len + 1)
    )
    ncols = ", ".join(f"n{k}" for k in range(1, walk_len + 1))
    text = " || ' ' || ".join(
        ["start"] + [f"n{k}" for k in range(1, walk_len + 1)]
    )
    return f"""
, adj AS (
  SELECT DISTINCT grp, subj AS node, obj AS nbr FROM swept
  WHERE subj <> obj
  UNION
  SELECT DISTINCT grp, obj AS node, subj AS nbr FROM swept
  WHERE subj <> obj
), adjr AS (
  SELECT grp, node, nbr,
    CAST(row_number() OVER (PARTITION BY grp, node ORDER BY nbr) - 1
         AS BIGINT) AS rnk,
    CAST(count(*) OVER (PARTITION BY grp, node) AS BIGINT) AS deg
  FROM adj
), w0 AS (
  SELECT s.grp, s.node AS start, wi.wi, s.node AS cur
  FROM (SELECT DISTINCT grp, node FROM adjr) s
  CROSS JOIN ({wis}) wi
),
{steps}
SELECT grp AS group_id, start, CAST(wi AS BIGINT) AS walk_i, {ncols},
  {text} AS walk_text
FROM s{walk_len}
"""


# ------------------------------------------------- skip-gram pairs

SKIPGRAM_WINDOW = 2


def _positions(walk_len: int = WALK_LEN) -> list[tuple[int, int]]:
    """(center_pos, context_pos) pairs with 0 < |i-j| <= window over
    the walk's walk_len+1 node positions."""
    n = walk_len + 1
    return [
        (i, j)
        for i in range(n)
        for j in range(n)
        if i != j and abs(i - j) <= SKIPGRAM_WINDOW
    ]


def skipgram_pairs(walks_ds, walk_len: int = WALK_LEN):
    """(group_id, center, context, n_pairs): the skip-gram training
    pairs of the walk corpus (window=2, both directions, multiplicity
    summed across walks) — what a word2vec-style embedding trainer
    consumes after DeepWalk. One vectorized position-pair expansion
    (14 column pairs per walk at L=4, no row loop) + one
    pre-aggregated count exchange (ops/cooccur._counted)."""
    import pyarrow.compute as pc

    from .cooccur import _counted

    names = ["start"] + [f"n{k}" for k in range(1, walk_len + 1)]
    pos = _positions(walk_len)

    def expand(t: pa.Table) -> pa.Table:
        g = t.column("group_id").combine_chunks()
        cols = {c: t.column(c).combine_chunks() for c in names}
        return pa.table(
            {
                "group_id": pa.chunked_array([g] * len(pos)),
                "center": pa.chunked_array(
                    [cols[names[i]] for i, _ in pos]
                ),
                "context": pa.chunked_array(
                    [cols[names[j]] for _, j in pos]
                ),
            }
        )

    pairs = walks_ds.map_batches(expand, batch_format="pyarrow")
    counted = _counted(pairs, ["group_id", "center", "context"], "sgk")

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("sgk"), "\x1f")
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "center": pc.list_element(parts, 1),
                "context": pc.list_element(parts, 2),
                "n_pairs": t.column("sum(cnt)"),
            }
        )

    return counted.map_batches(split, batch_format="pyarrow")


def skipgram_sql_body(
    walks_per_node: int = WALKS_PER_NODE, walk_len: int = WALK_LEN
) -> str:
    """Composes on random_walks_sql_body's CTE chain: the walk table
    s{L} carries start,n1..nL; the pair expansion is a UNION ALL over
    the fixed position-pair list, then one GROUP BY count."""
    names = ["start"] + [f"n{k}" for k in range(1, walk_len + 1)]
    selects = "\n  UNION ALL ".join(
        f"SELECT grp, {names[i]} AS center, {names[j]} AS context"
        f" FROM sg_walks"
        for i, j in _positions(walk_len)
    )
    walks = random_walks_sql_body(walks_per_node, walk_len)
    # reuse the walk CTE chain, swapping its final SELECT for a CTE
    head, _, _tail = walks.rpartition("SELECT grp AS group_id")
    return f"""{head}, sg_walks AS (
  SELECT grp, start, {", ".join(names[1:])} FROM s{walk_len}
), sg_pairs AS (
  {selects}
)
SELECT grp AS group_id, center, context,
  CAST(count(*) AS BIGINT) AS n_pairs
FROM sg_pairs
GROUP BY 1, 2, 3
"""
