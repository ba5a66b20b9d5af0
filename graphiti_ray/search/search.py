"""Distributed hybrid search over the KG tables.

Batch shape of graphiti_core/search/search.py:61-227 (Q1-Q6):
- each LANE (fulltext-lite, cosine) is a distributed ``map_batches``
  scoring pass over the corpus Dataset followed by
  ``sort(score desc).limit(k)`` — never a driver-side scan;
- lanes are unioned and fused with RRF (rank.rrf) on the tiny top-k
  candidate sets; optional MMR / node-distance / mentions rerank;
- BFS expansion is an iterative broadcast-frontier filter, depth<=3
  (MAX_SEARCH_DEPTH, search_utils.py:52).

Fulltext-lite scoring: per-candidate sum of matched query-term counts
scaled by inverse sqrt doc length (a BM25-ish TF scorer without global
IDF — the per-partition analog of the reference's Lucene index,
search_utils.py:146-197). Cosine lane uses the same deterministic hash
embeddings as canonicalization (functions/embed.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.embed import hash_embed_texts
from ..functions.text import lucene_sanitize, normalize_name
from .rank import rrf

DEFAULT_LIMIT = 10  # search_config.py:29 DEFAULT_SEARCH_LIMIT
MIN_SCORE = 0.6  # search_utils.py:50 DEFAULT_MIN_SCORE
MAX_SEARCH_DEPTH = 3  # search_utils.py:52
MAX_QUERY_LENGTH = 32  # search_utils.py:53 (words kept per query)


# ------------------------------------------------------------- filters

_OPS = {
    ">": pc.greater,
    ">=": pc.greater_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    "==": pc.equal,
    "!=": pc.not_equal,
}


@dataclass
class SearchFilters:
    """AND-of-ORs date filters + label filter
    (graphiti_core/search/search_filters.py:25-171): each entry of a
    date filter list is an OR-group of (op, value) tuples; groups AND."""

    node_labels: list[str] | None = None
    group_ids: list[str] | None = None  # graphiti.py:634 search scope
    valid_at: list[list[tuple[str, datetime]]] = field(default_factory=list)
    invalid_at: list[list[tuple[str, datetime]]] = field(default_factory=list)
    created_at: list[list[tuple[str, datetime]]] = field(default_factory=list)
    expired_at: list[list[tuple[str, datetime]]] = field(default_factory=list)

    def _col_mask(self, t: pa.Table, col: str, groups) -> pa.Array | None:
        if not groups or col not in t.schema.names:
            return None
        mask = None
        for or_group in groups:
            gm = None
            for op, val in or_group:
                m = _OPS[op](t.column(col), pa.scalar(val, pa.timestamp("us")))
                m = pc.fill_null(m, False)
                gm = m if gm is None else pc.or_(gm, m)
            mask = gm if mask is None else pc.and_(mask, gm)
        return mask

    def apply(self, ds):
        """Vectorized predicate pushdown: one map_batches, pyarrow
        kernels only (Q12 -> ds.filter analog)."""
        if not (self.node_labels or self.group_ids or self.valid_at
                or self.invalid_at or self.created_at or self.expired_at):
            return ds

        gset = (
            pa.array(sorted(set(self.group_ids)), pa.string())
            if self.group_ids else None
        )

        def f(t: pa.Table) -> pa.Table:
            mask = None
            if gset is not None and "group_id" in t.schema.names:
                mask = pc.is_in(t.column("group_id"), value_set=gset)
            for col, groups in (
                ("valid_at", self.valid_at),
                ("invalid_at", self.invalid_at),
                ("created_at", self.created_at),
                ("expired_at", self.expired_at),
            ):
                m = self._col_mask(t, col, groups)
                if m is not None:
                    mask = m if mask is None else pc.and_(mask, m)
            if self.node_labels and "labels" in t.schema.names:
                lm = pa.array(
                    [
                        bool(set(ls or []) & set(self.node_labels))
                        for ls in t.column("labels").to_pylist()
                    ]
                )
                mask = lm if mask is None else pc.and_(mask, lm)
            return t if mask is None else t.filter(mask)

        return ds.map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------------- lanes

def _query_terms(query: str) -> list[str]:
    q = lucene_sanitize(query)  # M6 parity: specials are escaped/neutral
    terms = normalize_name(q).split()
    return terms[:MAX_QUERY_LENGTH]


BM25_K1, BM25_B = 1.5, 0.75


def _corpus_stats(ds, text_col: str, terms: list[str]) -> tuple[int, float, dict[str, int]]:
    """One aggregate pass: N docs, avg doc length (words), per-term DF
    for the <=32 query terms. Output is tiny (one row per block) —
    summed on the driver. The global-IDF analog of the Lucene index
    stats (search_utils.py:146-197)."""
    import numpy as np

    def stats(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(t.column(text_col))
        n = t.num_rows
        lens = pc.list_value_length(pc.utf8_split_whitespace(txt))
        total_len = int(np.asarray(lens).sum()) if n else 0
        row = {"n_docs": [n], "total_len": [total_len]}
        for i, term in enumerate(terms):
            c = pc.count_substring(txt, term)
            row[f"df_{i}"] = [int(np.asarray(pc.min_element_wise(c, 1)).sum())]
        return pa.table(row)

    df = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    if "n_docs" not in df.columns:  # empty table / filtered-to-nothing
        return 0, 0.0, {t: 0 for t in terms}
    n_docs = int(df["n_docs"].sum())
    avgdl = float(df["total_len"].sum()) / max(1, n_docs)
    dfs = {t: int(df[f"df_{i}"].sum()) for i, t in enumerate(terms)}
    return n_docs, avgdl, dfs


def _topk_scores(scored, id_col: str, limit: int):
    """Distributed top-k without an all-to-all: each block keeps its
    own best ``limit`` rows (vectorized Arrow sort per block — the
    map-side-truncation half of the domain_cap pattern,
    ops/packing.py:60-95), then the <= limit x num_blocks survivors
    finalize ON THE DRIVER — a deliberate small-result collect
    (limit is 10-20; even 10k blocks is trailing kilobytes). Both a
    ``ds.sort().limit()`` and a single-group ``groupby`` finalize were
    measured at ~1.5-2 s of fixed shuffle overhead PER LANE CALL on a
    2.6k-row corpus; lane latency is interactive-search wall time, so
    the tiny collect is the right trade."""
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("score", "descending"), (id_col, "ascending")]
        )
        return t.take(order[:limit])

    survivors = scored.map_batches(partial, batch_format="pyarrow")
    parts = [
        pa.Table.from_pydict(b)
        if not isinstance(b, pa.Table) else b
        for b in survivors.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    t = (
        pa.concat_tables(parts)
        if parts
        else pa.table({id_col: pa.array([], pa.string()),
                       "score": pa.array([], pa.float64())})
    )
    order = pc.sort_indices(
        t, sort_keys=[("score", "descending"), (id_col, "ascending")]
    )
    return rd.from_arrow(t.take(order[:limit]))


def _fulltext_lane(ds, text_col: str, id_col: str, query: str, limit: int):
    """BM25 lane (k1=1.5, b=0.75) with true global IDF: a cheap stats
    pass, then distributed scoring -> per-block top-k."""
    import math

    import numpy as np

    terms = _query_terms(query)
    if not terms:
        return None
    n_docs, avgdl, dfs = _corpus_stats(ds, text_col, terms)
    if n_docs == 0:
        return None
    idf = {
        t: math.log(1 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in terms
    }

    def score(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(t.column(text_col))
        dl = np.asarray(
            pc.list_value_length(pc.utf8_split_whitespace(txt)), dtype=np.float64
        )
        norm = BM25_K1 * (1 - BM25_B + BM25_B * dl / max(avgdl, 1e-9))
        s = np.zeros(t.num_rows, dtype=np.float64)
        for term in terms:
            tf = np.asarray(pc.count_substring(txt, term), dtype=np.float64)
            s += idf[term] * tf * (BM25_K1 + 1) / (tf + norm)
        out = pa.table(
            {id_col: t.column(id_col), "score": pa.array(s, pa.float64())}
        )
        return out.filter(pc.greater(out.column("score"), 0.0))

    return _topk_scores(
        ds.map_batches(score, batch_format="pyarrow"), id_col, limit
    )


def _cosine_lane(ds, text_col: str, id_col: str, query: str, limit: int,
                 min_score: float = MIN_SCORE):
    """Cosine lane; reads a STORED ``{text_col}_embedding`` column when
    the table carries one (build_kg(embed=True)), else embeds the text
    on the fly with the same deterministic embedder."""
    import numpy as np

    qv = hash_embed_texts([query])[0]
    emb_col = f"{text_col}_embedding"

    def score(t: pa.Table) -> pa.Table:
        if emb_col in t.schema.names:
            col = t.column(emb_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # FixedSizeList values -> zero-copy numpy view
            emb = (
                col.flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(t.num_rows, -1)
                .astype(np.float32, copy=False)
            )
        else:
            emb = hash_embed_texts(t.column(text_col).to_pylist())
        s = emb @ qv
        out = pa.table(
            {id_col: t.column(id_col), "score": pa.array(s, pa.float64())}
        )
        return out.filter(pc.greater_equal(out.column("score"), min_score))

    return _topk_scores(
        ds.map_batches(score, batch_format="pyarrow"), id_col, limit
    )


def _lane_ids(lane, id_col: str) -> list[str]:
    if lane is None:
        return []
    df = lane.to_pandas()
    return df[id_col].tolist() if id_col in df.columns else []


def node_search(
    nodes_ds,
    query: str,
    limit: int = DEFAULT_LIMIT,
    filters: SearchFilters | None = None,
) -> list[str]:
    """Hybrid node search (Q3/J1 analog): fulltext ∪ cosine lanes over
    the distributed nodes table, RRF-fused, top-limit node uuids."""
    ds = filters.apply(nodes_ds) if filters else nodes_ds
    ft = _fulltext_lane(ds, "name", "uuid", query, limit * 2)
    cos = _cosine_lane(ds, "name", "uuid", query, limit * 2)
    fused = rrf([_lane_ids(ft, "uuid"), _lane_ids(cos, "uuid")])
    return fused[:limit]


def edge_search(
    edges_ds,
    query: str,
    limit: int = DEFAULT_LIMIT,
    filters: SearchFilters | None = None,
) -> list[str]:
    """Hybrid edge search (Q2 analog) over fact text."""
    ds = filters.apply(edges_ds) if filters else edges_ds
    ft = _fulltext_lane(ds, "fact", "uuid", query, limit * 2)
    cos = _cosine_lane(ds, "fact", "uuid", query, limit * 2)
    fused = rrf([_lane_ids(ft, "uuid"), _lane_ids(cos, "uuid")])
    return fused[:limit]


def bfs_neighborhood(edges_ds, origin_uuids: list[str], depth: int = MAX_SEARCH_DEPTH):
    """Graph expansion RELATES_TO{1,depth} (Q6, search_utils.py:277-329):
    iterative broadcast-frontier semi-join — the frontier (small) is
    ray.put each hop and every edge block filters against it; no
    all-to-all shuffle."""
    import ray

    seen: set[str] = set(origin_uuids)
    frontier = set(origin_uuids)
    hops: dict[str, int] = {u: 0 for u in origin_uuids}
    for d in range(1, depth + 1):
        ref = ray.put(frontier)

        def touch(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            fr = pa.array(sorted(ray.get(ref)), pa.string())
            mask = pc.or_(
                pc.is_in(t.column("source_node_uuid"), value_set=fr),
                pc.is_in(t.column("target_node_uuid"), value_set=fr),
            )
            return t.filter(mask).select(["source_node_uuid", "target_node_uuid"])

        touched = edges_ds.map_batches(touch, batch_format="pyarrow").to_pandas()
        nxt: set[str] = set()
        for u in set(touched["source_node_uuid"]) | set(touched["target_node_uuid"]):
            if u not in seen:
                nxt.add(u)
        for u in nxt:
            hops[u] = d
            seen.add(u)
        if not nxt:
            break
        frontier = nxt
    return hops
