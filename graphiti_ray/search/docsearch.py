"""Driver-checkable hybrid search over the documents corpus.

The episodes-derived ``search_hybrid_demo`` exercises the same lanes
(Q1 orchestrator, Q4 BM25, Q5 cosine, Q7 RRF — search/search.py,
search/rank.py) but its input is the non-SQL-expressible KG nodes
table, so the driver can only count its rows. This variant runs the
identical lane/fusion semantics over ``documents`` (BM25) and
``embeddings`` (cosine, query = a stored vector) so the WHOLE hybrid
stack has an exact DuckDB image (queries.SEARCH_DOCS_HYBRID_SQL).

Float-safety of the hash-checked equality:

- only ids and ranks cross the oracle boundary (scores stay internal);
- every demo query has exactly TWO BM25 terms, so the per-doc score is
  a sum of two doubles — IEEE addition is commutative, so the SQL
  aggregate (unordered) equals the Python accumulation exactly except
  for sub-ulp ln() differences, which cannot reorder docs unless two
  scores collide to within 1 ulp with *different* (tf, dl) — ties with
  equal (tf, dl) are exactly equal in both engines and break by doc_id;
- the RRF score is a sum of at most two exact dyadic-rational-free
  doubles 1/(rank+1), identical in both engines.

Scale shape (the 100 TB path): ONE stats pass over the corpus for all
query terms (tiny output), ONE scoring pass emitting per-block
top-LANE_K candidates per (lane, query), then a reduce whose input is
O(blocks x queries x k) — corpus-size-independent fusion on the
driver, exactly the knn_bruteforce shape (ops/simsearch.py).

Reference parity: hybrid_search + rrf (graphiti_core/search/search.py,
search_utils.py:744-755); BM25 global IDF analog of the Lucene index
stats (search_utils.py:146-197).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rank import rrf
from .search import BM25_B, BM25_K1, _query_terms

# (query text, query vec_id): text drives the BM25 lane over
# documents.text; the stored embedding of vec_id drives the cosine lane
# over embeddings (self excluded). Two terms per query — see module
# docstring for why that bounds float-sum reordering.
DOC_SEARCH_QUERIES: list[tuple[str, int]] = [
    ("spark join", 3),
    ("hash table", 7),
    ("window sort", 11),
]
LANE_K = 20  # per-lane candidates (reference: limit * 2)
FUSE_K = 10  # fused results per query


def _bm25_lane_candidates(docs, queries: list[tuple[str, int]]):
    """One stats pass + one scoring pass for ALL queries; per-block
    top-LANE_K per query (a block superset of the global top-LANE_K)."""
    from .search import _corpus_stats

    terms_by_q = {q: _query_terms(q) for q, _ in queries}
    all_terms = sorted({t for ts in terms_by_q.values() for t in ts})
    n_docs, avgdl, dfs = _corpus_stats(docs, "text", all_terms)
    idf = {
        t: math.log(1 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
        for t in all_terms
    }

    def block_topk(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(t.column("text"))
        dl = np.asarray(
            pc.list_value_length(pc.utf8_split_whitespace(txt)), dtype=np.float64
        )
        norm = BM25_K1 * (1 - BM25_B + BM25_B * dl / max(avgdl, 1e-9))
        ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
        out_q, out_id, out_s = [], [], []
        for q, _ in queries:
            s = np.zeros(t.num_rows, dtype=np.float64)
            for term in terms_by_q[q]:
                tf = np.asarray(pc.count_substring(txt, term), dtype=np.float64)
                s += idf[term] * tf * (BM25_K1 + 1) / (tf + norm)
            pos = np.flatnonzero(s > 0.0)
            top = pos[np.lexsort((ids[pos], -s[pos]))[:LANE_K]]
            out_q.extend([q] * len(top))
            out_id.extend(ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "q": pa.array(out_q, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    return docs.map_batches(block_topk, batch_format="pyarrow")


def _cosine_lane_candidates(embs, queries: list[tuple[str, int]], sf_dir: str):
    """Stored-vector cosine lane, knn_bruteforce-shaped: broadcast query
    matrix, per-block top-LANE_K per query, self excluded."""
    import pyarrow.parquet as pq
    import ray

    from ..ops.simsearch import _normalize

    qids = [vid for _, vid in queries]
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qt = qt.filter(pc.is_in(qt.column("vec_id"), value_set=pa.array(qids, pa.int64())))
    by_id = {
        int(v): e for v, e in zip(qt.column("vec_id").to_pylist(),
                                  qt.column("embedding").to_pylist())
    }
    qmat = _normalize(np.array([by_id[v] for v in qids], dtype=np.float64))
    qarr = np.asarray(qids, dtype=np.int64)
    qref = ray.put((queries, qarr, qmat))

    def block_topk(batch: pa.Table) -> pa.Table:
        qs, q_ids, q = ray.get(qref)
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        sims = q @ m.T
        out_q, out_id, out_s = [], [], []
        for i, (qtext, qid) in enumerate(qs):
            s = sims[i].copy()
            s[vids == qid] = -np.inf
            top = np.lexsort((vids, -s))[:LANE_K]
            top = top[np.isfinite(s[top])]
            out_q.extend([qtext] * len(top))
            out_id.extend(vids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "q": pa.array(out_q, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    return embs.map_batches(block_topk, batch_format="pyarrow")


def _lane_top(df, queries) -> dict[str, list[int]]:
    """Per-query global top-LANE_K ids from per-block candidates
    (score desc, doc_id asc — the SQL row_number tie-break)."""
    out: dict[str, list[int]] = {}
    for q, _ in queries:
        g = df[df["q"] == q]
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        out[q] = g["doc_id"].head(LANE_K).tolist()
    return out


def docs_hybrid_search(sf_dir: str) -> pa.Table:
    """(query, doc_id, rank): RRF-fused BM25 + stored-vector cosine
    top-FUSE_K per demo query. Exact SQL image in queries.py."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    ft = _lane_top(
        _bm25_lane_candidates(docs, DOC_SEARCH_QUERIES).to_pandas(),
        DOC_SEARCH_QUERIES,
    )
    cos = _lane_top(
        _cosine_lane_candidates(embs, DOC_SEARCH_QUERIES, sf_dir).to_pandas(),
        DOC_SEARCH_QUERIES,
    )

    rows_q, rows_id, rows_rank = [], [], []
    for q, _ in DOC_SEARCH_QUERIES:
        fused = rrf([ft[q], cos[q]])[:FUSE_K]
        for rank, did in enumerate(fused, 1):
            rows_q.append(q)
            rows_id.append(did)
            rows_rank.append(rank)
    return pa.table(
        {
            "query": pa.array(rows_q, pa.string()),
            "doc_id": pa.array(rows_id, pa.int64()),
            "rank": pa.array(rows_rank, pa.int64()),
        }
    )
