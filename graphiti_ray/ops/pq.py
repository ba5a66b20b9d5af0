"""Product quantization — the vector-compression path billion-scale
ANN runs under its IVF lists (Jégou et al. 2011, "Product Quantization
for Nearest Neighbor Search"): split each D-dim embedding into M
subspaces, train an independent codebook per subspace, and store each
vector as M small codes (here 4 × 16-dim subspaces, 8 codewords each
→ 4 bytes per vector instead of 256).

Codebook training reuses the spherical unrolled-Lloyd contract of
ops/clustering (cosine assignment, mean update, CENT_ROUND centroid
quantization, smallest-vec_id init, fixed iterations) applied per
subspace — "spherical PQ", a deterministic documented variant whose
every step the DuckDB oracle reproduces bit-for-bit (the same
cross-engine float contract kmeans_assignments already proves out).

Scale shape: training streams the corpus once per Lloyd iteration PER
SUBSPACE, but each pass moves only (K x sub_dim) partial sums per
block (ops/clustering._lloyd_centroids — K rows to the driver, the
only driver state). Encoding is one embarrassingly parallel pass with
all M codebooks broadcast once (ray.put; M*K*sub_dim doubles — KBs).
Output is the LONG code table (vec_id, m, code): M small ints per
vector, the PQ memory story.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

from .clustering import CENT_ROUND, KMEANS_ITERS, _assign_labels, _lloyd_centroids
from .dedup import list_col_to_matrix
from .io import read_embeddings

PQ_M = 4  # subspaces
PQ_SUB = 16  # dims per subspace (D = 64)
PQ_K = 8  # codewords per subspace


def _slice_sub(m: int):
    lo = m * PQ_SUB

    def f(batch: pa.Table) -> pa.Table:
        X = list_col_to_matrix(batch.column("embedding"))
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "embedding": pa.array(
                    X[:, lo : lo + PQ_SUB].tolist(),
                    pa.list_(pa.float64()),
                ),
            }
        )

    return f


def _init_sub_centroids(sf_dir: str, m: int):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = t.filter(pc.less(t.column("vec_id"), PQ_K))
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_col_to_matrix(t.column("embedding"))[
        :, m * PQ_SUB : (m + 1) * PQ_SUB
    ]
    order = np.argsort(ids)
    return ids[order], np.asarray(mat[order], np.float64)


def _fit_books(sf_dir: str, base) -> list[tuple[np.ndarray, np.ndarray]]:
    """Train the M per-subspace codebooks (unrolled Lloyd each)."""
    books = []
    for m in range(PQ_M):
        sub = base.map_batches(_slice_sub(m), batch_format="pyarrow")
        cids, cents = _init_sub_centroids(sf_dir, m)
        for _ in range(KMEANS_ITERS):
            cids, cents = _lloyd_centroids(sub, cids, cents)
        books.append((cids, cents))
    return books


@lru_cache(maxsize=4)
def _fit_books_cached(sf_dir: str) -> tuple:
    """Deterministic per-corpus codebooks, trained once per process:
    pq_encode, knn_pq_adc and knn_ivfpq all fit the identical books
    (M x KMEANS_ITERS streaming passes), so the repeats are pure waste.
    Returned as a tuple; callers must not mutate the arrays."""
    base = read_embeddings(sf_dir, ["vec_id", "embedding"])
    return tuple(_fit_books(sf_dir, base))


def pq_encode(sf_dir: str):
    """(vec_id, m, code): per-subspace codeword assignment under the
    trained spherical-PQ codebooks."""
    import ray

    from ..stages.joins import get_broadcast

    base = read_embeddings(sf_dir, ["vec_id", "embedding"])
    bref = ray.put(_fit_books_cached(sf_dir))

    def encode(batch: pa.Table) -> pa.Table:
        bks = get_broadcast(bref)
        X = list_col_to_matrix(batch.column("embedding"))
        vid = batch.column("vec_id").cast(pa.int64())
        n = len(vid)
        out_vid, out_m, out_code = [], [], []
        for m, (c_ids, c_mat) in enumerate(bks):
            lbl = _assign_labels(
                np.asarray(X[:, m * PQ_SUB : (m + 1) * PQ_SUB], np.float64),
                c_mat,
            )
            out_vid.append(vid.to_numpy(zero_copy_only=False))
            out_m.append(np.full(n, m, np.int64))
            out_code.append(c_ids[lbl])
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_vid), pa.int64()),
                "m": pa.array(np.concatenate(out_m), pa.int64()),
                "code": pa.array(np.concatenate(out_code), pa.int64()),
            }
        )

    return base.map_batches(encode, batch_format="pyarrow")


def knn_pq_adc(sf_dir: str):
    """(query_id, neighbor_id, rank): approximate cosine top-10 per
    query (the ops/simsearch query set, vec_id < 8) scored against PQ
    RECONSTRUCTIONS — asymmetric distance computation: the query stays
    full-precision, each candidate is its M concatenated codewords.
    This is the memory-bound ANN path: at scale the scan touches only
    M bytes + a shared codebook per candidate instead of the raw
    vector. One streaming pass (codes assigned and reconstructed
    inline per block), per-block top-k, tiny per-query finalize — the
    knn_bruteforce scan shape with the compressed payload."""
    import ray

    from ..stages.joins import get_broadcast
    from .simsearch import K, _load_queries, _normalize, _row_dot, _topk_reduce

    base = read_embeddings(sf_dir, ["vec_id", "embedding"])
    books = _fit_books_cached(sf_dir)
    qids, qmat = _load_queries(sf_dir)
    ref = ray.put((books, qids, qmat))

    def block_topk(batch: pa.Table) -> pa.Table:
        bks, q_ids, q = get_broadcast(ref)
        X = list_col_to_matrix(batch.column("embedding"))
        vids = np.asarray(
            batch.column("vec_id").to_pylist(), dtype=np.int64
        )
        recon = np.empty((len(vids), PQ_M * PQ_SUB), np.float64)
        for m, (c_ids, c_mat) in enumerate(bks):
            lbl = _assign_labels(
                np.asarray(X[:, m * PQ_SUB : (m + 1) * PQ_SUB], np.float64),
                c_mat,
            )
            recon[:, m * PQ_SUB : (m + 1) * PQ_SUB] = c_mat[lbl]
        rn = _normalize(recon)
        out_q, out_n, out_s = [], [], []
        for i, qid in enumerate(q_ids):
            s = _row_dot(rn, q[i])
            s[vids == qid] = -np.inf
            k = min(K, len(vids))
            top = (
                np.argpartition(-s, k - 1)[:k]
                if len(s) > k
                else np.arange(len(s))
            )
            top = top[np.isfinite(s[top])]
            out_q.extend([qid] * len(top))
            out_n.extend(vids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    cand = base.map_batches(block_topk, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(
        _topk_reduce, batch_format="pyarrow"
    )


def knn_ivfpq(sf_dir: str):
    """(query_id, neighbor_id, rank): the full IVF-PQ composition —
    an IVF coarse quantizer bounds WHICH vectors a query scans
    (corpus/NLIST x NPROBE candidates), PQ reconstruction bounds WHAT
    is read per candidate (M codes + a shared codebook instead of the
    raw vector). This is the billion-scale ANN memory/compute story in
    one operator (Jégou 2011 §IV); recall is pinned vs brute force in
    tests, and the whole lane — quantizer, probe choice, PQ
    reconstruction, final ranks — has an exact DuckDB image
    (KNN_IVFPQ_SQL) because both the coarse quantizer and the subspace
    codebooks run the clustering unrolled-Lloyd contract.

    Scale shape: codebook + quantizer training stream bounded state;
    the corpus shuffles ONCE by list_id; each list task reconstructs
    its own members from broadcast codebooks and scores only the
    queries probing that list."""
    import ray

    from ..stages.joins import get_broadcast
    from .clustering import fit_kmeans_cached
    from .simsearch import (
        K,
        NLIST,
        _load_queries,
        _normalize,
        _probe_sets,
        _row_dot,
        _topk_reduce,
    )

    base = read_embeddings(sf_dir, ["vec_id", "embedding"])
    books = _fit_books_cached(sf_dir)
    qids, qmat = _load_queries(sf_dir)

    c_ids, cent = fit_kmeans_cached(sf_dir, NLIST)
    probes = _probe_sets(qids, qmat, c_ids, cent)
    ref = ray.put(
        (c_ids, cent, books, probes,
         {int(i): qmat[n] for n, i in enumerate(qids)})
    )

    def assign(batch: pa.Table) -> pa.Table:
        cc_ids, c, _, _, _ = get_broadcast(ref)
        m = list_col_to_matrix(batch.column("embedding"))
        lid = cc_ids[_assign_labels(m, c)]
        return batch.append_column("list_id", pa.array(lid, pa.int64()))

    def list_scan(batch: pa.Table) -> pa.Table:
        _, _, bks, pr, qvecs = get_broadcast(ref)
        lid = batch.column("list_id")[0].as_py()
        hit = pr.get(lid, [])
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if not hit:
            return empty
        vids = np.asarray(
            batch.column("vec_id").to_pylist(), dtype=np.int64
        )
        X = list_col_to_matrix(batch.column("embedding"))
        recon = np.empty((len(vids), PQ_M * PQ_SUB), np.float64)
        for m, (c_ids, c_mat) in enumerate(bks):
            lbl = _assign_labels(
                np.asarray(X[:, m * PQ_SUB : (m + 1) * PQ_SUB], np.float64),
                c_mat,
            )
            recon[:, m * PQ_SUB : (m + 1) * PQ_SUB] = c_mat[lbl]
        rn = _normalize(recon)
        out_q, out_n, out_s = [], [], []
        for qid in hit:
            s = _row_dot(rn, qvecs[qid])
            s[vids == qid] = -np.inf
            k = min(K, len(vids))
            top = (
                np.argpartition(-s, k - 1)[:k]
                if len(s) > k
                else np.arange(len(s))
            )
            top = top[np.isfinite(s[top])]
            out_q.extend([qid] * len(top))
            out_n.extend(vids[top].tolist())
            out_s.extend(s[top].tolist())
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    ds = base.map_batches(assign, batch_format="pyarrow")
    cand = ds.groupby("list_id").map_groups(
        list_scan, batch_format="pyarrow"
    )
    return cand.groupby("query_id").map_groups(
        _topk_reduce, batch_format="pyarrow"
    )


def _pq_sub_ctes(m: int) -> tuple[str, str]:
    """Unrolled Lloyd chain for subspace ``m`` (prefix p{m}_), over a
    1-based inclusive list slice of the embeddings table."""
    lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
    p = f"p{m}_"
    parts = [
        f"{p}v AS (SELECT vec_id, CAST(embedding[{lo}:{hi}] AS DOUBLE[])"
        f" AS e FROM embeddings)",
        f"{p}c0 AS (SELECT vec_id AS cid, e AS c FROM {p}v"
        f" WHERE vec_id < {PQ_K})",
    ]
    final = ""
    for i in range(KMEANS_ITERS + 1):
        final = f"{p}asn{i + 1}"
        parts.append(
            f"""{final} AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(v.e, c.c) DESC,
                      c.cid ASC) AS rn
    FROM {p}v v CROSS JOIN {p}c{i} c) WHERE rn = 1)"""
        )
        if i < KMEANS_ITERS:
            parts.append(
                f"""{p}c{i + 1} AS (
  SELECT cid, list(mm ORDER BY pos) AS c FROM (
    SELECT cid, pos, round(avg(vv), {CENT_ROUND}) AS mm FROM (
      SELECT cid, unnest(range(len(e))) AS pos,
             unnest(e) AS vv FROM {final})
    GROUP BY cid, pos) GROUP BY cid)"""
            )
    return ",\n".join(parts), final


def _pq_sql() -> str:
    ctes, finals = [], []
    for m in range(PQ_M):
        body, final = _pq_sub_ctes(m)
        ctes.append(body)
        finals.append(
            f"SELECT vec_id, {m}::BIGINT AS m, cid AS code FROM {final}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM ("
        + " UNION ALL ".join(finals) + ")"
    )


PQ_ENCODE_SQL = _pq_sql()


def _pq_adc_sql() -> str:
    ctes, unions = [], []
    for m in range(PQ_M):
        body, final = _pq_sub_ctes(m)
        ctes.append(body)
        unions.append(
            f"SELECT a.vec_id, {m} AS m, b.c FROM {final} a "
            f"JOIN p{m}_c{KMEANS_ITERS} b ON b.cid = a.cid"
        )
    joined = ",\n".join(ctes)
    return f"""WITH {joined},
adc_recon AS (
  SELECT vec_id, flatten(list(c ORDER BY m)) AS r
  FROM ({" UNION ALL ".join(unions)}) GROUP BY vec_id),
adc_q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 8),
adc_s AS (
  SELECT adc_q.qid, r.vec_id AS vid,
         list_cosine_similarity(adc_q.qe, r.r) AS c
  FROM adc_q CROSS JOIN adc_recon r WHERE r.vec_id != adc_q.qid)
SELECT qid AS query_id, vid AS neighbor_id, rank FROM (
  SELECT qid, vid,
         row_number() OVER (PARTITION BY qid
           ORDER BY c DESC, vid ASC) AS rank
  FROM adc_s
) WHERE rank <= 10"""


KNN_PQ_ADC_SQL = _pq_adc_sql()


def _knn_ivfpq_sql() -> str:
    """Exact DuckDB image of knn_ivfpq: the ivf_-prefixed Lloyd chain
    (ops/clustering._kmeans_ctes) picks each query's NPROBE cells, the
    p{m}_ subspace chains rebuild every candidate's PQ reconstruction,
    and the final rank is cosine(query, reconstruction) with the vid
    tie-break — rank for rank what the engine's list_scan emits."""
    from .clustering import KMEANS_ITERS, _kmeans_ctes
    from .simsearch import K, N_QUERIES, NLIST, NPROBE

    ivf_body, ivf_final = _kmeans_ctes("embeddings", k=NLIST, prefix="ivf_")
    ctes, unions = [ivf_body], []
    for m in range(PQ_M):
        body, final = _pq_sub_ctes(m)
        ctes.append(body)
        unions.append(
            f"SELECT a.vec_id, {m} AS m, b.c FROM {final} a "
            f"JOIN p{m}_c{KMEANS_ITERS} b ON b.cid = a.cid"
        )
    joined = ",\n".join(ctes)
    return f"""WITH {joined},
ivfpq_recon AS (
  SELECT vec_id, flatten(list(c ORDER BY m)) AS r
  FROM ({" UNION ALL ".join(unions)}) GROUP BY vec_id),
ivfpq_q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}),
ivfpq_probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY list_cosine_similarity(q.qe, c.c) DESC,
                      c.cid ASC) AS rn
    FROM ivfpq_q q CROSS JOIN ivf_c{KMEANS_ITERS} c) WHERE rn <= {NPROBE}),
ivfpq_s AS (
  SELECT p.qid, a.vec_id AS vid,
         list_cosine_similarity(q.qe, r.r) AS s
  FROM ivfpq_probe p
  JOIN {ivf_final} a ON a.cid = p.cid
  JOIN ivfpq_recon r ON r.vec_id = a.vec_id
  JOIN ivfpq_q q ON q.qid = p.qid
  WHERE a.vec_id != p.qid)
SELECT qid AS query_id, vid AS neighbor_id, rank FROM (
  SELECT qid, vid,
         row_number() OVER (PARTITION BY qid
           ORDER BY s DESC, vid ASC) AS rank
  FROM ivfpq_s) WHERE rank <= {K}"""


KNN_IVFPQ_SQL = _knn_ivfpq_sql()
