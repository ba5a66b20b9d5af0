"""Approximate-nearest-neighbor search over the embedding column.

- ``knn_bruteforce``: exact cosine top-k — the query matrix is ray.put
  ONCE (broadcast, never re-shipped per batch); every task matmuls its
  Arrow block against it and emits per-block top-k candidates; a tiny
  groupby(query_id) reduce keeps the global top-k. Work per task is
  O(block x queries x dim) numpy; the reduce input is
  O(blocks x queries x k), independent of corpus size — this is the
  100 TB-safe shape for small query sets.
- ``knn_lsh``: the bucketed scale path — signed-projection LSH
  (Charikar hyperplanes) assigns each vector to a bucket; queries probe
  only their own bucket (+ multiprobe neighbors), trading recall for a
  corpus-size-independent candidate set. The hyperplanes are ±1 sign
  vectors derived from md5 (Achlioptas-style random signs), and the
  projections are computed in EXACT int64 arithmetic over
  floor(value × 1e6) — so bucket membership is bit-identical between
  numpy and the DuckDB mirror and the whole lane is oracle-checked
  end-to-end (KNN_LSH_SQL), not merely recall-pinned.
- ``knn_ivf``: the partitioned scale path — the coarse quantizer is
  the SAME deterministic unrolled-Lloyd contract as
  ops/clustering.kmeans_assignments (smallest-vec_id init, fixed
  iterations, CENT_ROUND centroid grid, cosine argmax with cid
  tie-break), so cell assignment, probe choice AND the final ranks all
  have an exact SQL image (KNN_IVF_SQL). Recall vs brute force stays
  pinned in pytest on top of the hash oracle.

Graphiti analog: Q5 cosine-similarity searches
(graphiti_core/search/search_utils.py:200-274,384-444) done as one
query per Cypher call; here a batched matmul per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from .io import read_embeddings

K = 10
N_QUERIES = 8  # queries = vec_id < 8
# LSH buckets = 2^N_PLANES. Sized so a bucket holds ~corpus/2^planes
# vectors; at bench scale 6 planes -> 64 buckets; at 100 TB this scales
# to 16-20 planes (per-bucket work stays constant as corpus grows).
N_PLANES = 6
MULTIPROBE = 1  # probe buckets within hamming 1 of the query bucket



def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _row_dot(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Per-row dot of matrix ``m`` against one query vector with a
    SHAPE-INDEPENDENT float path (elementwise multiply + fixed-length
    row reduction). BLAS matmul picks different instruction orders for
    different matrix shapes, so the same vector scored inside two
    different lists/buckets/blocks can get two last-ulp-different
    scores — which breaks EXACT ties (e.g. identical PQ
    reconstructions) that the vid tie-break and the SQL oracle both
    resolve deterministically. Every ANN scanner scores through this
    kernel so a vector's score is a pure function of its bytes."""
    return (m * q).sum(axis=1)


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t.column("vec_id"), N_QUERIES))
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    q = _normalize(np.array(t.column("embedding").to_pylist(), dtype=np.float64))
    order = np.argsort(ids)
    return ids[order], q[order]


def _topk_reduce(group: pa.Table) -> pa.Table:
    """Global top-k for one query from per-block candidates; rank by
    score desc, neighbor id asc (the SQL row_number tie-break)."""
    ids = np.asarray(group.column("neighbor_id").to_pylist(), dtype=np.int64)
    scores = np.asarray(group.column("score").to_pylist(), dtype=np.float64)
    order = np.lexsort((ids, -scores))[:K]
    qid = group.column("query_id")[0].as_py()
    return pa.table(
        {
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "neighbor_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        }
    )


def knn_bruteforce(sf_dir: str):
    """(query_id, neighbor_id, rank): exact cosine top-10 per query."""
    import ray
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir)
    qref = ray.put((qids, qmat))

    def block_topk(batch: pa.Table) -> pa.Table:
        q_ids, q = ray.get(qref)
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        out_q, out_n, out_s = [], [], []
        for i, qid in enumerate(q_ids):
            s = _row_dot(m, q[i])
            s[vids == qid] = -np.inf  # exclude self
            k = min(K, len(vids))
            top = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
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

    cand = read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(block_topk, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(_topk_reduce, batch_format="pyarrow")


LSH_SALT = "lshp|"
LSH_SCALE = 1_000_000  # projection quantization grid (exact int64 image)


def _lsh_signs(dim: int) -> np.ndarray:
    """±1 hyperplane matrix (N_PLANES, dim) from md5 parity — the same
    bit DuckDB computes as md5_number_lower('lshp|' || p || ':' || d) % 2,
    so both engines hold the identical plane family. Driver-side once
    (N_PLANES × dim keys), broadcast with the probe table."""
    from ..functions.hashing import md5_hash64

    s = np.empty((N_PLANES, dim), np.int64)
    for p in range(N_PLANES):
        for d in range(dim):
            s[p, d] = 1 if md5_hash64(f"{p}:{d}", salt=LSH_SALT) % 2 == 0 else -1
    return s


def _bucket_of(m: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """Bucket id from exact integer projections: floor(value × 1e6) as
    int64, signed sum per plane, bit = (sum > 0). Sign of a projection
    is scale-invariant, so the RAW (unnormalized) vectors are used —
    that is what the SQL mirror reads too. |sum| ≤ dim × max|v| × 1e6
    ≪ 2^63 for unit-scale embeddings."""
    q = np.floor(m * LSH_SCALE).astype(np.int64)
    bits = (q @ signs.T) > 0
    return (bits @ (1 << np.arange(N_PLANES))).astype(np.int64)


NLIST = 16  # IVF coarse-quantizer cells (scale: ~sqrt(corpus))
NPROBE = 6  # cells scanned per query


def _probe_sets(qids: np.ndarray, qmat: np.ndarray, cids: np.ndarray,
                cents: np.ndarray, nprobe: int = NPROBE) -> dict[int, list[int]]:
    """cid -> [query_id] for the nprobe nearest centroids per query,
    ranked by cosine desc with cid-asc tie-break (centroid rows arrive
    sorted by cid; stable argsort preserves that order on ties — the
    SQL ``ORDER BY cos DESC, cid ASC`` row_number)."""
    sims = _normalize(np.asarray(qmat, np.float64)) @ _normalize(
        np.asarray(cents, np.float64)
    ).T
    order = np.argsort(-sims, axis=1, kind="stable")[:, : min(nprobe, len(cids))]
    probes: dict[int, list[int]] = {}
    for qi, qid in enumerate(qids):
        for col in order[qi]:
            probes.setdefault(int(cids[col]), []).append(int(qid))
    return probes


def knn_ivf(sf_dir: str):
    """IVF ANN: the deterministic spherical-k-means coarse quantizer
    (ops/clustering's unrolled-Lloyd contract, k=NLIST) partitions
    vectors into inverted lists; each query scans only its NPROBE
    nearest lists. Same output schema as knn_bruteforce; exact SQL
    image in KNN_IVF_SQL.

    Scale shape: training is KMEANS_ITERS streaming passes with ≤ NLIST
    rows of driver state each (ops/clustering._lloyd_centroids);
    assignment is one matmul per block against the broadcast centroids,
    the inverted-list shuffle is a groupby(list_id), and per-query work
    is corpus/NLIST × NPROBE."""
    import ray
    import ray.data as rd

    from .clustering import _assign_labels, fit_kmeans_cached

    qids, qmat = _load_queries(sf_dir)

    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    cids, cents = fit_kmeans_cached(sf_dir, NLIST)
    cent_ref = ray.put((cids, cents))

    def assign(batch: pa.Table) -> pa.Table:
        c_ids, c_mat = ray.get(cent_ref)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        lid = c_ids[_assign_labels(m, c_mat)]
        return batch.append_column("list_id", pa.array(lid, pa.int64()))

    probes = _probe_sets(qids, qmat, cids, cents)
    qref = ray.put((probes, {int(i): qmat[n] for n, i in enumerate(qids)}))

    def list_scan(batch: pa.Table) -> pa.Table:
        pr, qvecs = ray.get(qref)
        lid = batch.column("list_id")[0].as_py()
        hit = pr.get(lid, [])
        if not hit:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        out_q, out_n, out_s = [], [], []
        for qid in hit:
            s = _row_dot(m, qvecs[qid])
            s[vids == qid] = -np.inf
            k = min(K, len(vids))
            top = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
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

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    cand = assigned.groupby("list_id").map_groups(list_scan, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(_topk_reduce, batch_format="pyarrow")


def _load_queries_raw(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Query ids + RAW (unnormalized) float64 vectors — LSH bucketing
    quantizes the raw table values, exactly as the SQL mirror does."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t.column("vec_id"), N_QUERIES))
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    q = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], q[order]


def knn_lsh(sf_dir: str):
    """LSH-bucketed ANN: same output schema as knn_bruteforce, but each
    query only scores vectors in its bucket (+hamming-1 multiprobe).
    The shuffle is a groupby(bucket) — candidate work per bucket is
    corpus_size / 2^planes on average. Bucket membership is exact
    integer arithmetic (see _bucket_of), so KNN_LSH_SQL reproduces the
    full output, rank for rank."""
    import ray
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir)
    _, qraw = _load_queries_raw(sf_dir)

    def probe_buckets(bucket: int) -> list[int]:
        out = [bucket]
        if MULTIPROBE >= 1:
            out += [bucket ^ (1 << p) for p in range(N_PLANES)]
        return out

    signs = _lsh_signs(qraw.shape[1])
    sref = ray.put(signs)

    def assign(batch: pa.Table) -> pa.Table:
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        return batch.append_column(
            "bucket", pa.array(_bucket_of(m, ray.get(sref)), pa.int64())
        )

    q_buckets = _bucket_of(qraw, signs)
    # query probe table: (bucket, query_id) — broadcast via ray.put
    probe: dict[int, list[int]] = {}
    for qid, b in zip(qids, q_buckets):
        for pb in probe_buckets(int(b)):
            probe.setdefault(pb, []).append(int(qid))
    qref = ray.put((probe, {int(i): qmat[n] for n, i in enumerate(qids)}))

    def bucket_score(batch: pa.Table) -> pa.Table:
        probes, qvecs = ray.get(qref)
        b = batch.column("bucket")[0].as_py()
        hit_queries = probes.get(b, [])
        if not hit_queries:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        out_q, out_n, out_s = [], [], []
        for qid in hit_queries:
            s = _row_dot(m, qvecs[qid])
            s[vids == qid] = -np.inf
            k = min(K, len(vids))
            top = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
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

    ds = read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(assign, batch_format="pyarrow")
    cand = ds.groupby("bucket").map_groups(bucket_score, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(_topk_reduce, batch_format="pyarrow")


# ------------------------------------------------------- SQL mirrors

def _knn_ivf_sql(nprobe: int = NPROBE) -> str:
    """Exact DuckDB image of knn_ivf (and of the persisted-index lane
    knn_ivf_indexed, which runs the same quantizer + probe contract
    over hive-partitioned lists): the ivf_-prefixed CTEs unroll the
    identical Lloyd chain the engine streams."""
    from .clustering import KMEANS_ITERS, _kmeans_ctes

    body, final = _kmeans_ctes("embeddings", k=NLIST, prefix="ivf_")
    return f"""WITH {body},
ivf_q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}),
ivf_probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY list_cosine_similarity(q.qe, c.c) DESC,
                      c.cid ASC) AS rn
    FROM ivf_q q CROSS JOIN ivf_c{KMEANS_ITERS} c) WHERE rn <= {nprobe}),
ivf_s AS (
  SELECT p.qid, a.vec_id AS vid,
         list_cosine_similarity(q.qe, CAST(a.embedding AS DOUBLE[])) AS s
  FROM ivf_probe p
  JOIN {final} a ON a.cid = p.cid
  JOIN ivf_q q ON q.qid = p.qid
  WHERE a.vec_id != p.qid)
SELECT qid AS query_id, vid AS neighbor_id, rank FROM (
  SELECT qid, vid,
         row_number() OVER (PARTITION BY qid
           ORDER BY s DESC, vid ASC) AS rank
  FROM ivf_s) WHERE rank <= {K}"""


def _knn_lsh_sql() -> str:
    """Exact DuckDB image of knn_lsh: the md5-parity sign planes, the
    floor(v × 1e6) int64 projections, the hamming-1 probe fan-out
    (f = -1 is the unflipped home bucket) and the cosine re-rank."""
    return f"""WITH lsh_sg AS (
  SELECT p, d,
         CASE WHEN md5_number_lower('{LSH_SALT}' || p || ':' || d) % 2 = 0
              THEN 1 ELSE -1 END AS sg
  FROM range({N_PLANES}) t(p) CROSS JOIN range(64) u(d)),
lsh_e AS (
  SELECT vec_id,
         unnest(range(len(embedding))) AS d,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * {LSH_SCALE})
              AS BIGINT) AS qv
  FROM embeddings),
lsh_bits AS (
  SELECT e.vec_id, s.p,
         CASE WHEN sum(e.qv * s.sg) > 0 THEN 1 ELSE 0 END AS b
  FROM lsh_e e JOIN lsh_sg s ON s.d = e.d
  GROUP BY e.vec_id, s.p),
lsh_bucket AS (
  SELECT vec_id, CAST(sum(b * (1 << p)) AS BIGINT) AS bucket
  FROM lsh_bits GROUP BY vec_id),
lsh_probe AS (
  SELECT qb.vec_id AS qid, fl.f,
         CAST(sum((CASE WHEN qb.p = fl.f THEN 1 - qb.b ELSE qb.b END)
                  * (1 << qb.p)) AS BIGINT) AS bucket
  FROM lsh_bits qb CROSS JOIN range(-1, {N_PLANES}) fl(f)
  WHERE qb.vec_id < {N_QUERIES}
  GROUP BY qb.vec_id, fl.f),
lsh_s AS (
  SELECT p.qid, v.vec_id AS vid,
         list_cosine_similarity(
           CAST(q.embedding AS DOUBLE[]),
           CAST(v.embedding AS DOUBLE[])) AS s
  FROM lsh_probe p
  JOIN lsh_bucket b ON b.bucket = p.bucket
  JOIN embeddings v ON v.vec_id = b.vec_id
  JOIN embeddings q ON q.vec_id = p.qid
  WHERE v.vec_id != p.qid)
SELECT qid AS query_id, vid AS neighbor_id, rank FROM (
  SELECT qid, vid,
         row_number() OVER (PARTITION BY qid
           ORDER BY s DESC, vid ASC) AS rank
  FROM lsh_s) WHERE rank <= {K}"""


KNN_IVF_SQL = _knn_ivf_sql()
KNN_LSH_SQL = _knn_lsh_sql()
