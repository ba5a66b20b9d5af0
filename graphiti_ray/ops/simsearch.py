"""Approximate-nearest-neighbor search over the embedding column.

- ``knn_bruteforce``: exact cosine top-k — the query matrix is ray.put
  ONCE (broadcast, never re-shipped per batch); every task matmuls its
  Arrow block against it and emits per-block top-k candidates; a tiny
  groupby(query_id) reduce keeps the global top-k. Work per task is
  O(block x queries x dim) numpy; the reduce input is
  O(blocks x queries x k), independent of corpus size — this is the
  100 TB-safe shape for small query sets.
- ``knn_lsh``: the bucketed scale path — random-hyperplane LSH (Charikar
  signed projections) assigns each vector to a bucket; queries probe
  only their own bucket (+ multiprobe neighbors), trading recall for a
  corpus-size-independent candidate set. Recall vs brute force is
  pinned by tests/test_ops_dedup_search.py.

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
        sims = q @ m.T  # (n_queries, block)
        out_q, out_n, out_s = [], [], []
        for i, qid in enumerate(q_ids):
            s = sims[i].copy()
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


def _lsh_planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(11)
    return rng.standard_normal((N_PLANES, dim))


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits @ (1 << np.arange(N_PLANES))).astype(np.int64)


NLIST = 16  # IVF coarse-quantizer cells (scale: ~sqrt(corpus))
NPROBE = 6  # cells scanned per query


def _kmeans(sample: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means on unit vectors (seeded init, cosine
    assignment). The coarse quantizer for IVF."""
    rng = np.random.default_rng(23)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    cent = _normalize(cent)
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        new = []
        for c in range(len(cent)):
            pts = sample[assign == c]
            new.append(pts.mean(axis=0) if len(pts) else cent[c])
        cent = _normalize(np.stack(new))
    return cent


def knn_ivf(sf_dir: str):
    """IVF ANN: a k-means coarse quantizer (trained on a sample)
    partitions vectors into NLIST inverted lists; each query scans only
    its NPROBE nearest lists. Same output schema as knn_bruteforce.

    Scale shape: train on a driver-side sample (fixed size), assignment
    is one matmul per block against the broadcast centroids, the
    inverted-list shuffle is a groupby(list_id), and per-query work is
    corpus/NLIST x NPROBE."""
    import ray
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir)

    # train the quantizer on a bounded sample (here: first 2048 rows)
    import pyarrow.parquet as pq_mod

    sample_t = pq_mod.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).slice(0, 2048)
    sample = _normalize(np.array(sample_t.column("embedding").to_pylist(), dtype=np.float64))
    cent = _kmeans(sample, NLIST)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        lid = (m @ c.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lid, pa.int64()))

    # query probe sets
    probes: dict[int, list[int]] = {}
    q_order = np.argsort(-(qmat @ cent.T), axis=1)[:, :NPROBE]
    for qi, qid in enumerate(qids):
        for c in q_order[qi]:
            probes.setdefault(int(c), []).append(int(qid))
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
            s = qvecs[qid] @ m.T
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
    cand = ds.groupby("list_id").map_groups(list_scan, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(_topk_reduce, batch_format="pyarrow")


def knn_lsh(sf_dir: str):
    """LSH-bucketed ANN: same output schema as knn_bruteforce, but each
    query only scores vectors in its bucket (+hamming-1 multiprobe).
    The shuffle is a groupby(bucket) — candidate work per bucket is
    corpus_size / 2^planes on average."""
    import ray
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir)

    def probe_buckets(bucket: int) -> list[int]:
        out = [bucket]
        if MULTIPROBE >= 1:
            out += [bucket ^ (1 << p) for p in range(N_PLANES)]
        return out

    def assign(batch: pa.Table) -> pa.Table:
        m = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        planes = _lsh_planes(m.shape[1])
        return batch.append_column(
            "bucket", pa.array(_bucket_of(m, planes), pa.int64())
        )

    planes = _lsh_planes(qmat.shape[1])
    q_buckets = _bucket_of(qmat, planes)
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
            s = qvecs[qid] @ m.T
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
