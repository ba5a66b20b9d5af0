"""Embedding-space clustering + semantic (SemDeDup-style) dedup.

Two operators over the embeddings table, both with exact DuckDB
mirrors (unrolled Lloyd iterations — the iteration count and init are
fixed, deterministic contracts, so the whole algorithm is
SQL-expressible):

- ``kmeans_assignments``: spherical k-means (cosine assignment,
  mean-vector update). Init = the K vectors with the smallest vec_id;
  KMEANS_ITERS centroid updates; one final assignment pass. Centroids
  are ROUNDED to CENT_ROUND decimals after every update — that
  quantization is the cross-engine determinism contract (float64
  summation-order drift between numpy and the SQL oracle is ~1e-14,
  vastly below the 1e-6 grid, so both engines hold bit-identical
  centroids at every step).
- ``semantic_dedup``: SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
  shape — cluster the corpus, then drop a document when a
  smaller-vec_id member of the SAME cluster has cosine >= SEM_TAU to
  it (the non-recursive smaller-id-wins rule; cf. the 0.9-threshold
  contract in ops/corpus.py: planted dups sit at cosine 1.0 and the
  max natural pair is ~0.6, so the threshold is float-noise-safe).

Scale shape (the 100-TB story):
- Centroids are O(K x dim) — kilobytes. They live in the object store
  (ray.put) and every task reads them via get_broadcast; they are
  never re-shipped per batch.
- Each Lloyd iteration is ONE streaming pass: map_batches emits
  per-block partial sums (<= K rows per block), a groupby(cid) over
  those partials reduces them to K rows, and ONLY those K rows reach
  the driver. Nothing corpus-sized is collected; the exchange volume
  is O(blocks x K x dim), independent of row count within a block.
- The dedup pass shuffles the corpus ONCE by cluster_id (K is chosen
  ~N/target_cluster_size in production, so clusters are bounded) and
  the per-cluster kernel is CHUNKED: each row-chunk compares against
  the full normalized member matrix, so peak memory is
  O(chunk x cluster) not O(cluster^2).

Graphiti has no clustering analog; this is one of the
beyond-the-reference LLM-training-data operators (brief: embedding
near-dup / semantic dedup family), sibling to ops/dedup.py's
embedding_cosine_pairs (exact all-pairs) — this is the scale path that
replaces the O(n^2) tile join with a cluster-bounded local join.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

from .corpus import embeddings_with_dups
from .dedup import list_col_to_matrix
from .io import read_embeddings

K_CLUSTERS = 10  # matches the synthetic table's label count
KMEANS_ITERS = 2  # centroid updates; ITERS+1 assignment passes total
CENT_ROUND = 6  # centroid quantization grid (decimal places)
SEM_TAU = 0.9  # same float-safe threshold as ops/dedup.COSINE_THRESHOLD
DEDUP_CHUNK = 1024  # rows per dedup kernel chunk (memory bound)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _init_centroids(sf_dir: str, k: int = K_CLUSTERS) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic init: the ``k`` vectors with the smallest vec_id
    (pruned single-file read; k rows)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = t.filter(pc.less(t.column("vec_id"), k))
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_col_to_matrix(t.column("embedding"))
    order = np.argsort(ids)
    return ids[order], mat[order]


def _assign_labels(X: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Cosine argmax; ties resolve to the first (= smallest-cid) centroid
    because the centroid matrix is kept sorted by cid — mirrors the SQL
    ``ORDER BY cos DESC, cid ASC`` row_number tie-break."""
    sims = _normalize_rows(X) @ _normalize_rows(cents).T
    return np.argmax(sims, axis=1)


def _lloyd_centroids(ds, cids: np.ndarray, cents: np.ndarray):
    """One Lloyd update: stream partial (sum, count) per cluster out of
    every block, reduce to <= K rows via groupby, round on the driver.
    Clusters that lose every member vanish (both engines drop them by
    construction: GROUP BY emits no row, and the reduce sees no input).
    """
    import ray

    from ..stages.joins import get_broadcast

    cref = ray.put((cids, cents))

    def partial(batch: pa.Table) -> pa.Table:
        c_ids, c_mat = get_broadcast(cref)
        X = list_col_to_matrix(batch.column("embedding"))
        lbl = _assign_labels(X, c_mat)
        out_cid: list[int] = []
        out_sum: list[list[float]] = []
        out_n: list[int] = []
        for idx in np.unique(lbl):
            mask = lbl == idx
            out_cid.append(int(c_ids[idx]))
            out_sum.append(X[mask].sum(axis=0).tolist())
            out_n.append(int(mask.sum()))
        return pa.table(
            {
                "cid": pa.array(out_cid, pa.int64()),
                "psum": pa.array(out_sum, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def reduce_group(g: pa.Table) -> pa.Table:
        s = list_col_to_matrix(g.column("psum")).sum(axis=0)
        n = int(np.sum(g.column("n").to_numpy(zero_copy_only=False)))
        mean = np.round(s / n, CENT_ROUND)
        return pa.table(
            {
                "cid": pa.array([g.column("cid")[0].as_py()], pa.int64()),
                "c": pa.array([mean.tolist()], pa.list_(pa.float64())),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cid")
        .map_groups(reduce_group, batch_format="pyarrow")
        .take_all()
    )  # <= K rows: the ONLY driver-side state of the iteration
    rows.sort(key=lambda r: r["cid"])
    new_ids = np.array([r["cid"] for r in rows], dtype=np.int64)
    new_c = np.array([r["c"] for r in rows], dtype=np.float64)
    return new_ids, new_c


def _fit_kmeans(ds, sf_dir: str, k: int = K_CLUSTERS) -> tuple[np.ndarray, np.ndarray]:
    cids, cents = _init_centroids(sf_dir, k)
    for _ in range(KMEANS_ITERS):
        cids, cents = _lloyd_centroids(ds, cids, cents)
    return cids, cents


@lru_cache(maxsize=8)
def fit_kmeans_cached(sf_dir: str, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Trained (cids, cents) for the plain embeddings table — the
    result is a pure deterministic function of (sf_dir, k), and several
    operators (knn_ivf, knn_ivfpq, kmeans_assignments) train the
    identical quantizer, so each process pays the KMEANS_ITERS
    streaming passes once per (corpus, k) instead of once per query.
    Callers must not mutate the returned arrays."""
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    return _fit_kmeans(ds, sf_dir, k=k)


def kmeans_assignments(sf_dir: str):
    """(vec_id, cluster_id): spherical k-means over the embeddings
    table, final assignment under the post-iteration centroids."""
    import ray

    from ..stages.joins import get_broadcast

    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    cids, cents = fit_kmeans_cached(sf_dir, K_CLUSTERS)
    cref = ray.put((cids, cents))

    def assign(batch: pa.Table) -> pa.Table:
        c_ids, c_mat = get_broadcast(cref)
        X = list_col_to_matrix(batch.column("embedding"))
        lbl = _assign_labels(X, c_mat)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "cluster_id": pa.array(c_ids[lbl], pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(sf_dir: str):
    """(vec_id, cluster_id, kept, dup_of): SemDeDup over the
    planted-dup corpus — k-means partition, then within each cluster
    drop any vector whose cosine to a smaller-vec_id member is
    >= SEM_TAU (dup_of = the smallest such member, -1 when kept).

    ONE corpus-wide exchange (groupby cluster_id); the per-cluster
    kernel is chunked so memory is O(DEDUP_CHUNK x cluster_size)."""
    import ray

    from ..stages.joins import get_broadcast

    ds = embeddings_with_dups(sf_dir)
    cids, cents = _fit_kmeans(ds, sf_dir)
    cref = ray.put((cids, cents))

    def assign(batch: pa.Table) -> pa.Table:
        c_ids, c_mat = get_broadcast(cref)
        X = list_col_to_matrix(batch.column("embedding"))
        lbl = _assign_labels(X, c_mat)
        # drop pandas schema metadata (unhashable for Ray's block dedup)
        return batch.replace_schema_metadata(None).append_column(
            "cluster_id", pa.array(c_ids[lbl], pa.int64())
        )

    def cluster_dedup(g: pa.Table) -> pa.Table:
        ids = g.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        Xn = _normalize_rows(list_col_to_matrix(g.column("embedding")))[order]
        m = len(ids)
        dup_of = np.full(m, -1, dtype=np.int64)
        for lo in range(0, m, DEDUP_CHUNK):
            hi = min(lo + DEDUP_CHUNK, m)
            if lo == 0 and hi <= 1:
                continue
            sims = Xn[lo:hi] @ Xn.T  # (chunk, m)
            # strictly-smaller-id members only (global column mask)
            col = np.arange(m)[None, :]
            row = np.arange(lo, hi)[:, None]
            hit = (sims >= SEM_TAU) & (col < row)
            has = hit.any(axis=1)
            first = np.argmax(hit, axis=1)  # first True = smallest id
            dup_of[lo:hi][has] = ids[first[has]]
        cid = g.column("cluster_id")[0].as_py()
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array([cid] * m, pa.int64()),
                "kept": pa.array(dup_of < 0, pa.bool_()),
                "dup_of": pa.array(dup_of, pa.int64()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(cluster_dedup, batch_format="pyarrow")
    )


# ------------------------------------------------------- SQL mirrors

def _kmeans_ctes(corpus: str, k: int = K_CLUSTERS,
                 prefix: str = "") -> tuple[str, str]:
    """Unrolled Lloyd chain over CTE/view ``corpus`` (vec_id,
    embedding). Returns (cte_body, final_assignment_cte_name). The
    final CTE carries (vec_id, embedding, cid). ``prefix`` namespaces
    the CTE names so several chains (e.g. an IVF coarse quantizer next
    to the PQ subspace chains) compose in one statement; the trained
    centroids live in ``{prefix}c{KMEANS_ITERS}``."""
    parts = [
        f"{prefix}c0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c\n"
        f"        FROM {corpus} WHERE vec_id < {k})"
    ]
    final = ""
    for i in range(KMEANS_ITERS + 1):
        final = f"{prefix}asn{i + 1}"
        parts.append(
            f"""{final} AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT v.vec_id, v.embedding, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(
                        CAST(v.embedding AS DOUBLE[]), c.c) DESC,
                      c.cid ASC) AS rn
    FROM {corpus} v CROSS JOIN {prefix}c{i} c) WHERE rn = 1)"""
        )
        if i < KMEANS_ITERS:
            parts.append(
                f"""{prefix}c{i + 1} AS (
  SELECT cid, list(m ORDER BY pos) AS c FROM (
    SELECT cid, pos, round(avg(v), {CENT_ROUND}) AS m FROM (
      SELECT cid, unnest(range(len(embedding))) AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS v FROM {final})
    GROUP BY cid, pos) GROUP BY cid)"""
            )
    return ",\n".join(parts), final


def _kmeans_sql() -> str:
    body, final = _kmeans_ctes("embeddings")
    return f"WITH {body}\nSELECT vec_id, cid AS cluster_id FROM {final}"


def _semantic_dedup_sql() -> str:
    from .corpus import EMBEDDINGS_WITH_DUPS_CTE

    body, final = _kmeans_ctes("vecs")
    return f"""WITH {EMBEDDINGS_WITH_DUPS_CTE.strip().rstrip()},
{body},
dups AS (
  SELECT a.vec_id, min(b.vec_id) AS dup_of0
  FROM {final} a JOIN {final} b
    ON a.cid = b.cid AND b.vec_id < a.vec_id
   AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) >= {SEM_TAU}
  GROUP BY a.vec_id)
SELECT a.vec_id, a.cid AS cluster_id,
       d.dup_of0 IS NULL AS kept,
       COALESCE(d.dup_of0, -1) AS dup_of
FROM {final} a LEFT JOIN dups d ON a.vec_id = d.vec_id"""


KMEANS_SQL = _kmeans_sql()
SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()
