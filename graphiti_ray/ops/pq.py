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


def pq_encode(sf_dir: str):
    """(vec_id, m, code): per-subspace codeword assignment under the
    trained spherical-PQ codebooks."""
    import ray

    from ..stages.joins import get_broadcast

    base = read_embeddings(sf_dir, ["vec_id", "embedding"])
    books = []
    for m in range(PQ_M):
        sub = base.map_batches(_slice_sub(m), batch_format="pyarrow")
        cids, cents = _init_sub_centroids(sf_dir, m)
        for _ in range(KMEANS_ITERS):
            cids, cents = _lloyd_centroids(sub, cids, cents)
        books.append((cids, cents))
    bref = ray.put(books)

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
