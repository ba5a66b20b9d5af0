"""Persisted IVF vector index — the embedding twin of search/index.py.

Build once as a batch artifact, answer queries with partition-pruned
reads:

    <out>/centroids/  (list_id, centroid)      one tiny file
    <out>/lists/      (id, embedding)          partitioned by list_id

``build_vector_index`` trains the deterministic spherical-k-means
coarse quantizer (ops/clustering's unrolled-Lloyd contract: init = the
nlist smallest-id vectors, KMEANS_ITERS updates on the CENT_ROUND
grid), assigns every vector with one matmul per block against the
broadcast centroids, and writes the inverted lists hive-partitioned.
``knn_search_indexed`` reads ONLY the nprobe list partitions each
query probes — per-query work is corpus/nlist x nprobe rows regardless
of corpus size. With nprobe = nlist the scan is exhaustive and the
result is EXACTLY the brute-force cosine top-k (same tie-break); the
approximate setting runs the SAME quantizer + probe contract as
ops/simsearch.knn_ivf, so BOTH lanes share the exact DuckDB image
KNN_IVF_SQL (int64-id corpora; string-id node indexes have no oracle
table and stay pytest-pinned).

Reference anchor: Q5 cosine searches (search_utils.py:200-274) run
against a pre-built vector index in Neo4j/Lucene; the batch analog
makes the index build an explicit pipeline (S7 family).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ops.simsearch import K, _normalize, _row_dot


def _topk_reduce_any(group: pa.Table, k: int = K) -> pa.Table:
    """Global top-k for one query from per-block candidates; rank by
    score desc, neighbor id asc (same tie-break as ops/simsearch's
    reducer) — id type preserved (int64 or string)."""
    ids = group.column("neighbor_id").to_pylist()
    scores = group.column("score").to_pylist()
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
    qid = group.column("query_id")[0]
    id_t = group.column("neighbor_id").type
    return pa.table(
        {
            "query_id": pa.array([qid.as_py()] * len(order), id_t),
            "neighbor_id": pa.array([ids[i] for i in order], id_t),
            "rank": pa.array(range(1, len(order) + 1), pa.int64()),
        }
    )


def _mat(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix without a Python
    list round-trip (flatten is zero-copy on the Arrow buffer)."""
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(np.float64)


def _init_rows(ds, id_col: str, vec_col: str, k: int):
    """The k smallest-id rows: per-block partial top-k (each block emits
    at most k rows), then a driver-side merge of blocks × k rows — the
    bounded analog of clustering._init_centroids for a generic Dataset.
    """
    def blk(t: pa.Table) -> pa.Table:
        return (
            t.select([id_col, vec_col])
            .sort_by([(id_col, "ascending")])
            .slice(0, k)
        )

    rows = ds.map_batches(blk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    return rows[:k]


def build_vector_index(ds, vec_col: str, id_col: str, out_dir: str,
                       nlist: int = 16, pretrained=None):
    """Embedding Dataset -> persisted IVF index. The coarse quantizer
    is the deterministic unrolled-Lloyd contract of ops/clustering
    (init = nlist smallest-id vectors, KMEANS_ITERS streaming updates
    with ≤ nlist rows of driver state each), then one assignment pass
    (broadcast centroids) + one hive-partitioned write. Integer-id
    corpora keep cid = the init row's id (the SQL-mirrorable contract);
    string-id corpora (node uuids) number cells 0..nlist-1.

    ``pretrained=(cids, cents)`` skips training — used when the caller
    already holds the deterministic quantizer for this corpus
    (ops/clustering.fit_kmeans_cached), saving the training passes."""
    import ray
    import ray.data as rd

    from ..ops.clustering import KMEANS_ITERS, _assign_labels, _lloyd_centroids

    if pretrained is not None:
        cids, cents = pretrained
        cids = np.asarray(cids, np.int64)
        cents = np.asarray(cents, np.float64)
    else:
        init = _init_rows(ds, id_col, vec_col, nlist)
        int_ids = all(isinstance(r[id_col], (int, np.integer)) for r in init)
        cids = (
            np.array([r[id_col] for r in init], dtype=np.int64)
            if int_ids else np.arange(len(init), dtype=np.int64)
        )
        cents = np.array(
            [np.asarray(r[vec_col]) for r in init], dtype=np.float64
        )
        emb_ds = ds.map_batches(
            lambda t: pa.table({"embedding": t.column(vec_col)}),
            batch_format="pyarrow",
        )
        for _ in range(KMEANS_ITERS):
            cids, cents = _lloyd_centroids(emb_ds, cids, cents)
    cent_ref = ray.put((cids, cents))

    def assign(t: pa.Table) -> pa.Table:
        c_ids, c_mat = ray.get(cent_ref)
        lid = c_ids[_assign_labels(_mat(t.column(vec_col)), c_mat)]
        return pa.table(
            {
                "id": t.column(id_col),
                "embedding": t.column(vec_col),
                # lid duplicates list_id INSIDE the file: the hive
                # partition column lives only in the path, and queries
                # read partition files directly
                "lid": pa.array(lid, pa.int64()),
                "list_id": pa.array(lid, pa.int64()),
            }
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "lists"), partition_cols=["list_id"]
    )
    rd.from_arrow(
        pa.table(
            {
                "list_id": pa.array(cids, pa.int64()),
                "centroid": pa.array(cents.tolist(), pa.list_(pa.float64())),
            }
        )
    ).write_parquet(os.path.join(out_dir, "centroids"))
    return {"nlist": len(cids), "out_dir": out_dir}


def _list_files(index_dir: str, lids: list[int]) -> list[str]:
    out: list[str] = []
    for lid in lids:
        d = os.path.join(index_dir, "lists", f"list_id={lid}")
        if os.path.isdir(d):
            out.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    return out


def knn_search_indexed(index_dir: str, qids, qmat: np.ndarray,
                       nprobe: int = 6, k: int = K):
    """Top-k cosine neighbors per query from the persisted index.
    Returns a Dataset (query_id, neighbor_id, rank). Reads only the
    probed list partitions; per-partition scoring is one matmul.
    Query/neighbor ids may be int64 (embeddings table) or string
    (node uuids from build_indices_and_constraints)."""
    import ray
    import ray.data as rd

    qids = list(qids)
    id_t = pa.array(qids).type  # int64 or string, mirrored in outputs

    cent_t = (
        rd.read_parquet(os.path.join(index_dir, "centroids"))
        .to_pandas().sort_values("list_id")  # cid-asc tie-break order
    )
    cent = np.array([np.asarray(c) for c in cent_t["centroid"]], dtype=np.float64)
    order = np.array(cent_t["list_id"], dtype=np.int64)
    # probe sets: nprobe nearest centroids per query, cosine desc with
    # list_id-asc tie-break (stable argsort over cid-sorted columns) —
    # the same contract as ops/simsearch._probe_sets / KNN_IVF_SQL
    sims = _normalize(np.asarray(qmat, np.float64)) @ _normalize(cent).T
    probe_idx = np.argsort(-sims, axis=1, kind="stable")[:, : min(nprobe, len(cent))]
    probes: dict[int, list] = {}
    for qi, qid in enumerate(qids):
        for ci in probe_idx[qi]:
            probes.setdefault(int(order[ci]), []).append(qid)
    qref = ray.put((probes, dict(zip(qids, qmat))))

    def empty_out():
        return pa.table({"query_id": pa.array([], id_t),
                         "neighbor_id": pa.array([], id_t),
                         "score": pa.array([], pa.float64())})

    files = _list_files(index_dir, sorted(probes))
    if not files:
        return rd.from_arrow(
            empty_out().drop_columns(["score"]).append_column(
                "rank", pa.array([], pa.int64())
            )
        )

    def scan(t: pa.Table) -> pa.Table:
        pr, qvecs = ray.get(qref)
        if not t.num_rows:
            return empty_out()
        lid = t.column("lid")[0].as_py()
        hit = pr.get(int(lid), [])
        if not hit:
            return empty_out()
        vids = t.column("id").to_numpy(zero_copy_only=False)
        m = _normalize(_mat(t.column("embedding")))
        out_q, out_n, out_s = [], [], []
        for qid in hit:
            s = _row_dot(m, qvecs[qid])
            s[vids == qid] = -np.inf  # exclude self
            kk = min(k, len(vids))
            top = np.argpartition(-s, kk - 1)[:kk] if len(s) > kk else np.arange(len(s))
            top = top[np.isfinite(s[top])]
            out_q.extend([qid] * len(top))
            out_n.extend(vids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, id_t),
             "neighbor_id": pa.array(out_n, id_t),
             "score": pa.array(out_s, pa.float64())}
        )

    # a block may span several partition files; split per lid (no extra
    # shuffle — the final groupby(query_id) merges candidates anyway)
    def scan_any(t: pa.Table) -> pa.Table:
        outs = [
            scan(t.filter(pc.equal(t.column("lid"), lid)))
            for lid in pc.unique(t.column("lid")).to_pylist()
        ]
        good = [o for o in outs if o.num_rows]
        return pa.concat_tables(good) if good else scan(t.slice(0, 0))

    cand = rd.read_parquet(files).map_batches(scan_any, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(
        lambda g: _topk_reduce_any(g, k=k), batch_format="pyarrow"
    )
