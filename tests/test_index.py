"""S7 analog: persisted inverted-index build + partition-pruned BM25.

Reference anchor: build_indices_and_constraints
(graph_data_operations.py:31-92) creates the Lucene index the per-query
searches rely on; here the index is an explicit batch artifact."""

import math

import pyarrow as pa
import pytest


DOCS = pa.table(
    {
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            "the quick brown fox",
            "the the lazy dog",
            "quick quick quick fox!",
            "",
            "dog dog dog dog dog quick",
        ],
    }
)


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    from graphiti_ray.search.index import build_text_index

    d = str(tmp_path_factory.mktemp("tidx"))
    stats = build_text_index(rd.from_arrow(DOCS), "text", "doc_id", d)
    assert stats["n_docs"] == 4  # the empty doc indexes nothing
    assert stats["avgdl"] == pytest.approx((4 + 4 + 4 + 6) / 4)
    return d


def test_vocab_and_postings_values(ray_session, index_dir):
    import ray.data as rd

    v = rd.read_parquet(f"{index_dir}/vocab").to_pandas()
    vm = {r.token: (r.df, r.cf) for r in v.itertuples(index=False)}
    assert vm["the"] == (2, 3)
    assert vm["quick"] == (3, 5)
    assert vm["dog"] == (2, 6)
    assert vm["fox"] == (2, 2)
    p = rd.read_parquet(f"{index_dir}/postings").to_pandas()
    pm = {(r.token, r.id): (r.tf, r.dl) for r in p.itertuples(index=False)}
    assert pm[("quick", 3)] == (3, 4)
    assert pm[("dog", 5)] == (5, 6)
    assert ("the", 5) not in pm
    # the corpus-stat sentinel rides the build exchange but must never
    # leak into the persisted postings/vocab tables
    from graphiti_ray.search.index import STAT_TOKEN

    assert STAT_TOKEN not in vm
    assert not any(t == STAT_TOKEN for t, _ in pm)


def test_bm25_indexed_matches_bruteforce(ray_session, index_dir):
    from graphiti_ray.search.index import (
        BM25_B,
        BM25_K1,
        bm25_search_indexed,
        tokenize_query,
    )

    query = "quick dog"
    got = bm25_search_indexed(index_dir, query, limit=10, id_type=pa.int64()).to_pandas()

    # brute force over the in-memory corpus
    toks = {
        r["doc_id"]: [t for t in r["text"].lower().replace("!", " ").split() if t]
        for r in DOCS.to_pylist()
    }
    toks = {d: ts for d, ts in toks.items() if ts}
    n, avgdl = len(toks), sum(map(len, toks.values())) / len(toks)
    want = {}
    for term in tokenize_query(query):
        df = sum(term in ts for ts in toks.values())
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, ts in toks.items():
            tf = ts.count(term)
            if tf:
                dl = len(ts)
                want[d] = want.get(d, 0) + idf * tf * (BM25_K1 + 1) / (
                    tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
                )
    want_rows = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(got["id"]) == [d for d, _ in want_rows]
    assert list(got["score"]) == pytest.approx([s for _, s in want_rows])


def test_bm25_indexed_empty_query(ray_session, index_dir):
    from graphiti_ray.search.index import bm25_search_indexed

    out = bm25_search_indexed(index_dir, "???", limit=5, id_type=pa.int64())
    assert out.count() == 0


def test_vector_index_exact_equals_bruteforce(ray_session, tmp_path):
    """nprobe=nlist over the persisted IVF index is exhaustive — must
    equal the brute-force top-k exactly; the approximate setting keeps
    a recall floor above the scan fraction."""
    import ray.data as rd

    from graphiti_ray.ops.simsearch import _load_queries, knn_bruteforce
    from graphiti_ray.search.vindex import build_vector_index, knn_search_indexed

    SF = "/root/testdata/sf0.001"
    d = str(tmp_path / "vidx")
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    stats = build_vector_index(emb, "embedding", "vec_id", d)
    assert stats["nlist"] == 16

    qids, qmat = _load_queries(SF)
    exact = knn_search_indexed(d, qids, qmat, nprobe=16).to_pandas()
    brute = knn_bruteforce(SF).to_pandas()
    cols = ["query_id", "neighbor_id", "rank"]
    a = exact[cols].sort_values(cols).reset_index(drop=True)
    b = brute[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    approx = knn_search_indexed(d, qids, qmat, nprobe=6).to_pandas()
    hits = total = 0
    for qid in qids:
        want = set(brute[brute["query_id"] == qid]["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.5
