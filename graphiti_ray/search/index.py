"""S7 analog: a PERSISTED text-search index built as a batch stage.

The reference issues index/constraint DDL once at startup
(`build_indices_and_constraints`,
graphiti_core/utils/maintenance/graph_data_operations.py:31-92) so its
per-query Lucene searches are O(posting lists), not O(corpus). The
batch analog is an explicit index-BUILD pipeline: one bucketed exchange
over the corpus materializes a hive-partitioned inverted index

    <out>/stats/     one row: n_docs, avgdl
    <out>/vocab/     (token, df, cf)        partitioned by bucket
    <out>/postings/  (token, id, tf, dl)    partitioned by bucket

and ``bm25_search_indexed`` answers a query by reading ONLY the bucket
partitions its terms hash into (partition-pruned parquet read) — the
100-TB shape where a query touches KB of postings instead of rescanning
the corpus like the on-the-fly `_corpus_stats` lane does.

Tokenization is exact-token (lower + split on ``[^a-z0-9]+``), shared
with the DuckDB oracle mirror in queries.py token-for-token. Scoring is
BM25 (k1=1.5, b=0.75) with the same idf formula as search.py's
substring lane; tf here is exact-token, so the two lanes are distinct
operators on purpose.
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import bucket_array

BM25_K1, BM25_B = 1.5, 0.75
NUM_BUCKETS = 64
TOKEN_SPLIT = "[^a-z0-9]+"
# sentinel for per-block corpus-stat partials; tokenization lowercases
# and strips non-alnum, so no real token can ever equal it
STAT_TOKEN = "\x00stat"


def _token_rows(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """One row per (doc, distinct token): token, id, tf, dl.

    Vectorized tokenize (Arrow kernels), then a per-BATCH arrow group_by
    — the map-side combiner, so the exchange ships one row per distinct
    (doc, token), not one per occurrence."""
    toks = pc.split_pattern_regex(pc.utf8_lower(t.column(text_col)), TOKEN_SPLIT)
    n = t.num_rows
    ids = t.column(id_col)
    # flatten with parent indices; drop empty tokens ('' from leading /
    # trailing separators and all-separator docs)
    parents = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = pc.filter(flat, keep)
    parents = pc.filter(parents, keep)
    # dl per doc = kept-token count
    import numpy as np

    dl = np.zeros(n, dtype=np.int64)
    np.add.at(dl, np.asarray(parents), 1)
    pairs = pa.table(
        {
            "token": flat,
            "id": pc.take(ids, parents),
            "dl": pa.array(dl[np.asarray(parents)], pa.int64()),
        }
    )
    g = pairs.group_by(["token", "id"]).aggregate([("dl", "count"), ("dl", "min")])
    g = g.rename_columns(["token", "id", "tf", "dl"])
    g = g.append_column(
        "bucket", pa.array(bucket_array(g.column("token"), NUM_BUCKETS, salt="tidx"),
                           pa.int32())
    )
    # per-block corpus-stat partial (docs live in exactly one block, so
    # block partials sum exactly): one sentinel row carrying
    # (n_docs_with_tokens, total_dl) rides the SAME bucket exchange —
    # the alternative is a second groupby(id) all-to-all over every
    # posting row just to recover two integers
    n_docs_blk = int((dl > 0).sum())
    if n_docs_blk:
        stat = pa.table(
            {
                "token": pa.array([STAT_TOKEN], g.column("token").type),
                "id": pa.nulls(1, g.column("id").type),
                "tf": pa.array([n_docs_blk], pa.int64()),
                "dl": pa.array([int(dl.sum())], pa.int64()),
                "bucket": pa.array([0], pa.int32()),
            }
        )
        g = pa.concat_tables([g, stat])
    return g


def _reduce_bucket(t: pa.Table) -> pa.Table:
    """All tokens of one bucket: final postings + the bucket's vocab
    rows (kind column splits the union on write). Bucket 0 additionally
    folds the per-block corpus-stat sentinels into ONE stat row."""
    stat_mask = pc.equal(t.column("token"), STAT_TOKEN)
    stat_rows = None
    if pc.any(stat_mask).as_py():
        s = t.filter(stat_mask)
        stat_rows = (
            int(pc.sum(s.column("tf")).as_py() or 0),
            int(pc.sum(s.column("dl")).as_py() or 0),
        )
        t = t.filter(pc.invert(stat_mask))
    g = t.group_by(["token", "id"]).aggregate([("tf", "sum"), ("dl", "min")])
    g = g.rename_columns(["token", "id", "tf", "dl"])
    v = g.group_by("token").aggregate([("id", "count"), ("tf", "sum")])
    v = v.rename_columns(["token", "df", "cf"])
    n = g.num_rows + v.num_rows
    bucket = t.column("bucket")[0].as_py() if t.num_rows else 0
    out = pa.table(
        {
            "kind": pa.array(
                ["post"] * g.num_rows + ["vocab"] * v.num_rows, pa.string()
            ),
            "token": pa.concat_arrays(
                [g.column("token").combine_chunks(), v.column("token").combine_chunks()]
            ),
            "id": pa.concat_arrays(
                [g.column("id").combine_chunks(),
                 pa.nulls(v.num_rows, g.column("id").type)]
            ),
            "tf": pa.concat_arrays(
                [pc.cast(g.column("tf"), pa.int64()).combine_chunks(),
                 pa.nulls(v.num_rows, pa.int64())]
            ),
            "dl": pa.concat_arrays(
                [pc.cast(g.column("dl"), pa.int64()).combine_chunks(),
                 pa.nulls(v.num_rows, pa.int64())]
            ),
            "df": pa.concat_arrays(
                [pa.nulls(g.num_rows, pa.int64()),
                 pc.cast(v.column("df"), pa.int64()).combine_chunks()]
            ),
            "cf": pa.concat_arrays(
                [pa.nulls(g.num_rows, pa.int64()),
                 pc.cast(v.column("cf"), pa.int64()).combine_chunks()]
            ),
            "bucket": pa.array([bucket] * n, pa.int32()),
        }
    )
    if stat_rows is not None:
        out = pa.concat_tables([
            out,
            pa.table(
                {
                    "kind": pa.array(["stat"]),
                    "token": pa.array([STAT_TOKEN], out.column("token").type),
                    "id": pa.nulls(1, out.column("id").type),
                    "tf": pa.array([stat_rows[0]], pa.int64()),
                    "dl": pa.array([stat_rows[1]], pa.int64()),
                    "df": pa.nulls(1, pa.int64()),
                    "cf": pa.nulls(1, pa.int64()),
                    "bucket": pa.array([bucket], pa.int32()),
                }
            ),
        ])
    return out


def build_text_index(ds, text_col: str, id_col: str, out_dir: str):
    """Corpus -> persisted inverted index. ONE groupby(bucket) exchange;
    stats ride the same pass (per-batch partials summed on the driver —
    a few ints per block). Returns {"n_docs", "avgdl", "out_dir"}."""
    union = ds.map_batches(
        lambda t: _token_rows(t, text_col, id_col), batch_format="pyarrow"
    ).groupby("bucket").map_groups(_reduce_bucket, batch_format="pyarrow").materialize()

    union.filter(expr="kind == 'post'").select_columns(
        ["token", "id", "tf", "dl", "bucket"]
    ).write_parquet(os.path.join(out_dir, "postings"), partition_cols=["bucket"])
    union.filter(expr="kind == 'vocab'").select_columns(
        ["token", "df", "cf", "bucket"]
    ).write_parquet(os.path.join(out_dir, "vocab"), partition_cols=["bucket"])

    # corpus stats from the folded per-block sentinels (ONE tiny row in
    # bucket 0 — no second groupby(id) all-to-all over the postings)
    import ray.data as rd

    df = union.filter(expr="kind == 'stat'").select_columns(
        ["tf", "dl"]
    ).to_pandas()
    n_docs = int(df["tf"].sum())
    avgdl = float(df["dl"].sum()) / max(1, n_docs)
    rd.from_arrow(
        pa.table({"n_docs": pa.array([n_docs], pa.int64()),
                  "avgdl": pa.array([avgdl], pa.float64())})
    ).write_parquet(os.path.join(out_dir, "stats"))
    return {"n_docs": n_docs, "avgdl": avgdl, "out_dir": out_dir}


def _term_buckets(terms: list[str]) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    bks = bucket_array(pa.array(terms, pa.string()), NUM_BUCKETS, salt="tidx")
    for term, b in zip(terms, bks):
        out.setdefault(int(b), []).append(term)
    return out


def _partition_files(index_dir: str, table: str, buckets: list[int]) -> list[str]:
    """Parquet files of the given bucket partitions (read_parquet with a
    path LIST wants files; missing buckets mean no postings — skip)."""
    out: list[str] = []
    for b in buckets:
        d = os.path.join(index_dir, table, f"bucket={b}")
        if os.path.isdir(d):
            out.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    return out


def tokenize_query(query: str) -> list[str]:
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pa.array([query], pa.string())), TOKEN_SPLIT
    )[0].as_py()
    return sorted({t for t in toks if t})


def bm25_search_indexed(index_dir: str, query: str, limit: int = 20,
                        id_type: pa.DataType = pa.string()):
    """Answer a BM25 query from the persisted index: reads ONLY the
    vocab/postings bucket partitions the query terms hash into, scores
    the union of their posting lists, returns a Dataset
    (id, score) sorted score desc / id asc, top ``limit``.
    ``id_type``: the id column's Arrow type (only used for the
    empty-result shape)."""
    import ray.data as rd

    terms = tokenize_query(query)
    if not terms:
        return rd.from_arrow(pa.table({"id": pa.array([], id_type),
                                       "score": pa.array([], pa.float64())}))
    stats = rd.read_parquet(os.path.join(index_dir, "stats")).to_pandas()
    n_docs, avgdl = int(stats["n_docs"][0]), float(stats["avgdl"][0])
    buckets = sorted(_term_buckets(terms))
    part_paths = _partition_files(index_dir, "vocab", buckets)
    tset = pa.array(terms, pa.string())
    dfs: dict[str, int] = {}
    if part_paths:
        v = rd.read_parquet(part_paths, columns=["token", "df"]).map_batches(
            lambda t: t.filter(pc.is_in(t.column("token"), value_set=tset)),
            batch_format="pyarrow",
        ).to_pandas()
        dfs = dict(zip(v["token"], v["df"]))
    idf = {
        t: math.log(1 + (n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in terms
    }
    post_paths = _partition_files(index_dir, "postings", buckets)
    if not post_paths:
        return rd.from_arrow(pa.table({"id": pa.array([], id_type),
                                       "score": pa.array([], pa.float64())}))

    idf_tokens = pa.array(list(idf), pa.string())
    idf_vals = pa.array([idf[t] for t in idf], pa.float64())

    def score(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.filter(pc.is_in(t.column("token"), value_set=tset))
        if not t.num_rows:
            return pa.table({"id": pa.array([], t.column("id").type),
                             "score": pa.array([], pa.float64())})
        tok_idf = pc.take(
            idf_vals, pc.index_in(t.column("token"), value_set=idf_tokens)
        )
        tf = np.asarray(pc.cast(t.column("tf"), pa.float64()))
        dl = np.asarray(pc.cast(t.column("dl"), pa.float64()))
        norm = BM25_K1 * (1 - BM25_B + BM25_B * dl / max(avgdl, 1e-9))
        s = np.asarray(tok_idf) * tf * (BM25_K1 + 1) / (tf + norm)
        return pa.table({"id": t.column("id"),
                         "score": pa.array(s, pa.float64())})

    scored = rd.read_parquet(
        post_paths, columns=["token", "id", "tf", "dl"]
    ).map_batches(score, batch_format="pyarrow")
    return (
        scored.groupby("id").sum("score")
        .map_batches(
            lambda t: t.rename_columns(["id", "score"]), batch_format="pyarrow"
        )
        .sort(["score", "id"], descending=[True, False])
        .limit(limit)
    )
