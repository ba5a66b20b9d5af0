"""Cross-document repeated-span detection (exact substring dedup
statistics, Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499 — the n-gram-window form).

``repeated_spans``: for every document, count the NGRAM_N-token
windows whose exact token sequence also occurs in at least DF_MIN-1
OTHER documents. This is the decision statistic for span-level
training-data dedup (the suffix-array method's windowed
approximation): a high repeated-position fraction marks boilerplate /
mirrored / templated text.

Scale shape (the 100-TB story): identical to
ops/filtering._decontaminate_distributed — the corpus explodes to
(doc, 64-bit gram hash, position-count) rows (vectorized rolling
polynomial hash over token hashes, _token_poly_hashes), ONE bucketed
exchange on gh % B gives every reducer a complete hash range to
compute document frequency, and the per-doc totals fold back through
lookup_column's tiered broadcast/shard machinery. No task ever holds
a corpus-sized structure; skew is bounded because a single gram
contributes one row per containing document, counts only (no pair
enumeration — unlike exact-Jaccard there is no O(p²) hot-key bound).

Exactness caveat (documented, same trade as the decontaminate scale
tier): two distinct grams colliding on 64 bits could misclassify one
window; P ≈ n_grams²/2⁶⁴. The DuckDB oracle compares exact gram
STRINGS, so the green hash check on the synthetic corpus doubles as
the no-collision witness there.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .filtering import NGRAM_N, _token_poly_hashes

DF_MIN = 2  # a span is "repeated" when >= DF_MIN distinct docs contain it
_SPAN_BUCKETS = 64


def repeated_spans(sf_dir: str):
    """(doc_id, n_windows, n_repeated_positions, n_repeated_grams)
    over the documents table. n_windows = token-window count
    (len - NGRAM_N + 1, floored at 0); n_repeated_positions = window
    POSITIONS whose gram is corpus-repeated; n_repeated_grams =
    DISTINCT such grams in the doc."""
    import pandas as pd

    from ..stages.joins import lookup_column
    from .io import read_documents

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def grams(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"))
        doc_of, gh = _token_poly_hashes(t.column("text").to_pylist())
        d = ids[doc_of].astype(np.uint64)
        pairs, cnt = np.unique(
            np.stack([d, gh], axis=1), axis=0, return_counts=True
        )
        return pa.table(
            {
                "doc_id": pa.array(pairs[:, 0].astype(np.int64)),
                "gh": pa.array(pairs[:, 1], pa.uint64()),
                "cnt": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array(
                    (pairs[:, 1] % np.uint64(_SPAN_BUCKETS)).astype(np.int32)
                ),
            }
        )

    def bucket_reduce(df: "pd.DataFrame") -> "pd.DataFrame":
        # rows are DISTINCT (doc, gh) with position counts; document
        # frequency of a gram = its row count in this (complete) range
        ndocs = df.groupby("gh")["doc_id"].size()
        rep = ndocs.index[ndocs >= DF_MIN]
        m = df[df["gh"].isin(rep)]
        g = m.groupby("doc_id").agg(
            rep_pos=("cnt", "sum"), rep_grams=("gh", "size")
        )
        return pd.DataFrame(
            {
                "doc_id": g.index.to_numpy(np.int64),
                "rep_pos": g["rep_pos"].to_numpy(np.int64),
                "rep_grams": g["rep_grams"].to_numpy(np.int64),
            }
        )

    def doc_bucket(t: pa.Table) -> pa.Table:
        db = pc.cast(
            pc.bit_wise_and(t.column("doc_id"), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return t.append_column("db", db)

    def doc_reduce(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("doc_id")[["rep_pos", "rep_grams"]].sum()
        return pd.DataFrame(
            {
                "doc_id": g.index.to_numpy(np.int64),
                "rep_pos": g["rep_pos"].to_numpy(np.int64),
                "rep_grams": g["rep_grams"].to_numpy(np.int64),
            }
        )

    # doc totals: one bucketed exchange with a vectorized per-bucket
    # reducer (Dataset.aggregate's per-distinct-key sort path measured
    # ~12x slower on this shape)
    totals = (
        docs.map_batches(grams, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_reduce, batch_format="pandas")
        .map_batches(doc_bucket, batch_format="pyarrow")
        .groupby("db")
        .map_groups(doc_reduce, batch_format="pandas")
    )

    def count_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ck": pc.cast(t.column("doc_id"), pa.string()),
                "pos": pc.cast(t.column("rep_pos"), pa.int64()),
                "grm": pc.cast(t.column("rep_grams"), pa.int64()),
            }
        )

    # materialize ONCE: lookup_column consumes its mapping twice
    # (count + collect) and we look up two columns — a lazy `keyed`
    # would re-run the whole gram exchange up to 4x
    from ..functions.exchange import coalesced

    keyed = coalesced(
        totals.map_batches(count_key, batch_format="pyarrow").materialize()
    )

    def doc_side(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(t.column("text"), " "))
        nwin = pc.max_element_wise(
            pc.add(pc.cast(ntok, pa.int64()), pa.scalar(1 - NGRAM_N, pa.int64())),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "dk": pc.cast(t.column("doc_id"), pa.string()),
                "n_windows": nwin,
            }
        )

    joined = lookup_column(
        docs.map_batches(doc_side, batch_format="pyarrow"),
        "dk", keyed, "ck", "pos", "pos_raw", val_type=pa.int64(),
    )
    joined = lookup_column(
        joined, "dk", keyed, "ck", "grm", "grm_raw", val_type=pa.int64(),
    )

    def finish(t: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_windows": t.column("n_windows"),
                "n_repeated_positions": pc.coalesce(t.column("pos_raw"), zero),
                "n_repeated_grams": pc.coalesce(t.column("grm_raw"), zero),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


REPEATED_SPANS_SQL = f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
pos AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, CAST(i AS BIGINT),
                                    CAST(i AS BIGINT) + {NGRAM_N - 1}), ' ')
           AS gram
  FROM w, UNNEST(range(1, len(ws) - {NGRAM_N} + 2)) AS t(i)
  WHERE len(ws) >= {NGRAM_N}
),
rep AS (
  SELECT gram FROM pos GROUP BY gram
  HAVING count(DISTINCT doc_id) >= {DF_MIN}
),
per_doc AS (
  SELECT doc_id, count(*) AS rep_pos, count(DISTINCT gram) AS rep_grams
  FROM pos JOIN rep USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
  greatest(len(string_split(d.text, ' ')) - {NGRAM_N} + 1, 0) AS n_windows,
  COALESCE(p.rep_pos, 0) AS n_repeated_positions,
  COALESCE(p.rep_grams, 0) AS n_repeated_grams
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""
