"""Corpus-wide paragraph deduplication (CCNet §4.1, Wenzek et al.
2019, arXiv:1911.00359): remove every repeated paragraph from the
corpus, keeping only its FIRST occurrence (document order, then
position order) — the classic boilerplate / mirror-text scrub that
runs before language-ID in web pipelines.

The paragraph unit here is a fixed window of PARA_W consecutive
tokens (the synthetic corpus has no newline structure; real corpora
would split on '\\n\\n' — the unit extractor is the only line that
changes). Duplicates WITHIN a document also collapse to their first
occurrence, matching CCNet's hash-set semantics.

Scale shape (the 100-TB story):
- Pass A explodes docs to (chunk, packed-first-occurrence-key) rows
  with a MAP-SIDE MIN COMBINE per block, so a boilerplate chunk
  repeated a billion times contributes at most one row per block to
  the exchange — the groupby(chunk).min() reducer group is bounded by
  block count, never by occurrence count (no hot-key blowup).
- The winner set has exactly one row per DISTINCT chunk; it is
  re-exchanged ONCE by doc bucket together with a (doc_id, n_chunks)
  spine (one row per doc, from a cheap second scan of the pruned
  (doc_id, text) columns), and a vectorized pandas reducer reassembles
  clean_text per doc. Nothing corpus-sized ever reaches the driver.
- First-occurrence key: packed = doc_id * 2^20 + idx (int64), so
  min(packed) == lexicographic min(doc_id, idx). Documented bound:
  docs shorter than PARA_W * 2^20 tokens (a multi-GB single document
  would need a wider pack).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .io import read_documents

PARA_W = 2  # tokens per paragraph unit (see module docstring)
_IDX_LIMIT = 1 << 20
_DOC_BUCKETS = 64


def paragraph_dedup(sf_dir: str, w: int = PARA_W):
    """(doc_id, clean_text, n_kept, n_dropped): corpus-wide
    first-occurrence paragraph dedup over the documents table.
    clean_text is the doc's kept chunks in original order ('' when
    every chunk already appeared earlier in the corpus)."""
    from ..functions.exchange import bounded_group_map

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def explode_min(t: pa.Table) -> pa.Table:
        # vectorized chunking: flatten tokens once, derive each
        # token's packed chunk key arithmetically, ONE pandas
        # groupby-join builds the chunk strings (order-preserving)
        ids = np.asarray(t.column("doc_id"), np.int64)
        words = pc.split_pattern(t.column("text"), " ")
        lens = np.asarray(pc.list_value_length(words), np.int64)
        flat = pc.list_flatten(words).to_pandas()
        doc_of = np.repeat(np.arange(len(ids)), lens)
        offsets = np.zeros(len(ids) + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        pos = np.arange(len(flat), dtype=np.int64) - offsets[doc_of]
        packed = ids[doc_of] * _IDX_LIMIT + pos // w
        chunk = flat.groupby(packed, sort=False).agg(" ".join)
        # map-side min combine: <=1 row per distinct chunk per block
        m = (
            pd.DataFrame(
                {"chunk": chunk.to_numpy(), "packed": chunk.index.to_numpy()}
            )
            .groupby("chunk", sort=False)["packed"]
            .min()
            .reset_index()
        )
        return pa.Table.from_pandas(m, preserve_index=False)

    winners = (
        docs.map_batches(explode_min, batch_format="pyarrow")
        .groupby("chunk")
        .min("packed")
    )

    def winner_rows(t: pa.Table) -> pa.Table:
        packed = np.asarray(t.column("min(packed)"), np.int64)
        doc = packed // _IDX_LIMIT
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "idx": pa.array(packed % _IDX_LIMIT, pa.int64()),
                "chunk": t.column("chunk"),
                "n_chunks": pa.array(np.zeros(len(doc), np.int64)),
                "bucket": pa.array(
                    (doc % _DOC_BUCKETS).astype(np.int32), pa.int32()
                ),
            }
        )

    def spine_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"), np.int64)
        nw = np.asarray(
            pc.list_value_length(pc.split_pattern(t.column("text"), " ")),
            np.int64,
        )
        n_chunks = (nw + w - 1) // w
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "idx": pa.array(np.full(len(ids), -1, np.int64)),
                "chunk": pa.array([""] * len(ids), pa.string()),
                "n_chunks": pa.array(n_chunks, pa.int64()),
                "bucket": pa.array(
                    (ids % _DOC_BUCKETS).astype(np.int32), pa.int32()
                ),
            }
        )

    both = winners.map_batches(winner_rows, batch_format="pyarrow").union(
        docs.map_batches(spine_rows, batch_format="pyarrow")
    )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        spine = df[df["idx"] < 0].set_index("doc_id")["n_chunks"]
        kept = df[df["idx"] >= 0].sort_values(["doc_id", "idx"])
        agg = kept.groupby("doc_id").agg(
            clean_text=("chunk", " ".join), n_kept=("chunk", "size")
        )
        out = agg.reindex(spine.index)
        out["clean_text"] = out["clean_text"].fillna("")
        out["n_kept"] = out["n_kept"].fillna(0).astype(np.int64)
        out["n_dropped"] = spine - out["n_kept"]
        return out.reset_index()

    return bounded_group_map(both, "bucket", assemble, batch_format="pandas").map_batches(
        lambda t: t[["doc_id", "clean_text", "n_kept", "n_dropped"]],
        batch_format="pandas",
    )


PARAGRAPH_DEDUP_SQL = """WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
chunks AS (
  SELECT doc_id, pos // {w} AS idx,
         string_agg(word, ' ' ORDER BY pos) AS chunk
  FROM tok GROUP BY doc_id, pos // {w}
),
winner AS (
  SELECT chunk, min(doc_id * 1048576 + idx) AS wkey
  FROM chunks GROUP BY chunk
),
kept AS (
  SELECT c.doc_id, c.idx, c.chunk
  FROM chunks c
  JOIN winner wn ON c.chunk = wn.chunk
   AND c.doc_id * 1048576 + c.idx = wn.wkey
),
ndoc AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(string_agg(k.chunk, ' ' ORDER BY k.idx), '') AS clean_text,
       CAST(count(k.idx) AS BIGINT) AS n_kept,
       CAST(d.n_chunks - count(k.idx) AS BIGINT) AS n_dropped
FROM ndoc d LEFT JOIN kept k USING (doc_id)
GROUP BY d.doc_id, d.n_chunks
""".format(w=PARA_W)
