"""Passage chunking — split each document into overlapping token
windows with deterministic ids: the retrieval-corpus prep stage every
RAG / dense-retrieval pipeline runs before embedding (fixed-size
passages with overlap so no answer span straddles a boundary
uncovered; cf. DPR, Karpukhin et al. 2020, 100-word passages).

Contract (mirrored in SQL): tokens = split(text, ' '); chunk starts
at every multiple of STRIDE below n_tokens (so a document always
yields >= 1 chunk, and tail chunks may be short); chunk text is the
space-join of tokens[start : start+WINDOW]; chunk_seq = start/STRIDE.

Scale shape: embarrassingly parallel — one streaming pass, no
exchange at all; output is ~n_tokens/STRIDE rows per doc. The
per-chunk work is a C-speed list-slice join (the Python loop is per
CHUNK, ~tokens/STRIDE iterations, not per token); everything around
it (token counts, chunk starts, doc replication) is vectorized
numpy/Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .io import read_documents

CHUNK_WINDOW = 16
CHUNK_STRIDE = 12


def _chunk_batch(batch: pa.Table) -> pa.Table:
    words = pc.split_pattern(batch.column("text"), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    n = np.maximum(n, 1).astype(np.int64)
    n_chunks = (n + CHUNK_STRIDE - 1) // CHUNK_STRIDE
    doc_rep = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    first = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    seq = np.arange(len(doc_rep), dtype=np.int64) - first
    start = seq * CHUNK_STRIDE
    end = np.minimum(start + CHUNK_WINDOW, n[doc_rep])
    ids = np.asarray(batch.column("doc_id"), np.int64)[doc_rep]
    wl = words.to_pylist()
    texts = [
        " ".join(wl[d][s:e]) for d, s, e in zip(doc_rep, start, end)
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_seq": pa.array(seq, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "n_tok": pa.array(end - start, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
        }
    )


def chunk_passages(sf_dir: str):
    """(doc_id, chunk_seq, start_tok, n_tok, chunk_text): overlapping
    token-window passages, WINDOW=16 / STRIDE=12."""
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _chunk_batch, batch_format="pyarrow"
    )


CHUNK_PASSAGES_SQL = f"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' '))::BIGINT AS n
  FROM documents
),
s AS (
  SELECT doc_id, ws, n,
         unnest(range(0, n, {CHUNK_STRIDE}))::BIGINT AS start_tok
  FROM t
)
SELECT doc_id, (start_tok // {CHUNK_STRIDE})::BIGINT AS chunk_seq,
       start_tok,
       (LEAST(start_tok + {CHUNK_WINDOW}, n) - start_tok)::BIGINT AS n_tok,
       array_to_string(ws[start_tok + 1 : start_tok + {CHUNK_WINDOW}], ' ')
         AS chunk_text
FROM s"""
