"""Statistical LM quality scoring: train a unigram model on the corpus
(distributed count pass), broadcast it, score every document by token
surprisal (streaming score pass) — the classic train-then-score shape
of perplexity-based quality filters (CCNet-style), expressed without
floats so the DuckDB oracle hash-matches exactly.

Surprisal bucket: ``floor(log2(corpus_count(word)))`` — an integer for
every count >= 1, identical in IEEE double math (numpy / DuckDB log2)
for counts far below 2^53. A document's score is the sum of its
tokens' buckets; low totals = rare-token-heavy (suspicious) docs, high
totals = common-token prose. ``n_oov`` counts tokens outside the model
vocabulary (always 0 when model and corpus coincide; nonzero when
scoring a corpus against a model trained elsewhere).

Scale shape: the count pass is a map-side partial count + one small
groupby (vocabulary-sized, not corpus-sized); the model rides the
object store via ray.put; the score pass is embarrassingly parallel
with a per-worker deserialized-model cache. Vocabulary at web scale
exceeds a broadcast dict — that tier routes through
stages/joins.lookup_column's shard path; the cutover is documented,
not silently assumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .io import read_documents

# per-worker cache of the deserialized (vocab -> bucket) model
_MODEL_CACHE: dict[str, dict] = {}


def _partial_counts(batch: pa.Table) -> pa.Table:
    words = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(words)
    vc = pc.value_counts(flat)
    return pa.table(
        {
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def train_unigram(sf_dir: str) -> dict[str, int]:
    """Distributed unigram counts -> {word: surprisal bucket}. The
    groupby output is vocabulary-sized (tiny for natural language:
    heaps law), collected once on the driver."""
    counts = (
        read_documents(sf_dir, ["text"])
        .map_batches(_partial_counts, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
        .to_pandas()
    )
    buckets = np.floor(np.log2(counts["sum(n)"].to_numpy())).astype(np.int64)
    return dict(zip(counts["word"], buckets))


def _score_batch(batch: pa.Table, model_ref) -> pa.Table:
    import ray

    key = model_ref.hex()
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = ray.get(model_ref)
        _MODEL_CACHE.clear()
        _MODEL_CACHE[key] = model
    words = pc.split_pattern(batch.column("text"), " ")
    n_words = np.asarray(pc.list_value_length(words), dtype=np.int64)
    flat = pc.list_flatten(words).to_pylist()
    scores = np.fromiter(
        (model.get(w, -1) for w in flat), dtype=np.int64, count=len(flat)
    )
    oov = scores < 0
    offsets = np.zeros(len(n_words) + 1, dtype=np.int64)
    np.cumsum(n_words, out=offsets[1:])
    padded = np.append(np.where(oov, 0, scores), 0)
    doc_score = np.add.reduceat(padded, offsets[:-1]) * (n_words > 0)
    padded_oov = np.append(oov.astype(np.int64), 0)
    n_oov = np.add.reduceat(padded_oov, offsets[:-1]) * (n_words > 0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "lm_score": pa.array(doc_score, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
        }
    )


def lm_score(sf_dir: str):
    """(doc_id, n_words, lm_score, n_oov): surprisal-bucket sum per doc
    under a unigram model trained on the same corpus."""
    import ray

    model_ref = ray.put(train_unigram(sf_dir))
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _score_batch, fn_args=(model_ref,), batch_format="pyarrow"
    )


LM_SCORE_SQL = """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
model AS (
  SELECT word, CAST(floor(log2(count(*))) AS BIGINT) AS bucket
  FROM tok GROUP BY word
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(m.bucket) AS BIGINT) AS lm_score,
       CAST(0 AS BIGINT) AS n_oov
FROM tok t JOIN model m USING (word)
GROUP BY t.doc_id
"""
