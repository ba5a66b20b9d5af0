"""Planted-duplicate corpora, derived deterministically from the driver
tables so dedup operators have non-trivial, oracle-checkable work.

Two corpora, each with an EXACT SQL mirror (the CTE fragments below):

- ``docs_with_dups``: documents ∪ exact copies (doc_id % 7 == 0,
  id + 10M) ∪ near copies (doc_id % 5 == 0, id + 20M, text truncated to
  the first ⌊3n/4⌋ whitespace words).
- ``embeddings_with_dups``: embeddings ∪ identical-vector copies
  (vec_id % 10 == 0, id + 1M) — cosine exactly 1.0 to their source,
  while the max natural pair similarity in the synthetic table is
  ~0.6, so a 0.9 threshold is float-noise-safe.

Derivations use only arithmetic on (id, text/embedding), identical in
Python and DuckDB: `words[:k]` == `w[1:k]` (1-based inclusive slice).
"""

from __future__ import annotations

import pyarrow as pa
from .io import read_documents, read_embeddings

EXACT_MOD, EXACT_OFF = 7, 10_000_000
NEAR_MOD, NEAR_OFF = 5, 20_000_000
VEC_MOD, VEC_OFF = 10, 1_000_000

# SQL mirror of docs_with_dups (DuckDB CTE body; tables pre-registered).
DOCS_WITH_DUPS_CTE = f"""
corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + {EXACT_OFF}, text, lang FROM documents WHERE doc_id % {EXACT_MOD} = 0
  UNION ALL
  SELECT doc_id + {NEAR_OFF},
         array_to_string(w[1:greatest(1, (len(w)*3)//4)], ' '),
         lang
  FROM (SELECT doc_id, string_split(text, ' ') AS w, lang FROM documents)
  WHERE doc_id % {NEAR_MOD} = 0
)
"""

EMBEDDINGS_WITH_DUPS_CTE = f"""
vecs AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {VEC_OFF}, embedding FROM embeddings WHERE vec_id % {VEC_MOD} = 0
)
"""



def truncate_words(text: str) -> str:
    w = text.split(" ")
    return " ".join(w[: max(1, (len(w) * 3) // 4)])


def _plant_doc_dups(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    out_id, out_text, out_lang = list(ids), list(texts), list(langs)
    for i, t, lg in zip(ids, texts, langs):
        if i % EXACT_MOD == 0:
            out_id.append(i + EXACT_OFF)
            out_text.append(t)
            out_lang.append(lg)
        if i % NEAR_MOD == 0:
            out_id.append(i + NEAR_OFF)
            out_text.append(truncate_words(t))
            out_lang.append(lg)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
        }
    )


def docs_with_dups(sf_dir: str):
    """documents ∪ planted exact/near duplicates (column-pruned read)."""
    import ray.data as rd

    return read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(_plant_doc_dups, batch_format="pyarrow")


def _plant_vec_dups(batch: pa.Table) -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(ids % VEC_MOD == 0)
    if keep.size == 0:
        # NB: batch.take([]) would crash — an empty Python list infers a
        # null-typed indices array ("array_take has no kernel matching
        # (int64, null)"); small blocks legitimately contain no planted
        # ids, so this early-out is required, not just an optimization.
        return batch
    dup = batch.take(pa.array(keep, pa.int64()))
    dup = dup.set_column(
        dup.schema.get_field_index("vec_id"),
        "vec_id",
        pc.add(dup.column("vec_id"), VEC_OFF),
    )
    return pa.concat_tables([batch, dup])


def embeddings_with_dups(sf_dir: str):
    import ray.data as rd

    return read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(_plant_vec_dups, batch_format="pyarrow")
