"""Per-document tf-idf keyword extraction — the topic/keyword tagging
stage of a corpus pipeline (doc-level metadata for retrieval filters,
clustering features, and dataset cards).

Integer-exact scoring (so the DuckDB oracle hash-matches):

    score(doc, term) = tf(doc, term) * floor(log2(N // df(term)))

``floor(log2(integer))`` is identical in IEEE double math (numpy /
DuckDB libm) for arguments far below 2^53 — the same exactness
argument as ops/lmscore.py's surprisal bucket. Top-K=5 terms per doc,
ties broken by term ASC (total order → deterministic).

Scale shape: the document-frequency pass is map-side per-doc-distinct
partial counts + ONE vocab-sized groupby (a doc's text lives in one
row, so per-block distinct-per-doc is globally exact); the
vocab-bounded idf map broadcasts once via ray.put (per-worker cache;
lmscore's explode→join tier is the junk-vocab escape hatch); scoring +
per-doc top-K is one streaming vectorized pass (top-K needs no
exchange at all — each doc is complete within its block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .io import read_documents

TOPK = 5

_IDF_CACHE: dict[str, dict] = {}


def _exploded(batch: pa.Table) -> pd.DataFrame:
    words = pc.split_pattern(batch.column("text"), " ")
    lens = np.asarray(pc.list_value_length(words), np.int64)
    flat = pc.list_flatten(words).to_pandas()
    ids = np.asarray(batch.column("doc_id"), np.int64)
    df = pd.DataFrame(
        {"doc_id": np.repeat(ids, lens), "term": flat.to_numpy()}
    )
    return df[df["term"] != ""]


def _partial_df(batch: pa.Table) -> pa.Table:
    g = (
        _exploded(batch)
        .drop_duplicates()
        .groupby("term", sort=False)
        .size()
        .rename("df")
        .reset_index()
    )
    g["df"] = g["df"].astype(np.int64)
    return pa.Table.from_pandas(g, preserve_index=False)


def tfidf_keywords(sf_dir: str, k: int = TOPK):
    """(doc_id, term, score, rank) — top-k tf-idf terms per document."""
    import pyarrow.parquet as pq
    import ray

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    dfc = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(_partial_df, batch_format="pyarrow")
        .groupby("term")
        .sum("df")
        .to_pandas()  # vocab-sized (broadcast tier)
    )
    idf = {
        t: int(np.floor(np.log2(n_docs // int(d))))
        for t, d in zip(dfc["term"], dfc["sum(df)"])
    }
    ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        key = ref.hex()
        if key not in _IDF_CACHE:
            _IDF_CACHE.clear()
            _IDF_CACHE[key] = ray.get(ref)
        model = _IDF_CACHE[key]
        tf = (
            _exploded(batch)
            .groupby(["doc_id", "term"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        tf["score"] = tf["tf"].to_numpy(np.int64) * tf["term"].map(
            model
        ).to_numpy(np.int64)
        top = tf.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True]
        ).groupby("doc_id", sort=False).head(k)
        top["rank"] = top.groupby("doc_id", sort=False).cumcount() + 1
        return pa.table(
            {
                "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(top["term"].to_numpy(), pa.string()),
                "score": pa.array(top["score"].to_numpy(), pa.int64()),
                "rank": pa.array(
                    top["rank"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


TFIDF_KEYWORDS_SQL = f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf
  FROM w WHERE term <> '' GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df
  FROM w WHERE term <> '' GROUP BY term
),
n AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
sc AS (
  SELECT doc_id, tf.term,
         tf.tf * CAST(floor(log2(n.n // df.df)) AS BIGINT) AS score
  FROM tf JOIN df ON tf.term = df.term, n
),
r AS (
  SELECT doc_id, term, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term
         )::BIGINT AS rank
  FROM sc
)
SELECT doc_id, term, score, rank FROM r WHERE rank <= {TOPK}"""
