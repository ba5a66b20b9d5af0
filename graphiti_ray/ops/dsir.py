"""DSIR-style data selection with importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169) — select raw-corpus documents whose unigram feature
distribution looks like a TARGET distribution.

Deterministic, integer-exact variant (so the DuckDB oracle
hash-matches): the per-word importance factor is the LINEAR
likelihood ratio quantized to int64,

    lam(w) = (1000 * count_target(w) * total_raw)
             // (count_raw(w) * total_target)

(1000 ≈ p_target(w)/p_raw(w) in milli-units; DSIR's log-ratio is a
monotone per-word transform of this — the paper's Gumbel resampling
is replaced here by deterministic top-quantile selection, CCNet-style
value thresholds, so ties never straddle the cut). A document's score
is its mean per-token factor, dsir_milli = sum(lam) // n_words, and
``selected`` marks the top SELECT_FRAC of the corpus by value.

Target definition: documents with ``lang == TARGET_LANG`` stand in
for the curated target corpus (wiki/books in the paper); a real
deployment passes any predicate or a second table.

Scale shape: ONE count pass produces BOTH models' counts
(vocab-sized groupby, map-side partial); lam is built driver-side in
arbitrary-precision Python ints over the vocab (Heaps'-law bounded —
same broadcast-tier argument as ops/lmscore.lm_score, whose
distributed tier is the escape hatch for junk-token vocabularies) and
broadcast once via ray.put; scoring is one streaming pass; the
selection threshold comes from a VALUE histogram (O(distinct
dsir_milli values) driver state, not O(corpus)); assignment is a
second streaming pass over the 3-column materialized scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .io import read_documents
from .lmscore import _ppl_milli, _score_batch

TARGET_LANG = "en"
SELECT_FRAC = 4  # keep the top 1/SELECT_FRAC of docs by value


def _partial_counts_two(batch: pa.Table) -> pa.Table:
    """(word, n_raw, n_tgt) per block — both models in one pass."""
    words = pc.split_pattern(batch.column("text"), " ")
    lens = np.asarray(pc.list_value_length(words), np.int64)
    is_t = np.asarray(
        pc.equal(batch.column("lang"), TARGET_LANG), bool
    )
    flat = pc.list_flatten(words).to_pandas()
    tgt = np.repeat(is_t, lens).astype(np.int64)
    g = (
        pd.DataFrame({"word": flat, "n_tgt": tgt})
        .groupby("word", sort=False)
        .agg(n_raw=("n_tgt", "size"), n_tgt=("n_tgt", "sum"))
        .reset_index()
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def dsir_select(sf_dir: str):
    """(doc_id, dsir_milli, selected) over the documents table."""
    import ray

    counts = (
        read_documents(sf_dir, ["text", "lang"])
        .map_batches(_partial_counts_two, batch_format="pyarrow")
        .groupby("word")
        .sum(["n_raw", "n_tgt"])
        .to_pandas()  # vocab-sized (broadcast tier)
    )
    total_r = int(counts["sum(n_raw)"].sum())
    total_t = int(counts["sum(n_tgt)"].sum())
    # arbitrary-precision driver ints: no overflow at any corpus size
    lam = {
        w: (1000 * int(ct) * total_r) // (int(cr) * total_t)
        for w, cr, ct in zip(
            counts["word"], counts["sum(n_raw)"], counts["sum(n_tgt)"]
        )
    }
    model_ref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        out = _score_batch(batch, model_ref)
        s = np.asarray(out.column("lm_score"), np.int64)
        n = np.asarray(out.column("n_words"), np.int64)
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "dsir_milli": pa.array(_ppl_milli(s, n), pa.int64()),
            }
        )

    scored = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .materialize()  # 2 small columns; read twice
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["dsir_milli"])
            .group_by(["dsir_milli"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["dsir_milli", "n"])

    hist = (
        scored.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("dsir_milli")
        .sum("n")
        .to_pandas()
        .sort_values("dsir_milli", ascending=False)  # keep HIGH values
    )
    cum = hist["sum(n)"].cumsum().to_numpy()
    vals = hist["dsir_milli"].to_numpy()
    n = int(cum[-1])
    k = -(-n // SELECT_FRAC)  # ceil(n / SELECT_FRAC)
    thr = int(vals[np.searchsorted(cum, k)])

    def assign(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("dsir_milli"), np.int64)
        return t.append_column(
            "selected", pa.array(v >= thr, pa.bool_())
        )

    return scored.map_batches(assign, batch_format="pyarrow")


DSIR_SELECT_SQL = """WITH tok AS (
  SELECT d.doc_id, d.lang,
         unnest(string_split(d.text, ' ')) AS word
  FROM documents d
),
cnt AS (
  SELECT word, count(*) AS c_r,
         sum(CASE WHEN lang = '{tgt}' THEN 1 ELSE 0 END) AS c_t
  FROM tok GROUP BY word
),
tot AS (
  SELECT sum(c_r) AS total_r, sum(c_t) AS total_t FROM cnt
),
model AS (
  SELECT word,
         (1000 * c_t * total_r) // (c_r * total_t) AS lam
  FROM cnt, tot
),
w AS (
  SELECT t.doc_id,
         CAST(sum(m.lam) // count(*) AS BIGINT) AS dsir_milli
  FROM tok t JOIN model m USING (word)
  GROUP BY t.doc_id
),
r AS (
  SELECT doc_id, dsir_milli,
         row_number() OVER (ORDER BY dsir_milli DESC) AS rn,
         count(*) OVER () AS n
  FROM w
),
thr AS (
  SELECT min(CASE WHEN rn = CAST(ceil(n / {frac}.0) AS BIGINT)
                  THEN dsir_milli END) AS t
  FROM r
)
SELECT w.doc_id, w.dsir_milli, w.dsir_milli >= thr.t AS selected
FROM w, thr
""".format(tgt=TARGET_LANG, frac=SELECT_FRAC)
