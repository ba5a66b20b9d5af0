"""Collocation extraction — within-document term co-occurrence LIFT
over the top-V document-frequency vocabulary (the association-mining /
PMI family: Church & Hanks 1990 word association norms; lift is PMI
without the log, kept rational so integer arithmetic is exact on both
engines):

    lift_milli(a, b) = (1000 * N * df_ab) // (df_a * df_b)

where df_x = documents containing x, df_ab = documents containing
both, N = corpus size. lift > 1000 means a and b co-occur more than
independence predicts.

Vocabulary cap is the scale contract: pair enumeration is quadratic
per document, so it runs only over the TOP-V df terms (V = 16 here;
production sizes V to the budget — pairs per doc ≤ C(V,2) regardless
of corpus size). Selection is deterministic: (df DESC, word ASC).

Scale shape: pass A streams once to per-block DISTINCT (doc, term)
partials → ONE term-sized groupby for df; top-V is a map-side partial
top-k + driver finalize over ≤ V×blocks rows (the domain_cap
pattern), never a full-vocab collect. V and df ride along in a
broadcast dict (ray.put, vocab-sized). Pass B streams once more:
per-doc distinct vocab-term sets → vectorized triu pair expansion →
per-block partial pair counts → ONE ≤C(V,2)-sized groupby. int64
bound: 1000·N·df_ab needs N·df_ab < 9.2e15 — fine to ~10^7 docs at
full overlap; beyond that production scales lift to basis points or
HUGEINT (documented, same family as ops/packing's HUGEINT fix).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .io import read_documents
from .textstats import _explode_words

COLLOC_V = 16


def _distinct_doc_terms(batch: pa.Table) -> pd.DataFrame:
    row_idx, flat, _ = _explode_words(batch)
    return (
        pd.DataFrame({"r": row_idx, "word": flat})
        .drop_duplicates()
        .reset_index(drop=True)
    )


def collocations(sf_dir: str, v: int = COLLOC_V):
    """(w1, w2, n_both, df1, df2, lift_milli) for all observed pairs
    of top-``v``-df terms (w1 < w2 lexicographically)."""
    import ray

    docs = read_documents(sf_dir, ["doc_id", "text"]).materialize()
    n_docs = docs.count()

    # pass A: document frequency per term (distinct-per-doc partials)
    def df_partial(batch: pa.Table) -> pa.Table:
        dt = _distinct_doc_terms(batch)
        c = dt.groupby("word", sort=False).size().reset_index(name="df")
        return pa.table(
            {
                "word": pa.array(c["word"], pa.string()),
                "df": pa.array(c["df"].to_numpy(), pa.int64()),
            }
        )

    dfc = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("word")
        .sum("df")
    )

    # top-V: map-side partial top-k, driver finalize over <= V x blocks
    def local_top(t: pa.Table) -> pa.Table:
        d = t.to_pandas().rename(columns={"sum(df)": "df"})
        d = d.sort_values(["df", "word"], ascending=[False, True]).head(v)
        return pa.Table.from_pandas(d, preserve_index=False)

    cand = dfc.map_batches(local_top, batch_format="pyarrow").to_pandas()
    vocab = (
        cand.sort_values(["df", "word"], ascending=[False, True])
        .head(v)
        .reset_index(drop=True)
    )
    vmap = {
        w: (i, int(d)) for i, (w, d) in enumerate(zip(vocab["word"], vocab["df"]))
    }
    vref = ray.put(vmap)

    # pass B: per-doc vocab-term sets -> vectorized triu pair expansion
    # (runs grouped by set size, np.bincount into a V*V accumulator —
    # no per-doc Python loop; the loop below is over DISTINCT set
    # sizes, <= V iterations per block)
    def pair_partial(batch: pa.Table) -> pa.Table:
        vm = ray.get(vref)
        dt = _distinct_doc_terms(batch)
        dt = dt[dt["word"].isin(vm)]
        acc = np.zeros(v * v, np.int64)
        if len(dt):
            idx = dt["word"].map(lambda w: vm[w][0]).to_numpy(np.int64)
            r = dt["r"].to_numpy(np.int64)
            order = np.lexsort((idx, r))
            r, idx = r[order], idx[order]
            starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
            lens = np.diff(np.r_[starts, len(r)])
            for ln in np.unique(lens):
                if ln < 2:
                    continue
                sel = starts[lens == ln]
                mat = idx[sel[:, None] + np.arange(ln)[None, :]]
                a, b = np.triu_indices(ln, k=1)
                acc += np.bincount(
                    (mat[:, a] * v + mat[:, b]).ravel(), minlength=v * v
                )
        nz = np.flatnonzero(acc)
        return pa.table(
            {
                "i": pa.array(nz // v, pa.int64()),
                "j": pa.array(nz % v, pa.int64()),
                "n_both": pa.array(acc[nz], pa.int64()),
            }
        )

    pairs = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .sum("n_both")
    )

    id2w = vocab["word"].to_numpy()
    id2df = vocab["df"].to_numpy().astype(np.int64)

    def finish(t: pa.Table) -> pa.Table:
        i = np.asarray(t.column("i"), np.int64)
        j = np.asarray(t.column("j"), np.int64)
        nb = np.asarray(t.column("sum(n_both)"), np.int64)
        w1 = id2w[i]
        w2 = id2w[j]
        # pair ids were index-ordered; output contract is lexicographic
        swap = w1 > w2
        w1s = np.where(swap, w2, w1)
        w2s = np.where(swap, w1, w2)
        d1 = np.where(swap, id2df[j], id2df[i])
        d2 = np.where(swap, id2df[i], id2df[j])
        lift = 1000 * n_docs * nb // (d1 * d2)
        return pa.table(
            {
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
                "n_both": pa.array(nb, pa.int64()),
                "df1": pa.array(d1, pa.int64()),
                "df2": pa.array(d2, pa.int64()),
                "lift_milli": pa.array(lift, pa.int64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


COLLOCATIONS_SQL = f"""WITH dt AS (
  SELECT DISTINCT doc_id, u.wd AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       unnest(ws) AS u(wd)
),
dfr AS (SELECT word, COUNT(*)::BIGINT AS df FROM dt GROUP BY word),
nn AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
v AS (SELECT word, df FROM dfr ORDER BY df DESC, word ASC LIMIT {COLLOC_V}),
pr AS (
  SELECT a.word AS w1, b.word AS w2, COUNT(*)::BIGINT AS n_both
  FROM dt a
  JOIN dt b ON b.doc_id = a.doc_id AND a.word < b.word
  JOIN v va ON va.word = a.word
  JOIN v vb ON vb.word = b.word
  GROUP BY 1, 2
)
SELECT pr.w1, pr.w2, pr.n_both, va.df AS df1, vb.df AS df2,
       ((1000 * nn.n * pr.n_both) // (va.df * vb.df))::BIGINT AS lift_milli
FROM pr
JOIN v va ON va.word = pr.w1
JOIN v vb ON vb.word = pr.w2, nn"""
