"""Distributed trainable text classifier: logistic regression by
full-batch gradient descent, expressed as streaming Ray Data passes.

The supervised task is deterministic so a DuckDB oracle can mirror the
WHOLE training run: predict ``lang == 'en'`` on the documents table
from three exact character-statistic features (space fraction, vowel
fraction, normalized length). Init w = 0, LR_ITERS full-batch GD steps
at a fixed rate, and — the cross-engine determinism contract, same as
ops/clustering.CENT_ROUND — weights ROUNDED to W_ROUND decimals after
every update. Float64 summation-order drift between the Ray partial
sums and the SQL aggregate is ~1e-12 absolute, vastly below the 1e-6
grid, so both engines hold bit-identical weights at every step; the
final per-doc probability is rounded to P_ROUND decimals on both
sides.

Scale shape (the 100-TB story):
- Featurization is ONE streaming pass over the text (vectorized
  pyarrow.compute kernels) that immediately DROPS the text column —
  the materialized feature table is ~40 bytes/doc, so the 3 + 1
  subsequent passes (gradient iterations + scoring) never touch the
  100-TB corpus again.
- Each GD iteration is ONE pass over the feature table: map_batches
  emits a 5-number partial (sum of residuals, residual-weighted
  feature sums, count) per block; a Dataset ``sum`` reduces them and
  ONLY that single row reaches the driver. Driver state is the weight
  vector — 4 floats — captured by value in the next pass's closure
  (no broadcast machinery needed at this size).
- Nothing corpus-sized is collected; there is NO shuffle anywhere —
  gradient descent is embarrassingly map-reducible.

Graphiti has no trainable-model analog; this is one of the
beyond-the-reference LLM-training-data operators (brief: quality
scoring family) — the trainable sibling of ops/filtering.py's
heuristic quality_filter, the shape of a fastText-style quality
classifier (Joulin et al. 2016) with the embedding layer swapped for
deterministic features so the oracle stays exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .io import read_documents

LR_ITERS = 3  # full-batch GD steps
LR_RATE = 1.0  # fixed learning rate
W_ROUND = 6  # weight quantization grid (decimal places)
P_ROUND = 4  # output probability rounding
POS_LANG = "en"  # positive class


def _featurize(batch: pa.Table) -> pa.Table:
    """(doc_id, y, x1, x2, x3): exact integer counts -> exact float64
    ratios, mirrored 1:1 by the SQL feature CTE."""
    import pyarrow.compute as pc

    text = batch.column("text")
    n = pc.utf8_length(text).cast(pa.float64())
    spaces = pc.subtract(
        pc.utf8_length(text),
        pc.utf8_length(pc.replace_substring(text, " ", "")),
    ).cast(pa.float64())
    vowels = pc.count_substring_regex(text, "[aeiou]").cast(pa.float64())
    denom = pc.add(n, 1.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "y": pc.equal(batch.column("lang"), POS_LANG).cast(pa.float64()),
            "x1": pc.divide(spaces, denom),
            "x2": pc.divide(vowels, denom),
            "x3": pc.divide(n, 256.0),
        }
    )


def _margin(t: dict[str, np.ndarray], w: np.ndarray) -> np.ndarray:
    """z = ((b + w1*x1) + w2*x2) + w3*x3 — explicit left-to-right
    association so numpy and DuckDB (left-associative ``+``) run the
    identical IEEE op sequence on identical operands."""
    return ((w[0] + w[1] * t["x1"]) + w[2] * t["x2"]) + w[3] * t["x3"]


def _cols(batch: pa.Table) -> dict[str, np.ndarray]:
    return {
        c: batch.column(c).to_numpy(zero_copy_only=False)
        for c in ("y", "x1", "x2", "x3")
    }


def _fit(feats_ds) -> np.ndarray:
    """LR_ITERS full-batch GD steps. Each step is one streaming pass:
    per-block 5-number partials -> one summed row -> driver update."""
    w = np.zeros(4, dtype=np.float64)
    for _ in range(LR_ITERS):
        w_now = w.copy()  # capture by value, not loop variable

        def partial(batch: pa.Table, w_now=w_now) -> pa.Table:
            t = _cols(batch)
            e = 1.0 / (1.0 + np.exp(-_margin(t, w_now))) - t["y"]
            return pa.table(
                {
                    "g0": pa.array([float(e.sum())]),
                    "g1": pa.array([float((e * t["x1"]).sum())]),
                    "g2": pa.array([float((e * t["x2"]).sum())]),
                    "g3": pa.array([float((e * t["x3"]).sum())]),
                    "n": pa.array([len(e)], pa.int64()),
                }
            )

        agg = feats_ds.map_batches(partial, batch_format="pyarrow").sum(
            ["g0", "g1", "g2", "g3", "n"]
        )
        g = np.array(
            [agg["sum(g0)"], agg["sum(g1)"], agg["sum(g2)"], agg["sum(g3)"]]
        )
        w = np.round(w - LR_RATE * g / float(agg["sum(n)"]), W_ROUND)
    return w


def classifier_lr(sf_dir: str):
    """(doc_id, label, prob, pred): train on the full table, score the
    full table (the oracle contract is the training run itself; a
    held-out split is a trivial filter on either side)."""
    feats = (
        read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(_featurize, batch_format="pyarrow")
        .materialize()  # ~40 bytes/doc: all later passes skip the text
    )
    w = _fit(feats)

    def score(batch: pa.Table, w=w) -> pa.Table:
        t = _cols(batch)
        prob = np.round(1.0 / (1.0 + np.exp(-_margin(t, w))), P_ROUND)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "label": batch.column("y").cast(pa.int64()),
                "prob": pa.array(prob),
                "pred": pa.array(prob >= 0.5),
            }
        )

    return feats.map_batches(score, batch_format="pyarrow")


def logloss(sf_dir: str, iters: int) -> float:
    """Mean log-loss of the model after ``iters`` GD steps (driver
    helper for the learning-curve sanity test; one extra pass)."""
    global LR_ITERS
    feats = (
        read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(_featurize, batch_format="pyarrow")
        .materialize()
    )
    keep = LR_ITERS
    try:
        LR_ITERS = iters
        w = _fit(feats)
    finally:
        LR_ITERS = keep

    def part(batch: pa.Table) -> pa.Table:
        t = _cols(batch)
        p = 1.0 / (1.0 + np.exp(-_margin(t, w)))
        p = np.clip(p, 1e-12, 1 - 1e-12)
        ll = -(t["y"] * np.log(p) + (1 - t["y"]) * np.log(1 - p))
        return pa.table(
            {"s": pa.array([float(ll.sum())]), "n": pa.array([len(ll)], pa.int64())}
        )

    agg = feats.map_batches(part, batch_format="pyarrow").sum(["s", "n"])
    return float(agg["sum(s)"]) / float(agg["sum(n)"])


# ------------------------------------------------------- SQL mirror

def _classifier_lr_sql() -> str:
    feat = f"""feat AS (
  SELECT doc_id,
         CAST(lang = '{POS_LANG}' AS DOUBLE) AS y,
         (length(text) - length(replace(text, ' ', ''))) / (1.0 + length(text)) AS x1,
         (length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) / (1.0 + length(text)) AS x2,
         length(text) / 256.0 AS x3
  FROM documents),
w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    parts = [feat]
    for i in range(LR_ITERS):
        parts.append(
            f"""e{i} AS (
  SELECT f.y, f.x1, f.x2, f.x3,
         1.0 / (1.0 + exp(-(w.b + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))) - f.y AS e
  FROM feat f CROSS JOIN w{i} w),
g{i} AS (
  SELECT sum(e) AS g0, sum(e*x1) AS g1, sum(e*x2) AS g2, sum(e*x3) AS g3,
         count(*) AS n
  FROM e{i}),
w{i + 1} AS (
  SELECT round(w.b  - {LR_RATE} * g.g0 / g.n, {W_ROUND}) AS b,
         round(w.w1 - {LR_RATE} * g.g1 / g.n, {W_ROUND}) AS w1,
         round(w.w2 - {LR_RATE} * g.g2 / g.n, {W_ROUND}) AS w2,
         round(w.w3 - {LR_RATE} * g.g3 / g.n, {W_ROUND}) AS w3
  FROM w{i} w CROSS JOIN g{i} g)"""
        )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT f.doc_id, CAST(f.y AS BIGINT) AS label,
       round(1.0 / (1.0 + exp(-(w.b + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))), {P_ROUND}) AS prob,
       round(1.0 / (1.0 + exp(-(w.b + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))), {P_ROUND}) >= 0.5 AS pred
FROM feat f CROSS JOIN w{LR_ITERS} w"""


CLASSIFIER_LR_SQL = _classifier_lr_sql()
