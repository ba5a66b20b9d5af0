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
groupby (vocabulary-sized, not corpus-sized). Scoring is tiered on
measured vocabulary size: below BROADCAST_MAX_VOCAB the model rides
the object store via ray.put with a per-worker deserialized cache
and the score pass is embarrassingly parallel; above it (web-scale
junk-token vocabularies) the model stays a Dataset and scoring is an
explode -> left-outer hash join -> per-doc re-aggregate — nothing
vocabulary-sized ever touches the driver. A forced-tier test pins
both tiers to identical output.
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


def _counts_ds(sf_dir: str):
    """Distributed unigram counts: map-side partial value_counts, then
    ONE vocabulary-sized groupby. Stays a Dataset."""
    return (
        read_documents(sf_dir, ["text"])
        .map_batches(_partial_counts, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
    )


def _bucketize(batch: pa.Table) -> pa.Table:
    b = np.floor(np.log2(np.asarray(batch.column("sum(n)"), np.float64)))
    return pa.table(
        {
            "word": batch.column("word"),
            "bucket": pa.array(b.astype(np.int64), pa.int64()),
        }
    )


def train_unigram(sf_dir: str) -> dict[str, int]:
    """{word: surprisal bucket}, collected once on the driver (the
    broadcast tier — vocabulary is tiny for natural language by Heaps'
    law; the >threshold tier in lm_score never builds this dict)."""
    counts = _counts_ds(sf_dir).to_pandas()
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


BROADCAST_MAX_VOCAB = 5_000_000  # dict tier cap (~hundreds of MB)


def _doc_word_counts(batch: pa.Table) -> pa.Table:
    """(doc_id, word, cnt): per-batch exploded tokens, pre-combined so
    repeated words in a doc ship as one row into the join."""
    words = pc.split_pattern(batch.column("text"), " ")
    lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
    ids = np.repeat(np.asarray(batch.column("doc_id"), np.int64), lens)
    flat = pc.list_flatten(words)
    ones = pa.array(np.ones(len(ids), dtype=np.int64), pa.int64())
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "word": flat, "cnt": ones}
    )
    g = t.group_by(["doc_id", "word"]).aggregate([("cnt", "sum")])
    return g.rename_columns(["doc_id", "word", "cnt"])


def lm_score(sf_dir: str, broadcast_max_vocab: int = BROADCAST_MAX_VOCAB):
    """(doc_id, n_words, lm_score, n_oov): surprisal-bucket sum per doc
    under a unigram model trained on the same corpus.

    Two score tiers on one count pass: vocabulary <= threshold rides
    the object store as a dict (ray.put once, per-worker cache);
    beyond it — web-scale junk-token vocabularies — the model STAYS a
    Dataset and scoring is explode -> left-outer hash join -> per-doc
    re-aggregate, so nothing vocabulary-sized touches the driver."""
    import ray

    if broadcast_max_vocab > 0:
        counts = _counts_ds(sf_dir).materialize()
        nvocab = counts.count()
    else:  # forced distributed tier (tests)
        counts, nvocab = _counts_ds(sf_dir), None

    if nvocab is not None and nvocab <= broadcast_max_vocab:
        df = counts.to_pandas()
        buckets = np.floor(np.log2(df["sum(n)"].to_numpy())).astype(np.int64)
        model_ref = ray.put(dict(zip(df["word"], buckets)))
        return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            _score_batch, fn_args=(model_ref,), batch_format="pyarrow"
        )

    from ray.data.aggregate import Sum

    model_ds = counts.map_batches(_bucketize, batch_format="pyarrow")
    tok = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _doc_word_counts, batch_format="pyarrow"
    )
    joined = tok.join(
        model_ds, join_type="left_outer", num_partitions=16, on=("word",)
    )

    def contrib(t: pa.Table) -> pa.Table:
        cnt = np.asarray(t.column("cnt"), np.int64)
        bucket = t.column("bucket")
        oov = np.asarray(pc.is_null(bucket), bool)
        b = np.asarray(pc.fill_null(bucket, 0), np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": pa.array(cnt, pa.int64()),
                "lm_score": pa.array(np.where(oov, 0, cnt * b), pa.int64()),
                "n_oov": pa.array(np.where(oov, cnt, 0), pa.int64()),
            }
        )

    return (
        joined.map_batches(contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("lm_score", alias_name="lm_score"),
            Sum("n_oov", alias_name="n_oov"),
        )
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


# ------------------------------------------------- CCNet-style buckets

PPL_BUCKETS = ("head", "middle", "tail")

# Per-token rarity cap: bounds the per-doc int64 sum even for a doc
# made entirely of hapaxes at web scale (1e4 tokens x 1e12 = 1e16,
# well inside int64). No word approaches it at test scales, so the
# oracle is unaffected; it exists for the 100-TB regime.
RARITY_CAP = 1_000_000_000_000


def _ppl_milli(score: np.ndarray, n_words: np.ndarray) -> np.ndarray:
    """Mean per-token rarity: score // n_words — pure int64 ops, so
    numpy and DuckDB's ``//`` agree bit-for-bit (all values
    non-negative; n_words >= 1 because splitting an empty string
    yields one empty token on both engines). 'milli' because the
    rarity unit already carries a x1000 scale factor."""
    return score // np.maximum(n_words, 1)


def perplexity_buckets(sf_dir: str):
    """(doc_id, lang, ppl_milli, bucket): CCNet-style per-language
    perplexity bucketing (Wenzek et al. 2019, arXiv:1911.00359 §4.4) —
    score every doc with a corpus unigram rarity model, then split
    each language into head/middle/tail at the 1/3 and 2/3
    k-th-order-statistic thresholds.

    The per-token score is integer IDF-style rarity
    ``min((1000*total_tokens) // corpus_count(word), RARITY_CAP)`` —
    monotone in true unigram surprisal -log(count/total) but computed
    entirely in int64, so the engine and the DuckDB oracle agree
    bit-for-bit (log-based scores quantize too coarsely: on a
    near-uniform vocabulary floor(log2(count)) is a constant and the
    bucketing degenerates). ppl_milli = doc rarity sum // n_words;
    HIGH = rare-token-heavy = high perplexity, so head (CCNet's
    lowest-perplexity third) is the BOTTOM third by value
    (ppl_milli <= t1).

    Ties sit entirely on one side of a threshold VALUE (CCNet's
    value-threshold semantics), so bucket sizes are ntile-approximate,
    never split mid-value — deterministic without any doc_id ranking.

    Scale shape: ONE text pass scores (broadcast unigram model — see
    lm_score's Heaps'-law argument); the threshold state is a
    (lang, ppl) VALUE histogram — bounded by #langs x #distinct
    integer ppl values, so collecting it on the driver is
    O(value-grid), not O(corpus); assignment is a second streaming
    pass against the broadcast {lang: (t1, t2)} dict (tiny)."""
    import ray

    df = _counts_ds(sf_dir).to_pandas()
    counts = df["sum(n)"].to_numpy(np.int64)
    total = int(counts.sum())
    rarity = np.minimum((1000 * total) // counts, RARITY_CAP)
    model_ref = ray.put(dict(zip(df["word"], rarity)))

    def score_with_lang(batch: pa.Table) -> pa.Table:
        out = _score_batch(batch, model_ref)
        s = np.asarray(out.column("lm_score"), np.int64)
        n = np.asarray(out.column("n_words"), np.int64)
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "lang": batch.column("lang"),
                "ppl_milli": pa.array(_ppl_milli(s, n), pa.int64()),
            }
        )

    scored = (
        read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(score_with_lang, batch_format="pyarrow")
        .materialize()  # 3 small columns; scored once, read twice
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["lang", "ppl_milli"])
            .group_by(["lang", "ppl_milli"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["lang", "ppl_milli", "n"])

    hist = (
        scored.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "ppl_milli"])
        .sum("n")
        .to_pandas()  # value-histogram-sized (see docstring)
    )

    thresholds: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("ppl_milli")  # head = LOW value (low perplexity)
        cum = g["sum(n)"].cumsum().to_numpy()
        vals = g["ppl_milli"].to_numpy()
        n = int(cum[-1])
        k1 = -(-n // 3)  # ceil(n/3)
        k2 = -(-2 * n // 3)
        t1 = int(vals[np.searchsorted(cum, k1)])
        t2 = int(vals[np.searchsorted(cum, k2)])
        thresholds[str(lang)] = (t1, t2)

    def assign(t: pa.Table, thr=thresholds) -> pa.Table:
        langs = t.column("lang").to_pylist()
        ppl = np.asarray(t.column("ppl_milli"), np.int64)
        t1 = np.fromiter((thr[l][0] for l in langs), np.int64, len(langs))
        t2 = np.fromiter((thr[l][1] for l in langs), np.int64, len(langs))
        bucket = np.where(ppl <= t1, "head", np.where(ppl <= t2, "middle", "tail"))
        return t.append_column("bucket", pa.array(bucket.tolist(), pa.string()))

    return scored.map_batches(assign, batch_format="pyarrow")


PERPLEXITY_BUCKETS_SQL = """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
model AS (
  SELECT word,
         least((1000 * (SELECT count(*) FROM tok)) // count(*),
               1000000000000) AS rarity
  FROM tok GROUP BY word
),
p AS (
  SELECT t.doc_id, d.lang,
         CAST(sum(m.rarity) // count(*) AS BIGINT) AS ppl_milli
  FROM tok t JOIN model m USING (word)
  JOIN documents d ON d.doc_id = t.doc_id
  GROUP BY t.doc_id, d.lang
),
r AS (
  SELECT lang, ppl_milli,
         row_number() OVER (PARTITION BY lang ORDER BY ppl_milli ASC) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM p
),
thr AS (
  SELECT lang,
         min(CASE WHEN rn >= CAST(ceil(n / 3.0) AS BIGINT)
                  THEN ppl_milli END) AS t1,
         min(CASE WHEN rn >= CAST(ceil(2 * n / 3.0) AS BIGINT)
                  THEN ppl_milli END) AS t2
  FROM r GROUP BY lang
)
SELECT p.doc_id, p.lang, p.ppl_milli,
       CASE WHEN p.ppl_milli <= t.t1 THEN 'head'
            WHEN p.ppl_milli <= t.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM p JOIN thr t USING (lang)
"""
