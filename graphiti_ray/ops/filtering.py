"""Corpus filtering ops: C4/Gopher-style quality heuristics and
benchmark decontamination — the two filters every web-scale
training-data pipeline runs between dedup and packaging.

Both are embarrassingly parallel at 100 TB: column-pruned reads, one
``map_batches`` pass, no shuffle. Decontamination's benchmark side is
the canonical broadcast-small-side pattern — the benchmark suite is
tiny by construction (eval sets, not the corpus), collected once on
the driver and shipped to every task via ``ray.put``.

The synthetic corpus carries no natural benchmark contamination, so a
deterministic plant (arithmetic on doc_id only, mirrored in the DuckDB
oracle CTE) makes the work real, following ops/corpus.py's pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from .io import read_documents

# ---------------------------------------------------------------- quality

# Thresholds sit inside the synthetic corpus's observed distributions
# (n_words 10-99, stop ratio 0-0.22, mean word len 3.7-5.3 at sf0.01)
# so every rule rejects a real slice — a filter that passes or fails
# everything proves nothing.
MIN_WORDS, MAX_WORDS = 20, 90
MIN_STOP_RATIO = 0.02
MIN_MEAN_WLEN, MAX_MEAN_WLEN = 3.0, 5.0
STOPWORDS = ("a", "the")  # the synthetic vocabulary's function words



def _quality_batch(batch: pa.Table) -> pa.Table:
    txt = batch.column("text")
    words = pc.split_pattern(txt, " ")  # split(' ') == SQL string_split
    n_words = np.asarray(pc.list_value_length(words), dtype=np.int64)
    # per-row stopword count: flatten once, one is_in kernel, reduceat
    flat = pc.list_flatten(words)
    stop_mask = np.asarray(
        pc.is_in(flat, value_set=pa.array(STOPWORDS, pa.string()))
    ).astype(np.int64)
    offsets = np.zeros(len(n_words) + 1, dtype=np.int64)
    np.cumsum(n_words, out=offsets[1:])
    n_stop = np.add.reduceat(
        np.append(stop_mask, 0), offsets[:-1]
    ) * (n_words > 0)
    # mean word length from total non-space chars (single-space corpus)
    n_chars = np.asarray(pc.utf8_length(txt), dtype=np.int64)
    wchars = n_chars - (n_words - 1)
    mean_wlen = wchars / np.maximum(n_words, 1)
    stop_ratio = n_stop / np.maximum(n_words, 1)
    keep = (
        (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS)
        & (stop_ratio >= MIN_STOP_RATIO)
        & (mean_wlen >= MIN_MEAN_WLEN)
        & (mean_wlen <= MAX_MEAN_WLEN)
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "mean_word_len": pa.array(mean_wlen, pa.float64()),
            "keep": pa.array(keep),
        }
    )


def quality_filter(sf_dir: str):
    """Per-doc quality flags + keep decision (word-count bounds,
    stopword-ratio floor, mean-word-length band) — the rule set of
    C4's heuristic filters, computed with pyarrow/numpy kernels."""
    import ray.data as rd

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(_quality_batch, batch_format="pyarrow")


QUALITY_FILTER_SQL = f"""WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
)
SELECT doc_id,
  CAST(len(ws) AS BIGINT) AS n_words,
  CAST(len(list_filter(ws, x -> x IN ('a', 'the'))) AS BIGINT)
    AS n_stopwords,
  CAST(length(text) - (len(ws) - 1) AS DOUBLE) / len(ws)
    AS mean_word_len,
  ( len(ws) BETWEEN {MIN_WORDS} AND {MAX_WORDS}
    AND CAST(len(list_filter(ws, x -> x IN ('a', 'the'))) AS DOUBLE)
        / len(ws) >= {MIN_STOP_RATIO}
    AND (CAST(length(text) - (len(ws) - 1) AS DOUBLE) / len(ws))
        BETWEEN {MIN_MEAN_WLEN} AND {MAX_MEAN_WLEN}
  ) AS keep
FROM w
"""


# ---------------------------------------------------------- decontaminate

BENCH_MOD = 97  # every 97th doc donates its opening 8-gram to the "benchmark"
NGRAM_N = 8
PLANT_MOD, PLANT_RES = 13, 5  # docs with doc_id % 13 == 5 get contaminated
PLANT_PICK = 4  # ...with the n-gram of bench doc 97 * (doc_id % 4)


def _bench_ngrams(sf_dir: str) -> dict[int, str]:
    """The benchmark n-gram table: tiny by construction (an eval suite,
    not a corpus) — one pruned+filtered read, collected on the driver."""
    import ray.data as rd

    def pick(t: pa.Table) -> pa.Table:
        ids_np = np.asarray(t.column("doc_id"))
        t = t.filter(pa.array(ids_np % BENCH_MOD == 0))
        ids, grams = [], []
        for i, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            ws = txt.split(" ")
            if len(ws) >= NGRAM_N:
                ids.append(i)
                grams.append(" ".join(ws[:NGRAM_N]))
        return pa.table(
            {"bench_id": pa.array(ids, pa.int64()),
             "ngram": pa.array(grams, pa.string())}
        )

    df = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    return dict(zip(df["bench_id"], df["ngram"]))


# per-worker cache of the deserialized benchmark state: stateless TASKS
# reuse long-lived worker processes, so ray.get + tuple-set construction
# happen once per worker, not once per task — and unlike an actor pool
# there is no per-query actor-process startup tax (the pool shape only
# pays for itself when __init__ loads something heavier than the
# queries themselves; see ops/multimodal.PayloadDecoder for that case).
_BENCH_CACHE: dict[str, tuple[dict, set]] = {}


def _decon_batch(batch: pa.Table, bench_ref) -> pa.Table:
    import ray

    key = bench_ref.hex()
    state = _BENCH_CACHE.get(key)
    if state is None:
        bench = ray.get(bench_ref)
        state = (bench, {tuple(g.split(" ")) for g in bench.values()})
        _BENCH_CACHE.clear()  # one benchmark live at a time
        _BENCH_CACHE[key] = state
    by_id, tuples = state
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    n_hits, contaminated = [], []
    for i, txt in zip(ids, texts):
        if i % PLANT_MOD == PLANT_RES:
            planted = by_id.get(BENCH_MOD * (i % PLANT_PICK))
            if planted is not None:
                txt = txt + " " + planted
        ws = txt.split(" ")
        seen = {
            tuple(ws[j : j + NGRAM_N])
            for j in range(len(ws) - NGRAM_N + 1)
        } & tuples
        n_hits.append(len(seen))
        contaminated.append(bool(seen))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_hits": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array(contaminated),
        }
    )


def decontaminate(sf_dir: str):
    """Benchmark decontamination: flag docs sharing any word-boundary
    8-gram with the benchmark set (the Brown et al. GPT-3 appendix-C
    recipe). Benchmark side broadcast once via ray.put; corpus side one
    streaming pass of stateless tasks with a per-worker benchmark
    cache."""
    import ray
    import ray.data as rd

    bench_ref = ray.put(_bench_ngrams(sf_dir))
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _decon_batch,
        fn_args=(bench_ref,),
        batch_format="pyarrow",
    )


DECONTAMINATE_SQL = f"""WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
),
bench AS (
  SELECT doc_id AS bench_id,
         array_to_string(ws[1:{NGRAM_N}], ' ') AS ngram
  FROM w WHERE doc_id % {BENCH_MOD} = 0 AND len(ws) >= {NGRAM_N}
),
planted AS (
  SELECT d.doc_id,
    CASE WHEN d.doc_id % {PLANT_MOD} = {PLANT_RES} AND b.ngram IS NOT NULL
         THEN d.text || ' ' || b.ngram ELSE d.text END AS text
  FROM documents d
  LEFT JOIN bench b ON b.bench_id = {BENCH_MOD} * (d.doc_id % {PLANT_PICK})
)
SELECT p.doc_id,
  CAST((SELECT count(DISTINCT b.ngram) FROM bench b
        WHERE contains(' ' || p.text || ' ', ' ' || b.ngram || ' '))
       AS BIGINT) AS n_hits,
  (SELECT count(*) FROM bench b
   WHERE contains(' ' || p.text || ' ', ' ' || b.ngram || ' ')) > 0
    AS contaminated
FROM planted p
"""
