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


def _pick_bench(t: pa.Table) -> pa.Table:
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


def benchmark_ngrams_ds(sf_dir: str, benchmark_path: str | None = None):
    """The benchmark n-gram table as a Dataset of (bench_id, ngram).

    ``benchmark_path``: parquet of an EXTERNAL benchmark suite with that
    schema — the production shape (a real eval suite lives outside the
    corpus). Default: the deterministic 1/97 carve of the corpus itself
    (the synthetic stand-in, mirrored by the oracle CTE). Either way the
    table stays distributed — nothing collects here."""
    import ray.data as rd

    if benchmark_path is not None:
        return rd.read_parquet(benchmark_path, columns=["bench_id", "ngram"])
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _pick_bench, batch_format="pyarrow"
    )


def write_benchmark_parquet(sf_dir: str, out_dir: str | None = None) -> str:
    """Materialize the synthetic benchmark carve to parquet so callers
    can exercise the external-benchmark path (queries() does this)."""
    import os
    import shutil

    from ..functions.hashing import sha1_hex

    if out_dir is None:
        out_dir = os.path.join(
            "/tmp/graphiti_ray_benchmarks", sha1_hex("bench", sf_dir)
        )
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    benchmark_ngrams_ds(sf_dir).write_parquet(out_dir)
    with open(marker, "w"):
        pass
    return out_dir


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
        ids_np, grams = ray.get(bench_ref)
        by_id = dict(zip(ids_np.tolist(), grams))
        state = (by_id, {tuple(g.split(" ")) for g in grams})
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


def _collect_benchmark(bench_ds, max_bytes: int):
    """Byte-capped driver collect of the benchmark table: raises
    _BroadcastTooBig mid-stream if the benchmark is not actually the
    tiny eval suite it is supposed to be (the round-3 version built an
    UN-capped driver dict that grew with the synthetic carve's corpus
    — the exact anti-pattern stages/joins documents)."""
    from ..stages.joins import _iter_mapping_batches

    ids: list[np.ndarray] = []
    grams: list[str] = []
    for batch in _iter_mapping_batches(bench_ds, "bench_id", "ngram", max_bytes):
        ids.append(np.asarray(batch.column("bench_id"), dtype=np.int64))
        grams.extend(batch.column("ngram").to_pylist())
    ids_np = np.concatenate(ids) if ids else np.empty(0, np.int64)
    return ids_np, grams


def decontaminate(
    sf_dir: str,
    benchmark_path: str | None = None,
    force_distributed: bool = False,
):
    """Benchmark decontamination: flag docs sharing any word-boundary
    8-gram with the benchmark set (the Brown et al. GPT-3 appendix-C
    recipe).

    ``benchmark_path``: external benchmark parquet (bench_id, ngram);
    default is the synthetic corpus carve. Two tiers, same policy as
    stages/joins.lookup_column: a benchmark that passes the byte cap is
    broadcast ONCE via ray.put and intersected exactly per task; one
    that exceeds it (or ``force_distributed``) never assembles anywhere
    — corpus and benchmark are exploded to 64-bit gram hashes and
    semi-joined through ONE bucketed exchange (see
    _decontaminate_distributed)."""
    import ray

    from ..stages.joins import BROADCAST_MAX_BYTES, _BroadcastTooBig

    bench_ds = benchmark_ngrams_ds(sf_dir, benchmark_path)
    docs = read_documents(sf_dir, ["doc_id", "text"])
    if not force_distributed:
        try:
            bench_state = _collect_benchmark(bench_ds, BROADCAST_MAX_BYTES)
            bench_ref = ray.put(bench_state)
            return docs.map_batches(
                _decon_batch, fn_args=(bench_ref,), batch_format="pyarrow"
            )
        except _BroadcastTooBig:
            pass
    return _decontaminate_distributed(docs, bench_ds)


_DECON_BUCKETS = 64
_POLY = np.uint64(1099511628211)  # FNV-64 prime, wrapping-uint64 polynomial


def _token_poly_hashes(texts: list[str]):
    """texts -> (doc_of, gram_hash) for every word-boundary NGRAM_N
    window, vectorized: tokens hash once per DISTINCT token in the
    batch (Python loop over the vocabulary only), then the 8-window
    polynomial is 8 shifted uint64 multiply-adds over the flat token
    array + a splitmix64 finalizer. Windows never cross doc boundaries
    (doc_of[j] == doc_of[j + N - 1] mask)."""
    import warnings

    from ..functions.hashing import _mix64, stable_int

    toks = [t.split(" ") for t in texts]
    counts = np.fromiter((len(w) for w in toks), np.int64, count=len(toks))
    flat = np.asarray([w for ws in toks for w in ws], dtype=object)
    if flat.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    vocab, inv = np.unique(flat, return_inverse=True)
    vh = np.fromiter(
        (stable_int(t, salt="decon") for t in vocab.tolist()),
        np.uint64, count=len(vocab),
    )
    th = vh[inv]
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    n, w = len(th), NGRAM_N
    if n < w:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    gh = np.zeros(n - w + 1, np.uint64)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for k in range(w):
            gh = gh * _POLY + th[k : n - w + 1 + k]
        gh = _mix64(gh)
    valid = doc_of[: n - w + 1] == doc_of[w - 1 :]
    return doc_of[: n - w + 1][valid], gh[valid]


def _decontaminate_distributed(docs, bench_ds):
    """Scale tier: neither side assembles anywhere. The corpus explodes
    to DISTINCT-per-doc 64-bit gram hashes, the benchmark to gram
    hashes, and contamination is a hash semi-join through ONE bucketed
    exchange (bucket = gh % B, so each reducer sees a complete hash
    range). Counts fold back onto the corpus through lookup_column's
    tiered machinery. Exactness caveat, documented: two DISTINCT grams
    colliding on 64 bits could miscount n_hits by 1 — P ≈ n²/2⁶⁴, the
    standard decontamination trade (the broadcast tier compares exact
    token tuples); the forced-tier test pins equality of both tiers on
    the synthetic corpus."""
    import pandas as pd
    import ray.data as rd

    from ..stages.joins import lookup_column

    def add_plant_key(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"))
        keys = np.where(
            ids % PLANT_MOD == PLANT_RES, BENCH_MOD * (ids % PLANT_PICK), -1
        )
        return t.append_column(
            "plant_key", pc.cast(pa.array(keys, pa.int64()), pa.string())
        )

    def bench_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bkey": pc.cast(t.column("bench_id"), pa.string()),
                "ngram": t.column("ngram"),
            }
        )

    planted = lookup_column(
        docs.map_batches(add_plant_key, batch_format="pyarrow"),
        "plant_key",
        bench_ds.map_batches(bench_keyed, batch_format="pyarrow"),
        "bkey",
        "ngram",
        "planted_ngram",
    )

    def doc_grams(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"))
        texts = t.column("text").to_pylist()
        plant = t.column("planted_ngram").to_pylist()
        texts = [
            txt if p is None else f"{txt} {p}" for txt, p in zip(texts, plant)
        ]
        doc_of, gh = _token_poly_hashes(texts)
        pairs = np.unique(  # distinct (doc, gram) — n_hits is DISTINCT
            np.stack([ids[doc_of].astype(np.uint64), gh], axis=1), axis=0
        )
        return pa.table(
            {
                "doc_id": pa.array(pairs[:, 0].astype(np.int64)),
                "gh": pa.array(pairs[:, 1], pa.uint64()),
                "bucket": pa.array(
                    (pairs[:, 1] % np.uint64(_DECON_BUCKETS)).astype(np.int32)
                ),
            }
        )

    def bench_grams(t: pa.Table) -> pa.Table:
        grams = t.column("ngram").to_pylist()
        # a gram that is not exactly NGRAM_N tokens can never match an
        # NGRAM_N window — drop it rather than hash a non-window
        grams = [g for g in grams if len(g.split(" ")) == NGRAM_N]
        _, gh = _token_poly_hashes(grams)
        return pa.table(
            {
                "doc_id": pa.array(np.full(len(gh), -1, np.int64)),
                "gh": pa.array(gh, pa.uint64()),
                "bucket": pa.array(
                    (gh % np.uint64(_DECON_BUCKETS)).astype(np.int32)
                ),
            }
        )

    corpus_side = planted.map_batches(doc_grams, batch_format="pyarrow")
    bench_side = bench_ds.map_batches(bench_grams, batch_format="pyarrow")

    def hits_in_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        bench_gh = df.loc[df["doc_id"] < 0, "gh"].unique()
        d = df[df["doc_id"] >= 0]
        m = d["gh"].isin(bench_gh)
        hits = d.loc[m].groupby("doc_id").size()
        return pd.DataFrame(
            {"doc_id": hits.index.to_numpy(), "hits": hits.to_numpy(np.int64)}
        )

    per_bucket = (
        corpus_side.union(bench_side)
        .groupby("bucket")
        .map_groups(hits_in_bucket, batch_format="pandas")
    )
    totals = per_bucket.groupby("doc_id").sum("hits")

    def count_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ck": pc.cast(t.column("doc_id"), pa.string()),
                "n": pc.cast(t.column("sum(hits)"), pa.int64()),
            }
        )

    def doc_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "dk": pc.cast(t.column("doc_id"), pa.string()),
            }
        )

    joined = lookup_column(
        docs.map_batches(doc_key, batch_format="pyarrow"),
        "dk",
        totals.map_batches(count_key, batch_format="pyarrow"),
        "ck",
        "n",
        "n_hits_raw",
        val_type=pa.int64(),
    )

    def finish(t: pa.Table) -> pa.Table:
        n_hits = pc.coalesce(t.column("n_hits_raw"), pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_hits": n_hits,
                "contaminated": pc.greater(n_hits, 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


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
