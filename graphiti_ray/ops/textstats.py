"""Text analysis operators over the documents table: token counting,
quality scoring, language-ID, document fingerprinting.

All-integer outputs (counts, flags) so the DuckDB oracles hash-match
exactly. Hot paths use pyarrow.compute regex kernels (vectorized over
the whole Arrow block), not Python loops.

Graphiti analog: the sanitizer family M5/M6
(graphiti_core/llm_client/client.py:63-83, helpers.py:39-73); the
fingerprints are the batch-engine analog of content-hash LLM cache keys
(llm_client/client.py:116-151).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import rolling_fingerprints
from .io import read_documents

TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9 ]"  # BPE-ish coarse token classes
PUNCT_RE = r"[^a-z0-9 ]"
STOPWORD_RE = r"\b(the|a|of|and|in|on)\b"

# language marker lexicons (tiny n-gram/stopword heuristic)
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|and|is|to)\b",
    "es": r"\b(el|la|de|que|los|una)\b",
    "fr": r"\b(le|la|les|des|est|une)\b",
    "de": r"\b(der|die|das|und|ist|ein)\b",
}
LANG_ORDER = ["en", "es", "fr", "de"]  # argmax tie-break priority



def _stats_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    n_words = pc.list_value_length(pc.split_pattern(text, " "))
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_punct = pc.count_substring_regex(text, PUNCT_RE)
    n_stop = pc.count_substring_regex(text, STOPWORD_RE)
    n_bytes = pc.binary_length(text)
    nw = n_words.combine_chunks() if isinstance(n_words, pa.ChunkedArray) else n_words
    quality_ok = pc.cast(
        pc.and_(
            pc.and_(pc.greater_equal(nw, 10), pc.less_equal(n_bytes, 100000)),
            pc.greater_equal(pc.multiply(pc.cast(n_stop, pa.int64()), 20),
                             pc.cast(nw, pa.int64())),
        ),
        pa.int64(),
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pc.cast(n_words, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_punct": pc.cast(n_punct, pa.int64()),
            "n_stop": pc.cast(n_stop, pa.int64()),
            "n_bytes": pc.cast(n_bytes, pa.int64()),
            "quality_ok": quality_ok,
        }
    )


def text_stats(sf_dir: str):
    """(doc_id, n_words, n_tokens, n_punct, n_stop, n_bytes, quality_ok)
    — all pyarrow.compute kernels, zero Python row loops."""
    import ray.data as rd

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(_stats_batch, batch_format="pyarrow")


def _lang_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    scores = {
        lg: pc.cast(pc.count_substring_regex(text, rex), pa.int64())
        for lg, rex in LANG_MARKERS.items()
    }
    mat = np.stack(
        [np.asarray(scores[lg].combine_chunks() if isinstance(scores[lg], pa.ChunkedArray) else scores[lg]) for lg in LANG_ORDER]
    )
    best = mat.argmax(axis=0)  # argmax: first max wins = LANG_ORDER priority
    pred = np.where(mat.max(axis=0) > 0, np.array(LANG_ORDER)[best], "und")
    cols = {"doc_id": batch.column("doc_id")}
    for lg in LANG_ORDER:
        cols[f"score_{lg}"] = scores[lg]
    cols["lang_pred"] = pa.array(pred.tolist(), pa.string())
    return pa.table(cols)


def lang_id(sf_dir: str):
    """Stopword-lexicon language ID: per-lang marker counts + argmax
    (priority order on ties, 'und' when all zero)."""
    import ray.data as rd

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(_lang_batch, batch_format="pyarrow")


def _explode_words(batch: pa.Table):
    """(row_idx, flat_words) numpy views of the per-row word lists —
    the shared explode step for the repetition/ngram kernels. One
    Arrow split kernel + one np.repeat; no Python row loop."""
    text = batch.column("text")
    la = pc.split_pattern(text, " ")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    lens = pc.list_value_length(la).to_numpy(zero_copy_only=False)
    flat = la.flatten().to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    return row_idx, flat, lens


def _rep_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals, all-integer: per doc the word /
    adjacent-bigram totals, distinct counts and top multiplicities,
    plus rep_flag = (top word > 20% of words) OR (duplicate bigrams
    > 50% of bigrams) — the batch analog of the repetition filters in
    Rae et al. 2021 (Gopher), §A1.1, on a corpus without line
    structure. Vectorized: explode + pandas hash groupby."""
    import pandas as pd

    row_idx, flat, lens = _explode_words(batch)
    n = batch.num_rows
    base = pd.DataFrame({"r": row_idx, "w": flat})
    uc = base.groupby(["r", "w"], sort=False).size()
    g = uc.groupby(level=0)
    n_words = np.zeros(n, dtype=np.int64)
    n_words[:] = lens
    n_distinct = np.zeros(n, dtype=np.int64)
    top_word = np.zeros(n, dtype=np.int64)
    n_distinct[g.size().index.to_numpy()] = g.size().to_numpy()
    top_word[g.max().index.to_numpy()] = g.max().to_numpy()

    same = row_idx[:-1] == row_idx[1:] if len(row_idx) else np.array([], bool)
    b_rows = row_idx[:-1][same]
    w1 = flat[:-1][same].astype(object)
    w2 = flat[1:][same].astype(object)
    n_bg = np.zeros(n, dtype=np.int64)
    n_bg_distinct = np.zeros(n, dtype=np.int64)
    top_bg = np.zeros(n, dtype=np.int64)
    if len(b_rows):
        bc = (
            pd.DataFrame({"r": b_rows, "b": w1 + " " + w2})
            .groupby(["r", "b"], sort=False)
            .size()
        )
        bgg = bc.groupby(level=0)
        n_bg[bgg.sum().index.to_numpy()] = bgg.sum().to_numpy()
        n_bg_distinct[bgg.size().index.to_numpy()] = bgg.size().to_numpy()
        top_bg[bgg.max().index.to_numpy()] = bgg.max().to_numpy()

    rep_flag = (
        (5 * top_word > n_words)
        | ((n_bg > 0) & (2 * n_bg_distinct < n_bg))
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_distinct_words": pa.array(n_distinct, pa.int64()),
            "top_word_n": pa.array(top_word, pa.int64()),
            "n_bigrams": pa.array(n_bg, pa.int64()),
            "n_distinct_bigrams": pa.array(n_bg_distinct, pa.int64()),
            "top_bigram_n": pa.array(top_bg, pa.int64()),
            "rep_flag": pa.array(rep_flag, pa.int64()),
        }
    )


def repetition_stats(sf_dir: str):
    """(doc_id, word/bigram totals + distincts + top multiplicities,
    rep_flag) — the repetition-removal signals of a training-data
    quality pipeline, embarrassingly parallel per block."""
    import ray.data as rd

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(_rep_batch, batch_format="pyarrow")


TOP_NGRAMS_K = 10


def top_ngrams(sf_dir: str, k: int = TOP_NGRAMS_K):
    """Per-language top-k unigram vocabulary with counts: the global
    token-frequency aggregate every corpus build runs. Shape for
    scale: the per-batch COMBINER collapses each block to its local
    (lang, word) counts before the shuffle, so the exchange carries
    vocabulary-sized data (not corpus-sized); the final per-lang top-k
    is a tiny map_groups."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        row_idx, flat, _ = _explode_words(batch)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        c = (
            pd.DataFrame({"lang": langs[row_idx], "word": flat})
            .groupby(["lang", "word"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "lang": pa.array(c["lang"], pa.string()),
                "word": pa.array(c["word"], pa.string()),
                "cnt": pa.array(c["cnt"].to_numpy(), pa.int64()),
            }
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cnt", "word"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["lang", "word", "cnt", "rank"]]

    counts = (
        read_documents(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return counts.groupby("lang").map_groups(topk, batch_format="pandas")


def doc_fingerprints(sf_dir: str):
    """Winnowing-style rolling-hash fingerprints, exploded one row per
    kept hash: (doc_id, fp). Deterministic; SQL-mirrored by
    queries._DOC_FINGERPRINTS_SQL (exact HUGEINT polynomial image)."""
    import ray.data as rd

    def fp_batch(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for h in rolling_fingerprints(t):
                ids.append(i)
                fps.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fp": pa.array(fps, pa.uint64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(fp_batch, batch_format="pyarrow")
