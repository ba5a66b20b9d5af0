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

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_stats_batch, batch_format="pyarrow")


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

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_lang_batch, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str):
    """Winnowing-style rolling-hash fingerprints, exploded one row per
    kept hash: (doc_id, fp). Deterministic; no SQL analog (rows-only
    driver check; value-pinned in tests)."""
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

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fp_batch, batch_format="pyarrow")
