"""Composed training-data preparation pipeline: quality filter ->
exact dedup -> per-language corpus accounting.

The canonical pre-training corpus prep shape, composed from this
repo's operator families in ONE streaming Dataset chain:

    corpus (with planted duplicates)
      --map_batches--> quality stats + filter     (ops/textstats rules)
      --groupby(sha256(text))--> dedup survivors  (ops/dedup exact tier)
      --groupby(lang)--> docs + token totals      (partial-combined)

Everything is integer arithmetic -> the whole composition has an exact
DuckDB oracle (queries.CORPUS_PREP_SQL).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .corpus import docs_with_dups
from .textstats import STOPWORD_RE, TOKEN_RE


def corpus_prep(sf_dir: str):
    """(lang, n_docs, total_tokens) over quality-filtered, exact-deduped
    documents."""
    from ray.data.aggregate import Count, Min, Sum

    def stats_filter(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = pc.cast(pc.list_value_length(pc.split_pattern(text, " ")), pa.int64())
        n_stop = pc.cast(pc.count_substring_regex(text, STOPWORD_RE), pa.int64())
        n_bytes = pc.cast(pc.binary_length(text), pa.int64())
        n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(n_words, 10), pc.less_equal(n_bytes, 100000)),
            pc.greater_equal(pc.multiply(n_stop, 20), n_words),
        )
        t = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "text": text,
                "n_tokens": n_tokens,
            }
        ).filter(keep)
        shas = [
            hashlib.sha256(s.encode("utf-8")).hexdigest()
            for s in t.column("text").to_pylist()
        ]
        return t.append_column("text_sha", pa.array(shas, pa.string())).drop_columns(
            ["text"]
        )

    ds = docs_with_dups(sf_dir).map_batches(
        stats_filter, batch_format="pyarrow", batch_size=None
    )
    survivors = ds.groupby("text_sha").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("lang", alias_name="lang"),  # copies of a text share lang
        Min("n_tokens", alias_name="n_tokens"),
    )
    return survivors.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
    )
