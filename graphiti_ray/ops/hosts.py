"""Host-level quality aggregation + filtering — the RefinedWeb /
FineWeb pipeline stage after per-doc heuristics: aggregate a quality
signal per HOST and drop every document from hosts whose aggregate
falls below the corpus-wide value (spam farms score low on average
even when individual pages slip past per-doc filters).

Signal: the integer stopword-ratio ``host_stop_milli =
(1000 * sum(n_stopwords)) // sum(n_words)`` per host, kept iff
``>= corpus_stop_milli`` (the same ratio over the whole corpus) —
all-integer so the DuckDB oracle hash-matches.

Scale shape: ONE streaming pass computes the per-doc (host, n_stop,
n_words) signals (materialized: 4 short columns ≈ tens of bytes/doc);
host sums are a map-side partial combine + host-count-sized groupby;
corpus totals are two scalar aggregates off the same partial stream.
The host->milli assignment goes through stages/joins.lookup_column,
whose byte-capped broadcast tier handles the common case (hosts ≪
docs) and whose distributed parquet-shard tier is the escape hatch
when the host table itself is huge (the real web has ~10^8 hosts) —
nothing host-sized is unconditionally collected on the driver.

Host synthesis matches ops/urls.py: ``site{(doc_id // 3) % 50}.example``
(the canonical host of the page the doc was fetched from).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .filtering import STOPWORDS
from .io import read_documents


def _signal_batch(batch: pa.Table) -> pa.Table:
    ids = np.asarray(batch.column("doc_id"), np.int64)
    words = pc.split_pattern(batch.column("text"), " ")
    n_words = np.asarray(pc.list_value_length(words), np.int64)
    flat = pc.list_flatten(words)
    stop_mask = np.asarray(
        pc.is_in(flat, value_set=pa.array(STOPWORDS, pa.string()))
    ).astype(np.int64)
    offsets = np.zeros(len(n_words) + 1, dtype=np.int64)
    np.cumsum(n_words, out=offsets[1:])
    n_stop = np.add.reduceat(
        np.append(stop_mask, 0), offsets[:-1]
    ) * (n_words > 0)
    host = np.char.add(
        np.char.add("site", ((ids // 3) % 50).astype(str)), ".example"
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "host": pa.array(host, pa.string()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
        }
    )


def _partial_host_sums(t: pa.Table) -> pa.Table:
    g = t.group_by("host").aggregate(
        [("n_stopwords", "sum"), ("n_words", "sum")]
    )
    return g.rename_columns(["host", "ns", "nw"])


def host_filter(sf_dir: str):
    """(doc_id, host, host_stop_milli, host_kept) — per-host integer
    stopword ratio and the at-or-above-corpus-average keep decision."""
    from ray.data.aggregate import Sum

    from ..stages.joins import lookup_column

    signals = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(_signal_batch, batch_format="pyarrow")
        .materialize()
    )
    partial = signals.map_batches(
        _partial_host_sums, batch_format="pyarrow"
    ).materialize()  # host-count-sized per block; read twice below

    def to_milli(t: pa.Table) -> pa.Table:
        ns = np.asarray(t.column("sum(ns)"), np.int64)
        nw = np.asarray(t.column("sum(nw)"), np.int64)
        return pa.table(
            {
                "host": t.column("host"),
                "host_stop_milli": pa.array(1000 * ns // nw, pa.int64()),
            }
        )

    host_milli = (
        partial.groupby("host")
        .aggregate(Sum("ns"), Sum("nw"))
        .map_batches(to_milli, batch_format="pyarrow")
    )
    totals = partial.sum(["ns", "nw"])
    thr = 1000 * int(totals["sum(ns)"]) // int(totals["sum(nw)"])

    looked = lookup_column(
        signals, "host", host_milli, "host", "host_stop_milli",
        "host_stop_milli", val_type=pa.int64(),
    )

    def finish(t: pa.Table) -> pa.Table:
        m = np.asarray(t.column("host_stop_milli"), np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "host": t.column("host"),
                "host_stop_milli": t.column("host_stop_milli"),
                "host_kept": pa.array(m >= thr, pa.bool_()),
            }
        )

    return looked.map_batches(finish, batch_format="pyarrow")


HOST_FILTER_SQL = """WITH s AS (
  SELECT doc_id,
         'site' || ((doc_id // 3) % 50)::VARCHAR || '.example' AS host,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('a', 'the')))::BIGINT AS ns,
         len(string_split(text, ' '))::BIGINT AS nw
  FROM documents
),
hh AS (
  SELECT host,
         ((1000 * SUM(ns)) // SUM(nw))::BIGINT AS host_stop_milli
  FROM s GROUP BY host
),
c AS (
  SELECT ((1000 * SUM(ns)) // SUM(nw))::BIGINT AS corpus_milli FROM s
)
SELECT s.doc_id, s.host, hh.host_stop_milli,
       hh.host_stop_milli >= c.corpus_milli AS host_kept
FROM s JOIN hh USING (host), c"""
