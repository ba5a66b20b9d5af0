"""The composed crawl→training-data funnel — the end-to-end story the
individual operators serve, in the order a production crawl pipeline
runs them:

    raw → URL dedup (keep-first on canonical URL)
        → host filter (host-level quality, stats over the FULL crawl)
        → per-doc quality heuristics (C4 rules, ops/filtering)
        → exact content dedup among the survivors

Output is the funnel table ``(stage, n_docs)`` — the per-stage
survivor counts every data card reports.

Semantics worth pinning: host statistics are computed over the whole
crawl (a spam host is spammy regardless of which of its pages survive
URL dedup), while exact content dedup runs only among stage-3
survivors (dedup of dropped docs is wasted work, and a duplicate whose
keeper was filtered earlier SHOULD survive).

Scale shape: one streaming signal pass (canonical URL, host, quality
flags, content sha — all vectorized, reusing ops/urls + ops/filtering
kernels); then three key-sized exchanges (canonical-URL min, host
sums, survivor-sha min) whose results fold back through
stages/joins.lookup_column's byte-capped tiers; stage counts are one
tiny aggregate. Nothing corpus-sized is collected or re-read.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .filtering import (
    MAX_MEAN_WLEN,
    MAX_WORDS,
    MIN_MEAN_WLEN,
    MIN_STOP_RATIO,
    MIN_WORDS,
    STOPWORDS,
)
from .io import read_documents
from .urls import _synth_urls, canonicalize


def _signal_batch(batch: pa.Table) -> pa.Table:
    df = batch.select(["doc_id"]).to_pandas()
    url = _synth_urls(df)
    curl = canonicalize(url)
    ids = np.asarray(batch.column("doc_id"), np.int64)
    host = np.char.add(
        np.char.add("site", ((ids // 3) % 50).astype(str)), ".example"
    )
    txt = batch.column("text")
    words = pc.split_pattern(txt, " ")
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
    n_chars = np.asarray(pc.utf8_length(txt), np.int64)
    mean_wlen = (n_chars - (n_words - 1)) / np.maximum(n_words, 1)
    quality = (
        (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS)
        & (n_stop / np.maximum(n_words, 1) >= MIN_STOP_RATIO)
        & (mean_wlen >= MIN_MEAN_WLEN)
        & (mean_wlen <= MAX_MEAN_WLEN)
    )
    shas = [
        hashlib.sha256(t.encode("utf-8")).hexdigest()
        for t in txt.to_pylist()
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "canonical_url": pa.array(curl.to_numpy(), pa.string()),
            "host": pa.array(host, pa.string()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "quality": pa.array(quality, pa.bool_()),
            "text_sha": pa.array(shas, pa.string()),
        }
    )


def crawl_prep(sf_dir: str):
    """(stage, n_docs) funnel: raw / url_dedup / host_filter /
    quality / exact_dedup."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.joins import lookup_column

    s = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(_signal_batch, batch_format="pyarrow")
        .materialize()
    )

    # stage 1: URL keep-first — min doc_id per canonical URL, folded back
    url_min = s.groupby("canonical_url").min("doc_id")
    s = lookup_column(
        s, "canonical_url", url_min, "canonical_url", "min(doc_id)",
        "url_min", val_type=pa.int64(),
    )

    # stage 2: host filter — milli ratio over the FULL crawl
    def host_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("host").aggregate(
            [("n_stopwords", "sum"), ("n_words", "sum")]
        )
        return g.rename_columns(["host", "ns", "nw"])

    hp = s.map_batches(host_partial, batch_format="pyarrow").materialize()

    def to_milli(t: pa.Table) -> pa.Table:
        ns = np.asarray(t.column("sum(ns)"), np.int64)
        nw = np.asarray(t.column("sum(nw)"), np.int64)
        return pa.table(
            {
                "host": t.column("host"),
                "milli": pa.array(1000 * ns // nw, pa.int64()),
            }
        )

    host_milli = (
        hp.groupby("host")
        .aggregate(Sum("ns"), Sum("nw"))
        .map_batches(to_milli, batch_format="pyarrow")
    )
    totals = hp.sum(["ns", "nw"])
    thr = 1000 * int(totals["sum(ns)"]) // int(totals["sum(nw)"])
    s = lookup_column(
        s, "host", host_milli, "host", "milli", "host_milli",
        val_type=pa.int64(),
    )

    def flags(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"), np.int64)
        url_s = ids == np.asarray(t.column("url_min"), np.int64)
        host_s = url_s & (
            np.asarray(t.column("host_milli"), np.int64) >= thr
        )
        qual_s = host_s & np.asarray(t.column("quality"), bool)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_sha": t.column("text_sha"),
                "url_s": pa.array(url_s, pa.bool_()),
                "host_s": pa.array(host_s, pa.bool_()),
                "qual_s": pa.array(qual_s, pa.bool_()),
            }
        )

    flagged = s.map_batches(flags, batch_format="pyarrow").materialize()

    # stage 4: exact dedup AMONG quality survivors
    def surv_partial(t: pa.Table) -> pa.Table:
        keep = t.filter(t.column("qual_s"))
        g = keep.select(["text_sha", "doc_id"]).group_by(
            "text_sha"
        ).aggregate([("doc_id", "min")])
        return g.rename_columns(["text_sha", "m"])

    sha_min = (
        flagged.map_batches(surv_partial, batch_format="pyarrow")
        .groupby("text_sha")
        .min("m")
    )
    final = lookup_column(
        flagged, "text_sha", sha_min, "text_sha", "min(m)", "sha_min",
        val_type=pa.int64(),
    )

    def counts(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"), np.int64)
        qual = np.asarray(t.column("qual_s"), bool)
        sha_m = np.asarray(
            t.column("sha_min").combine_chunks().fill_null(-1), np.int64
        )
        dedup = qual & (ids == sha_m)
        return pa.table(
            {
                "raw": pa.array([len(ids)], pa.int64()),
                "url": pa.array(
                    [int(np.asarray(t.column("url_s"), bool).sum())],
                    pa.int64(),
                ),
                "host": pa.array(
                    [int(np.asarray(t.column("host_s"), bool).sum())],
                    pa.int64(),
                ),
                "quality": pa.array([int(qual.sum())], pa.int64()),
                "dedup": pa.array([int(dedup.sum())], pa.int64()),
            }
        )

    agg = final.map_batches(counts, batch_format="pyarrow").sum(
        ["raw", "url", "host", "quality", "dedup"]
    )
    return pd.DataFrame(
        {
            "stage": ["1_raw", "2_url_dedup", "3_host_filter",
                      "4_quality", "5_exact_dedup"],
            "n_docs": [
                int(agg["sum(raw)"]), int(agg["sum(url)"]),
                int(agg["sum(host)"]), int(agg["sum(quality)"]),
                int(agg["sum(dedup)"]),
            ],
        }
    )


def _crawl_prep_sql() -> str:
    from .urls import _SYNTH_SQL, canonicalize_sql

    return f"""WITH {_SYNTH_SQL},
canon AS (
{canonicalize_sql("SELECT doc_id, url FROM urls", ["doc_id"])}
),
sig AS (
  SELECT d.doc_id, c.canonical_url,
         'site' || ((d.doc_id // 3) % 50)::VARCHAR || '.example' AS host,
         len(list_filter(string_split(d.text, ' '),
                         x -> x IN ('a', 'the')))::BIGINT AS ns,
         len(string_split(d.text, ' '))::BIGINT AS nw,
         ( len(string_split(d.text, ' '))
             BETWEEN {MIN_WORDS} AND {MAX_WORDS}
           AND CAST(len(list_filter(string_split(d.text, ' '),
                     x -> x IN ('a', 'the'))) AS DOUBLE)
               / len(string_split(d.text, ' ')) >= {MIN_STOP_RATIO}
           AND (CAST(length(d.text) - (len(string_split(d.text, ' ')) - 1)
                     AS DOUBLE) / len(string_split(d.text, ' ')))
               BETWEEN {MIN_MEAN_WLEN} AND {MAX_MEAN_WLEN}
         ) AS quality,
         d.text
  FROM documents d JOIN canon c USING (doc_id)
),
u AS (
  SELECT sig.*,
         doc_id = MIN(doc_id) OVER (PARTITION BY canonical_url) AS url_s
  FROM sig
),
hm AS (
  SELECT host, ((1000 * SUM(ns)) // SUM(nw))::BIGINT AS milli
  FROM sig GROUP BY host
),
thr AS (
  SELECT ((1000 * SUM(ns)) // SUM(nw))::BIGINT AS t FROM sig
),
f AS (
  SELECT u.doc_id, u.text, u.url_s,
         (u.url_s AND hm.milli >= thr.t) AS host_s,
         (u.url_s AND hm.milli >= thr.t AND u.quality) AS qual_s
  FROM u JOIN hm USING (host), thr
),
d5 AS (
  SELECT doc_id,
         qual_s AND doc_id = MIN(CASE WHEN qual_s THEN doc_id END)
             OVER (PARTITION BY text) AS dedup_s
  FROM f
)
SELECT * FROM (
  SELECT '1_raw' AS stage, COUNT(*)::BIGINT AS n_docs FROM f
  UNION ALL
  SELECT '2_url_dedup', COUNT(*) FILTER (WHERE url_s)::BIGINT FROM f
  UNION ALL
  SELECT '3_host_filter', COUNT(*) FILTER (WHERE host_s)::BIGINT FROM f
  UNION ALL
  SELECT '4_quality', COUNT(*) FILTER (WHERE qual_s)::BIGINT FROM f
  UNION ALL
  SELECT '5_exact_dedup', COUNT(*) FILTER (WHERE dedup_s)::BIGINT FROM d5
)"""


CRAWL_PREP_SQL = _crawl_prep_sql()
