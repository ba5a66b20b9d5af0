"""Corpus packaging ops: per-domain caps and token-budget sequence
packing — the last mile of a training-data pipeline (cap crawl-heavy
domains, then concatenate documents into fixed-length training
sequences).

Scale shapes:

- ``domain_cap`` is two-phase top-k: a map-side partial top-k per
  block (so the exchange carries at most k rows per (block, domain)),
  then one groupby(domain) finalize — the same combiner-before-shuffle
  discipline as ops/dedup's exact pass.
- ``sequence_pack`` is a distributed prefix sum (the GPT-style
  concatenate-then-chunk layout): per-(lang, id-bucket) token totals
  are a tiny aggregate, the driver prefix-sums that bucket table
  (O(n_buckets), not O(rows)), and a broadcast base-offset map lets
  every group compute exact global token offsets independently — no
  sequential scan over the corpus, no full materialization on the
  driver. Scale bound: the driver table is O(docs / PACK_BUCKET) rows
  (~250k rows at 10^9 docs — fine); at 10^12 docs it needs a two-level
  prefix (bucket the buckets, same construction one level up) — a
  mechanical extension, not a redesign, and out of scope until the
  corpus grows three orders of magnitude.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from .io import read_documents

# ------------------------------------------------------------ domain_cap

DOMAIN_CAP_K = 5  # keep the k longest docs per domain



def _domain_of(ids: pa.ChunkedArray | pa.Array) -> pa.Array:
    # same construction as sources/pages.py urls: site{doc_id % 50}.example
    mod = pa.array(np.asarray(ids) % 50, pa.int64())
    return pc.binary_join_element_wise(
        "site", pc.cast(mod, pa.string()), ".example", ""
    )


def _partial_topk(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "domain": _domain_of(batch.column("doc_id")),
            "n_chars": batch.column("n_chars"),
        }
    )
    order = pc.sort_indices(
        t,
        sort_keys=[
            ("domain", "ascending"),
            ("n_chars", "descending"),
            ("doc_id", "ascending"),
        ],
    )
    t = t.take(order)
    dom = np.asarray(t.column("domain"))
    # boundary scan: positions where the domain changes
    starts = np.flatnonzero(np.r_[True, dom[1:] != dom[:-1]])
    ranks = np.arange(len(dom)) - np.repeat(
        starts, np.diff(np.r_[starts, len(dom)])
    )
    return t.filter(pa.array(ranks < DOMAIN_CAP_K))


def _final_topk(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(
        DOMAIN_CAP_K
    )
    df = df.reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df


def domain_cap(sf_dir: str):
    """Keep the top-k docs per domain by (n_chars desc, doc_id asc),
    with their within-domain rank — the crawl-frequency cap that stops
    boilerplate-heavy domains from dominating the training mix."""
    import ray.data as rd

    return (
        read_documents(sf_dir, ["doc_id", "n_chars"])
        .map_batches(_partial_topk, batch_format="pyarrow")
        .groupby("domain")
        .map_groups(_final_topk, batch_format="pandas")
    )


DOMAIN_CAP_SQL = f"""WITH d AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS domain,
         n_chars
  FROM documents
)
SELECT doc_id, domain, n_chars, CAST(rk AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rk
  FROM d)
WHERE rk <= {DOMAIN_CAP_K}
"""


# --------------------------------------------------------- sequence_pack

SEQ_LEN = 512  # tokens per training sequence
PACK_BUCKET = 4096  # doc_ids per prefix-sum bucket


def _tokens_batch(batch: pa.Table) -> pa.Table:
    words = pc.split_pattern(batch.column("text"), " ")
    ids = batch.column("doc_id")
    bucket = pa.array(np.asarray(ids) // PACK_BUCKET, pa.int64())
    return pa.table(
        {
            "doc_id": ids,
            "lang": batch.column("lang"),
            "bucket": bucket,
            "n_tokens": pc.cast(pc.list_value_length(words), pa.int64()),
        }
    )


def _bucket_sums(batch: pa.Table) -> pa.Table:
    df = (
        batch.select(["lang", "bucket", "n_tokens"])
        .to_pandas()
        .groupby(["lang", "bucket"], as_index=False)["n_tokens"]
        .sum()
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def sequence_pack(sf_dir: str):
    """Assign every doc its global token span in the concatenated
    (lang, doc_id)-ordered token stream, and the training sequences of
    length SEQ_LEN it lands in. Exact global offsets without a global
    sort: tiny bucket-total aggregate -> driver prefix over buckets ->
    broadcast bases -> per-bucket-group local cumsum."""
    import ray
    import ray.data as rd

    toks = (
        read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(_tokens_batch, batch_format="pyarrow")
        .materialize()
    )

    # tiny: one row per (lang, id-bucket); combine partials on the driver
    part = toks.map_batches(_bucket_sums, batch_format="pyarrow").to_pandas()
    totals = (
        part.groupby(["lang", "bucket"], as_index=False)["n_tokens"]
        .sum()
        .sort_values(["lang", "bucket"])
        .reset_index(drop=True)
    )
    csum = totals["n_tokens"].cumsum()
    totals["base"] = csum - totals["n_tokens"]  # exclusive prefix
    bases = {
        (lg, int(b)): int(v)
        for lg, b, v in zip(totals["lang"], totals["bucket"], totals["base"])
    }
    bases_ref = ray.put(bases)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref)[(df["lang"].iloc[0], int(df["bucket"].iloc[0]))]
        df = df.sort_values("doc_id").reset_index(drop=True)
        cum = df["n_tokens"].cumsum()
        df["tok_start"] = base + cum - df["n_tokens"]
        df["seq_first"] = df["tok_start"] // SEQ_LEN
        df["seq_last"] = (df["tok_start"] + df["n_tokens"] - 1) // SEQ_LEN
        return df[
            ["doc_id", "lang", "n_tokens", "tok_start", "seq_first", "seq_last"]
        ]

    return toks.groupby(["lang", "bucket"]).map_groups(
        assign, batch_format="pandas"
    )


SEQUENCE_PACK_SQL = f"""WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
    COALESCE(SUM(n_tokens) OVER (
      ORDER BY lang, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM t
)
SELECT doc_id, lang, n_tokens,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(tok_start // {SEQ_LEN} AS BIGINT) AS seq_first,
       CAST((tok_start + n_tokens - 1) // {SEQ_LEN} AS BIGINT) AS seq_last
FROM c
"""
