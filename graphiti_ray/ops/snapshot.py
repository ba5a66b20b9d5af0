"""Incremental crawl snapshot delta — the "what is actually new in
this crawl" anti-join every recurring web-scale ingestion runs before
paying for extraction: new-crawl rows whose CONTENT hash already
exists in the previous snapshot are dropped (a re-fetch of the same
page gets a fresh fetch id, so identity must be content, not id).

Snapshot synthesis (deterministic, no external data): the previous
snapshot is the documents rows with ``doc_id % 3 != 0``; the new crawl
re-fetches every even-id document under a fresh fetch id
(``doc_id + 1_000_000``) with unchanged text. The delta is therefore
the even ids whose text was NOT in the old snapshot — computable only
through the content hash, never through ids.

Scale shape: both sides stream once through a sha256 + bucket
projection (one row per doc, 2 short columns); the anti-join is ONE
bucketed exchange — rows are hash-bucketed on the content sha so a
sha's old- and new-side rows land in the same reducer, which does a
vectorized ``isin``. No side is ever collected or broadcast (at 100 TB
the old snapshot's sha set is itself corpus-sized, so the broadcast
tiers in stages/joins are the WRONG tool here — this is the shuffle
side of that tradeoff).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.exchange import bounded_group_map
from .io import read_documents

_SHA_BUCKETS = 256
_NEW_ID_BASE = 1_000_000


def _side_rows(side: int):
    def f(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ids = df["doc_id"].to_numpy()
        if side == 0:  # previous snapshot
            df = df[ids % 3 != 0]
            out_ids = np.full(len(df), -1, np.int64)
        else:  # new crawl: re-fetch of even ids under fresh fetch ids
            df = df[ids % 2 == 0]
            out_ids = df["doc_id"].to_numpy() + _NEW_ID_BASE
        shas = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in df["text"]
        ]
        buckets = np.array(
            [int(s[:8], 16) % _SHA_BUCKETS for s in shas], np.int32
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text_sha": pa.array(shas, pa.string()),
                "side": pa.array(np.full(len(df), side, np.int8)),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    return f


def _anti(df: pd.DataFrame) -> pd.DataFrame:
    olds = df.loc[df["side"] == 0, "text_sha"]
    nw = df[df["side"] == 1]
    return nw[~nw["text_sha"].isin(olds)][["doc_id", "text_sha"]]


def snapshot_delta(sf_dir: str):
    """(doc_id, text_sha) — the new-crawl rows with genuinely new
    content (fresh fetch ids; content not in the previous snapshot)."""
    docs = read_documents(sf_dir, ["doc_id", "text"])
    both = docs.map_batches(
        _side_rows(0), batch_format="pyarrow"
    ).union(docs.map_batches(_side_rows(1), batch_format="pyarrow"))
    return bounded_group_map(both, "bucket", _anti, batch_format="pandas")


SNAPSHOT_DELTA_SQL = """WITH old AS (
  SELECT sha256(text) AS text_sha FROM documents WHERE doc_id % 3 <> 0
),
nw AS (
  SELECT doc_id + 1000000 AS doc_id, sha256(text) AS text_sha
  FROM documents WHERE doc_id % 2 = 0
)
SELECT doc_id, text_sha FROM nw
WHERE text_sha NOT IN (SELECT text_sha FROM old)"""
