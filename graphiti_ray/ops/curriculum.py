"""Curriculum ordering for training output — the one operator family
whose OUTPUT is an order (shortformer-style length curriculum: Press
et al. 2020, arXiv:2012.15832; curriculum learning per Bengio et al.
2009): docs are ranked easy→hard by length octave, deterministically
shuffled WITHIN each octave so a training run doesn't see the corpus
in storage order.

The global dense rank is computed WITHOUT a global sort: the sort key
is (bucket, skey, doc_id) and its coarse prefix (bucket, skey>>20) is
a FIXED grid (≤ ~64 octaves × 4096 shuffle cells) at any corpus size,
so rank = prefix-sum base over the grid (tiny aggregate → driver
cumsum → ray.put broadcast, the ops/packing.sequence_pack machinery)
plus a vectorized argsort inside each grid cell's map_groups. Cell
population is ~uniform because skey is a multiplicative hash, so no
reducer is hot. ONE exchange total.

Determinism contract with the DuckDB oracle: skey =
(doc_id * 2654435761) % 2^32 (Knuth's multiplicative hash). numpy
computes it in uint64 — 64-bit wraparound is exact here because
(a*b mod 2^64) mod 2^32 == (a*b) mod 2^32 — while the SQL routes
through HUGEINT; both are exact at any doc_id. Octave =
floor(log2(n_words)) — integer-exact in IEEE double for any count
(same contract as ops/lmscore). n_words >= 1 always: splitting an
empty string yields one empty token on both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .io import read_documents

SHUFFLE_PRIME = 2654435761  # Knuth multiplicative hash constant
COARSE_SHIFT = 20  # skey >> 20 -> 4096 grid cells per octave


def _keys_batch(batch: pa.Table) -> pa.Table:
    words = pc.split_pattern(batch.column("text"), " ")
    n = np.asarray(pc.list_value_length(words), np.int64)
    bucket = np.floor(np.log2(n)).astype(np.int64)
    ids = np.asarray(batch.column("doc_id"), np.uint64)
    skey = ((ids * np.uint64(SHUFFLE_PRIME)) % np.uint64(2**32)).astype(
        np.int64
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "bucket": pa.array(bucket, pa.int64()),
            "skey": pa.array(skey, pa.int64()),
            "cell": pa.array(skey >> COARSE_SHIFT, pa.int64()),
        }
    )


def _cell_counts(batch: pa.Table) -> pa.Table:
    g = (
        batch.select(["bucket", "cell"])
        .group_by(["bucket", "cell"])
        .aggregate([([], "count_all")])
    )
    return g.rename_columns(["bucket", "cell", "n"])


def curriculum_order(sf_dir: str):
    """(doc_id, bucket, curriculum_rank): dense global rank 0..n-1 in
    (length-octave, within-octave-shuffle) order.

    Exchange layout: grouping on the raw (bucket, cell) key would
    schedule one reducer invocation per grid cell — up to ~64 x 4096
    near-empty pandas groups at small corpora, pure per-group overhead
    (measured 7.6 s for 5 k docs). Instead rows carry a partition id
    ``pid = (bucket * CELLS + cell) % K`` (K = cluster exchange
    width), so ONE task handles many whole cells and ranks them all in
    a single vectorized pass (lexsort + run-boundary arithmetic — no
    per-cell Python). Cells never split across tasks, and a task's
    payload is ~data/K, so the per-task bound scales with the cluster
    exactly as before (same grid, same bases, same output)."""
    import ray

    from ..functions.exchange import bounded_group_map, exchange_width

    cells = 1 << (32 - COARSE_SHIFT)  # grid cells per octave

    keyed = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(_keys_batch, batch_format="pyarrow")
        .materialize()  # 4 int columns; read twice (counts + rank)
    )

    # fixed-grid cell counts: one tiny aggregate, driver prefix-sum
    counts = (
        keyed.map_batches(_cell_counts, batch_format="pyarrow")
        .groupby(["bucket", "cell"])
        .sum("n")
        .to_pandas()
        .sort_values(["bucket", "cell"])
        .reset_index(drop=True)
    )
    csum = counts["sum(n)"].cumsum()
    counts["base"] = csum - counts["sum(n)"]  # exclusive prefix
    bases = {
        (int(b) * cells + int(c)): int(v)
        for b, c, v in zip(counts["bucket"], counts["cell"], counts["base"])
    }
    bases_ref = ray.put(bases)
    k = exchange_width()

    def pid(t: pa.Table) -> pa.Table:
        key = (
            np.asarray(t.column("bucket"), np.int64) * cells
            + np.asarray(t.column("cell"), np.int64)
        )
        return t.append_column("pid", pa.array(key % k, pa.int64()))

    def rank_many(df: pd.DataFrame) -> pd.DataFrame:
        base_map = ray.get(bases_ref)
        key = df["bucket"].to_numpy() * cells + df["cell"].to_numpy()
        order = np.lexsort(
            (df["doc_id"].to_numpy(), df["skey"].to_numpy(), key)
        )
        df = df.iloc[order].reset_index(drop=True)
        key = key[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        lens = np.diff(np.r_[starts, len(key)])
        run_base = np.array(
            [base_map[int(key[s])] for s in starts], np.int64
        )  # python loop over RUNS (cells in this task), not rows
        within = np.arange(len(key), dtype=np.int64) - np.repeat(
            starts, lens
        )
        df["curriculum_rank"] = np.repeat(run_base, lens) + within
        return df[["doc_id", "bucket", "curriculum_rank"]]

    tagged = keyed.map_batches(pid, batch_format="pyarrow")
    return bounded_group_map(tagged, "pid", rank_many, batch_format="pandas")


CURRICULUM_ORDER_SQL = f"""WITH t AS (
  SELECT doc_id,
         CAST(floor(log2(len(string_split(text, ' ')))) AS BIGINT)
           AS bucket,
         CAST((CAST(doc_id AS HUGEINT) * {SHUFFLE_PRIME}) % 4294967296
           AS BIGINT) AS skey
  FROM documents
)
SELECT doc_id, bucket,
       CAST(row_number() OVER (ORDER BY bucket, skey, doc_id) - 1
            AS BIGINT) AS curriculum_rank
FROM t
"""
