"""Key-skew diagnostics — the operational tool behind this repo's
"partitioning / shuffle / skew handled explicitly" contract: before
keying an exchange on a column, profile it. The output is the
log2-bucketed key-frequency histogram (how many keys appear 2^b..2^(b+1)-1
times, and how many rows they carry) plus the exact top hot keys —
exactly the numbers that decide between a plain groupby, a salted
key, or a dedicated hot-key path (the decision stages/canonicalize.py
and ops/dedup.py make statically today).

Scale shape: per-block partial key counts make the first exchange
key-set-sized; the histogram fold is a second, bucket-count-sized
(i.e. ~64-row) groupby; hot-key top-k is per-block partial top-k +
one driver finalize of num_blocks*k rows — the ops/packing.py
domain_cap pattern, no global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .io import read_events

TOP_HOT = 5


def _key_counts(ds, key: str):
    from ..functions.exchange import coalesced

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "n"])

    # bound the exchange width to the data, not the upstream block
    # count (the post-combiner stream is key-set-sized per block but
    # the shuffle's task fan-out would still track corpus blocks)
    part = ds.map_batches(partial, batch_format="pyarrow").materialize()
    return coalesced(part).groupby(key).sum("n")


def key_skew(ds, key: str):
    """(freq_bucket, n_keys, n_rows) — log2-bucket histogram of key
    frequencies for ``key`` in ``ds``."""
    counts = _key_counts(ds, key)

    def to_buckets(t: pa.Table) -> pa.Table:
        n = np.asarray(t.column("sum(n)"), np.int64)
        b = np.floor(np.log2(n)).astype(np.int64)
        g = (
            pd.DataFrame({"freq_bucket": b, "n": n})
            .groupby("freq_bucket", sort=False)
            .agg(n_keys=("n", "size"), n_rows=("n", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        counts.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("freq_bucket")
        .sum(["n_keys", "n_rows"])
        .map_batches(
            lambda t: t.rename_columns(["freq_bucket", "n_keys", "n_rows"]),
            batch_format="pyarrow",
        )
    )


def hot_keys(ds, key: str, k: int = TOP_HOT):
    """(key, n_rows, rank) — the k hottest keys, exact (per-block
    partial top-k + one tiny driver finalize; ties broken by key ASC)."""
    counts = _key_counts(ds, key)

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["sum(n)", key], ascending=[False, True]).head(k),
            preserve_index=False,
        )

    top = (
        counts.map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()  # <= num_blocks * k rows
        .sort_values(["sum(n)", key], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top = top.rename(columns={"sum(n)": "n_rows"})
    top["n_rows"] = top["n_rows"].astype(np.int64)
    return top[[key, "n_rows", "rank"]]


def events_key_skew(sf_dir: str):
    """Skew profile of events.user_id."""
    return key_skew(read_events(sf_dir, ["user_id"]), "user_id")


def events_hot_keys(sf_dir: str):
    """The exact hottest events.user_id keys."""
    return hot_keys(read_events(sf_dir, ["user_id"]), "user_id")


EVENTS_KEY_SKEW_SQL = """WITH c AS (
  SELECT user_id, COUNT(*)::BIGINT AS n FROM events GROUP BY user_id
)
SELECT CAST(floor(log2(n)) AS BIGINT) AS freq_bucket,
       COUNT(*)::BIGINT AS n_keys, SUM(n)::BIGINT AS n_rows
FROM c GROUP BY 1"""

EVENTS_HOT_KEYS_SQL = f"""WITH c AS (
  SELECT user_id, COUNT(*)::BIGINT AS n FROM events GROUP BY user_id
)
SELECT user_id, n AS n_rows,
       row_number() OVER (ORDER BY n DESC, user_id)::BIGINT AS rank
FROM c ORDER BY n DESC, user_id LIMIT {TOP_HOT}"""
