"""Distributed Count-Min sketch (Cormode & Muthukrishnan 2005) with
heavy-hitter estimates — the frequency-sketch sibling of ops/hll.py's
cardinality sketch.

Scale shape: ONE streaming ``map_batches`` pass computes per-block
partial COUNTERS — at most d×w = 2048 ``(row, bucket, cnt)`` rows per
block regardless of block size (``np.unique`` + ``np.add.at`` inside
the block, md5 only over the block's DISTINCT keys) — then the same
combiner tree as the HLL merge (local vectorized groupby-sum per tree
level, single-block finalize). The exact top-k probe keys ride the
same tree as per-block partial key counts; THOSE rows are bounded by
the block's distinct keys, not by the sketch, so the exchange is
sketch-bounded only when key cardinality is modest — for a
high-cardinality column at 100 TB you would drop the exact ride-along
and probe the sketch with an externally supplied key list instead
(the sketch half stays ``2048 × blocks`` rows regardless).

Determinism contract: each key is md5-hashed ONCE
(``md5_hash64(key, salt="cms|")`` == DuckDB
``md5_number_lower('cms|' || CAST(key AS VARCHAR))``) and row i's
bucket is the i-th 16-bit slice of that hash mod w — one hash per
distinct key instead of d salted hashes (md5 bits are uniform and the
disjoint slices are independent, which is all CMS's pairwise-
independence analysis needs). Counters and estimates are pure integer
counts and the probe set is the exact top-k by
``(count DESC, key ASC)``, so the SQL mirror reproduces the counters,
the probe set, AND every estimate bit-for-bit. The CMS guarantee
(estimate >= exact, overshoot <= eN with e = e/w at failure prob
(1/2)^d) is pinned by the pytest invariant, not assumed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CMS_D = 4
CMS_W = 512
CMS_TOPK = 10
CMS_SALT = "cms|"

# skewed-ish count columns; int64 keys stringify identically in
# Python str() and DuckDB CAST(.. AS VARCHAR)
CMS_COLS = [("events", "user_id"), ("lineitem", "l_partkey")]


def _buckets(h: np.ndarray, i: int) -> np.ndarray:
    """Row i's bucket: the i-th 16-bit slice of the key hash, mod w."""
    return (
        ((h >> np.uint64(16 * i)) & np.uint64(0xFFFF)) % np.uint64(CMS_W)
    ).astype(np.int64)


def _partial(t: pa.Table, tc: str, col: str) -> pa.Table:
    import pyarrow.compute as pc2

    from ..functions.hashing import md5_hash64_vec

    vc = pc2.value_counts(t.column(col).cast(pa.string()))
    keys_arr = vc.field("values")
    cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    keys = keys_arr.to_numpy(zero_copy_only=False)
    h = md5_hash64_vec(keys_arr, salt=CMS_SALT)
    out_tc, out_row, out_bucket, out_cnt = [], [], [], []
    for i in range(CMS_D):
        counter = np.zeros(CMS_W, dtype=np.int64)
        np.add.at(counter, _buckets(h, i), cnts)
        nz = np.nonzero(counter)[0]
        out_tc.append(np.full(len(nz), tc, dtype=object))
        out_row.append(np.full(len(nz), i, dtype=np.int64))
        out_bucket.append(nz.astype(np.int64))
        out_cnt.append(counter[nz])
    # exact-count partials ride along tagged row = -1, bucket = -1
    out_tc.append(np.full(len(keys), tc, dtype=object))
    out_row.append(np.full(len(keys), -1, dtype=np.int64))
    out_bucket.append(np.full(len(keys), -1, dtype=np.int64))
    out_cnt.append(cnts.astype(np.int64))
    key_col = np.concatenate(
        [np.full(sum(len(x) for x in out_bucket[:-1]), "", dtype=object), keys]
    )
    return pa.table(
        {
            "tc": pa.array(np.concatenate(out_tc), pa.string()),
            "row": pa.array(np.concatenate(out_row), pa.int64()),
            "bucket": pa.array(np.concatenate(out_bucket), pa.int64()),
            "key": pa.array(key_col, pa.string()),
            "cnt": pa.array(np.concatenate(out_cnt), pa.int64()),
        }
    )


def cms_heavy_hitters(sf_dir: str):
    """(tbl, col, key, exact_count, cms_estimate) for each column's
    exact top-CMS_TOPK keys."""
    import os

    import pandas as pd
    import ray.data as rd

    from ..functions.exchange import exchange_width
    from ..functions.hashing import md5_hash64

    parts = []
    for tbl, col in CMS_COLS:
        ds = rd.read_parquet(
            os.path.join(sf_dir, f"{tbl}.parquet"), columns=[col]
        )
        parts.append(
            ds.map_batches(
                lambda t, tc=f"{tbl}.{col}", col=col: _partial(t, tc, col),
                batch_format="pyarrow",
            )
        )

    partials = parts[0].union(*parts[1:])

    def local_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["tc", "row", "bucket", "key"], as_index=False
        )["cnt"].sum()

    combined = partials.repartition(exchange_width()).map_batches(
        local_sum, batch_format="pandas", batch_size=None
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(
            ["tc", "row", "bucket", "key"], as_index=False
        )["cnt"].sum()
        out = []
        for tc, grp in df.groupby("tc"):
            tbl, col = tc.split(".", 1)
            counters = {
                (int(r), int(b)): int(c)
                for r, b, c in zip(
                    grp["row"], grp["bucket"], grp["cnt"]
                )
                if r >= 0
            }
            exact = grp[grp["row"] == -1][["key", "cnt"]]
            top = exact.sort_values(
                ["cnt", "key"], ascending=[False, True]
            ).head(CMS_TOPK)
            for k, c in zip(top["key"], top["cnt"]):
                hk = md5_hash64(k, salt=CMS_SALT)
                est = min(
                    counters.get(
                        (i, ((hk >> (16 * i)) & 0xFFFF) % CMS_W), 0
                    )
                    for i in range(CMS_D)
                )
                out.append(
                    {
                        "tbl": tbl,
                        "col": col,
                        "key": k,
                        "exact_count": int(c),
                        "cms_estimate": est,
                    }
                )
        return pd.DataFrame(out)

    # batch_size=None: the merged single block must finalize as ONE
    # batch (top-k + counters must see everything).
    return combined.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None
    )


def _sql_key_union() -> str:
    return "\n  UNION ALL\n".join(
        f"  SELECT '{tbl}.{col}' AS tc, CAST({col} AS VARCHAR) AS k"
        f" FROM {tbl}"
        for tbl, col in CMS_COLS
    )


def _sql_row_union() -> str:
    return " UNION ALL ".join(f"SELECT {i} AS r" for i in range(CMS_D))


CMS_HEAVY_HITTERS_SQL = f"""
WITH cms_keys AS (
{_sql_key_union()}
), cms_counts AS (
  SELECT tc, k, count(*) AS cnt FROM cms_keys GROUP BY 1, 2
), cms_top AS (
  SELECT tc, k, cnt FROM cms_counts
  QUALIFY row_number() OVER (
    PARTITION BY tc ORDER BY cnt DESC, k ASC
  ) <= {CMS_TOPK}
), cms_rows AS ({_sql_row_union()}),
cms_h AS (
  SELECT tc, k, cnt, md5_number_lower('{CMS_SALT}' || k) AS hv
  FROM cms_counts
), cms_counters AS (
  SELECT h.tc, r.r,
    CAST(((h.hv >> (16 * r.r)) & 65535::UBIGINT) % {CMS_W}::UBIGINT
         AS BIGINT) AS bucket,
    SUM(h.cnt) AS cnt
  FROM cms_h h CROSS JOIN cms_rows r
  GROUP BY 1, 2, 3
), cms_est AS (
  SELECT t.tc, t.k, t.cnt AS exact_count,
    min(ct.cnt) AS cms_estimate
  FROM cms_top t
  JOIN cms_rows r ON true
  JOIN cms_counters ct ON ct.tc = t.tc AND ct.r = r.r
    AND ct.bucket = CAST(
      ((md5_number_lower('{CMS_SALT}' || t.k) >> (16 * r.r))
       & 65535::UBIGINT) % {CMS_W}::UBIGINT AS BIGINT)
  GROUP BY 1, 2, 3
)
SELECT split_part(tc, '.', 1) AS tbl, split_part(tc, '.', 2) AS col,
  k AS key, CAST(exact_count AS BIGINT) AS exact_count,
  CAST(cms_estimate AS BIGINT) AS cms_estimate
FROM cms_est
"""
