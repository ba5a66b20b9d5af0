"""Distributed HyperLogLog distinct-count sketch (Flajolet et al. 2007).

Scale shape: ONE streaming ``map_batches`` pass computes per-block
partial registers — at most m=1024 ``(bucket, rho)`` rows per block
regardless of block size — then a register max-merge ``groupby`` whose
map-side combiner keeps the exchange at O(m) rows per block, then a
per-column finalize over at most m rows. Nothing is collected on the
driver; sketching a 100-TB column moves ``m × blocks`` 3-int rows
through one exchange and the answer is 4 summary rows.

Determinism contract: the value hash is ``md5_hash64`` (== DuckDB
``md5_number_lower('hll|' || CAST(v AS VARCHAR))``), and the estimate
is the raw HLL harmonic-mean formula evaluated in EXACT integer
arithmetic — Z is kept scaled by 2^55 (every ``2^(55-rho)`` term is an
integer), alpha_m is the rational ``7213000·m / (10000·(1000m+1079))``
(= 0.7213/(1+1.079/m) to 4 decimals) — so the DuckDB mirror reproduces
registers AND estimate bit-for-bit. The small-range linear-counting
correction is deliberately omitted (it needs ``ln``, which is not
reproducible across engines in exact arithmetic); ``n_zero_registers``
is emitted so a consumer can apply it, and the pytest invariant checks
the raw estimate lands within the theoretical ~1.04/sqrt(m) relative
error band of the exact count on the dense columns.

Hashing is the vectorized single-block MD5
(``functions.hashing.md5_hash64_vec`` — bit-identical to DuckDB
``md5_number_lower``, numpy-vectorized over the whole block), fed by
``pyarrow.compute.unique`` so the partial pass never materializes
Python string objects. SQL mirrorability costs nothing anymore: the
vectorized hash IS md5.

Reference parity note: the reference engine has no sketch family at
all; this is part of the beyond-reference large-scale-pipeline
surface (SURVEY.md §2, training-data ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
_W = 64 - HLL_P  # low-bit width used for the rho (leading-zero) count
_MASK = np.uint64((1 << _W) - 1)
HLL_SALT = "hll|"

# (table, column) pairs sketched by the driver-facing query. int64 key
# columns stringify identically in Python str() and DuckDB
# CAST(.. AS VARCHAR), which the hash pairing depends on.
SKETCH_COLS = [
    ("events", "event_id"),
    ("events", "user_id"),
    ("orders", "o_custkey"),
    ("lineitem", "l_partkey"),
]


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (binary-search shifts —
    float log2 is NOT exact above 2^53)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        bl[m] += s
        v[m] >>= np.uint64(s)
    return bl + (v > 0)


def partial_registers(values: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(buckets, rhos) of the NON-ZERO registers for one block."""
    import pyarrow.compute as pc

    from ..functions.hashing import md5_hash64_vec

    keys = pc.unique(values.cast(pa.string()))
    if len(keys) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    h = md5_hash64_vec(keys, salt=HLL_SALT)
    bucket = (h >> np.uint64(_W)).astype(np.int64)
    w = h & _MASK
    rho = np.where(w == 0, _W + 1, _W + 1 - _bit_length_u64(w)).astype(np.int64)
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    nz = np.nonzero(regs)[0]
    return nz.astype(np.int64), regs[nz]


def finalize_registers(rhos: np.ndarray) -> dict[str, int]:
    """Exact-integer raw-HLL summary from the merged non-zero registers."""
    n_zero = HLL_M - len(rhos)
    sum_rho = int(np.sum(rhos)) if len(rhos) else 0
    z_scaled = n_zero * (1 << (_W + 1)) + sum(
        1 << (_W + 1 - int(r)) for r in rhos
    )
    est_milli = (7213000 * HLL_M**3 * (1 << (_W + 1)) * 1000) // (
        10000 * (1000 * HLL_M + 1079) * z_scaled
    )
    return {
        "m": HLL_M,
        "n_zero_registers": n_zero,
        "sum_rho": sum_rho,
        "estimate_milli": est_milli,
    }


def hll_distinct(sf_dir: str):
    """Sketch every column in SKETCH_COLS; one summary row per column."""
    import os

    import pandas as pd
    import ray.data as rd

    from ..functions.exchange import exchange_width

    # one read lane PER TABLE (not per column): both events sketches
    # come off a single columnar scan, so the table's bytes leave
    # storage once
    by_tbl: dict[str, list[str]] = {}
    for tbl, col in SKETCH_COLS:
        by_tbl.setdefault(tbl, []).append(col)

    parts = []
    for tbl, cols in by_tbl.items():
        ds = rd.read_parquet(
            os.path.join(sf_dir, f"{tbl}.parquet"), columns=cols
        )

        def partial(t: pa.Table, tbl=tbl, cols=tuple(cols)) -> pa.Table:
            tcs, bs, rs = [], [], []
            for col in cols:
                b, r = partial_registers(t.column(col))
                tcs.append(pa.array([f"{tbl}.{col}"] * len(b), pa.string()))
                bs.append(b)
                rs.append(r)
            return pa.table(
                {
                    "tc": pa.concat_arrays(tcs),
                    "bucket": pa.array(np.concatenate(bs), pa.int64()),
                    "rho": pa.array(np.concatenate(rs), pa.int64()),
                }
            )

        parts.append(ds.map_batches(partial, batch_format="pyarrow"))

    partials = parts[0].union(*parts[1:])

    # register max-merge as a combiner TREE, not a sort shuffle: each
    # level's task max-merges its batch down to <= |cols|*m rows with
    # one vectorized pandas groupby, so the final single-block merge
    # sees width * |cols| * m tiny rows. (A sort-based
    # groupby(tc,bucket) costs as much as the whole sketch pass for a
    # 4096-key aggregate. At extreme block counts add one more tree
    # level before the final merge; each level is a fixed-fan-in
    # repartition of 3-int rows.)
    def local_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["tc", "bucket"], as_index=False)["rho"].max()
        )

    combined = partials.repartition(exchange_width()).map_batches(
        local_merge, batch_format="pandas", batch_size=None
    )

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["tc", "bucket"], as_index=False)["rho"].max()
        rows = []
        for tc, grp in df.groupby("tc"):
            tbl, col = tc.split(".", 1)
            s = finalize_registers(grp["rho"].to_numpy())
            rows.append(
                {
                    "tbl": tbl,
                    "col": col,
                    "m": s["m"],
                    "n_zero_registers": s["n_zero_registers"],
                    "sum_rho": s["sum_rho"],
                    "estimate_milli": s["estimate_milli"],
                }
            )
        return pd.DataFrame(rows)

    # batch_size=None: the single merged block MUST arrive as one
    # batch, or per-tc summaries would be emitted per sub-batch.
    return combined.repartition(1).map_batches(
        summarize, batch_format="pandas", batch_size=None
    )


def _sql_key_union() -> str:
    return "\n  UNION ALL\n".join(
        f"  SELECT '{tbl}' AS tbl, '{col}' AS col,\n"
        f"         '{HLL_SALT}' || CAST({col} AS VARCHAR) AS k FROM {tbl}"
        for tbl, col in SKETCH_COLS
    )


HLL_DISTINCT_SQL = f"""
WITH keys AS (
{_sql_key_union()}
), h AS (
  SELECT tbl, col, md5_number_lower(k) AS hv FROM keys
), br AS (
  SELECT tbl, col, CAST(hv >> {_W} AS BIGINT) AS bucket,
    CASE WHEN (hv & {(1 << _W) - 1}::UBIGINT) = 0::UBIGINT THEN {_W + 1}
         ELSE {_W + 1} - length(bin(hv & {(1 << _W) - 1}::UBIGINT))
    END AS rho
  FROM h
), regs AS (
  SELECT tbl, col, bucket, max(rho) AS rho FROM br GROUP BY 1, 2, 3
), summ AS (
  SELECT tbl, col,
    {HLL_M} - count(*) AS n_zero,
    CAST(sum(rho) AS BIGINT) AS sum_rho,
    CAST({HLL_M} - count(*) AS HUGEINT) * (1::HUGEINT << {_W + 1})
      + CAST(sum(1::HUGEINT << ({_W + 1} - rho)) AS HUGEINT) AS z_scaled
  FROM regs GROUP BY 1, 2
)
SELECT tbl, col, CAST({HLL_M} AS BIGINT) AS m,
  CAST(n_zero AS BIGINT) AS n_zero_registers, sum_rho,
  CAST((7213000::HUGEINT * {HLL_M**3} * (1::HUGEINT << {_W + 1}) * 1000)
    // (10000::HUGEINT * {1000 * HLL_M + 1079} * z_scaled) AS BIGINT)
    AS estimate_milli
FROM summ
"""
