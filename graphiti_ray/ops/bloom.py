"""Distributed Bloom-filter membership (Bloom 1970) — the third
sketch beside ops/hll.py (cardinality) and ops/cms.py (frequency):
build a bit set over a member-key column, probe a second column, and
report per-probe membership with the exact answer alongside, so the
filter's one-sided guarantee (NO false negatives; bounded false
positives) is measurable, not assumed.

Build: events.user_id (the member set). Probe: orders.o_custkey
(overlapping integer key space, so true members AND false-positive
candidates both occur).

Determinism contract: one md5 per key
(``md5_hash64(key, salt="bloom|")`` == DuckDB
``md5_number_lower('bloom|' || CAST(v AS VARCHAR))``), hash i of k=4
is the i-th 16-bit slice mod m=4096 bits (the CMS slicing trick) —
the SQL mirror reproduces the bit set and every probe verdict
bit-for-bit.

Scale shape: the member pass emits per-block DISTINCT bit positions
(<= m rows per block regardless of block size); the global bit set is
one tiny distinct exchange (<= m rows total) and travels to the probe
pass through lookup_column's byte-capped broadcast. A probe key's
k positions are expanded IN-BLOCK, so the hits==nbits verdict needs
no exchange at all — membership of a 100-TB probe column is one
streaming pass reading a 4-KB-scale broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BLOOM_M = 4096  # bits
BLOOM_K = 4  # hash functions (16-bit slices of one md5)
BLOOM_SALT = "bloom|"

BLOOM_MEMBER = ("events", "user_id")
BLOOM_PROBE = ("orders", "o_custkey")


def _positions(h: np.ndarray) -> np.ndarray:
    """(n, k) bit positions from the key hashes."""
    cols = [
        ((h >> np.uint64(16 * i)) & np.uint64(0xFFFF))
        % np.uint64(BLOOM_M)
        for i in range(BLOOM_K)
    ]
    return np.stack(cols, axis=1).astype(np.int64)


def _hashes(keys) -> np.ndarray:
    """Vectorized md5 over a pyarrow string array (or any sequence) —
    same bits as DuckDB md5_number_lower('bloom|' || k)."""
    from ..functions.hashing import md5_hash64_vec

    return md5_hash64_vec(keys, salt=BLOOM_SALT)


def bloom_membership(sf_dir: str):
    """(key, is_member, in_bloom) for every distinct probe key; the
    flag columns are 0/1 BIGINT (integer-exact compare convention)."""
    import os

    import ray.data as rd

    from ..stages.joins import lookup_column
    from .graph import _distinct_by_key

    mt, mc = BLOOM_MEMBER
    pt, pc_col = BLOOM_PROBE

    members = rd.read_parquet(
        os.path.join(sf_dir, f"{mt}.parquet"), columns=[mc]
    )

    import ray

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))
        )

    # the probe-side distinct is INDEPENDENT of the member pipeline
    # until the verdict pass — materialize it concurrently so its
    # exchange overlaps the member distinct instead of queueing behind
    # the bits take_all barrier
    from concurrent.futures import ThreadPoolExecutor

    probes_lazy = _distinct_by_key(
        rd.read_parquet(
            os.path.join(sf_dir, f"{pt}.parquet"), columns=[pc_col]
        ).map_batches(
            lambda t: pa.table(
                {"k": t.column(pc_col).cast(pa.string())}
            ),
            batch_format="pyarrow",
        ),
        ["k"],
        "kk",
    )
    pool = ThreadPoolExecutor(max_workers=1)
    f_probes = pool.submit(probes_lazy.materialize)

    member_keys = _distinct_by_key(
        members.map_batches(
            lambda t: pa.table(
                {"k": t.column(mc).cast(pa.string())}
            ),
            batch_format="pyarrow",
        ),
        ["k"],
        "kk",
    ).map_batches(one, batch_format="pyarrow").materialize()
    n_members = member_keys.count()

    # bit set DERIVED from the already-distinct member keys (the exact
    # is_member check needs that exchange anyway — a second full-column
    # distinct pass for the bits would double the exchange cost); each
    # block contributes <= m bit rows, so the final distinct is tiny.
    # The global bit set is <= m = 4096 entries BY CONSTRUCTION — a
    # legitimate tiny collect + ray.put broadcast (the filter itself
    # IS a 512-byte object at scale); only the member-key set (which
    # grows with the corpus) stays behind lookup_column's capped tiers
    def member_bits(t: pa.Table) -> pa.Table:
        keys = t.column("k")
        bits = (
            np.unique(_positions(_hashes(keys)))
            if len(keys)
            else np.empty(0, np.int64)
        )
        return pa.table({"bit": pa.array(bits, pa.int64())})

    bits = _distinct_by_key(
        member_keys.map_batches(member_bits, batch_format="pyarrow"),
        ["bit"],
        "bk",
    )
    bit_arr = np.sort(
        np.asarray(
            [int(r["bit"]) for r in bits.take_all()], dtype=np.int64
        )
    )
    bits_ref = ray.put(bit_arr)

    probes = f_probes.result()
    pool.shutdown()

    # row-wise verdict against the broadcast bit set (np.isin over the
    # (n, k) position matrix); membership can never split across rows
    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["k"].to_numpy(dtype=object)
        if keys.size == 0:
            return pd.DataFrame(
                {
                    "key": pd.Series([], dtype=object),
                    "in_bloom": pd.Series([], dtype=np.int64),
                }
            )
        arr = ray.get(bits_ref)
        pos = _positions(_hashes(pa.array(keys, pa.string())))
        hit = np.isin(pos, arr).all(axis=1)
        return pd.DataFrame(
            {"key": keys, "in_bloom": hit.astype(np.int64)}
        )

    out = probes.map_batches(verdict, batch_format="pandas")
    out = lookup_column(
        out, "key", member_keys, "k", "one", "mem",
        mapping_rows=n_members, val_type=pa.int64(),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["key"],
                "is_member": df["mem"].notna().astype(np.int64),
                "in_bloom": df["in_bloom"].astype(np.int64),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def _slices_sql(src: str) -> str:
    rows = " UNION ALL ".join(f"SELECT {i} AS r" for i in range(BLOOM_K))
    return f"""
  SELECT k, CAST(((hv >> (16 * r)) & 65535::UBIGINT)
                 % {BLOOM_M}::UBIGINT AS BIGINT) AS bit
  FROM {src} CROSS JOIN ({rows})"""


def bloom_membership_sql() -> str:
    mt, mc = BLOOM_MEMBER
    pt, pc_col = BLOOM_PROBE
    return f"""
WITH bm_members AS (
  SELECT DISTINCT CAST({mc} AS VARCHAR) AS k FROM {mt}
), bm_mh AS (
  SELECT k, md5_number_lower('{BLOOM_SALT}' || k) AS hv FROM bm_members
), bm_bits AS (
  SELECT DISTINCT bit FROM ({_slices_sql("bm_mh")})
), bm_probe AS (
  SELECT DISTINCT CAST({pc_col} AS VARCHAR) AS k FROM {pt}
), bm_ph AS (
  SELECT k, md5_number_lower('{BLOOM_SALT}' || k) AS hv FROM bm_probe
), bm_pp AS (
  SELECT DISTINCT k, bit FROM ({_slices_sql("bm_ph")})
), bm_hit AS (
  SELECT p.k, count(*) AS nbits, count(b.bit) AS hits
  FROM bm_pp p LEFT JOIN bm_bits b ON b.bit = p.bit
  GROUP BY p.k
)
SELECT h.k AS key,
  CAST(CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_member,
  CAST(CASE WHEN h.hits = h.nbits THEN 1 ELSE 0 END AS BIGINT)
    AS in_bloom
FROM bm_hit h LEFT JOIN bm_members m ON m.k = h.k
"""
