"""Per-user 3-sigma outlier detection over the event stream, in EXACT
integer arithmetic — the anomaly-audit aggregate beside
events_key_skew / events_quantiles.

The float-free trick: quantize each value once
(``xm = floor(value*1000 + 0.5)`` — identical IEEE ops on the same
parquet double in both engines), then the population z-test
``(x - mean)^2 > 9 * var`` multiplies out to the all-integer
``(n*xm - S)^2 > 9 * (n*X2 - S^2)`` with S = sum(xm), X2 = sum(xm^2).
No division, no sqrt, no epsilon — the mirror (HUGEINT arithmetic)
matches bit-for-bit, including boundary events. The mean/variance are
population moments WITH the candidate event included (both sides
identical; the self-inclusion slightly shrinks z for true outliers —
documented, not hidden).

Scale shape: ONE user-bucketed exchange (pid = hash(user) % width);
the per-bucket kernel is vectorized pandas groupby-transform over
every user in the bucket — no per-user Python. int64 is exact while
``n * max|xm| + max|S| < 1e9``: that bound covers BOTH sides of the
inequality — LHS (n*xm - S)^2 ≤ bound^2 = 1e18 and RHS
9*(n*X2 - S^2) ≤ 9*(n*max|xm|)^2 ≤ 9*bound^2 = 9e18 < 2^63 (a 3e9
bound would keep the LHS safe but let the 9× RHS wrap silently at
n·|xm| ≈ 1.5e9, e.g. one user with 500k events at |value|≈3).
The kernel checks the bound per bucket and falls back to Python-int
(object) arithmetic above it, so correctness never depends on the
corpus staying small.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_INT64_SAFE = 1_000_000_000  # 9 * bound^2 = 9e18 < 2^63: RHS-safe too


def events_anomaly(sf_dir: str, int64_safe: int | None = None):
    """(user_id, n_events, n_outliers) per user; outlier = event with
    (n*xm - S)^2 > 9*(n*X2 - S^2). ``int64_safe`` overrides the
    vectorized-path bound (captured BY VALUE into the worker closure —
    pass 0 to force the exact big-int path everywhere, as the parity
    test does)."""
    safe = _INT64_SAFE if int64_safe is None else int64_safe
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.exchange import bounded_group_map
    from ..functions.hashing import bucket_array
    from ..functions.exchange import exchange_width

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "value"],
    )

    def quantize(t: pa.Table) -> pa.Table:
        xm = pc.floor(
            pc.add(pc.multiply(t.column("value"), 1000.0), 0.5)
        ).cast(pa.int64())
        uid = t.column("user_id")
        return pa.table(
            {
                "user_id": uid,
                "xm": xm,
                "pid": pa.array(
                    bucket_array(
                        pc.cast(uid, pa.string()),
                        exchange_width(),
                        salt="anom",
                    )
                ),
            }
        )

    keyed = ev.map_batches(quantize, batch_format="pyarrow")

    def detect(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")["xm"]
        n = g.transform("size").to_numpy()
        s = g.transform("sum").to_numpy()
        xm = df["xm"].to_numpy()
        x2 = (
            df.assign(sq=df["xm"] * df["xm"])
            .groupby("user_id")["sq"]
            .transform("sum")
            .to_numpy()
        )
        if np.abs(xm).max(initial=0) * n.max(initial=1) + np.abs(
            s
        ).max(initial=0) < safe:
            lhs = (n * xm - s).astype(np.int64) ** 2
            rhs = 9 * (n * x2 - s * s)
            out = lhs > rhs
        else:  # exact fallback: Python ints never overflow
            out = np.fromiter(
                (
                    (int(ni) * int(x) - int(si)) ** 2
                    > 9 * (int(ni) * int(x2i) - int(si) ** 2)
                    for ni, x, si, x2i in zip(n, xm, s, x2)
                ),
                dtype=bool,
                count=len(xm),
            )
        res = (
            pd.DataFrame(
                {"user_id": df["user_id"], "out": out.astype(np.int64)}
            )
            .groupby("user_id", as_index=False)
            .agg(n_events=("out", "size"), n_outliers=("out", "sum"))
        )
        res["n_events"] = res["n_events"].astype(np.int64)
        res["n_outliers"] = res["n_outliers"].astype(np.int64)
        return res

    return bounded_group_map(keyed, "pid", detect, batch_format="pandas")


EVENTS_ANOMALY_SQL = """
WITH an_e AS (
  SELECT user_id,
    CAST(floor(value * 1000 + 0.5) AS HUGEINT) AS xm
  FROM events
), an_s AS (
  SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
    sum(xm) AS s, sum(xm * xm) AS x2
  FROM an_e GROUP BY 1
)
SELECT e.user_id, CAST(s.n AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN (s.n * e.xm - s.s) * (s.n * e.xm - s.s)
                     > 9 * (s.n * s.x2 - s.s * s.s)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM an_e e JOIN an_s s USING (user_id)
GROUP BY 1, 2
"""
