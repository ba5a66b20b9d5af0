"""First-class relational join operators over the TPC-H-ish tables —
the generic equi-join surface of the engine, driver-checkable against
trivial SQL.

Two scale shapes, matching SURVEY.md §4's join policy:

- ``join_broadcast``: dimension tables (customer, nation) are tiny
  relative to the fact table, so each is shipped ONCE through the
  tiered ``stages.joins.lookup_column`` (ray.put broadcast at this
  size; sharded parquet past the byte/row caps) and probed inside
  ``map_batches`` — no shuffle of the fact table at all.
- ``join_shuffle``: fact ⋈ fact (lineitem ⋈ orders), where neither
  side broadcasts at 100-TB scale. ONE bucketed exchange: both sides
  are tagged with ``bucket = hash(key) % N`` and unioned, and each
  bucket's reducer does a vectorized pandas hash-join — the
  union+bucket+in-reducer-merge pattern used everywhere in this repo
  instead of ``Dataset.join`` (which rejects list payloads and breaks
  on self-join chains in Ray 2.49).

Money stays integer: cents = floor(price*100 + 0.5) (the same
double-rounding expression in numpy and DuckDB), so revenue in
cents·(100-disc) is exact and the value-hash compare is float-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

JOIN_BUCKETS = 64  # shuffle granularity for the large-large join


def _read(sf_dir: str, table: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ----------------------------------------------------- broadcast join

def join_broadcast(sf_dir: str):
    """Orders enriched with the customer's nation (two broadcast
    lookups), aggregated to one row per nation: n_orders + total order
    value in cents. The fact table streams; only the dimension rows
    move."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import lookup_column

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"o_custkey": t.column("o_custkey"), "cents": c})

    o = orders.map_batches(cents, batch_format="pyarrow")
    o = lookup_column(o, "o_custkey", customer, "c_custkey", "c_nationkey",
                      "nationkey", mapping_rows=customer.count())
    o = lookup_column(o, "nationkey", nation, "n_nationkey", "n_name",
                      "n_name", mapping_rows=nation.count())
    return o.groupby("n_name").aggregate(
        Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents")
    )


JOIN_BROADCAST_SQL = """
SELECT n.n_name,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


# ------------------------------------------------------- shuffle join

def _tag_lineitem(t: pa.Table) -> pa.Table:
    keys = t.column("l_orderkey").to_numpy()
    price = pc.cast(
        pc.floor(pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)),
        pa.int64(),
    ).to_numpy()
    disc = pc.cast(
        pc.floor(pc.add(pc.multiply(t.column("l_discount"), 100.0), 0.5)),
        pa.int64(),
    ).to_numpy()
    return pa.table(
        {
            "bucket": pa.array((keys % JOIN_BUCKETS).astype(np.int32)),
            "orderkey": pa.array(keys, pa.int64()),
            # revenue in cents x (100 - disc_pct): integer-exact
            "rev": pa.array(price * (100 - disc), pa.int64()),
            "priority": pa.nulls(t.num_rows, pa.string()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        }
    )


def _tag_orders(t: pa.Table) -> pa.Table:
    keys = t.column("o_orderkey").to_numpy()
    return pa.table(
        {
            "bucket": pa.array((keys % JOIN_BUCKETS).astype(np.int32)),
            "orderkey": pa.array(keys, pa.int64()),
            "rev": pa.array(np.zeros(len(keys), dtype=np.int64)),
            "priority": t.column("o_orderpriority"),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        }
    )


def _bucket_join(df: pd.DataFrame) -> pd.DataFrame:
    """One key bucket: vectorized hash-join (pd.merge) of the two
    sides, then a local partial aggregate so the final exchange carries
    one row per (bucket, priority)."""
    left = df[df["side"] == 0]
    right = df[df["side"] == 1][["orderkey", "priority"]]
    m = left[["orderkey", "rev"]].merge(right, on="orderkey", how="inner")
    g = m.groupby("priority", as_index=False).agg(
        n_items=("rev", "size"), rev_sum=("rev", "sum")
    )
    return g


def join_shuffle(sf_dir: str):
    """lineitem ⋈ orders on orderkey (large-large): one bucketed
    exchange co-locates both sides, per-bucket pandas hash-join +
    partial aggregate, then a tiny groupby finalizes per-priority
    revenue."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    both = li.map_batches(_tag_lineitem, batch_format="pyarrow").union(
        od.map_batches(_tag_orders, batch_format="pyarrow")
    )
    part = both.groupby("bucket").map_groups(_bucket_join, batch_format="pandas")
    return part.groupby("priority").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("rev_sum", alias_name="revenue"),
    )


JOIN_SHUFFLE_SQL = """
SELECT o.o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""
