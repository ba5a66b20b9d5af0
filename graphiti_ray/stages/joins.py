"""Join helpers: broadcast lookup vs partitioned hash join.

Policy (SURVEY.md §4 / ray_guide joins): a small side is ray.put once
and read inside the stage (never re-shipped per batch); a large side
uses ``Dataset.join`` (hash-partitioned). ``lookup_column`` picks
automatically by row count.
"""

from __future__ import annotations

import pyarrow as pa

BROADCAST_MAX_ROWS = 5_000_000


def broadcast_map(ds, key_col: str, val_col: str) -> dict:
    """Materialize a two-column mapping to a driver dict for ray.put.
    Only call when ds.count() is known-small (<= BROADCAST_MAX_ROWS)."""
    out: dict = {}
    for batch in ds.select_columns([key_col, val_col]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        ks = batch.column(key_col).to_pylist()
        vs = batch.column(val_col).to_pylist()
        out.update(zip(ks, vs))
    return out


def lookup_column(
    target_ds,
    on: str,
    mapping_ds,
    key_col: str,
    val_col: str,
    out_col: str,
    mapping_rows: int | None = None,
):
    """Append ``out_col`` = mapping[on] to target_ds.

    Broadcast path when the mapping is small; Dataset.join otherwise.
    """
    import ray

    n = mapping_rows if mapping_rows is not None else mapping_ds.count()
    if n <= BROADCAST_MAX_ROWS:
        m = broadcast_map(mapping_ds, key_col, val_col)
        ref = ray.put(m)

        def f(t: pa.Table) -> pa.Table:
            mm = ray.get(ref)
            vals = [mm.get(k) for k in t.column(on).to_pylist()]
            return t.append_column(out_col, pa.array(vals, pa.string()))

        return target_ds.map_batches(f, batch_format="pyarrow")

    # large mapping: hash-partitioned join on the key
    renamed = mapping_ds.select_columns([key_col, val_col]).map_batches(
        lambda t: t.rename_columns([f"__k_{on}", out_col]), batch_format="pyarrow"
    )
    return target_ds.join(
        renamed,
        join_type="left_outer",
        num_partitions=max(16, n // 2_000_000),
        on=(on,),
        right_on=(f"__k_{on}",),
    )
