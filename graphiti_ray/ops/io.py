"""Shared readers for the driver tables.

Why not plain ``read_parquet``: at the test tiers each table is ONE
parquet file, and Ray plans a single-file read as ONE read task +
SplitBlocks. The split blocks cannot fuse with the downstream
``map_batches``, so a CPU-heavy first stage serializes behind one
scheduling queue (measured 3.2s -> 1.3s on the sf0.1 feature stage).
``override_num_blocks`` restores many independent read tasks, each of
which fuses with its map work. At production scale the input is many
files and the default plan already yields many read tasks — the block
override keeps the LOCAL plan shaped like the at-scale plan.

Block count: ~2048 rows per block (the same sizing rule as
sources/pages.synthetic_pages), floor 8 so tiny tiers still parallelize,
cap 64 so sf0.001 doesn't pay per-task overhead on 3-row blocks.
"""

from __future__ import annotations

import pyarrow.parquet as pq


def _num_blocks(path: str) -> int:
    n = pq.read_metadata(path).num_rows
    return max(8, min(64, n // 2048 or 8))


def read_table(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    return rd.read_parquet(
        path, columns=columns, override_num_blocks=_num_blocks(path)
    )


def read_documents(sf_dir: str, columns: list[str] | None = None):
    return read_table(sf_dir, "documents", columns)


def read_events(sf_dir: str, columns: list[str] | None = None):
    return read_table(sf_dir, "events", columns)


def read_embeddings(sf_dir: str, columns: list[str] | None = None):
    return read_table(sf_dir, "embeddings", columns)
