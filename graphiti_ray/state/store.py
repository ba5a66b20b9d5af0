"""On-disk KG store reader: partition-pruned loads of the tables that
run_kg_to_dir materializes (S4/S5/S6 storage layer).

Layout (pipelines/kg.run_kg_to_dir): one hive-partitioned parquet
directory per table (episodes/nodes/edges/mentions/triples,
``partition_id=<p>/``) plus ``_manifest/`` lineage parquet. Loading a
subset of partitions reads ONLY those directories (partition pruning at
the filesystem level — nothing else leaves storage), the on-disk analog
of the reference's group-scoped Cypher reads (nodes.py:220-252).

Note: hive-partition columns read back as string; ``load_table``
restores ``partition_id`` to int32.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

TABLES = ("episodes", "nodes", "edges", "mentions", "triples")


def available_partitions(kg_dir: str, table: str = "nodes") -> list[int]:
    tdir = os.path.join(kg_dir, table)
    if not os.path.isdir(tdir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(tdir)
        if d.startswith("partition_id=")
    )


def load_table(kg_dir: str, table: str, partitions: list[int] | None = None):
    """Read one KG table; with ``partitions``, only those hive dirs are
    listed and read (column-pruned, partition-pruned read)."""
    import ray.data as rd

    tdir = os.path.join(kg_dir, table)
    if partitions is None:
        paths = tdir
    else:
        paths = [
            os.path.join(tdir, f"partition_id={p}")
            for p in partitions
            if os.path.isdir(os.path.join(tdir, f"partition_id={p}"))
        ]
        if not paths:
            return rd.from_arrow(pa.table({"partition_id": pa.array([], pa.int32())}))
    ds = rd.read_parquet(paths)

    def fix_partition(t: pa.Table) -> pa.Table:
        if "partition_id" in t.schema.names:
            i = t.schema.get_field_index("partition_id")
            return t.set_column(
                i, "partition_id", pc.cast(t.column("partition_id"), pa.int32())
            )
        return t

    return ds.map_batches(fix_partition, batch_format="pyarrow")


def load_manifest(kg_dir: str):
    """Lineage records: one row per (run, partition) with per-table row
    counts and wall time."""
    import ray.data as rd

    mdir = os.path.join(kg_dir, "_manifest")
    return rd.read_parquet(mdir)
