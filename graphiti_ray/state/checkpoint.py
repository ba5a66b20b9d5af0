"""Stage-boundary checkpoints + per-partition lineage manifests.

The reference has no checkpointing: a partial bulk failure leaves Neo4j
half-written and relies on Cypher MERGE for idempotent replay at best
(models/nodes/node_db_queries.py:17-46). Here (north_rule): a killed run
restarts at PARTITION granularity —

- every output table is written Hive-partitioned by ``partition_id``
  (= hash(group_id) % P); all canonicalization shuffle keys include
  ``group_id``, so a partition is a semantically closed subgraph and can
  be processed/replayed independently;
- a run appends one manifest parquet per completed run under
  ``out/_manifest/`` with per-partition row counts per table (lineage)
  and wall time;
- resume = read manifest, drop completed partition_ids from the input
  at the episodes stage (a cheap vectorized filter before the expensive
  extraction), delete any half-written non-manifested partition dirs,
  process only the remainder;
- deterministic content-hash uuids (functions/hashing.py) make replays
  byte-identical.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid as _uuidlib

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ("episodes", "nodes", "edges", "mentions", "triples")


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done: set[int] = set()
    for f in os.listdir(mdir):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(mdir, f), columns=["partition_id"])
            done.update(t.column("partition_id").to_pylist())
    return done


def clean_incomplete(out_dir: str, completed: set[int]) -> None:
    """Delete partition dirs not covered by a manifest (half-written
    output from a killed run) so re-writes can't duplicate rows."""
    for table in TABLES:
        tdir = os.path.join(out_dir, table)
        if not os.path.isdir(tdir):
            continue
        for sub in os.listdir(tdir):
            if sub.startswith("partition_id="):
                pid = int(sub.split("=", 1)[1])
                if pid not in completed:
                    shutil.rmtree(os.path.join(tdir, sub), ignore_errors=True)


def write_manifest(out_dir: str, rows: list[dict]) -> None:
    """rows: per-partition lineage records:
    {partition_id, episodes, nodes, edges, mentions, triples, wall_s}."""
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("partition_id", pa.int32()),
                ("episodes", pa.int64()),
                ("nodes", pa.int64()),
                ("edges", pa.int64()),
                ("mentions", pa.int64()),
                ("triples", pa.int64()),
                ("wall_s", pa.float64()),
                ("run_ts", pa.float64()),
            ]
        ),
    )
    pq.write_table(t, os.path.join(mdir, f"run-{_uuidlib.uuid4().hex}.parquet"))


def stage_checkpoint(ds, path: str, resume: bool):
    """Write a Dataset to a parquet checkpoint (atomic via _SUCCESS
    marker) and read it back, so downstream branches don't re-execute
    the upstream. On resume with a valid marker, skip the recompute."""
    import ray.data as rd

    marker = os.path.join(path, "_SUCCESS")
    if resume and os.path.exists(marker):
        return rd.read_parquet(path)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    with open(marker, "w") as f:
        json.dump({"ts": time.time()}, f)
    return rd.read_parquet(path)
