"""Cluster job entrypoint — the script `ray job submit` runs (north_rule).

On a real multi-node cluster the pipeline ships as a Ray job; the job
agent sets RAY_ADDRESS and this entrypoint connects to the running
cluster:

    ray job submit --working-dir /path/to/repo -- \\
        python -m graphiti_ray.job \\
        --input /mnt/data/pages/ --out /mnt/data/kg/ --concurrency 32

Locally (this sandbox has no job agent; identical code path, own
local session):

    python -m graphiti_ray.job --num-cpus 8 \\
        --input /path/to/pages.parquet --out /tmp/kg

`--input` is a Parquet file/dir with the BASELINE.json input_hint
schema `(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)`; extra columns are pruned at the read. Alternatively
`--synthetic SF_DIR` derives the deterministic oracle-checkable KG
corpus from a testdata documents table
(sources/pages_kg.kg_pages_from_documents) for smoke runs. Output is Hive-partitioned Parquet per table with
per-partition lineage manifests; a killed run re-submitted with
`--resume` (default) restarts at partition granularity
(state/checkpoint.py).

This module owns a Ray session ONLY inside main() (driver contract:
library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .schemas import PAGES

PAGE_COLS = [f.name for f in PAGES]


def load_pages(path: str):
    """Read a pages Parquet table, prune to the contract columns, and
    cast to the PAGES schema (clear error on a shape mismatch)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    if os.path.isdir(path):
        name = next(
            (f for f in sorted(os.listdir(path)) if f.endswith(".parquet")), None
        )
        if name is None:
            raise SystemExit(f"no parquet files found in {path!r}")
        probe = os.path.join(path, name)
    else:
        probe = path
    have = set(pq.read_schema(probe).names)
    missing = [c for c in PAGE_COLS if c not in have]
    if missing:
        raise SystemExit(
            f"input {path!r} is missing required pages columns {missing}; "
            f"expected schema {PAGES}"
        )
    ds = rd.read_parquet(path, columns=PAGE_COLS)
    return ds.map_batches(lambda t: t.cast(PAGES), batch_format="pyarrow")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m graphiti_ray.job",
        description="Build the knowledge graph from a pages Parquet table.",
    )
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages parquet file/dir (url, warc_ts, html, text, lang)")
    src.add_argument("--synthetic", metavar="SF_DIR", help="derive pages from SF_DIR/documents.parquet")
    ap.add_argument("--out", required=True, help="output directory (partitioned parquet + _manifest)")
    ap.add_argument("--concurrency", type=int, default=8, help="extraction actor-pool size")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="start a local Ray session with this many CPUs (omit on a cluster)")
    ap.add_argument("--no-resume", dest="resume", action="store_false",
                    help="reprocess everything, ignoring completed-partition manifests")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
        else:
            # under `ray job submit` the agent sets RAY_ADDRESS; "auto"
            # attaches to the running cluster
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))

    from .pipelines.kg import run_kg_to_dir
    from .sources.pages_kg import kg_pages_from_documents

    # a fixed-size actor pool that reserves every cluster CPU starves
    # the upstream read tasks -> streaming deadlock; keep one CPU free
    total_cpus = int(ray.cluster_resources().get("CPU", args.concurrency + 1))
    concurrency = max(1, min(args.concurrency, total_cpus - 1))

    pages = load_pages(args.input) if args.input else kg_pages_from_documents(args.synthetic)
    report = run_kg_to_dir(
        pages, args.out, resume=args.resume, concurrency=concurrency
    )
    report["out"] = args.out
    print(json.dumps(report))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
