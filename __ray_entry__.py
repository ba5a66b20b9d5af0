"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime
from typing import Any

NOW = datetime(2026, 1, 1)  # deterministic expired_at stamp


def entry() -> Any:
    """Flagship pipeline at sf0.001: synthetic Common-Crawl-style pages
    -> full KG construction -> (subj, pred, obj) triples Dataset."""
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.pages import synthetic_pages

    kg = build_kg(synthetic_pages("/root/testdata/sf0.001"), now=NOW, concurrency=4)
    return kg.triples


def queries() -> dict[str, Callable[[str], Any]]:
    from graphiti_ray import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    from graphiti_ray import queries as q

    return q.ORACLE_SQL
