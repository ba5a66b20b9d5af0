"""graphiti_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the *semantics* of Graphiti (reference:
mateicanavra/graphiti, Zep's graphiti_core v0.8.5) as a batch, columnar,
streaming Ray Data pipeline over Common-Crawl-style Parquet web pages:

    pages(url, warc_ts, html, text, lang)
        -> episodes (html->text, byte-identical per url)
        -> mention + relation extraction (actor pools, deterministic default)
        -> entity canonicalization (exact + blocked near-dup + connected components)
        -> edge resolution (pair-group dedupe + bi-temporal invalidation sweep)
        -> canonical nodes / edges / mentions / triples Parquet

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow blocks, actor pools for stateful
stages, explicit ``groupby`` shuffles with documented partition keys.
No code is ported from the reference; reference files are cited by
``file:line`` in docstrings for semantic parity only.
"""

__version__ = "0.1.0"

EMBEDDING_DIM = 256
"""Embedding dimensionality. The reference uses 1024
(graphiti_core/embedder/client.py:22); we default to 256 for the
deterministic hash embedder (4x cheaper shuffles, same blocking recall at
our corpus sizes). Pluggable per stage."""
