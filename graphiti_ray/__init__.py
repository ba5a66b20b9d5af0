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


def _settle_optional_fsspec_http() -> None:
    """Pre-resolve the OPTIONAL ``fsspec.implementations.http`` module
    once, single-threaded, at package import.

    Ray Data's path resolution re-attempts ``from
    fsspec.implementations.http import HTTPFileSystem`` on EVERY
    read/write (ray/data/datasource/path_util.py:151); when aiohttp is
    absent the import fails, Python evicts the half-built module, and
    the NEXT attempt imports from scratch — so two threads writing
    concurrently (e.g. this engine's branch materializations spilling
    lookup shards) can race the import machinery and surface
    ``ImportError: cannot import name 'HTTPFileSystem'`` instead of the
    ModuleNotFoundError Ray handles. Installing a stub module with a
    placeholder class makes every later import a race-free sys.modules
    hit; the placeholder raises only if something actually tries to
    open an http:// URL, which this engine never does."""
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # real module available: nothing to settle
    except ModuleNotFoundError:
        pass
    except Exception:  # fsspec itself missing/broken: leave as-is
        return
    import types

    stub = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # placeholder, constructor-only guard
        def __init__(self, *a, **kw):
            raise ModuleNotFoundError(
                "fsspec HTTPFileSystem needs aiohttp, which is not installed"
            )

    stub.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = stub
    try:
        import fsspec.implementations as _impl

        _impl.http = stub
    except Exception:
        pass


_settle_optional_fsspec_http()
