"""Corpus ingestion from non-parquet formats (JSONL / CSV).

The reference ingests episodes from raw text / message / JSON payloads
(graphiti_core/nodes.py:42-64 EpisodeType enum); at web scale the same
corpus often arrives as WARC-derived JSONL or CSV exports rather than
parquet. ``read_pages_any`` reads any of the three and normalizes to
the canonical PAGES schema so every downstream pipeline (build_kg,
ops/*) stays format-agnostic.

JSON and CSV cannot carry binary or timestamp columns natively:
``warc_ts`` arrives as an ISO-8601 string and ``html`` as utf-8 text
(or null). Normalization is a per-batch Arrow projection
(cast/encode), streaming block-wise through rd.read_json/read_csv —
no driver-side load, and at scale a directory of shards plans as many
read tasks exactly like the parquet path.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import PAGES


def _norm_batch(batch: pa.Table, *, empty_html_is_null: bool = False) -> pa.Table:
    cols = {}
    for f in PAGES:
        if f.name not in batch.column_names:
            cols[f.name] = pa.nulls(len(batch), f.type)
            continue
        col = batch.column(f.name)
        typ = col.type
        if pa.types.is_null(typ):
            cols[f.name] = pa.nulls(len(batch), f.type)
        elif f.name == "warc_ts" and pa.types.is_string(typ):
            cols[f.name] = pc.cast(col, f.type)  # ISO-8601 parse
        elif f.name == "html" and pa.types.is_string(typ):
            if empty_html_is_null:
                # CSV cannot distinguish null from empty -> "" means
                # absent. JSONL CAN distinguish them, so its
                # genuinely-empty-but-present html survives as b"".
                col = pc.if_else(
                    pc.equal(col, ""), pa.scalar(None, pa.string()), col
                )
            cols[f.name] = pc.cast(col, pa.binary())  # utf-8 bytes
        else:
            cols[f.name] = pc.cast(col, f.type)
    return pa.table(cols).cast(PAGES)


def normalize_pages(ds, *, empty_html_is_null: bool = False):
    """Any (url, warc_ts, html?, text, lang) dataset -> PAGES schema.
    ``empty_html_is_null``: set for formats that cannot represent null
    (CSV) so "" reads back as absent html."""
    import functools

    fn = functools.partial(_norm_batch, empty_html_is_null=empty_html_is_null)
    return ds.map_batches(fn, batch_format="pyarrow")


def read_pages_any(path: str, fmt: str | None = None):
    """Read a corpus of pages from parquet, JSONL, or CSV (file or
    directory of shards). Format from ``fmt`` or the extension."""
    import ray.data as rd

    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"jsonl": "json", "json": "json", "csv": "csv",
               "parquet": "parquet"}.get(ext)
        if fmt is None and os.path.isdir(path):
            names = os.listdir(path)
            for cand, f in (("parquet", "parquet"), ("json", "json"),
                            ("jsonl", "json"), ("csv", "csv")):
                if any(n.endswith("." + cand) for n in names):
                    fmt = f
                    break
    if fmt == "parquet":
        return normalize_pages(rd.read_parquet(path))
    if fmt == "json":
        return normalize_pages(rd.read_json(path))
    if fmt == "csv":
        return normalize_pages(rd.read_csv(path), empty_html_is_null=True)
    raise ValueError(f"cannot infer corpus format for {path!r}")
