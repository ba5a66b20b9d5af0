"""Page-corpus sources.

Two ways to obtain the (url, warc_ts, html, text, lang) input table
(BASELINE.json input_hint):

- ``synthetic_pages(sf_dir)``: the deterministic template corpus
  (synth.py) sized to the scale factor — n_pages = rows of the driver's
  ``documents`` table at that sf. Used by entry(), tests and bench for
  the full KG pipeline (entities/relations are computable ground truth).
- ``pages_from_documents(sf_dir)``: derives pages 1:1 from the driver's
  ``documents`` parquet with an arithmetic, SQL-expressible construction
  (url/warc_ts/html are pure functions of doc_id and text), so the
  html->text byte-identical invariant can be oracle-checked by DuckDB in
  the driver's correctness gate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schemas import PAGES
from ..synth import pages_dataset

EPOCH_2023 = 1672531200  # 2023-01-01 UTC, seconds
SPAN_S = 63072000  # two years


def documents_count(sf_dir: str) -> int:
    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def synthetic_pages(sf_dir: str, multiplier: int = 1, seed: int = 42):
    """Synthetic corpus sized to the sf tier (rows(documents) x mult).

    Block count ~n/2048 (floor 32): enough tasks to fill the actor pool
    without paying per-block scheduling on hundreds of tiny blocks (the
    rd.range default of 200 blocks costs more in scheduling than the
    work at small sf)."""
    n = documents_count(sf_dir) * multiplier
    return pages_dataset(n, seed=seed, override_num_blocks=max(32, n // 2048))


def _doc_batch_to_pages(batch: pa.Table) -> pa.Table:
    doc_id = batch.column("doc_id").to_pylist()
    text = batch.column("text").to_pylist()
    lang = batch.column("lang").to_pylist()
    urls, ts, htmls = [], [], []
    for d, t in zip(doc_id, text):
        urls.append(f"https://site{d % 50}.example/doc{d}")
        ts.append((EPOCH_2023 + (d * 61) % SPAN_S) * 1_000_000)
        if d % 10 == 0:
            htmls.append(None)  # text-only page
        else:
            htmls.append(
                (
                    f"<html><head><title>doc {d}</title></head>"
                    f"<body><p>{t}</p></body></html>"
                ).encode("utf-8")
            )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pc.cast(pa.array(ts, pa.int64()), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(lang, pa.string()),
        }
    ).cast(PAGES)


def pages_from_documents(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(_doc_batch_to_pages, batch_format="pyarrow")
