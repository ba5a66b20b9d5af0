"""Deterministic stratified sampling over the documents table.

A training-data pipeline rebalances its corpus by language / domain /
quality stratum with per-stratum keep rates. Doing it with RNG makes
runs irreproducible and resume-unsafe; doing it with a content hash
(md5 of the stable doc key) makes the decision a pure function of the
row — every rerun, every retry, every partition keeps exactly the same
documents. Embarrassingly parallel: one filter kernel per block, no
shuffle, no driver state.

The hash matches DuckDB's ``md5_number_lower(salt || key)`` (same
pairing the SimHash sketch uses, functions/hashing.md5_hash64) so the
sample is SQL-mirrorable and driver-checkable.

Reference analog: none (graphiti has no sampling layer); this is one
of the corpus-prep extensions SURVEY.md §2.10 claims.
"""

from __future__ import annotations

import pyarrow as pa

from .io import read_documents

# per-language keep rates out of 10: downsample the majority class
# (English is ~44% of this corpus), keep the tail at 70%.
SAMPLE_RATES = {"en": 3}
SAMPLE_DEFAULT_RATE = 7
SAMPLE_SALT = "samp|"



def _sample_batch(batch: pa.Table) -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import md5_hash64_vec

    langs = batch.column("lang").to_pylist()
    rates = np.array(
        [SAMPLE_RATES.get(lg, SAMPLE_DEFAULT_RATE) for lg in langs],
        np.uint64,
    )
    # vectorized single-block md5 — same DuckDB md5_number_lower image
    # as the old per-row loop
    h = md5_hash64_vec(
        pc.cast(batch.column("doc_id"), pa.string()), salt=SAMPLE_SALT
    )
    mask = (h % np.uint64(10)) < rates
    return batch.filter(pa.array(mask))


def sample_stratified(sf_dir: str):
    """(doc_id, lang) of the kept rows: hash-deterministic per-language
    downsampling (en 30%, others 70%)."""
    import ray.data as rd

    return read_documents(sf_dir, ["doc_id", "lang"]).map_batches(_sample_batch, batch_format="pyarrow")
