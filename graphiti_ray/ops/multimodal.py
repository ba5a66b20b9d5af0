"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed by an actor-pool decode stage.

The container has no image/audio codecs, so the DECODE KERNEL is a
deterministic stub (arithmetic on the payload bytes); everything
Ray-side is real and tested: binary column schema, small batch sizes
for large payloads, actor-pool stage with per-actor init, and an
oracle-checkable output (all metadata is integer arithmetic on byte
length + a sha256, reproducible in SQL).

``decode_real()`` marks where a real codec plugs in (NotImplementedError
behind an import-try, per the task brief).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

PAYLOAD_BATCH = 256  # small batches: payload x concurrency must fit heap


def _payloads(batch: pa.Table) -> pa.Table:
    """Derive a binary payload column from the text (stands in for an
    image/audio blob keyed by doc_id)."""
    payloads = [t.encode("utf-8") for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def decode_real(payload: bytes) -> dict:
    """Plug-in point for a real decoder (PIL / libav). Not available in
    this container."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("no image codec in this environment") from e
    raise NotImplementedError("real decode not wired yet")


class PayloadDecoder:
    """Actor-pool stage: 'codec' state initialised once per actor
    (here: nothing to load; in production: model/codec handles), then
    one vectorizable pass per Arrow batch of binary payloads."""

    def __init__(self, use_real_codec: bool = False):
        self.use_real_codec = use_real_codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_bytes, widths, heights, shas = [], [], [], []
        for p in payloads:
            if self.use_real_codec:
                decode_real(p)  # NotImplementedError in this container
            nb = len(p)
            n_bytes.append(nb)
            widths.append(nb % 640 + 1)  # deterministic fake dimensions
            heights.append(nb % 480 + 1)
            shas.append(hashlib.sha256(p).hexdigest())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "fake_width": pa.array(widths, pa.int64()),
                "fake_height": pa.array(heights, pa.int64()),
                "payload_sha": pa.array(shas, pa.string()),
            }
        )


def decode_payloads(sf_dir: str, concurrency: int = 2):
    """documents -> binary payloads -> actor-pool decode -> metadata."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_payloads, batch_format="pyarrow", batch_size=PAYLOAD_BATCH)
    return ds.map_batches(
        PayloadDecoder,
        batch_format="pyarrow",
        batch_size=PAYLOAD_BATCH,
        concurrency=concurrency,
    )
