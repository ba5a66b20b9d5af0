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
from .io import read_documents

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

    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(_payloads, batch_format="pyarrow", batch_size=PAYLOAD_BATCH)
    return ds.map_batches(
        PayloadDecoder,
        batch_format="pyarrow",
        batch_size=PAYLOAD_BATCH,
        concurrency=concurrency,
    )


# ----------------------------------------------------- frame sampling

FRAME_CHARS = 32  # fake frame = 32-char slice of the payload text
SAMPLE_EVERY = 4  # keep every 4th frame


class FrameSampler:
    """Actor-pool flat-map stage: explode each payload into its sampled
    frames (the video-frame-sampling shape: one input row -> many small
    output rows, per-frame digest). Codec state would live in __init__;
    the slicing/digesting per batch is the real plumbing."""

    def __init__(self, frame_chars: int = FRAME_CHARS, every: int = SAMPLE_EVERY):
        self.frame_chars = frame_chars
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_f, out_sha, out_n = [], [], [], []
        for i, txt in zip(ids, texts):
            n_frames = len(txt) // self.frame_chars
            for f in range(0, n_frames, self.every):
                frame = txt[f * self.frame_chars : (f + 1) * self.frame_chars]
                out_id.append(i)
                out_f.append(f)
                out_sha.append(hashlib.sha256(frame.encode("utf-8")).hexdigest())
                out_n.append(n_frames)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_f, pa.int64()),
                "frame_sha": pa.array(out_sha, pa.string()),
                "n_frames": pa.array(out_n, pa.int64()),
            }
        )


def sample_frames(sf_dir: str, concurrency: int | None = None):
    """documents -> per-doc fake frames -> every-kth sampled, with
    per-frame digests. Stateless tasks by default (slicing needs no
    per-actor state, and tasks reuse warm worker processes); pass
    ``concurrency`` to run the same FrameSampler as an actor pool when
    a real codec makes __init__ expensive."""
    import ray.data as rd

    ds = read_documents(sf_dir, ["doc_id", "text"])
    if concurrency is not None:
        return ds.map_batches(
            FrameSampler,
            batch_format="pyarrow",
            batch_size=PAYLOAD_BATCH,
            concurrency=concurrency,
        )
    return ds.map_batches(
        FrameSampler(), batch_format="pyarrow", batch_size=PAYLOAD_BATCH
    )


# DuckDB mirror: substring() is 1-based char slicing; sha256(VARCHAR)
# hashes the utf-8 encoding — identical to the Python kernel.
SAMPLE_FRAMES_SQL = f"""WITH fr AS (
  SELECT doc_id, text,
         CAST(length(text) // {FRAME_CHARS} AS BIGINT) AS n_frames
  FROM documents
)
SELECT doc_id,
       f AS frame_idx,
       sha256(substring(text, 1 + CAST(f * {FRAME_CHARS} AS BIGINT),
                        {FRAME_CHARS})) AS frame_sha,
       n_frames
FROM fr, UNNEST(generate_series(0, n_frames - 1)) AS t(f)
WHERE f % {SAMPLE_EVERY} = 0
"""


# --------------------------------------------------- feature extraction

class FeatureExtractor:
    """Actor-pool stage for model-based feature extraction: the
    'model' (deterministic hash embedder, the same one the KG embed
    stage uses) is constructed ONCE per actor; each batch is one
    vectorized inference call. A real vision/audio tower drops into
    __init__ + __call__ unchanged."""

    def __init__(self, dim: int = 64):
        from ..functions.embed import hash_embed_texts

        self.embed = hash_embed_texts
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = self.embed(batch.column("text").to_pylist(), dim=self.dim)
        n_active = (feats != 0).sum(axis=1).astype("int64")
        argmax = feats.argmax(axis=1).astype("int64")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "feature": pa.array(feats.tolist(), pa.list_(pa.float32())),
                "n_active": pa.array(n_active, pa.int64()),
                "feat_argmax": pa.array(argmax, pa.int64()),
            }
        )


def extract_features(sf_dir: str, concurrency: int | None = None, dim: int = 64):
    """documents -> batched 'model' inference -> feature vectors.
    Stateless tasks by default (the deterministic embedder has no load
    cost, and tasks reuse warm worker processes instead of paying
    actor-process startup per query); pass ``concurrency`` to run the
    same FeatureExtractor as an actor pool — the right shape once
    __init__ loads a real model.

    override_num_blocks: a small single-file input plans as ONE read
    task + SplitBlocks, which defeats read->map fusion and serializes
    this CPU-heavy stage (measured 3.2s -> 1.3s at sf0.1). At real
    scale the input is many files and the default plan already yields
    many read tasks, so this only matters for the single-file tier."""
    import ray.data as rd

    ds = read_documents(sf_dir, ["doc_id", "text"])
    if concurrency is not None:
        return ds.map_batches(
            FeatureExtractor,
            fn_constructor_kwargs={"dim": dim},
            batch_format="pyarrow",
            batch_size=PAYLOAD_BATCH,
            concurrency=concurrency,
        )
    # no batch_size in task mode: re-bundling the 32 read blocks into
    # 256-row batches undoes the read->map fusion the block count buys
    return ds.map_batches(FeatureExtractor(dim=dim), batch_format="pyarrow")


# ------------------------------------------------------------- resize

RESIZE_TARGET = 256  # target payload length after 'downscaling'


class Resizer:
    """Actor-pool resize stage (image-downscale shape: payload in,
    smaller payload + new dims out). The fake kernel is strided
    sampling — keep every k-th char where k = ceil(len/target) — so
    output size, stride and content are integer-exact in SQL. A real
    resampler (PIL.Image.resize / libswscale) drops into __init__ +
    __call__ unchanged."""

    def __init__(self, target: int = RESIZE_TARGET):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_in, stride, n_out, shas = [], [], [], []
        for txt in texts:
            n = len(txt)
            k = max(1, -(-n // self.target))
            small = txt[::k]
            n_in.append(n)
            stride.append(k)
            n_out.append(len(small))
            shas.append(hashlib.sha256(small.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_in": pa.array(n_in, pa.int64()),
                "stride": pa.array(stride, pa.int64()),
                "n_out": pa.array(n_out, pa.int64()),
                "resized_sha": pa.array(shas, pa.string()),
            }
        )


def resize_payloads(sf_dir: str, concurrency: int | None = None,
                    target: int = RESIZE_TARGET):
    """documents -> strided 'downscale' per payload -> new dims +
    digest. Stateless tasks by default; ``concurrency`` switches to an
    actor pool for when a real resampler makes __init__ expensive."""
    ds = read_documents(sf_dir, ["doc_id", "text"])
    if concurrency is not None:
        return ds.map_batches(
            Resizer,
            fn_constructor_kwargs={"target": target},
            batch_format="pyarrow",
            batch_size=PAYLOAD_BATCH,
            concurrency=concurrency,
        )
    return ds.map_batches(Resizer(target=target), batch_format="pyarrow",
                          batch_size=PAYLOAD_BATCH)


# DuckDB mirror: 1-based range(1, n+1, k) visits the same chars as the
# Python slice text[::k]; ceil division via (n + t - 1) // t.
RESIZE_SQL = f"""WITH p AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
         greatest(1, (length(text) + {RESIZE_TARGET} - 1) // {RESIZE_TARGET}) AS k
  FROM documents
)
SELECT doc_id,
       n AS n_in,
       CAST(k AS BIGINT) AS stride,
       CAST(length(small) AS BIGINT) AS n_out,
       sha256(small) AS resized_sha
FROM (
  SELECT doc_id, n, k,
         array_to_string(list_transform(range(1, CAST(n AS BIGINT) + 1, CAST(k AS BIGINT)),
                                        i -> substring(text, CAST(i AS BIGINT), 1)), '') AS small
  FROM p
)
"""
