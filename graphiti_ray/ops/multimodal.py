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
    'model' (a deterministic signed feature-hashing embedder) is
    constructed ONCE per actor; each batch is one inference call. A
    real vision/audio tower drops into __init__ + __call__ unchanged.

    The stub model is char-trigram feature hashing with an md5-derived
    hash (functions/hashing.md5_hash64 == DuckDB md5_number_lower), so
    the integer accumulator — and therefore n_active / feat_argmax /
    feat_l1 — is reproducible in SQL (MULTIMODAL_FEATURES_SQL). The
    float ``feature`` column is the L2-normalized accumulator; argmax
    and the nonzero mask are invariant under that positive scaling."""

    def __init__(self, dim: int = 64):
        import numpy as np

        from ..functions.hashing import char_shingles, md5_hash64

        self.dim = dim
        self._np = np
        self._shingles = char_shingles
        # memoized trigram -> (bucket, sign): the trigram vocabulary is
        # tiny and repeats across every doc, so each actor pays the md5
        # once per distinct trigram, not once per occurrence
        self._cache: dict[str, tuple[int, int]] = {}
        self._h = md5_hash64

    def _bucket_sign(self, sh: str) -> tuple[int, int]:
        bs = self._cache.get(sh)
        if bs is None:
            h = self._h(sh, salt="ft|")
            bs = (h % self.dim, 1 if (h >> 63) & 1 else -1)
            if len(self._cache) >= 4_000_000:
                self._cache.clear()
            self._cache[sh] = bs
        return bs

    def __call__(self, batch: pa.Table) -> pa.Table:
        np = self._np
        texts = batch.column("text").to_pylist()
        acc = np.zeros((len(texts), self.dim), dtype=np.int64)
        for i, t in enumerate(texts):
            for sh in self._shingles(t.replace("\n", " ")):
                j, s = self._bucket_sign(sh)
                acc[i, j] += s
        n_active = (acc != 0).sum(axis=1).astype("int64")
        argmax = acc.argmax(axis=1).astype("int64")
        l1 = np.abs(acc).sum(axis=1).astype("int64")
        feats = acc.astype(np.float32)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        feats /= norms
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "feature": pa.array(feats.tolist(), pa.list_(pa.float32())),
                "n_active": pa.array(n_active, pa.int64()),
                "feat_argmax": pa.array(argmax, pa.int64()),
                "feat_l1": pa.array(l1, pa.int64()),
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


# Exact SQL image of FeatureExtractor's integer accumulator: trigrams
# of '^'||lower(text)||'$' (newlines -> spaces), md5_number_lower with
# the 'ft|' salt (== hashing.md5_hash64), bucket = h % dim, sign = bit
# 63. The zero-filled 64-dim grid makes argmax ties resolve exactly as
# np.argmax (first index of the max, including all-zero rows).
FEATURE_DIM = 64

MULTIMODAL_FEATURES_SQL = f"""WITH s AS (
  SELECT doc_id, '^' || lower(replace(text, chr(10), ' ')) || '$' AS s
  FROM documents
), tri AS (
  SELECT doc_id,
    CASE WHEN length(s) <= 3 THEN [s]
    ELSE list_transform(range(1, length(s) - 1),
                        i -> substr(s, CAST(i AS BIGINT), 3)) END AS toks
  FROM s
), tok AS (
  SELECT doc_id, md5_number_lower('ft|' || t.tk) AS h
  FROM tri, unnest(tri.toks) AS t(tk)
), acc AS (
  SELECT doc_id, CAST(h % {FEATURE_DIM} AS BIGINT) AS j,
    CAST(sum(CASE WHEN (h >> 63) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM tok GROUP BY doc_id, j
), grid AS (
  SELECT d.doc_id, CAST(t.j AS BIGINT) AS j
  FROM (SELECT DISTINCT doc_id FROM documents) d,
       UNNEST(range(0, {FEATURE_DIM})) AS t(j)
), dense AS (
  SELECT g.doc_id, g.j, COALESCE(a.v, 0) AS v
  FROM grid g LEFT JOIN acc a ON a.doc_id = g.doc_id AND a.j = g.j
), mx AS (
  SELECT doc_id, j, v, max(v) OVER (PARTITION BY doc_id) AS mv FROM dense
)
SELECT doc_id,
  CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
  CAST(min(CASE WHEN v = mv THEN j END) AS BIGINT) AS feat_argmax,
  CAST(sum(abs(v)) AS BIGINT) AS feat_l1
FROM mx GROUP BY doc_id
"""


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
