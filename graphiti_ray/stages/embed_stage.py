"""A3 embedding stage: fill embedding columns on node/edge tables.

The reference embeds ONE string per call through a pluggable
EmbedderClient (graphiti_core/embedder/client.py:29-34; OpenAI impl
truncates to dim 1024, embedder/openai.py:25-61) under a 20-way
semaphore. Here the embedder is actor-pool state and a whole Arrow
batch is embedded in one vectorized pass; newline flattening before
embedding (nodes.py:264, edges.py:202) and L2 normalization
(helpers.py:76-85) match the reference.

Any EmbedderClient-shaped object with ``embed(list[str]) -> ndarray``
drops in via ``embedder_factory``; the default is the deterministic
hash embedder (functions/embed.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import EMBEDDING_DIM
from ..functions.embed import hash_embed_texts, normalize_l2
from ..functions.text import flatten_newlines


class HashEmbedder:
    """Default deterministic embedder (EmbedderClient analog)."""

    def __init__(self, dim: int = EMBEDDING_DIM):
        self.dim = dim

    def embed(self, texts: list[str]) -> np.ndarray:
        return hash_embed_texts(texts, dim=self.dim)


class EmbedStage:
    """map_batches(EmbedStage, concurrency=N,
    fn_constructor_kwargs={'text_col': ..., 'out_col': ...}).

    Embedder built once per actor (__init__ = model load); one batched
    forward per Arrow batch; output column is FixedSizeList<float32>."""

    def __init__(self, text_col: str, out_col: str, embedder_factory=HashEmbedder):
        self.text_col = text_col
        self.out_col = out_col
        self.embedder = embedder_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [
            flatten_newlines(t or "") for t in batch.column(self.text_col).to_pylist()
        ]
        emb = normalize_l2(np.asarray(self.embedder.embed(texts), dtype=np.float32))
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), emb.shape[1]
        )
        return batch.append_column(self.out_col, col)


def add_embeddings(ds, text_col: str, out_col: str, concurrency: int = 2,
                   batch_size: int = 1024, embedder_factory=HashEmbedder):
    return ds.map_batches(
        EmbedStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "text_col": text_col,
            "out_col": out_col,
            "embedder_factory": embedder_factory,
        },
    )
