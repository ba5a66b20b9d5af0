"""Deterministic hash embeddings + L2 normalization.

Plays the role of the reference's pluggable EmbedderClient
(graphiti_core/embedder/client.py:29-34; OpenAI impl embedder/openai.py:
25-61 truncates to dim 1024). The deterministic default is a character
n-gram feature-hashing embedder: similar surface forms ("Kamala Harris"
vs "K. Harris") land near each other in cosine space, which is exactly
what the canonicalization blocking needs, and it needs no model files or
network. A real model drops into the same actor-pool stage.

Vectorization note: the reference embeds ONE string per call
(nodes.py:262-269). Here a whole Arrow batch is embedded in one numpy
pass per batch.
"""

from __future__ import annotations

import numpy as np

from .. import EMBEDDING_DIM
from .hashing import char_shingles, stable_int


def normalize_l2(x: np.ndarray) -> np.ndarray:
    """L2-normalize 1-D or 2-D arrays (helpers.py:76-85 normalize_l2)."""
    if x.ndim == 1:
        n = np.linalg.norm(x)
        return x / n if n else x
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def hash_embed_texts(texts: list[str], dim: int = EMBEDDING_DIM) -> np.ndarray:
    """float32[len(texts), dim] L2-normalized char-trigram hash embedding."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        for sh in char_shingles(t.replace("\n", " ")):
            h = stable_int(sh, salt="emb")
            out[i, h % dim] += 1.0 if (h >> 63) & 1 else -1.0
    return normalize_l2(out)


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cosine similarity of row-normalized matrices: one matmul."""
    return a @ b.T
