"""Cross-encoder reranker stage (A4/Q10).

The reference ranks passages with either an OpenAI logprob-of-"True"
classifier or a local BGE cross-encoder model
(graphiti_core/cross_encoder/openai_reranker_client.py:63-121,
bge_reranker_client.py:24-44), loaded once per process. Neither model
exists in this container, so the scoring kernel is a deterministic
token-overlap classifier — the ACTOR-POOL SHAPE is the real deliverable:
model state built in ``__init__`` (once per actor), batched scoring in
``__call__``, ranked output sorted desc with id tie-break.

A real model drops in by overriding ``_score_pairs`` only.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN = re.compile(r"[a-z0-9]+")


class CrossEncoderReranker:
    """map_batches(CrossEncoderReranker, concurrency=N,
    fn_constructor_kwargs={'query': q}) over a candidates Dataset with
    (uuid, passage) columns -> (uuid, ce_score)."""

    def __init__(self, query: str):
        # per-actor "model load": compiled tokenizer + query token set
        self.query_tokens = frozenset(_TOKEN.findall(query.lower()))

    def _score_pairs(self, passages: list[str]) -> np.ndarray:
        scores = np.empty(len(passages), dtype=np.float64)
        for i, p in enumerate(passages):
            toks = set(_TOKEN.findall(p.lower()))
            un = len(self.query_tokens | toks)
            scores[i] = len(self.query_tokens & toks) / un if un else 0.0
        return scores

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = self._score_pairs(batch.column("passage").to_pylist())
        return pa.table(
            {
                "uuid": batch.column("uuid"),
                "ce_score": pa.array(scores, pa.float64()),
            }
        )


def cross_encoder_rank(candidates_ds, query: str, concurrency: int = 2) -> list[str]:
    """Rank candidate (uuid, passage) rows by cross-encoder score desc,
    uuid asc tie-break — the batch analog of rank_passages."""
    scored = candidates_ds.map_batches(
        CrossEncoderReranker,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"query": query},
    )
    df = scored.to_pandas()
    rows = list(zip(df["uuid"], df["ce_score"]))
    return [u for u, _ in sorted(rows, key=lambda r: (-r[1], r[0]))]
