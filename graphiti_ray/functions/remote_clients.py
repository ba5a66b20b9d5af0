"""HTTP-shaped remote model clients (A1/A3/A4) + in-process fake server.

The reference ships four working LLM clients with two layers of retry
(graphiti_core/llm_client/client.py:85-114 — transport retry: 4
attempts, exponential backoff, only on server/rate-limit errors;
openai_client.py:134-173 — application retry: on an invalid/unparseable
response the client re-asks WITH the validation error appended as
feedback, up to MAX_RETRIES, while RateLimitError/RefusalError never
re-ask), a single-string embedder (embedder/openai.py:25-61) and a
cross-encoder (cross_encoder/openai_reranker_client.py:63-121).

This module re-expresses those semantics batch-first for the actor-pool
seams in this engine:

- ``RemoteExtractorClient``   -> stages/extract.extract_all(client_factory=...)
- ``RemoteEmbedderClient``    -> stages/embed_stage.add_embeddings(embedder_factory=...)
- ``RemoteCrossEncoderClient``-> search/rerank_models (override _score_pairs)

Transport is a seam: anything callable as ``transport(path, payload)
-> dict``. ``HttpTransport`` is the real-network implementation
(stdlib urllib; this container has no network, so it exists for users,
not for tests); ``FakeModelServer`` is an in-process transport with the
same deterministic kernels as the default clients (so pipeline outputs
are unchanged) plus failure injection for retry-path tests.

Key deviations from the reference, on purpose:
- Embedding and reranking are BATCHED: one request per Arrow batch
  slice (``batch_size`` texts), not one request per string — at 100 TB
  the per-call overhead of single-string embedding is the difference
  between hours and weeks.
- Backoff is deterministic (base * 2^attempt, capped), not random
  exponential: reruns stay reproducible; the sleeper is injectable so
  tests pay zero wall-clock.
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from typing import Callable

import numpy as np

from .extraction import EpisodeExtraction, ExtractedRelation
from .text import sanitize

# ---------------------------------------------------------------- errors


class RemoteClientError(Exception):
    """Base for remote model-client failures."""


class RateLimitError(RemoteClientError):
    """HTTP 429 — retried at the transport layer with backoff, never
    fed back to the model (client.py:85-114 retry predicate)."""


class ServerError(RemoteClientError):
    """HTTP 5xx — retried at the transport layer with backoff."""


class RefusalError(RemoteClientError):
    """Model refused — never retried (openai_client.py:121-124)."""


class InvalidResponseError(RemoteClientError):
    """Response failed schema validation after all feedback retries."""


# ------------------------------------------------------------- transport


class HttpTransport:
    """POST JSON to ``base_url + path`` via stdlib urllib.

    Maps status codes onto the retryable error taxonomy: 429 ->
    RateLimitError, 5xx -> ServerError, other non-200 ->
    RemoteClientError (not retried). No network exists in this
    container; this class is the production seam and is covered by
    contract tests through FakeModelServer, which implements the same
    ``(path, payload) -> dict`` callable interface."""

    def __init__(self, base_url: str, timeout_s: float = 60.0,
                 headers: dict[str, str] | None = None):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s
        self.headers = {"Content-Type": "application/json", **(headers or {})}

    def __call__(self, path: str, payload: dict) -> dict:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(payload).encode("utf-8"),
            headers=self.headers,
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 429:
                raise RateLimitError(str(e)) from e
            if e.code >= 500:
                raise ServerError(str(e)) from e
            raise RemoteClientError(str(e)) from e
        except urllib.error.URLError as e:
            raise ServerError(str(e)) from e


class RetryPolicy:
    """Transport-layer retry: up to ``max_attempts`` total attempts on
    RateLimitError/ServerError only, deterministic exponential backoff
    (base * 2^i, capped). The reference's tenacity decorator
    (client.py:85-92) retries 4 attempts on the same predicate with
    random exponential waits; determinism is the deliberate change."""

    def __init__(self, max_attempts: int = 4, backoff_base_s: float = 0.05,
                 backoff_cap_s: float = 2.0,
                 sleep: Callable[[float], None] = time.sleep):
        self.max_attempts = max_attempts
        self.backoff_base_s = backoff_base_s
        self.backoff_cap_s = backoff_cap_s
        self.sleep = sleep

    def call(self, transport, path: str, payload: dict) -> dict:
        last: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                return transport(path, payload)
            except (RateLimitError, ServerError) as e:
                last = e
                if attempt + 1 < self.max_attempts:
                    self.sleep(min(self.backoff_cap_s,
                                   self.backoff_base_s * (2 ** attempt)))
        raise last  # type: ignore[misc]


# ----------------------------------------------------------- extractor


class RemoteExtractorClient:
    """ExtractorClient over a remote model endpoint.

    POSTs /v1/extract with the sanitized episode body, reference time
    and T4 context window; expects ``{"entities": [str, ...],
    "relations": [{"subject","predicate","object","fact","valid_at",
    "invalid_at"}, ...]}`` (timestamps ISO-8601 or null).

    Application-level error feedback (openai_client.py:134-173): if the
    response fails validation, the request is re-sent with an
    ``error_context`` field describing what was wrong, up to
    ``max_feedback_retries`` times; RateLimit/Refusal never re-ask.
    Construct once per actor (extract_all builds it in the pool's
    __init__); the transport's connection state amortizes per actor.

    ``extract_batch`` is the scale path: ONE request per
    ``request_batch`` episodes (POST /v1/extract_batch with an
    ``items`` list, results in input order) instead of one request per
    episode — the same fix the embedder got, applied to the expensive
    stage. The actor-pool extractor (stages/extract.py) detects the
    method once per actor and routes whole Arrow batches through it;
    the per-episode ``extract`` stays as the compatibility fallback
    for clients that only speak the single-episode protocol.

    ``prompt_version``: when set, every request additionally carries
    the rendered chat ``messages`` and the ``response_schema`` from the
    versioned prompt library (functions/prompts.py — the content of
    the reference's prompts/extract_nodes+extract_edges+
    extract_edge_dates stages) so a real chat-completion endpoint can
    serve the episode protocol directly. The version is folded into
    ``model_id`` so response caches never mix prompt versions.
    """

    def __init__(self, transport, model: str = "kg-extract-remote",
                 retry: RetryPolicy | None = None,
                 max_feedback_retries: int = 2,
                 request_batch: int = 64,
                 prompt_version: str | None = None):
        self.transport = transport
        self.model = model
        self.model_id = (
            f"remote:{model}"
            if prompt_version is None
            else f"remote:{model}:{prompt_version}"
        )
        self.retry = retry or RetryPolicy()
        self.max_feedback_retries = max_feedback_retries
        self.request_batch = request_batch
        self.prompt_version = prompt_version

    def _prompt_fields(self, content: str, reference_time: datetime,
                       previous_episodes: list[str] | None) -> dict:
        if self.prompt_version is None:
            return {}
        from .prompts import render, response_schema

        return {
            "messages": render(
                "extract_episode",
                {
                    "content": content,
                    "reference_time": reference_time.isoformat(),
                    "previous_episodes": previous_episodes or [],
                },
                version=self.prompt_version,
            ),
            "response_schema": response_schema(
                "extract_episode", version=self.prompt_version
            ),
        }

    def extract(
        self,
        content: str,
        reference_time: datetime,
        previous_episodes: list[str] | None = None,
    ) -> EpisodeExtraction:
        clean = sanitize(content)
        prevs = [sanitize(p) for p in (previous_episodes or [])]
        payload = {
            "model": self.model,
            "content": clean,
            "reference_time": reference_time.isoformat(),
            "previous_episodes": prevs,
            **self._prompt_fields(clean, reference_time, prevs),
        }
        err: str | None = None
        for _ in range(self.max_feedback_retries + 1):
            if err is not None:
                payload = {**payload, "error_context": (
                    "The previous response attempt was invalid. "
                    f"Error: {err}. Return JSON with keys 'entities' "
                    "(list of strings) and 'relations' (list of objects)."
                )}
            resp = self.retry.call(self.transport, "/v1/extract", payload)
            if "refusal" in resp:
                raise RefusalError(str(resp["refusal"]))
            try:
                return self._parse(resp)
            except (KeyError, TypeError, ValueError) as e:
                err = f"{type(e).__name__}: {e}"
        raise InvalidResponseError(err or "unparseable response")

    def extract_batch(
        self,
        contents: list[str],
        reference_times: list[datetime],
        previous_episodes: list[list[str] | None] | None = None,
    ) -> list[EpisodeExtraction]:
        """Batched M1/M2/M3: one POST per ``request_batch`` episodes.

        Wire format: ``{"model", "items": [{"content",
        "reference_time", "previous_episodes"}, ...]}`` ->
        ``{"results": [{"entities", "relations"}, ...]}`` in input
        order. Feedback re-asks operate per CHUNK (an invalid chunk
        response re-sends that chunk with error_context, not the whole
        input); a refusal aborts like the single-episode path."""
        n = len(contents)
        prevs = previous_episodes if previous_episodes is not None else [None] * n
        out: list[EpisodeExtraction] = [None] * n  # type: ignore[list-item]
        for s in range(0, n, self.request_batch):
            e = min(s + self.request_batch, n)
            items = []
            for i in range(s, e):
                clean = sanitize(contents[i])
                cprev = [sanitize(p) for p in (prevs[i] or [])]
                items.append({
                    "content": clean,
                    "reference_time": reference_times[i].isoformat(),
                    "previous_episodes": cprev,
                    **self._prompt_fields(clean, reference_times[i], cprev),
                })
            payload: dict = {"model": self.model, "items": items}
            if self.prompt_version is not None:
                payload["prompt_version"] = self.prompt_version
            err: str | None = None
            parsed: list[EpisodeExtraction] | None = None
            for _ in range(self.max_feedback_retries + 1):
                if err is not None:
                    payload = {**payload, "error_context": (
                        "The previous response attempt was invalid. "
                        f"Error: {err}. Return JSON with key 'results': "
                        f"a list of exactly {len(items)} objects, each "
                        "with keys 'entities' (list of strings) and "
                        "'relations' (list of objects), in input order."
                    )}
                resp = self.retry.call(
                    self.transport, "/v1/extract_batch", payload
                )
                if "refusal" in resp:
                    raise RefusalError(str(resp["refusal"]))
                try:
                    results = resp["results"]
                    if not isinstance(results, list) or len(results) != len(items):
                        raise ValueError(
                            f"'results' must be a list of {len(items)} objects"
                        )
                    parsed = [self._parse(r) for r in results]
                    break
                except (KeyError, TypeError, ValueError) as exc:
                    err = f"{type(exc).__name__}: {exc}"
            if parsed is None:
                raise InvalidResponseError(err or "unparseable response")
            out[s:e] = parsed
        return out

    @staticmethod
    def _parse(resp: dict) -> EpisodeExtraction:
        ents = resp["entities"]
        if not isinstance(ents, list) or not all(isinstance(x, str) for x in ents):
            raise ValueError("'entities' must be a list of strings")
        rels = []
        for r in resp["relations"]:
            # wire format is subject/predicate/object (a self-describing
            # JSON API); the in-engine dataclass uses subj/pred/obj
            rels.append(ExtractedRelation(
                subj=r["subject"],
                pred=r["predicate"],
                obj=r["object"],
                fact=r["fact"],
                valid_at=(datetime.fromisoformat(r["valid_at"])
                          if r.get("valid_at") else None),
                invalid_at=(datetime.fromisoformat(r["invalid_at"])
                            if r.get("invalid_at") else None),
            ))
        return EpisodeExtraction(entities=list(ents), relations=rels)


# ------------------------------------------------------------ embedder


class RemoteEmbedderClient:
    """EmbedderClient over a remote endpoint, BATCHED.

    ``embed(texts)`` slices the input into ``request_batch`` chunks and
    POSTs /v1/embed once per chunk ({"model", "input": [...texts]}),
    expecting {"embeddings": [[f32 x dim], ...]} in input order. The
    reference embeds one string per call (embedder/openai.py:35-40,
    nodes.py:262-269); batching is the scale fix, and request_batch
    bounds the request body so a huge Arrow batch never builds a
    gigabyte JSON payload."""

    def __init__(self, transport, model: str = "embed-remote",
                 dim: int = 256, request_batch: int = 256,
                 retry: RetryPolicy | None = None):
        self.transport = transport
        self.model = model
        self.dim = dim
        self.request_batch = request_batch
        self.retry = retry or RetryPolicy()

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for s in range(0, len(texts), self.request_batch):
            chunk = texts[s:s + self.request_batch]
            resp = self.retry.call(self.transport, "/v1/embed",
                                   {"model": self.model, "input": chunk})
            emb = np.asarray(resp["embeddings"], dtype=np.float32)
            if emb.shape != (len(chunk), self.dim):
                raise InvalidResponseError(
                    f"embedding shape {emb.shape} != ({len(chunk)}, {self.dim})"
                )
            out[s:s + len(chunk)] = emb
        return out


# ------------------------------------------------------- cross-encoder


class RemoteCrossEncoderClient:
    """Batched remote passage scorer (A4): POST /v1/rerank with
    {"model", "query", "passages": [...]} -> {"scores": [...]} in
    passage order. Drop into search/rerank_models.CrossEncoderReranker
    via ``remote_cross_encoder_factory`` below."""

    def __init__(self, transport, model: str = "rerank-remote",
                 request_batch: int = 128, retry: RetryPolicy | None = None):
        self.transport = transport
        self.model = model
        self.request_batch = request_batch
        self.retry = retry or RetryPolicy()

    def score(self, query: str, passages: list[str]) -> np.ndarray:
        out = np.empty(len(passages), dtype=np.float64)
        for s in range(0, len(passages), self.request_batch):
            chunk = passages[s:s + self.request_batch]
            resp = self.retry.call(
                self.transport, "/v1/rerank",
                {"model": self.model, "query": query, "passages": chunk},
            )
            scores = np.asarray(resp["scores"], dtype=np.float64)
            if scores.shape != (len(chunk),):
                raise InvalidResponseError(
                    f"scores shape {scores.shape} != ({len(chunk)},)"
                )
            out[s:s + len(chunk)] = scores
        return out


def remote_cross_encoder_reranker(transport, model: str = "rerank-remote"):
    """Factory: a CrossEncoderReranker subclass whose _score_pairs
    calls the remote client — the documented override seam in
    search/rerank_models.py."""
    from ..search.rerank_models import CrossEncoderReranker

    class _Remote(CrossEncoderReranker):
        def __init__(self, query: str):
            super().__init__(query)
            self.query = query
            self.client = RemoteCrossEncoderClient(transport, model=model)

        def _score_pairs(self, passages: list[str]) -> np.ndarray:
            return self.client.score(self.query, passages)

    return _Remote


# ----------------------------------------------------------- fake server


class FakeModelServer:
    """In-process transport implementing the three endpoints with the
    SAME deterministic kernels as the default clients (rule extraction,
    hash embedder, token-overlap scorer), so a pipeline run through the
    remote seam produces byte-identical output to the local path —
    which is exactly what the contract tests pin.

    Failure injection:
    - ``fail_first(n, kind)``: the next ``n`` requests (any path) raise
      RateLimitError/ServerError — exercises the transport retry.
    - ``garble_first(n)``: the next ``n`` /v1/extract responses are
      schema-invalid; a request carrying ``error_context`` (the
      feedback re-ask) is answered correctly — exercises the
      application-level feedback loop.

    Must be constructed INSIDE the actor (pass a zero-arg factory that
    builds transport+client) or shipped by value; it holds plain Python
    state, so cloudpickle ships it fine for tests."""

    def __init__(self, extract_version: str | None = None):
        from .extraction import compile_patterns

        self.patterns = compile_patterns()
        self.calls: dict[str, int] = {}
        self._fail_n = 0
        self._fail_kind: type[Exception] = ServerError
        self._garble_n = 0

    def fail_first(self, n: int, kind: type[Exception] = ServerError) -> None:
        self._fail_n = n
        self._fail_kind = kind

    def garble_first(self, n: int) -> None:
        self._garble_n = n

    def __call__(self, path: str, payload: dict) -> dict:
        self.calls[path] = self.calls.get(path, 0) + 1
        if self._fail_n > 0:
            self._fail_n -= 1
            raise self._fail_kind("injected transient failure")
        if path == "/v1/extract":
            return self._extract(payload)
        if path == "/v1/extract_batch":
            if self._garble_n > 0 and "error_context" not in payload:
                self._garble_n -= 1
                return {"results": "NOT-A-LIST"}
            return {
                "results": [self._extract_item(it) for it in payload["items"]]
            }
        if path == "/v1/embed":
            from .embed import hash_embed_texts

            emb = hash_embed_texts(payload["input"], dim=256)
            return {"embeddings": emb.tolist()}
        if path == "/v1/rerank":
            import re as _re

            q = frozenset(_re.findall(r"[a-z0-9]+", payload["query"].lower()))
            scores = []
            for p in payload["passages"]:
                toks = set(_re.findall(r"[a-z0-9]+", p.lower()))
                un = len(q | toks)
                scores.append(len(q & toks) / un if un else 0.0)
            return {"scores": scores}
        raise RemoteClientError(f"unknown path {path!r}")

    def _extract(self, payload: dict) -> dict:
        if self._garble_n > 0 and "error_context" not in payload:
            self._garble_n -= 1
            return {"entities": "NOT-A-LIST", "relations": []}
        return self._extract_item(payload)

    def _extract_item(self, item: dict) -> dict:
        from .extraction import extract_episode

        ex = extract_episode(
            item["content"],
            datetime.fromisoformat(item["reference_time"]),
            self.patterns,
        )
        return {
            "entities": list(ex.entities),
            "relations": [
                {
                    "subject": r.subj,
                    "predicate": r.pred,
                    "object": r.obj,
                    "fact": r.fact,
                    "valid_at": r.valid_at.isoformat() if r.valid_at else None,
                    "invalid_at": r.invalid_at.isoformat() if r.invalid_at else None,
                }
                for r in ex.relations
            ],
        }
