"""Pluggable model-client interfaces (SURVEY.md §2.9) + response cache.

The reference injects LLMClient / EmbedderClient / CrossEncoderClient
through the Graphiti constructor (graphiti_core/graphiti.py:92-152);
extraction, dedupe verdicts, summaries and reranking all route through
them. This engine keeps the same seam at the ACTOR-POOL boundary: every
stateful stage takes a factory; the deterministic implementations are
the default, and an LLM-backed client is a drop-in that this container
cannot run (no network) — ``LLMExtractorClient`` documents the contract
and raises cleanly.

``ResponseCache`` is the batch analog of the reference's md5-keyed LLM
diskcache (llm_client/client.py:116-151): content-hash keyed, held per
actor, so retries and replays of a batch never re-pay model calls.
"""

from __future__ import annotations

from collections import OrderedDict
from datetime import datetime
from typing import Protocol

from .extraction import EpisodeExtraction, compile_patterns, extract_episode
from .hashing import sha1_hex


class ExtractorClient(Protocol):
    """M1/M2/M3 contract: one episode in, entities+relations out.

    ``previous_episodes`` is the T4 context window (the reference feeds
    the previous EPISODE_WINDOW_LEN episode bodies into every extraction
    prompt, graphiti.py:318-341); clients that ignore context may omit
    the parameter — the actor-pool stage inspects the signature once per
    actor and only passes it to clients that accept it.

    OPTIONAL batched protocol: a client may additionally expose
    ``extract_batch(contents, reference_times, previous_episodes=None)
    -> list[EpisodeExtraction]`` (results in input order). The
    actor-pool stage detects it once per actor and routes whole Arrow
    batches through it — for remote models that is one request per
    client-side chunk instead of one per episode
    (functions/remote_clients.RemoteExtractorClient.extract_batch)."""

    def extract(
        self,
        content: str,
        reference_time: datetime,
        previous_episodes: list[str] | None = None,
    ) -> EpisodeExtraction: ...


MAX_REFLEXION_ITERATIONS = 2  # reference helpers.py MAX_REFLEXION_ITERATIONS


class ReflexiveExtractor:
    """Multi-pass reflexion protocol around any base extractor — the
    batch re-expression of the reference's extract loop that re-asks
    "which entities did you miss?" up to MAX_REFLEXION_ITERATIONS times
    (node_operations.py:100-118).

    The base client exposes two seams:
    - ``extract_pass(content, reference_time, previous_episodes,
      missed_hints) -> EpisodeExtraction`` — one extraction pass; hints
      are entity names a previous reflexion round flagged as missed.
    - ``find_missed(content, extraction) -> list[str]`` — the reflexion
      verdict (an LLM prompt in the reference; any deterministic rule
      here). Empty list ends the loop.

    Drop a ReflexiveExtractor factory into the SAME actor-pool stage
    (stages/extract.extract_all client_factory) — no pipeline changes.
    """

    def __init__(self, base, max_reflexion: int = MAX_REFLEXION_ITERATIONS):
        self.base = base
        self.max_reflexion = max_reflexion

    def extract(
        self,
        content: str,
        reference_time: datetime,
        previous_episodes: list[str] | None = None,
    ) -> EpisodeExtraction:
        ex = self.base.extract_pass(
            content, reference_time, previous_episodes, missed_hints=[]
        )
        for _ in range(self.max_reflexion):
            missed = self.base.find_missed(content, ex)
            if not missed:
                break
            ex = self.base.extract_pass(
                content, reference_time, previous_episodes, missed_hints=missed
            )
        return ex


class ResponseCache:
    """Bounded LRU keyed on sha1(model_id | content) — deterministic
    across actors, unlike the reference's message-dump md5 which bakes
    in prompt ordering."""

    def __init__(self, max_entries: int = 100_000):
        self.max_entries = max_entries
        self._d: OrderedDict[str, object] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def key(self, model_id: str, content: str) -> str:
        return sha1_hex("cache", model_id, content)

    def get(self, k: str):
        v = self._d.get(k)
        if v is not None:
            self._d.move_to_end(k)
            self.hits += 1
        else:
            self.misses += 1
        return v

    def put(self, k: str, v) -> None:
        self._d[k] = v
        self._d.move_to_end(k)
        if len(self._d) > self.max_entries:
            self._d.popitem(last=False)


class DeterministicExtractorClient:
    """Default rule-based extractor with a response cache (the exact
    logic the oracle pipeline shares — functions/extraction.py).

    ``version`` selects a rule set from the versioned library
    (functions/promptlib.py — the prompts/lib.py:83-139 registry
    analog); the version is baked into model_id so the response cache
    never serves one version's output for another.

    ``rules``: explicit rule rows for USER-registered versions. The
    module-level registry (promptlib.register_rules) mutates only the
    process that called it — a Ray actor's fresh import sees only the
    shipped versions — so a custom version must ship its rows with the
    client (they ride the cloudpickled constructor args into every
    actor). The rows are self-registered in the worker process so
    in-actor compile_rules(version) lookups also resolve."""

    def __init__(self, cache_entries: int = 100_000,
                 version: str | None = None,
                 rules: list[tuple[str, str, str]] | None = None):
        if rules is not None:
            if version is None:
                raise ValueError("rules= requires a version name")
            from .promptlib import RULE_VERSIONS, compile_rules

            if version not in RULE_VERSIONS:  # fresh worker import
                RULE_VERSIONS[version] = list(rules)
            elif RULE_VERSIONS[version] != list(rules):
                # The registry, not the argument, is what compile_rules
                # reads — silently proceeding would let the response
                # cache (keyed on model_id == version) serve one rule
                # set's output for another. Same-name same-rules is fine
                # (two actors constructing the same client); same-name
                # different-rules is the poisoning this guards against.
                raise ValueError(
                    f"rule version {version!r} is already registered with "
                    "different rules; pick a distinct version name"
                )
            self.model_id = version
            self.patterns = compile_rules(version)
        elif version is None:
            self.model_id = "rules-v1"
            self.patterns = compile_patterns()
        else:
            from .promptlib import compile_rules

            self.model_id = version
            self.patterns = compile_rules(version)
        self.cache = ResponseCache(cache_entries)

    def extract(
        self,
        content: str,
        reference_time: datetime,
        previous_episodes: list[str] | None = None,
    ) -> EpisodeExtraction:
        # rule extraction is context-free by design (the honest batch
        # semantic); previous_episodes is accepted so the stage can wire
        # T4 windows through without a signature check special-case
        k = self.cache.key(self.model_id, f"{content}|{reference_time.isoformat()}")
        hit = self.cache.get(k)
        if hit is not None:
            return hit
        out = extract_episode(content, reference_time, self.patterns)
        self.cache.put(k, out)
        return out


class LLMExtractorClient:
    """Drop-in seam for a real LLM extractor (reflexion prompts of
    node_operations.py:121-212 / edge_operations.py:73-148). No network
    in this environment -> constructing it raises."""

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "LLM clients need network access; inject a DeterministicExtractorClient "
            "or your own ExtractorClient implementation instead"
        )
