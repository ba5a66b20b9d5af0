"""Rerankers: RRF, MMR, node-distance, episode-mentions.

Pure functions over small candidate sets (the post-limit top-k of each
search lane) — the expensive, corpus-sized work happens in the
distributed scoring stages (search.py); rerank inputs are O(k·lanes).
"""

from __future__ import annotations

import numpy as np

RRF_RANK_CONST = 1  # reference default (search_utils.py:744)
MMR_LAMBDA = 0.5  # search_utils.py:51 DEFAULT_MMR_LAMBDA


def rrf(results: list[list[str]], rank_const: int = RRF_RANK_CONST) -> list[str]:
    """Reciprocal rank fusion (search_utils.py:744-755): score(uuid) =
    sum over lanes of 1/(rank + const); ties broken by uuid for
    determinism (the reference relies on dict order)."""
    scores: dict[str, float] = {}
    for lane in results:
        for rank, u in enumerate(lane):
            scores[u] = scores.get(u, 0.0) + 1.0 / (rank + rank_const)
    return sorted(scores, key=lambda u: (-scores[u], u))


def maximal_marginal_relevance(
    query: np.ndarray,
    candidates: dict[str, np.ndarray],
    lambda_: float = MMR_LAMBDA,
) -> list[str]:
    """MMR rerank: lambda*rel − (1−lambda)*max-sim-to-picked.

    The reference computes mmr scores then returns ``list(set(...))``
    which destroys the ordering (search_utils.py:825-838, noted in
    SURVEY.md Q8) — here the ranked order is preserved (greedy pick),
    which is what MMR means."""
    if not candidates:
        return []
    ids = sorted(candidates)
    vecs = np.stack([candidates[u] for u in ids])
    rel = vecs @ query
    picked: list[int] = []
    remaining = set(range(len(ids)))
    while remaining:
        if not picked:
            scores = {i: lambda_ * rel[i] for i in remaining}
        else:
            pv = vecs[picked]
            scores = {
                i: lambda_ * rel[i] - (1 - lambda_) * float((vecs[i] @ pv.T).max())
                for i in remaining
            }
        best = min(remaining, key=lambda i: (-scores[i], ids[i]))
        picked.append(best)
        remaining.discard(best)
    return [ids[i] for i in picked]


def node_distance_scores(
    candidate_uuids: list[str],
    center_uuid: str,
    adjacency: dict[str, set[str]],
    max_depth: int = 3,
) -> dict[str, float]:
    """BFS shortest-path distance from center -> score 1/d (inf->0),
    the batch analog of node_distance_reranker
    (search_utils.py:758-795)."""
    dist = {center_uuid: 0}
    frontier = [center_uuid]
    d = 0
    while frontier and d < max_depth:
        d += 1
        nxt = []
        for u in frontier:
            for v in adjacency.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return {
        u: (1.0 / dist[u]) if u in dist and dist[u] > 0 else (1.0 if u == center_uuid else 0.0)
        for u in candidate_uuids
    }


def episode_mentions_rank(candidate_uuids: list[str], mention_counts: dict[str, int]) -> list[str]:
    """Rank candidates by MENTIONS degree, MOST-mentioned first; count
    comes from a mentions groupby upstream.

    DELIBERATE DEVIATION from the reference: episode_mentions_reranker
    (search_utils.py:798-822) sorts by raw count ascending (no
    ``reverse``), returning the LEAST-mentioned candidates first — at
    odds with its own docstring ("rank by how many episodes mention
    them", used to surface salient entities). We rank descending, with
    uuid as a deterministic tie-break the reference also lacks."""
    return sorted(candidate_uuids, key=lambda u: (-mention_counts.get(u, 0), u))
