"""Property-based tests (hypothesis): the invariants that make the
batch reformulation sound.

The heart of the engine's correctness claim is that Graphiti's
arrival-order-dependent logic was re-expressed as ORDER-FREE batch
semantics (SURVEY.md §7 hard part (a)). These properties pin that:
the temporal sweep and pair merge must be invariant under input-row
permutation, and the sweep must leave intervals consistent with the
T2/T3 rules for every generated case, not just the ported fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import given, settings, strategies as st

from graphiti_ray.functions.extraction import alias_match
from graphiti_ray.functions.text import normalize_name
from graphiti_ray.stages.edges import _merge_and_sweep_bucket, EXCLUSIVE_PREDICATES

BASE = datetime(2025, 1, 1)

# small date pool (None = unknown) so contradictions/overlaps are common
dates = st.one_of(
    st.none(), st.integers(min_value=0, max_value=6).map(lambda d: BASE + timedelta(days=d))
)

edge_rows = st.lists(
    st.tuples(
        st.sampled_from(["S1", "S2"]),          # source
        st.sampled_from(["T1", "T2", "T3"]),    # target
        st.sampled_from(["WORKS_FOR", "KNOWS"]),  # exclusive + non-exclusive
        dates,                                   # valid_at
        dates,                                   # invalid_at
        st.integers(min_value=0, max_value=3),   # created_at offset
    ),
    min_size=1,
    max_size=8,
)

NOW = datetime(2026, 1, 1)


def _frame(rows):
    recs = []
    for i, (src, tgt, pred, va, iv, co) in enumerate(rows):
        recs.append(
            {
                "uuid": f"e{i}",
                "source_node_uuid": src,
                "target_node_uuid": tgt,
                "name": pred,
                "fact": f"fact {i}",
                "fact_norm": f"fact {i}",  # distinct facts: no pair merge collapse
                "episode_uuid": f"ep{i}",
                "group_id": "g",
                "created_at": BASE + timedelta(hours=co),
                "valid_at": va,
                "invalid_at": iv,
                "partition_id": 0,
            }
        )
    return pd.DataFrame(recs)


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = ["uuid", "source_node_uuid", "target_node_uuid", "name",
            "valid_at", "invalid_at", "expired_at"]
    out = df.to_pandas() if hasattr(df, "to_pandas") else df
    rows = out[cols].astype(str).itertuples(index=False)
    return sorted(tuple(r) for r in rows)


@settings(max_examples=60, deadline=None)
@given(edge_rows, st.randoms())
def test_sweep_is_order_free(rows, rnd):
    """Permuting input rows never changes the swept output — the batch
    analog of 'same facts, any arrival order'."""
    base = _merge_and_sweep_bucket(_frame(rows), NOW, frozenset(EXCLUSIVE_PREDICATES))
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    # re-index uuids consistently: permute rows but keep identity ->
    # map by original tuple identity
    perm = _frame(rows).sample(frac=1.0, random_state=rnd.randint(0, 10**6))
    out2 = _merge_and_sweep_bucket(perm, NOW, frozenset(EXCLUSIVE_PREDICATES))
    assert _canon(base) == _canon(out2)


@settings(max_examples=60, deadline=None)
@given(edge_rows)
def test_sweep_interval_invariants(rows):
    """T2/T3 post-conditions for every case:
    - an edge with invalid_at set has expired_at set;
    - for each exclusive edge e with valid_at, if the earliest later
      contradicting non-disjoint fact n exists, then e.invalid_at is
      n.valid_at or earlier (e was closed);
    - non-exclusive predicates are never invalidated by the sweep."""
    out = _merge_and_sweep_bucket(
        _frame(rows), NOW, frozenset(EXCLUSIVE_PREDICATES)
    ).to_pandas()
    for _, e in out.iterrows():
        if not pd.isna(e["invalid_at"]):
            assert not pd.isna(e["expired_at"])
    excl = out[out["name"].isin(EXCLUSIVE_PREDICATES)]
    for _, e in excl.iterrows():
        if pd.isna(e["valid_at"]):
            continue
        later = excl[
            (excl["source_node_uuid"] == e["source_node_uuid"])
            & (excl["name"] == e["name"])
            & (excl["target_node_uuid"] != e["target_node_uuid"])
            & excl["valid_at"].notna()
            & (excl["valid_at"] > e["valid_at"])
        ]
        # contradicting facts that the T2 disjointness rules do NOT skip
        candidates = []
        for _, n in later.iterrows():
            if not pd.isna(e["invalid_at"]) and e["invalid_at"] <= n["valid_at"]:
                continue
            if not pd.isna(n["invalid_at"]) and n["invalid_at"] <= e["valid_at"]:
                continue
            candidates.append(n["valid_at"])
        if candidates:
            assert not pd.isna(e["invalid_at"])
            assert e["invalid_at"] <= min(candidates)
    non_excl = out[~out["name"].isin(EXCLUSIVE_PREDICATES)]
    for _, e in non_excl.iterrows():
        # invalid_at only from extraction (the generated input), never
        # minted by the sweep: <= max input date
        if not pd.isna(e["invalid_at"]):
            assert e["invalid_at"] <= BASE + timedelta(days=6)


names = st.lists(
    st.sampled_from(["ana", "eli", "mira", "a", "e"]), min_size=1, max_size=3
).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(names, names)
def test_alias_match_symmetric(a, b):
    assert alias_match(a, b) == alias_match(b, a)
    assert alias_match(a, a)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_normalize_name_idempotent(s):
    n = normalize_name(s)
    assert normalize_name(n) == n
