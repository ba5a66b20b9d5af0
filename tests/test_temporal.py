"""Temporal invalidation semantics, ported case-for-case from the
reference unit tests (tests/utils/maintenance/test_edge_operations.py:
94-237) onto the batch sweep (stages/edges._sweep_group) — FIXTURES.md
F5."""

from datetime import datetime, timedelta

import pandas as pd
import pytest

from graphiti_ray.stages.edges import _merge_pair_group, _sweep_bucket

NOW = datetime(2026, 1, 1)


def mk(uuid, tgt, valid_at=None, invalid_at=None, created=None, fact_norm=None):
    return {
        "uuid": uuid,
        "source_node_uuid": "S",
        "target_node_uuid": tgt,
        "name": "WORKS_FOR",
        "fact": f"fact {uuid}",
        "fact_norm": fact_norm or f"fact {uuid}",
        "episodes": [f"ep-{uuid}"],
        "group_id": "g",
        "created_at": created or datetime(2025, 1, 1),
        "valid_at": valid_at,
        "invalid_at": invalid_at,
        "partition_id": 0,
    }


def sweep(rows):
    out = _sweep_bucket(pd.DataFrame(rows), NOW)
    return {r["uuid"]: r for r in out.to_pylist()}


def test_no_changes():
    # analog of test_resolve_extracted_edge_no_changes: no dates, no
    # contradictions -> nothing invalidated
    out = sweep([mk("e1", "T1")])
    assert pd.isna(out["e1"]["invalid_at"]) and pd.isna(out["e1"]["expired_at"])


def test_extraction_dates_set_expired():
    # analog of test_resolve_extracted_edge_with_dates: an edge arriving
    # with invalid_at from extraction gets expired_at stamped
    v = datetime(2025, 6, 1)
    iv = datetime(2025, 7, 1)
    out = sweep([mk("e1", "T1", valid_at=v, invalid_at=iv)])
    assert out["e1"]["valid_at"] == v
    assert out["e1"]["invalid_at"] == iv
    assert out["e1"]["expired_at"] == NOW


def test_older_candidate_invalidated():
    # analog of test_resolve_extracted_edge_with_invalidation: candidate
    # (valid 2 days ago, open) closed at new edge's valid_at (1 day ago)
    new_valid = datetime(2025, 6, 10)
    cand_valid = datetime(2025, 6, 9)
    out = sweep(
        [
            mk("cand", "OrgA", valid_at=cand_valid),
            mk("new", "OrgB", valid_at=new_valid),
        ]
    )
    assert out["cand"]["invalid_at"] == new_valid
    assert out["cand"]["expired_at"] == NOW
    assert pd.isna(out["new"]["invalid_at"])


def test_disjoint_intervals_untouched():
    # T2 skip: candidate already invalid before new edge becomes valid
    out = sweep(
        [
            mk("cand", "OrgA", valid_at=datetime(2025, 1, 1), invalid_at=datetime(2025, 2, 1)),
            mk("new", "OrgB", valid_at=datetime(2025, 6, 1)),
        ]
    )
    assert out["cand"]["invalid_at"] == datetime(2025, 2, 1)
    # expired stamped because invalid_at was already set (bookkeeping),
    # but the interval is NOT shortened by the later fact
    assert pd.isna(out["new"]["invalid_at"])


def test_newer_existing_expires_new_edge():
    # T3 (edge_operations.py:287-300): a candidate with valid_at NEWER
    # than the new edge closes the new edge at candidate.valid_at
    out = sweep(
        [
            mk("new", "OrgB", valid_at=datetime(2025, 6, 1)),
            mk("cand", "OrgA", valid_at=datetime(2025, 6, 15)),
        ]
    )
    assert out["new"]["invalid_at"] == datetime(2025, 6, 15)
    assert out["new"]["expired_at"] == NOW
    assert pd.isna(out["cand"]["invalid_at"])


def test_same_object_never_self_invalidates():
    out = sweep(
        [
            mk("a", "OrgA", valid_at=datetime(2025, 6, 1)),
            mk("b", "OrgA", valid_at=datetime(2025, 7, 1), fact_norm="different wording"),
        ]
    )
    assert pd.isna(out["a"]["invalid_at"]) and pd.isna(out["b"]["invalid_at"])


def test_chain_closes_each_interval_at_next():
    t1, t2, t3 = (datetime(2025, 1, 1), datetime(2025, 5, 1), datetime(2025, 9, 1))
    out = sweep(
        [
            mk("a", "OrgA", valid_at=t1),
            mk("b", "OrgB", valid_at=t2),
            mk("c", "OrgC", valid_at=t3),
        ]
    )
    assert out["a"]["invalid_at"] == t2
    assert out["b"]["invalid_at"] == t3
    assert pd.isna(out["c"]["invalid_at"])


# ---------------------------------------------------------------- dedupe

def test_pair_merge_unions_provenance_and_dates():
    rows = [
        mk("a", "T1", valid_at=datetime(2025, 3, 1), fact_norm="same"),
        mk("b", "T1", valid_at=datetime(2025, 2, 1), fact_norm="same"),
    ]
    rows[0]["episode_uuid"] = "ep1"
    rows[1]["episode_uuid"] = "ep2"
    for r in rows:
        del r["episodes"]
    out = _merge_pair_group(pd.DataFrame(rows)).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert sorted(r["episodes"]) == ["ep1", "ep2"]
    assert r["valid_at"] == datetime(2025, 2, 1)  # min non-null


def test_ended_marker_folds_into_open_edge():
    pos = mk("a", "T1", valid_at=datetime(2025, 3, 1), fact_norm="x works for y")
    end = mk("b", "T1", invalid_at=datetime(2025, 8, 1), fact_norm="x no longer works for y")
    pos["episode_uuid"], end["episode_uuid"] = "ep1", "ep2"
    for r in (pos, end):
        del r["episodes"]
    out = _merge_pair_group(pd.DataFrame([pos, end])).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert r["valid_at"] == datetime(2025, 3, 1)
    assert r["invalid_at"] == datetime(2025, 8, 1)
    assert sorted(r["episodes"]) == ["ep1", "ep2"]


def test_marker_without_positive_survives():
    end = mk("b", "T1", invalid_at=datetime(2025, 8, 1), fact_norm="x no longer works for y")
    end["episode_uuid"] = "ep2"
    del end["episodes"]
    out = _merge_pair_group(pd.DataFrame([end])).to_pylist()
    assert len(out) == 1
    assert out[0]["valid_at"] is None
    assert out[0]["invalid_at"] == datetime(2025, 8, 1)
