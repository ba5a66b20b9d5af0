"""End-to-end golden tests (SURVEY.md §5b-d, FIXTURES.md F6):

- byte-identical html->text per url (north-star per-row invariant)
- pipeline triples == single-process reference-semantics oracle
  (P/R target 1.0 with the deterministic extractor; >=0.95 required)
- canonicalization merges alias surface forms
- checkpoint-resume at partition granularity: killing after k
  partitions and resuming produces the same output as one full run
"""

import shutil
from datetime import datetime

import pyarrow.parquet as pq
import pytest

from graphiti_ray.pipelines.kg import build_kg, run_kg_to_dir
from graphiti_ray.pipelines.oracle import oracle_triples, precision_recall
from graphiti_ray.synth import gen_pages_table

NOW = datetime(2026, 1, 1)
N_PAGES = 400


@pytest.fixture(scope="module")
def pages_tbl():
    return gen_pages_table(N_PAGES)


@pytest.fixture(scope="module")
def kg(ray_session, pages_tbl):
    import ray.data as rd

    return build_kg(rd.from_arrow(pages_tbl), now=NOW, concurrency=2)


def triple_set(rows):
    return {(t["subj"], t["pred"], t["obj"], t["valid_at"], t["invalid_at"]) for t in rows}


def test_extraction_byte_identical(kg, pages_tbl):
    by_url = {r["url"]: r["text"] for r in pages_tbl.to_pylist()}
    for row in kg.episodes.take_all():
        assert row["content"] == by_url[row["url"]], row["url"]


def test_triples_match_oracle(kg, pages_tbl):
    pipeline = triple_set(kg.triples.take_all())
    oracle = oracle_triples(pages_tbl, NOW)
    p, r = precision_recall(pipeline, oracle)
    assert p >= 0.95 and r >= 0.95, (p, r)
    # with the deterministic extractor both sides must agree exactly
    assert p == 1.0 and r == 1.0, (p, r)


def test_alias_canonicalization(kg):
    nodes = kg.nodes.take_all()
    names = {n["name"] for n in nodes}
    norms = [n["name_norm"] for n in nodes]
    # no bare-surname or initial-form nodes survive when the full form exists
    from graphiti_ray.functions.extraction import alias_match

    for i, a in enumerate(norms):
        for b in norms[i + 1 :]:
            assert not alias_match(a, b) or a == b, (a, b)
    # uuid_map non-trivial: alias forms were produced by the corpus
    assert kg.uuid_map.count() > 0
    assert len(names) == len(nodes) or True  # names can repeat across groups


def test_no_self_loops_and_provenance(kg):
    for e in kg.edges.take_all():
        assert e["source_node_uuid"] != e["target_node_uuid"]
        assert len(e["episodes"]) >= 1


def test_mentions_deduped(kg):
    seen = set()
    for m in kg.mentions.take_all():
        key = (m["episode_uuid"], m["entity_uuid"])
        assert key not in seen
        seen.add(key)


def test_exclusive_invalidation_happened(kg):
    # the corpus rotates employers across time buckets, so some
    # WORKS_FOR edges must have been temporally closed
    edges = [e for e in kg.edges.take_all() if e["name"] == "WORKS_FOR"]
    closed = [e for e in edges if e["invalid_at"] is not None]
    assert closed, "expected temporal invalidation on rotating employers"
    for e in closed:
        assert e["expired_at"] is not None
        if e["valid_at"] is not None:
            assert e["invalid_at"] > e["valid_at"]


def test_checkpoint_resume_partition_granularity(ray_session, pages_tbl, tmp_path_factory):
    import ray.data as rd

    from graphiti_ray.state import checkpoint as ckpt

    full_dir = str(tmp_path_factory.mktemp("kg_full"))
    part_dir = str(tmp_path_factory.mktemp("kg_resume"))

    run_kg_to_dir(rd.from_arrow(pages_tbl), full_dir, now=NOW, resume=False, concurrency=2)

    # simulated kill: process only a subset of partitions first...
    all_parts = sorted(ckpt.completed_partitions(full_dir))
    first_half = set(all_parts[: len(all_parts) // 2])
    r1 = run_kg_to_dir(
        rd.from_arrow(pages_tbl), part_dir, now=NOW, resume=False, concurrency=2,
    )
    # fake a partial manifest: drop second half from the manifest and
    # delete its output dirs (as clean_incomplete would after a crash)
    shutil.rmtree(ckpt.manifest_dir(part_dir))
    ckpt.write_manifest(
        part_dir,
        [
            {
                "partition_id": p, "episodes": 0, "nodes": 0, "edges": 0,
                "mentions": 0, "triples": 0, "wall_s": 0.0, "run_ts": 0.0,
            }
            for p in first_half
        ],
    )
    ckpt.clean_incomplete(part_dir, first_half)

    # ...then resume: must process exactly the remaining partitions
    r2 = run_kg_to_dir(rd.from_arrow(pages_tbl), part_dir, now=NOW, resume=True, concurrency=2)
    assert set(r2["skipped"]) == first_half
    assert set(r2["partitions_processed"]) == set(all_parts) - first_half

    # and the union must equal the one-shot run, byte-for-byte on triples
    t_full = pq.read_table(f"{full_dir}/triples").to_pylist()
    t_res = pq.read_table(f"{part_dir}/triples").to_pylist()
    assert triple_set(t_full) == triple_set(t_res)
    assert len(t_full) == len(t_res)


def test_waved_checkpoint_equals_single_pass(ray_session, pages_tbl, tmp_path_factory):
    """wave_size processes partitions in sequential manifest-bounded
    waves (the SIGKILL-survivable production shape bench.py
    --resume-proof kills for real); the union of waves must equal the
    one-shot run byte-for-byte, one manifest file per non-empty wave."""
    import os

    import ray.data as rd

    from graphiti_ray.state import checkpoint as ckpt

    full_dir = str(tmp_path_factory.mktemp("kg_wave_full"))
    wave_dir = str(tmp_path_factory.mktemp("kg_waved"))
    run_kg_to_dir(rd.from_arrow(pages_tbl), full_dir, now=NOW,
                  resume=False, concurrency=2)
    r = run_kg_to_dir(rd.from_arrow(pages_tbl), wave_dir, now=NOW,
                      resume=False, concurrency=2, wave_size=16)
    assert r["waves"] == 2
    assert set(r["partitions_processed"]) == ckpt.completed_partitions(wave_dir)
    t_full = pq.read_table(f"{full_dir}/triples").to_pylist()
    t_wave = pq.read_table(f"{wave_dir}/triples").to_pylist()
    assert triple_set(t_full) == triple_set(t_wave)
    assert len(t_full) == len(t_wave)
    manifests = [f for f in os.listdir(ckpt.manifest_dir(wave_dir))
                 if f.endswith(".parquet")]
    assert len(manifests) == 2


def test_rerun_byte_identical(ray_session, pages_tbl, kg):
    """Replay invariant: a second full run produces byte-identical
    triples (content-hash uuids + order-free semantics -> deterministic
    outputs across task retries and reruns)."""
    import ray.data as rd

    kg2 = build_kg(rd.from_arrow(pages_tbl), now=NOW, concurrency=2)
    cols = ["subj", "pred", "obj", "fact", "valid_at", "invalid_at",
            "group_id", "episode_uuid"]
    a = kg.triples.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    b = kg2.triples.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_pointer_rewrite_join_path_matches_broadcast(ray_session, monkeypatch):
    """At scale the alias map exceeds the broadcast threshold and the
    J3 rewrite switches to uuid_map hash joins; output must be
    identical to the broadcast path. Small corpus: the point is path
    equivalence, and forced hash joins pay fixed actor costs."""
    from graphiti_ray.synth import pages_dataset

    import graphiti_ray.stages.joins as joins

    base = build_kg(pages_dataset(80), now=NOW, concurrency=2)
    cols = ["subj", "pred", "obj", "fact", "valid_at", "invalid_at"]
    a = base.triples.to_pandas()[cols].sort_values(cols).reset_index(drop=True)

    monkeypatch.setattr(joins, "BROADCAST_MAX_ROWS", 0)
    kg2 = build_kg(pages_dataset(80), now=NOW, concurrency=2)
    b = kg2.triples.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
