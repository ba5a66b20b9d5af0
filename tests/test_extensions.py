"""Round-2 extension surfaces: reflexion protocol, context-window
extraction, user-supplied entity types, incremental build-on-top."""

import pyarrow as pa
import pytest

from graphiti_ray.functions.extraction import EpisodeExtraction


def _mk_pages(rows):
    from graphiti_ray.schemas import PAGES

    return pa.Table.from_pylist(rows, schema=PAGES)


def _episodes(rows):
    import ray.data as rd

    from graphiti_ray.stages.extract import pages_to_episodes

    return pages_to_episodes(rd.from_arrow(_mk_pages(rows)))


# NOTE: test extractor classes are defined INSIDE the test functions on
# purpose: module-level classes in tests/ would be cloudpickled by
# reference and the Ray actor would try (and fail, forever-restarting)
# to import the non-package test module — function-scoped classes are
# pickled by value.

def _one_pass_base():
    """Test extractor: the first pass only reads the FIRST line; the
    reflexion verdict flags capitalized tokens it missed elsewhere; a
    hinted pass picks them up — the deterministic image of the
    reference's 'what did you miss?' loop."""

    class OnePassBase:
        def _caps(self, text: str) -> list[str]:
            seen, out = set(), []
            for tok in text.replace("\n", " ").split():
                w = tok.strip(".,")
                if w and w[0].isupper() and w not in seen:
                    seen.add(w)
                    out.append(w)
            return out

        def extract_pass(self, content, reference_time, previous_episodes, missed_hints):
            out = EpisodeExtraction()
            out.entities = self._caps(content.split("\n")[0])
            for h in missed_hints:
                if h not in out.entities:
                    out.entities.append(h)
            return out

        def find_missed(self, content, extraction):
            return [c for c in self._caps(content) if c not in extraction.entities]

    return OnePassBase


def _context_counting_client():
    """Emits one extra entity per context episode — proves the T4
    window reaches the client through the unchanged actor-pool stage."""

    class ContextCountingClient:
        def extract(self, content, reference_time, previous_episodes=None):
            out = EpisodeExtraction()
            out.entities = ["Base"]
            for i, _ in enumerate(previous_episodes or []):
                out.entities.append(f"Ctx{i}")
            return out

    return ContextCountingClient


PAGES_3 = [
    {
        "url": f"https://g.example/p{i}",
        "warc_ts": __import__("datetime").datetime(2023, 1, 1 + i),
        "html": None,
        "text": "Alpha Corp hired staff.\nBeta Labs expanded.\nGamma Group merged.",
        "lang": "en",
    }
    for i in range(3)
]


def test_reflexion_changes_output_through_actor_pool(ray_session):
    import pyarrow.compute as pc

    from graphiti_ray.functions.clients import ReflexiveExtractor
    from graphiti_ray.stages.extract import extract_all

    def n_entities(factory):
        ext = extract_all(_episodes(PAGES_3), concurrency=1, client_factory=factory)
        t = ext.map_batches(
            lambda b: b.filter(pc.equal(b.column("kind"), "node")),
            batch_format="pyarrow",
        ).to_pandas()
        return t["name"].nunique()

    OnePassBase = _one_pass_base()
    single = n_entities(lambda: ReflexiveExtractor(OnePassBase(), max_reflexion=0))
    reflexive = n_entities(lambda: ReflexiveExtractor(OnePassBase()))
    assert single == 2  # Alpha, Corp from the first line only
    assert reflexive == 6  # reflexion recovered Beta/Labs/Gamma/Group


def test_context_window_reaches_client(ray_session):
    import pyarrow.compute as pc

    from graphiti_ray.stages.extract import extract_all

    ContextCountingClient = _context_counting_client()

    def names(with_context):
        ext = extract_all(
            _episodes(PAGES_3),
            concurrency=1,
            client_factory=ContextCountingClient,
            with_context=with_context,
        )
        t = ext.map_batches(
            lambda b: b.filter(pc.equal(b.column("kind"), "node")),
            batch_format="pyarrow",
        ).to_pandas()
        return sorted(t["name"].unique())

    assert names(False) == ["Base"]
    # 3 same-group episodes -> windows of size 0,1,2 -> Ctx0/Ctx1 appear
    assert names(True) == ["Base", "Ctx0", "Ctx1"]


def test_custom_entity_types_enrich_attributes(ray_session):
    import json

    import ray.data as rd

    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.synth import gen_pages_table

    entity_types = {
        "Employer": {
            "match": lambda n: n.endswith(("Corp", "Labs", "Systems", "Group", "Industries")),
            "attributes": lambda n: {"kind": "employer", "legal_name": n},
        }
    }
    kg = build_kg(
        rd.from_arrow(gen_pages_table(120)), concurrency=2,
        entity_types=entity_types,
    )
    nodes = kg.nodes.to_pandas()
    orgs = nodes[nodes["name"].str.endswith("Corp")]
    assert len(orgs) > 0
    assert all("Employer" in l for l in orgs["labels"])
    attrs = json.loads(orgs.iloc[0]["attributes"])
    assert attrs["kind"] == "employer" and attrs["legal_name"] == orgs.iloc[0]["name"]
    # non-matching entities fall back to the built-in rules
    people = nodes[nodes["labels"].apply(lambda l: "Person" in list(l))]
    assert len(people) > 0


def test_incremental_build_equals_full_rebuild(ray_session):
    import ray.data as rd

    from graphiti_ray.pipelines.kg import build_kg, build_kg_incremental
    from graphiti_ray.synth import gen_pages_table

    full = gen_pages_table(200)
    a, b = full.slice(0, 150), full.slice(150)

    kg_ab = build_kg(rd.from_arrow(full), concurrency=2)
    kg_a = build_kg(rd.from_arrow(a), concurrency=2)
    kg_inc = build_kg_incremental(kg_a, rd.from_arrow(b), concurrency=2)

    def frame(ds, cols):
        df = ds.to_pandas()[cols]
        return df.sort_values(cols).reset_index(drop=True)

    node_cols = ["uuid", "name", "group_id", "n_mentions"]
    assert frame(kg_inc.nodes, node_cols).equals(frame(kg_ab.nodes, node_cols))

    # episode_uuid (= provenance list head) is excluded: an
    # 'ended'-marker folded in build(A) keeps its episode attached to
    # the edge that was open AT THAT TIME (reference per-arrival
    # semantics), while a rebuild may re-attribute it to a newer fact
    # from B — see build_kg_incremental docstring
    tri_cols = ["group_id", "subj", "pred", "obj", "fact", "valid_at",
                "invalid_at"]
    left = frame(kg_inc.triples, tri_cols)
    right = frame(kg_ab.triples, tri_cols)
    assert len(left) == len(right) > 0
    assert left.equals(right)

    men_cols = ["episode_uuid", "entity_uuid", "group_id"]
    assert frame(kg_inc.mentions, men_cols).equals(frame(kg_ab.mentions, men_cols))


def test_engine_load_then_incremental(ray_session, tmp_path):
    import ray.data as rd

    from graphiti_ray.engine import GraphitiRay
    from graphiti_ray.synth import gen_pages_table

    full = gen_pages_table(120)
    a, b = full.slice(0, 80), full.slice(80)

    g = GraphitiRay(concurrency=2)
    g.build_to_dir(rd.from_arrow(a), str(tmp_path / "kg"), resume=False)

    g2 = GraphitiRay(concurrency=2)
    g2.load(str(tmp_path / "kg"))
    n_before = g2.kg.nodes.count()
    kg2 = g2.build_incremental(rd.from_arrow(b))
    assert kg2.nodes.count() >= n_before
    assert kg2.triples.count() > 0
    # loaded + incremental equals a from-scratch build over A ∪ B
    ref = GraphitiRay(concurrency=2).build(rd.from_arrow(full))
    got = kg2.triples.to_pandas()[["subj", "pred", "obj", "fact"]]
    want = ref.triples.to_pandas()[["subj", "pred", "obj", "fact"]]
    key = ["subj", "pred", "obj", "fact"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        want.sort_values(key).reset_index(drop=True)
    )


def test_rule_library_version_swap_through_actor_pool(ray_session):
    """Versioned rule library (promptlib.py, the prompts/lib.py:83-139
    registry analog): selecting rules-v2 at client construction changes
    extraction output through the SAME actor-pool stage; v1 treats the
    same sentence as plain NER."""
    import pyarrow.compute as pc

    from graphiti_ray.functions.clients import DeterministicExtractorClient
    from graphiti_ray.functions.promptlib import get_rules, register_rules
    from graphiti_ray.stages.extract import extract_all

    pages = [
        {
            "url": "https://g.example/founder",
            "warc_ts": __import__("datetime").datetime(2023, 5, 1),
            "html": None,
            "text": "Ada Lovelace founded Analytical Machines in 1843.",
            "lang": "en",
        }
    ]

    def preds(factory):
        ext = extract_all(_episodes(pages), concurrency=1, client_factory=factory)
        df = ext.to_pandas()
        return set(df[df["kind"] == "edge"]["name"])

    v1 = preds(DeterministicExtractorClient)
    v2 = preds(lambda: DeterministicExtractorClient(version="rules-v2"))
    assert "FOUNDED" not in v1
    assert "FOUNDED" in v2

    # USER-registered version: the rows must ride the client's
    # constructor into the actor process (the driver-side registry is
    # invisible to a worker's fresh module import) — rules= serializes
    # them through cloudpickle and self-registers per worker
    from graphiti_ray.functions.extraction import NAME

    custom = list(get_rules("rules-v1")) + [
        (rf"({NAME}) founded ({NAME}) in (\d{{4}})\.", "ESTABLISHED", "year3"),
    ]
    vx = preds(lambda: DeterministicExtractorClient(
        version="rules-user-x", rules=custom))
    assert "ESTABLISHED" in vx

    # registry hygiene: unknown version fails loudly; republish rejected
    with pytest.raises(KeyError):
        get_rules("rules-v99")
    with pytest.raises(ValueError):
        register_rules("rules-v1", [])
