"""PageRank over the canonical KG vs its unrolled DuckDB mirror, with
the driver's exact compare, plus algebraic invariants that do not
depend on the oracle."""

import duckdb
import numpy as np
import pytest

from oracle_compare import assert_oracle_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["kg_pagerank", "kg_triangles", "kg_degree_hist", "kg_two_hop"]
)
def test_graph_matches_duckdb_oracle(ray_session, duck, name):
    from graphiti_ray import queries as q

    rdf = q.QUERIES[name](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL[name]).df()

    assert_oracle_match(rdf, odf)


def test_pagerank_invariants(ray_session):
    """Oracle-free sanity: (a) one row per (group, node) matching the
    node table; (b) every rank >= the teleport floor (1-d)/N_g;
    (c) per-group total mass <= 1 (dangling mass is dropped, never
    added); (d) a node with in-links from every other node outranks
    the group's minimum."""
    from graphiti_ray import queries as q
    from graphiti_ray.ops.graph import PR_DAMP

    df = q.QUERIES["kg_pagerank"](SF_DIR).to_pandas()
    nodes = q.QUERIES["kg_nodes"](SF_DIR).to_pandas()
    assert len(df) == len(nodes)
    assert not df.duplicated(["group_id", "name"]).any()

    g = df.groupby("group_id")["pr_e9"]
    n_g = g.transform("count").to_numpy().astype(np.float64)
    floor = np.floor((1.0 - PR_DAMP) / n_g * 1e9).astype(np.int64)
    assert (df["pr_e9"].to_numpy() >= floor - 1).all()
    assert (g.sum().to_numpy() <= 1_000_000_100).all()  # <= 1 + eps
    # ranks differ within groups (the graph is not regular)
    assert (g.max() > g.min()).any()


def test_pagerank_synthetic_star(ray_session):
    """Hand-checkable 4-node star a->c, b->c, c->d in one group: after
    any number of iterations d's rank exceeds c's teleport-only floor
    ordering: r(c) > r(a) = r(b), r(d) > r(a)."""
    import ray.data as rd

    from graphiti_ray.ops.graph import pagerank

    nodes = rd.from_items(
        [{"group_id": "g", "name": n} for n in ["a", "b", "c", "d"]]
    )
    edges = rd.from_items(
        [
            {"group_id": "g", "subj": "a", "obj": "c"},
            {"group_id": "g", "subj": "b", "obj": "c"},
            # duplicate edge must collapse (DISTINCT contract)
            {"group_id": "g", "subj": "b", "obj": "c"},
            {"group_id": "g", "subj": "c", "obj": "d"},
        ]
    )
    df = pagerank(nodes, edges).to_pandas().set_index("name")["pr_e9"]
    assert df["a"] == df["b"]
    assert df["c"] > df["a"]
    assert df["d"] > df["a"]


def test_triangles_synthetic(ray_session):
    """K4 minus one edge = 2 triangles; direction and multi-edges must
    not matter; self-loops ignored."""
    import ray.data as rd

    from graphiti_ray.ops.graph import degree_histogram, triangle_count

    def e(s, o):
        return {"group_id": "g", "subj": s, "obj": o}

    edges = rd.from_items(
        [
            e("a", "b"), e("b", "c"), e("c", "a"),      # triangle abc
            e("a", "c"),                                  # reverse dup of c->a
            e("a", "d"), e("d", "c"),                     # triangle acd
            e("d", "d"),                                  # self-loop ignored
        ]
    )
    tri = triangle_count(edges).to_pandas()
    assert len(tri) == 1 and tri["n_triangles"].iloc[0] == 2

    hist = degree_histogram(edges).to_pandas()
    # degrees: a=3, b=2, c=3, d=2 -> {2: 2 nodes, 3: 2 nodes}
    got = dict(zip(hist["degree"], hist["n_nodes"]))
    assert got == {2: 2, 3: 2}


def test_two_hop_synthetic(ray_session):
    """Paths = in-edge x out-edge per mid; duplicate edges collapse;
    groups never mix; back-and-forth (a->b->a) IS a valid 2-hop."""
    import ray.data as rd

    from graphiti_ray.ops.graph import two_hop_paths

    def e(g, s, p, o):
        return {"group_id": g, "subj": s, "name": p, "obj": o}

    edges = rd.from_items(
        [
            e("g", "a", "r1", "b"), e("g", "b", "r2", "c"),  # a->b->c
            e("g", "b", "r2", "c"),                          # dup collapses
            e("g", "b", "r3", "a"),  # a->b->a and b->a->b exist
            e("h", "c", "r4", "d"),  # other group: no cross paths
        ]
    )
    df = two_hop_paths(edges).to_pandas()
    paths = {
        tuple(r)
        for r in df[["group_id", "src", "mid", "dst"]].itertuples(index=False)
    }
    assert paths == {
        ("g", "a", "b", "c"),
        ("g", "a", "b", "a"),
        ("g", "b", "a", "b"),
    }
    assert len(df) == 3  # dup edge produced no dup path
