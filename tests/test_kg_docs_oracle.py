"""Driver-style DuckDB-oracle gate for the KG chain over the
SQL-mirrorable doc corpus (sources/pages_kg.py): the full pipeline
(extraction -> alias canonicalization -> edge dedupe -> temporal sweep)
must hash-match the SQL mirror value-for-value, the same compare the
driver's correctness gate runs (sorted columns, sorted rows)."""

import duckdb
import pytest

from oracle_compare import assert_oracle_match

SF_DIR = "/root/testdata/sf0.001"

KG_DOCS_QUERIES = [
    "kg_nodes",
    "kg_mentions",
    "kg_uuid_map",
    "kg_triples",
    "kg_edges",
    "kg_mention_degrees",
    "kg_node_summaries",
    "kg_communities",
    "kg_entity_timeline",
    "kg_negative_samples",
    "kg_verbalize",
    "kg_multihop_qa",
    "kg_asof_snapshot",
    "kg_random_walks",
    "kg_bfs_reach",
    "kg_contradictions",
    "kg_change_events",
    "kg_predicate_stats",
    "kg_entity_cooccurrence",
    "kg_modularity",
    "kg_skipgram_pairs",
    "kg_link_prediction",
    "kg_transitivity",
    "kg_ppr",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", KG_DOCS_QUERIES)
def test_kg_docs_query_matches_duckdb_oracle(ray_session, duck, name):
    from graphiti_ray import queries as q

    res = q.QUERIES[name](SF_DIR)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    odf = duck.execute(q.ORACLE_SQL[name]).df()

    assert_oracle_match(rdf, odf)


def test_kg_docs_communities_name_order_distributed_path(ray_session):
    """The distributed-LP fallback must coincide with the in-worker
    path under order_key='name' too (the knob the SQL mirror relies
    on) — same invariant as the uuid-order forced-path test, on the
    relabeled domain."""
    from graphiti_ray import queries as q
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.pages_kg import kg_pages_from_documents
    from graphiti_ray.stages.communities import build_communities

    # a 1/5 corpus slice (two groups): the forced-distributed path runs
    # MAX_LP_ITERS bucketed exchanges PER GROUP, so the full 10-group
    # corpus costs ~10 minutes of pure exchange overhead for the same
    # equality invariant two groups already pin
    kg = build_kg(
        kg_pages_from_documents(SF_DIR, mod_rem=(5, 0)),
        now=q.NOW, concurrency=2,
    )
    cols = ["community_uuid", "entity_uuid"]
    base = (
        build_communities(kg.nodes, kg.edges, order_key="name")
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    forced = (
        build_communities(kg.nodes, kg.edges, hot_group_rows=0, order_key="name")
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    assert len(forced) == len(base) > 0
    assert forced.equals(base)


def test_kg_docs_corpus_exercises_every_stage(ray_session):
    """The oracle corpus must be non-trivial for each pipeline stage:
    alias merges happened (uuid_map rows), the sweep closed edges
    (non-null invalid_at), provenance merged (n_episodes > 1)."""
    import pyarrow.compute as pc

    from graphiti_ray import queries as q

    uuid_map = q.QUERIES["kg_uuid_map"](SF_DIR).to_pandas()
    assert len(uuid_map) > 0
    # round 4: the initial+surname alias form is observed and mapped
    assert uuid_map["alias_name"].str.contains(r"^\w\. ", regex=True).any()
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    assert edges["invalid_at"].notna().sum() > 0
    assert (edges["n_episodes"] > 1).sum() > 0
    # round 4: every extraction pattern fires, including the new ones
    preds = set(edges["pred"])
    assert {"WORKS_FOR", "LIVES_IN", "BORN_IN", "HOLDS_ROLE",
            "SPOUSE_OF", "MOVED_TO"} <= preds
    # 'ended' markers are live: some folded into an open fact (an edge
    # closed EARLIER than any same-pair contradiction could — i.e. a
    # WORKS_FOR edge with n_episodes > 1 merged from a marker), and the
    # fold/survivor split is non-degenerate (some marker rows survive
    # as valid_at-null WORKS_FOR edges)
    wf = edges[edges["pred"] == "WORKS_FOR"]
    assert (wf["valid_at"].isna() & wf["invalid_at"].notna()).sum() > 0
    # SPOUSE_OF objects are canonical full names (target rewrite ran)
    sp = edges[edges["pred"] == "SPOUSE_OF"]
    assert sp["obj"].str.contains(" ").all()


def test_negative_samples_invariants(ray_session):
    """Negatives never equal their positives, the untouched side is
    preserved, both sides get corrupted somewhere, every replacement
    is a canonical entity, and two builds produce the identical
    sample (hash-determinism)."""
    import pandas as pd

    from graphiti_ray import queries as q

    df = q.QUERIES["kg_negative_samples"](SF_DIR).to_pandas()
    heads = df[df["corrupt_side"] == "head"]
    tails = df[df["corrupt_side"] == "tail"]
    assert len(heads) > 0 and len(tails) > 0
    assert (heads["neg_subj"] != heads["subj"]).all()
    assert (heads["neg_obj"] == heads["obj"]).all()
    assert (tails["neg_obj"] != tails["obj"]).all()
    assert (tails["neg_subj"] == tails["subj"]).all()
    nodes = set(q.QUERIES["kg_nodes"](SF_DIR).to_pandas()["name"])
    repl = pd.concat([heads["neg_subj"], tails["neg_obj"]])
    assert set(repl) <= nodes
    again = q.QUERIES["kg_negative_samples"](SF_DIR).to_pandas()
    key = sorted(df.columns)
    assert df[key].sort_values(key).reset_index(drop=True).equals(
        again[key].sort_values(key).reset_index(drop=True)
    )


def test_multihop_qa_invariants(ray_session):
    """Every QA pair is grounded in the canonical KG: the first hop is
    a real SPOUSE_OF triple, the second hop a real templated triple
    from the mid entity, the answer IS the dst, the question embeds
    the src name, and no reflexive spouse-of-spouse pair leaks."""
    from graphiti_ray import queries as q

    df = q.QUERIES["kg_multihop_qa"](SF_DIR).to_pandas()
    assert len(df) > 0
    assert (df["answer"] == df["dst"]).all()
    assert all(
        s in question for s, question in zip(df["src"], df["question"])
    )
    assert (df["src"] != df["mid"]).all()
    # spouse-of-spouse (dst == src via SPOUSE_OF) never appears
    assert not df["question"].str.contains("spouse of the spouse").any()
    th = q.QUERIES["kg_two_hop"](SF_DIR).to_pandas()
    hop = set(zip(th["group_id"], th["src"], th["mid"], th["dst"]))
    assert all(
        t in hop
        for t in zip(df["group_id"], df["src"], df["mid"], df["dst"])
    )
    # more than one question template fired (pred2 diversity)
    stems = df["question"].str.split("?").str[0].str.split(" ").str[0]
    assert stems.nunique() > 1


def test_random_walks_invariants(ray_session):
    """Every consecutive pair in every walk is a real (symmetrized)
    KG edge, every connected node starts exactly walks_per_node
    walks, and the walk set is rerun-deterministic (no RNG state)."""
    from graphiti_ray import queries as q
    from graphiti_ray.ops.walks import WALK_LEN, WALKS_PER_NODE

    df = q.QUERIES["kg_random_walks"](SF_DIR).to_pandas()
    assert len(df) > 0
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    sym = set()
    for g, s, o in zip(edges["group_id"], edges["subj"], edges["obj"]):
        if s != o:
            sym.add((g, s, o))
            sym.add((g, o, s))
    path = ["start"] + [f"n{k}" for k in range(1, WALK_LEN + 1)]
    for a, b in zip(path, path[1:]):
        assert all(
            (g, x, y) in sym
            for g, x, y in zip(df["group_id"], df[a], df[b])
        ), (a, b)
    per_start = df.groupby(["group_id", "start"]).size()
    assert (per_start == WALKS_PER_NODE).all()
    n_connected = len({(g, s) for g, s, _ in sym})
    assert len(df) == n_connected * WALKS_PER_NODE
    again = q.QUERIES["kg_random_walks"](SF_DIR).to_pandas()
    key = sorted(df.columns)
    assert df[key].sort_values(key).reset_index(drop=True).equals(
        again[key].sort_values(key).reset_index(drop=True)
    )
    # walks genuinely branch: not every walk from a node is identical
    assert df.groupby(["group_id", "start"])["walk_text"].nunique().gt(1).any()


def test_contradictions_invariants(ray_session):
    """Every lineage pair is grounded: the closed fact exists in the
    canonical edge set with exactly that invalid_at, the closing fact
    exists with valid_at == that invalid_at, objects differ, and every
    sweep-closed exclusive edge whose closing time matches another
    fact's start appears in the report."""
    from graphiti_ray import queries as q
    from graphiti_ray.functions.extraction import EXCLUSIVE_PREDICATES

    df = q.QUERIES["kg_contradictions"](SF_DIR).to_pandas()
    assert len(df) > 0
    assert set(df["pred"]) <= set(EXCLUSIVE_PREDICATES)
    assert (df["obj_closed"] != df["obj_new"]).all()
    assert (df["closed_valid_at"] < df["invalid_at"]).all()
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    key = set(
        zip(edges["group_id"], edges["subj"], edges["pred"],
            edges["obj"], edges["valid_at"], edges["invalid_at"])
    )
    for r in df.itertuples():
        assert (
            r.group_id, r.subj, r.pred, r.obj_closed,
            r.closed_valid_at, r.invalid_at,
        ) in key
    starts = set(
        zip(edges["group_id"], edges["subj"], edges["pred"],
            edges["obj"], edges["valid_at"])
    )
    for r in df.itertuples():
        assert (
            r.group_id, r.subj, r.pred, r.obj_new, r.invalid_at
        ) in starts


def test_change_events_invariants(ray_session):
    """Every caption is grounded in a contradiction pair, embeds both
    objects and the date, rows are globally distinct, and more than
    one predicate template fires."""
    from graphiti_ray import queries as q

    df = q.QUERIES["kg_change_events"](SF_DIR).to_pandas()
    assert len(df) > 0
    assert not df.duplicated().any()
    ctr = q.QUERIES["kg_contradictions"](SF_DIR).to_pandas()
    pairs = set(
        zip(ctr["group_id"], ctr["subj"], ctr["pred"],
            ctr["obj_closed"], ctr["obj_new"],
            ctr["invalid_at"].dt.strftime("%Y-%m-%d"))
    )
    for r in df.itertuples():
        assert (
            r.group_id, r.subj, r.pred, r.obj_closed, r.obj_new,
            r.change_date,
        ) in pairs
        assert r.obj_closed in r.caption
        assert r.obj_new in r.caption
        assert r.change_date in r.caption
        assert r.caption.startswith(r.subj)
    # this corpus's LIVES_IN/HOLDS_ROLE closures come from marker
    # folds, not same-instant contradictions, so only WORKS_FOR pairs
    # exist — pin that the template map COVERS every observed pred
    # and that multiple distinct subjects/dates fired
    from graphiti_ray.ops.contradictions import CHANGE_TEMPLATES

    assert set(df["pred"]) <= set(CHANGE_TEMPLATES)
    assert df["subj"].nunique() > 1 and df["change_date"].nunique() > 1


def test_predicate_stats_invariants(ray_session):
    """Profile sanity: totals reconcile with the edge table per
    (group, pred); bounds hold (n_subjects/n_objects <= n_edges,
    n_closed <= n_edges, max_obj_per_subj <= n_objects); every
    extraction predicate is profiled."""
    from graphiti_ray import queries as q

    df = q.QUERIES["kg_predicate_stats"](SF_DIR).to_pandas()
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    want = edges.groupby(["group_id", "pred"]).size()
    got = df.set_index(["group_id", "pred"])["n_edges"]
    assert got.sort_index().equals(want.sort_index())
    assert (df["n_subjects"] <= df["n_edges"]).all()
    assert (df["n_objects"] <= df["n_edges"]).all()
    assert (df["n_closed"] <= df["n_edges"]).all()
    assert (df["max_obj_per_subj"] <= df["n_objects"]).all()
    assert (df["max_obj_per_subj"] >= 1).all()
    assert set(df["pred"]) == set(edges["pred"])


def test_entity_cooccurrence_invariants(ray_session):
    """Counts reconcile against a brute-force recount from the mention
    table; pair ordering (a < b) holds; lift matches the integer
    formula; marginals never exceed the episode count."""
    from collections import Counter
    from itertools import combinations

    from graphiti_ray import queries as q

    df = q.QUERIES["kg_entity_cooccurrence"](SF_DIR).to_pandas()
    assert len(df) > 0
    assert (df["ent_a"] < df["ent_b"]).all()
    m = q.QUERIES["kg_mentions"](SF_DIR).to_pandas()
    brute = Counter()
    for (g, _), grp in m.groupby(["group_id", "url"]):
        for a, b in combinations(sorted(set(grp["name"])), 2):
            brute[(g, a, b)] += 1
    got = {
        (r.group_id, r.ent_a, r.ent_b): r.n_co for r in df.itertuples()
    }
    assert got == dict(brute)
    ep = m.groupby("group_id")["url"].nunique()
    for r in df.itertuples():
        n_ep = ep[r.group_id]
        assert r.n_a <= n_ep and r.n_b <= n_ep and r.n_co <= min(r.n_a, r.n_b)
        assert r.lift_milli == r.n_co * n_ep * 1000 // (r.n_a * r.n_b)


def test_modularity_invariants(ray_session):
    """q_scaled reconciles with a brute-force recompute from the
    community membership + undirected edge set, and Q = q_scaled/4m^2
    is in (0, 1] for every group — the LP partition must beat a
    random one on its own graph."""
    from graphiti_ray import queries as q

    df = q.QUERIES["kg_modularity"](SF_DIR).to_pandas()
    assert len(df) > 0
    comm = q.QUERIES["kg_communities"](SF_DIR).to_pandas()
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    lab = {
        (g, n): c
        for g, n, c in zip(
            comm["group_id"], comm["name"], comm["community_name"]
        )
    }
    for r in df.itertuples():
        g = r.group_id
        und = {
            tuple(sorted((s, o)))
            for gg, s, o in zip(
                edges["group_id"], edges["subj"], edges["obj"]
            )
            if gg == g and s != o
        }
        m = len(und)
        assert m == r.m_edges
        from collections import Counter

        dc: Counter = Counter()
        lc: Counter = Counter()
        for u, v in und:
            dc[lab[(g, u)]] += 1
            dc[lab[(g, v)]] += 1
            if lab[(g, u)] == lab[(g, v)]:
                lc[lab[(g, u)]] += 1
        want = sum(4 * m * lc[c] - dc[c] ** 2 for c in dc)
        assert want == r.q_scaled
        assert 0 < r.q_scaled <= 4 * m * m


def test_skipgram_pairs_invariants(ray_session):
    """Pair-count conservation (walks x positions-per-walk), symmetry
    (every (c,x) multiplicity equals (x,c) — the window is symmetric),
    and every pair multiset matches a brute recount from the walks."""
    from collections import Counter

    from graphiti_ray import queries as q
    from graphiti_ray.ops.walks import WALK_LEN, _positions

    df = q.QUERIES["kg_skipgram_pairs"](SF_DIR).to_pandas()
    walks = q.QUERIES["kg_random_walks"](SF_DIR).to_pandas()
    pos = _positions(WALK_LEN)
    assert df["n_pairs"].sum() == len(walks) * len(pos)
    names = ["start"] + [f"n{k}" for k in range(1, WALK_LEN + 1)]
    brute = Counter()
    for r in walks.itertuples():
        seq = [getattr(r, c) for c in names]
        for i, j in pos:
            brute[(r.group_id, seq[i], seq[j])] += 1
    got = {
        (r.group_id, r.center, r.context): r.n_pairs
        for r in df.itertuples()
    }
    assert got == dict(brute)
    sym = {(g, x, c): n for (g, c, x), n in got.items()}
    assert sym == got


def test_link_prediction_invariants(ray_session):
    """No predicted pair is an existing edge; cn and jaccard reconcile
    with a brute recompute from the symmetrized adjacency; jaccard is
    monotone in the formula (0 < jac <= 1000)."""
    from collections import defaultdict

    from graphiti_ray import queries as q

    df = q.QUERIES["kg_link_prediction"](SF_DIR).to_pandas()
    assert len(df) > 0
    assert (df["u"] < df["v"]).all()
    assert df["jaccard_milli"].between(1, 1000).all()
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    nbr = defaultdict(set)
    und = set()
    for g, s, o in zip(edges["group_id"], edges["subj"], edges["obj"]):
        if s != o:
            nbr[(g, s)].add(o)
            nbr[(g, o)].add(s)
            und.add((g, *sorted((s, o))))
    brute = {}
    for g, u, v in {
        (g, u, v)
        for (g, p), ns in nbr.items()
        for u in ns
        for v in ns
        if u < v
    }:
        if (g, u, v) in und:
            continue
        cn = len(nbr[(g, u)] & nbr[(g, v)])
        if cn:
            brute[(g, u, v)] = (
                cn, cn * 1000 // len(nbr[(g, u)] | nbr[(g, v)])
            )
    got = {
        (r.group_id, r.u, r.v): (r.cn, r.jaccard_milli)
        for r in df.itertuples()
    }
    assert got == brute


def test_ppr_invariants(ray_session):
    """PPR truth: the seed holds the max rank in its group, every
    positive-rank node is BFS-reachable from the seed (teleport mass
    only flows along edges), rank decays with BFS depth on average,
    and nodes outside the seed's component score 0."""
    from graphiti_ray import queries as q

    df = q.QUERIES["kg_ppr"](SF_DIR).to_pandas()
    reach = q.QUERIES["kg_bfs_reach"](SF_DIR).to_pandas()
    assert len(df) > 0
    depth = {
        (g, n): int(d)
        for g, n, d in zip(reach["group_id"], reach["node"],
                           reach["depth"])
    }
    seeds = dict(zip(reach["group_id"], reach["seed"]))
    for g, grp in df.groupby("group_id"):
        top = grp.loc[grp["ppr_e9"].idxmax()]
        assert top["name"] == seeds[g], g
        # directed reachability is a subset of the symmetrized BFS
        # table only up to its depth cap; positive rank within <= 3
        # directed hops implies presence in the BFS reach set
        pos = grp[grp["ppr_e9"] > 0]
        assert len(pos) > 1  # mass spread beyond the seed
        d0 = [depth.get((g, n)) for n in pos["name"]]
        assert all(d is not None for d in d0), g
    # monotone-on-average decay: mean rank at depth 1 > depth 2
    df["depth"] = [
        depth.get((g, n)) for g, n in zip(df["group_id"], df["name"])
    ]
    by_d = df[df["depth"].notna()].groupby("depth")["ppr_e9"].mean()
    assert by_d.loc[0] > by_d.loc[1] > by_d.loc[2]


def test_transitivity_invariants(ray_session):
    """Reconciles with kg_triangles and a brute wedge count; the milli
    ratio is within [0, 1000]; at least one group is triangle-free and
    at least one is not (both mirror paths exercised)."""
    from collections import Counter

    from graphiti_ray import queries as q

    df = q.QUERIES["kg_transitivity"](SF_DIR).to_pandas()
    tri = q.QUERIES["kg_triangles"](SF_DIR).to_pandas()
    tmap = dict(zip(tri["group_id"], tri["n_triangles"]))
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    deg: Counter = Counter()
    for g, s, o in {
        (g, *sorted((s, o)))
        for g, s, o in zip(
            edges["group_id"], edges["subj"], edges["obj"]
        )
        if s != o
    }:
        deg[(g, s)] += 1
        deg[(g, o)] += 1
    wedges: Counter = Counter()
    for (g, _), d in deg.items():
        wedges[g] += d * (d - 1) // 2
    for r in df.itertuples():
        assert r.n_triangles == tmap.get(r.group_id, 0)
        assert r.n_wedges == wedges[r.group_id]
        assert 0 <= r.transitivity_milli <= 1000
        assert r.transitivity_milli == 3 * r.n_triangles * 1000 // r.n_wedges
    assert (df["n_triangles"] == 0).any()
    assert (df["n_triangles"] > 0).any()


def test_transitivity_zero_wedge_group_excluded(ray_session):
    """A group whose graph has only degree-1 nodes (zero wedges) must
    be EXCLUDED, not crash on 0 // 0 — the mirror filters
    n_wedges > 0 (regression: pandas NaN .astype(int64) raised)."""
    import ray.data as rd

    from graphiti_ray.ops.graph import transitivity

    rows = [
        {"group_id": "lonely", "subj": "A", "name": "R", "obj": "B"},
        {"group_id": "tri", "subj": "X", "name": "R", "obj": "Y"},
        {"group_id": "tri", "subj": "Y", "name": "R", "obj": "Z"},
        {"group_id": "tri", "subj": "X", "name": "R", "obj": "Z"},
    ]
    df = transitivity(rd.from_items(rows)).to_pandas()
    assert "lonely" not in set(df["group_id"])
    assert df.loc[df["group_id"] == "tri", "transitivity_milli"].iloc[0] == 1000


def test_bfs_reach_invariants(ray_session):
    """BFS truth: the seed is at depth 0 of its own reach set, every
    depth-k node (k>0) has a symmetrized-edge neighbor at depth k-1,
    depths never exceed the cap, and every group reaches beyond its
    seed (the corpus graphs are connected enough to be non-trivial)."""
    from graphiti_ray import queries as q
    from graphiti_ray.ops.graph import BFS_MAX_DEPTH

    df = q.QUERIES["kg_bfs_reach"](SF_DIR).to_pandas()
    assert len(df) > 0
    assert df["depth"].between(0, BFS_MAX_DEPTH).all()
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    sym = set()
    for g, s, o in zip(edges["group_id"], edges["subj"], edges["obj"]):
        if s != o:
            sym.add((g, s, o))
            sym.add((g, o, s))
    by_depth = {
        (g, int(d)): set(grp["node"])
        for (g, d), grp in df.groupby(["group_id", "depth"])
    }
    for g, grp in df.groupby("group_id"):
        z = grp[grp["depth"] == 0]
        assert len(z) == 1 and z["node"].iloc[0] == z["seed"].iloc[0]
        assert grp["depth"].max() >= 1
    for (g, d), nodes in by_depth.items():
        if d == 0:
            continue
        prev = by_depth[(g, d - 1)]
        for n in nodes:
            assert any((g, p, n) in sym for p in prev), (g, d, n)


def test_asof_snapshot_invariants(ray_session):
    """The snapshot is a strict, non-trivial subset of the canonical
    edge set: every row was valid at T and not yet invalidated, at
    least one edge is excluded for starting after T, at least one for
    being already closed by T, and no unknown-valid_at marker leaks."""
    import pandas as pd

    from graphiti_ray import queries as q
    from graphiti_ray.queries import KG_ASOF_T

    T = pd.Timestamp(KG_ASOF_T)
    snap = q.QUERIES["kg_asof_snapshot"](SF_DIR).to_pandas()
    edges = q.QUERIES["kg_edges"](SF_DIR).to_pandas()
    assert 0 < len(snap) < len(edges)
    assert snap["valid_at"].notna().all()
    assert (snap["valid_at"] <= T).all()
    inv = snap["invalid_at"].dropna()
    assert (inv > T).all()
    assert (edges["valid_at"] > T).any()  # future facts exist
    assert (edges["invalid_at"] <= T).any()  # already-closed facts exist
    key = ["group_id", "subj", "pred", "obj", "fact"]
    all_keys = set(map(tuple, edges[key].itertuples(index=False)))
    assert set(map(tuple, snap[key].itertuples(index=False))) <= all_keys
