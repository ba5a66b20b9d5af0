"""The wedge-expansion degree cap: planted-hub tests proving the
per-reducer output bound is REAL (not a docstring promise), the
truncation is deterministic, the drop is logged, and the default cap
leaves fixture-scale results bit-identical to the uncapped semantics
the SQL oracles pin."""

import logging

import numpy as np
import pandas as pd
import pytest

from oracle_compare import assert_oracle_match


def _star_edges(n_in=10, n_out=10):
    """Directed star through hub 'h': s00..s09 -p-> h -q-> t00..t09."""
    rows = [
        {"group_id": "g", "subj": f"s{i:02d}", "name": "p", "obj": "h"}
        for i in range(n_in)
    ]
    rows += [
        {"group_id": "g", "subj": "h", "name": "q", "obj": f"t{i:02d}"}
        for i in range(n_out)
    ]
    return rows


def test_two_hop_cap_bounds_hub_expansion(ray_session):
    import ray.data as rd

    from graphiti_ray.ops.graph import two_hop_paths

    edges = rd.from_items(_star_edges())
    full = two_hop_paths(edges, degree_cap=None).to_pandas()
    assert len(full) == 100  # 10 in x 10 out through the hub

    capped = two_hop_paths(rd.from_items(_star_edges()), degree_cap=3)
    cdf = capped.to_pandas()
    assert len(cdf) == 9  # cap^2, the per-reducer bound
    # deterministic keep-first: the lexicographically smallest edges
    assert sorted(cdf["src"].unique()) == ["s00", "s01", "s02"]
    assert sorted(cdf["dst"].unique()) == ["t00", "t01", "t02"]
    # capped output is a subset of the exact output
    key = ["group_id", "src", "pred1", "mid", "pred2", "dst"]
    merged = cdf.merge(full, on=key, how="left", indicator=True)
    assert (merged["_merge"] == "both").all()


def test_two_hop_default_cap_is_exact_below_bound(ray_session):
    """At fixture degree (max 11 at sf0.1) the default cap never
    triggers: capped == uncapped bit-for-bit."""
    import ray.data as rd

    from graphiti_ray.ops.graph import two_hop_paths
    from graphiti_ray.ops.wedgecap import WEDGE_DEGREE_CAP

    assert WEDGE_DEGREE_CAP >= 1024
    edges = rd.from_items(_star_edges(8, 8))
    dflt = two_hop_paths(edges, degree_cap=-1).to_pandas()
    exact = two_hop_paths(
        rd.from_items(_star_edges(8, 8)), degree_cap=None
    ).to_pandas()
    assert_oracle_match(dflt, exact)


def test_link_prediction_cap_bounds_pivot_wedges(ray_session):
    import ray.data as rd

    from graphiti_ray.ops.graph import link_prediction

    # undirected star: hub h adjacent to 10 leaves -> pivot h expands
    # C(10,2)=45 candidate pairs uncapped, C(3,2)=3 at cap=3
    edges = [
        {"group_id": "g", "subj": "h", "obj": f"l{i:02d}"}
        for i in range(10)
    ]
    full = link_prediction(
        rd.from_items(edges), degree_cap=None
    ).to_pandas()
    assert len(full) == 45
    cdf = link_prediction(rd.from_items(edges), degree_cap=3).to_pandas()
    assert len(cdf) == 3
    assert set(cdf["u"]).union(cdf["v"]) == {"l00", "l01", "l02"}
    # scores for surviving pairs are unchanged (cn=1, same degrees)
    key = ["group_id", "u", "v", "cn", "jaccard_milli"]
    merged = cdf[key].merge(full[key], on=key, how="left", indicator=True)
    assert (merged["_merge"] == "both").all()


def test_cooccurrence_cap_bounds_episode_expansion(ray_session):
    import ray.data as rd

    from graphiti_ray.ops.cooccur import entity_cooccurrence

    # one fat episode (5 mentions) + one normal (2 mentions)
    rows = [
        {"group_id": "g", "url": "u1", "name": f"e{i}"} for i in range(5)
    ] + [
        {"group_id": "g", "url": "u2", "name": n} for n in ("e0", "e9")
    ]
    full = entity_cooccurrence(
        rd.from_items(rows), degree_cap=None
    ).to_pandas()
    assert len(full) == 11  # C(5,2) + 1
    cdf = entity_cooccurrence(
        rd.from_items(rows), degree_cap=2
    ).to_pandas()
    # fat episode truncated to its 2 smallest names -> 1 pair;
    # the normal episode is untouched
    assert len(cdf) == 2
    assert set(zip(cdf["ent_a"], cdf["ent_b"])) == {
        ("e0", "e1"),
        ("e0", "e9"),
    }
    # n_a/n_b (and the episode count inside lift) stay UNCAPPED —
    # only the pair expansion is bounded: lift = 1*2*1000 // (2*1)
    e0 = cdf[cdf["ent_b"] == "e9"].iloc[0]
    assert e0["n_a"] == 2 and e0["n_b"] == 1 and e0["lift_milli"] == 1000


def test_cap_helpers_log_drop_counts(caplog):
    """The 'no silent caps' rule: every truncation logs what it
    dropped (kernel-level helpers, testable without worker logs)."""
    from graphiti_ray.ops.wedgecap import (
        cap_frame, cap_per_key, cap_sorted_array,
    )

    df = pd.DataFrame({"a": list("edcba"), "b": range(5)})
    with caplog.at_level(logging.WARNING, logger="graphiti_ray.wedgecap"):
        out = cap_frame(df, 2, ["a"], "unit", hub="H")
    assert list(out["a"]) == ["a", "b"]
    assert "3 rows dropped" in caplog.text and "'H'" in caplog.text

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="graphiti_ray.wedgecap"):
        arr = cap_sorted_array(np.arange(10), 4, "unit", hub="H2")
    assert list(arr) == [0, 1, 2, 3]
    assert "6 neighbors dropped" in caplog.text

    caplog.clear()
    big = pd.DataFrame(
        {"k": ["x"] * 5 + ["y"] * 2, "v": list("edcba") + list("ba")}
    )
    with caplog.at_level(logging.WARNING, logger="graphiti_ray.wedgecap"):
        out = cap_per_key(big, "k", 3, ["v"], "unit")
    assert len(out) == 5  # x capped 5->3, y untouched
    assert list(out[out["k"] == "x"]["v"]) == ["a", "b", "c"]
    assert "1 keys over the 3 cap" in caplog.text
    assert "2 rows dropped" in caplog.text

    # no-op paths log nothing and return the input unchanged
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="graphiti_ray.wedgecap"):
        assert cap_frame(df, None, ["a"], "unit") is df
        assert cap_per_key(big, "k", 10, ["v"], "unit") is big
    assert caplog.text == ""
