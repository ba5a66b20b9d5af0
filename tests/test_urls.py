"""URL canonicalization + URL dedup vs their DuckDB mirrors (the
driver's exact compare) plus rule-level unit checks."""

import duckdb
import pandas as pd
import pytest

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


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True).astype(str)


@pytest.mark.parametrize(
    "name",
    ["url_canonical", "url_dedup", "host_filter", "link_graph",
     "host_pagerank", "anchor_terms", "frontier_priority"],
)
def test_urls_match_duckdb_oracle(ray_session, duck, name):
    from graphiti_ray import queries as q

    rdf = q.QUERIES[name](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL[name]).df()
    assert sorted(rdf.columns) == sorted(odf.columns)
    a, b = _canon(rdf), _canon(odf)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)


def test_canonicalize_rules():
    from graphiti_ray.ops.urls import canonicalize

    cases = {
        "https://a.example/p#frag": "https://a.example/p",
        "HTTP://WWW.A.EXAMPLE:80/p/": "https://a.example/p",
        "https://m.a.example:443/p": "https://a.example/p",
        "https://a.example/p?utm_source=x&b=2&a=1": "https://a.example/p?a=1&b=2",
        "https://a.example/p?utm_source=x": "https://a.example/p",
        "https://a.example/": "https://a.example",
        # non-default port and non-utm params survive
        "https://a.example:8443/p?z=1": "https://a.example:8443/p?z=1",
    }
    got = canonicalize(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


def test_crawl_prep_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["crawl_prep"](SF_DIR)
    odf = duck.execute(q.ORACLE_SQL["crawl_prep"]).df()
    assert sorted(rdf.columns) == sorted(odf.columns)
    a, b = _canon(rdf), _canon(odf)
    assert len(a) == len(b) == 5
    assert a.equals(b)


def test_crawl_prep_funnel_monotone(ray_session):
    """Stage counts are strictly a funnel: each stage keeps at most as
    many docs as the previous, and every stage drops something at this
    tier (a stage that filters nothing proves nothing)."""
    from graphiti_ray import queries as q

    df = q.QUERIES["crawl_prep"](SF_DIR).sort_values("stage")
    n = df["n_docs"].to_numpy()
    assert len(n) == 5
    assert (n[1:] <= n[:-1]).all()
    assert (n[1:] < n[:-1]).sum() >= 3
    assert n[-1] > 0


def test_snapshot_delta_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["snapshot_delta"](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL["snapshot_delta"]).df()
    assert sorted(rdf.columns) == sorted(odf.columns)
    a, b = _canon(rdf), _canon(odf)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)


def test_snapshot_delta_is_content_keyed(ray_session):
    """The delta is exactly the even-id docs with ids divisible by 6
    (their content was never in the old snapshot), reported under
    fresh fetch ids — an id-based anti-join would return every even
    id instead."""
    from graphiti_ray import queries as q
    from graphiti_ray.ops.snapshot import _NEW_ID_BASE

    df = q.QUERIES["snapshot_delta"](SF_DIR).to_pandas()
    orig = df["doc_id"].to_numpy() - _NEW_ID_BASE
    assert (orig % 6 == 0).all()
    assert len(df) > 0


def test_host_filter_contract(ray_session):
    """host_stop_milli is constant within a host; kept == milli >=
    corpus milli; both kept and dropped hosts exist."""
    from graphiti_ray import queries as q

    df = q.QUERIES["host_filter"](SF_DIR).to_pandas()
    per_host = df.groupby("host")["host_stop_milli"].nunique()
    assert (per_host == 1).all()
    kept_hosts = df.groupby("host")["host_kept"].nunique()
    assert (kept_hosts == 1).all()
    assert df["host_kept"].any() and (~df["host_kept"]).any()


def test_link_graph_canonicalizes_targets(ray_session):
    """Every dst_host is a canonical host (no www./m., no port), the
    relative /nav link never becomes an edge, and variant hrefs of the
    same target aggregate (some edge has n_links > 1 at this tier)."""
    from graphiti_ray import queries as q

    df = q.QUERIES["link_graph"](SF_DIR).to_pandas()
    assert len(df) > 0
    assert not df["dst_host"].str.startswith(("www.", "m.")).any()
    assert not df["dst_host"].str.contains(":").any()
    assert not (df["dst_host"] == "").any()
    assert (df["n_links"] > 1).any()


def test_url_dedup_groups_variants(ray_session):
    """All mess-class variants of a logical page without surviving
    params collapse to one canonical row whose keeper is the smallest
    doc_id in the group."""
    from graphiti_ray import queries as q

    can = q.QUERIES["url_canonical"](SF_DIR).to_pandas()
    ded = q.QUERIES["url_dedup"](SF_DIR).to_pandas()
    expect = (
        can.groupby("canonical_url")["doc_id"]
        .agg(["min", "size"])
        .reset_index()
        .rename(columns={"min": "canonical_doc_id", "size": "n_dups"})
    )
    a = _canon(ded)
    b = _canon(
        expect.astype({"canonical_doc_id": "int64", "n_dups": "int64"})
    )
    assert a.equals(b)
    # the synthesis really produces collisions
    assert (ded["n_dups"] > 1).any()
