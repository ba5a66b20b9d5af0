"""Curriculum ordering vs its DuckDB mirror (driver's exact compare)
plus order-contract invariants."""

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


def test_curriculum_order_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["curriculum_order"](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL["curriculum_order"]).df()

    assert_oracle_match(rdf, odf)


def test_curriculum_order_contract(ray_session):
    """rank is a dense permutation 0..n-1; octaves are non-decreasing
    along the rank (easy->hard curriculum); within at least one octave
    the rank order differs from doc_id order (the shuffle is real)."""
    from graphiti_ray import queries as q

    df = (
        q.QUERIES["curriculum_order"](SF_DIR)
        .to_pandas()
        .sort_values("curriculum_rank")
        .reset_index(drop=True)
    )
    n = len(df)
    assert df["doc_id"].is_unique
    assert (df["curriculum_rank"].to_numpy() == np.arange(n)).all()
    assert (np.diff(df["bucket"].to_numpy()) >= 0).all()
    shuffled = any(
        not g["doc_id"].is_monotonic_increasing
        for _, g in df.groupby("bucket")
        if len(g) > 2
    )
    assert shuffled
