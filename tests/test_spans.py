"""Repeated-span detection vs its DuckDB mirror (driver-exact
compare) plus hand-checkable invariants on a tiny synthetic corpus."""

import duckdb
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


def test_repeated_spans_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["repeated_spans"](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL["repeated_spans"]).df()

    assert_oracle_match(rdf, odf)
    # the synthetic corpus plants exact-dup docs -> repeated spans exist
    assert (rdf["n_repeated_positions"] > 0).any()
    assert (rdf["n_repeated_positions"] <= rdf["n_windows"]).all()


def test_repeated_spans_planted_dup(ray_session):
    """Two identical long docs planted into a tiny in-memory corpus:
    every window of both is repeated; the unique doc has none; a doc
    shorter than the window has n_windows == 0."""
    import ray.data as rd

    from graphiti_ray.ops import spans as S

    long_a = " ".join(f"tok{i}" for i in range(20))
    uniq = " ".join(f"other{i}" for i in range(15))
    rows = [
        {"doc_id": 1, "text": long_a},
        {"doc_id": 2, "text": long_a},
        {"doc_id": 3, "text": uniq},
        {"doc_id": 4, "text": "too short"},
    ]

    # route the op's reader at an in-memory corpus via monkeypatching
    # the io seam (the op itself only needs (doc_id, text))
    import graphiti_ray.ops.io as io_mod

    orig = io_mod.read_documents
    try:
        io_mod.read_documents = lambda sf, cols=None: rd.from_items(rows)
        df = S.repeated_spans("ignored").to_pandas().set_index("doc_id")
    finally:
        io_mod.read_documents = orig

    assert df.loc[1, "n_windows"] == 13 and df.loc[2, "n_windows"] == 13
    assert df.loc[1, "n_repeated_positions"] == 13
    assert df.loc[2, "n_repeated_positions"] == 13
    assert df.loc[1, "n_repeated_grams"] == 13
    assert df.loc[3, "n_repeated_positions"] == 0
    assert df.loc[4, "n_windows"] == 0
    assert (df["n_repeated_grams"] <= df["n_repeated_positions"]).all()
