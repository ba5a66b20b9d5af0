"""Key-skew diagnostics vs their DuckDB mirrors (the driver's exact
compare) plus profile invariants."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    yield con
    con.close()


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True).astype(str)


@pytest.mark.parametrize("name", ["events_key_skew", "events_hot_keys"])
def test_skew_matches_duckdb_oracle(ray_session, duck, name):
    from graphiti_ray import queries as q

    res = q.QUERIES[name](SF_DIR)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    odf = duck.execute(q.ORACLE_SQL[name]).df()
    assert sorted(rdf.columns) == sorted(odf.columns)
    a, b = _canon(rdf), _canon(odf)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)


def test_skew_profile_conserves_rows(ray_session):
    """Histogram n_rows sums to the event count; every hot key's count
    falls inside its histogram bucket's range."""
    import pyarrow.parquet as pq

    from graphiti_ray import queries as q

    hist = q.QUERIES["events_key_skew"](SF_DIR).to_pandas()
    total = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    assert int(hist["n_rows"].sum()) == total
    hot = q.QUERIES["events_hot_keys"](SF_DIR)
    assert (hot["n_rows"] >= 1).all()
    top_bucket = hist["freq_bucket"].max()
    assert (hot["n_rows"] < 2 ** (top_bucket + 1)).all()
