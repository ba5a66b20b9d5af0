"""Regression tests for the round-4 advisor findings: (a) int64
overflow in the vectorized anomaly fast path, (b) the bpe_tokenize
empty-document row-set mismatch, (c) personalized-PageRank seedless
groups. Each reproduces the advisor's failure scenario at the scale
where it bit and pins the fixed behavior with the strict compare."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oracle_compare import assert_oracle_match


@pytest.fixture()
def tmp_sf(tmp_path):
    """A scratch sf_dir the ops read from (they only need the one
    table each test writes)."""
    return str(tmp_path)


def test_anomaly_vectorized_guard_covers_rhs(ray_session, tmp_sf):
    """Advisor repro: one user, 500k events at value ±3 (xm=±3000).
    n*max|xm| = 1.5e9 passed the old 3e9 guard while the RHS
    9*(n*X2 - S^2) ≈ 2e19 wrapped past 2^63 and flagged every event.
    With the 1e9 guard this corpus takes the exact big-int path; the
    result must agree with the forced-exact path AND the HUGEINT SQL
    oracle (0 outliers: a symmetric two-point distribution has no
    3-sigma events)."""
    from graphiti_ray.ops.anomaly import EVENTS_ANOMALY_SQL, events_anomaly

    n = 500_000
    rng = np.random.default_rng(7)
    vals = np.where(rng.random(n) < 0.5, 3.0, -3.0)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_sf, "events.parquet"))

    fast = events_anomaly(tmp_sf).to_pandas()
    exact = events_anomaly(tmp_sf, int64_safe=0).to_pandas()
    assert_oracle_match(fast, exact)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_sf}/events.parquet')"
    )
    odf = con.execute(EVENTS_ANOMALY_SQL).df()
    con.close()
    assert_oracle_match(fast, odf)
    assert int(fast["n_outliers"].sum()) == 0


def test_anomaly_vectorized_path_still_used_and_exact(ray_session, tmp_sf):
    """Just under the new 1e9 bound the vectorized int64 path runs and
    agrees with the forced-exact path on a corpus WITH real outliers."""
    from graphiti_ray.ops.anomaly import EVENTS_ANOMALY_SQL, events_anomaly

    rng = np.random.default_rng(11)
    n = 5_000
    vals = rng.normal(0, 1, n)
    vals[::500] = 40.0  # planted outliers
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(
                (np.arange(n) % 7).astype(np.int64)
            ),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_sf, "events.parquet"))

    fast = events_anomaly(tmp_sf).to_pandas()
    exact = events_anomaly(tmp_sf, int64_safe=0).to_pandas()
    assert_oracle_match(fast, exact)
    assert int(fast["n_outliers"].sum()) > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_sf}/events.parquet')"
    )
    odf = con.execute(EVENTS_ANOMALY_SQL).df()
    con.close()
    assert_oracle_match(fast, odf)


def test_bpe_tokenize_drops_empty_docs(ray_session, tmp_sf):
    """A whitespace-only document must be absent from bpe_tokenize's
    output exactly as it is absent from the SQL mirror's inner-join
    row set (the advisor's latent row-set mismatch)."""
    from graphiti_ray.ops.bpe import BPE_TOKENIZE_SQL, bpe_tokenize

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["the cat sat", "   ", "dogs chase the cat", ""],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 4),
        }
    )
    pq.write_table(docs, os.path.join(tmp_sf, "documents.parquet"))

    rdf = bpe_tokenize(tmp_sf).to_pandas()
    assert set(rdf["doc_id"]) == {1, 3}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_sf}/documents.parquet')"
    )
    odf = con.execute(BPE_TOKENIZE_SQL).df()
    con.close()
    assert_oracle_match(rdf, odf)


def test_ppr_drops_seedless_groups(ray_session):
    """A group whose canonical edges are all self-loops has no
    symmetrized edge, hence no hub seed — the SQL mirror's INNER JOIN
    on ppr_seed drops it, so the engine must too, while seeded groups
    keep their full node sets."""
    import ray.data as rd

    from graphiti_ray.ops.graph import personalized_pagerank

    nodes = rd.from_items(
        [
            {"group_id": "g1", "name": n}
            for n in ["a", "b", "c"]
        ]
        + [{"group_id": "g2", "name": "x"}]
    )
    edges = rd.from_items(
        [
            {"group_id": "g1", "subj": "a", "obj": "b"},
            {"group_id": "g1", "subj": "b", "obj": "c"},
            # g2's only edge is a self-loop: symmetrization drops it
            {"group_id": "g2", "subj": "x", "obj": "x"},
        ]
    )
    df = personalized_pagerank(nodes, edges).to_pandas()
    assert set(df["group_id"]) == {"g1"}
    assert set(df["name"]) == {"a", "b", "c"}
    # the seed (hub) holds the teleport mass
    assert df.loc[df["ppr_e9"].idxmax(), "name"] == "b"
