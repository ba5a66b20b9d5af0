"""Corpus-wide paragraph dedup vs its DuckDB mirror (driver's exact
compare) plus first-occurrence / conservation invariants."""

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


def test_paragraph_dedup_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["paragraph_dedup"](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL["paragraph_dedup"]).df()

    cols = sorted(odf.columns)
    assert sorted(rdf.columns) == cols
    a = rdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)


def test_paragraph_dedup_invariants(ray_session):
    """First-occurrence semantics recomputed single-process: each
    distinct chunk survives exactly once corpus-wide, at its minimal
    (doc_id, idx); per-doc kept+dropped == chunk count."""
    from graphiti_ray import queries as q
    from graphiti_ray.ops.paragraphs import PARA_W

    out = (
        q.QUERIES["paragraph_dedup"](SF_DIR)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).sort_values("doc_id")

    seen: set[str] = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        words = text.split(" ")
        chunks = [
            " ".join(words[i : i + PARA_W])
            for i in range(0, len(words), PARA_W)
        ]
        kept = []
        for c in chunks:
            if c not in seen:
                kept.append(c)
                seen.add(c)
        row = out.loc[doc_id]
        assert row["clean_text"] == " ".join(kept)
        assert row["n_kept"] == len(kept)
        assert row["n_kept"] + row["n_dropped"] == len(chunks)

    # conservation: total kept == number of distinct chunks
    assert out["n_kept"].sum() == len(seen)
