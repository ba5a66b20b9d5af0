"""BPE tokenizer training vs its unrolled DuckDB oracle (the driver's
exact compare) plus merge-semantics invariants."""

import duckdb
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


@pytest.mark.parametrize("name", ["bpe_merges", "bpe_vocab", "bpe_tokenize"])
def test_bpe_matches_duckdb_oracle(ray_session, duck, name):
    from graphiti_ray import queries as q

    res = q.QUERIES[name](SF_DIR)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    odf = duck.execute(q.ORACLE_SQL[name]).df()
    assert sorted(rdf.columns) == sorted(odf.columns)
    a, b = _canon(rdf), _canon(odf)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)


def test_tfidf_keywords_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["tfidf_keywords"](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL["tfidf_keywords"]).df()
    assert sorted(rdf.columns) == sorted(odf.columns)
    a, b = _canon(rdf), _canon(odf)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)


def test_tfidf_keywords_contract(ray_session):
    """Exactly TOPK rows per doc with dense ranks 1..K, scores
    non-increasing along rank, and the ubiquitous function words
    ('a'/'the': df == N -> idf bucket 0) never surface as keywords."""
    import numpy as np

    from graphiti_ray import queries as q
    from graphiti_ray.ops.keywords import TOPK

    df = q.QUERIES["tfidf_keywords"](SF_DIR).to_pandas()
    per = df.groupby("doc_id")["rank"]
    assert (per.count() == TOPK).all()
    assert (per.max() == TOPK).all() and (per.min() == 1).all()
    s = df.sort_values(["doc_id", "rank"])
    diffs = s.groupby("doc_id")["score"].diff().dropna()
    assert (diffs.to_numpy() <= 0).all()
    assert not s["term"].isin(["a", "the"]).any() or (
        s.loc[s["term"].isin(["a", "the"]), "score"] == 0
    ).all()


def test_bpe_merge_contract(ray_session):
    """Counts are non-increasing across iterations (greedy argmax),
    each merged symbol is the concat of its parts, and at least one
    later merge consumes an earlier merge's output (real subword
    growth, not just char-pair picking)."""
    from graphiti_ray import queries as q
    from graphiti_ray.ops.bpe import BPE_ITERS

    m = q.QUERIES["bpe_merges"](SF_DIR).sort_values("it")
    assert len(m) == BPE_ITERS
    assert (m["pair_count"].to_numpy()[:-1] >= m["pair_count"].to_numpy()[1:]).all()
    assert (m["lhs"] + m["rhs"] == m["merged"]).all()
    earlier = set()
    compound = False
    for _, r in m.iterrows():
        if r["lhs"] in earlier or r["rhs"] in earlier:
            compound = True
        earlier.add(r["merged"])
    assert compound


def test_bpe_greedy_replace_semantics():
    """The double-space encoding makes plain replace equal exact
    greedy left-to-right BPE on repeated-symbol runs (the case
    single-space encodings get wrong: 'a a a a' -> 'aa a a')."""
    import pandas as pd
    import pyarrow as pa

    from graphiti_ray.ops.bpe import _apply_merge

    t = pa.table({"seq": ["a  a  a  a", "a  a  a", "b  a  a"], "n": [1, 1, 1]})
    out = _apply_merge("a", "a")(t).column("seq").to_pylist()
    assert out == ["aa  aa", "aa  a", "b  aa"]
