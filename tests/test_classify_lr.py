"""Trainable logistic-regression classifier vs its unrolled-GD DuckDB
mirror, with the driver's exact compare, plus learning-curve and
determinism sanity."""

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


def test_classifier_lr_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["classifier_lr"](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL["classifier_lr"]).df()

    assert_oracle_match(rdf, odf)


def test_classifier_lr_learning_curve(ray_session):
    """Each GD step must not increase the full-batch log-loss on this
    corpus (w=0 gives exactly ln 2), i.e. the distributed gradient is a
    real gradient."""
    import math

    from graphiti_ray.ops.classify_lr import LR_ITERS, logloss

    losses = [logloss(SF_DIR, i) for i in range(LR_ITERS + 1)]
    assert abs(losses[0] - math.log(2)) < 1e-12
    for a, b in zip(losses, losses[1:]):
        assert b <= a + 1e-12
    assert losses[-1] < losses[0]


def test_classifier_lr_output_contract(ray_session):
    """pred == (prob >= 0.5), label is the lang=='en' indicator, one
    row per document, probs inside (0, 1)."""
    import pyarrow.parquet as pq

    from graphiti_ray import queries as q

    df = q.QUERIES["classifier_lr"](SF_DIR).to_pandas()
    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    assert len(df) == len(t) and df["doc_id"].is_unique
    m = df.merge(t, on="doc_id")
    assert (m["label"] == (m["lang"] == "en").astype("int64")).all()
    assert (df["pred"] == (df["prob"] >= 0.5)).all()
    assert ((df["prob"] > 0) & (df["prob"] < 1)).all()


def test_perplexity_buckets_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["perplexity_buckets"](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL["perplexity_buckets"]).df()

    assert_oracle_match(rdf, odf)


def test_perplexity_buckets_contract(ray_session):
    """Per language: head holds at least ceil(n/3) docs (the boundary
    tie group lands entirely in head), buckets are a value partition
    (every head ppl >= every middle ppl >= every tail ppl), one row
    per doc."""
    from graphiti_ray import queries as q

    df = q.QUERIES["perplexity_buckets"](SF_DIR).to_pandas()
    assert df["doc_id"].is_unique
    assert set(df["bucket"]) <= {"head", "middle", "tail"}
    for lang, g in df.groupby("lang"):
        n = len(g)
        assert (g["bucket"] == "head").sum() >= -(-n // 3)
        lo = {"head": 0, "middle": 1, "tail": 2}
        ranked = g.assign(r=g["bucket"].map(lo))
        for ra, rb in ((0, 1), (1, 2), (0, 2)):
            a = ranked.loc[ranked["r"] == ra, "ppl_milli"]
            b = ranked.loc[ranked["r"] == rb, "ppl_milli"]
            if len(a) and len(b):
                assert a.max() < b.min()


def test_dsir_select_matches_duckdb_oracle(ray_session, duck):
    from graphiti_ray import queries as q

    rdf = q.QUERIES["dsir_select"](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL["dsir_select"]).df()

    assert_oracle_match(rdf, odf)


def test_dsir_select_contract(ray_session):
    """Selection is a value threshold (every selected score >= every
    unselected score), covers at least ceil(n/SELECT_FRAC) docs (the
    boundary tie group is kept whole), one row per doc, and selected
    docs skew toward the target language (the whole point of DSIR)."""
    import pyarrow.parquet as pq

    from graphiti_ray import queries as q
    from graphiti_ray.ops.dsir import SELECT_FRAC, TARGET_LANG

    df = q.QUERIES["dsir_select"](SF_DIR).to_pandas()
    assert df["doc_id"].is_unique
    n = len(df)
    k = -(-n // SELECT_FRAC)
    sel = df[df["selected"]]
    uns = df[~df["selected"]]
    assert len(sel) >= k
    if len(uns):
        assert sel["dsir_milli"].min() > uns["dsir_milli"].max()
    langs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    m = df.merge(langs, on="doc_id")
    tgt_rate_sel = (m.loc[m["selected"], "lang"] == TARGET_LANG).mean()
    tgt_rate_all = (m["lang"] == TARGET_LANG).mean()
    assert tgt_rate_sel > tgt_rate_all
