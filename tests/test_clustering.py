"""Embedding clustering + SemDeDup vs their DuckDB mirrors, with the
driver's exact compare (sorted columns, sorted rows, no coercion
beyond the oracle->engine dtype cast the driver applies)."""

import duckdb
import numpy as np
import pytest

from oracle_compare import assert_oracle_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "kmeans_clusters",
        "semantic_dedup",
        "pq_codes",
        "knn_pq_adc",
        # ANN lanes promoted to exact oracles in r5 (deterministic
        # Lloyd quantizer / md5-sign LSH planes)
        "knn_ivf",
        "knn_ivf_indexed",
        "knn_lsh",
        "knn_ivfpq",
    ],
)
def test_clustering_matches_duckdb_oracle(ray_session, duck, name):
    from graphiti_ray import queries as q

    rdf = q.QUERIES[name](SF_DIR).to_pandas()
    odf = duck.execute(q.ORACLE_SQL[name]).df()

    assert_oracle_match(rdf, odf)


def test_semantic_dedup_drops_planted_dups(ray_session):
    """Every planted identical-vector copy (cosine exactly 1.0 to its
    smaller-id source) must be dropped with dup_of == its source, and
    at this corpus scale (max natural pair cosine ~0.6 < SEM_TAU)
    nothing else is dropped."""
    from graphiti_ray.ops.clustering import semantic_dedup
    from graphiti_ray.ops.corpus import VEC_MOD, VEC_OFF

    df = semantic_dedup(SF_DIR).to_pandas()
    planted = df[df["vec_id"] >= VEC_OFF]
    assert len(planted) > 0
    assert not planted["kept"].any()
    assert (planted["dup_of"] == planted["vec_id"] - VEC_OFF).all()
    originals = df[df["vec_id"] < VEC_OFF]
    assert originals["kept"].all()
    assert (df["kept"] == (df["dup_of"] < 0)).all()
    assert len(planted) == (originals["vec_id"] % VEC_MOD == 0).sum()


def test_kmeans_improves_objective_and_coassigns_dups(ray_session):
    """Lloyd sanity on this corpus (the label column carries NO
    geometric signal — embeddings are i.i.d. across labels — so purity
    is untestable by construction; what IS testable): (a) the spherical
    k-means objective (mean best-centroid cosine) improves over the
    seed centroids, (b) identical planted vectors land in the SAME
    cluster (cosine 1.0 ties argmax deterministically)."""
    import pyarrow.parquet as pq

    from graphiti_ray.ops.clustering import (
        _fit_kmeans,
        _init_centroids,
        _normalize_rows,
        semantic_dedup,
    )
    from graphiti_ray.ops.corpus import VEC_OFF
    from graphiti_ray.ops.dedup import list_col_to_matrix
    from graphiti_ray.ops.io import read_embeddings

    X = list_col_to_matrix(
        pq.read_table(
            f"{SF_DIR}/embeddings.parquet", columns=["embedding"]
        ).column("embedding")
    )
    ds = read_embeddings(SF_DIR, ["vec_id", "embedding"])
    _, c0 = _init_centroids(SF_DIR)
    _, c1 = _fit_kmeans(ds, SF_DIR)

    def obj(c):
        return (_normalize_rows(X) @ _normalize_rows(c).T).max(axis=1).mean()

    assert obj(c1) > obj(c0)

    df = semantic_dedup(SF_DIR).to_pandas().set_index("vec_id")
    dup_ids = df.index[df.index >= VEC_OFF]
    assert len(dup_ids) > 0
    for d in dup_ids:
        assert df.loc[d, "cluster_id"] == df.loc[d - VEC_OFF, "cluster_id"]


def test_kmeans_centroid_update_rounds_to_grid(ray_session):
    """The cross-engine determinism contract: every centroid coordinate
    after an update sits exactly on the CENT_ROUND decimal grid."""
    from graphiti_ray.ops.clustering import (
        CENT_ROUND,
        _fit_kmeans,
    )
    from graphiti_ray.ops.io import read_embeddings

    ds = read_embeddings(SF_DIR, ["vec_id", "embedding"])
    _, cents = _fit_kmeans(ds, SF_DIR)
    grid = np.round(cents, CENT_ROUND)
    assert np.array_equal(cents, grid)


def test_pq_codes_shape_and_determinism(ray_session):
    """Every vector gets exactly M codes; every codebook entry is
    used (no dead codewords at this corpus); two independent
    train+encode runs produce the identical code table (the fixed
    init/iteration/rounding contract, not RNG)."""
    from graphiti_ray import queries as q
    from graphiti_ray.ops.pq import PQ_K, PQ_M

    df = q.QUERIES["pq_codes"](SF_DIR).to_pandas()
    per_vec = df.groupby("vec_id").size()
    assert (per_vec == PQ_M).all()
    assert (df.groupby("m")["code"].nunique() == PQ_K).all()
    again = q.QUERIES["pq_codes"](SF_DIR).to_pandas()
    key = ["vec_id", "m", "code"]
    assert df[key].sort_values(key).reset_index(drop=True).equals(
        again[key].sort_values(key).reset_index(drop=True)
    )


def test_pq_adc_recall_beats_random(ray_session):
    """ADC over 32-bit codes is lossy by design; recall@10 vs the
    exact brute-force top-10 must still be far above the random
    baseline (10/N ≈ 0.02 here) — the compression/recall tradeoff
    stated in ops/pq.py."""
    from graphiti_ray import queries as q

    bf = q.QUERIES["knn_bruteforce"](SF_DIR).to_pandas()
    for lane in ("knn_pq_adc", "knn_ivfpq"):
        adc = q.QUERIES[lane](SF_DIR).to_pandas()
        hits = 0
        for qid in bf["query_id"].unique():
            t = set(bf.loc[bf["query_id"] == qid, "neighbor_id"])
            p = set(adc.loc[adc["query_id"] == qid, "neighbor_id"])
            hits += len(t & p)
        recall = hits / len(bf)
        assert recall > 0.10, lane
