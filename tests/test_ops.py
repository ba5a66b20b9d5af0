"""Tests for the training-data operator family (ops/): dedup tiers,
similarity search, text stats, windows, multimodal plumbing.

Strategy: brute-force single-process oracles over sf0.001 compared to
the distributed implementations (SURVEY.md §5 plan (b))."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from oracle_compare import assert_oracle_match

SF = "/root/testdata/sf0.001"


def _docs_with_dups_local():
    from graphiti_ray.ops import corpus

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    rows = list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist(), t.column("lang").to_pylist())
    )
    out = list(rows)
    for i, txt, lg in rows:
        if i % corpus.EXACT_MOD == 0:
            out.append((i + corpus.EXACT_OFF, txt, lg))
        if i % corpus.NEAR_MOD == 0:
            out.append((i + corpus.NEAR_OFF, corpus.truncate_words(txt), lg))
    return out


def _brute_jaccard_pairs(rows, same_lang_only: bool):
    from graphiti_ray.ops.dedup import JACCARD_DEN, JACCARD_NUM, word_3gram_shingles

    sets = {i: set(word_3gram_shingles(t)) for i, t, _ in rows}
    langs = {i: lg for i, _, lg in rows}
    ids = sorted(sets)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if same_lang_only and langs[a] != langs[b]:
                continue
            inter = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            if JACCARD_DEN * inter >= JACCARD_NUM * un:
                out.add((a, b, inter, un))
    return out


def test_exact_dedup_finds_planted(ray_session):
    from graphiti_ray.ops.corpus import EXACT_MOD, NEAR_MOD
    from graphiti_ray.ops.dedup import exact_dedup

    df = exact_dedup(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    # exact copies collapse into their original; truncated near-copies
    # have distinct text and survive the exact tier
    n_near = len([i for i in range(n_docs) if i % NEAR_MOD == 0])
    assert len(df) == n_docs + n_near
    n_planted = len([i for i in range(n_docs) if i % EXACT_MOD == 0])
    assert (df["n_dups"] == 2).sum() == n_planted
    # within a collapsed group the canonical is the smallest doc_id
    # (the original, not its +10M copy)
    assert (df.loc[df["n_dups"] == 2, "canonical_doc_id"] < 10_000_000).all()


def test_jaccard_pairs_match_bruteforce(ray_session):
    from graphiti_ray.ops.dedup import jaccard_pairs

    got = {
        tuple(r)
        for r in jaccard_pairs(SF).to_pandas()[["a_id", "b_id", "inter", "un"]].itertuples(index=False)
    }
    want = _brute_jaccard_pairs(_docs_with_dups_local(), same_lang_only=True)
    assert got == want


def test_jaccard_postings_spread_across_buckets(ray_session):
    """Scale shape of the distributed exact-Jaccard (VERDICT r2 item 4):
    no reducer task receives a whole language — a language's postings
    spread across (nearly) all shingle buckets, so per-task memory is
    bounded by bucket size, not corpus size."""
    from graphiti_ray.ops.dedup import (
        JACCARD_SHINGLE_BUCKETS,
        _explode_postings,
        _shingled_corpus,
    )

    sh = _shingled_corpus(SF)
    post = sh.map_batches(_explode_postings, batch_format="pyarrow").to_pandas()
    n_buckets = post["bucket"].nunique()
    assert n_buckets > 0.9 * JACCARD_SHINGLE_BUCKETS
    # the largest bucket holds a tiny fraction of the posting table
    assert post["bucket"].value_counts().iloc[0] < 0.05 * len(post)


def test_minhash_lsh_precision_and_recall(ray_session):
    from graphiti_ray.ops.dedup import minhash_lsh_pairs

    got = {
        tuple(r)
        for r in minhash_lsh_pairs(SF).to_pandas()[["a_id", "b_id", "inter", "un"]].itertuples(index=False)
    }
    want = _brute_jaccard_pairs(_docs_with_dups_local(), same_lang_only=False)
    # verification step makes precision exactly 1.0
    assert got <= want
    # banding probability at s>=0.6 with 32 bands x 4 rows ≈ 0.99
    assert len(got) >= 0.95 * len(want)


def test_doc_fingerprints_match_duckdb_oracle(ray_session):
    """Rabin-Karp fingerprints reproduced exactly by the HUGEINT SQL
    mirror (DOC_FINGERPRINTS_SQL), including the short-text
    whole-polynomial path."""
    import duckdb

    from graphiti_ray import queries as q

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(q.ORACLE_SQL["doc_fingerprints"]).df()
    res = q.QUERIES["doc_fingerprints"](SF).to_pandas()
    cols = ["doc_id", "fp"]
    assert_oracle_match(res[cols], ora[cols])
    con.close()


@pytest.mark.parametrize(
    "name",
    ["repetition_stats", "top_ngrams", "sample_stratified",
     "mixture_sample", "collocations", "chunk_passages"],
)
def test_corpus_ops_match_duckdb_oracle(ray_session, name):
    """Repetition signals, per-lang top-k vocabulary and deterministic
    stratified sampling each hash-match their SQL mirror (the driver's
    compare: sorted columns, sorted rows)."""
    import duckdb

    from graphiti_ray import queries as q

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(q.ORACLE_SQL[name]).df()
    res = q.QUERIES[name](SF).to_pandas()
    cols = sorted(ora.columns)
    assert sorted(res.columns) == cols
    assert_oracle_match(res, ora)
    con.close()


def test_sample_stratified_is_deterministic_and_rate_bounded(ray_session):
    """Two runs keep the identical row set, and the en stratum is
    downsampled below the tail strata (3/10 vs 7/10 keep rates)."""
    from graphiti_ray import queries as q

    a = q.QUERIES["sample_stratified"](SF).to_pandas()
    b = q.QUERIES["sample_stratified"](SF).to_pandas()
    key = ["doc_id", "lang"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    import pyarrow.parquet as _pq

    full = _pq.read_table(f"{SF}/documents.parquet", columns=["lang"]).to_pandas()
    kept = a.groupby("lang").size()
    total = full.groupby("lang").size()
    en_rate = kept.get("en", 0) / total["en"]
    tail_rate = (kept.sum() - kept.get("en", 0)) / (total.sum() - total["en"])
    assert en_rate < tail_rate


def test_mixture_sample_balances_toward_uniform(ray_session):
    """The kept set's language distribution is strictly closer to
    uniform (max-share sense) than the input's, and no language is
    wiped out — the point of solving rates from observed counts."""
    from graphiti_ray import queries as q

    df = q.QUERIES["mixture_sample"](SF).to_pandas()
    total = df.groupby("lang").size()
    kept = df[df["kept"]].groupby("lang").size()
    assert (kept > 0).all() and len(kept) == len(total)
    in_max = (total / total.sum()).max()
    out_max = (kept / kept.sum()).max()
    assert out_max < in_max
    # rates respond to skew: the majority language is the one capped
    assert df.loc[df["lang"] == total.idxmax(), "rate_bp"].iloc[0] < 10_000


def test_minhash_lsh_matches_duckdb_oracle(ray_session):
    """The driver gate: MinHash output hash-matches the exact
    all-pairs Jaccard SQL (valid because banding recall is exactly
    1.0 on this deterministic corpus — see DEDUP_MINHASH_SQL)."""
    import duckdb

    from graphiti_ray import queries as q

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(q.ORACLE_SQL["dedup_minhash_lsh"]).df()
    res = q.QUERIES["dedup_minhash_lsh"](SF).to_pandas()
    cols = sorted(ora.columns)
    assert sorted(res.columns) == cols
    assert_oracle_match(res, ora)
    con.close()


def test_simhash_matches_duckdb_oracle(ray_session):
    """The driver gate: simhash pairs hash-match the exact SQL image
    (md5-derived token hashes + all-pairs hamming <= 3 — valid because
    4x16-bit chunk blocking is pigeonhole-complete at radius 3)."""
    import duckdb

    from graphiti_ray import queries as q

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(q.ORACLE_SQL["dedup_simhash"]).df()
    res = q.QUERIES["dedup_simhash"](SF).to_pandas()
    cols = sorted(ora.columns)
    assert sorted(res.columns) == cols
    assert_oracle_match(res, ora)
    con.close()


def test_search_docs_hybrid_matches_duckdb_oracle(ray_session):
    """The driver gate for the hybrid-search stack (Q1/Q4/Q5/Q7): BM25 +
    stored-vector cosine + RRF over documents/embeddings hash-matches
    the full SQL image (see search/docsearch.py for float-safety)."""
    import duckdb

    from graphiti_ray import queries as q

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    ora = con.execute(q.ORACLE_SQL["search_docs_hybrid"]).df()
    res = q.QUERIES["search_docs_hybrid"](SF).to_pandas()
    cols = sorted(ora.columns)
    assert sorted(res.columns) == cols
    assert_oracle_match(res, ora)
    con.close()


def test_simhash_chunk_blocking_is_complete(ray_session):
    from graphiti_ray.functions.hashing import simhash64
    from graphiti_ray.ops.dedup import (
        SIMHASH_MAX_HAMMING,
        simhash_pairs,
        word_3gram_shingles,
    )

    rows = _docs_with_dups_local()
    hs = {i: simhash64(word_3gram_shingles(t)) for i, t, _ in rows}
    ids = sorted(hs)
    want = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin(hs[ids[x]] ^ hs[ids[y]]).count("1")
            if d <= SIMHASH_MAX_HAMMING:
                want.add((ids[x], ids[y], d))
    got = {
        tuple(r)
        for r in simhash_pairs(SF).to_pandas()[["a_id", "b_id", "hamming"]].itertuples(index=False)
    }
    assert got == want  # pigeonhole blocking is complete at d<=3


def test_embedding_pairs_are_planted_copies(ray_session):
    from graphiti_ray.ops.corpus import VEC_MOD, VEC_OFF
    from graphiti_ray.ops.dedup import embedding_cosine_pairs

    df = embedding_cosine_pairs(SF).to_pandas()
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    want = {(i, i + VEC_OFF) for i in range(n) if i % VEC_MOD == 0}
    got = set(zip(df["a_id"], df["b_id"]))
    assert got == want


def _brute_knn(k=10, n_queries=8):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for qi in range(n_queries):
        qrow = np.nonzero(ids == qi)[0][0]
        s = m[qrow] @ m.T
        s[qrow] = -np.inf
        order = np.lexsort((ids, -s))[:k]
        out[qi] = [int(ids[j]) for j in order]
    return out


def test_knn_bruteforce_exact(ray_session):
    from graphiti_ray.ops.simsearch import knn_bruteforce

    df = knn_bruteforce(SF).to_pandas().sort_values(["query_id", "rank"])
    want = _brute_knn()
    for qid, grp in df.groupby("query_id"):
        assert grp["neighbor_id"].tolist() == want[qid]


def test_knn_lsh_recall(ray_session):
    from graphiti_ray.ops.simsearch import knn_lsh

    df = knn_lsh(SF).to_pandas()
    want = _brute_knn()
    hits = total = 0
    for qid, true_nbrs in want.items():
        got = set(df[df["query_id"] == qid]["neighbor_id"])
        hits += len(got & set(true_nbrs))
        total += len(true_nbrs)
    # bucketed search trades recall for corpus-size-independent work;
    # with 64 buckets + hamming-1 multiprobe on 500 vectors this floor
    # holds deterministically (fixed rng seed)
    assert hits / total >= 0.2


def test_text_stats_vectorized_matches_python(ray_session):
    import re

    from graphiti_ray.ops.textstats import STOPWORD_RE, TOKEN_RE, text_stats

    df = text_stats(SF).to_pandas().set_index("doc_id")
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for i, txt in zip(t.column("doc_id").to_pylist()[:50], t.column("text").to_pylist()[:50]):
        assert df.loc[i, "n_words"] == len(txt.split(" "))
        assert df.loc[i, "n_tokens"] == len(re.findall(TOKEN_RE, txt))
        assert df.loc[i, "n_stop"] == len(re.findall(STOPWORD_RE, txt))
        assert df.loc[i, "n_bytes"] == len(txt.encode("utf-8"))


def test_fingerprints_deterministic_and_correct(ray_session):
    from graphiti_ray.functions.hashing import rolling_fingerprints
    from graphiti_ray.ops.textstats import doc_fingerprints

    df = doc_fingerprints(SF).to_pandas()
    by_doc = defaultdict(list)
    for r in df.itertuples(index=False):
        by_doc[r.doc_id].append(r.fp)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for i, txt in list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))[:50]:
        assert by_doc.get(i, []) == rolling_fingerprints(txt)


def test_event_windows_match_pandas(ray_session):
    from graphiti_ray.ops.windows import event_windows

    got = event_windows(SF).to_pandas().set_index("event_id").sort_index()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    for lag in (1, 2, 3):
        ev[f"prev{lag}"] = ev.groupby("user_id")["event_id"].shift(lag)
    ev = ev.set_index("event_id").sort_index()
    for lag in (1, 2, 3):
        a = got[f"prev{lag}"].astype("float64")
        b = ev[f"prev{lag}"].astype("float64")
        assert a.equals(b)


def test_multimodal_stub(ray_session):
    from graphiti_ray.ops.multimodal import decode_payloads, decode_real

    df = decode_payloads(SF).to_pandas()
    assert len(df) == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert (df["fake_width"] == df["n_bytes"] % 640 + 1).all()
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG")


def test_hot_block_cap_is_deterministic():
    """Skew guard: a blocking group larger than MAX_BLOCK is truncated
    to a deterministic subset, bounding per-bucket pair work on hot
    keys (SURVEY.md §4 skew row)."""
    import pandas as pd

    from graphiti_ray.stages.canonicalize import MAX_BLOCK, _pairs_in_bucket

    n = MAX_BLOCK + 100
    df = pd.DataFrame(
        {
            "block_key": ["hot"] * n,
            "uuid": [f"u{i:05d}" for i in range(n)],
            "name_norm": ["smith"] * n,  # every pair alias-matches
            "name": ["Smith"] * n,
            "group_id": ["g"] * n,
        }
    )
    out1 = _pairs_in_bucket(df)
    out2 = _pairs_in_bucket(df.sample(frac=1.0, random_state=7))
    # capped: pairs bounded by MAX_BLOCK choose 2, not n choose 2
    assert len(out1) == MAX_BLOCK * (MAX_BLOCK - 1) // 2
    # deterministic under input permutation (lexicographically-first kept)
    a = out1.sort_values(["a", "b"]).reset_index(drop=True)
    b = out2.sort_values(["a", "b"]).reset_index(drop=True)
    assert a.equals(b)


def test_knn_ivf_recall(ray_session):
    """IVF with NPROBE/NLIST = 1/4 of cells scanned: recall floor well
    above the scan fraction (clustered vectors co-locate)."""
    from graphiti_ray.ops.simsearch import knn_ivf

    df = knn_ivf(SF).to_pandas()
    want = _brute_knn()
    hits = total = 0
    for qid, true_nbrs in want.items():
        got = set(df[df["query_id"] == qid]["neighbor_id"])
        hits += len(got & set(true_nbrs))
        total += len(true_nbrs)
    assert hits / total >= 0.5


def test_corpus_prep_composition(ray_session):
    """Quality filter -> exact dedup -> per-lang accounting: verify
    against a brute-force single-process pass."""
    import re

    from graphiti_ray.ops.prep import corpus_prep
    from graphiti_ray.ops.textstats import STOPWORD_RE, TOKEN_RE

    got = corpus_prep(SF).to_pandas().set_index("lang").sort_index()
    rows = _docs_with_dups_local()
    best: dict[str, tuple[int, str, int]] = {}
    for i, txt, lg in rows:
        nw = len(txt.split(" "))
        ns = len(re.findall(STOPWORD_RE, txt))
        nb = len(txt.encode("utf-8"))
        if not (nw >= 10 and nb <= 100000 and 20 * ns >= nw):
            continue
        nt = len(re.findall(TOKEN_RE, txt))
        cur = best.get(txt)
        if cur is None or i < cur[0]:
            best[txt] = (i, lg, nt)
    want: dict[str, list[int]] = {}
    for _, lg, nt in best.values():
        want.setdefault(lg, []).append(nt)
    assert set(got.index) == set(want)
    for lg, toks in want.items():
        assert got.loc[lg, "n_docs"] == len(toks)
        assert got.loc[lg, "total_tokens"] == sum(toks)


def test_pii_scrub_matches_duckdb_oracle(ray_session):
    """Redaction counts and scrubbed text match the RE2-shared SQL
    mirror; planted contact blocks are fully redacted."""
    import duckdb

    from graphiti_ray import queries as q
    from graphiti_ray.ops.pii import PII_MOD

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(q.ORACLE_SQL["pii_scrub"]).df()
    res = q.QUERIES["pii_scrub"](SF).to_pandas()
    cols = ["doc_id", "n_emails", "n_phones", "n_ips", "scrubbed"]
    assert_oracle_match(res[cols], ora[cols])
    a = res[cols].sort_values("doc_id").reset_index(drop=True)
    planted = a[a["doc_id"] % PII_MOD == 0]
    assert (planted["n_emails"] >= 1).all()
    assert (planted["n_phones"] >= 1).all()
    assert (planted["n_ips"] >= 1).all()
    assert planted["scrubbed"].str.contains("<EMAIL>").all()
    assert not planted["scrubbed"].str.contains("@site", regex=False).any()
    clean = a[a["doc_id"] % PII_MOD != 0]
    assert (clean[["n_emails", "n_phones", "n_ips"]].sum(axis=1) == 0).all()
    con.close()


def _oracle_compare(name: str, sf: str = "/root/testdata/sf0.01"):
    import duckdb

    from graphiti_ray import queries as q

    con = duckdb.connect()
    for table in ("documents", "events", "orders", "customer", "nation",
                  "lineitem"):
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{sf}/{table}.parquet')"
        )
    res = q.QUERIES[name](sf)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    odf = con.execute(q.ORACLE_SQL[name]).df()
    con.close()
    assert_oracle_match(rdf, odf)
    cols = sorted(rdf.columns)
    return rdf[cols].sort_values(cols).reset_index(drop=True)


def test_quality_filter_rules_each_discriminate(ray_session):
    """Hash-matches the SQL mirror AND every heuristic rejects a real
    slice of the corpus (a filter that passes everything proves
    nothing)."""
    from graphiti_ray.ops.filtering import (
        MAX_MEAN_WLEN, MAX_WORDS, MIN_MEAN_WLEN, MIN_STOP_RATIO, MIN_WORDS,
    )

    a = _oracle_compare("quality_filter")
    assert (a["n_words"] < MIN_WORDS).any()
    assert (a["n_words"] > MAX_WORDS).any()
    assert (a["n_stopwords"] / a["n_words"] < MIN_STOP_RATIO).any()
    assert (
        (a["mean_word_len"] < MIN_MEAN_WLEN)
        | (a["mean_word_len"] > MAX_MEAN_WLEN)
    ).any()
    kept = a["keep"].mean()
    assert 0.2 < kept < 0.95  # discriminative, not degenerate


def test_decontaminate_flags_planted_overlap(ray_session):
    """Planted docs (doc_id%13==5 with an existing donor) and benchmark
    source docs are contaminated; the rest of the word-salad corpus is
    clean."""
    from graphiti_ray.ops.filtering import (
        BENCH_MOD, PLANT_MOD, PLANT_PICK, PLANT_RES,
    )

    a = _oracle_compare("decontaminate").set_index("doc_id")
    n_docs = len(a)
    donors = {BENCH_MOD * k for k in range(PLANT_PICK) if BENCH_MOD * k < n_docs}
    for i in a.index:
        if i % BENCH_MOD == 0:  # bench doc contains its own 8-gram
            assert a.loc[i, "contaminated"]
        elif i % PLANT_MOD == PLANT_RES and BENCH_MOD * (i % PLANT_PICK) in donors:
            assert a.loc[i, "contaminated"], i
    # contamination is the exception, not the rule
    assert 0 < a["contaminated"].sum() < 0.25 * n_docs


def _decon_df(res):
    return (
        res.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "n_hits", "contaminated"]]
    )


def test_decontaminate_distributed_tier_matches_broadcast(ray_session):
    """The forced hash-semi-join tier (the path a too-big-to-broadcast
    benchmark takes) produces the identical flags and hit counts as the
    exact broadcast tier, including the planted contamination."""
    from graphiti_ray.ops.filtering import decontaminate

    want = _decon_df(decontaminate(SF))
    got = _decon_df(decontaminate(SF, force_distributed=True))
    assert got.equals(want)
    assert want["contaminated"].sum() > 0  # non-vacuous


def test_decontaminate_large_benchmark_falls_back(ray_session, monkeypatch):
    """A benchmark exceeding the broadcast byte cap must NEVER assemble
    on the driver: the collect aborts mid-stream (_BroadcastTooBig) and
    the operator transparently takes the distributed tier — same
    output."""
    from graphiti_ray.ops import filtering
    from graphiti_ray.stages import joins

    want = _decon_df(filtering.decontaminate(SF))
    monkeypatch.setattr(joins, "BROADCAST_MAX_BYTES", 64)  # force overflow
    got = _decon_df(filtering.decontaminate(SF))
    assert got.equals(want)
    assert want["contaminated"].sum() > 0


def test_decontaminate_external_benchmark_table(ray_session, tmp_path):
    """Benchmark supplied as an external parquet table (the production
    shape) matches the in-corpus carve byte for byte."""
    from graphiti_ray.ops.filtering import decontaminate, write_benchmark_parquet

    path = write_benchmark_parquet(SF, str(tmp_path / "bench"))
    want = _decon_df(decontaminate(SF))
    got = _decon_df(decontaminate(SF, benchmark_path=path))
    assert got.equals(want)


def test_domain_cap_topk_semantics(ray_session):
    from graphiti_ray.ops.packing import DOMAIN_CAP_K

    a = _oracle_compare("domain_cap")
    per_dom = a.groupby("domain")
    assert (per_dom.size() <= DOMAIN_CAP_K).all()
    for _, g in per_dom:
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["n_chars"].diff().dropna() <= 0).all()  # rank by length desc


def test_sequence_pack_contiguous_token_stream(ray_session):
    from graphiti_ray.ops.packing import SEQ_LEN

    a = _oracle_compare("sequence_pack")
    a = a.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    # exclusive prefix: each doc starts where the previous one ended
    assert a.loc[0, "tok_start"] == 0
    ends = a["tok_start"] + a["n_tokens"]
    assert (a["tok_start"].iloc[1:].values == ends.iloc[:-1].values).all()
    assert (a["seq_first"] == a["tok_start"] // SEQ_LEN).all()
    assert (a["seq_last"] == (ends - 1) // SEQ_LEN).all()
    assert a["seq_last"].max() > 0  # multiple sequences actually produced


def test_multimodal_frames_matches_duckdb_oracle(ray_session):
    """Frame explode + per-frame digest hash-match the SQL mirror; the
    sampling stride and frame geometry hold."""
    from graphiti_ray.ops.multimodal import FRAME_CHARS, SAMPLE_EVERY

    a = _oracle_compare("multimodal_frames")
    assert (a["frame_idx"] % SAMPLE_EVERY == 0).all()
    assert (a["frame_idx"] < a["n_frames"]).all()
    # every doc long enough for one frame appears
    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want_docs = set(docs[docs["text"].str.len() >= FRAME_CHARS]["doc_id"])
    assert set(a["doc_id"]) == want_docs


def test_multimodal_features_deterministic_and_normalized(ray_session):
    """Feature extraction pinned against a direct single-process
    recomputation of the md5-trigram accumulator (the float vector; the
    integer projections additionally carry the DuckDB oracle in the
    driver gate)."""
    import numpy as np

    from graphiti_ray.functions.hashing import char_shingles, md5_hash64
    from graphiti_ray.ops.multimodal import extract_features

    res = extract_features("/root/testdata/sf0.01").to_pandas()
    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    assert len(res) == len(docs)
    merged = res.merge(docs, on="doc_id")
    sample = merged.sample(20, random_state=7)

    def ref_acc(text: str) -> np.ndarray:
        acc = np.zeros(64, dtype=np.int64)
        for sh in char_shingles(text.replace("\n", " ")):
            h = md5_hash64(sh, salt="ft|")
            acc[h % 64] += 1 if (h >> 63) & 1 else -1
        return acc

    accs = np.stack([ref_acc(t) for t in sample["text"]])
    want = accs.astype(np.float32)
    norms = np.linalg.norm(want, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    want /= norms
    got = np.array(sample["feature"].tolist(), dtype=np.float32)
    assert np.allclose(got, want, atol=1e-6)
    gn = np.linalg.norm(got, axis=1)
    assert np.allclose(gn[gn > 0], 1.0, atol=1e-5)
    assert (sample["n_active"].values == (accs != 0).sum(axis=1)).all()
    assert (sample["feat_argmax"].values == accs.argmax(axis=1)).all()
    assert (sample["feat_l1"].values == np.abs(accs).sum(axis=1)).all()


def test_join_broadcast_matches_duckdb_oracle(ray_session):
    """Broadcast equi-join: orders enriched with customer nation, one
    row per nation; dimension sides ship once through lookup_column."""
    a = _oracle_compare("join_broadcast")
    assert a["n_orders"].sum() == pq.read_metadata(
        "/root/testdata/sf0.01/orders.parquet").num_rows


def test_join_shuffle_matches_duckdb_oracle(ray_session):
    """Large-large bucketed-exchange join: every lineitem matched to
    its order's priority, integer-exact revenue."""
    a = _oracle_compare("join_shuffle")
    assert a["n_items"].sum() == pq.read_metadata(
        "/root/testdata/sf0.01/lineitem.parquet").num_rows


def test_multimodal_features_matches_duckdb_oracle(ray_session):
    """The integer images of the feature vector (n_active, argmax, L1)
    hash-match the md5-trigram SQL mirror."""
    _oracle_compare("multimodal_features")


def test_lm_score_matches_duckdb_oracle(ray_session):
    """Train-then-score unigram surprisal: integer buckets hash-match
    the SQL mirror; common-word docs outscore rare-word docs per
    token."""
    a = _oracle_compare("lm_score")
    assert (a["n_oov"] == 0).all()  # model trained on the same corpus
    assert (a["lm_score"] > 0).all()
    # per-token score varies across docs (the model discriminates)
    per_tok = a["lm_score"] / a["n_words"]
    assert per_tok.nunique() > 10


def test_dedup_fuzzy_keep_matches_duckdb_oracle(ray_session):
    """Keep-list after fuzzy dedup: CC-over-Jaccard-pairs canonical
    survivors + singletons; every corpus doc is accounted for exactly
    once across the components, and duplicates actually collapsed."""
    a = _oracle_compare("dedup_fuzzy_keep")
    from graphiti_ray.ops.corpus import docs_with_dups

    corpus_n = docs_with_dups("/root/testdata/sf0.01").count()
    assert a["n_members"].sum() == corpus_n  # partition of the corpus
    assert len(a) < corpus_n  # planted dups collapsed
    assert (a.groupby("doc_id").size() == 1).all()


def test_dedup_fuzzy_keep_distributed_tier_matches_driver_tier(ray_session):
    """Force the distributed CC + left-outer-join path (driver_threshold=0)
    and pin it to the driver union-find tier's output."""
    import pandas as pd

    from graphiti_ray.ops.dedup import fuzzy_dedup_keep

    sf = "/root/testdata/sf0.001"
    a = fuzzy_dedup_keep(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        fuzzy_dedup_keep(sf, driver_threshold=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_multimodal_resize_matches_duckdb_oracle(ray_session):
    """Strided downscale: dims + digests hash-match the SQL mirror;
    long docs actually shrink to <= target."""
    a = _oracle_compare("multimodal_resize")
    assert (a["n_out"] <= 256).sum() > 0
    assert ((a["stride"] > 1) == (a["n_in"] > 256)).all()
    assert (a["n_out"] == (a["n_in"] + a["stride"] - 1) // a["stride"]).all()


def test_lm_score_distributed_tier_matches_broadcast_tier(ray_session):
    """Force the explode->join->re-aggregate scale tier
    (broadcast_max_vocab=0) and pin it to the broadcast-dict tier."""
    import pandas as pd

    from graphiti_ray.ops.lmscore import lm_score

    sf = "/root/testdata/sf0.001"
    cols = ["doc_id", "n_words", "lm_score", "n_oov"]
    a = lm_score(sf).to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    b = (
        lm_score(sf, broadcast_max_vocab=0)
        .to_pandas()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (b["n_oov"] == 0).all()


def test_events_asof_join_matches_duckdb_oracle(ray_session):
    """Distributed as-of join == DuckDB ASOF LEFT JOIN; every match is
    the latest view at-or-before the purchase for that user."""
    a = _oracle_compare("events_asof_join")
    matched = a[a["view_event_id"] >= 0]
    assert len(matched) > 0 and (matched["gap_us"] >= 0).all()
    assert (a.loc[a["view_event_id"] < 0, "gap_us"] == -1).all()
    assert (matched["view_ts"] <= matched["ts"]).all()


def test_events_sliding_matches_duckdb_oracle(ray_session):
    """Sliding 3h/1h window aggregate hash-matches the
    explode-to-windows SQL; each tumbling hour's rows appear in
    exactly 3 windows (totals are 3x the hourly totals)."""
    a = _oracle_compare("events_sliding")
    hourly = _oracle_compare("events_hourly")
    assert a["n_events"].sum() == 3 * hourly["n_events"].sum()
    assert a["sum_cents"].sum() == 3 * hourly["sum_cents"].sum()


def test_events_range_join_matches_duckdb_oracle(ray_session):
    """Interval self-join == DuckDB inequality join; every event is
    present exactly once and counts are bounded by the user's total."""
    a = _oracle_compare("events_range_join")
    assert a["event_id"].is_unique
    per_user = a.groupby("user_id").size()
    assert (a["n_prev_1h"] < a["user_id"].map(per_user)).all()


def test_events_quantiles_match_duckdb_oracle(ray_session):
    """Exact k-th-order-statistic quantiles == DuckDB quantile_disc;
    monotone across the three percentiles per type."""
    a = _oracle_compare("events_quantiles")
    w = a.pivot(index="event_type", columns="q_pct", values="cents_q")
    assert ((w[50] <= w[90]) & (w[90] <= w[99])).all()


def test_events_funnel_matches_duckdb_oracle(ray_session):
    """Windowed strict funnel hash-matches the chained min-in-window
    SQL, is monotone non-increasing, and the window actually
    discriminates (some users drop at some stage)."""
    a = _oracle_compare("events_funnel").sort_values("stage")
    n = a["n_users"].to_numpy()
    assert len(n) == 4
    assert (n[1:] <= n[:-1]).all()
    assert n[-1] < n[0]
    assert n[-1] > 0


def test_events_retention_matches_duckdb_oracle(ray_session):
    """Purchase-retention cohorts hash-match the epoch-week SQL; the
    curve is discriminative (some week drops below the cohort's week-0
    count) and never exceeds week 0."""
    a = _oracle_compare("events_retention")
    w = a.pivot(index="cohort_week", columns="week_k", values="n_active")
    assert (w.max(axis=1) == w[0]).all()  # week 0 is the cohort peak
    assert (w.min(axis=1) < w[0]).any()  # something drops somewhere


def test_chunk_passages_cover_and_reconstruct(ray_session):
    """Every token index is covered by >= 1 chunk; chunk_seq * STRIDE
    == start_tok; joining each doc's stride-prefix slices of its
    chunks reconstructs the document exactly."""
    from graphiti_ray.ops.chunking import CHUNK_STRIDE, CHUNK_WINDOW

    from graphiti_ray import queries as q

    df = q.QUERIES["chunk_passages"](SF).to_pandas()
    assert (df["chunk_seq"] * CHUNK_STRIDE == df["start_tok"]).all()
    assert (df["n_tok"] >= 1).all() and (df["n_tok"] <= CHUNK_WINDOW).all()
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for doc_id, grp in df.groupby("doc_id"):
        grp = grp.sort_values("chunk_seq")
        toks = []
        for _, r in grp.iterrows():
            words = r["chunk_text"].split(" ") if r["chunk_text"] else [""]
            toks.extend(words[:CHUNK_STRIDE])
        want = texts[doc_id].split(" ")
        assert toks[: len(want)] == want
        if doc_id > 50:  # spot-check a prefix of docs, not all 500
            break


def test_hll_distinct_matches_duckdb_oracle(ray_session):
    """Registers AND the exact-integer raw estimate reproduce
    bit-for-bit in the SQL mirror, and the estimates are genuinely
    accurate: dense columns (no zero registers) within the
    ~2*1.04/sqrt(m) raw-HLL band of the exact distinct count; sparse
    columns within 10% after the standard linear-counting correction
    using the emitted n_zero_registers (the integer contract omits
    ln() by design, so the correction lives consumer-side)."""
    import duckdb
    import math

    from graphiti_ray.ops.hll import HLL_M

    a = _oracle_compare("hll_distinct").set_index(["tbl", "col"])
    con = duckdb.connect()
    for tbl in {t for t, _ in a.index}:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{tbl}.parquet')"
        )
    for (tbl, col), row in a.iterrows():
        exact = con.execute(
            f"SELECT count(DISTINCT {col}) FROM {tbl}"
        ).fetchone()[0]
        raw = row["estimate_milli"] / 1000
        v = row["n_zero_registers"]
        if v > 0 and raw <= 2.5 * HLL_M:
            est = HLL_M * math.log(HLL_M / v)  # linear counting
        else:
            est = raw
        band = 0.10 if v > 0 else 2 * 1.04 / math.sqrt(HLL_M)
        assert abs(est - exact) / exact <= band, (tbl, col, est, exact)
    con.close()
    # both regimes exercised: a dense column and a sparse one
    assert (a["n_zero_registers"] == 0).any()
    assert (a["n_zero_registers"] > HLL_M // 2).any()


def test_cms_heavy_hitters_matches_duckdb_oracle(ray_session):
    """Counters, probe set and estimates reproduce bit-for-bit in the
    SQL mirror, AND the Count-Min guarantees actually hold: every
    estimate >= its exact count (one-sided error) and the overshoot
    stays within the e/w * N bound (checked per column with the real
    N, not assumed from the paper)."""
    import math

    import duckdb

    from graphiti_ray.ops.cms import CMS_W

    a = _oracle_compare("cms_heavy_hitters")
    assert (a["cms_estimate"] >= a["exact_count"]).all()
    con = duckdb.connect()
    for tbl in set(a["tbl"]):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{tbl}.parquet')"
        )
    for (tbl, col), grp in a.groupby(["tbl", "col"]):
        n = con.execute(f"SELECT count(*) FROM {tbl}").fetchone()[0]
        bound = math.e / CMS_W * n
        over = (grp["cms_estimate"] - grp["exact_count"]).max()
        assert over <= bound, (tbl, col, over, bound)
    con.close()


def test_bloom_membership_matches_duckdb_oracle(ray_session):
    """Bit set and every probe verdict reproduce bit-for-bit in the
    SQL mirror, AND the Bloom guarantees hold: ZERO false negatives
    (every true member is in_bloom) and the false-positive rate on
    non-members stays within 3x the theoretical (1-e^{-kn/m})^k."""
    import math

    from graphiti_ray.ops.bloom import BLOOM_K, BLOOM_M

    import duckdb

    from graphiti_ray.ops.bloom import BLOOM_MEMBER

    a = _oracle_compare("bloom_membership")
    members = a[a["is_member"] == 1]
    non = a[a["is_member"] == 0]
    assert len(members) > 0 and len(non) > 0
    assert (members["in_bloom"] == 1).all()  # no false negatives
    # n = keys actually INSERTED (distinct member column), not the
    # members that happen to appear in the probe set
    mt, mc = BLOOM_MEMBER
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(DISTINCT {mc}) FROM "
        f"read_parquet('/root/testdata/sf0.01/{mt}.parquet')"
    ).fetchone()[0]
    con.close()
    fpr_theory = (1 - math.exp(-BLOOM_K * n / BLOOM_M)) ** BLOOM_K
    fpr = (non["in_bloom"] == 1).mean()
    assert fpr <= max(3 * fpr_theory, 5 / len(non)), (fpr, fpr_theory)


def test_lang_temperature_weights_matches_duckdb_oracle(ray_session):
    """Hash-exact vs the SQL mirror (sqrt is correctly rounded per
    IEEE-754, the rest is integer math) AND the temperature semantics
    hold: sampling mass moves from the head language to the tail
    relative to raw proportions, probs sum to ~1e6, weights are
    monotone in counts."""
    a = _oracle_compare("lang_temperature_weights")
    assert a["prob_ppm"].sum() <= 1_000_000
    assert a["prob_ppm"].sum() >= 1_000_000 - len(a)  # floor slack
    a = a.sort_values("n_docs").reset_index(drop=True)
    assert a["weight_milli"].is_monotonic_increasing
    total = a["n_docs"].sum()
    head = a.iloc[-1]
    tail = a.iloc[0]
    assert head["prob_ppm"] / 1e6 < head["n_docs"] / total  # head down
    assert tail["prob_ppm"] / 1e6 > tail["n_docs"] / total  # tail up


def test_events_anomaly_matches_duckdb_oracle(ray_session):
    """Hash-exact vs the HUGEINT mirror, totals reconcile with the
    event table, and the detector discriminates: a brute z-test
    recompute on one user agrees, and the big-int fallback path
    produces identical verdicts to the vectorized int64 path."""
    import duckdb
    import numpy as np

    a = _oracle_compare("events_anomaly")
    con = duckdb.connect()
    ev = con.execute(
        "SELECT user_id, value FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    ).df()
    con.close()
    assert a["n_events"].sum() == len(ev)
    assert 0 < a["n_outliers"].sum() < len(ev)
    # brute single-user recompute (Python ints, same formula)
    uid = a.sort_values("n_outliers").iloc[-1]["user_id"]
    xs = [
        int(np.floor(v * 1000 + 0.5))
        for v in ev[ev["user_id"] == uid]["value"]
    ]
    n, s, x2 = len(xs), sum(xs), sum(x * x for x in xs)
    brute = sum((n * x - s) ** 2 > 9 * (n * x2 - s * s) for x in xs)
    assert brute == a.set_index("user_id").loc[uid, "n_outliers"]
    # force the exact big-int fallback (bound captured by value into
    # the worker closure) and compare verdict-for-verdict
    from graphiti_ray.ops.anomaly import events_anomaly as ea

    forced = ea("/root/testdata/sf0.01", int64_safe=0).to_pandas()
    cols = sorted(a.columns)
    assert forced[cols].sort_values(cols).reset_index(drop=True).equals(
        a[cols].sort_values(cols).reset_index(drop=True)
    )
