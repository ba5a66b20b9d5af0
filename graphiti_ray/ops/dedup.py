"""Deduplication operator family over the document corpus.

Five tiers, all over ``corpus.docs_with_dups`` / ``embeddings_with_dups``
(planted duplicates so results are non-trivial):

- ``exact_dedup``      — sha256(text) hash-partitioned groupby with
                         in-batch partial aggregation (combiner) before
                         the shuffle; survivors = min doc_id per hash.
- ``jaccard_pairs``    — word-3-gram-shingle Jaccard >= 0.6 pairs,
                         complete within a blocking key (lang); the
                         inverted-index pair counter is the vectorizable
                         stand-in for an O(n^2) all-pairs scan. Exact
                         SQL oracle (integer threshold: 5*inter >= 3*un,
                         no float compares).
- ``minhash_lsh_pairs``— the SCALE path for the same semantics: 128-perm
                         MinHash, 32 bands x 4 rows banding (candidate
                         P(s=0.6)≈0.99, P(s=0.7)≈0.9998), candidates
                         verified with exact Jaccard, so precision is
                         1.0 and recall is the banding probability.
- ``simhash_pairs``    — 64-bit SimHash, hamming <= 3, with 4x16-bit
                         chunk blocking (pigeonhole-COMPLETE for d<=3).
- ``embedding_cosine_pairs`` — near-dup by cosine >= 0.9 over the
                         embedding column; brute-force tiled matmul vs a
                         broadcast normalized matrix (ray.put once). The
                         ANN-bucketed variant for >memory corpora is
                         ops/simsearch.py.

Graphiti analog: the exact tier is node_name_match
(graphiti_core/utils/bulk_utils.py:243-253); the near tiers replace the
O(n^2) all-pairs compress_nodes (bulk_utils.py:256-327) with blocked
sketch candidates — SURVEY.md §2.5 D1/D2.
"""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict

import numpy as np
import pyarrow as pa

from ..functions.hashing import (
    minhash_params31,
    minhash_signature_fast,
    simhash64,
    simhash_chunks,
    stable_int,
)
from .corpus import docs_with_dups, embeddings_with_dups

JACCARD_NUM, JACCARD_DEN = 3, 5  # threshold 0.6 as an exact rational
NUM_PERM, BANDS, ROWS = 128, 32, 4
SIMHASH_MAX_HAMMING = 3
COSINE_THRESHOLD = 0.9
_P31 = (1 << 31) - 1
_M61 = (1 << 61) - 1


# ------------------------------------------------------------- shingles

def word_3gram_shingles(text: str) -> list[str]:
    """Word 3-grams; whole text when < 3 words. Matches the SQL mirror
    (list_transform over string_split) token for token."""
    w = text.split(" ")
    if len(w) < 3:
        return [" ".join(w)]
    return [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]


_SHINGLE_CACHE: dict[str, int] = {}
_SHINGLE_CACHE_MAX = 4_000_000  # bounded per worker process


def _shingle_h(s: str) -> int:
    v = _SHINGLE_CACHE.get(s)
    if v is None:
        v = stable_int(s, salt="mh") % _M61
        if len(_SHINGLE_CACHE) >= _SHINGLE_CACHE_MAX:
            _SHINGLE_CACHE.clear()
        _SHINGLE_CACHE[s] = v
    return v


def shingle_hash_set(text: str) -> np.ndarray:
    """Sorted unique 61-bit shingle hashes (uint64 storage). 61 bits so
    set-intersection sizes match the string-set SQL oracle (expected
    collisions ~1e-9 at 64k distinct shingles; 32-bit would expect ~1).
    Hashes are memoized per worker (shingle vocabulary repeats heavily
    across documents)."""
    hs = {_shingle_h(s) for s in word_3gram_shingles(text)}
    return np.fromiter(sorted(hs), dtype=np.uint64, count=len(hs))


from functools import lru_cache


@lru_cache(maxsize=2)
def _shingled_corpus(sf_dir: str):
    """Materialized (doc_id, lang, sh, n_sh) shingle table — shared by
    the Jaccard and MinHash tiers so a sweep computes shingles once."""
    return (
        docs_with_dups(sf_dir)
        .map_batches(_shingle_batch, batch_format="pyarrow")
        .materialize()
    )


def _shingle_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    sets = [shingle_hash_set(t) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "sh": pa.array([s.astype(np.int64) for s in sets], pa.list_(pa.int64())),
            "n_sh": pa.array([len(s) for s in sets], pa.int64()),
        }
    )


def _pairs_from_index(
    ids: list[int], sets: list[np.ndarray]
) -> list[tuple[int, int, int, int]]:
    """Complete qualifying-pair enumeration via an inverted index:
    shingle -> posting list; co-occurrence counts = intersection sizes.
    Cost is sum over shingles of |postings|^2 — bounded by block size,
    not corpus size."""
    postings: dict[int, list[int]] = defaultdict(list)
    for row, s in enumerate(sets):
        for h in s.tolist():
            postings[h].append(row)
    counts: dict[tuple[int, int], int] = defaultdict(int)
    for rows in postings.values():
        if len(rows) < 2:
            continue
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                counts[(rows[i], rows[j])] += 1
    out = []
    for (i, j), inter in counts.items():
        un = len(sets[i]) + len(sets[j]) - inter
        if JACCARD_DEN * inter >= JACCARD_NUM * un:
            a, b = ids[i], ids[j]
            if a > b:
                a, b = b, a
            out.append((a, b, inter, un))
    return out


def _pairs_table(pairs: list[tuple[int, int, int, int]]) -> pa.Table:
    pairs.sort()
    return pa.table(
        {
            "a_id": pa.array([p[0] for p in pairs], pa.int64()),
            "b_id": pa.array([p[1] for p in pairs], pa.int64()),
            "inter": pa.array([p[2] for p in pairs], pa.int64()),
            "un": pa.array([p[3] for p in pairs], pa.int64()),
        }
    )


# ----------------------------------------------------------- exact dedup

def exact_dedup(sf_dir: str):
    """(text_sha, canonical_doc_id, n_dups): groupby(sha256) with
    in-batch partial min/count so the shuffle carries one row per
    distinct text per block, not one per document."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        t = batch.append_column("text_sha", pa.array(shas, pa.string()))
        g = t.group_by("text_sha").aggregate([("doc_id", "min"), ("doc_id", "count")])
        return g.rename_columns(["text_sha", "canonical_doc_id", "n_dups"])

    ds = docs_with_dups(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=None)
    return ds.groupby("text_sha").aggregate(
        Min("canonical_doc_id", alias_name="canonical_doc_id"),
        Sum("n_dups", alias_name="n_dups"),
    )


# --------------------------------------- jaccard (exact, distributed)
#
# The inverted index ITSELF is the distributed data structure: postings
# (shingle-hash -> doc) are exploded and hash-bucketed by shingle, so a
# shingle's complete posting list lands in exactly one reducer; each
# reducer emits partial pair co-occurrence counts; a second (pair-keyed)
# exchange sums them into exact intersection sizes. No task ever holds
# more than one shingle bucket — unlike the round-2 version, which put
# an entire LANGUAGE (≈ the whole corpus at 100x) into one map_groups
# task. Same-lang semantics are kept by XOR-folding a lang hash into
# the shingle key (cross-lang docs can never co-occur; collision odds
# are the same ~1e-9 class as the 61-bit shingle hashing itself).
# Stop-shingle bound: a shingle shared by p documents contributes
# O(p^2) pairs in its reducer, so without a cap one boilerplate
# 3-gram ("all rights reserved") makes a single reducer quadratic in
# corpus size. JACCARD_DF_CAP is therefore part of the OPERATOR
# CONTRACT, not an approximation knob: shingles with document
# frequency > cap are excluded from intersection counts (they still
# count toward each document's set size), which bounds every reducer
# at O(cap^2) pairs per shingle. The effect is one-sided — measured
# Jaccard can only DROP (inter shrinks, union grows), and only for
# pairs whose similarity hinges on shingles shared by >cap documents,
# which at j >= 0.6 means near-boilerplate. The oracle SQL
# (queries.DEDUP_JACCARD_SQL) applies the identical df filter, so the
# hash gate pins the capped semantics end to end.

JACCARD_SHINGLE_BUCKETS = 256
JACCARD_PAIR_BUCKETS = 64
JACCARD_DF_CAP = int(os.environ.get("GRAFT_JACCARD_DF_CAP", "256"))


def _explode_postings(batch: pa.Table) -> pa.Table:
    """(doc_id, lang, sh, n_sh) -> one posting row per (shingle, doc),
    vectorized via list_flatten (no Python loop over shingles)."""
    import pyarrow.compute as pc

    ids = batch.column("doc_id").to_numpy()
    n_sh = batch.column("n_sh").to_numpy()
    langs = batch.column("lang").to_pylist()
    sh_col = batch.column("sh")
    flat = pc.list_flatten(sh_col).to_numpy().astype(np.int64).view(np.uint64)
    lens = pc.list_value_length(sh_col).to_numpy().astype(np.int64)
    lh_of = {l: np.uint64(stable_int(l, salt="jl")) for l in set(langs)}
    lang_h = np.fromiter((lh_of[l] for l in langs), dtype=np.uint64,
                         count=len(langs))
    h = flat ^ np.repeat(lang_h, lens)
    return pa.table(
        {
            "bucket": pa.array((h % JACCARD_SHINGLE_BUCKETS).astype(np.int32)),
            "h": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
            "n_sh": pa.array(np.repeat(n_sh, lens), pa.int64()),
        }
    )


def _bucket_pair_partials(df, df_cap: int | None = None) -> "pa.Table":
    """One shingle bucket: h-sorted boundary scan finds each posting
    run (= one shingle's complete posting list), then pair enumeration
    is fully vectorized — runs are grouped BY LENGTH so each distinct
    length L gets one (R, L) gather + one np.triu_indices expansion
    (the per-run Python loop cost the old version paid is gone; the
    Python loop here is over distinct run lengths, <= df_cap values).
    Runs longer than ``df_cap`` are stop-shingles and are dropped per
    the operator contract documented above."""
    cap = JACCARD_DF_CAP if df_cap is None else df_cap
    h = df["h"].to_numpy()
    order = np.argsort(h, kind="stable")
    h = h[order]
    ids = df["doc_id"].to_numpy()[order]
    ns = df["n_sh"].to_numpy()[order]
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    lens = np.diff(np.r_[starts, len(h)])
    valid = (lens >= 2) & (lens <= cap)
    empty = pa.table(
        {
            "pair_bucket": pa.array([], pa.int32()),
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
        }
    )
    if not valid.any():
        return empty
    # per-doc set size lookup (n_sh rides every posting row, so the
    # first occurrence per doc id carries it)
    uids, first_pos = np.unique(ids, return_index=True)
    usizes = ns[first_pos].astype(np.int64)
    vstarts, vlens = starts[valid], lens[valid]
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    for length in np.unique(vlens):
        rs = vstarts[vlens == length]
        mat = ids[rs[:, None] + np.arange(int(length))]
        iu, ju = np.triu_indices(int(length), 1)
        a_parts.append(mat[:, iu].ravel())
        b_parts.append(mat[:, ju].ravel())
    x = np.concatenate(a_parts)
    y = np.concatenate(b_parts)
    lo = np.minimum(x, y)
    hi = np.maximum(x, y)
    upairs, c_arr = np.unique(np.stack([lo, hi], axis=1), axis=0,
                              return_counts=True)
    if not len(upairs):
        return empty
    a_arr = upairs[:, 0]
    b_arr = upairs[:, 1]
    pb = ((a_arr * 1_000_003) ^ b_arr) % JACCARD_PAIR_BUCKETS
    return pa.table(
        {
            "pair_bucket": pa.array(pb.astype(np.int32)),
            "a_id": pa.array(a_arr, pa.int64()),
            "b_id": pa.array(b_arr, pa.int64()),
            "inter": pa.array(c_arr.astype(np.int64)),
            "n_a": pa.array(usizes[np.searchsorted(uids, a_arr)]),
            "n_b": pa.array(usizes[np.searchsorted(uids, b_arr)]),
        }
    )


def _pair_finalize(df) -> "pa.Table":
    """One pair bucket: sum partial intersections, derive the union
    from the carried set sizes, apply the exact-rational threshold."""
    g = df.groupby(["a_id", "b_id"], as_index=False).agg(
        inter=("inter", "sum"), n_a=("n_a", "first"), n_b=("n_b", "first")
    )
    inter = g["inter"].to_numpy()
    un = g["n_a"].to_numpy() + g["n_b"].to_numpy() - inter
    keep = JACCARD_DEN * inter >= JACCARD_NUM * un
    return pa.table(
        {
            "a_id": pa.array(g["a_id"].to_numpy()[keep], pa.int64()),
            "b_id": pa.array(g["b_id"].to_numpy()[keep], pa.int64()),
            "inter": pa.array(inter[keep], pa.int64()),
            "un": pa.array(un[keep], pa.int64()),
        }
    )


def jaccard_pairs(sf_dir: str):
    """All same-lang pairs with shingle-Jaccard >= 0.6, exactly —
    distributed inverted index (see block comment above)."""
    sh = _shingled_corpus(sf_dir)
    partials = sh.map_batches(
        _explode_postings, batch_format="pyarrow"
    ).groupby("bucket").map_groups(_bucket_pair_partials, batch_format="pandas")
    return partials.groupby("pair_bucket").map_groups(
        _pair_finalize, batch_format="pandas"
    )


# --------------------------------------------------------- MinHash + LSH

LSH_BUCKETS = 1024  # shuffle granularity: hash(band_key) % LSH_BUCKETS


class _SignatureStage:
    """Actor-pool stage: MinHash family params built once per actor."""

    def __init__(self):
        self.a, self.b = minhash_params31(NUM_PERM)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bands, buckets = [], [], []
        for i, s in zip(
            batch.column("doc_id").to_pylist(), batch.column("sh").to_pylist()
        ):
            xs31 = np.asarray(s, dtype=np.uint64) % _P31  # fold to 31 bits for
            # overflow-free vectorized minhash; only affects LSH recall
            sig = minhash_signature_fast(xs31, self.a, self.b)
            for bi in range(BANDS):
                band = sig[bi * ROWS : (bi + 1) * ROWS]
                h = hashlib.blake2b(
                    band.tobytes() + bytes([bi]), digest_size=8
                ).digest()
                k = int.from_bytes(h, "little")
                ids.append(i)
                bands.append(k >> 1)  # int64 band identity (63 bits)
                buckets.append(k % LSH_BUCKETS)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band_key": pa.array(bands, pa.int64()),
                "band_bucket": pa.array(buckets, pa.int32()),
            }
        )


def minhash_lsh_pairs(sf_dir: str, concurrency: int = 4):
    """Banding -> candidate pairs -> exact-Jaccard verification.

    Candidates come from a groupby(band_key) (the LSH bucket shuffle);
    a second bucketed exchange makes candidates globally distinct; then
    verification reads each side's shingle set through the TIERED lookup
    (stages/joins.lookup_column: whole-map broadcast when small, sharded
    object-store refs, then cluster-visible parquet shards) — the driver
    never assembles a whole-corpus shingle map."""
    sh = _shingled_corpus(sf_dir)
    n_docs = sh.count()  # materialized -> metadata only

    bands = sh.map_batches(
        _SignatureStage, batch_format="pyarrow", concurrency=concurrency
    )

    def bucket_pairs(df) -> pa.Table:
        """All band groups of one bucket in one call (most bands are
        singletons — shuffling per band_key would pay per-group
        overhead ~BANDS x corpus times)."""
        seen: set[tuple[int, int]] = set()
        for _, g in df.groupby("band_key", sort=False):
            if len(g) < 2:
                continue
            ids = sorted(set(g["doc_id"]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    seen.add((ids[i], ids[j]))
        seen_l = sorted(seen)
        return pa.table(
            {
                "a_id": pa.array([p[0] for p in seen_l], pa.int64()),
                "b_id": pa.array([p[1] for p in seen_l], pa.int64()),
            }
        )

    def bucket_pairs_tagged(df) -> pa.Table:
        t = bucket_pairs(df)
        # tag each candidate with a pair bucket so ONE further exchange
        # does distinct + verification together
        pb = [
            (a * 1_000_003 + b) % LSH_BUCKETS
            for a, b in zip(t.column("a_id").to_pylist(), t.column("b_id").to_pylist())
        ]
        return t.append_column("pair_bucket", pa.array(pb, pa.int32()))

    cand = bands.groupby("band_bucket").map_groups(
        bucket_pairs_tagged, batch_format="pandas"
    )

    def global_distinct(df) -> pa.Table:
        """Pairs repeat across band buckets; each pair lands in exactly
        one pair_bucket, so in-bucket distinct is global distinct."""
        uniq = sorted(set(zip(df["a_id"], df["b_id"])))
        return pa.table(
            {
                "a_id": pa.array([int(a) for a, _ in uniq], pa.int64()),
                "b_id": pa.array([int(b) for _, b in uniq], pa.int64()),
            }
        )

    dist = cand.groupby("pair_bucket").map_groups(
        global_distinct, batch_format="pandas"
    )

    from ..stages.joins import lookup_column

    dist = lookup_column(
        dist, "a_id", sh, "doc_id", "sh", "sh_a", mapping_rows=n_docs
    )
    dist = lookup_column(
        dist, "b_id", sh, "doc_id", "sh", "sh_b", mapping_rows=n_docs
    )

    def verify(t: pa.Table) -> pa.Table:
        pairs = []
        for a, b, sa, sb in zip(
            t.column("a_id").to_pylist(),
            t.column("b_id").to_pylist(),
            t.column("sh_a").to_pylist(),
            t.column("sh_b").to_pylist(),
        ):
            xa = np.asarray(sa, dtype=np.int64)
            xb = np.asarray(sb, dtype=np.int64)
            inter = np.intersect1d(xa, xb, assume_unique=True).size
            un = xa.size + xb.size - inter
            if JACCARD_DEN * inter >= JACCARD_NUM * un:
                pairs.append((int(a), int(b), int(inter), int(un)))
        return _pairs_table(pairs)

    return dist.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------- SimHash

def simhash_pairs(sf_dir: str):
    """Pairs with simhash hamming distance <= 3; 4x16-bit chunk blocking
    is pigeonhole-complete at this radius (hashing.simhash_chunks)."""

    SIM_BUCKETS = 1024

    def sketch(batch: pa.Table) -> pa.Table:
        ids, keys, buckets, hashes = [], [], [], []
        for i, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            h = simhash64(word_3gram_shingles(t))
            for ci, cv in enumerate(simhash_chunks(h)):
                ids.append(i)
                keys.append(f"{ci}:{cv}")
                buckets.append((cv * 4 + ci) % SIM_BUCKETS)
                hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_key": pa.array(keys, pa.string()),
                "chunk_bucket": pa.array(buckets, pa.int32()),
                "simhash": pa.array(hashes, pa.uint64()),
            }
        )

    def bucket_pairs(df) -> pa.Table:
        a, b, d = [], [], []
        for _, g in df.groupby("chunk_key", sort=False):
            if len(g) < 2:
                continue
            rows = sorted(set(zip(g["doc_id"], g["simhash"])))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    dist = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                    if dist <= SIMHASH_MAX_HAMMING:
                        a.append(rows[i][0])
                        b.append(rows[j][0])
                        d.append(dist)
        return pa.table(
            {
                "a_id": pa.array(a, pa.int64()),
                "b_id": pa.array(b, pa.int64()),
                "hamming": pa.array(d, pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    sk = docs_with_dups(sf_dir).map_batches(sketch, batch_format="pyarrow")
    pairs = sk.groupby("chunk_bucket").map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["a_id", "b_id"]).aggregate(Min("hamming", alias_name="hamming"))


# ------------------------------------------------- embedding cosine pairs

EMB_CHUNK_ROWS = 8192  # rows per object-store chunk (chunk^2 tile fits a task)


def list_col_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow list<float> / fixed_size_list column -> 2-D numpy matrix,
    via a single flattened buffer copy (no per-row to_pylist)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    return flat.reshape(n, flat.size // n)


def embedding_cosine_pairs(sf_dir: str):
    """(a_id, b_id) with cosine >= 0.9 over the embedding column.

    Exact all-pairs semantics at bounded memory: the corpus streams into
    K object-store CHUNKS of <= EMB_CHUNK_ROWS normalized rows each
    (ray.put per chunk — the driver never holds more than one chunk, and
    no task ever holds more than two), then K*(K+1)/2 TILE tasks each
    fetch two chunks and emit the qualifying pairs of their tile. Work is
    the unavoidable O(n^2/p) of an exact threshold join; memory per task
    is O(chunk^2) independent of corpus size. The sub-quadratic
    candidate-bucketed variants (LSH/IVF) live in ops/simsearch.py.
    Threshold 0.9 is empirically > 0.29 above any non-planted pair, so
    float32-vs-float64 noise cannot flip membership."""
    import ray
    import ray.data as rd

    chunk_refs: list = []
    for b in embeddings_with_dups(sf_dir).iter_batches(
        batch_size=EMB_CHUNK_ROWS, batch_format="pyarrow"
    ):
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_col_to_matrix(b.column("embedding"))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        chunk_refs.append(ray.put((ids, m / norms)))

    empty = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
    )
    if not chunk_refs:
        return rd.from_arrow(empty)

    k = len(chunk_refs)
    tiles = [{"i": i, "j": j} for i in range(k) for j in range(i, k)]

    from ..stages.joins import get_broadcast

    def tile(batch: pa.Table) -> pa.Table:
        outs = [empty]
        for i, j in zip(batch.column("i").to_pylist(), batch.column("j").to_pylist()):
            ids_a, ma = get_broadcast(chunk_refs[i])
            ids_b, mb = get_broadcast(chunk_refs[j])
            sims = ma @ mb.T
            rows, cols = np.nonzero(sims >= COSINE_THRESHOLD)
            if i == j:  # strict upper triangle: drop self + mirror
                keep = rows < cols
                rows, cols = rows[keep], cols[keep]
            a, b = ids_a[rows], ids_b[cols]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            order = np.lexsort((hi, lo))
            outs.append(
                pa.table(
                    {
                        "a_id": pa.array(lo[order], pa.int64()),
                        "b_id": pa.array(hi[order], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return rd.from_items(tiles, override_num_blocks=len(tiles)).map_batches(
        tile, batch_format="pyarrow"
    )


# ------------------------------------------- fuzzy dedup keep-list (D2+D4)

def fuzzy_dedup_keep(sf_dir: str, driver_threshold: int | None = None):
    """(doc_id, n_members): the corpus after fuzzy deduplication — one
    canonical survivor per near-dup component (connected components
    over the exact-Jaccard pair graph, canonical = min doc_id, n_members
    = component size) plus every pair-free doc with n_members = 1.

    This is the end-to-end shape real pretraining pipelines run (pairs
    are an intermediate; the keep-list is the product). Tiered like
    every other component problem here (stages/cc.components): below
    DRIVER_THRESHOLD pairs a driver union-find labels the (sparse —
    near-dup clusters only) pair graph and the member set broadcasts
    via ray.put + vectorized is_in; above it, distributed min-label
    propagation (iterated join + groupby-min) plus ONE left-outer join
    for the singleton pass — nothing corpus-sized on the driver. Doc
    ids ride as 12-digit zero-padded strings through the labeling so
    lexicographic min == numeric min == the SQL oracle's least().

    Graphiti analog: compress_uuid_map + dedupe survivors
    (graphiti_core/utils/bulk_utils.py:256-327); SURVEY.md §2.5 D2/D4.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..stages.cc import components, connected_components_ds
    from ..stages.joins import get_broadcast

    def pad_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.utf8_lpad(pc.cast(t.column("a_id"), pa.string()), 12, "0"),
                "b": pc.utf8_lpad(pc.cast(t.column("b_id"), pa.string()), 12, "0"),
            }
        )

    pairs = jaccard_pairs(sf_dir).map_batches(pad_pairs, batch_format="pyarrow")
    docs = docs_with_dups(sf_dir).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )

    from ..stages.cc import DRIVER_THRESHOLD

    if driver_threshold is None:
        driver_threshold = DRIVER_THRESHOLD
    lab = components(pairs, driver_threshold)  # dict tier or None
    if lab is not None:
        from collections import Counter

        sizes = Counter(lab.values())
        comps = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([int(k) for k in sizes], pa.int64()),
                    "n_members": pa.array(
                        [int(v) for v in sizes.values()], pa.int64()
                    ),
                }
            )
        )
        member_ref = ray.put(np.array(sorted(int(u) for u in lab), np.int64))

        def keep_nonmembers(t: pa.Table) -> pa.Table:
            mem = pa.array(get_broadcast(member_ref), pa.int64())
            ids = t.filter(
                pc.invert(pc.is_in(t.column("doc_id"), value_set=mem))
            ).column("doc_id")
            ones = pa.array(np.ones(len(ids), dtype=np.int64), pa.int64())
            return pa.table({"doc_id": ids, "n_members": ones})

        return comps.union(docs.map_batches(keep_nonmembers, batch_format="pyarrow"))

    labels = connected_components_ds(pairs)  # (uuid, label) padded strings

    comps = (
        labels.groupby("label")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pc.cast(t.column("label"), pa.int64()),
                    "n_members": pc.cast(t.column("count()"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def to_members(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("uuid"), pa.int64())
        # marker column: the join collapses the key, so null-ness of
        # `hit` is what distinguishes unmatched left rows
        hit = pa.array(np.ones(len(ids), dtype=np.int8), pa.int8())
        return pa.table({"m_id": ids, "hit": hit})

    members = labels.map_batches(to_members, batch_format="pyarrow")

    def keep_unmatched(t: pa.Table) -> pa.Table:
        ids = t.filter(pc.is_null(t.column("hit"))).column("doc_id")
        ones = pa.array(np.ones(len(ids), dtype=np.int64), pa.int64())
        return pa.table({"doc_id": ids, "n_members": ones})

    singles = docs.join(
        members, join_type="left_outer", num_partitions=8,
        on=("doc_id",), right_on=("m_id",),
    ).map_batches(keep_unmatched, batch_format="pyarrow")
    return comps.union(singles)
