"""Deterministic identity + similarity hashing.

The reference mints random uuid4 ids at construction
(graphiti_core/nodes.py:79, edges.py:42), which makes replays
non-idempotent. In a batch engine every id is a content hash of the
record's natural key, so task retries and checkpoint-resume reproduce
byte-identical outputs.

Also home of the similarity sketches (MinHash, SimHash, rolling
fingerprint) used by near-dup blocking and the dedup operator family.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def sha1_hex(*parts: str) -> str:
    """Deterministic id from natural-key parts (order-sensitive)."""
    h = hashlib.sha1("\x1f".join(parts).encode("utf-8", "surrogatepass"))
    return h.hexdigest()


def episode_uuid(url: str, warc_ts_us: int) -> str:
    return sha1_hex("ep", url, str(warc_ts_us))


def node_uuid(group_id: str, name_norm: str) -> str:
    """Keyed on (group, normalized name): exact duplicates across all
    episodes collide by construction, making exact dedup
    (node_name_match, bulk_utils.py:243-253) a distinct-by-key pass with
    no uuid_map entries needed for the exact tier."""
    return sha1_hex("node", group_id, name_norm)


def edge_uuid(group_id: str, src: str, tgt: str, pred: str, fact_norm: str) -> str:
    return sha1_hex("edge", group_id, src, tgt, pred, fact_norm)


def stable_int(s: str, *, salt: str = "") -> int:
    """64-bit deterministic hash (Python's hash() is seed-randomized)."""
    d = hashlib.blake2b((salt + s).encode("utf-8", "surrogatepass"), digest_size=8).digest()
    return int.from_bytes(d, "little")


def partition_of(group_id: str, num_partitions: int) -> int:
    return stable_int(group_id, salt="part") % num_partitions


def bucket_array(values, num_buckets: int, *, salt: str = "") -> np.ndarray:
    """Vectorized deterministic bucket ids (int32) for a string column.

    Replaces the per-row ``stable_int(v) % N`` loops that tagged every
    exchange (~1-2 µs/row in Python) with pandas' C siphash kernel.
    Bucket ids only key INTERNAL exchanges — the reducers are
    key-complete per bucket, so any fixed deterministic hash yields
    identical results — but the hash_key is pinned so reruns bucket
    identically. Accepts a list, numpy array, or Arrow (Chunked)Array.
    """
    import pandas as pd

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.int32)
    key = (salt + "graphiti_ray_bkt")[:16].ljust(16, "0")
    h = pd.util.hash_array(arr, hash_key=key, categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wrapping mults)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def bucket_hex40(cols, num_buckets: int, *, salt: str = "") -> np.ndarray:
    """Bucket ids (int32) for one-or-more HEX40 uuid Arrow columns with
    zero Python-object materialization: each column's first 16 hex
    chars parse to uint64 via a numpy view over the Arrow value buffer
    (stages/joins.fixed_width_matrix), mixed with splitmix64.

    ONLY for columns guaranteed to be content-hash uuids (sha1 hex) —
    raises on anything else rather than falling back, because a
    per-batch fallback would bucket the same key differently across
    batches and break reducer key-completeness."""
    from ..stages.joins import _col_u64

    if not isinstance(cols, (list, tuple)):
        cols = [cols]
    h = np.uint64(stable_int(salt, salt="bh40"))
    acc = None
    for col in cols:
        u, _ = _col_u64(col)
        if u is None:
            raise ValueError("bucket_hex40: column is not uniform hex40")
        acc = u if acc is None else _mix64(acc) ^ u
    if acc is None or acc.size == 0:
        return np.empty(0, dtype=np.int32)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = _mix64(acc ^ h) % np.uint64(num_buckets)
    return out.astype(np.int32)


# ---------------------------------------------------------------- MinHash

def _token_hashes(tokens: list[str]) -> np.ndarray:
    return np.fromiter(
        (stable_int(t, salt="mh") % _MERSENNE for t in tokens), dtype=np.uint64, count=len(tokens)
    )


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) for the family h_i(x) = (a_i * x + b_i) mod p."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(tokens: list[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature over a token/shingle set (uint64[num_perm])."""
    if not tokens:
        return np.full(a.shape[0], _MERSENNE, dtype=np.uint64)
    x = _token_hashes(tokens)
    # (num_perm, n) universal hashes; object-dtype not needed: do mod-mul in python ints? No:
    # use uint64 with mod via float trick is lossy -> use Python ints per perm is slow.
    # 61-bit Mersenne modulus keeps a*x within 122 bits -> use object only if needed.
    # Vectorized: compute in uint128 via two 64-bit halves is overkill; use np.uint64
    # overflow-safe approach with dtype=object for a*x. For num_perm<=128 and short
    # token lists this is fast enough; hot paths use char-shingle counts instead.
    sig = np.empty(a.shape[0], dtype=np.uint64)
    xs = x.astype(object)
    for i in range(a.shape[0]):
        vals = (int(a[i]) * xs + int(b[i])) % _MERSENNE
        sig[i] = int(min(vals))
    return sig


def lsh_band_keys(sig: np.ndarray, bands: int, rows: int) -> list[str]:
    """Split a signature into `bands` bands of `rows` rows; each band's
    hash is a blocking key. Pairs agreeing on any band become candidates."""
    keys = []
    for bi in range(bands):
        band = sig[bi * rows : (bi + 1) * rows]
        h = hashlib.blake2b(band.tobytes() + bytes([bi]), digest_size=8).hexdigest()
        keys.append(f"{bi}:{h}")
    return keys


def char_shingles(s: str, k: int = 3) -> list[str]:
    s = f"^{s.lower()}$"
    if len(s) <= k:
        return [s]
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def word_shingles(text: str, k: int = 5) -> list[str]:
    toks = text.lower().split()
    if len(toks) <= k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


_P31 = (1 << 31) - 1


def token_hashes31(tokens: list[str]) -> np.ndarray:
    """Token hashes in [0, 2^31): a*x products then fit in uint64, so the
    whole MinHash family is computable with vectorized uint64 ops (the
    object-dtype 61-bit path above is the high-precision fallback)."""
    return np.fromiter(
        (stable_int(t, salt="mh") % _P31 for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )


def minhash_params31(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _P31, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature_fast(
    xs: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """uint64[num_perm] MinHash of pre-hashed shingles (token_hashes31).

    Fully vectorized: (num_perm, n) universal-hash matrix, min over n.
    """
    if xs.size == 0:
        return np.full(a.shape[0], _P31, dtype=np.uint64)
    return ((a[:, None] * xs[None, :] + b[:, None]) % _P31).min(axis=1)


# ---------------------------------------------------------------- SimHash

def md5_hash64(s: str, *, salt: str = "") -> int:
    """64-bit hash matching DuckDB's ``md5_number_lower(salt || s)``
    (upper md5 half, little-endian) so SimHash is SQL-mirrorable."""
    d = hashlib.md5((salt + s).encode("utf-8", "surrogatepass")).digest()
    return int.from_bytes(d[8:16], "little")


# Vectorized single-block MD5. A salted key of <= 55 bytes pads to
# exactly ONE 64-byte MD5 block, so the whole digest is 64 rounds of
# uint32 numpy arithmetic over an (n, 16) word matrix — bit-identical
# to hashlib/DuckDB md5 by construction (same constants, same rounds),
# ~100x faster than a Python md5-per-key loop, and the SQL mirrors
# don't change at all. Keys longer than 55 bytes (absent from every
# sketch input: they are int64 columns stringified) take the hashlib
# fallback element-wise.
_MD5_K = np.array(
    [int(abs(np.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_MD5_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_MD5_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)


def _md5_rounds_hash64(m: np.ndarray) -> np.ndarray:
    """(n, 16) uint32 single-block messages -> uint64 lower-half
    digests (== md5_number_lower). All round ops write into two
    preallocated scratch buffers — the naive version allocated ~6
    n-word temporaries per round (384 allocations of the working set),
    which cost more than the arithmetic."""
    m = np.ascontiguousarray(m.T)  # (16, n): contiguous per-word rows
    n = m.shape[1]
    a = np.full(n, 0x67452301, np.uint32)
    b = np.full(n, 0xEFCDAB89, np.uint32)
    c = np.full(n, 0x98BADCFE, np.uint32)
    d = np.full(n, 0x10325476, np.uint32)
    c0, d0 = c.copy(), d.copy()
    f = np.empty(n, np.uint32)
    t = np.empty(n, np.uint32)
    for i in range(64):
        if i < 16:
            np.bitwise_and(b, c, out=f)
            np.bitwise_not(b, out=t)
            np.bitwise_and(t, d, out=t)
            np.bitwise_or(f, t, out=f)
        elif i < 32:
            np.bitwise_and(d, b, out=f)
            np.bitwise_not(d, out=t)
            np.bitwise_and(t, c, out=t)
            np.bitwise_or(f, t, out=f)
        elif i < 48:
            np.bitwise_xor(b, c, out=f)
            np.bitwise_xor(f, d, out=f)
        else:
            np.bitwise_not(d, out=f)
            np.bitwise_or(b, f, out=f)
            np.bitwise_xor(c, f, out=f)
        f += a
        f += _MD5_K[i]
        f += m[_MD5_G[i]]
        s = _MD5_S[i]
        np.left_shift(f, s, out=t)
        np.right_shift(f, np.uint32(32 - s), out=f)
        np.bitwise_or(t, f, out=t)
        t += b
        a, d, c, b, t = d, c, b, t, a
    c0 += c
    d0 += d
    return c0.astype(np.uint64) | (d0.astype(np.uint64) << np.uint64(32))


def md5_hash64_vec(values, *, salt: str = "") -> np.ndarray:
    """Vectorized ``md5_hash64`` over a pyarrow string Array /
    ChunkedArray (or anything ``pa.array`` accepts). Returns a uint64
    array; element i == ``md5_hash64(values[i], salt=salt)`` exactly.
    """
    import sys

    if isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks()
    elif isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.array(list(values), pa.string())
    if arr.null_count:
        raise ValueError("md5_hash64_vec: null keys not supported")
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    if sys.byteorder != "little":  # pragma: no cover
        return np.fromiter(
            (md5_hash64(str(v), salt=salt) for v in arr.to_pylist()),
            dtype=np.uint64, count=n,
        )
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        arr = arr.cast(pa.string())
        odt = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], odt)[arr.offset : arr.offset + n + 1]
    offs = offs.astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8)
    lens = offs[1:] - offs[:-1]
    sb = salt.encode("utf-8")
    slen = len(sb)
    total_len = lens + slen

    fits = total_len <= 55
    out = np.empty(n, np.uint64)
    if not fits.all():
        idx = np.nonzero(~fits)[0]
        vals = arr.take(pa.array(idx)).to_pylist()
        for j, v in zip(idx, vals):
            out[j] = md5_hash64(v, salt=salt)

    sel = np.nonzero(fits)[0]
    if sel.size == 0:
        return out
    if fits.all():
        so, sl = offs[:-1], lens
        dst = np.arange(n)
    else:
        so, sl = offs[:-1][sel], lens[sel]
        dst = sel
    k = len(dst)
    msg = np.zeros((k, 64), np.uint8)
    if slen:
        msg[:, :slen] = np.frombuffer(sb, np.uint8)
    # fill the variable-length key region grouped BY LENGTH: each
    # group is one contiguous (rows, L) gather + block assign — far
    # cheaper than a flat scatter with per-byte index arithmetic
    for L in np.unique(sl):
        li = int(L)
        rows = np.nonzero(sl == L)[0]
        if li > 0:
            msg[rows, slen : slen + li] = data[
                so[rows][:, None] + np.arange(li)
            ]
        msg[rows, slen + li] = 0x80
    words = msg.view(np.uint32).reshape(k, 16)
    words[:, 14] = ((sl + slen) * 8).astype(np.uint32)
    out[dst] = _md5_rounds_hash64(words)
    return out


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token multiset (Charikar 2002). Vectorized:
    (n, 64) bit matrix via shifts, column sums, sign -> bits. Token hash
    is md5-derived (md5_hash64) so queries.DEDUP_SIMHASH_SQL can
    reproduce the full sketch in DuckDB."""
    if not tokens:
        return 0
    hs = np.fromiter(
        (md5_hash64(t, salt="sh|") for t in tokens), dtype=np.uint64, count=len(tokens)
    )
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
    acc = np.where(bits.astype(bool), 1, -1).sum(axis=0)
    return int(np.packbits((acc > 0)[::-1]).view(">u8")[0])


def simhash_chunks(h: int, n_chunks: int = 4) -> list[int]:
    """Split a 64-bit simhash into n 16-bit chunks. Pigeonhole: two
    hashes with hamming distance <= n_chunks-1 agree on >=1 chunk, so
    chunk-equality blocking is COMPLETE for distance <= n_chunks-1."""
    w = 64 // n_chunks
    mask = (1 << w) - 1
    return [(h >> (i * w)) & mask for i in range(n_chunks)]


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ------------------------------------------------------ rolling fingerprint

def rolling_fingerprints(text: str, window: int = 50, keep_mod: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash
    (base 257, mod 2^61-1) over a byte window, keep hashes ≡ 0
    (mod keep_mod). Deterministic, mergeable, and SQL-mirrorable
    (queries.DOC_FINGERPRINTS_SQL reproduces it in DuckDB with HUGEINT
    arithmetic): a text shorter than the window hashes as one whole-text
    polynomial kept unconditionally."""
    data = text.encode("utf-8", "ignore")
    n = len(data)
    if n == 0:
        return []
    base, mod = 257, (1 << 61) - 1
    if n <= window:
        h = 0
        for byte in data:
            h = (h * base + byte) % mod
        return [h]
    pw = pow(base, window - 1, mod)
    h = 0
    out = []
    for i, byte in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * pw) % mod
        h = (h * base + byte) % mod
        if i >= window - 1 and h % keep_mod == 0:
            out.append(h)
    return out
