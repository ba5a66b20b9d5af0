"""Join helpers: broadcast lookup vs distributed parquet-sharded join.

Policy (SURVEY.md §4 / ray_guide joins): a small mapping side is
ray.put ONCE and read inside the stage (never re-shipped per batch). A
large mapping never assembles anywhere: it is written hive-partitioned
by key-hash shard straight from the cluster, and lookup tasks lazily
read (and cache per worker) only the shards their batch's keys hash to
— memory per task is bounded by shard size (|mapping| / num_shards),
not mapping size. (An earlier middle tier built object-store shard
dicts ON THE DRIVER via iter_batches — tens of GB of driver heap at
5M-200M rows — and was removed in favor of the distributed spill.)
This avoids ``Dataset.join`` for the pointer-rewrite shape because
Arrow acero joins reject list-typed payload columns (the edges
``episodes`` provenance column) and the probe side here is wide.

``lookup_column`` picks the path by mapping ROW count and, during the
broadcast collect, by accumulated value BYTES: a mapping that is small
in rows but huge in bytes (e.g. full episode bodies) aborts the
driver-side collect mid-stream and falls back to the distributed
parquet shards instead of pushing tens of GB through one ray.put.
"""

from __future__ import annotations

import pyarrow as pa

BROADCAST_MAX_ROWS = 5_000_000
# byte cap on a broadcast mapping (keys + values), enforced DURING the
# driver-side collect: row counts say nothing about payload width
BROADCAST_MAX_BYTES = 256 * 1024 * 1024
SHARD_TARGET_ROWS = 2_000_000  # mapping rows per parquet shard
# The spill dir MUST be cluster-visible storage on a multi-node cluster
# (shared fs / object store URI) — override via GRAPHITI_RAY_SHARD_DIR;
# the single-node default is /tmp. _lookup_with_parquet_shards raises
# when the shard ROOT is not visible from a worker rather than silently
# resolving every key to None.
import os as _os

PARQUET_SHARD_DIR = _os.environ.get(
    "GRAPHITI_RAY_SHARD_DIR", "/tmp/graphiti_ray_lookup_shards"
)


class _BroadcastTooBig(Exception):
    """Raised mid-collect when a mapping exceeds BROADCAST_MAX_BYTES."""

# per-worker shard cache: (mapping_id, shard_idx) -> dict
_SHARD_CACHE: dict[tuple[str, int], dict] = {}
_SHARD_CACHE_MAX = 64

# driver-side cache of broadcast SortedKV refs: one collect+sort+put
# per (mapping dataset, key, val) per driver session (see lookup_column)
_KV_REF_CACHE: dict[tuple, object] = {}
_KV_REF_CACHE_MAX = 16

# per-worker cache of DESERIALIZED broadcast objects. ray.get() of a
# dict re-unpickles it on EVERY call once the previous reference is
# dropped — a UDF doing ray.get(ref) per batch pays
# O(batches x dict_size) deserialization (measured superlinear wall
# growth at 1.28M docs). Every broadcast consumer must fetch through
# this cache so each worker process unpickles a mapping ONCE.
_BCAST_CACHE: dict[str, object] = {}
_BCAST_CACHE_MAX = 8


def get_broadcast(ref):
    """ray.get(ref) memoized per worker process."""
    import ray

    k = ref.hex()
    v = _BCAST_CACHE.get(k)
    if v is None:
        v = ray.get(ref)
        if len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.clear()
        _BCAST_CACHE[k] = v
    return v


def fixed_width_matrix(col, width: int = 40):
    """Arrow string column -> zero-copy (n, width) uint8 view of its
    value buffer, or None when the column has nulls / varying widths.

    This is the no-Python-objects bridge between Arrow string columns
    and numpy: content-hash uuids are uniformly 40 ASCII chars, so the
    value buffer IS an (n, 40) byte matrix once offsets check uniform."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, width), np.uint8)
    if col.null_count:
        return None
    t = col.type
    if pa.types.is_string(t):
        off_dt = np.int32
    elif pa.types.is_large_string(t):
        off_dt = np.int64
    else:
        return None
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt)[col.offset : col.offset + n + 1]
    if offs[-1] - offs[0] != n * width or not (np.diff(offs) == width).all():
        return None
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data[offs[0] : offs[-1]].reshape(n, width)


def hex_matrix_to_u64(mat):
    """(n, >=16) ASCII-hex byte matrix -> uint64 of the first 16 nibbles
    (the high 64 bits of the sha1 digest); None when any char is not
    lowercase hex. Fully vectorized."""
    import numpy as np

    m = mat[:, :16]
    if m.size == 0:
        return np.empty(0, np.uint64)
    digit = (m >= 48) & (m <= 57)
    alpha = (m >= 97) & (m <= 102)
    if not (digit | alpha).all():
        return None
    nib = (m - 48 - alpha * np.uint8(39)).astype(np.uint8)
    b = (nib[:, 0::2] << np.uint8(4)) | nib[:, 1::2]
    return np.ascontiguousarray(b).view(">u8").ravel().astype(np.uint64)


def _col_u64(col, width: int = 40):
    """Arrow string column -> (u64 keys, byte matrix) or (None, None)."""
    mat = fixed_width_matrix(col, width)
    if mat is None:
        return None, None
    u = hex_matrix_to_u64(mat)
    if u is None:
        return None, None
    return u, mat


def _strings_from_matrix(mat) -> pa.Array:
    """(n, w) uint8 matrix -> Arrow StringArray, no Python objects."""
    import numpy as np

    n, w = mat.shape
    offsets = np.arange(0, (n + 1) * w, w, dtype=np.int32)
    data = np.ascontiguousarray(mat).reshape(-1)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())
    )


class U64KV:
    """Broadcastable uuid->value mapping keyed on uint64.

    Content-hash uuids are 40 lowercase-hex chars; their first 16 chars
    carry 64 uniformly-distributed bits. Keying the broadcast map on
    that uint64 instead of the 40-byte string shrinks the searchsorted
    hot array 5x (8 B vs 40 B per key) and turns every comparison in
    the O(log n) probe loop into one integer instruction instead of a
    40-byte memcmp — the exchange-phase working set was outgrowing the
    LLC and going DRAM-bandwidth-bound on S40 keys (BASELINE.md round-3
    phase analysis). EXACTNESS is preserved two ways: the constructor
    refuses (returns None) when two distinct full keys share a u64
    prefix, and every probe hit is verified against the full 40-byte
    key (kfull) before it counts — a prefix-colliding probe is a miss,
    never a wrong value.

    Values are held as an Arrow StringArray gathered with pc.take —
    zero-copy through plasma, no per-worker deserialization."""

    __slots__ = ("k", "kfull", "v")

    def __init__(self, k, kfull, v: pa.Array):
        self.k = k
        self.kfull = kfull
        self.v = v

    def __len__(self) -> int:
        return len(self.k)

    @classmethod
    def from_arrow(cls, keys: pa.Array, vals: pa.Array):
        """Build from Arrow columns; None when keys are not uniform
        40-char lowercase hex or a u64 prefix collision exists."""
        import numpy as np

        u, mat = _col_u64(keys)
        if u is None:
            return None
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        order = np.argsort(u, kind="stable")
        k = u[order]
        if len(k) > 1:
            dup = k[1:] == k[:-1]
            if dup.any():
                # distinct full keys sharing a prefix -> not representable
                kf = mat[order]
                di = np.flatnonzero(dup)
                if (kf[di] != kf[di + 1]).any():
                    return None
        kfull = np.ascontiguousarray(mat[order])
        v = vals.take(pa.array(order, pa.int64()))
        return cls(k, kfull, v)

    @classmethod
    def from_pylist(cls, keys: list, vals: list):
        if len(keys) == 0:
            return cls.empty()
        karr = pa.array(keys, pa.string())
        varr = pa.array(vals, pa.string())
        return cls.from_arrow(karr, varr)

    @classmethod
    def empty(cls):
        import numpy as np

        return cls(
            np.empty(0, np.uint64),
            np.empty((0, 40), np.uint8),
            pa.array([], pa.string()),
        )

    def _probe(self, col):
        """(clipped idx, verified found mask, probe matrix) for an Arrow
        string column; (None, None, None) when the column is not
        uniform hex40 — callers fall back to treating that as all-miss
        only when the map's key domain is exclusively hex40 (it is:
        this class only ever holds content-hash uuids)."""
        import numpy as np

        q, qmat = _col_u64(col)
        if q is None:
            return None, None, None
        if len(self.k) == 0 or len(q) == 0:
            return (
                np.zeros(len(q), np.int64),
                np.zeros(len(q), bool),
                qmat,
            )
        idx = np.searchsorted(self.k, q)
        idxc = np.minimum(idx, len(self.k) - 1)
        found = self.k[idxc] == q
        if found.any():
            sel = np.flatnonzero(found)
            ok = (self.kfull[idxc[sel]] == qmat[sel]).all(axis=1)
            if not ok.all():
                found[sel[~ok]] = False
        return idxc, found, qmat

    def rewrite_pa(self, col) -> pa.Array:
        """Vectorized map.get(k, k): mapped value where found, original
        key otherwise."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx, found, _ = self._probe(col)
        if idx is None:
            # non-uniform probe column: every non-hex40 value is a
            # guaranteed miss (keys are all hex40) -> row-wise fallback
            return self._rewrite_slow(col)
        if not found.any():
            return col
        import pyarrow.compute as pc

        vals = self.v.take(pa.array(idx, pa.int64()))
        return pc.if_else(pa.array(found), vals, col)

    def _rewrite_slow(self, col) -> pa.Array:
        vals = self.lookup_pylist(col.to_pylist(), default_identity=True)
        return pa.array(vals, pa.string())

    def lookup_pa(self, col) -> pa.Array:
        """Vectorized mapping[k]; misses become nulls."""
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx, found, _ = self._probe(col)
        if idx is None:
            vals = self.lookup_pylist(col.to_pylist())
            return pa.array(vals, pa.string())
        vals = self.v.take(pa.array(idx, pa.int64()))
        return pc.if_else(pa.array(found), vals, pa.scalar(None, self.v.type))

    def lookup_pylist(self, keys: list, default_identity: bool = False):
        import numpy as np

        if not keys:
            return []
        out: list = []
        # per-key path: split hex40 keys (vector probe) from the rest
        mats = []
        ok_rows = []
        for i, s in enumerate(keys):
            if isinstance(s, str) and len(s) == 40:
                ok_rows.append(i)
                mats.append(s)
        res = [s if default_identity else None for s in keys]
        if mats:
            col = pa.array(mats, pa.string())
            idx, found, _ = self._probe(col)
            if idx is not None and found.any():
                vals = self.v.take(pa.array(idx, pa.int64()))
                for j in np.flatnonzero(found).tolist():
                    res[ok_rows[j]] = vals[j].as_py()
        return res

    def contains_mask(self, keys):
        """Vectorized membership mask; accepts an Arrow column or list."""
        import numpy as np

        if not isinstance(keys, (pa.Array, pa.ChunkedArray)):
            if len(keys) == 0:
                return np.zeros(0, bool)
            keys = pa.array(keys, pa.string())
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        idx, found, _ = self._probe(keys)
        if idx is None:
            vals = self.lookup_pylist(keys.to_pylist())
            return np.array([v is not None for v in vals], bool)
        return found


class SortedKV:
    """A broadcastable string->string mapping stored as SORTED parallel
    numpy byte arrays instead of a Python dict.

    Why: a dict broadcast pays two O(n) costs that do NOT parallelize —
    the driver pickles the dict serially at ray.put, and every worker
    process unpickles it once (rebuilding n hash entries in Python).
    With 60-100 MB maps those two sections were the dominant fixed cost
    of the KG pipeline at >=1M docs (scaling efficiency capped ~0.56).
    numpy arrays serialize as out-of-band buffers: ray.put is one
    memcpy into the object store and ray.get restores them ZERO-COPY
    from plasma shared memory — no per-worker deserialization at all.
    Lookups are vectorized numpy searchsorted (O(b log n) per batch).

    Keys must be ASCII (they are content-hash hex uuids everywhere this
    is used); values are UTF-8-encoded bytes and decode back on output.
    """

    __slots__ = ("k", "v")

    def __init__(self, k: "np.ndarray", v: "np.ndarray"):
        self.k = k
        self.v = v

    def __len__(self) -> int:
        return len(self.k)

    @staticmethod
    def _encode(values, width_hint: int = 0) -> "np.ndarray":
        import numpy as np

        if len(values) == 0:
            return np.empty(0, dtype="S1")
        try:
            return np.asarray(values, dtype="S")
        except UnicodeEncodeError:  # non-ASCII values: encode first
            return np.asarray([s.encode("utf-8") for s in values], dtype="S")

    @classmethod
    def from_pairs(cls, keys, vals) -> "SortedKV":
        import numpy as np

        k = cls._encode(keys)
        v = cls._encode(vals)
        order = np.argsort(k, kind="stable")
        return cls(np.ascontiguousarray(k[order]), np.ascontiguousarray(v[order]))

    @classmethod
    def from_dict(cls, d: dict) -> "SortedKV":
        return cls.from_pairs(list(d.keys()), list(d.values()))

    def _indices(self, q: "np.ndarray"):
        """(clipped insertion indices, found mask) for query array q."""
        import numpy as np

        if len(self.k) == 0:
            return np.zeros(len(q), dtype=np.int64), np.zeros(len(q), dtype=bool)
        if q.dtype.itemsize != self.k.dtype.itemsize:
            # numpy compares common-width; widen the narrower side
            w = max(q.dtype.itemsize, self.k.dtype.itemsize)
            q = q.astype(f"S{w}")
        idx = np.searchsorted(self.k, q)
        idx_c = np.minimum(idx, len(self.k) - 1)
        found = self.k[idx_c] == q
        return idx_c, found

    def rewrite_pa(self, col) -> "pa.Array":
        """Vectorized a.get(k, k) over an Arrow string column: mapped
        values where found, the original key otherwise. No Python loop
        — the bytes->string conversion is one Arrow cast."""
        import numpy as np

        keys = col.to_pylist()
        if not keys:
            return pa.array([], pa.string())
        q = self._encode(keys)
        if len(self.k) == 0:
            return col if isinstance(col, pa.Array) else col.combine_chunks()
        idx, found = self._indices(q)
        out = np.where(found, self.v[idx], q)
        return pa.array(out.tolist(), type=pa.binary()).cast(pa.string())

    def lookup_pa(self, col) -> "pa.Array":
        """Vectorized mapping[k] over an Arrow string column; misses
        become nulls."""
        import numpy as np

        keys = col.to_pylist()
        if not keys:
            return pa.array([], pa.string())
        q = self._encode(keys)
        if len(self.k) == 0:
            return pa.array([None] * len(keys), pa.string())
        idx, found = self._indices(q)
        vals = pa.array(self.v[idx].tolist(), type=pa.binary()).cast(pa.string())
        import pyarrow.compute as pc

        return pc.if_else(pa.array(found), vals, pa.scalar(None, pa.string()))

    def lookup_pylist(self, keys: list, default_identity: bool = False):
        """keys -> list of values; misses map to the key itself
        (default_identity) or None. Returns a list of str|None."""
        import numpy as np

        q = self._encode(keys)
        if len(keys) == 0:
            return []
        idx, found = self._indices(q)
        if len(self.k) == 0:
            vals = [None] * len(keys)
        else:
            out = self.v[idx]
            vals = [
                b.decode("utf-8") if f else None
                for b, f in zip(out.tolist(), found.tolist())
            ]
        if default_identity:
            return [v if v is not None else k for v, k in zip(vals, keys)]
        return vals

    def contains_mask(self, keys) -> "np.ndarray":
        """Vectorized membership mask (list or Arrow column)."""
        import numpy as np

        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            keys = keys.to_pylist()
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        _, found = self._indices(self._encode(keys))
        return found


def make_kv(keys: list, vals: list):
    """U64KV when the keys are uniform hex40 uuids (the hot case for
    every alias / component / pointer map), SortedKV otherwise."""
    kv = U64KV.from_pylist(keys, vals)
    if kv is not None:
        return kv
    return SortedKV.from_pairs(keys, vals)


def kv_from_arrow(keys: pa.Array, vals: pa.Array):
    kv = U64KV.from_arrow(keys, vals)
    if kv is not None:
        return kv
    return SortedKV.from_pairs(keys.to_pylist(), vals.to_pylist())


def _iter_mapping_batches(ds, key_col: str, val_col: str, max_bytes: int | None):
    """iter_batches with a running BYTE budget: raises _BroadcastTooBig
    the moment the accumulated Arrow buffer size crosses max_bytes, so
    an oversized mapping never finishes assembling on the driver."""
    seen = 0
    for batch in ds.select_columns([key_col, val_col]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        if max_bytes is not None:
            seen += batch.nbytes
            if seen > max_bytes:
                raise _BroadcastTooBig(seen)
        yield batch


def sorted_kv_from_dataset(
    mapping_ds, key_col: str, val_col: str,
    max_bytes: int | None = None,
):
    """Collect a two-column mapping Dataset into a U64KV (hex40-uuid
    keys — the hot case) or SortedKV, WITHOUT building Python row
    objects on the driver: batches stay Arrow end-to-end and the u64
    key parse is a numpy view over the concatenated value buffer. The
    driver-side collect is part of the pipeline's serial fraction, so
    this path's constant matters for scaling efficiency."""
    kt = []
    vt = []
    for batch in _iter_mapping_batches(mapping_ds, key_col, val_col, max_bytes):
        kt.append(batch.column(key_col))
        vt.append(batch.column(val_col))
    if not kt:
        return U64KV.empty()
    keys = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in kt]
    )
    vals = pa.concat_arrays(
        [
            (c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c).cast(
                pa.string()
            )
            for c in vt
        ]
    )
    return kv_from_arrow(keys, vals)


def broadcast_map(ds, key_col: str, val_col: str,
                  max_bytes: int | None = None) -> dict:
    """Materialize a two-column mapping to a driver dict for ray.put.
    Only call when ds.count() is known-small (<= BROADCAST_MAX_ROWS)."""
    out: dict = {}
    for batch in _iter_mapping_batches(ds, key_col, val_col, max_bytes):
        out.update(zip(batch.column(key_col).to_pylist(),
                       batch.column(val_col).to_pylist()))
    return out


def _shard_of(key: str, num_shards: int) -> int:
    from ..functions.hashing import stable_int

    return stable_int(str(key), salt="jshard") % num_shards


def lookup_column(
    target_ds,
    on: str,
    mapping_ds,
    key_col: str,
    val_col: str,
    out_col: str,
    mapping_rows: int | None = None,
    val_type: pa.DataType | None = None,
):
    """Append ``out_col`` = mapping[on] to target_ds (None on miss).

    Whole-map broadcast when small in BOTH rows and bytes; distributed
    parquet shards otherwise. ``val_type``: Arrow type of the appended
    column (default: the mapping's value-column type, so non-string
    payloads — e.g. shingle lists — survive the lookup)."""
    import ray

    if val_type is None:
        sch = mapping_ds.schema()
        base = getattr(sch, "base_schema", sch)  # ray Schema -> pa.Schema
        if hasattr(base, "field"):
            val_type = base.field(val_col).type
        else:  # pandas-block schema: no Arrow types — historic default
            val_type = pa.string()

    n = mapping_rows if mapping_rows is not None else mapping_ds.count()
    if n == 0:
        # empty mapping (e.g. a KG built from a corpus the extractor
        # found nothing in): every key misses -> all-null column.
        # to_pandas() of an empty Dataset has no columns at all, so the
        # tiers below would KeyError instead of resolving to None.
        miss_t = val_type if val_type is not None else pa.string()

        def f_empty(t: pa.Table) -> pa.Table:
            return t.append_column(out_col, pa.nulls(t.num_rows, miss_t))

        return target_ds.map_batches(f_empty, batch_format="pyarrow")
    if n <= BROADCAST_MAX_ROWS:
        try:
            if pa.types.is_string(val_type) or pa.types.is_large_string(val_type):
                # zero-copy broadcast + vectorized searchsorted lookup (no
                # driver dict build, no per-worker unpickle — see SortedKV).
                # The driver-side collect+sort+put is O(mapping) SERIAL work,
                # so the resulting ref is cached per (dataset, key, val):
                # build_triples and the query layer look the same nodes
                # mapping up 2-4x per run — without the cache each repeat
                # re-pulls the whole table through the driver.
                ck = (
                    getattr(mapping_ds, "_uuid", None) or id(mapping_ds),
                    key_col, val_col,
                )
                ref = _KV_REF_CACHE.get(ck)
                if ref is None:
                    kv = sorted_kv_from_dataset(
                        mapping_ds, key_col, val_col,
                        max_bytes=BROADCAST_MAX_BYTES,
                    )
                    ref = ray.put(kv)
                    if len(_KV_REF_CACHE) >= _KV_REF_CACHE_MAX:
                        _KV_REF_CACHE.clear()
                    _KV_REF_CACHE[ck] = ref

                def f(t: pa.Table) -> pa.Table:
                    mm = get_broadcast(ref)
                    vals = mm.lookup_pa(t.column(on)).cast(val_type)
                    return t.append_column(out_col, vals)

                return target_ds.map_batches(f, batch_format="pyarrow")

            m = broadcast_map(mapping_ds, key_col, val_col,
                              max_bytes=BROADCAST_MAX_BYTES)
            ref = ray.put(m)

            def f(t: pa.Table) -> pa.Table:
                mm = get_broadcast(ref)
                vals = [mm.get(k) for k in t.column(on).to_pylist()]
                return t.append_column(out_col, pa.array(vals, val_type))

            return target_ds.map_batches(f, batch_format="pyarrow")
        except _BroadcastTooBig:
            pass  # rows said broadcast, bytes said otherwise -> shards

    # large tier: the mapping never assembles anywhere — it's written
    # hive-partitioned by shard straight from the cluster, and lookup
    # tasks lazily read (and cache) only the shard files their keys hit
    num_shards = max(16, n // SHARD_TARGET_ROWS)
    shard_dir = _write_parquet_shards(mapping_ds, key_col, val_col, num_shards)

    def h(t: pa.Table) -> pa.Table:
        vals = _lookup_with_parquet_shards(
            shard_dir, num_shards, t.column(on).to_pylist()
        )
        return t.append_column(out_col, pa.array(vals, val_type))

    return target_ds.map_batches(h, batch_format="pyarrow")


def _write_parquet_shards(mapping_ds, key_col: str, val_col: str, num_shards: int) -> str:
    """Distributed shard spill: mapping -> hive parquet by shard id.
    No single process ever holds the whole mapping."""
    import os
    import uuid

    shard_dir = os.path.join(PARQUET_SHARD_DIR, uuid.uuid4().hex)

    def add_shard(t: pa.Table) -> pa.Table:
        ks = t.column(key_col).to_pylist()
        t = pa.table({"__k": t.column(key_col), "__v": t.column(val_col)})
        return t.append_column(
            "__shard", pa.array([_shard_of(k, num_shards) for k in ks], pa.int32())
        )

    mapping_ds.select_columns([key_col, val_col]).map_batches(
        add_shard, batch_format="pyarrow"
    ).write_parquet(shard_dir, partition_cols=["__shard"])
    return shard_dir


def _lookup_with_parquet_shards(shard_dir: str, num_shards: int, keys: list):
    import os

    import pyarrow.parquet as pq

    out = []
    for k in keys:
        si = _shard_of(k, num_shards)
        ck = (shard_dir, si)
        shard = _SHARD_CACHE.get(ck)
        if shard is None:
            if not os.path.isdir(shard_dir):
                # the shard ROOT must be visible from every worker; a
                # missing root means the spill landed on storage this
                # node cannot see (e.g. another node's /tmp) — failing
                # loudly beats silently resolving every key to None.
                raise FileNotFoundError(
                    f"lookup shard root {shard_dir!r} is not visible from this "
                    "worker; set GRAPHITI_RAY_SHARD_DIR to cluster-visible "
                    "storage (shared filesystem or object-store URI)"
                )
            path = os.path.join(shard_dir, f"__shard={si}")
            if os.path.isdir(path):
                t = pq.read_table(path, columns=["__k", "__v"])
                shard = dict(zip(t.column("__k").to_pylist(), t.column("__v").to_pylist()))
            else:
                shard = {}  # root visible, this shard genuinely empty
            if len(_SHARD_CACHE) >= _SHARD_CACHE_MAX:
                _SHARD_CACHE.clear()
            _SHARD_CACHE[ck] = shard
        out.append(shard.get(k))
    return out
