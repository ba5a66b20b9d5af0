"""The vectorized single-block MD5 must be bit-identical to
hashlib/DuckDB md5 — it feeds every sketch oracle (HLL, CMS, Bloom,
sampling, mixture, negatives, walks), so a single differing bit is a
driver hash mismatch."""

import random
import string

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from graphiti_ray.functions.hashing import md5_hash64, md5_hash64_vec


def test_exact_parity_boundaries_and_unicode():
    keys = [
        "", "a", "0", "-1", str(2**63 - 1),
        "x" * 51, "x" * 52, "x" * 55, "x" * 56, "x" * 200,  # block edge
        "héllo wörld", "日本語テキスト", "\x00\x01\x1f",
    ]
    for salt in ("", "hll|", "cms|", "bloom|", "samp|", "walk|"):
        got = md5_hash64_vec(pa.array(keys, pa.string()), salt=salt)
        ref = np.array(
            [md5_hash64(k, salt=salt) for k in keys], np.uint64
        )
        assert (got == ref).all(), salt


def test_parity_with_duckdb_md5_number_lower():
    keys = [str(i * 7919) for i in range(500)] + ["abc", "日本", ""]
    got = md5_hash64_vec(pa.array(keys, pa.string()), salt="hll|")
    con = duckdb.connect()
    ref = con.execute(
        "SELECT md5_number_lower('hll|' || k) FROM "
        "(SELECT unnest(?) AS k)",
        [keys],
    ).fetchnumpy()
    con.close()
    ref_arr = next(iter(ref.values())).astype(np.uint64)
    assert (got == ref_arr).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.text(max_size=70), max_size=40),
    st.sampled_from(["", "sh|", "verylongsaltprefix|"]),
)
def test_parity_property(keys, salt):
    got = md5_hash64_vec(pa.array(keys, pa.string()), salt=salt)
    ref = np.array(
        [md5_hash64(k, salt=salt) for k in keys], np.uint64
    )
    assert got.shape == ref.shape and (got == ref).all()


def test_array_flavors():
    random.seed(5)
    keys = [
        "".join(random.choices(string.printable, k=random.randint(0, 60)))
        for _ in range(800)
    ]
    ref = np.array([md5_hash64(k, salt="s|") for k in keys], np.uint64)
    chunked = pa.chunked_array(
        [pa.array(keys[:300], pa.large_string()),
         pa.array(keys[300:], pa.large_string())]
    )
    assert (md5_hash64_vec(chunked, salt="s|") == ref).all()
    sliced = pa.array(keys, pa.string()).slice(100, 400)
    assert (
        md5_hash64_vec(sliced, salt="s|") == ref[100:500]
    ).all()
    assert (md5_hash64_vec(iter(keys), salt="s|") == ref).all()
    assert md5_hash64_vec(pa.array([], pa.string())).shape == (0,)
