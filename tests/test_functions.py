"""Unit tests for pure leaf functions (SURVEY.md §5a: sanitizers,
normalizers, hashing, embeddings)."""

import numpy as np

from graphiti_ray.functions.dates import ensure_utc_naive, parse_iso_utc
from graphiti_ray.functions.embed import hash_embed_texts, normalize_l2
from graphiti_ray.functions.hashing import (
    char_shingles,
    hamming64,
    lsh_band_keys,
    minhash_params,
    minhash_signature,
    node_uuid,
    rolling_fingerprints,
    sha1_hex,
    simhash64,
    stable_int,
)
from graphiti_ray.functions.text import (
    html_to_text,
    lucene_sanitize,
    normalize_name,
    sanitize,
)


def test_sha1_deterministic_and_distinct():
    assert sha1_hex("a", "b") == sha1_hex("a", "b")
    # separator prevents ("ab","") colliding with ("a","b")
    assert sha1_hex("ab", "") != sha1_hex("a", "b")


def test_node_uuid_collides_for_same_norm():
    assert node_uuid("g", "ana barton") == node_uuid("g", "ana barton")
    assert node_uuid("g", "ana barton") != node_uuid("h", "ana barton")


def test_sanitize_strips_control_keeps_whitespace():
    # semantics of llm_client/client.py:63-83
    assert sanitize("a\x00b\x07c") == "abc"
    assert sanitize("a\nb\tc\r") == "a\nb\tc\r"
    assert sanitize("a​b") == "ab"


def test_lucene_sanitize():
    # escaping pinned by reference tests/helpers_test.py:22-34
    assert lucene_sanitize("a+b") == "a\\+b"
    assert lucene_sanitize('q"x"') == 'q\\"x\\"'
    assert lucene_sanitize("plain") == "plain"


def test_normalize_name():
    assert normalize_name("  Ana   Barton ") == "ana barton"
    assert normalize_name("A. Barton") == "a barton"
    assert normalize_name("O'Neil-Smith") == "oneilsmith"


def test_html_to_text_byte_identical_and_fallback():
    html = b"<html><head><title>t</title></head><body><p>One.</p><p>Two &amp; three.</p></body></html>"
    assert html_to_text(html, None) == "One.\nTwo & three."
    assert html_to_text(None, "fallback text") == "fallback text"
    assert html_to_text(html, "ignored") == html_to_text(html, None)


def test_dates():
    from datetime import datetime, timezone

    aware = datetime(2024, 1, 1, 12, tzinfo=timezone.utc)
    assert ensure_utc_naive(aware) == datetime(2024, 1, 1, 12)
    assert parse_iso_utc("2024-01-01T12:00:00Z") == datetime(2024, 1, 1, 12)
    assert parse_iso_utc("garbage") is None


def test_normalize_l2():
    v = np.array([3.0, 4.0])
    assert np.allclose(normalize_l2(v), [0.6, 0.8])
    m = np.array([[3.0, 4.0], [0.0, 0.0]])
    out = normalize_l2(m)
    assert np.allclose(out[0], [0.6, 0.8]) and np.allclose(out[1], 0)


def test_hash_embeddings_similarity_ordering():
    e = hash_embed_texts(["Ana Barton", "A. Barton", "Quantix Corp"])
    sim_alias = float(e[0] @ e[1])
    sim_diff = float(e[0] @ e[2])
    assert sim_alias > sim_diff
    assert np.allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)


def test_minhash_lsh_candidates():
    a, b = minhash_params(16)
    s1 = minhash_signature(char_shingles("ana barton"), a, b)
    s2 = minhash_signature(char_shingles("anna barton"), a, b)
    s3 = minhash_signature(char_shingles("quantix corp"), a, b)
    k1, k2, k3 = (set(lsh_band_keys(s, 8, 2)) for s in (s1, s2, s3))
    assert k1 & k2  # near-dup shares a band
    assert not (k1 & k3)


def test_simhash_and_fingerprints():
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = "the quick brown fox jumps over the lazy cat " * 5
    h1, h2 = simhash64(t1.split()), simhash64(t2.split())
    h3 = simhash64("completely different words entirely".split())
    assert hamming64(h1, h2) < hamming64(h1, h3)
    f1 = rolling_fingerprints(t1)
    assert f1 and f1 == rolling_fingerprints(t1)
    assert stable_int("x") == stable_int("x")


def test_compress_uuid_map_chain(ray_session):
    """D8: a->b->c chains compress to terminal canonical
    (bulk_utils.py:352-361 semantics)."""
    import pandas as pd
    import ray.data as rd

    from graphiti_ray.stages.cc import compress_uuid_map_ds

    m = rd.from_pandas(
        pd.DataFrame(
            {"old_uuid": ["a", "b", "x"], "canonical_uuid": ["b", "c", "y"]}
        )
    )
    out = compress_uuid_map_ds(m).to_pandas().set_index("old_uuid")["canonical_uuid"]
    assert out["a"] == "c"
    assert out["b"] == "c"
    assert out["x"] == "y"


def test_entity_classification():
    from graphiti_ray.functions.classify import attributes_json, classify, labels_of

    assert classify("Zorex Corp") == ("Organization", {"suffix": "corp"})
    assert classify("Ana Barton")[0] == "Person"
    assert classify("A. Barton") == ("Person", {"first": "A", "last": "Barton"})
    assert classify("Dorville") == ("Entity", {})
    assert labels_of("Zorex Corp") == ["Entity", "Organization"]
    assert attributes_json("Ana Barton") == '{"first": "Ana", "last": "Barton"}'
