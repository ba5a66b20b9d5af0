"""String functions: html->text extraction, sanitizers, normalizers.

Parity targets:
- input sanitizer: strip invalid unicode / control chars, keep \\n \\r \\t
  (graphiti_core/llm_client/client.py:63-83)
- Lucene special-char escaping (graphiti_core/helpers.py:39-73, pinned by
  tests/helpers_test.py:22-34)
- newline flattening before embedding (nodes.py:264, edges.py:202)

The html->text extractor is PURE and version-pinned: the engine-wide
invariant (BASELINE.json input_hint) is byte-identical extracted text per
url across retries/reruns.
"""

from __future__ import annotations

import html as _htmlmod
import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BLOCK_RE = re.compile(rb"<(?:p|h[1-6]|li)\b[^>]*>(.*?)</(?:p|h[1-6]|li)>", re.S)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"[ \t]+")
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f​‌‍﻿]")

LUCENE_SPECIAL = r'+-&|!(){}[]^"~*?:\/'


def html_to_text(html_bytes: bytes | None, fallback_text: str | None) -> str:
    """Deterministic tag-stripping extractor.

    Extracts the text of block-level elements (<p>, <h*>, <li>) in
    document order, one per line; drops the <title>. Falls back to the
    `text` column when `html` is null (text-only pages). Pure function of
    its inputs -> byte-identical per url across Ray task retries.
    """
    if html_bytes is None:
        return fallback_text or ""
    lines = []
    for raw in _BLOCK_RE.findall(html_bytes):
        inner = _TAG_RE.sub(b"", raw).decode("utf-8", "replace")
        lines.append(_htmlmod.unescape(inner))
    return "\n".join(lines)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: pages(html, text) -> content column appended."""
    html_col = batch.column("html").to_pylist()
    text_col = batch.column("text").to_pylist()
    content = [html_to_text(h, t) for h, t in zip(html_col, text_col)]
    return batch.append_column("content", pa.array(content, type=pa.string()))


def sanitize(s: str) -> str:
    """Strip control / zero-width / invalid chars, keep \\n \\r \\t.

    Semantics of llm_client/client.py:63-83 (clean_input): removes
    unprintable control characters and unicode junk without touching
    normal whitespace.
    """
    if not s:
        return ""
    s = _CTRL_RE.sub("", s)
    return "".join(c for c in s if unicodedata.category(c) != "Cs")


def lucene_sanitize(q: str) -> str:
    """Escape Lucene special characters (helpers.py:39-73)."""
    out = []
    for c in q:
        if c in LUCENE_SPECIAL:
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


def flatten_newlines(s: str) -> str:
    """name.replace('\\n', ' ') before embedding (nodes.py:264)."""
    return s.replace("\n", " ")


def normalize_name(name: str) -> str:
    """Canonical entity-name normalization used for identity hashing:
    casefold, strip punctuation except intra-word, collapse whitespace."""
    s = name.strip().casefold()
    s = re.sub(r"[^\w\s.]", "", s)
    s = re.sub(r"\.(?=\s|$)", "", s)  # drop trailing dots of initials
    s = _WS_RE.sub(" ", s)
    return s.strip()


def normalize_fact(fact: str) -> str:
    s = fact.strip().casefold()
    s = re.sub(r"[^\w\s]", "", s)
    return _WS_RE.sub(" ", s).strip()


# Vectorized helpers for hot map_batches stages -----------------------------

def lower_strip_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.utf8_trim_whitespace(pc.utf8_lower(arr))


def whitespace_token_counts(arr) -> np.ndarray:
    """Vectorized whitespace token count per string (pyarrow kernel)."""
    counts = pc.list_value_length(pc.utf8_split_whitespace(arr))
    return counts.to_numpy(zero_copy_only=False)
