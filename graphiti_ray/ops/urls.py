"""URL canonicalization + URL-key dedup — the crawl-corpus front-door
dedup step (CCNet/RefinedWeb-style): before any content hashing, a
crawl is deduplicated on the *canonical form* of its URLs, because the
same page is fetched under www./mobile hosts, default ports, tracking
query params, fragments and trailing slashes.

Canonicalization rules (applied in order, all vectorized, identical
regexes on both the engine [pandas/RE2-compatible] and oracle
[DuckDB/RE2] sides):

1. fragment stripped (``#...``)
2. scheme lowercased and unified ``http -> https``
3. host lowercased; leading ``www.`` / ``m.`` stripped; default ports
   ``:80`` / ``:443`` removed
4. ``utm_*`` query params dropped; remaining params sorted by name;
   an empty query drops its ``?``
5. trailing slashes stripped from the path (root path becomes empty)

Input synthesis: the documents table has no URL column, so messy URL
variants are derived deterministically from ``doc_id`` (every 3
consecutive docs share a logical page; the variant form cycles through
the five mess classes plus one clean form). The synthesis is part of
the test fixture; ``canonicalize`` itself is a generic (Dataset,
column) operator.

Scale shape: canonicalization is a pure streaming map (regex +
explode/sort/rejoin for params — no Python row loop); dedup is the
ops/dedup.exact_dedup shape — map-side partial (min doc_id, count) per
canonical URL per block, then ONE vocab-sized groupby. No join-back,
no full-corpus rematerialization.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .io import read_documents


def _synth_urls(df: pd.DataFrame) -> pd.Series:
    d = df["doc_id"]
    p = d // 3  # logical page id: 3 consecutive docs -> same page
    h = p % 50  # host derived from the PAGE so variants collide
    base = "site" + h.astype(str) + ".example"
    doc = "/doc" + p.astype(str)
    v = (d % 6).to_numpy()
    out = pd.Series("https://" + base + doc, index=df.index)
    out[v == 1] = "HTTPS://WWW." + base.str.upper() + doc + "/"
    out[v == 2] = "http://" + base + ":80" + doc + "?utm_source=feed"
    out[v == 3] = "https://" + base + ":443" + doc + "#frag"
    out[v == 4] = "https://" + base + doc + "?b=2&utm_campaign=x&a=1"
    out[v == 5] = "https://m." + base + doc
    return out


def canonicalize(urls: pd.Series) -> pd.Series:
    """Vectorized URL canonicalization per the module rules."""
    u = urls.str.replace(r"#.*$", "", regex=True).str.replace(
        r"(?i)^https?://", "https://", regex=True
    )
    m = u.str.extract(r"^https://([^/?]*)([^?]*)(?:\?(.*))?$")
    host = (
        m[0]
        .str.lower()
        .str.replace(r"^(www\.|m\.)", "", regex=True)
        .str.replace(r":(80|443)$", "", regex=True)
    )
    path = m[1].str.replace(r"/+$", "", regex=True)
    query = m[2].fillna("")
    ex = query.str.split("&").explode()
    ex = ex[(ex != "") & ~ex.str.startswith("utm_")]
    q = (
        ex.reset_index(name="p")
        .sort_values(["index", "p"])
        .groupby("index")["p"]
        .agg("&".join)
        .reindex(urls.index)
        .fillna("")
    )
    return "https://" + host + path + ("?" + q).where(q != "", "")


def _canon_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    url = _synth_urls(df)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "url": pa.array(url.to_numpy(), pa.string()),
            "canonical_url": pa.array(
                canonicalize(url).to_numpy(), pa.string()
            ),
        }
    )


def url_canonical(sf_dir: str):
    """(doc_id, url, canonical_url) — the per-doc canonical mapping."""
    return read_documents(sf_dir, ["doc_id"]).map_batches(
        _canon_batch, batch_format="pyarrow"
    )


def url_dedup(sf_dir: str):
    """(canonical_url, canonical_doc_id, n_dups): keep-first dedup on
    the canonical URL (min doc_id wins), exact_dedup shape — partial
    min/count per block, one key-sized groupby."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = _canon_batch(batch)
        g = t.group_by("canonical_url").aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        return g.rename_columns(
            ["canonical_url", "canonical_doc_id", "n_dups"]
        )

    ds = read_documents(sf_dir, ["doc_id"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return ds.groupby("canonical_url").aggregate(
        Min("canonical_doc_id", alias_name="canonical_doc_id"),
        Sum("n_dups", alias_name="n_dups"),
    )


def canonicalize_sql(rel: str, keys: list[str]) -> str:
    """SQL mirror of ``canonicalize``: canonicalizes column ``url`` of
    relation ``rel`` (carrying ``keys`` through) into
    ``canonical_url``. Shared by the URL and link-graph oracles so both
    stay rule-for-rule identical to the engine."""
    k = ", ".join(keys)
    return f"""SELECT {k}, 'https://' || host || path ||
       CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url
FROM (
  SELECT {k}, host, path,
         array_to_string(list_sort(list_filter(
             string_split(query, '&'),
             x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS q
  FROM (
    SELECT {k},
           regexp_replace(regexp_replace(
               lower(regexp_extract(u, '^https://([^/?]*)', 1)),
               '^(www\\.|m\\.)', ''), ':(80|443)$', '') AS host,
           regexp_replace(
               regexp_extract(u, '^https://[^/?]*([^?]*)', 1),
               '/+$', '') AS path,
           regexp_extract(u, '\\?(.*)$', 1) AS query
    FROM (
      SELECT {k},
             regexp_replace(regexp_replace(url, '#.*$', ''),
                            '(?i)^https?://', 'https://') AS u
      FROM ({rel})
    )
  )
)"""


_SYNTH_SQL = """raw AS (
  SELECT doc_id,
         'site' || ((doc_id // 3) % 50)::VARCHAR || '.example' AS b,
         '/doc' || (doc_id // 3)::VARCHAR AS dd,
         doc_id % 6 AS v
  FROM documents
),
urls AS (
  SELECT doc_id,
         CASE v
           WHEN 1 THEN 'HTTPS://WWW.' || upper(b) || dd || '/'
           WHEN 2 THEN 'http://' || b || ':80' || dd || '?utm_source=feed'
           WHEN 3 THEN 'https://' || b || ':443' || dd || '#frag'
           WHEN 4 THEN 'https://' || b || dd || '?b=2&utm_campaign=x&a=1'
           WHEN 5 THEN 'https://m.' || b || dd
           ELSE 'https://' || b || dd
         END AS url
  FROM raw
)"""

_CANON_SQL = (
    _SYNTH_SQL
    + ",\ncanon AS (\n"
    + canonicalize_sql("SELECT doc_id, url FROM urls", ["doc_id", "url"])
    + "\n)"
)

URL_CANONICAL_SQL = f"""WITH {_CANON_SQL}
SELECT doc_id, url, canonical_url FROM canon"""

URL_DEDUP_SQL = f"""WITH {_CANON_SQL}
SELECT canonical_url,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*)::BIGINT AS n_dups
FROM canon GROUP BY canonical_url"""
