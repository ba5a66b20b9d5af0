"""Hyperlink (host-level link-graph) extraction — the web-graph side
of a crawl pipeline: pull every ``href`` out of each page's html,
canonicalize the targets (ops/urls rules), and aggregate a host→host
edge list with link counts. The host link graph feeds host-level
PageRank / spam detection (ops/graph.pagerank runs on exactly this
shape) and frontier scheduling.

HTML synthesis (deterministic, no external data): the page corpus's
doc-derived html (sources/pages.py) carries no anchors, so link-bearing
html is derived arithmetically from doc_id: ``doc_id % 3`` absolute
links per page — each to target page ``(doc_id*7 + j*31) % 200`` in one
of three surface forms (clean / trailing-slash+fragment / http+www+utm)
that all canonicalize to the same target — plus one relative ``/nav``
link that extraction must ignore. Variant forms force the aggregation
through canonicalization: counting raw hrefs would overcount hosts.

Scale shape: extraction + canonicalization is one streaming pass
(pandas C-regex findall + explode, the vectorized-regex rule of
ops/pii.py); per-block partial (src,dst) counts make the final groupby
edge-set-sized, not link-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .io import read_documents
from .urls import canonicalize, canonicalize_sql

_HREF_RE = r'href="([^"]+)"'


def _synth_html(df: pd.DataFrame) -> pd.Series:
    d = df["doc_id"]
    body = pd.Series("<html><body><p>page</p>", index=df.index)
    for j in range(2):  # up to 2 absolute links (doc_id % 3 of them)
        q = (d * 7 + j * 31) % 200
        tgt = "site" + (q % 50).astype(str) + ".example/doc" + q.astype(str)
        v = ((d + j) % 3).to_numpy()
        href = pd.Series("https://" + tgt, index=df.index)
        href[v == 1] = "https://" + tgt + "/#sec"
        href[v == 2] = "http://www." + tgt + "?utm_x=1"
        text = "topic" + (q % 7).astype(str) + " doc" + q.astype(str)
        anchor = '<a href="' + href + '">' + text + "</a>"
        body = body + anchor.where((d % 3).to_numpy() > j, "")
    return body + '<a href="/nav">nav</a></body></html>'


def _partial_edges(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    html = _synth_html(df)
    src = "site" + ((df["doc_id"] // 3) % 50).astype(str) + ".example"
    hrefs = html.str.findall(_HREF_RE)
    e = hrefs.explode().dropna()
    e = e[e.str.startswith("http")]  # relative links are not edges
    if not len(e):
        return pa.table(
            {
                "src_host": pa.array([], pa.string()),
                "dst_host": pa.array([], pa.string()),
                "n_links": pa.array([], pa.int64()),
            }
        )
    dst = (
        canonicalize(e)
        .str.extract(r"^https://([^/?]*)", expand=False)
        .rename("dst_host")
    )
    g = (
        pd.DataFrame(
            {"src_host": src.loc[dst.index].to_numpy(), "dst_host": dst.to_numpy()}
        )
        .groupby(["src_host", "dst_host"], sort=False)
        .size()
        .rename("n_links")
        .reset_index()
    )
    g["n_links"] = g["n_links"].astype(np.int64)
    return pa.Table.from_pandas(g, preserve_index=False)


def link_graph(sf_dir: str):
    """(src_host, dst_host, n_links) — the canonical host-level link
    graph of the crawl."""
    return (
        read_documents(sf_dir, ["doc_id"])
        .map_batches(_partial_edges, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .sum("n_links")
        .map_batches(
            lambda t: t.rename_columns(["src_host", "dst_host", "n_links"]),
            batch_format="pyarrow",
        )
    )


_ANCHOR_RE = r'<a href="([^"]+)">([^<]+)</a>'


def _partial_anchor_terms(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    html = _synth_html(df)
    m = html.str.extractall(_ANCHOR_RE)
    m = m[m[0].str.startswith("http")].reset_index(drop=True)
    if not len(m):
        return pa.table(
            {
                "dst_host": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "n_links": pa.array([], pa.int64()),
            }
        )
    dst = (
        canonicalize(m[0])
        .str.extract(r"^https://([^/?]*)", expand=False)
        .rename("dst_host")
    )
    ex = pd.DataFrame(
        {"dst_host": dst.to_numpy(), "term": m[1].str.split(" ").to_numpy()}
    ).explode("term")
    g = (
        ex.groupby(["dst_host", "term"], sort=False)
        .size()
        .rename("n_links")
        .reset_index()
    )
    g["n_links"] = g["n_links"].astype(np.int64)
    return pa.Table.from_pandas(g, preserve_index=False)


def anchor_terms(sf_dir: str):
    """(dst_host, term, n_links) — anchor-text term counts aggregated
    per TARGET host, the classic link-text-as-document-signal stage
    (anchor text describes the target better than the target's own
    page; every large-scale search/retrieval corpus aggregates it).
    One streaming extract pass (C-regex extractall over the html, the
    href AND its anchor text together), canonicalized targets, per-
    block partial counts, then ONE (host, term)-sized groupby — the
    exchange carries the vocabulary-sized partial table, never the
    link-sized raw stream."""
    return (
        read_documents(sf_dir, ["doc_id"])
        .map_batches(_partial_anchor_terms, batch_format="pyarrow")
        .groupby(["dst_host", "term"])
        .sum("n_links")
        .map_batches(
            lambda t: t.rename_columns(["dst_host", "term", "n_links"]),
            batch_format="pyarrow",
        )
    )


# Mirrors the data GENERATION arithmetically (link j of doc d targets
# page q = (d*7 + j*31) % 200 with anchor text "topic{q%7} doc{q}");
# the Ray side must recover exactly this by parsing the html.
ANCHOR_TERMS_SQL = """WITH q AS (
  SELECT (doc_id * 7) % 200 AS q FROM documents WHERE doc_id % 3 > 0
  UNION ALL
  SELECT (doc_id * 7 + 31) % 200 FROM documents WHERE doc_id % 3 > 1
), t AS (
  SELECT 'site' || (q % 50)::VARCHAR || '.example' AS dst_host,
         unnest(['topic' || (q % 7)::VARCHAR,
                 'doc' || q::VARCHAR]) AS term
  FROM q
)
SELECT dst_host, term, COUNT(*)::BIGINT AS n_links
FROM t GROUP BY dst_host, term"""


def host_pagerank(sf_dir: str):
    """(group_id, name, pr_e9) — PageRank over the canonical host link
    graph (ops/graph.pagerank contract: single 'web' group; integer-e9
    ranks so the compare is float-free). The web use: host authority
    for crawl-frontier prioritization and spam demotion."""
    from .graph import pagerank

    lg = link_graph(sf_dir).materialize()

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "group_id": pa.array(["web"] * n, pa.string()),
                "subj": t.column("src_host"),
                "obj": t.column("dst_host"),
            }
        )

    def node_rows(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "group_id": pa.array(["web"] * t.num_rows, pa.string()),
                    "name": t.column(col),
                }
            )

        return f

    edges = lg.map_batches(edge_rows, batch_format="pyarrow")
    nodes = lg.map_batches(
        node_rows("src_host"), batch_format="pyarrow"
    ).union(lg.map_batches(node_rows("dst_host"), batch_format="pyarrow"))
    return pagerank(nodes, edges)


_LINKS_REL = """SELECT src_host, url FROM (
  SELECT 'site' || ((doc_id // 3) % 50)::VARCHAR || '.example' AS src_host,
         unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
  FROM (
    SELECT doc_id,
           '<html><body><p>page</p>' ||
           CASE WHEN doc_id % 3 > 0 THEN
             '<a href="' ||
             CASE (doc_id + 0) % 3
               WHEN 1 THEN 'https://' || t0 || '/#sec'
               WHEN 2 THEN 'http://www.' || t0 || '?utm_x=1'
               ELSE 'https://' || t0
             END || '">topic' || (q0 % 7)::VARCHAR || ' doc' ||
             q0::VARCHAR || '</a>'
           ELSE '' END ||
           CASE WHEN doc_id % 3 > 1 THEN
             '<a href="' ||
             CASE (doc_id + 1) % 3
               WHEN 1 THEN 'https://' || t1 || '/#sec'
               WHEN 2 THEN 'http://www.' || t1 || '?utm_x=1'
               ELSE 'https://' || t1
             END || '">topic' || (q1 % 7)::VARCHAR || ' doc' ||
             q1::VARCHAR || '</a>'
           ELSE '' END ||
           '<a href="/nav">nav</a></body></html>' AS html
    FROM (
      SELECT doc_id,
             (doc_id * 7) % 200 AS q0,
             (doc_id * 7 + 31) % 200 AS q1,
             'site' || (((doc_id * 7) % 200) % 50)::VARCHAR ||
             '.example/doc' || ((doc_id * 7) % 200)::VARCHAR AS t0,
             'site' || (((doc_id * 7 + 31) % 200) % 50)::VARCHAR ||
             '.example/doc' || ((doc_id * 7 + 31) % 200)::VARCHAR AS t1
      FROM documents
    )
  )
) WHERE starts_with(url, 'http')"""

LINK_GRAPH_SQL = f"""WITH canon AS (
{canonicalize_sql(_LINKS_REL, ["src_host"])}
)
SELECT src_host,
       regexp_extract(canonical_url, '^https://([^/?]*)', 1) AS dst_host,
       COUNT(*)::BIGINT AS n_links
FROM canon GROUP BY src_host, dst_host"""


def _host_pagerank_sql() -> str:
    from .graph import pagerank_sql_over

    body = pagerank_sql_over(
        "SELECT DISTINCT 'web' AS grp, h AS name FROM ("
        "SELECT src_host AS h FROM lg UNION ALL SELECT dst_host FROM lg)",
        "SELECT DISTINCT 'web' AS grp, src_host AS subj, dst_host AS obj"
        " FROM lg",
    )
    return f"""WITH canon AS (
{canonicalize_sql(_LINKS_REL, ["src_host"])}
),
lg AS (
  SELECT src_host,
         regexp_extract(canonical_url, '^https://([^/?]*)', 1) AS dst_host
  FROM canon
){body}"""


HOST_PAGERANK_SQL = _host_pagerank_sql()
