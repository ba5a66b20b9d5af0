"""Crawl-frontier prioritization — the scheduling decision a recurring
crawl makes from exactly the signals this repo already computes: a
host is worth re-crawling in proportion to its AUTHORITY (host-level
PageRank over the link graph, ops/links.host_pagerank) times its
observed CHANGE RATE (fraction of its pages whose content was new in
the last snapshot, ops/snapshot.snapshot_delta). This is the classic
frequency/importance crawl policy (Cho & Garcia-Molina 2000,
"Synchronizing a database to improve freshness" — refresh effort
allocated by importance × change rate).

Integer semantics (hash-exact on both engines):
``staleness_milli = (1000 * n_changed) // n_pages`` and
``priority = pr_e9 * staleness_milli`` — pr_e9 ≤ 1e9 and
staleness_milli ≤ 1000, so priority fits int64 with 6 orders of
margin.

Scale shape: the two corpus-sized inputs (page counts, delta rows)
each shrink through per-block partial counts to HOST-sized partials;
the PageRank table is already host-sized. All three meet in ONE
host-keyed groupby-sum over a union of tagged partial rows — no
broadcast, no driver collect, no lookup join; the only exchange
payload is O(hosts). At web scale hosts ~1e8 rows of 4 ints — still a
groupby, never a collect.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .io import read_documents
from .links import HOST_PAGERANK_SQL, host_pagerank
from .snapshot import _NEW_ID_BASE, SNAPSHOT_DELTA_SQL, snapshot_delta


def _tagged(host_arr, pr=None, pages=None, changed=None) -> pa.Table:
    n = len(host_arr)
    z = np.zeros(n, np.int64)
    return pa.table(
        {
            "host": host_arr,
            "pr": pa.array(z if pr is None else pr, pa.int64()),
            "pages": pa.array(z if pages is None else pages, pa.int64()),
            "changed": pa.array(
                z if changed is None else changed, pa.int64()
            ),
        }
    )


def frontier_priority(sf_dir: str):
    """(host, pr_e9, n_pages, n_changed, staleness_milli, priority) —
    authority × change-rate crawl scheduling score per host."""

    def pr_rows(t: pa.Table) -> pa.Table:
        return _tagged(
            t.column("name"),
            pr=np.asarray(t.column("pr_e9"), np.int64),
        )

    def page_partials(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"), np.int64)
        hosts, counts = np.unique((ids // 3) % 50, return_counts=True)
        names = np.char.add(
            np.char.add("site", hosts.astype(str)), ".example"
        )
        return _tagged(pa.array(names, pa.string()), pages=counts)

    def changed_partials(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"), np.int64) - _NEW_ID_BASE
        hosts, counts = np.unique((ids // 3) % 50, return_counts=True)
        names = np.char.add(
            np.char.add("site", hosts.astype(str)), ".example"
        )
        return _tagged(pa.array(names, pa.string()), changed=counts)

    u = (
        host_pagerank(sf_dir)
        .map_batches(pr_rows, batch_format="pyarrow")
        .union(
            read_documents(sf_dir, ["doc_id"]).map_batches(
                page_partials, batch_format="pyarrow"
            )
        )
        .union(
            snapshot_delta(sf_dir).map_batches(
                changed_partials, batch_format="pyarrow"
            )
        )
    )
    agg = u.groupby("host").sum(["pr", "pages", "changed"])

    def finish(t: pa.Table) -> pa.Table:
        pr = np.asarray(t.column("sum(pr)"), np.int64)
        pages = np.asarray(t.column("sum(pages)"), np.int64)
        changed = np.asarray(t.column("sum(changed)"), np.int64)
        stale = 1000 * changed // pages
        return pa.table(
            {
                "host": t.column("host"),
                "pr_e9": pa.array(pr, pa.int64()),
                "n_pages": pa.array(pages, pa.int64()),
                "n_changed": pa.array(changed, pa.int64()),
                "staleness_milli": pa.array(stale, pa.int64()),
                "priority": pa.array(pr * stale, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


FRONTIER_PRIORITY_SQL = f"""WITH fp_pr AS (
{HOST_PAGERANK_SQL}
),
fp_chg AS (
  SELECT 'site' || (((doc_id - 1000000) // 3) % 50)::VARCHAR
           || '.example' AS host,
         COUNT(*)::BIGINT AS n_changed
  FROM ({SNAPSHOT_DELTA_SQL}) GROUP BY 1
),
fp_pg AS (
  SELECT 'site' || ((doc_id // 3) % 50)::VARCHAR || '.example' AS host,
         COUNT(*)::BIGINT AS n_pages
  FROM documents GROUP BY 1
)
SELECT fp_pg.host, fp_pr.pr_e9, fp_pg.n_pages,
       COALESCE(fp_chg.n_changed, 0)::BIGINT AS n_changed,
       ((1000 * COALESCE(fp_chg.n_changed, 0)) // fp_pg.n_pages)::BIGINT
         AS staleness_milli,
       (fp_pr.pr_e9 *
        ((1000 * COALESCE(fp_chg.n_changed, 0)) // fp_pg.n_pages))::BIGINT
         AS priority
FROM fp_pg
JOIN fp_pr ON fp_pr.name = fp_pg.host
LEFT JOIN fp_chg ON fp_chg.host = fp_pg.host"""
