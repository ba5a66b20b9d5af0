"""Newman modularity of the community partition, in EXACT integer
arithmetic — the quality audit for the label-propagation stage
(stages/communities.py; the reference builds communities,
graphiti_core utils/maintenance/community_operations.py, but never
scores them).

Q = sum_c ( L_c/m - (D_c/2m)^2 ) over the undirected distinct edge
set (self-loops dropped), with L_c = intra-community edges and D_c =
total degree of community c. Scaling by 4m^2 clears every
denominator: q_scaled = sum_c (4*m*L_c - D_c^2) = 4*m^2*Q is a pure
integer both engines compute bit-identically (Q itself is recovered
as q_scaled / (4 m^2) by any consumer; the pytest invariant checks Q
lands in (0, 1] here — the LP partition should beat a random one).

Distributed shape: degree and intra-edge counts are map-side
pre-aggregated ONE exchange each over the (tiny relative to the
corpus) edge set; community labels land on nodes/edges through
lookup_column's byte-capped tiers; the per-community contributions
collapse in a final per-group sum. Nothing driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"


def _sum_by_key(ds, key: str, val: str):
    """(key -> sum(val)) as ONE exchange with map-side pre-aggregation."""

    def pre(t: pa.Table) -> pa.Table:
        agg = (
            pa.table({key: t.column(key), val: t.column(val)})
            .group_by(key)
            .aggregate([(val, "sum")])
        )
        return pa.table(
            {key: agg.column(key), val: agg.column(f"{val}_sum")}
        )

    return ds.map_batches(pre, batch_format="pyarrow").groupby(key).sum(val)


def modularity(edges_named_ds, communities_ds):
    """(group_id, m_edges, q_scaled) per group; q_scaled = 4*m^2*Q."""
    from ..stages.joins import lookup_column
    from .cooccur import _counted
    from .graph import _undirected_edges

    und = _undirected_edges(edges_named_ds).materialize()

    m_cnt = _counted(und, ["group_id"], "gk")
    n_grps = m_cnt.count()

    from .graph import _adjacency_rows

    deg_counts = _counted(
        _adjacency_rows(und), ["group_id", "node"], "dk"
    )

    def label_map(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nk": pc.binary_join_element_wise(
                    pc.cast(t.column("group_id"), pa.string()),
                    pc.cast(t.column("name"), pa.string()),
                    _SEP,
                ),
                "label": t.column("community_name").cast(pa.string()),
            }
        )

    labels = communities_ds.map_batches(label_map, batch_format="pyarrow")
    n_nodes = labels.count()

    # D_c: degree rows -> member label -> sum per (group, label)
    def split_deg(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("dk"), _SEP)
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "nk": t.column("dk"),
                "deg": t.column("sum(cnt)"),
            }
        )

    deg = lookup_column(
        deg_counts.map_batches(split_deg, batch_format="pyarrow"),
        "nk", labels, "nk", "label", "label", mapping_rows=n_nodes,
    )

    def lk(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lk": pc.binary_join_element_wise(
                    pc.cast(t.column("group_id"), pa.string()),
                    pc.cast(t.column("label"), pa.string()),
                    _SEP,
                ),
                "deg": t.column("deg"),
            }
        )

    dc = _sum_by_key(
        deg.map_batches(lk, batch_format="pyarrow"), "lk", "deg"
    )

    # L_c: intra-community undirected edges per (group, label)
    def uk_vk(t: pa.Table) -> pa.Table:
        g = pc.cast(t.column("group_id"), pa.string())
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "uk": pc.binary_join_element_wise(
                    g, pc.cast(t.column("u"), pa.string()), _SEP
                ),
                "vk": pc.binary_join_element_wise(
                    g, pc.cast(t.column("v"), pa.string()), _SEP
                ),
            }
        )

    e = und.map_batches(uk_vk, batch_format="pyarrow")
    e = lookup_column(e, "uk", labels, "nk", "label", "lab_u",
                      mapping_rows=n_nodes)
    e = lookup_column(e, "vk", labels, "nk", "label", "lab_v",
                      mapping_rows=n_nodes)

    def intra(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("lab_u"), t.column("lab_v"))
        out = t.filter(pc.fill_null(keep, False))
        return pa.table(
            {
                "group_id": out.column("group_id"),
                "label": out.column("lab_u"),
            }
        )

    lc = _counted(
        e.map_batches(intra, batch_format="pyarrow"),
        ["group_id", "label"],
        "lk",
    )
    n_labels = dc.count()

    # contributions: 4*m*L_c - D_c^2 per community, summed per group
    def split_dc(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("lk"), _SEP)
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "lk": t.column("lk"),
                "dc": t.column("sum(deg)"),
            }
        )

    rows = dc.map_batches(split_dc, batch_format="pyarrow")
    rows = lookup_column(rows, "lk", lc, "lk", "sum(cnt)", "lc",
                         mapping_rows=n_labels, val_type=pa.int64())
    rows = lookup_column(rows, "group_id", m_cnt, "gk", "sum(cnt)", "m",
                         mapping_rows=n_grps, val_type=pa.int64())

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        lc_v = df["lc"].fillna(0).astype(np.int64)
        df["q_part"] = 4 * df["m"] * lc_v - df["dc"] * df["dc"]
        df["mk"] = df["group_id"] + _SEP + df["m"].astype(str)
        return df[["mk", "q_part"]]

    summed = _sum_by_key(
        rows.map_batches(contrib, batch_format="pandas"), "mk", "q_part"
    )

    def finish(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("mk"), _SEP)
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "m_edges": pc.cast(
                    pc.list_element(parts, 1), pa.int64()
                ),
                "q_scaled": t.column("sum(q_part)"),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


MODULARITY_SQL_TAIL = """
, mod_e AS (
  SELECT DISTINCT grp, least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM swept WHERE subj <> obj
), mod_m AS (
  SELECT grp, count(*) AS m FROM mod_e GROUP BY 1
), mod_deg AS (
  SELECT grp, node, count(*) AS d FROM (
    SELECT grp, u AS node FROM mod_e
    UNION ALL SELECT grp, v FROM mod_e
  ) GROUP BY 1, 2
), mod_dc AS (
  SELECT d.grp, l.label, sum(d.d) AS dc
  FROM mod_deg d JOIN mem l ON l.grp = d.grp AND l.name = d.node
  GROUP BY 1, 2
), mod_lc AS (
  SELECT e.grp, la.label, count(*) AS lc
  FROM mod_e e
  JOIN mem la ON la.grp = e.grp AND la.name = e.u
  JOIN mem lb ON lb.grp = e.grp AND lb.name = e.v
    AND lb.label = la.label
  GROUP BY 1, 2
)
SELECT dc.grp AS group_id, CAST(mm.m AS BIGINT) AS m_edges,
  CAST(sum(4 * mm.m * COALESCE(lc.lc, 0) - dc.dc * dc.dc) AS BIGINT)
    AS q_scaled
FROM mod_dc dc
LEFT JOIN mod_lc lc ON lc.grp = dc.grp AND lc.label = dc.label
JOIN mod_m mm ON mm.grp = dc.grp
GROUP BY 1, 2
"""
