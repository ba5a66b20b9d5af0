"""Entity co-occurrence with integer-exact lift over the episodic
mention table — the KG's collocation analysis (which canonical
entities appear in the same episodes, and how much more often than
chance). The reference computes mention edges per episode
(episodic MENTIONS, graphiti_core utils/maintenance/node_operations)
but has no corpus-level co-occurrence surface; a batch engine uses
this table for blocking hints, community priors, and entity-linking
features.

Semantics: input is the DISTINCT (group, episode-url, entity) mention
table; a pair row is (group, a < b) with n_co = episodes mentioning
both; lift_milli = n_co * n_episodes * 1000 // (n_a * n_b) — all
INTEGER arithmetic (floor division), so the SQL mirror is exact.

Distributed shape: per-episode pair expansion is ONE exchange over
pid = hash(episode) % width buckets — each reducer expands EVERY
episode in its bucket with one vectorized pandas self-merge, never a
per-episode pandas round-trip (an episode's mention list is small —
the quadratic bound is per-episode, not per-corpus; a pathological
episode mentioning thousands of entities IS degree-capped the same
way triangle wedges are: every episode's mention list is bounded to
ops/wedgecap.WEDGE_DEGREE_CAP names — keep-first on sorted name,
drop count logged — before the self-merge, so one episode contributes
at most cap^2 merge rows). Pair counts, per-entity counts and episode
counts are map-side pre-aggregated then summed in one small groupby
each; the final arithmetic joins ride lookup_column's byte-capped
tiers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"


def _counted(ds, cols: list[str], key: str):
    """(key -> n) global counts as ONE exchange: block-level encode +
    pre-aggregate, then groupby(key).sum — the counting sibling of
    ops/graph._distinct_by_key."""

    def pre(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            *[pc.cast(t.column(c), pa.string()) for c in cols], _SEP
        )
        agg = (
            pa.table({key: k, "cnt": pa.array(np.ones(t.num_rows, np.int64))})
            .group_by(key)
            .aggregate([("cnt", "sum")])
        )
        return pa.table({key: agg.column(key), "cnt": agg.column("cnt_sum")})

    return ds.map_batches(pre, batch_format="pyarrow").groupby(key).sum("cnt")


def entity_cooccurrence(mentions_ds, degree_cap: int | None = -1):
    """(group_id, ent_a, ent_b, n_co, n_a, n_b, lift_milli) for every
    same-episode entity pair (a < b by name). ``degree_cap`` bounds an
    episode's mention list before pair expansion (default
    wedgecap.WEDGE_DEGREE_CAP, far above the fixtures' 5
    mentions/episode; None disables)."""
    from ..stages.joins import lookup_column
    from .wedgecap import WEDGE_DEGREE_CAP, cap_per_key

    cap = WEDGE_DEGREE_CAP if degree_cap == -1 else degree_cap

    # consumed three times (pair expansion, entity counts, episode
    # counts) — materialize ONCE or each consumer re-executes the
    # whole upstream mention pipeline
    mentions_ds = mentions_ds.materialize()

    # per-episode pair expansion WITHOUT per-episode map_groups (an
    # episode is a tiny group; groupby(episode).map_groups pays one
    # pandas round-trip per episode): bucket episodes pid = hash(ek) %
    # width, then ONE vectorized self-merge per bucket expands every
    # episode in the bucket at once
    from ..functions.exchange import exchange_width
    from ..functions.hashing import bucket_array

    def with_ek(t: pa.Table) -> pa.Table:
        ek = pc.binary_join_element_wise(
            pc.cast(t.column("group_id"), pa.string()),
            pc.cast(t.column("url"), pa.string()),
            _SEP,
        )
        t = t.append_column("ek", ek)
        return t.append_column(
            "pid",
            pa.array(bucket_array(ek, exchange_width(), salt="coep")),
        )

    keyed = mentions_ds.map_batches(with_ek, batch_format="pyarrow")

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = cap_per_key(
            df, "ek", cap, ["name"], "cooccurrence episode mentions"
        )
        m = df.merge(df, on=["group_id", "ek"], suffixes=("_a", "_b"))
        m = m[m["name_a"] < m["name_b"]]
        return pd.DataFrame(
            {
                "group_id": m["group_id"].to_numpy(),
                "ent_a": m["name_a"].to_numpy(),
                "ent_b": m["name_b"].to_numpy(),
            }
        )

    pairs = keyed.groupby("pid").map_groups(expand, batch_format="pandas")

    pair_counts = _counted(pairs, ["group_id", "ent_a", "ent_b"], "pk")
    # two lookups read this mapping — keep it materialized
    ent_counts = _counted(
        mentions_ds, ["group_id", "name"], "nk"
    ).materialize()
    # GLOBAL distinct (group, url) first — block-level dedupe alone
    # would count a url once per block it appears in
    from .graph import _distinct_by_key

    ep_counts = _counted(
        _distinct_by_key(mentions_ds, ["group_id", "url"], "uk"),
        ["group_id"],
        "gk",
    )
    n_ents = ent_counts.count()
    n_grps = ep_counts.count()

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("pk"), _SEP)
        return pa.table(
            {
                "group_id": pc.list_element(parts, 0),
                "ent_a": pc.list_element(parts, 1),
                "ent_b": pc.list_element(parts, 2),
                "n_co": t.column("sum(cnt)"),
                "ak": pc.binary_join_element_wise(
                    pc.list_element(parts, 0), pc.list_element(parts, 1),
                    _SEP,
                ),
                "bk": pc.binary_join_element_wise(
                    pc.list_element(parts, 0), pc.list_element(parts, 2),
                    _SEP,
                ),
            }
        )

    out = pair_counts.map_batches(split, batch_format="pyarrow")
    out = lookup_column(out, "ak", ent_counts, "nk", "sum(cnt)", "n_a",
                        mapping_rows=n_ents)
    out = lookup_column(out, "bk", ent_counts, "nk", "sum(cnt)", "n_b",
                        mapping_rows=n_ents)
    out = lookup_column(out, "group_id", ep_counts, "gk", "sum(cnt)",
                        "n_ep", mapping_rows=n_grps)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["lift_milli"] = (
            df["n_co"] * df["n_ep"] * 1000 // (df["n_a"] * df["n_b"])
        ).astype(np.int64)
        return df[
            ["group_id", "ent_a", "ent_b", "n_co", "n_a", "n_b",
             "lift_milli"]
        ]

    return out.map_batches(finish, batch_format="pandas")


ENTITY_COOCCURRENCE_SQL_BODY = """
, co_m AS (
  SELECT DISTINCT e.grp, e.url, c.cname AS name
  FROM ent_d e JOIN canon c ON c.grp = e.grp AND c.comp = e.comp
), co_pairs AS (
  SELECT a.grp, a.name AS ent_a, b.name AS ent_b, count(*) AS n_co
  FROM co_m a JOIN co_m b
    ON b.grp = a.grp AND b.url = a.url AND b.name > a.name
  GROUP BY 1, 2, 3
), co_cnt AS (
  SELECT grp, name, count(*) AS n FROM co_m GROUP BY 1, 2
), co_ep AS (
  SELECT grp, count(DISTINCT url) AS n_ep FROM co_m GROUP BY 1
)
SELECT p.grp AS group_id, p.ent_a, p.ent_b,
  CAST(p.n_co AS BIGINT) AS n_co,
  CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
  CAST(p.n_co * e.n_ep * 1000 // (ca.n * cb.n) AS BIGINT) AS lift_milli
FROM co_pairs p
JOIN co_cnt ca ON ca.grp = p.grp AND ca.name = p.ent_a
JOIN co_cnt cb ON cb.grp = p.grp AND cb.name = p.ent_b
JOIN co_ep e ON e.grp = p.grp
"""
