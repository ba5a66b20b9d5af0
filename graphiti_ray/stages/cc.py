"""Connected components over a candidate-pair Dataset.

Replaces the reference's O(n^2) fixpoint recursion over all node pairs
(compress_nodes, graphiti_core/utils/bulk_utils.py:256-327): after
blocking produces match pairs, duplicate clusters are the connected
components of the pair graph; the fixpoint recursion becomes min-label
propagation.

Two execution paths:
- driver union-find when the pair set is small (< ``driver_threshold``
  rows). Pairs cover only *duplicate-candidate* names — a tiny fraction
  of the corpus — so this is the common case even at large scale.
- distributed min-label propagation (iterated groupby-min over the
  neighbor-joined label table) when the pair set is too big to hold on
  the driver. Converges in <= component-diameter iterations; alias
  clusters have diameter <= 3 by construction.
"""

from __future__ import annotations

import pandas as pd

from ..functions.hashing import stable_int

DRIVER_THRESHOLD = 2_000_000


def union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """uuid -> component representative (min uuid in component)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent.keys() | {a for a, _ in pairs} | {b for _, b in pairs}}


def _labels_checksum(labels_ds) -> int:
    df = labels_ds.map_batches(
        lambda d: pd.DataFrame(
            {"h": [sum(stable_int(u + "|" + l) for u, l in zip(d["uuid"], d["label"]))]}
        ),
        batch_format="pandas",
    ).to_pandas()
    return int(df["h"].sum())


def connected_components_ds(pairs_ds, max_iters: int = 8):
    """Distributed min-label propagation. pairs_ds: columns (a, b).

    Returns a Dataset (uuid, label) where label = min uuid of the
    component. Shuffle key per iteration: uuid (groupby-min).
    """
    import ray.data  # noqa: F401

    both = pairs_ds.map_batches(
        lambda t: pd.DataFrame(
            {
                "uuid": pd.concat([t["a"], t["b"]], ignore_index=True),
                "nbr": pd.concat([t["b"], t["a"]], ignore_index=True),
            }
        ),
        batch_format="pandas",
    )
    from ..functions.exchange import exchange_width

    k = exchange_width()
    both = both.repartition(k)
    # initial label(x) = min(x, min neighbor)
    labels = (
        both.map_batches(
            lambda t: pd.DataFrame(
                {"uuid": t["uuid"], "label": t[["uuid", "nbr"]].min(axis=1)}
            ),
            batch_format="pandas",
        )
        .groupby("uuid")
        .min("label")
        .map_batches(
            lambda t: t.rename(columns={"min(label)": "label"}), batch_format="pandas"
        )
    )
    prev_sum = None
    for _ in range(max_iters):
        nbr_labels = both.join(
            labels, join_type="inner", num_partitions=8, on=("nbr",), right_on=("uuid",)
        ).map_batches(
            lambda t: pd.DataFrame({"uuid": t["uuid"], "label": t["label"]}),
            batch_format="pandas",
        )
        labels = (
            nbr_labels.union(labels)
            .repartition(k)
            .groupby("uuid")
            .min("label")
            .map_batches(
                lambda t: t.rename(columns={"min(label)": "label"}),
                batch_format="pandas",
            )
            .materialize()
        )
        csum = _labels_checksum(labels)
        if csum == prev_sum:
            break
        prev_sum = csum
    return labels


def compress_uuid_map_ds(uuid_map_ds, max_iters: int = 8):
    """D8 compress_uuid_map (bulk_utils.py:352-361) as a standalone
    distributed operator: resolve old->canonical chains (a->b->c
    becomes a->c) by iterated self-join until fixpoint.

    The main canonicalization path emits flat maps by construction
    (component representative), so this exists for externally-supplied
    chained maps. Converges in <= chain-depth iterations."""
    import pandas as pd

    def probe_rows(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": t["canonical_uuid"], "old_uuid": t["old_uuid"],
             "val": t["canonical_uuid"], "tag": "need"}
        )

    def have_rows(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": t["old_uuid"], "old_uuid": t["old_uuid"],
             "val": t["canonical_uuid"], "tag": "have"}
        )

    def hop(g: pd.DataFrame) -> pd.DataFrame:
        have = g[g["tag"] == "have"]
        nxt = have["val"].iloc[0] if len(have) else None
        need = g[g["tag"] == "need"]
        if not len(need):
            return pd.DataFrame(
                {"old_uuid": [], "canonical_uuid": [], "hopped": []}
            ).astype({"old_uuid": str, "canonical_uuid": str, "hopped": bool})
        return pd.DataFrame(
            {
                "old_uuid": need["old_uuid"],
                "canonical_uuid": nxt if nxt is not None else need["val"],
                "hopped": nxt is not None,
            }
        )

    for _ in range(max_iters):
        from ..functions.exchange import exchange_width

        both = uuid_map_ds.map_batches(probe_rows, batch_format="pandas").union(
            uuid_map_ds.map_batches(have_rows, batch_format="pandas")
        ).repartition(exchange_width())
        resolved = both.groupby("key").map_groups(hop, batch_format="pandas").materialize()
        # fixpoint test as a DISTRIBUTED aggregate: one small row reaches
        # the driver instead of the whole map (the previous full-map
        # to_pandas() per iteration was an O(duplicates) driver collect)
        hops = resolved.map_batches(
            lambda t: pd.DataFrame({"h": [int(t["hopped"].sum())]}),
            batch_format="pandas",
        ).sum("h")
        any_hop = bool(hops)
        uuid_map_ds = resolved.map_batches(
            lambda t: t[["old_uuid", "canonical_uuid"]], batch_format="pandas"
        )
        if not any_hop:
            break
    return uuid_map_ds


def components(pairs_ds, driver_threshold: int = DRIVER_THRESHOLD) -> dict[str, str] | None:
    """Dispatch: dict (driver path) or None -> caller must use
    connected_components_ds (kept separate so tests can force either)."""
    comp, _ = components_with_pairs(pairs_ds, driver_threshold)
    return comp


def components_with_pairs(
    pairs_ds, driver_threshold: int = DRIVER_THRESHOLD
) -> tuple[dict[str, str] | None, "pd.DataFrame | None"]:
    """(component dict, collected pairs frame) on the driver path, or
    (None, None) past the threshold. The pairs frame rides back to the
    caller because it carries everything the driver needs to derive the
    alias map and uuid_map WITHOUT waiting for (or executing) the
    distributed member-merge exchange — see
    canonicalize.driver_alias_and_map."""
    pairs_ds = pairs_ds.materialize()  # count + collect = ONE execution
    n = pairs_ds.count()
    if n == 0:
        return {}, pd.DataFrame(columns=["a", "b"])
    if n <= driver_threshold:
        df = pairs_ds.to_pandas()  # NOT take_all: per-row collect cost
        return union_find(list(zip(df["a"], df["b"]))), df
    return None, None
