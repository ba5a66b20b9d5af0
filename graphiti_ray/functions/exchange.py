"""Bounded-width groupby exchanges.

Ray Data's sort-based shuffle launches M map and R reduce tasks with
M = R = input block count, so one exchange schedules O(M*R) shuffle
objects. Upstream of every exchange in this repo a map-side combiner
has already shrunk the DATA, but the BLOCK COUNT still tracks the
corpus (sources size blocks for extraction parallelism), so the
shuffle's scheduling/transfer term grows QUADRATICALLY with input
size while the payload grows linearly. Measured on this host
(16 CPUs, ~1300-row combiner output per block, groupby bucket ->
group_by-per-bucket reducer): 625 blocks -> 28.1 s, 1250 blocks ->
104.4 s for the SAME per-row work; after coalescing to 64 blocks
first: 1.3 s / 2.0 s — linear in data, ~50x faster.

``bounded_group_map`` therefore coalesces to K blocks (simple-mode
``repartition`` — adjacent-block concat, no all-to-all) before the
groupby, with K tied to the CLUSTER (2x cores, overridable via
GRAFT_EXCHANGE_BLOCKS), not the corpus. Partitioning assumption for
the 100-TB regime: the post-combiner exchange payload divided by K
must fit a worker's heap; K only ever needs to scale with cluster
cores (per-core heap is a per-node resource), never with corpus
size, so the exchange stays O(K^2) objects on any input.
"""

from __future__ import annotations

import os


def coalesced(ds_mat, target_block_bytes: int = 64 << 20):
    """Bound a MATERIALIZED dataset's block count to the cluster
    exchange width (but never below size/target_block_bytes blocks, so
    big data keeps memory-safe blocks). A canonical table that
    materializes as hundreds of near-empty blocks (e.g. 177 canonical
    nodes in 192 blocks — the block count tracks the upstream
    extraction parallelism, not the data) makes EVERY downstream
    exchange pay O(blocks^2) shuffle-object scheduling; one cheap
    simple-mode repartition here pays for itself in the first consumer.
    Width sizing: blocks ~ size/target_block_bytes (memory safety — a
    dataset bigger than width x target keeps proportionally more
    blocks), clamped to [8, exchange_width()] so tiny canonical tables
    don't pay a 2x-cores-wide shuffle's fixed scheduling cost per
    downstream exchange and big ones don't exceed cluster width.
    No-op when the block count is already within the target."""
    import math

    size = ds_mat.size_bytes() or 0
    k_data = max(1, math.ceil(size / target_block_bytes))
    k = k_data if k_data >= exchange_width() else max(8, k_data)
    nb = ds_mat.num_blocks()
    if nb > k or nb * 4 < k_data:  # many near-empty blocks / few huge ones
        return ds_mat.repartition(k).materialize()
    return ds_mat


def exchange_width(per_core: int = 2, floor: int = 8) -> int:
    """K for exchange coalescing: 2x cluster cores (>=8), or
    GRAFT_EXCHANGE_BLOCKS."""
    env = os.environ.get("GRAFT_EXCHANGE_BLOCKS")
    if env:
        return max(1, int(env))
    cores = 8.0
    try:
        import ray

        if ray.is_initialized():
            cores = ray.cluster_resources().get("CPU", 8.0)
    except Exception:
        pass
    return max(floor, int(per_core * cores))


def bounded_group_map(ds, key, fn, *, batch_format="pyarrow", width=None):
    """groupby(key).map_groups(fn) behind a DATA-SIZED exchange width.

    The input is materialized (every caller feeds this a post-combiner
    stream that is already orders of magnitude smaller than the corpus,
    and the groupby is an all-to-all barrier anyway), then ``coalesced``
    picks the block count from its byte size — clamped to
    [8, exchange_width()] and raised for big data — so the shuffle's
    task/object fan-out tracks the DATA, not the upstream block count
    in either direction (an earlier version repartitioned a 3-block
    727-row stream UP to 2x-cores blocks: 64 mappers+reducers of
    scheduling for under a megabyte). Semantically identical to the
    bare groupby (same groups, same reducer)."""
    mat = ds.materialize()
    if width:
        if mat.num_blocks() != width:
            mat = mat.repartition(width)
    else:
        mat = coalesced(mat)
    return mat.groupby(key).map_groups(fn, batch_format=batch_format)
