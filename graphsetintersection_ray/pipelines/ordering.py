"""GRO-style greedy window reordering (reference R1, porder.cpp:142-235).

The reference's GRO is a sequential greedy pass: vertices are appended
one at a time, each step picking the vertex with the most edges into a
sliding window of the ``window`` most recently placed vertices — packing
tightly-connected vertices into nearby ids so BSR blocks fill densely
(lower comp_ratio).

Distributed analog: the vertex range is split into contiguous shards
(one ``groupby.map_groups`` group per shard, the parallel unit); the
same greedy window pass runs inside each shard over the shard-induced
subgraph (cross-shard edges are ignored — the documented approximation:
at 100 TB the shards are the reference's working sets, and range
sharding keeps the id-locality the greedy pass needs). Shard-local
positions are offset by a tiny O(#shards) driver pass into one global
dense permutation. No step materializes the graph on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphsetintersection_ray.pipelines.graph import GraphArtifacts

GRO_WINDOW = 64  # reference default window scale (porder.cpp:142-235)


def _greedy_window_order(
    members: np.ndarray, adj: dict, window: int
) -> np.ndarray:
    """Sequential greedy pass over one shard: repeatedly place the vertex
    with the most edges into the last ``window`` placed (ties → min id).
    Scores are maintained incrementally: +1 to unplaced neighbors when a
    vertex enters the window, -1 when it slides out.

    Selection uses a LAZY max-heap — every score change pushes a fresh
    entry and stale entries (placed vertex, or score no longer current)
    are skipped at pop time — the distributed analog of the reference's
    LinkedListHeap decrease-key structure (linkedlist_heap.hpp:33-67,
    porder.cpp:142-235). Each edge triggers at most two pushes (its
    endpoint entering and leaving the window), so the pass is
    O((n + m) log m) instead of the previous O(n^2) argmax rescans.
    Entries are packed ints ((-score) << 32 | local_idx): the heap pops
    max score first, ties by smallest local index = smallest vertex id,
    exactly the old np.argmax-first tie rule."""
    import heapq
    from collections import deque

    n = len(members)
    # neighbor ids -> local indices, vectorized once per vertex
    # (members is sorted ascending)
    adj_local: list[np.ndarray] = []
    for v in members:
        vals = adj.get(int(v))
        if vals is None or len(vals) == 0:
            adj_local.append(np.empty(0, np.int64))
            continue
        idx = np.searchsorted(members, vals)
        ok = idx < n
        idx = idx[ok]
        adj_local.append(idx[members[idx] == vals[ok]])
    placed = np.zeros(n, bool)
    score = np.zeros(n, np.int64)
    order = np.empty(n, np.int64)
    heap: list[int] = []
    push = heapq.heappush
    pop = heapq.heappop
    seed_ptr = 0  # smallest unplaced local index (advances monotonically)
    win: deque = deque()
    for i in range(n):
        best = -1
        while heap:
            key = heap[0]
            j = key & 0xFFFFFFFF
            if placed[j] or score[j] != -(key >> 32):
                pop(heap)  # stale
                continue
            if -(key >> 32) > 0:
                best = j
            break  # valid top; score 0 falls through to the seed rule
        if best < 0:
            # all current scores are 0: fresh seed = smallest unplaced id
            while placed[seed_ptr]:
                seed_ptr += 1
            best = seed_ptr
        order[i] = best
        placed[best] = True
        win.append(best)
        nb = adj_local[best]
        nb = nb[~placed[nb]]
        score[nb] += 1
        for j, s in zip(nb.tolist(), score[nb].tolist()):
            push(heap, ((-s) << 32) + j)
        if len(win) > window:
            out = win.popleft()
            nb = adj_local[out]
            nb = nb[~placed[nb]]
            score[nb] -= 1
            for j, s in zip(nb.tolist(), score[nb].tolist()):
                push(heap, ((-s) << 32) + j)
    return members[order]


def gro_order(
    art: GraphArtifacts, window: int = GRO_WINDOW
) -> ray.data.Dataset:
    """(v:int32, new_id:int32) — GRO-style permutation, sharded greedy."""
    from graphsetintersection_ray.stages.graph_build import (
        build_csr,
        compact_blocks,
    )

    n = art.n_vertices
    shards = max(1, art.num_partitions)
    csr = compact_blocks(
        build_csr(art.sym, num_partitions=art.num_partitions, packed=True)
    )

    def add_shard(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (u * shards // max(n, 1)).astype(np.int32)
        return t.append_column("shard", pa.array(shard))

    def order_shard(g: pd.DataFrame, _window=window) -> pa.Table:
        members = np.sort(g["u"].to_numpy().astype(np.int64))
        adj = {}
        for u, blob in zip(g["u"], g["nbrs_bin"]):
            vals = (
                np.frombuffer(blob, dtype="<i4").astype(np.int64)
                if blob is not None and len(blob)
                else np.empty(0, np.int64)
            )
            adj[int(u)] = vals
        placed = _greedy_window_order(members, adj, _window)
        return pa.table(
            {
                "shard": pa.array(
                    np.full(len(members), int(g["shard"].iloc[0]), np.int64)
                ),
                "v": pa.array(placed.astype(np.int64)),
                "local_pos": pa.array(np.arange(len(members), dtype=np.int64)),
            }
        )

    ordered = (
        csr.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(order_shard, batch_format="pandas")
        .materialize()
    )
    # O(#shards) driver pass: dense global offsets per shard
    sizes = (
        ordered.groupby("shard")
        .count()
        .to_pandas()
        .sort_values("shard")
    )
    base = np.zeros(shards + 1, np.int64)
    for s, c in zip(sizes["shard"], sizes["count()"]):
        base[int(s) + 1] = c
    base = np.cumsum(base)
    if base[-1] != n:
        # transcript-derived vertices always come from edges (degree >= 1);
        # an isolated vertex would silently vanish from the permutation, so
        # fail loudly instead (same contract as the distributed cliques path)
        raise ValueError(
            f"gro_order requires no isolated vertices: CSR covers "
            f"{int(base[-1])} of {n} vertices"
        )
    base_ref = ray.put(base)

    def finish(t: pa.Table) -> pa.Table:
        b = ray.get(base_ref)
        shard = t["shard"].to_numpy(zero_copy_only=False)
        pos = t["local_pos"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "v": t["v"].cast(pa.int32()),
                "new_id": pa.array((b[shard] + pos).astype(np.int32)),
            }
        )

    return ordered.map_batches(finish, batch_format="pyarrow")
