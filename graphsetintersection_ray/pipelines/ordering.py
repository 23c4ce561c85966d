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
    vertex enters the window, -1 when it slides out."""
    member_pos = {int(v): i for i, v in enumerate(members)}
    n = len(members)
    placed = np.zeros(n, bool)
    score = np.zeros(n, np.int64)
    order = np.empty(n, np.int64)
    from collections import deque

    win: deque = deque()
    for i in range(n):
        # candidate = unplaced argmax score, ties by vertex id (= local
        # index order, members sorted ascending)
        cand = np.flatnonzero(~placed)
        best = cand[np.argmax(score[cand])]
        best_score = score[best]
        if best_score == 0:
            best = cand[0]  # fresh seed: smallest unplaced id
        order[i] = best
        placed[best] = True
        win.append(best)
        for w in adj.get(int(members[best]), ()):
            j = member_pos.get(w)
            if j is not None and not placed[j]:
                score[j] += 1
        if len(win) > window:
            out = win.popleft()
            for w in adj.get(int(members[out]), ()):
                j = member_pos.get(w)
                if j is not None and not placed[j]:
                    score[j] -= 1
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
