"""Vertex reordering operators: GRO greedy window (R1), recursive graph
bisection (R3 mloggapa / R4 metis analog), and DFS preorder (Q9).

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

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphsetintersection_ray.pipelines.graph import GraphArtifacts

GRO_WINDOW = 64  # reference default window scale (porder.cpp:142-235)
# minimum vertices per reorder shard: below this a graph is ordered as a
# single shard (local pass sees every edge); above it, shards fan out to
# the build partition count — each shard's subgraph must fit one worker
SHARD_TARGET_VERTICES = int(
    os.environ.get("GRAFT_REORDER_SHARD_VERTICES", 65_536)
)


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


def _sharded_permutation(art: GraphArtifacts, local_order_fn) -> ray.data.Dataset:
    """Shared skeleton for shard-parallel reorderings: contiguous id-range
    shards, per-shard ``local_order_fn(members_sorted, adj) -> placement``
    over the shard-induced subgraph (cross-shard edges ignored — the
    documented approximation; range sharding keeps id locality), shard
    offsets merged by an O(#shards) driver pass into one dense
    permutation. No step materializes the graph on the driver."""
    from graphsetintersection_ray.stages.graph_build import (
        build_csr,
        compact_blocks,
    )

    n = art.n_vertices
    # shards sized by vertex count: a small graph runs as ONE shard (the
    # local pass sees every edge — no cross-shard blindness), a big one
    # fans out to at most num_partitions shards of >= SHARD_TARGET_VERTICES
    shards = max(1, min(art.num_partitions, -(-n // SHARD_TARGET_VERTICES)))
    csr = compact_blocks(
        build_csr(art.sym, num_partitions=art.num_partitions, packed=True)
    )

    def add_shard(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (u * shards // max(n, 1)).astype(np.int32)
        return t.append_column("shard", pa.array(shard))

    def order_shard(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.schema(
                [
                    pa.field("shard", pa.int64()),
                    pa.field("v", pa.int64()),
                    pa.field("local_pos", pa.int64()),
                ]
            ).empty_table()
        members = np.sort(g["u"].to_numpy().astype(np.int64))
        adj = {}
        for u, blob in zip(g["u"], g["nbrs_bin"]):
            vals = (
                np.frombuffer(blob, dtype="<i4").astype(np.int64)
                if blob is not None and len(blob)
                else np.empty(0, np.int64)
            )
            adj[int(u)] = vals
        placed = local_order_fn(members, adj)
        return pa.table(
            {
                "shard": pa.array(
                    np.full(len(members), int(g["shard"].iloc[0]), np.int64)
                ),
                "v": pa.array(placed.astype(np.int64)),
                "local_pos": pa.array(np.arange(len(members), dtype=np.int64)),
            }
        )

    from graphsetintersection_ray.stages.shuffle import bucket_groups

    # boundary sort: fan-in pinned to exactly `shards` blocks (one per
    # contiguous id-range shard) at every parallelism level
    ordered = bucket_groups(
        csr.map_batches(add_shard, batch_format="pyarrow"),
        order_shard,
        shards,
        bucket_col="shard",
    ).materialize()
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
            f"sharded reorder requires no isolated vertices: CSR covers "
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


def gro_order(
    art: GraphArtifacts, window: int = GRO_WINDOW
) -> ray.data.Dataset:
    """(v:int32, new_id:int32) — GRO-style permutation, sharded greedy."""
    return _sharded_permutation(
        art, lambda members, adj: _greedy_window_order(members, adj, window)
    )


# --------------------------------------------------------------------------
# Recursive graph bisection (reference R3 mloggapa, porder.cpp:634-930, and
# R4 metis_order, porder.cpp:932-986)
# --------------------------------------------------------------------------

BP_LEAF = 32       # leaf part size — the reference's v_num/32 part grain (R4)
BP_ITERS = 8       # refinement sweeps per bisection level


def _local_bisection_order(
    members: np.ndarray, adj: dict, leaf: int = BP_LEAF, iters: int = BP_ITERS
) -> np.ndarray:
    """Recursive bisection of one shard's induced subgraph with KL/FM-style
    pairwise-swap refinement — the mloggapa analog (porder.cpp:634-930):
    minimizing the cut at every bisection level packs tightly-connected
    vertices into the same contiguous id range, the same log-gap-shrinking
    objective the reference's graph_bisection2 optimizes. Leaf parts of
    ``leaf`` vertices occupy contiguous final ids, so the result is ALSO
    the metis_order shape (porder.cpp:932-986: partition into v_num/32
    parts, order by part).

    Fully vectorized and deterministic: gains via one bincount pass per
    sweep, swaps pair the k best of each side (ties -> smaller vertex id),
    k chosen while paired gains stay positive.
    """
    n = len(members)
    # local CSR over the shard-induced subgraph
    counts = np.empty(n, np.int64)
    flats = []
    for i, v in enumerate(members):
        vals = adj.get(int(v))
        if vals is None or len(vals) == 0:
            counts[i] = 0
            continue
        idx = np.searchsorted(members, vals)
        ok = idx < n
        idx = idx[ok]
        loc = idx[members[idx] == vals[ok]]
        counts[i] = len(loc)
        flats.append(loc)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    indices = (
        np.concatenate(flats).astype(np.int64)
        if flats
        else np.empty(0, np.int64)
    )

    side = np.zeros(n, np.int8)        # side within the CURRENT node
    # node-membership via stamping: one shared array, a fresh stamp per
    # recursion node — O(|node|) per node instead of an O(n) allocation
    # (O(n^2/leaf) across the recursion on a large shard)
    node_stamp = np.zeros(n, np.int64)
    stamp_ctr = [0]
    out: list[np.ndarray] = []

    def rec(idx: np.ndarray) -> None:
        # idx: local vertex indices of this node, ascending
        if len(idx) <= leaf:
            out.append(idx)
            return
        half = (len(idx) + 1) // 2
        side[idx[:half]] = 0
        side[idx[half:]] = 1
        # node-induced edge list, built once (membership is fixed during
        # refinement, only sides change); vectorized multi-range gather
        starts = indptr[idx]
        deg = indptr[idx + 1] - starts
        seg = np.repeat(np.arange(len(idx)), deg)
        total = int(deg.sum())
        cum = np.concatenate([[0], np.cumsum(deg)[:-1]])
        flat = indices[np.arange(total) + np.repeat(starts - cum, deg)]
        stamp_ctr[0] += 1
        node_stamp[idx] = stamp_ctr[0]
        keep = node_stamp[flat] == stamp_ctr[0]
        seg, flat = seg[keep], flat[keep]
        for _ in range(iters):
            if len(flat) == 0:
                break
            own_side = side[idx][seg]
            nb_side = side[flat]
            cross = own_side != nb_side
            # gain(v) = #cross-neighbors - #own-side neighbors
            gain = (
                np.bincount(seg[cross], minlength=len(idx)).astype(np.int64)
                - np.bincount(seg[~cross], minlength=len(idx))
            )
            sl = side[idx]
            left = np.flatnonzero(sl == 0)
            right = np.flatnonzero(sl == 1)
            # rank each side by (gain desc, vertex id asc); idx is
            # ascending so position order == id order
            ol = left[np.lexsort((left, -gain[left]))]
            orr = right[np.lexsort((right, -gain[right]))]
            m = min(len(ol), len(orr))
            if m == 0:
                break
            paired = gain[ol[:m]] + gain[orr[:m]]
            # paired gains are non-increasing: k = longest positive prefix
            k = int(np.searchsorted(-paired, 0, side="left"))
            if k == 0:
                break
            side[idx[ol[:k]]] = 1
            side[idx[orr[:k]]] = 0
        sl = side[idx]
        rec(idx[sl == 0])
        rec(idx[sl == 1])

    rec(np.arange(n))
    return members[np.concatenate(out)] if out else members


def bp_order(
    art: GraphArtifacts, leaf: int = BP_LEAF, iters: int = BP_ITERS
) -> ray.data.Dataset:
    """(v:int32, new_id:int32) — recursive-bisection permutation (R3/R4
    analog), shard-parallel: contiguous id-range shards each bisected
    recursively with cut-minimizing refinement; leaf parts of ``leaf``
    vertices get contiguous new ids (the metis v_num/32 part grain)."""
    return _sharded_permutation(
        art,
        lambda members, adj: _local_bisection_order(
            members, adj, leaf=leaf, iters=iters
        ),
    )


# --------------------------------------------------------------------------
# DFS preorder (reference Q9, porder.cpp:497-533)
# --------------------------------------------------------------------------

# DFS is inherently sequential (every step depends on the entire visited
# set) — the reference runs it single-threaded too. Provided for operator
# parity on graphs whose CSR fits on the driver; hard error above.
DFS_MAX_VERTICES = int(os.environ.get("GRAFT_DFS_MAX_VERTICES", 5_000_000))


def _driver_adjacency(art: GraphArtifacts, what: str) -> list[np.ndarray]:
    """Collect the symmetric CSR onto the driver for the inherently
    sequential reorderings (bounded by GRAFT_DFS_MAX_VERTICES; the
    reference runs these single-threaded too)."""
    from graphsetintersection_ray.stages.graph_build import build_csr

    n = art.n_vertices
    if n > DFS_MAX_VERTICES:
        raise ValueError(
            f"{what} is sequential by nature and capped at "
            f"{DFS_MAX_VERTICES} vertices (got {n}); use bp_order/gro_order "
            f"for distributable reorderings"
        )
    csr = build_csr(art.sym, num_partitions=art.num_partitions, packed=True)
    parts = csr.to_pandas()
    u = parts["u"].to_numpy().astype(np.int64)
    nbrs = [
        np.frombuffer(b, dtype="<i4").astype(np.int64) if b else
        np.empty(0, np.int64)
        for b in parts["nbrs_bin"]
    ]
    adj: list[np.ndarray] = [np.empty(0, np.int64)] * n
    for v, a in zip(u, nbrs):
        adj[int(v)] = a
    return adj


def _perm_dataset(new_id: np.ndarray) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.arange(len(new_id), dtype=np.int32)),
                "new_id": pa.array(new_id.astype(np.int32)),
            }
        )
    )


def dfs_order(art: GraphArtifacts) -> ray.data.Dataset:
    """(v:int32, new_id:int32) — DFS preorder permutation: start at vertex
    0, neighbors visited ascending, restart at the smallest unvisited
    vertex per component (reference dfs reorder semantics,
    porder.cpp:497-533). Sequential by nature; the adjacency is collected
    once onto the driver (bounded by GRAFT_DFS_MAX_VERTICES) and the
    permutation is shipped back as a Dataset."""
    n = art.n_vertices
    adj = _driver_adjacency(art, "dfs_order")
    new_id = np.full(n, -1, np.int64)
    nxt = 0
    for seed in range(n):
        if new_id[seed] >= 0:
            continue
        stack = [seed]
        while stack:
            v = stack.pop()
            if new_id[v] >= 0:
                continue
            new_id[v] = nxt
            nxt += 1
            nb = adj[v]
            # push descending so the smallest unvisited neighbor pops first
            unvisited = nb[new_id[nb] < 0]
            stack.extend(unvisited[::-1].tolist())
    return _perm_dataset(new_id)


# --------------------------------------------------------------------------
# Reverse Cuthill-McKee (reference rcm_order, porder.cpp:586-631)
# --------------------------------------------------------------------------


def rcm_order(art: GraphArtifacts) -> ray.data.Dataset:
    """(v:int32, new_id:int32) — reverse Cuthill-McKee permutation
    (porder.cpp:586-631): seeds taken in ascending total degree, BFS
    visiting each vertex's neighbors in ascending degree, ids assigned
    DESCENDING from v_num-1 (the 'reverse'). Degree ties break by vertex
    id ascending (the reference's std::sort leaves ties unspecified; a
    fixed tie order makes the permutation deterministic). Sequential by
    nature — driver-side below GRAFT_DFS_MAX_VERTICES, loud error
    above."""
    from collections import deque

    n = art.n_vertices
    adj = _driver_adjacency(art, "rcm_order")
    deg = np.array([len(a) for a in adj], dtype=np.int64)
    # neighbors pre-sorted by (degree, id) ascending — visit order
    adj = [a[np.lexsort((a, deg[a]))] for a in adj]
    seeds = np.lexsort((np.arange(n), deg))
    new_id = np.full(n, -1, np.int64)
    cur = n - 1
    for s in seeds:
        if new_id[s] >= 0:
            continue
        new_id[s] = cur
        cur -= 1
        que = deque([int(s)])
        while que:
            u = que.popleft()
            for v in adj[u]:
                if new_id[v] < 0:
                    new_id[v] = cur
                    cur -= 1
                    que.append(int(v))
    return _perm_dataset(new_id)


# --------------------------------------------------------------------------
# BFS-based recursive bisection (reference bfsr_order, porder.cpp:1116-1213)
# --------------------------------------------------------------------------


def bfsr_order(art: GraphArtifacts) -> ray.data.Dataset:
    """(v:int32, new_id:int32) — exact replay of the reference's
    bfsr_order (porder.cpp:1116-1213): recursively bisect the vertex
    array; each level (a) BFS-finds a pseudo-peripheral vertex (last
    dequeued from nodes[0]'s component) and swaps it to the front,
    (b) grows a 'left' half by BFS from unvisited seeds in array order
    (bounded by the reference's tot/4 seed, tot/2 queue and 3*tot/4
    growth cutoffs), (c) partitions the array around the grown set and
    recurses on both halves; ranges under 32 vertices keep their order.
    new_id[nodes[i]] = i. Sequential per range — driver-side below
    GRAFT_DFS_MAX_VERTICES, loud error above."""
    n = art.n_vertices
    adj = _driver_adjacency(art, "bfsr_order")
    nodes = np.arange(n, dtype=np.int64)
    visited = np.zeros(n, np.int64)
    vis_label = 0

    # explicit work stack of (start, length) ranges over `nodes`
    work = [(0, n)]
    while work:
        lo, tot = work.pop()
        if tot < 32:
            continue
        vis_label += 1
        seg = nodes[lo : lo + tot]
        visited[seg] = -vis_label
        # (a) pseudo-peripheral: BFS the component of seg[0], keep the
        # last dequeued vertex
        que = np.empty(tot, np.int64)
        front = back = 0
        visited[seg[0]] = vis_label
        que[back] = seg[0]
        back += 1
        last = seg[0]
        while front < back:
            u = que[front]
            front += 1
            last = u
            for v in adj[u]:
                if visited[v] == -vis_label:
                    visited[v] = vis_label
                    que[back] = v
                    back += 1
        last_pos = lo + int(np.flatnonzero(seg == last)[0])
        nodes[lo], nodes[last_pos] = nodes[last_pos], nodes[lo]
        seg = nodes[lo : lo + tot]
        visited[seg] = -vis_label
        # (b) grow the left half by BFS from seeds in array order
        front = back = 0
        i = 0
        while i < tot and back < tot // 4:
            s = seg[i]
            i += 1
            if visited[s] != -vis_label:
                continue
            visited[s] = vis_label
            que[back] = s
            back += 1
            stop = False
            while front < back and back < tot // 2 and not stop:
                u = que[front]
                front += 1
                for v in adj[u]:
                    if visited[v] == -vis_label:
                        visited[v] = vis_label
                        que[back] = v
                        back += 1
                        if back * 4 >= tot * 3:
                            stop = True
                            break
        left_num = back
        # (c) partition seg exactly as the reference's swap loop: the
        # i-th unmarked position in the left half exchanges with the
        # i-th marked position in the right half (encounter order) —
        # counts match because BFS marked exactly left_num vertices
        marked = visited[seg] == vis_label
        left_bad = np.flatnonzero(~marked[:left_num])
        right_good = left_num + np.flatnonzero(marked[left_num:])
        if len(left_bad):
            li = lo + left_bad
            ri = lo + right_good
            nodes[li], nodes[ri] = nodes[ri], nodes[li].copy()
        work.append((lo, left_num))
        work.append((lo + left_num, tot - left_num))

    new_id = np.empty(n, np.int64)
    new_id[nodes] = np.arange(n, dtype=np.int64)
    return _perm_dataset(new_id)


# --------------------------------------------------------------------------
# SlashBurn hub/spoke ordering (reference R5, porder.cpp:1009-1114)
# --------------------------------------------------------------------------


def _local_slashburn_order(members: np.ndarray, adj: dict) -> np.ndarray:
    """Exact SlashBurn replay over one shard's induced subgraph
    (porder.cpp:1009-1114): per round, greedily pull the k
    highest-current-degree hubs to the front (lazy max-heap with
    stale-entry reinsertion = the reference's HubsetHeapNode queue,
    ties -> larger id, porder.cpp:988-996; degrees decremented only by
    hub removals, exactly as the reference), then BFS the non-hub
    remainder seeded from hub neighbors in hub-pick/adjacency order;
    every connected component except the giant (first strictly-largest
    in (min_hub_idx asc, size asc) order = CCInfo operator<,
    porder.cpp:998-1008,1077-1093) is assigned ids from the BACK in
    discovery order. Loop while >= k vertices remain; leftovers take
    front ids in index order (porder.cpp:1094-1096).

    Deviation: k = max(1, min(n//1024, 1024)) — the reference's
    k = v_num/1024 is 0 below 1024 vertices and would never terminate.
    """
    import heapq

    n = len(members)
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
    k = max(1, min(n // 1024, 1024))
    new_id = np.full(n, -1, np.int64)
    cur_degs = np.array([len(a) for a in adj_local], dtype=np.int64)
    # min-heap on (-deg, -u): pops max degree, ties by LARGER id — the
    # reference priority_queue's (deg, u) max-order
    heap = [(-int(cur_degs[u]), -u) for u in range(n)]
    heapq.heapify(heap)
    front, back = 0, n - 1
    while back - front + 1 >= k:
        hubs: list[int] = []
        for _ in range(k):
            while True:
                d, nu = heapq.heappop(heap)
                u = -nu
                if new_id[u] != -1:
                    continue  # already assigned: drop
                if -d != cur_degs[u]:
                    heapq.heappush(heap, (-int(cur_degs[u]), nu))
                    continue  # stale degree: reinsert at current value
                hubs.append(u)
                new_id[u] = front
                front += 1
                cur_degs[adj_local[u]] -= 1
                break
        # CC discovery among unassigned vertices, seeded from hub
        # neighbors in hub-pick order (porder.cpp:1048-1075)
        cc_of = np.full(n, -1, np.int64)
        cc_nodes: list[int] = []
        cc_infos: list[tuple[int, int, int, int]] = []
        cur_cc = 0
        for hi, hub in enumerate(hubs):
            for s in adj_local[hub]:
                if new_id[s] == -1 and cc_of[s] == -1:
                    start = len(cc_nodes)
                    cc_of[s] = cur_cc
                    cc_nodes.append(int(s))
                    f = start
                    while f < len(cc_nodes):
                        u2 = cc_nodes[f]
                        f += 1
                        for v2 in adj_local[u2]:
                            if new_id[v2] == -1 and cc_of[v2] == -1:
                                cc_of[v2] = cur_cc
                                cc_nodes.append(int(v2))
                    cc_infos.append(
                        (hi, len(cc_nodes) - start, cur_cc, start)
                    )
                    cur_cc += 1
        cc_infos.sort(key=lambda t: (t[0], t[1]))
        gcc_idx, gcc_size = -1, 0
        for _, sz, idx, _ in cc_infos:
            if gcc_size < sz:
                gcc_size, gcc_idx = sz, idx
        for _, sz, idx, st in cc_infos:
            if idx == gcc_idx:
                continue
            for u2 in cc_nodes[st: st + sz]:
                new_id[u2] = back
                back -= 1
    rest = np.flatnonzero(new_id == -1)
    new_id[rest] = front + np.arange(len(rest))
    inv = np.empty(n, np.int64)
    inv[new_id] = np.arange(n)
    return members[inv]


def slashburn_order(art: GraphArtifacts) -> ray.data.Dataset:
    """(v:int32, new_id:int32) — SlashBurn permutation (R5): hubs to the
    front, non-giant spoke components to the back, shard-parallel via the
    shared range-shard skeleton (cross-shard edges ignored, the same
    documented approximation as gro/bp orders)."""
    return _sharded_permutation(art, _local_slashburn_order)
