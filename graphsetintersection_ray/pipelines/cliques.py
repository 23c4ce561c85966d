"""Maximal clique enumeration (reference mc: Q3-Q5).

Reference semantics (org_maximal_clique.cpp / bitpack_maximal_clique.cpp):
degeneracy-order driver — peel vertices in degeneracy order (bucket queue,
org_maximal_clique.cpp:316-370); for each seed v, enumerate maximal
cliques containing v with P = not-yet-peeled neighbors, X = already-peeled
neighbors, via Tomita-pivot Bron-Kerbosch (org_maximal_clique.cpp:169-314).
Every maximal clique is reported exactly once.

Ray design, two gated paths (BROADCAST_MAX_EDGES, env-overridable):
  * small graphs — the exact bucket-queue peel runs driver-side on the
    broadcast CSR; per-seed Tomita recursions fan out as ``map_batches``
    over seed vertices.
  * at scale — NO driver materialization of the edge table. The
    elimination order comes from a distributed k-core peel (per round,
    remote tasks over the cached edge blocks compute degree decrements;
    the driver holds only the O(V) degree vector — the distributed analog
    of the reference's bucket queue). Per-seed egonets are assembled by
    one explode + hash join against the packed CSR (each seed's group
    carries Σ_{w∈N(v)} |N(w)| rows — the documented partitioning
    assumption), and Tomita runs inside ``groupby(seed).map_groups``.
Both paths report each maximal clique exactly once; equality is tested at
a forced-low threshold.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphsetintersection_ray.functions.kernels import intersect_sorted
from graphsetintersection_ray.pipelines.graph import GraphArtifacts

# above this many (symmetric) edges the driver-side CSR broadcast is
# refused and the distributed peel + egonet-join path runs instead
BROADCAST_MAX_EDGES = int(
    os.environ.get("GRAFT_CLIQUE_BROADCAST_MAX_EDGES", 40_000_000)
)


def _sym_csr_arrays(art: GraphArtifacts):
    """Driver-side dense CSR of the symmetric adjacency (sorted nbrs).
    Only legal under the broadcast threshold — callers gate on
    ``2 * art.n_edges <= BROADCAST_MAX_EDGES``."""
    df = art.sym.to_pandas()
    src = df["src"].to_numpy().astype(np.int64)
    dst = df["dst"].to_numpy().astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=art.n_vertices)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return offsets, dst


def degeneracy_order(offsets: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """Exact degeneracy (min-degree peel) order — bucket queue, the
    reference's algorithm (org_maximal_clique.cpp:316-370)."""
    n = len(offsets) - 1
    deg = np.diff(offsets).copy()
    order = np.empty(n, np.int64)
    # bucket queue over degrees
    max_deg = int(deg.max()) if n else 0
    buckets: list[set] = [set() for _ in range(max_deg + 1)]
    for v in range(n):
        buckets[deg[v]].add(v)
    removed = np.zeros(n, bool)
    cur = 0
    for i in range(n):
        while cur <= max_deg and not buckets[cur]:
            cur += 1
        if cur > max_deg:
            break
        v = min(buckets[cur])  # deterministic tie-break
        buckets[cur].discard(v)
        order[i] = v
        removed[v] = True
        for w in flat[offsets[v]: offsets[v + 1]]:
            if not removed[w]:
                buckets[deg[w]].discard(w)
                deg[w] -= 1
                buckets[deg[w]].add(w)
                if deg[w] < cur:
                    cur = deg[w]
    return order


@ray.remote
def _peel_decrements(tbl, removed_mask: np.ndarray, n: int) -> np.ndarray:
    """Per-edge-block degree decrements caused by this round's removals:
    for every edge (src, dst) with src removed and dst still active,
    dst loses one degree. Symmetric table → one direction suffices."""
    from graphsetintersection_ray.pipelines.triangle import _block_src_dst

    src, dst = _block_src_dst(tbl)
    if len(src) == 0:
        return np.zeros(n, np.int64)
    keep = removed_mask[src] & ~removed_mask[dst]
    return np.bincount(dst[keep], minlength=n)


def distributed_peel_order(
    art: GraphArtifacts, batch_slack: int | None = None
) -> np.ndarray:
    """Elimination order from a distributed k-core peel.

    Per round all active vertices with residual degree <= d_min +
    ``batch_slack`` are removed (ordered by id within the round) —
    half-integer batching: ANY total order is a valid elimination order
    for exactly-once BK seeding, and the slack collapses adjacent
    min-degree levels into one round, cutting the driver-barrier count
    (the at-scale bottleneck: each round is one remote bincount per
    cached edge block + one O(V) driver vector update). slack=0
    reproduces the exact min-degree peel; the default 2 only loosens the
    |P| bound per seed by <= slack — the distributed analog of the
    reference's bucket-queue peel."""
    if batch_slack is None:
        batch_slack = int(os.environ.get("GRAFT_PEEL_SLACK", 2))
    n = art.n_vertices
    refs = art.sym.materialize().to_arrow_refs()
    deg = np.zeros(n, np.int64)
    ddf = art.degrees.to_pandas()
    deg[ddf["v"].to_numpy()] = ddf["degree"].to_numpy()

    active = np.ones(n, bool)
    order = np.empty(n, np.int64)
    pos = 0
    rounds = 0
    while active.any():
        d_min = deg[active].min()
        this_round = np.flatnonzero(active & (deg <= d_min + batch_slack))
        order[pos : pos + len(this_round)] = this_round
        pos += len(this_round)
        active[this_round] = False
        rounds += 1
        if not active.any():
            break
        removed_mask = np.zeros(n, bool)
        removed_mask[this_round] = True
        decs = ray.get(
            [_peel_decrements.remote(r, removed_mask, n) for r in refs]
        )
        deg -= np.sum(decs, axis=0)
    import logging

    logging.getLogger(__name__).info(
        "distributed_peel_order: %d vertices in %d rounds (slack=%d)",
        n, rounds, batch_slack,
    )
    return order


def coreness(art: GraphArtifacts) -> pa.Table:
    """(v, core): k-core decomposition — core(v) = the largest k such that
    v belongs to a subgraph of minimum degree k.

    Exact level-batched peel (Matula-Beck semantics, the same bucket-queue
    family as the reference's degeneracy peel that seeds its BK recursion):
    at level k, repeatedly strip ALL active vertices with residual degree
    <= k until none remain (the cascade), assigning core = k; then jump k
    to the next occupied residual-degree level. Every inner iteration is
    one remote bincount per cached edge block + an O(V) driver vector
    update — the same per-round cost and scale caveat as
    distributed_peel_order above (at 10^9 vertices the O(V) driver arrays
    need a superstep re-expression; documented)."""
    n = art.n_vertices
    refs = art.sym.materialize().to_arrow_refs()
    deg = np.zeros(n, np.int64)
    ddf = art.degrees.to_pandas()
    deg[ddf["v"].to_numpy()] = ddf["degree"].to_numpy()

    active = np.ones(n, bool)
    core = np.zeros(n, np.int64)
    rounds = 0
    k = 0
    while active.any():
        k = max(k, int(deg[active].min()))
        while True:
            batch = np.flatnonzero(active & (deg <= k))
            if len(batch) == 0:
                break
            core[batch] = k
            active[batch] = False
            rounds += 1
            if not active.any():
                break
            removed_mask = np.zeros(n, bool)
            removed_mask[batch] = True
            decs = ray.get(
                [_peel_decrements.remote(r, removed_mask, n) for r in refs]
            )
            deg -= np.sum(decs, axis=0)
    import logging

    logging.getLogger(__name__).info(
        "coreness: %d vertices, degeneracy %d, %d rounds", n, core.max(), rounds
    )
    return pa.table(
        {
            "v": pa.array(np.arange(n, dtype=np.int32), pa.int32()),
            "core": pa.array(core, pa.int64()),
        }
    )


def densest_subgraph(art: GraphArtifacts) -> pa.Table:
    """(best_density, n_vertices, n_edges, peel_level): greedy densest
    subgraph — the best-density suffix of the SAME level-batched
    Matula-Beck cascade coreness runs (Charikar's greedy 2-approximation:
    when the peel first removes a vertex of the optimal subgraph S*, that
    vertex still has degree ≥ ρ(S*) inside the snapshot, so the cascade
    level k ≥ ρ* and the snapshot density = avg_deg/2 ≥ k/2 ≥ ρ*/2).
    Deterministic — ties keep the earlier (larger) snapshot — so the
    semantic oracle replays the exact cascade independently. Same
    per-round cost/scale shape as ``coreness`` (remote bincounts over
    cached edge blocks + O(V) driver vectors)."""
    n = art.n_vertices
    refs = art.sym.materialize().to_arrow_refs()
    deg = np.zeros(n, np.int64)
    ddf = art.degrees.to_pandas()
    deg[ddf["v"].to_numpy()] = ddf["degree"].to_numpy()

    active = np.ones(n, bool)
    e_rem = int(deg.sum()) // 2
    best = (e_rem / n if n else 0.0, n, e_rem, 0)
    k = 0
    while active.any():
        k = max(k, int(deg[active].min()))
        while True:
            batch = np.flatnonzero(active & (deg <= k))
            if len(batch) == 0:
                break
            active[batch] = False
            if not active.any():
                break
            removed_mask = np.zeros(n, bool)
            removed_mask[batch] = True
            decs = ray.get(
                [_peel_decrements.remote(r, removed_mask, n) for r in refs]
            )
            deg -= np.sum(decs, axis=0)
            # deg[active] now counts active-to-active edges only, so the
            # remaining edge count is the half handshake sum
            e_rem = int(deg[active].sum()) // 2
            nv = int(active.sum())
            rho = e_rem / nv
            if rho > best[0]:
                best = (rho, nv, e_rem, k)
    from graphsetintersection_ray.functions.kernels import round_half_away

    return pa.table(
        {
            "best_density": pa.array(
                round_half_away(np.array([best[0]]), 6), pa.float64()
            ),
            "n_vertices": pa.array([best[1]], pa.int64()),
            "n_edges": pa.array([best[2]], pa.int64()),
            "peel_level": pa.array([best[3]], pa.int64()),
        }
    )


def _tomita(R: list, P: np.ndarray, X: np.ndarray, offsets, flat, out: list):
    """Bron-Kerbosch with Tomita pivoting (org_maximal_clique.cpp:169-314).
    P, X sorted int arrays; emits maximal cliques R∪... into out."""
    if len(P) == 0 and len(X) == 0:
        out.append(list(R))
        return
    # pivot: vertex of P∪X maximizing |N(pivot) ∩ P|
    best_u, best_cnt = -1, -1
    for u in np.concatenate([P, X]):
        c = len(intersect_sorted(P, flat[offsets[u]: offsets[u + 1]]))
        if c > best_cnt:
            best_cnt, best_u = c, int(u)
    pu_nbrs = flat[offsets[best_u]: offsets[best_u + 1]]
    candidates = np.setdiff1d(P, pu_nbrs, assume_unique=True)
    for v in candidates:
        nv = flat[offsets[v]: offsets[v + 1]]
        R.append(int(v))
        _tomita(
            R,
            intersect_sorted(P, nv),
            intersect_sorted(X, nv),
            offsets,
            flat,
            out,
        )
        R.pop()
        P = np.setdiff1d(P, [v], assume_unique=True)
        X = np.union1d(X, [v])


def _maximal_cliques_broadcast(art: GraphArtifacts) -> ray.data.Dataset:
    offsets, flat = _sym_csr_arrays(art)
    order = degeneracy_order(offsets, flat)
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order))
    state_ref = ray.put((offsets, flat, rank))

    def per_seed(t: pa.Table) -> pa.Table:
        offs, fl, rk = ray.get(state_ref)
        cliques: list[list[int]] = []
        for v in t["id"].to_numpy(zero_copy_only=False):
            v = int(v)
            nbrs = fl[offs[v]: offs[v + 1]]
            later = nbrs[rk[nbrs] > rk[v]]   # P: not yet peeled
            earlier = nbrs[rk[nbrs] < rk[v]]  # X: already peeled
            _tomita([v], later, earlier, offs, fl, cliques)
        strs = [",".join(map(str, sorted(c))) for c in cliques]
        return pa.table({"members_str": pa.array(strs, pa.string())})

    seeds = ray.data.range(art.n_vertices)
    return seeds.map_batches(per_seed, batch_format="pyarrow", batch_size=256)


def _egonet_bk(g: pd.DataFrame, rank_ref) -> pa.Table:
    """One seed's group: rows (u, w, nbrs_bin_w) covering all neighbors w
    of seed u with w's packed adjacency. Runs Tomita on the egonet."""
    rank = ray.get(rank_ref)
    u = int(g["u"].iloc[0])
    nbrs = np.sort(g["w"].to_numpy().astype(np.int64))
    # local relabel: egonet universe = N(u), restricted adjacency
    local_of = {int(w): i for i, w in enumerate(nbrs)}
    lists = []
    for w, blob in zip(g["w"], g["nbrs_bin"]):
        vals = (
            np.frombuffer(blob, dtype="<i4").astype(np.int64)
            if blob is not None and len(blob)
            else np.empty(0, np.int64)
        )
        inter = intersect_sorted(vals, nbrs)
        lists.append((int(w), inter))
    lists.sort(key=lambda t: local_of[t[0]])
    lens = np.array([len(x[1]) for x in lists], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    flat_global = (
        np.concatenate([x[1] for x in lists]) if lists else np.empty(0, np.int64)
    )
    # monotone relabel global → local (nbrs sorted, every value present),
    # so per-segment sortedness is preserved
    flat = np.searchsorted(nbrs, flat_global)
    rk_u = rank[u]
    rk_n = rank[nbrs]
    local_ids = np.arange(len(nbrs), dtype=np.int64)
    P = local_ids[rk_n > rk_u]
    X = local_ids[rk_n < rk_u]
    cliques: list[list[int]] = []
    _tomita([], P, X, offsets, flat, cliques)
    strs = [
        ",".join(map(str, sorted([u] + [int(nbrs[i]) for i in c])))
        for c in cliques
    ]
    return pa.table({"members_str": pa.array(strs, pa.string())})


def _maximal_cliques_distributed(art: GraphArtifacts) -> ray.data.Dataset:
    """At-scale path: distributed peel order + egonet assembly by hash
    join against the packed CSR; the driver never holds the edge table
    (only the O(V) order/rank vectors, broadcast once like the TC wedge
    state)."""
    from graphsetintersection_ray.stages.graph_build import (
        build_csr,
        compact_blocks,
    )

    order = distributed_peel_order(art)
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order))
    rank_ref = ray.put(rank)

    csr = compact_blocks(
        build_csr(art.sym, num_partitions=art.num_partitions, packed=True)
    ).materialize()

    def explode(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = t["nbrs_bin"].to_pylist()
        lens = np.fromiter(
            (0 if b is None else len(b) // 4 for b in blobs), np.int64,
            count=len(blobs),
        )
        flat = (
            np.frombuffer(b"".join(b for b in blobs if b), dtype="<i4")
            .astype(np.int64)
        )
        return pa.table(
            {
                "u": pa.array(np.repeat(u, lens), pa.int64()),
                "w": pa.array(flat, pa.int64()),
            }
        )

    pairs = compact_blocks(csr.map_batches(explode, batch_format="pyarrow"))
    joined = pairs.join(
        csr.map_batches(
            lambda t: pa.table(
                {"w2": t["u"].cast(pa.int64()), "nbrs_bin": t["nbrs_bin"]}
            ),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=art.num_partitions,
        on=("w",),
        right_on=("w2",),
    )
    # deliberately the NATIVE groupby (not the bounded bucket sort used
    # elsewhere): per-seed Tomita recursion is compute-heavy and wildly
    # skewed, so group-level task granularity (scheduler load-balances
    # seeds) beats pinning seeds to a fixed bucket count
    out = joined.groupby("u").map_groups(
        lambda g: _egonet_bk(g, rank_ref), batch_format="pandas"
    )
    # isolated vertices have no CSR row, so no explode/join group — their
    # singleton maximal cliques must be emitted separately (the broadcast
    # path seeds range(n_vertices) and gets them for free). O(V) driver
    # bitmap, consistent with the order/rank vectors this path already holds.
    present = np.zeros(art.n_vertices, bool)
    for b in csr.map_batches(
        lambda t: pa.table({"u": t["u"]}), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        present[b["u"].to_numpy(zero_copy_only=False)] = True
    singles = np.flatnonzero(~present)
    if len(singles):
        out = out.union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "members_str": pa.array(
                            [str(int(v)) for v in singles], pa.string()
                        )
                    }
                )
            )
        )
    return out


def maximal_cliques(art: GraphArtifacts) -> ray.data.Dataset:
    """(members_str:string) — every maximal clique of the symmetric graph
    exactly once, members sorted ascending (= the reference's save_answers
    record, org_maximal_clique.cpp:372-385, rendered hash-stable)."""
    if 2 * art.n_edges <= BROADCAST_MAX_EDGES:
        return _maximal_cliques_broadcast(art)
    return _maximal_cliques_distributed(art)


def clique_stats(art: GraphArtifacts) -> pa.Table:
    """(mc_num, max_clique_size) — the counts the reference prints
    (mc.cpp:36-47). Aggregated distributed (per-batch partials), not by
    iterating result rows on the driver."""
    mc = maximal_cliques(art)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()), "mx": pa.array([0], pa.int64())}
            )
        commas = pc.count_substring(t["members_str"], ",")
        sizes = pc.add(commas, 1)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "mx": pa.array([pc.max(sizes).as_py() or 0], pa.int64()),
            }
        )

    parts = mc.map_batches(partial, batch_format="pyarrow")
    n = parts.sum("n") or 0
    mx = parts.max("mx") or 0
    return pa.table(
        {
            "mc_num": pa.array([int(n)], pa.int64()),
            "max_clique_size": pa.array([int(mx)], pa.int64()),
        }
    )
