"""Maximal clique enumeration (reference mc: Q3-Q5).

Reference semantics (org_maximal_clique.cpp / bitpack_maximal_clique.cpp):
degeneracy-order driver — peel vertices in degeneracy order (bucket queue,
org_maximal_clique.cpp:316-370); for each seed v, enumerate maximal
cliques containing v with P = not-yet-peeled neighbors, X = already-peeled
neighbors, via Tomita-pivot Bron-Kerbosch (org_maximal_clique.cpp:169-314).
Every maximal clique is reported exactly once.

Ray design: the degeneracy order is computed once (exact bucket-queue peel
— driver-side under the broadcast threshold; a distributed iterative
k-core peel is the documented at-scale path), the adjacency is broadcast
via ray.put, and the per-seed Tomita recursions — each bounded by the
seed's egonet — run as a ``map_batches`` stage over the seed vertices
(embarrassingly parallel, the heavy tail seeds spread across the pool).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphsetintersection_ray.functions.kernels import intersect_sorted
from graphsetintersection_ray.pipelines.graph import GraphArtifacts


def _sym_csr_arrays(art: GraphArtifacts):
    """Driver-side dense CSR of the symmetric adjacency (sorted nbrs)."""
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


def maximal_cliques(art: GraphArtifacts) -> ray.data.Dataset:
    """(clique_id:int64, members_str:string) — every maximal clique of the
    symmetric graph exactly once, members sorted ascending (= the
    reference's save_answers record, org_maximal_clique.cpp:372-385,
    rendered hash-stable)."""
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


def clique_stats(art: GraphArtifacts) -> pa.Table:
    """(mc_num, max_clique_size) — the counts the reference prints
    (mc.cpp:36-47)."""
    mc = maximal_cliques(art)
    sizes = []
    for b in mc.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for s in b["members_str"].to_pylist():
            sizes.append(s.count(",") + 1)
    return pa.table(
        {
            "mc_num": pa.array([len(sizes)], pa.int64()),
            "max_clique_size": pa.array(
                [max(sizes) if sizes else 0], pa.int64()
            ),
        }
    )
