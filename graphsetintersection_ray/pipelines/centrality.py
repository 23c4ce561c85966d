"""Betweenness centrality — sampled-source Brandes, parallel over sources.

Brandes' algorithm is a sum of independent per-source contributions, so
the distributed shape is: broadcast the CSR once (``ray.put``), fan the
source set out as a Dataset, run one vectorized Brandes pass per source
inside ``map_batches`` (per-LEVEL numpy kernels — no per-edge Python),
emit per-batch partial centrality rows, and reduce with one bounded
(v) sum shuffle. Sources are value-defined (stride sampling) so runs
are replayable.

Two gated paths, equal by test (like closeness/harmonic): under
``BC_BROADCAST_MAX_EDGES`` the per-source pass probes a broadcast flat
CSR; above it, per-source Brandes supersteps on the partitioned CSR
(forward σ-BFS + reverse level-order dependency sweep in
state/superstep.py) — no broadcast adjacency, so the at-scale graph
runs with sources sampled exactly like pivot closeness.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from graphsetintersection_ray.functions.kernels import round_half_away
from graphsetintersection_ray.pipelines.graph import GraphArtifacts

BC_BROADCAST_MAX_EDGES = int(
    os.environ.get("GRAFT_BC_BROADCAST_MAX_EDGES", 50_000_000)
)


def _flat_csr(art: GraphArtifacts) -> tuple[np.ndarray, np.ndarray]:
    edf = art.sym.to_pandas()
    src = edf["src"].to_numpy().astype(np.int64)
    dst = edf["dst"].to_numpy().astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.concatenate(
        ([0], np.cumsum(np.bincount(src, minlength=art.n_vertices)))
    )
    return indptr, dst


def brandes_source(
    s: int, indptr: np.ndarray, dst: np.ndarray, n: int
) -> np.ndarray:
    """One source's dependency vector δ_s (textbook Brandes), with
    per-LEVEL vectorized expansion and accumulation."""
    dist = np.full(n, -1, np.int64)
    sigma = np.zeros(n, np.float64)
    dist[s] = 0
    sigma[s] = 1.0
    frontier = np.array([s], np.int64)
    level_edges = []  # (u_arr, w_arr) tree/DAG edges per level
    while len(frontier):
        lens = indptr[frontier + 1] - indptr[frontier]
        total = int(lens.sum())
        if total == 0:
            break
        u_rep = np.repeat(frontier, lens)
        starts = np.repeat(indptr[frontier], lens)
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        w = dst[starts + within]
        newly = dist[w] == -1
        if newly.any():
            dist[w[newly]] = dist[u_rep[newly]] + 1
        on_dag = dist[w] == dist[u_rep] + 1
        u_e, w_e = u_rep[on_dag], w[on_dag]
        np.add.at(sigma, w_e, sigma[u_e])
        level_edges.append((u_e, w_e))
        frontier = np.unique(w[newly])
    delta = np.zeros(n, np.float64)
    for u_e, w_e in reversed(level_edges):
        np.add.at(
            delta, u_e, sigma[u_e] / sigma[w_e] * (1.0 + delta[w_e])
        )
    delta[s] = 0.0
    return delta


def betweenness(
    art: GraphArtifacts, n_sources: int | None = None, num_buckets: int = 32
) -> rd.Dataset:
    """(v, bc): betweenness centrality — exact when ``n_sources`` is
    None (every vertex a source), else estimated from a value-defined
    stride sample of sources scaled by n/|S|. Undirected convention:
    each pair counted once (sum of dependencies / 2), rounded to 6."""
    import ray as _ray

    from graphsetintersection_ray.stages.shuffle import sum_by

    n = art.n_vertices
    if n_sources is None or n_sources >= n:
        _sources = np.arange(n, dtype=np.int64)
        _scale = 1.0
    else:
        _stride = int(np.ceil(n / n_sources))
        _sources = np.arange(0, n, _stride, dtype=np.int64)
        _scale = n / len(_sources)
    if 2 * art.n_edges > BC_BROADCAST_MAX_EDGES:
        # AT-SCALE path: per-source Brandes supersteps on the partitioned
        # CSR (forward σ-BFS + reverse dependency sweep, superstep.py),
        # no broadcast adjacency. Same estimator semantics as below;
        # production runs at open-domain scale sample sources.
        from graphsetintersection_ray.pipelines.iterative import engine_for

        eng = engine_for(art, None)
        eng.brandes(_sources)

        def finish_ss(t: pa.Table) -> pa.Table:
            bc = t["part"].to_numpy(zero_copy_only=False) * (_scale / 2.0)
            return pa.table(
                {
                    "v": t["v"].cast(pa.int32()),
                    "bc": pa.array(round_half_away(bc, 6), pa.float64()),
                }
            )

        return eng.brandes_dataset().map_batches(
            finish_ss, batch_format="pyarrow"
        )
    indptr, dst = _flat_csr(art)
    ref = _ray.put((indptr, dst))
    sources, scale = _sources, _scale

    def batch_bc(t: pa.Table) -> pa.Table:
        indptr_, dst_ = _ray.get(ref)
        acc = np.zeros(n, np.float64)
        for s in t["s"].to_numpy(zero_copy_only=False):
            acc += brandes_source(int(s), indptr_, dst_, n)
        nz = np.flatnonzero(acc)
        return pa.table(
            {
                "v": pa.array(nz.astype(np.int32), pa.int32()),
                "part": pa.array(acc[nz], pa.float64()),
            }
        )

    src_ds = rd.from_arrow(
        pa.table({"s": pa.array(sources)})
    ).repartition(min(32, max(1, len(sources) // 8)))
    parts = src_ds.map_batches(batch_bc, batch_format="pyarrow")
    summed = sum_by(parts, ["v"], "part", out_col="bc", num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        bc = t["bc"].to_numpy(zero_copy_only=False) * (scale / 2.0)
        return pa.table(
            {
                "v": t["v"],
                "bc": pa.array(round_half_away(bc, 6), pa.float64()),
            }
        )

    out = summed.map_batches(finish, batch_format="pyarrow")

    # vertices with zero centrality (leaves) still get a row — O(V)
    # driver bitmap, same pattern as the clique singleton sweep
    present = out.materialize()
    seen = np.zeros(n, bool)
    for b in present.map_batches(
        lambda t: t.select(["v"]), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        seen[b["v"].to_numpy(zero_copy_only=False)] = True
    missing = np.flatnonzero(~seen).astype(np.int32)
    if len(missing):
        present = present.union(
            rd.from_arrow(
                pa.table(
                    {
                        "v": pa.array(missing, pa.int32()),
                        "bc": pa.array(
                            np.zeros(len(missing), np.float64)
                        ),
                    }
                )
            )
        )
    return present


def _closeness_partials_superstep(
    art: GraphArtifacts, sources: np.ndarray
) -> rd.Dataset:
    """(v, sum_d, reach) partials over ``sources`` via one superstep BFS
    per source — the AT-SCALE path: the partitioned-CSR BSP engine, no
    broadcast adjacency. Cost = |sources| × (diameter supersteps), which
    is why production closeness on huge graphs samples pivot sources."""
    from graphsetintersection_ray.pipelines import iterative as it

    parts = []
    for s in sources:
        dist_ds, _ = it.bfs_distances(art, source=int(s), resume=False)
        if not isinstance(dist_ds, rd.Dataset):
            dist_ds = rd.from_arrow(
                pa.Table.from_pandas(dist_ds, preserve_index=False)
                if isinstance(dist_ds, pd.DataFrame)
                else dist_ds
            )
        parts.append(
            dist_ds.map_batches(
                lambda t: pa.table(
                    {
                        "v": t["v"].cast(pa.int32()),
                        "sum_d": t["dist"].cast(pa.int64()),
                        "reach": pa.array(
                            np.ones(t.num_rows, np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def closeness(
    art: GraphArtifacts,
    num_buckets: int = 32,
    sources: np.ndarray | None = None,
) -> rd.Dataset:
    """(v, closeness): closeness centrality
    (reach_v − 1) / Σ dist(v, ·), rounded to 6 (0.0 for vertices with
    no co-reachable peers) — EXACT when ``sources`` is None (every
    vertex a source); with an explicit source subset, the restricted
    sums (the standard pivot-sampling estimator's ingredients).

    Two paths, equal by test: under ``BC_BROADCAST_MAX_EDGES`` a
    broadcast flat CSR with one vectorized BFS per source; above it one
    superstep BFS per source on the partitioned-CSR BSP engine (no
    broadcast — the at-scale route, which is why huge graphs sample
    sources). Distances are symmetric on the undirected graph, so
    accumulating per-source distance vectors yields every vertex's
    total distance exactly."""
    import ray as _ray

    from graphsetintersection_ray.stages.shuffle import sum_by

    n = art.n_vertices
    if sources is None:
        src_arr = np.arange(n, dtype=np.int64)
    else:
        src_arr = np.asarray(sources, np.int64)

    if 2 * art.n_edges > BC_BROADCAST_MAX_EDGES:
        parts = _closeness_partials_superstep(art, src_arr)
        summed = sum_by(
            parts, ["v"], ["sum_d", "reach"], num_buckets=num_buckets
        )
        return summed.map_batches(
            _closeness_finish, batch_format="pyarrow"
        )
    indptr, dst = _flat_csr(art)
    ref = _ray.put((indptr, dst))

    def batch_close(t: pa.Table) -> pa.Table:
        indptr_, dst_ = _ray.get(ref)
        acc_d = np.zeros(n, np.int64)
        acc_r = np.zeros(n, np.int64)
        for s in t["s"].to_numpy(zero_copy_only=False):
            dist = np.full(n, -1, np.int64)
            dist[s] = 0
            frontier = np.array([int(s)], np.int64)
            level = 0
            while len(frontier):
                lens = indptr_[frontier + 1] - indptr_[frontier]
                total = int(lens.sum())
                if total == 0:
                    break
                starts = np.repeat(indptr_[frontier], lens)
                within = np.arange(total) - np.repeat(
                    np.concatenate(([0], np.cumsum(lens)[:-1])), lens
                )
                w = dst_[starts + within]
                nxt = np.unique(w[dist[w] == -1])
                if not len(nxt):
                    break
                level += 1
                dist[nxt] = level
                frontier = nxt
            reached = dist >= 0
            acc_d[reached] += dist[reached]
            acc_r[reached] += 1
        nz = np.flatnonzero(acc_r)
        return pa.table(
            {
                "v": pa.array(nz.astype(np.int32), pa.int32()),
                "sum_d": pa.array(acc_d[nz], pa.int64()),
                "reach": pa.array(acc_r[nz], pa.int64()),
            }
        )

    src_ds = rd.from_arrow(
        pa.table({"s": pa.array(src_arr)})
    ).repartition(min(32, max(1, len(src_arr) // 8)))
    summed = sum_by(
        src_ds.map_batches(batch_close, batch_format="pyarrow"),
        ["v"],
        ["sum_d", "reach"],
        num_buckets=num_buckets,
    )
    return summed.map_batches(_closeness_finish, batch_format="pyarrow")


def _closeness_finish(t: pa.Table) -> pa.Table:
    sd = t["sum_d"].to_numpy(zero_copy_only=False).astype(np.float64)
    rc = t["reach"].to_numpy(zero_copy_only=False).astype(np.float64)
    cl = np.where(sd > 0, (rc - 1.0) / np.maximum(sd, 1.0), 0.0)
    return pa.table(
        {
            "v": t["v"],
            "closeness": pa.array(round_half_away(cl, 6), pa.float64()),
        }
    )


def _harmonic_reduce(batch: pd.DataFrame) -> pa.Table:
    """Per-bucket reduce: all of a vertex's (v, d, cnt) rows share the
    bucket, so the float series Σ cnt_d/d evaluates over a value-defined
    ascending-d row order — deterministic across runs and cluster sizes.
    d == 0 self rows contribute 0 but keep every vertex present."""
    if batch.empty:
        return pa.table(
            {
                "v": pa.array([], pa.int32()),
                "harmonic": pa.array([], pa.float64()),
            }
        )
    g = (
        batch.groupby(["v", "d"], sort=True)["cnt"].sum().reset_index()
    )
    d = g["d"].to_numpy(np.float64)
    part = np.where(
        d > 0, g["cnt"].to_numpy(np.float64) / np.maximum(d, 1.0), 0.0
    )
    g = g.assign(part=part)
    out = g.groupby("v", sort=True)["part"].sum().reset_index()
    return pa.table(
        {
            "v": pa.array(out["v"].to_numpy().astype(np.int32), pa.int32()),
            "harmonic": pa.array(
                round_half_away(out["part"].to_numpy(), 6), pa.float64()
            ),
        }
    )


def harmonic(
    art: GraphArtifacts,
    num_buckets: int = 32,
    sources: np.ndarray | None = None,
) -> rd.Dataset:
    """(v, harmonic): harmonic centrality Σ_{u≠v, u reachable} 1/d(u,v),
    rounded to 6 — EXACT when ``sources`` is None (every vertex a
    source; distances are symmetric on the undirected graph so
    accumulating per-source distance vectors covers every vertex's sum).

    Deterministic by construction: the shuffle carries only INTEGER
    per-distance counts (v, d, cnt); the float series Σ cnt_d/d
    evaluates once per vertex over a value-defined ascending-d order in
    the reduce — no float accumulates across blocks, so the result is
    reduction-order-free at any parallelism. Same two gated paths as
    ``closeness``: broadcast flat CSR + vectorized per-source BFS under
    ``BC_BROADCAST_MAX_EDGES``, one superstep BFS per source on the
    partitioned-CSR BSP engine above it (sample sources at open-domain
    scale — cost is |sources| × diameter supersteps)."""
    import ray as _ray

    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
    )

    n = art.n_vertices
    if sources is None:
        src_arr = np.arange(n, dtype=np.int64)
    else:
        src_arr = np.asarray(sources, np.int64)

    def to_bucketed(df: pd.DataFrame) -> pd.DataFrame:
        part = (
            df.groupby(["v", "d"], sort=False)["cnt"].sum().reset_index()
        )
        return _add_bucket(part, ["v"], num_buckets)

    if 2 * art.n_edges > BC_BROADCAST_MAX_EDGES:
        from graphsetintersection_ray.pipelines import iterative as it

        parts = []
        for s in src_arr:
            dist_ds, _ = it.bfs_distances(art, source=int(s), resume=False)
            if not isinstance(dist_ds, rd.Dataset):
                dist_ds = rd.from_arrow(
                    pa.Table.from_pandas(dist_ds, preserve_index=False)
                    if isinstance(dist_ds, pd.DataFrame)
                    else dist_ds
                )
            parts.append(
                dist_ds.map_batches(
                    lambda t: to_bucketed(
                        pd.DataFrame(
                            {
                                "v": t["v"]
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int32),
                                "d": t["dist"]
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64),
                                "cnt": np.ones(t.num_rows, np.int64),
                            }
                        )
                    ),
                    batch_format="pyarrow",
                )
            )
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return bucket_groups(ds, _harmonic_reduce, num_buckets)

    indptr, dst = _flat_csr(art)
    ref = _ray.put((indptr, dst))

    def batch_counts(t: pa.Table) -> pd.DataFrame:
        indptr_, dst_ = _ray.get(ref)
        levels: dict[int, np.ndarray] = {}
        for s in t["s"].to_numpy(zero_copy_only=False):
            dist = np.full(n, -1, np.int64)
            dist[s] = 0
            frontier = np.array([int(s)], np.int64)
            level = 0
            while len(frontier):
                lens = indptr_[frontier + 1] - indptr_[frontier]
                total = int(lens.sum())
                if total == 0:
                    break
                starts = np.repeat(indptr_[frontier], lens)
                within = np.arange(total) - np.repeat(
                    np.concatenate(([0], np.cumsum(lens)[:-1])), lens
                )
                w = dst_[starts + within]
                nxt = np.unique(w[dist[w] == -1])
                if not len(nxt):
                    break
                level += 1
                dist[nxt] = level
                frontier = nxt
            for lv in range(level + 1):
                acc = levels.setdefault(lv, np.zeros(n, np.int64))
                acc[dist == lv] += 1
        rows_v, rows_d, rows_c = [], [], []
        for lv, acc in levels.items():
            nz = np.flatnonzero(acc)
            rows_v.append(nz)
            rows_d.append(np.full(len(nz), lv, np.int64))
            rows_c.append(acc[nz])
        if not rows_v:
            empty = pd.DataFrame(
                {
                    "v": np.array([], np.int32),
                    "d": np.array([], np.int64),
                    "cnt": np.array([], np.int64),
                }
            )
            return _add_bucket(empty, ["v"], num_buckets)
        return to_bucketed(
            pd.DataFrame(
                {
                    "v": np.concatenate(rows_v).astype(np.int32),
                    "d": np.concatenate(rows_d),
                    "cnt": np.concatenate(rows_c),
                }
            )
        )

    src_ds = rd.from_arrow(
        pa.table({"s": pa.array(src_arr)})
    ).repartition(min(32, max(1, len(src_arr) // 8)))
    counts = src_ds.map_batches(batch_counts, batch_format="pyarrow")
    return bucket_groups(counts, _harmonic_reduce, num_buckets)
