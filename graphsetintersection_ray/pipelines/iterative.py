"""PageRank / connected components / label propagation entry points.

Thin wrappers wiring GraphArtifacts into the partitioned BSP engine
(state/superstep.py). Semantics (per BASELINE.json north_star — the
reference has no PageRank/LP; CC discovery semantics appear in its
SlashBurn BFS, porder.cpp:1052-1075):

  * PageRank: power iteration, damping 0.85, on the symmetrized edge
    table; converges at global max per-vertex delta < tol (1e-6 default).
  * CC: min-label propagation to fixpoint — component id = min vertex id.
  * Label propagation: same min-rule fixpoint, kept as its own query.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from graphsetintersection_ray.functions.kernels import round_half_away
from graphsetintersection_ray.pipelines.graph import GraphArtifacts
from graphsetintersection_ray.state.superstep import SuperstepEngine

# LRU of live actor pools. Each cached engine holds csr_partitions
# PartitionWorker actors reserving 0.25 CPU apiece; an unbounded cache
# leaks those reservations across graphs until the NEXT engine's actor
# creation blocks forever waiting for CPU (observed as a full-suite
# pytest hang on a 4-CPU local cluster). Evicted engines have their
# worker pools killed; use is strictly within one query call, so
# evicting the least-recently-used engine is safe.
_ENGINES: dict[tuple, SuperstepEngine] = {}


def _engine_worker_budget() -> int:
    """Max total PartitionWorker actors kept alive across cached engines.
    At 0.25 CPU per worker the default (2x cluster CPUs) reserves at most
    half the cluster for idle cached pools, leaving the rest schedulable."""
    v = os.environ.get("GRAFT_ENGINE_WORKER_BUDGET")
    if v is not None:
        return int(v)
    import ray as _ray

    return max(8, 2 * int(_ray.cluster_resources().get("CPU", 4)))


def _collect_max_vertices() -> int:
    """Above this vertex count, iterative results stay a Ray Dataset (one
    block per partition, nothing concatenated on the driver); below it the
    driver concat is cheaper than Dataset overhead. Read at call time so
    tests can force the dataset path with GRAFT_COLLECT_MAX_VERTICES=0."""
    return int(os.environ.get("GRAFT_COLLECT_MAX_VERTICES", 2_000_000))


def _finalize(eng: SuperstepEngine, xform):
    """Apply a per-partition (row-local) ``pa.Table(v, state) -> pa.Table``
    transform to the engine's final state. At scale this is a streaming
    ``state_dataset().map_batches`` — the result never aggregates on the
    driver; consume it with write_parquet / iter_batches / further ops."""
    if eng.n_total > _collect_max_vertices():
        return eng.state_dataset().map_batches(xform, batch_format="pyarrow")
    return xform(eng.collect_state())


def release_engines() -> None:
    """Kill all cached PartitionWorker actor pools (frees their CPU
    reservations — call between pipeline stages in benchmarks)."""
    import ray as _ray

    for eng in _ENGINES.values():
        for w in eng.workers:
            _ray.kill(w)
    _ENGINES.clear()


def engine_for(art: GraphArtifacts, ckpt_dir: str | None = None) -> SuperstepEngine:
    import ray as _ray

    key = (art.csr_path, art.csr_partitions, ckpt_dir)
    if key in _ENGINES:
        _ENGINES[key] = _ENGINES.pop(key)  # refresh LRU position
        return _ENGINES[key]
    budget = _engine_worker_budget()
    while _ENGINES and (
        sum(len(e.workers) for e in _ENGINES.values()) + art.csr_partitions
        > budget
    ):
        lru_key = next(iter(_ENGINES))
        evicted = _ENGINES.pop(lru_key)
        for w in evicted.workers:
            _ray.kill(w)
    _ENGINES[key] = SuperstepEngine(
        art.csr_path,
        art.csr_partitions,
        ckpt_dir=ckpt_dir,
        graph_fingerprint=art.fingerprint,
    )
    return _ENGINES[key]


def pagerank(
    art: GraphArtifacts,
    max_iters: int = 100,
    tol: float = 1e-6,
    ckpt_dir: str | None = None,
    resume: bool = True,
    round_to: int | None = None,
) -> tuple:
    eng = engine_for(art, ckpt_dir)
    stats = eng.pagerank(max_iters=max_iters, tol=tol, resume=resume,
                         checkpoint_every=1 if ckpt_dir else 0)

    def xform(t: pa.Table) -> pa.Table:
        score = t["state"].to_numpy(zero_copy_only=False)
        if round_to is not None:
            # SQL ROUND() is half-away-from-zero; np.round is half-even and
            # disagrees on exactly-representable boundary values
            score = round_half_away(score, round_to)
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "score": pa.array(score, pa.float64())}
        )

    return _finalize(eng, xform), stats


def katz(
    art: GraphArtifacts,
    iters: int = 8,
    ckpt_dir: str | None = None,
    resume: bool = True,
    round_to: int | None = 6,
) -> tuple:
    """(v, katz): truncated Katz centrality — exactly ``iters`` affine
    supersteps x <- 1 + alpha*S.x from x = 0 (beta = 1, alpha = the
    dyadic KATZ_ALPHA = 2^-7) on the symmetric adjacency, so the value
    is the k-term Katz series sum alpha^j (S^j . 1) and an exact
    recursive-CTE SQL replay exists. Same partitioned-CSR BSP engine as
    pagerank (per-destination combiner, fused barriers, resumable)."""
    eng = engine_for(art, ckpt_dir)
    stats = eng.katz(iters=iters, resume=resume,
                     checkpoint_every=1 if ckpt_dir else 0)

    def xform(t: pa.Table) -> pa.Table:
        score = t["state"].to_numpy(zero_copy_only=False)
        if round_to is not None:
            score = round_half_away(score, round_to)
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "katz": pa.array(score, pa.float64())}
        )

    return _finalize(eng, xform), stats


def personalized_pagerank(
    art: GraphArtifacts,
    source: int = 0,
    max_iters: int = 100,
    tol: float = 1e-6,
    ckpt_dir: str | None = None,
    resume: bool = True,
    round_to: int | None = None,
) -> tuple:
    """(v, score): random walk with restart from ``source`` — same BSP
    power iteration as pagerank with the restart mass concentrated."""
    eng = engine_for(art, ckpt_dir)
    stats = eng.personalized_pagerank(
        source, max_iters=max_iters, tol=tol, resume=resume,
        checkpoint_every=1 if ckpt_dir else 0,
    )

    def xform(t: pa.Table) -> pa.Table:
        score = t["state"].to_numpy(zero_copy_only=False)
        if round_to is not None:
            score = round_half_away(score, round_to)
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "score": pa.array(score, pa.float64())}
        )

    return _finalize(eng, xform), stats


def bfs_distances(
    art: GraphArtifacts,
    source: int = 0,
    ckpt_dir: str | None = None,
    resume: bool = True,
) -> tuple:
    """(v, dist) unweighted shortest distances from ``source``; only
    reachable vertices are returned."""
    eng = engine_for(art, ckpt_dir)
    stats = eng.bfs(
        source, resume=resume, checkpoint_every=1 if ckpt_dir else 0
    )

    def xform(t: pa.Table) -> pa.Table:
        dist = t["state"].to_numpy(zero_copy_only=False)
        keep = dist < (1 << 60)
        return pa.table(
            {
                "v": pa.array(
                    t["v"].to_numpy(zero_copy_only=False)[keep].astype(np.int32)
                ),
                "dist": pa.array(dist[keep].astype(np.int64)),
            }
        )

    return _finalize(eng, xform), stats


def connected_components(
    art: GraphArtifacts,
    ckpt_dir: str | None = None,
    resume: bool = True,
) -> tuple:
    eng = engine_for(art, ckpt_dir)
    stats = eng.connected_components(
        resume=resume, checkpoint_every=1 if ckpt_dir else 0
    )

    def xform(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "component": t["state"].cast(pa.int64())}
        )

    return _finalize(eng, xform), stats


def label_propagation(
    art: GraphArtifacts,
    ckpt_dir: str | None = None,
    resume: bool = True,
) -> tuple:
    eng = engine_for(art, ckpt_dir)
    stats = eng.label_propagation(
        resume=resume, checkpoint_every=1 if ckpt_dir else 0
    )

    def xform(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "label": t["state"].cast(pa.int64())}
        )

    return _finalize(eng, xform), stats


WPR_ITERS = 5


def weighted_pagerank(
    art: GraphArtifacts, iters: int = WPR_ITERS, round_to: int | None = 6
) -> tuple:
    """(v, score): alpha-weighted PageRank — edge weight α_u·α_v with
    α = √degree (the R10 alpha surface as a weighting), which collapses
    to an unweighted neighbor sum of y = x/S on the same partitioned
    BSP engine (one α-sum pre-exchange + ``iters`` fixed supersteps).
    Exact recursive-CTE SQL replay."""
    eng = engine_for(art, None)
    stats = eng.weighted_pagerank(iters=iters)

    def xform(t: pa.Table) -> pa.Table:
        score = t["state" if "state" in t.column_names else "score"].to_numpy(
            zero_copy_only=False
        )
        if round_to is not None:
            score = round_half_away(score, round_to)
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "score": pa.array(score, pa.float64())}
        )

    if eng.n_total > _collect_max_vertices():
        return eng.wpr_dataset().map_batches(xform, batch_format="pyarrow"), stats
    return xform(eng.collect_wpr()), stats


MIS_SEED = 7


def mis(art: GraphArtifacts, seed: int = MIS_SEED) -> tuple:
    """(v, in_mis): deterministic Luby maximal independent set on the
    symmetric adjacency (seeded splitmix64 round priorities — exactly
    replayable, so the semantic oracle recomputes the full run). Two
    combiner exchanges per round on the partitioned CSR, O(log n)
    rounds."""
    eng = engine_for(art, None)
    stats = eng.mis(seed=seed)

    def xform(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "in_mis": t["in_mis"]}
        )

    if eng.n_total > _collect_max_vertices():
        return eng.mis_dataset().map_batches(xform, batch_format="pyarrow"), stats
    return xform(eng.collect_mis()), stats


def greedy_coloring(art: GraphArtifacts, seed: int = MIS_SEED) -> tuple:
    """(v, color): deterministic greedy coloring by iterated Luby-MIS
    layers on the symmetric adjacency (layer c = a full seeded MIS on
    the residual uncolored graph). Proper by construction — two adjacent
    vertices can never join the same layer's independent set; exactly
    replayable driver-side (the semantic oracle recomputes the run)."""
    eng = engine_for(art, None)
    stats = eng.greedy_coloring(seed=seed)

    def xform(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "color": t["color"]}
        )

    if eng.n_total > _collect_max_vertices():
        return (
            eng.coloring_dataset().map_batches(xform, batch_format="pyarrow"),
            stats,
        )
    return xform(eng.collect_coloring()), stats


def ensure_directed_csr(art: GraphArtifacts) -> tuple[str, str]:
    """Build (once, manifest-guarded) the DIRECTED CSR pair next to the
    symmetric one: out-CSR partitioned by src, in-CSR (reversed edges)
    partitioned by dst — the adjacency HITS walks in both directions."""
    import json

    import pyarrow as _pa

    from graphsetintersection_ray.stages import graph_build as gb

    base = os.path.dirname(art.csr_path)
    out_path = os.path.join(base, "csr_out")
    in_path = os.path.join(base, "csr_in")
    manifest = os.path.join(base, "_directed_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            m = json.load(f)
        if (
            m.get("fingerprint") == art.fingerprint
            and m.get("csr_partitions") == art.csr_partitions
        ):
            return out_path, in_path

    def rev(t: _pa.Table) -> _pa.Table:
        return _pa.table({"src": t["dst"], "dst": t["src"]})

    from graphsetintersection_ray.stages.shuffle import sized_buckets

    buckets = max(
        art.csr_partitions, sized_buckets(2 * art.n_edges, rows_per_bucket=250_000)
    )
    for path, edges in (
        (out_path, art.edges),
        (in_path, art.edges.map_batches(rev, batch_format="pyarrow")),
    ):
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        csr = gb.build_csr(
            edges, num_partitions=art.csr_partitions, shuffle_buckets=buckets
        )
        gb.write_csr_dataset(csr, path, art.csr_partitions)
    with open(manifest, "w") as f:
        json.dump(
            {"fingerprint": art.fingerprint, "csr_partitions": art.csr_partitions},
            f,
        )
    return out_path, in_path


def hits(
    art: GraphArtifacts,
    iters: int = 6,
    round_to: int | None = None,
) -> tuple:
    """(v, hub, auth): HITS on the canonical directed edge set — ``iters``
    unnormalized power iterations (linear updates, so the single final L2
    normalization matches per-iteration normalization exactly), giving a
    chained-CTE SQL oracle."""
    eng = engine_for(art, None)
    out_path, in_path = ensure_directed_csr(art)
    stats = eng.hits(out_path, in_path, iters=iters)

    def xform(t: pa.Table) -> pa.Table:
        hub = t["hub"].to_numpy(zero_copy_only=False)
        auth = t["auth"].to_numpy(zero_copy_only=False)
        if round_to is not None:
            hub = round_half_away(hub, round_to)
            auth = round_half_away(auth, round_to)
        return pa.table(
            {
                "v": t["v"].cast(pa.int32()),
                "hub": pa.array(hub, pa.float64()),
                "auth": pa.array(auth, pa.float64()),
            }
        )

    if eng.n_total > _collect_max_vertices():
        return eng.hits_dataset().map_batches(xform, batch_format="pyarrow"), stats
    return xform(eng.collect_hits()), stats


def topo_levels(art: GraphArtifacts) -> tuple:
    """(v, level): longest-path DAG levels (dependency / scheduling
    depth) on the canonical directed edge set — level[v] = length of the
    longest directed path ending at v, 0 for sources. A monotone
    MAX-label superstep fixpoint on the partitioned out-CSR (one
    pre-aggregated all-to-all per round, rounds = longest path). The
    canonical encoding guarantees acyclicity (src < dst), which the
    engine enforces with a loud cycle guard. Beyond the reference's
    operator set; recursive-CTE SQL oracle (level UNION-deduped per
    round, rows bounded by V x depth)."""
    eng = engine_for(art, None)
    out_path, in_path = ensure_directed_csr(art)
    stats = eng.topo_levels(out_path, in_path)

    def xform(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t["v"].cast(pa.int32()),
                "level": t["level"],
            }
        )

    if eng.n_total > _collect_max_vertices():
        return (
            eng.topo_dataset().map_batches(xform, batch_format="pyarrow"),
            stats,
        )
    return xform(eng.collect_topo()), stats


def ensure_symmetric_csr_pair(art: GraphArtifacts) -> str:
    """Build (once, manifest-guarded) a symmetric-adjacency CSR in the
    out/in on-disk format next to the engine's partitioned CSR — the
    adjacency the eigenvector power iteration walks (out = in = S)."""
    import json

    from graphsetintersection_ray.stages import graph_build as gb

    base = os.path.dirname(art.csr_path)
    sym_path = os.path.join(base, "csr_symdir")
    manifest = os.path.join(base, "_symdir_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            m = json.load(f)
        if (
            m.get("fingerprint") == art.fingerprint
            and m.get("csr_partitions") == art.csr_partitions
        ):
            return sym_path
    if os.path.isdir(sym_path):
        import shutil

        shutil.rmtree(sym_path)
    from graphsetintersection_ray.stages.shuffle import sized_buckets

    buckets = max(
        art.csr_partitions, sized_buckets(2 * art.n_edges, rows_per_bucket=250_000)
    )
    csr = gb.build_csr(
        art.sym, num_partitions=art.csr_partitions, shuffle_buckets=buckets
    )
    gb.write_csr_dataset(csr, sym_path, art.csr_partitions)
    with open(manifest, "w") as f:
        json.dump(
            {"fingerprint": art.fingerprint, "csr_partitions": art.csr_partitions},
            f,
        )
    return sym_path


def eigenvector(
    art: GraphArtifacts,
    multiplies: int = 8,
    round_to: int | None = 6,
) -> tuple:
    """(v, eig): eigenvector centrality — ``multiplies`` unnormalized
    symmetric power iterations x ← S·x from x = 1, then ONE global L2
    normalization (linear updates, so this equals per-iteration
    normalization exactly), giving an exact chained-CTE SQL oracle.

    Rides the HITS superstep machinery with out-CSR = in-CSR = the
    symmetric adjacency: hub after ``multiplies``/2 HITS rounds is
    S^multiplies · 1."""
    assert multiplies % 2 == 0, "multiplies must be even (2 per HITS round)"
    eng = engine_for(art, None)
    sym_path = ensure_symmetric_csr_pair(art)
    stats = eng.hits(sym_path, sym_path, iters=multiplies // 2)

    def xform(t: pa.Table) -> pa.Table:
        eig = t["hub"].to_numpy(zero_copy_only=False)
        if round_to is not None:
            eig = round_half_away(eig, round_to)
        return pa.table(
            {
                "v": t["v"].cast(pa.int32()),
                "eig": pa.array(eig, pa.float64()),
            }
        )

    if eng.n_total > _collect_max_vertices():
        return (
            eng.hits_dataset().map_batches(xform, batch_format="pyarrow"),
            stats,
        )
    return xform(eng.collect_hits()), stats


def neighborhood_function(
    art: GraphArtifacts, m: int = 256, seed: int = 77
) -> tuple:
    """(radius, est_reachable): HyperBall approximate neighborhood
    function — est_reachable[t] ≈ Σ_v |ball(v, t)| on the symmetric
    graph, grown to the fixpoint radius (= graph diameter on each
    component)."""
    eng = engine_for(art, None)
    stats = eng.hyperball(m=m, seed=seed)
    nf = stats["nf"]
    return (
        pa.table(
            {
                "radius": pa.array(np.arange(len(nf), dtype=np.int64)),
                "est_reachable": pa.array(
                    round_half_away(np.asarray(nf, np.float64), 4), pa.float64()
                ),
            }
        ),
        stats,
    )


def effective_diameter(art: GraphArtifacts, alpha: float = 0.9) -> pa.Table:
    """(eff_diameter, max_radius): interpolated effective diameter — the
    radius at which the HyperBall neighborhood function reaches
    ``alpha`` of its fixpoint value (Palmer/WebGraph definition:
    linear interpolation between the bracketing radii). max_radius is
    the fixpoint radius = exact diameter of the largest component
    (HyperBall growth stops exactly when every ball stops growing).
    Driver work is O(diameter) on the tiny nf table."""
    tbl, _ = neighborhood_function(art)
    nf = tbl["est_reachable"].to_numpy(zero_copy_only=False)
    # HLL estimates can dip locally when a radius crosses the
    # linear-counting/raw-estimate switch; searchsorted assumes a sorted
    # series, so enforce monotonicity (preserves the fixpoint value)
    nf = np.maximum.accumulate(nf)
    target = alpha * nf[-1]
    t = int(np.searchsorted(nf, target))
    if t == 0:
        eff = 0.0
    else:
        eff = t - 1 + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
    return pa.table(
        {
            "eff_diameter": pa.array(
                [round(float(eff), 4)], pa.float64()
            ),
            "max_radius": pa.array([len(nf) - 1], pa.int64()),
        }
    )
