"""Benchmark harness.

Headline suite (one JSON line to stdout):
  * sf pipeline  — full transcript→graph build, exact TC, 10 PageRank
    supersteps, CC to fixpoint on $GRAFT_SF_DIR (default sf0.1).
  * synth graph  — deterministic synthetic transcript corpus (seeded; no
    external data) large enough to stress the kernels, same stages.
  * throughput   — intersections/sec (oriented edges / TC kernel wall) and
    PageRank edge-traversals/sec (iters x directed edges / PR wall), per
    BASELINE.json's metric.

The suite runs GRAFT_BENCH_TRIALS (default 3) full timed passes and
reports the per-stage minimum: the shared sandbox host swings +-60% on
identical runs (BASELINE.md), so a single shot mostly samples co-tenant
load. Per-trial totals are recorded in the JSON for transparency.

--scaling: runs this same bench in TWO fresh processes
(RAY_GRAFT_CPUS=8 and =32) on identical input and reports both wall
times plus scaling efficiency — the sandbox evidence for the N→4N
cluster-size criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# GRAFT_PIN_CPUS=1: pin this process (and every Ray child it forks —
# raylet, object store, workers inherit the mask) to physical cores
# 0..NUM_CPUS-1. ray.init(num_cpus=N) caps SCHEDULER SLOTS only: actor
# pools requesting fractional cpus (superstep PartitionWorker at 0.25)
# schedule more OS processes than N, and the OS then spreads them over
# all 32 physical cores — the lo level of a scaling pair silently runs
# on hi-level hardware (measured: "8-cpu" PR at 77-158M edges/s, above
# the honest 8-core bandwidth share). Affinity makes an N-cpu level
# mean N cores the way an N-node cluster means N nodes' hardware.
PIN_CPUS = os.environ.get("GRAFT_PIN_CPUS") == "1"
if PIN_CPUS and hasattr(os, "sched_setaffinity"):
    os.sched_setaffinity(0, set(range(NUM_CPUS)))
# partitions track the worker count, exactly as a real N- vs 4N-node
# cluster would be provisioned (results are partition-count-invariant);
# override with GRAFT_PARTITIONS to pin a fixed plan across levels
NUM_PARTITIONS = int(
    os.environ.get("GRAFT_PARTITIONS", str(max(8, NUM_CPUS)))
)
SYNTH_CONVS = int(os.environ.get("GRAFT_SYNTH_CONVS", "150000"))
SYNTH_TOOLS = int(os.environ.get("GRAFT_SYNTH_TOOLS", "4000"))
PR_ITERS = 10
# The sandbox host is shared with co-tenants (BASELINE.md measured +-60%
# wall-clock swings on identical runs), so a single-shot suite is mostly a
# co-tenancy sample. The suite therefore runs TRIALS full passes and
# reports the per-stage minimum (steady-state methodology; per-trial
# totals are recorded alongside for transparency).
BENCH_TRIALS = int(os.environ.get("GRAFT_BENCH_TRIALS", "3"))


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from graphsetintersection_ray.pipelines.graph import (
        build_graph_from_transcripts,
        transcripts_from_sf,
    )
    from graphsetintersection_ray.pipelines.iterative import (
        engine_for,
        release_engines,
    )
    from graphsetintersection_ray.pipelines.triangle import global_triangle_count
    from graphsetintersection_ray.sources.transcripts import synth_transcripts

    # steady-state warm-up: spawn the full worker-process pool (Ray starts
    # workers lazily — without this, the first timed stage pays ~NUM_CPUS
    # process forks) and warm the page cache for the input parquet
    @ray.remote
    def _noop() -> int:
        return 0

    ray.get([_noop.remote() for _ in range(NUM_CPUS * 2)])
    ray.data.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()
    transcripts_from_sf(SF_DIR).count()

    def suite_once(trial: int) -> tuple[dict, dict]:
        """One full timed pass. ``trial`` salts the build cache keys so a
        later pass re-does the real shuffle work instead of hitting the
        in-process artifact cache."""
        queries: dict[str, float] = {}
        extras: dict[str, float] = {}

        # -- sf pipeline ---------------------------------------------------
        t0 = time.time()
        art = build_graph_from_transcripts(
            transcripts_from_sf(SF_DIR),
            cache_key=f"bench:{SF_DIR}:t{trial}",
            num_partitions=NUM_PARTITIONS,
        )
        queries["sf_graph_build"] = round(time.time() - t0, 3)

        # untimed warm-up (worker pool spin-up, broadcast-state
        # distribution), then the timed steady-state run — throughput is a
        # steady-state metric
        global_triangle_count(
            art.oriented, num_partitions=NUM_PARTITIONS,
            n_vertices=art.n_vertices, n_edges=art.n_edges,
        )
        t0 = time.time()
        tri = global_triangle_count(art.oriented, num_partitions=NUM_PARTITIONS, n_vertices=art.n_vertices, n_edges=art.n_edges)
        queries["sf_triangle_count"] = round(time.time() - t0, 3)
        extras["sf_triangles"] = tri
        extras["sf_edges"] = art.n_edges
        extras["sf_vertices"] = art.n_vertices

        eng = engine_for(art)
        t0 = time.time()
        eng.pagerank(max_iters=PR_ITERS, tol=0.0, resume=False, checkpoint_every=0)
        queries["sf_pagerank_10it"] = round(time.time() - t0, 3)

        t0 = time.time()
        eng.connected_components(resume=False, checkpoint_every=0)
        queries["sf_cc"] = round(time.time() - t0, 3)
        release_engines()  # free actor CPU reservations before the next stage

        # side metric (NOT part of the headline value): the per-edge
        # support family — reuses the cached wedge state, so this times the
        # corner-relation aggregation alone
        from graphsetintersection_ray.pipelines.linkpred import edge_support

        t0 = time.time()
        edge_support(art).count()
        extras["sf_edge_support_sec"] = round(time.time() - t0, 3)

        # -- synthetic corpus (the scale workload) -------------------------
        t0 = time.time()
        synth = synth_transcripts(SYNTH_CONVS, n_tools=SYNTH_TOOLS, seed=42)
        sart = build_graph_from_transcripts(
            synth,
            cache_key=f"bench:synth:{SYNTH_CONVS}:{SYNTH_TOOLS}:t{trial}",
            num_partitions=NUM_PARTITIONS,
        )
        queries["synth_graph_build"] = round(time.time() - t0, 3)
        extras["synth_edges"] = sart.n_edges
        extras["synth_vertices"] = sart.n_vertices

        global_triangle_count(
            sart.oriented, num_partitions=NUM_PARTITIONS,
            n_vertices=sart.n_vertices, n_edges=sart.n_edges,
        )
        t0 = time.time()
        stri = global_triangle_count(sart.oriented, num_partitions=NUM_PARTITIONS, n_vertices=sart.n_vertices, n_edges=sart.n_edges)
        tc_sec = time.time() - t0
        queries["synth_triangle_count"] = round(tc_sec, 3)
        extras["synth_triangles"] = stri
        # one oriented edge = one sorted-set intersection (reference
        # semantics)
        extras["intersections_per_sec"] = round(sart.n_edges / max(tc_sec, 1e-9))

        seng = engine_for(sart)
        seng.pagerank(max_iters=2, tol=0.0, resume=False, checkpoint_every=0)
        t0 = time.time()
        seng.pagerank(max_iters=PR_ITERS, tol=0.0, resume=False, checkpoint_every=0)
        pr_sec = time.time() - t0
        release_engines()
        queries["synth_pagerank_10it"] = round(pr_sec, 3)
        extras["pr_edges_per_sec"] = round(
            PR_ITERS * 2 * sart.n_edges / max(pr_sec, 1e-9)
        )
        return queries, extras

    trials = [suite_once(i) for i in range(max(1, BENCH_TRIALS))]
    # per-stage minimum across trials; count/result extras are
    # trial-invariant, throughput extras take the best trial. The MEDIAN
    # is recorded alongside: scaling pairs ratio medians, not bests — a
    # single co-tenant idle window at the lo level would otherwise
    # inflate the denominator and understate raw scaling (round-3's
    # "8-cpu idle-window distortion").
    import statistics

    queries = {
        k: min(q[k] for q, _ in trials) for k in trials[0][0]
    }
    extras = dict(trials[0][1])
    for k in ("intersections_per_sec", "pr_edges_per_sec"):
        extras[k] = max(e[k] for _, e in trials)
        extras[k + "_med"] = round(
            statistics.median(e[k] for _, e in trials)
        )
    extras["sf_edge_support_sec"] = min(
        e["sf_edge_support_sec"] for _, e in trials
    )
    trial_totals = [round(sum(q.values()), 3) for q, _ in trials]

    # kernel microbench — the reference's intersection throughput metric
    # (`ele_per_usec = (|a|+|b|)/µs`, exp/test_intersection_algos.cpp:131-135,
    # defaults -len 4000000 -skew 1.0 -select 0.1 -dense 0.01)
    import numpy as np

    from graphsetintersection_ray.functions.kernels import intersect_count_sorted

    rng = np.random.default_rng(42)
    universe = 400_000_000
    a = np.sort(
        rng.choice(universe, size=4_000_000, replace=False).astype(np.int64)
    )
    b = np.sort(
        rng.choice(universe, size=4_000_000, replace=False).astype(np.int64)
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        intersect_count_sorted(a, b)
        best = min(best, time.perf_counter() - t0)
    extras["kernel_ele_per_usec"] = round((len(a) + len(b)) / best / 1e6, 1)

    total = round(sum(queries.values()), 3)
    # the synthetic corpus is the scale workload; the sf stages are small
    # fixed-cost correctness stages — scaling is reported on both
    extras["synth_total"] = round(
        sum(v for k, v in queries.items() if k.startswith("synth_")), 3
    )
    result = {
        "metric": "headline suite seconds (graph build + TC + PR + CC, sf + synth)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "trials": len(trials),
        "trial_totals": trial_totals,
        **extras,
    }
    ray.shutdown()
    return result


def _burn(seconds: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += 1
    return x


def _pin_pool_worker(cores) -> None:
    """Pool initializer: pin a calibration worker to the same core set
    the pinned Ray level runs on, so ceiling and job see one machine."""
    if hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, set(cores))


def _pool(n_procs: int):
    import multiprocessing as mp

    if PIN_CPUS:
        return mp.Pool(
            n_procs, initializer=_pin_pool_worker, initargs=(range(n_procs),)
        )
    return mp.Pool(n_procs)


def _calibrate(n_procs: int, seconds: float = 2.0) -> float:
    """Pure-CPU throughput actually deliverable to n_procs processes RIGHT
    NOW. The sandbox host is shared with co-tenants, so the wall-clock
    ceiling for 32 vs 8 workers varies over time — scaling efficiency is
    only meaningful relative to this concurrently-measured ceiling."""
    with _pool(n_procs) as p:
        return float(sum(p.map(_burn, [seconds] * n_procs)))


def _mem_burn(seconds: float) -> float:
    """Bytes/sec of STREAM-style triad traffic one process can sustain
    (64 MiB working set — far beyond LLC, so this measures DRAM)."""
    import numpy as np

    n = 8 * 1024 * 1024  # 3 float64 arrays x 64 MiB total
    a = np.ones(n)
    b = np.ones(n)
    c = np.empty(n)
    # untimed warm-up: fault every page in (np.empty is lazy-mapped —
    # the first pass otherwise pays ~200x in soft page faults)
    np.multiply(a, 2.0, out=c)
    np.add(c, b, out=c)
    t0 = time.time()
    moved = 0
    while time.time() - t0 < seconds:
        np.multiply(a, 2.0, out=c)
        np.add(c, b, out=c)  # triad c = 2a + b: 3 reads + 2 writes
        moved += 5 * a.nbytes
    return moved / (time.time() - t0)


def _calibrate_mem(n_procs: int, seconds: float = 2.0) -> float:
    """Aggregate DRAM bandwidth deliverable to n_procs concurrent
    processes. Bandwidth-bound kernels (PageRank's message sweep is a
    few memory ops per edge) are ceilinged by THIS, not by core count:
    a single socket's memory channels saturate well below the full core
    count, while a real 4x-node cluster quadruples channels with cores.
    The PR-vs-memory-ceiling ratio is therefore the honest single-node
    proxy for PR's cluster scaling."""
    with _pool(n_procs) as p:
        return float(sum(p.map(_mem_burn, [seconds] * n_procs)))


def run_scaling() -> None:
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    results = {}
    calib = {}
    mem_calib = {}
    for n in (lo_cpus, hi_cpus):
        calib.setdefault(n, 0.0)
        mem_calib.setdefault(n, 0.0)
        calib[n] = max(calib[n], _calibrate(n))
        mem_calib[n] = max(mem_calib[n], _calibrate_mem(n))
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        results[n] = json.loads(out.strip().splitlines()[-1])
        calib[n] = max(calib[n], _calibrate(n))
        mem_calib[n] = max(mem_calib[n], _calibrate_mem(n))
    t_lo, t_hi = results[lo_cpus]["value"], results[hi_cpus]["value"]
    s_lo = results[lo_cpus]["synth_total"]
    s_hi = results[hi_cpus]["synth_total"]
    speedup = t_lo / t_hi
    synth_speedup = s_lo / s_hi
    ceiling = calib[hi_cpus] / calib[lo_cpus]
    print(
        json.dumps(
            {
                f"sec_{lo_cpus}": t_lo,
                f"sec_{hi_cpus}": t_hi,
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(speedup / (hi_cpus / lo_cpus), 3),
                f"synth_sec_{lo_cpus}": s_lo,
                f"synth_sec_{hi_cpus}": s_hi,
                "synth_speedup": round(synth_speedup, 3),
                "synth_scaling_efficiency": round(
                    synth_speedup / (hi_cpus / lo_cpus), 3
                ),
                "machine_cpu_ceiling_ratio": round(ceiling, 3),
                "efficiency_vs_ceiling": round(speedup / max(ceiling, 1e-9), 3),
                "synth_efficiency_vs_ceiling": round(
                    synth_speedup / max(ceiling, 1e-9), 3
                ),
                f"queries_{lo_cpus}": results[lo_cpus]["queries"],
                f"queries_{hi_cpus}": results[hi_cpus]["queries"],
                f"intersections_per_sec_{lo_cpus}": results[lo_cpus]["intersections_per_sec"],
                f"intersections_per_sec_{hi_cpus}": results[hi_cpus]["intersections_per_sec"],
                f"pr_edges_per_sec_{lo_cpus}": results[lo_cpus]["pr_edges_per_sec"],
                f"pr_edges_per_sec_{hi_cpus}": results[hi_cpus]["pr_edges_per_sec"],
                # median-of-trials kernel scaling: the headline raw ratios
                # (best-of-trials at the lo level samples co-tenant idle
                # windows and understates raw scaling)
                "tc_scaling_raw_med": round(
                    results[hi_cpus]["intersections_per_sec_med"]
                    / max(results[lo_cpus]["intersections_per_sec_med"], 1)
                    / (hi_cpus / lo_cpus),
                    3,
                ),
                "pr_scaling_raw_med": round(
                    results[hi_cpus]["pr_edges_per_sec_med"]
                    / max(results[lo_cpus]["pr_edges_per_sec_med"], 1)
                    / (hi_cpus / lo_cpus),
                    3,
                ),
                # deliverable DRAM bandwidth at each level (GB/s) and the
                # bandwidth-ceiling PR efficiency: PR moves a few bytes
                # per edge, so its single-socket ceiling is the memory
                # system, not the core count (a real 4x cluster scales
                # memory channels WITH cores)
                f"mem_gbps_{lo_cpus}": round(mem_calib[lo_cpus] / 1e9, 1),
                f"mem_gbps_{hi_cpus}": round(mem_calib[hi_cpus] / 1e9, 1),
                "mem_bw_ceiling_ratio": round(
                    mem_calib[hi_cpus] / max(mem_calib[lo_cpus], 1e-9), 3
                ),
                "pr_vs_mem_ceiling_med": round(
                    results[hi_cpus]["pr_edges_per_sec_med"]
                    / max(results[lo_cpus]["pr_edges_per_sec_med"], 1)
                    / max(
                        mem_calib[hi_cpus] / max(mem_calib[lo_cpus], 1e-9),
                        1e-9,
                    ),
                    3,
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
