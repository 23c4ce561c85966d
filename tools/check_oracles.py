"""Local replica of the driver's correctness gate: run every QUERIES entry
and its ORACLE_SQL side-by-side on an sf dir, compare row-count + schema +
order-insensitive value hash. Usage:

    PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(normalize(df), index=False).sum())


# ---------------------------------------------------------------------------
# Semantic checks for queries with no SQL oracle (driver records rows-only
# for these): each checker returns a dict of named verification fields.
# Results are printed and written to NOORACLE_CHECKS.json at the repo root.
# ---------------------------------------------------------------------------


def _check_pagerank(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """Converged PageRank vs dense NumPy power iteration (same damping,
    same convergence rule) on the symmetrized int edge table."""
    import numpy as np

    from graphsetintersection_ray.pipelines.queries import QUERIES

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    n = int(max(edf.src.max(), edf.dst.max())) + 1
    A = np.zeros((n, n))
    A[edf.dst, edf.src] = 1.0
    A[edf.src, edf.dst] = 1.0
    deg = A.sum(axis=0)
    M = A / np.where(deg == 0, 1.0, deg)[None, :]
    s = np.full(n, 1.0 / n)
    for _ in range(500):
        s2 = 0.15 / n + 0.85 * (M @ s)
        if np.abs(s2 - s).max() < 1e-6:
            s = s2
            break
        s = s2
    got = rdf.sort_values("v").reset_index(drop=True)
    diff = float(np.abs(got.score.to_numpy() - s).max())
    return {
        "check": "dense_numpy_power_iteration",
        "max_abs_diff": diff,
        "rows_equal_n_vertices": len(got) == n,
        "pass": bool(diff < 1e-5 and len(got) == n),
    }


def _check_gro_order(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """gro_order: dense permutation over 0..V-1 and deterministic across
    two independent runs."""
    from graphsetintersection_ray.pipelines.queries import QUERIES

    n = len(rdf)
    is_perm = (
        sorted(rdf.v.tolist()) == list(range(n))
        and sorted(rdf.new_id.tolist()) == list(range(n))
    )
    rdf2 = QUERIES["gro_order"](sf_dir).to_pandas()
    deterministic = (
        rdf.sort_values("v").new_id.tolist()
        == rdf2.sort_values("v").new_id.tolist()
    )
    return {
        "check": "permutation_and_determinism",
        "is_permutation": bool(is_perm),
        "deterministic": bool(deterministic),
        "pass": bool(is_perm and deterministic),
    }


def _check_bp_order(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """bp_order: dense permutation + deterministic across two runs (the
    hard gate), with 32-id-block edge co-location recorded vs the identity
    layout as info. Identity is NOT a beatable baseline on transcript
    graphs — the dense rank already groups the 'c:'/'t:'/'r:' key families
    contiguously, which is near-optimal for this hub-dominated family — so
    the quality oracle for the refinement itself is the planted-community
    separation test (tests/test_graph_pipeline.py::
    test_bp_order_permutation_and_locality: interleaved communities →
    zero top-level cut)."""
    import numpy as np

    from graphsetintersection_ray.pipelines.queries import QUERIES

    n = len(rdf)
    is_perm = (
        sorted(rdf.v.tolist()) == list(range(n))
        and sorted(rdf.new_id.tolist()) == list(range(n))
    )
    rdf2 = QUERIES["bp_order"](sf_dir).to_pandas()
    deterministic = (
        rdf.sort_values("v").new_id.tolist()
        == rdf2.sort_values("v").new_id.tolist()
    )
    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    pos = np.empty(n, np.int64)
    srt = rdf.sort_values("v")
    pos[srt.v.to_numpy()] = srt.new_id.to_numpy()

    def same_block(p):
        return int(((p[edf.src.to_numpy()] >> 5) ==
                    (p[edf.dst.to_numpy()] >> 5)).sum())

    ident = np.arange(n, dtype=np.int64)
    co_located_bp = same_block(pos)
    co_located_ident = same_block(ident)
    return {
        "check": "permutation_determinism_and_block_locality",
        "is_permutation": bool(is_perm),
        "deterministic": bool(deterministic),
        "info_same_block_edges_bp": co_located_bp,
        "info_same_block_edges_identity": co_located_ident,
        "pass": bool(is_perm and deterministic),
    }


def _check_slashburn_order(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """slashburn_order: dense permutation + deterministic across two runs,
    plus the hub-front property on single-shard graphs — new_id 0 must be
    the max-degree vertex (ties -> larger id, the reference
    HubsetHeapNode order, porder.cpp:988-996). Structural hub/spoke
    placement is pytest-verified on a planted star graph
    (tests/test_graph_pipeline.py::test_slashburn_order)."""
    import numpy as np

    from graphsetintersection_ray.pipelines.ordering import (
        SHARD_TARGET_VERTICES,
    )
    from graphsetintersection_ray.pipelines.queries import QUERIES

    n = len(rdf)
    is_perm = (
        sorted(rdf.v.tolist()) == list(range(n))
        and sorted(rdf.new_id.tolist()) == list(range(n))
    )
    rdf2 = QUERIES["slashburn_order"](sf_dir).to_pandas()
    deterministic = (
        rdf.sort_values("v").new_id.tolist()
        == rdf2.sort_values("v").new_id.tolist()
    )
    hub_first = True
    if n <= SHARD_TARGET_VERTICES:
        ddf = QUERIES["degree_table"](sf_dir).to_pandas()
        deg = np.zeros(n, np.int64)
        deg[ddf.v.to_numpy()] = ddf.degree.to_numpy()
        first = int(rdf.loc[rdf.new_id == 0, "v"].iloc[0])
        max_deg = int(deg.max())
        want = int(np.flatnonzero(deg == max_deg).max())
        hub_first = first == want
    return {
        "check": "permutation_determinism_and_hub_front",
        "is_permutation": bool(is_perm),
        "deterministic": bool(deterministic),
        "hub_first": bool(hub_first),
        "pass": bool(is_perm and deterministic and hub_first),
    }


def _check_dfs_order(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """dfs_order: exact replay against an independent recursive
    ascending-neighbor DFS over the symmetric int edge table."""
    import sys as _sys

    from graphsetintersection_ray.pipelines.queries import QUERIES

    n = len(rdf)
    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    adj: dict[int, list] = {}
    for s, d in zip(edf.src, edf.dst):
        adj.setdefault(int(s), []).append(int(d))
        adj.setdefault(int(d), []).append(int(s))
    _sys.setrecursionlimit(max(10_000, 4 * n))
    new_id: dict[int, int] = {}

    def visit(v: int) -> None:
        new_id[v] = len(new_id)
        for w in sorted(adj.get(v, [])):
            if w not in new_id:
                visit(w)

    for seed in range(n):
        if seed not in new_id:
            visit(seed)
    got = rdf.sort_values("v").new_id.tolist()
    want = [new_id[v] for v in range(n)]
    return {
        "check": "recursive_dfs_exact_replay",
        "is_permutation": sorted(got) == list(range(n)),
        "matches_recursive_dfs": got == want,
        "pass": bool(got == want),
    }


def _check_rcm_order(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """rcm_order: exact replay against an independent queue-based RCM
    (seeds and neighbor visits by (degree, id) ascending, ids assigned
    descending), plus the bandwidth property: the mean |new_id(u) -
    new_id(v)| over edges must not exceed the identity ordering's."""
    from collections import deque

    from graphsetintersection_ray.pipelines.queries import QUERIES

    n = len(rdf)
    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    adj: dict[int, list] = {}
    for s, d in zip(edf.src, edf.dst):
        adj.setdefault(int(s), []).append(int(d))
        adj.setdefault(int(d), []).append(int(s))
    deg = {v: len(a) for v, a in adj.items()}
    new_id: dict[int, int] = {}
    cur = n - 1
    for s in sorted(range(n), key=lambda v: (deg.get(v, 0), v)):
        if s in new_id:
            continue
        new_id[s] = cur
        cur -= 1
        que = deque([s])
        while que:
            u = que.popleft()
            for v in sorted(adj.get(u, []), key=lambda w: (deg.get(w, 0), w)):
                if v not in new_id:
                    new_id[v] = cur
                    cur -= 1
                    que.append(v)
    got = rdf.sort_values("v").new_id.tolist()
    want = [new_id[v] for v in range(n)]
    import numpy as np

    ids = np.array(got, np.int64)
    gap_rcm = float(np.abs(ids[edf.src.to_numpy()] - ids[edf.dst.to_numpy()]).mean())
    gap_id = float(np.abs(edf.src.to_numpy() - edf.dst.to_numpy()).mean())
    return {
        "check": "independent_rcm_replay_and_bandwidth",
        "is_permutation": sorted(got) == list(range(n)),
        "matches_replay": got == want,
        "mean_edge_gap_rcm": gap_rcm,
        "mean_edge_gap_identity": gap_id,
        "pass": bool(got == want and gap_rcm <= gap_id * 1.05),
    }


def _check_bfsr_order(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """bfsr_order: permutation validity + determinism across two runs +
    the base-case contract (every recursion range under 32 vertices
    keeps array order — verified on the whole output only when n < 32,
    where bfsr must be the identity)."""
    from graphsetintersection_ray.pipelines.queries import QUERIES

    n = len(rdf)
    got = rdf.sort_values("v").new_id.tolist()
    rdf2 = QUERIES["bfsr_order"](sf_dir).to_pandas()
    got2 = rdf2.sort_values("v").new_id.tolist()
    identity_ok = True
    if n < 32:
        identity_ok = got == list(range(n))
    return {
        "check": "permutation_determinism_base_case",
        "is_permutation": sorted(got) == list(range(n)),
        "deterministic": got == got2,
        "sub32_identity": identity_ok,
        "pass": bool(
            sorted(got) == list(range(n)) and got == got2 and identity_ok
        ),
    }


def _check_simhash_pairs(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """simhash_pairs: (a) every reported hamming distance equals the true
    distance of independently recomputed signatures; (b) exact-duplicate
    docs (identical text — SQL-expressible ground truth) all appear as
    pairs with hamming 0."""
    import numpy as np

    from graphsetintersection_ray.stages.dedup import simhash_signatures

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    sig_t = simhash_signatures(docs)
    sig = dict(
        zip(
            sig_t["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            sig_t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64).tolist(),
        )
    )
    ham_ok = True
    for a, b, h in zip(rdf.doc_a, rdf.doc_b, rdf.hamming):
        true_h = bin(int(sig[int(a)]) ^ int(sig[int(b)])).count("1")
        if true_h != int(h):
            ham_ok = False
            break
    pairs = set(zip(rdf.doc_a.astype(int), rdf.doc_b.astype(int)))
    dup_groups = docs.groupby("text")["doc_id"].apply(sorted)
    planted = set()
    for ids in dup_groups:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                planted.add((int(ids[i]), int(ids[j])))
    ham0 = {
        (int(a), int(b))
        for a, b, h in zip(rdf.doc_a, rdf.doc_b, rdf.hamming)
        if int(h) == 0
    }
    exact_dup_recall = (
        len(planted & ham0) / len(planted) if planted else 1.0
    )
    return {
        "check": "recomputed_hamming_and_exact_dup_recall",
        "hamming_values_correct": bool(ham_ok),
        "n_exact_dup_pairs": len(planted),
        "exact_dup_recall": exact_dup_recall,
        "pass": bool(ham_ok and exact_dup_recall == 1.0 and pairs >= planted),
    }


def _check_knn_lsh(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """knn_lsh: algorithm-exact replay. Recompute the seeded hyperplanes,
    sign buckets, and 1-bit query multiprobe in NumPy; per query the
    candidate set is every non-query vector whose bucket the query probes,
    and the engine's answer must be (a) drawn from that candidate set,
    (b) sim-exact (cosine of normalized vectors, engine rounding), and
    (c) the true top-k over the candidates, compared as a descending sim
    multiset so boundary ties between equal-sim neighbors are accepted.
    Recall vs global brute force is recorded (the 8-table x 8-plane
    2-bit-multiprobe default is tuned to hold >= 0.9 even on these
    isotropic embeddings; the clustered-regime bar lives in
    tests/test_data_pipeline.py::test_lsh_topk_recall_on_clusters)."""
    import numpy as np

    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.stages.similarity import (
        LSH_TOPK_FLIP_BITS,
        LSH_TOPK_PLANES,
        LSH_TOPK_TABLES,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb.vec_id.to_numpy().astype(np.int64)
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1.0, norms)
    row_of = {int(v): i for i, v in enumerate(ids)}

    # replay the engine's seeded bucketing (lsh_topk defaults)
    qids = list(range(10))
    k = 5
    rng = np.random.default_rng(99)
    P, T = LSH_TOPK_PLANES, LSH_TOPK_TABLES
    planes = rng.standard_normal((T, mat.shape[1], P))
    buckets = np.stack([
        ((mat @ planes[t] > 0).astype(np.int64) << np.arange(P)).sum(axis=1)
        for t in range(T)
    ])  # (T, n)
    masks = [0]
    if LSH_TOPK_FLIP_BITS >= 1:
        masks += [1 << b for b in range(P)]
    if LSH_TOPK_FLIP_BITS >= 2:
        masks += [(1 << i) | (1 << j)
                  for i in range(P) for j in range(i + 1, P)]
    masks = np.asarray(masks, np.int64)
    qset = set(qids)
    not_query = ~np.isin(ids, qids)

    sims_ok = True
    for q, nbr, s in zip(rdf.query_id, rdf.neighbor_id, rdf.sim):
        true = float(round_half_away(
            np.array([mat[row_of[int(q)]] @ mat[row_of[int(nbr)]]]), 6)[0])
        if abs(true - float(s)) > 1e-9:
            sims_ok = False
            break

    topk_ok = True
    candidates_ok = True
    for q in qids:
        cand_mask = np.zeros(len(ids), bool)
        for t in range(T):
            qb = int(buckets[t, row_of[q]])
            probes = np.asarray([qb ^ int(m) for m in masks], np.int64)
            cand_mask |= np.isin(buckets[t], probes)
        cand = np.flatnonzero(not_query & cand_mask)
        got = rdf[rdf.query_id == q]
        got_rows = {row_of[int(n)] for n in got.neighbor_id}
        if not got_rows <= set(cand.tolist()):
            candidates_ok = False
        cand_sims = np.asarray(
            round_half_away(mat[cand] @ mat[row_of[q]], 6))
        want = np.sort(cand_sims)[::-1][: min(k, len(cand))]
        have = np.sort(got.sim.to_numpy())[::-1]
        if len(want) != len(have) or (len(want) and
                                      np.abs(want - have).max() > 1e-9):
            topk_ok = False

    exact = set()
    qmask = np.isin(ids, qids)
    for q in qids:
        sims = mat @ mat[row_of[q]]
        sims[qmask] = -np.inf
        order = np.lexsort((ids, -sims))[:k]
        exact |= {(q, int(ids[i])) for i in order}
    got_pairs = set(zip(rdf.query_id.astype(int), rdf.neighbor_id.astype(int)))
    recall = len(got_pairs & exact) / len(exact) if exact else 1.0
    return {
        "check": "lsh_algorithm_exact_replay",
        "sims_correct": bool(sims_ok),
        "neighbors_within_probed_buckets": bool(candidates_ok),
        "topk_over_candidates_exact": bool(topk_ok),
        "info_recall_vs_global_bruteforce": recall,
        "pass": bool(sims_ok and candidates_ok and topk_ok),
    }


def _check_knn_ivf(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """knn_ivf: algorithm-exact replay with an INDEPENDENT k-means
    implementation. Recompute the value-defined training sample
    (vec_id % stride == 0, rows sorted by vec_id), the seeded spherical
    k-means centroids, every vector's argmax-cosine cell, and each
    query's nprobe nearest cells; the engine's answer must be (a) drawn
    from the probed cells' non-query vectors, (b) sim-exact, and (c) the
    true top-k over those candidates (descending-sim multiset, boundary
    ties accepted). Recall vs global brute force recorded as info only."""
    import numpy as np

    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.stages.similarity import (
        IVF_KMEANS_ITERS,
        IVF_TRAIN_ROWS,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb.vec_id.to_numpy().astype(np.int64)
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1.0, norms)
    row_of = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)

    # replay training (ivf_topk defaults) with an independent k-means loop
    qids = list(range(10))
    k = 5
    n_cells = max(4, int(np.sqrt(n)))
    import numpy as _np_probe
    nprobe = min(max(2, int(_np_probe.ceil(0.7 * n_cells))), n_cells)
    stride = max(1, n // IVF_TRAIN_ROWS)
    order = np.argsort(ids, kind="stable")
    sample_rows = order[ids[order] % stride == 0]
    sample = mat[sample_rows]
    rng = np.random.default_rng(99)
    n_cells = min(n_cells, len(sample))
    cent = sample[rng.choice(len(sample), size=n_cells, replace=False)].copy()
    for _ in range(IVF_KMEANS_ITERS):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cent[c] = m / nrm
    cell_sims = mat @ cent.T
    cell = np.argmax(cell_sims, axis=1)
    not_query = ~np.isin(ids, qids)

    sims_ok = True
    for q, nbr, s in zip(rdf.query_id, rdf.neighbor_id, rdf.sim):
        true = float(round_half_away(
            np.array([mat[row_of[int(q)]] @ mat[row_of[int(nbr)]]]), 6)[0])
        if abs(true - float(s)) > 1e-9:
            sims_ok = False
            break

    topk_ok = True
    candidates_ok = True
    for q in qids:
        qrow = row_of[q]
        probes = set(
            np.argsort(-cell_sims[qrow], kind="stable")[:nprobe].tolist()
        )
        cand = np.flatnonzero(
            not_query & np.isin(cell, np.fromiter(probes, np.int64)))
        got = rdf[rdf.query_id == q]
        got_rows = {row_of[int(nn)] for nn in got.neighbor_id}
        if not got_rows <= set(cand.tolist()):
            candidates_ok = False
        cand_sims = np.asarray(
            round_half_away(mat[cand] @ mat[qrow], 6))
        want = np.sort(cand_sims)[::-1][: min(k, len(cand))]
        have = np.sort(got.sim.to_numpy())[::-1]
        if len(want) != len(have) or (len(want) and
                                      np.abs(want - have).max() > 1e-9):
            topk_ok = False

    exact = set()
    qmask = np.isin(ids, qids)
    for q in qids:
        sims = mat @ mat[row_of[q]]
        sims[qmask] = -np.inf
        order_q = np.lexsort((ids, -sims))[:k]
        exact |= {(q, int(ids[i])) for i in order_q}
    got_pairs = set(zip(rdf.query_id.astype(int), rdf.neighbor_id.astype(int)))
    recall = len(got_pairs & exact) / len(exact) if exact else 1.0
    return {
        "check": "ivf_algorithm_exact_replay",
        "sims_correct": bool(sims_ok),
        "neighbors_within_probed_cells": bool(candidates_ok),
        "topk_over_candidates_exact": bool(topk_ok),
        "info_recall_vs_global_bruteforce": recall,
        "pass": bool(sims_ok and candidates_ok and topk_ok),
    }


def _nbr_sets(sf_dir: str) -> dict:
    """Adjacency sets of the transcript graph, for the decomposition
    replays below."""
    from graphsetintersection_ray.pipelines.queries import QUERIES

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    nbrs: dict = {}
    for s, d in zip(edf.src.to_numpy(), edf.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
        nbrs.setdefault(int(d), set()).add(int(s))
    return nbrs


def _check_coreness(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """coreness vs an INDEPENDENT sequential Matula-Beck peel (one
    min-degree vertex at a time — the engine batches whole levels)."""
    import heapq

    nbrs = _nbr_sets(sf_dir)
    n = int(rdf.v.max()) + 1 if len(rdf) else 0
    deg = {v: len(nbrs.get(v, ())) for v in range(n)}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    alive = set(range(n))
    core = {}
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v not in alive or d != deg[v]:
            continue  # stale entry
        k = max(k, d)
        core[v] = k
        alive.discard(v)
        for w in nbrs.get(v, ()):
            if w in alive:
                deg[w] -= 1
                heapq.heappush(heap, (deg[w], w))
    got = dict(zip(rdf.v.astype(int), rdf.core.astype(int)))
    mismatches = sum(1 for v in range(n) if got.get(v) != core.get(v))
    return {
        "check": "sequential_matula_beck_peel",
        "vertices": n,
        "degeneracy": max(core.values()) if core else 0,
        "exact_mismatches": mismatches,
        "pass": bool(len(got) == n and mismatches == 0),
    }


def _check_trussness(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """trussness vs an INDEPENDENT textbook peel: repeatedly remove THE
    min-support edge, truss = running max(support + 2), supports updated
    incrementally (the engine removes whole levels in batch)."""
    import heapq

    nbrs = _nbr_sets(sf_dir)
    edges = {(u, v) for u, vs in nbrs.items() for v in vs if u < v}
    alive = set(edges)
    sup = {}
    for (u, v) in edges:
        sup[(u, v)] = len(nbrs[u] & nbrs[v])
    heap = [(s, e) for e, s in sup.items()]
    heapq.heapify(heap)
    truss = {}
    k = 2
    while alive:
        s, e = heapq.heappop(heap)
        if e not in alive or s != sup[e]:
            continue
        k = max(k, s + 2)
        truss[e] = k
        alive.discard(e)
        u, v = e
        for w in nbrs[u] & nbrs[v]:
            e1 = (min(u, w), max(u, w))
            e2 = (min(v, w), max(v, w))
            if e1 in alive and e2 in alive:
                for e3 in (e1, e2):
                    sup[e3] -= 1
                    heapq.heappush(heap, (sup[e3], e3))
    got = {
        (int(r.u), int(r.v)): int(r.truss) for r in rdf.itertuples()
    }
    mismatches = sum(1 for e in edges if got.get(e) != truss.get(e))
    return {
        "check": "sequential_min_support_peel",
        "edges": len(edges),
        "max_truss": max(truss.values()) if truss else 0,
        "exact_mismatches": mismatches,
        "pass": bool(len(got) == len(edges) and mismatches == 0),
    }


def _check_neighborhood_fn(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """HyperBall neighborhood function vs the EXACT one (boolean matrix
    powers of the symmetric adjacency): the fixpoint radius must equal
    the exact diameter, each radius's summed estimate must be within the
    HLL error budget (m=256 → ~6.5% σ per sketch; ball sketches within one
    component are CORRELATED, so the sum does not average them out —
    the bound is 3σ of a single sketch, 20%), and a same-seed
    replay must be bit-identical."""
    import numpy as np

    from graphsetintersection_ray.pipelines.queries import (
        QUERIES,
        q_neighborhood_function,
    )

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    n = int(max(edf.src.max(), edf.dst.max())) + 1
    reach = np.eye(n, dtype=bool)
    reach[edf.src, edf.dst] = True
    reach[edf.dst, edf.src] = True
    adj = reach.copy()
    exact = [float(n)]
    prev = np.eye(n, dtype=bool)
    cur = reach
    adj_f = adj.astype(np.float32)
    while (cur != prev).any():
        exact.append(float(cur.sum()))
        prev = cur
        cur = cur | ((cur.astype(np.float32) @ adj_f) > 0)
    got = rdf.sort_values("radius").reset_index(drop=True)
    radius_ok = len(got) == len(exact)
    rel = [
        abs(g - e) / e
        for g, e in zip(got.est_reachable.tolist(), exact)
    ]
    replay = (
        q_neighborhood_function(sf_dir)
        .to_pandas()
        .sort_values("radius")
        .reset_index(drop=True)
    )
    deterministic = replay.equals(got)
    max_rel = max(rel) if rel else 1.0
    return {
        "check": "exact_bfs_matrix_powers+same_seed_replay",
        "exact_radius": len(exact) - 1,
        "got_radius": len(got) - 1,
        "max_rel_err": float(max_rel),
        "deterministic": bool(deterministic),
        "pass": bool(radius_ok and max_rel < 0.20 and deterministic),
    }


def _check_kmeans(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """kmeans_clusters vs an exact single-process numpy replay of the
    same algorithm (smallest-vec_id init, argmax-cosine assignment with
    ties to the lowest cluster, renormalized-mean update, 10 iterations).
    Distributed partial sums reduce in a different order than one numpy
    pass, so centroids can differ at float epsilon and near-equidistant
    points may flip — the bar is >= 99% agreement, plus exact
    distributed determinism (two runs identical)."""
    import numpy as np

    from graphsetintersection_ray.pipelines.queries import QUERIES
    from graphsetintersection_ray.stages.similarity import (
        KMEANS_ITERS,
        _normalize,
    )

    edf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    edf = edf.sort_values("vec_id").reset_index(drop=True)
    ids = edf["vec_id"].to_numpy()
    mat = _normalize(np.stack(edf["embedding"].to_numpy()).astype(np.float64))
    k = 8
    cent = mat[np.argsort(ids, kind="stable")[:k]]
    for _ in range(KMEANS_ITERS):
        assign = np.argmax(mat @ cent.T, axis=1)
        new = cent.copy()
        for c in range(k):
            s = mat[assign == c].sum(axis=0)
            nrm = np.linalg.norm(s)
            if nrm > 0:
                new[c] = s / nrm
        cent = new
    want = np.argmax(mat @ cent.T, axis=1)
    got = rdf.sort_values("vec_id").reset_index(drop=True)
    agree = float(
        (got.cluster.to_numpy() == want[np.searchsorted(ids, got.vec_id)]).mean()
    )
    rdf2 = QUERIES["kmeans_clusters"](sf_dir).to_pandas()
    deterministic = (
        got.cluster.tolist()
        == rdf2.sort_values("vec_id").reset_index(drop=True).cluster.tolist()
    )
    return {
        "check": "numpy_exact_replay+determinism",
        "agreement": agree,
        "deterministic": bool(deterministic),
        "pass": bool(agree >= 0.99 and deterministic and len(got) == len(ids)),
    }


def _check_media_decode(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """media_decode vs an independent byte-free replay: regenerate each
    doc's PCM16 samples from the same Philox(doc_id) stream (no WAV
    bytes involved), recompute n_samples and RMS, require EXACT
    equality — proving the RIFF encode→parse→normalize path is
    lossless. Plus a bit-exact encode/decode roundtrip on 100 random
    sample vectors and a BMP RGB roundtrip."""
    import numpy as np

    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.stages.multimodal import (
        bmp24_bytes,
        decode_bmp24,
        decode_pcm16_wav,
        pcm16_wav_bytes,
    )

    got = rdf.sort_values("doc_id").reset_index(drop=True)
    ok_rows = 0
    for did, n, rms in zip(got.doc_id, got.n_samples, got.rms):
        rng = np.random.Generator(np.random.Philox(key=[int(did), 77]))
        samples = rng.integers(-32768, 32768, size=256, dtype=np.int64).astype(
            np.int16
        )
        want = (samples.astype(np.float32) / np.float32(32768.0)).astype(
            np.float64
        )
        want_rms = float(round_half_away(np.sqrt((want**2).mean()), 6))
        if int(n) == len(samples) and float(rms) == want_rms:
            ok_rows += 1
    replay_exact = ok_rows == len(got)

    rng = np.random.default_rng(5)
    wav_rt = all(
        np.array_equal(
            decode_pcm16_wav(
                pcm16_wav_bytes(s := rng.integers(-32768, 32768, size=int(k), dtype=np.int64).astype(np.int16))
            ),
            s,
        )
        for k in rng.integers(1, 500, size=100)
    )
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.int64).astype(np.uint8)
    bmp_rt = np.array_equal(decode_bmp24(bmp24_bytes(img)), img)
    return {
        "check": "philox_replay_exact+codec_roundtrips",
        "replay_rows_exact": ok_rows,
        "rows": len(got),
        "wav_roundtrip_100": bool(wav_rt),
        "bmp_roundtrip": bool(bmp_rt),
        "pass": bool(replay_exact and wav_rt and bmp_rt and len(got) > 0),
    }


def _check_betweenness(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """betweenness vs an INDEPENDENT scalar textbook Brandes (plain
    Python adjacency lists, deque BFS, per-node predecessor lists —
    deliberately nothing shared with the vectorized per-level kernel).
    FP addition order differs across the distributed sum, so the bar is
    max |got − round(want, 6)| <= 1e-6 over every vertex."""
    from collections import deque

    import numpy as np

    from graphsetintersection_ray.pipelines.queries import QUERIES

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    n = int(max(edf.src.max(), edf.dst.max())) + 1
    adj = [[] for _ in range(n)]
    for a, b in zip(edf.src, edf.dst):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    bc = np.zeros(n)
    for s in range(n):
        dist = [-1] * n
        sigma = [0.0] * n
        preds: list[list[int]] = [[] for _ in range(n)]
        dist[s], sigma[s] = 0, 1.0
        order, q = [], deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if dist[w] == -1:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = [0.0] * n
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    want = bc / 2.0
    got = rdf.sort_values("v").reset_index(drop=True)
    full = np.zeros(n)
    full[got.v.to_numpy()] = got.bc.to_numpy()
    max_diff = float(np.max(np.abs(full - np.round(want, 6))))
    return {
        "check": "independent_scalar_brandes_replay",
        "rows": len(got),
        "max_abs_diff": max_diff,
        "pass": bool(len(got) == n and max_diff <= 1e-6),
    }


def _check_closeness(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """closeness vs an independent scalar deque-BFS replay: for every
    vertex, (reach−1)/Σdist within its component, exact integer sums so
    equality after 6-decimal rounding must hold bit-for-bit."""
    from collections import deque

    import numpy as np

    from graphsetintersection_ray.pipelines.queries import QUERIES

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    n = int(max(edf.src.max(), edf.dst.max())) + 1
    adj = [[] for _ in range(n)]
    for a, b in zip(edf.src, edf.dst):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    want = np.zeros(n)
    for s in range(n):
        dist = [-1] * n
        dist[s] = 0
        q = deque([s])
        tot, reach = 0, 0
        while q:
            u = q.popleft()
            tot += dist[u]
            reach += 1
            for w in adj[u]:
                if dist[w] == -1:
                    dist[w] = dist[u] + 1
                    q.append(w)
        want[s] = (reach - 1) / tot if tot > 0 else 0.0
    got = rdf.sort_values("v").reset_index(drop=True)
    full = np.zeros(n)
    full[got.v.to_numpy()] = got.closeness.to_numpy()
    max_diff = float(np.max(np.abs(full - np.round(want, 6))))
    return {
        "check": "independent_scalar_bfs_replay",
        "rows": len(got),
        "max_abs_diff": max_diff,
        "pass": bool(max_diff <= 1e-9),
    }


def _check_bloom_dedup(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """bloom_dedup: (a) covers exactly the odd-doc_id docs; (b) ZERO
    false negatives — every new doc whose normalized content appears in
    the seen corpus (exact ground truth recomputed here) has
    maybe_seen=1, the Bloom guarantee; (c) the false-positive rate
    among truly-new docs is below the design bound for the default
    (m, k) at this corpus size."""
    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    norm = (
        docs["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    )
    seen = set(norm[(docs.doc_id % 2) == 0])
    new_mask = (docs.doc_id % 2) == 1
    truth = pd.DataFrame(
        {
            "doc_id": docs.doc_id[new_mask].to_numpy(),
            "truly_seen": norm[new_mask].isin(seen).to_numpy(),
        }
    )
    m = truth.merge(rdf, on="doc_id", how="outer", indicator=True)
    rows_ok = bool((m["_merge"] == "both").all())
    fn = int((m["truly_seen"] & (m["maybe_seen"] == 0)).sum())
    truly_new = m[~m["truly_seen"].astype(bool)]
    fp_rate = (
        float((truly_new["maybe_seen"] == 1).mean()) if len(truly_new) else 0.0
    )
    return {
        "check": "bloom_no_false_negatives_and_fp_bound",
        "rows_cover_new_docs": rows_ok,
        "false_negatives": fn,
        "fp_rate": round(fp_rate, 6),
        "pass": rows_ok and fn == 0 and fp_rate <= 0.01,
    }


def _check_weighted_sample(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """weighted_sample: bit-exact single-process replay of the A-ES
    scheme (same splitmix64 uniforms, same key = u^(1/w), same total
    order) over the raw parquet — the distributed partial-top-k must
    reproduce it row for row."""
    import numpy as np

    from graphsetintersection_ray.functions.hll import splitmix64

    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    eid = ev["event_id"].to_numpy(np.int64)
    w = ev["value"].to_numpy(np.float64)
    u = (splitmix64(eid + 13).astype(np.float64) + 1.0) / 2.0**64
    key = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), -1.0)
    df = (
        pd.DataFrame({"event_id": eid, "value": w, "key": key})
        .sort_values(["key", "event_id"], ascending=[False, True])
        .head(100)
    )
    df = df[df["key"] >= 0].reset_index(drop=True)
    got = rdf.sort_values("rk").reset_index(drop=True)
    rows_ok = len(got) == len(df)
    exact = rows_ok and bool(
        (got["event_id"].to_numpy(np.int64) == df["event_id"].to_numpy()).all()
        and (got["value"].to_numpy(np.float64) == df["value"].to_numpy()).all()
        and (got["rk"].to_numpy(np.int64) == np.arange(1, len(df) + 1)).all()
    )
    return {
        "check": "aes_exact_replay",
        "rows_match": bool(rows_ok),
        "exact": bool(exact),
        "pass": bool(exact),
    }


def _check_image_decode(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """image_decode vs a byte-free replay: regenerate each doc's 8x8 RGB
    image from the same Philox(doc_id) stream, recompute the grayscale
    mean through the identical float32 path, require EXACT equality for
    every row. BMP/PNG rows (doc_id % 3 in {0, 1}) prove those codecs
    lossless; JPEG rows (% 3 == 2) replay the deterministic
    encode+decode pair, proving the lossy path is bit-reproducible.
    Plus bit-exact PNG roundtrips across every scanline filter and a
    JPEG gradient-image quality bound on random shapes."""
    import numpy as np

    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.stages.multimodal import (
        decode_jpeg,
        decode_png,
        jpeg_bytes,
        png_bytes,
    )

    got = rdf.sort_values("doc_id").reset_index(drop=True)
    ok_rows = 0
    for did, n, mg in zip(got.doc_id, got.n_pixels, got.mean_gray):
        rng = np.random.Generator(np.random.Philox(key=[int(did), 77]))
        img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.int64).astype(
            np.uint8
        )
        if int(did) % 3 == 2:
            img = decode_jpeg(jpeg_bytes(img, quality=90))
        gray = (
            img.astype(np.float32).mean(axis=2) / np.float32(255.0)
        ).ravel()
        want = float(
            round_half_away(
                np.array([gray.astype(np.float64).sum() / len(gray)]), 6
            )[0]
        )
        if int(n) == 64 and float(mg) == want:
            ok_rows += 1
    replay_exact = ok_rows == len(got)

    rng = np.random.default_rng(9)
    png_rt = all(
        np.array_equal(
            decode_png(
                png_bytes(
                    img := rng.integers(
                        0, 256, size=(int(h), int(w), 3), dtype=np.int64
                    ).astype(np.uint8),
                    filter_type=ft,
                )
            ),
            img,
        )
        for ft in range(5)
        for h, w in rng.integers(1, 24, size=(4, 2))
    )

    # JPEG: lossy but bounded on smooth content — a gradient image must
    # come back within a few grey levels at quality 95, any shape
    jpeg_ok = True
    for h, w in rng.integers(9, 40, size=(3, 2)):
        yy, xx = np.mgrid[0 : int(h), 0 : int(w)]
        img = np.stack(
            [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], -1
        ).astype(np.uint8)
        dec = decode_jpeg(jpeg_bytes(img, quality=95))
        if dec.shape != img.shape or (
            np.abs(dec.astype(int) - img.astype(int)).max() > 8
        ):
            jpeg_ok = False
    return {
        "check": "philox_replay_exact+png_filter_roundtrips+jpeg_bound",
        "replay_exact_rows": int(ok_rows),
        "replay_exact": bool(replay_exact),
        "png_roundtrips": bool(png_rt),
        "jpeg_gradient_bound": bool(jpeg_ok),
        "pass": bool(replay_exact and png_rt and jpeg_ok),
    }


def _check_effective_diameter(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """effective_diameter: recompute the EXACT neighborhood function by
    boolean matrix powers, derive the exact interpolated 90% effective
    diameter the same way, and require max_radius to equal the exact
    diameter and the estimate to land within 0.75 radii (the HLL-noise
    budget on the interpolation; m=256 per-sketch sigma ~6.5%)."""
    import numpy as np

    from graphsetintersection_ray.pipelines.queries import QUERIES

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    n = int(max(edf.src.max(), edf.dst.max())) + 1
    cur = np.eye(n, dtype=bool)
    cur[edf.src, edf.dst] = True
    cur[edf.dst, edf.src] = True
    adj_f = cur.astype(np.float32)
    exact = [float(n)]
    prev = np.eye(n, dtype=bool)
    while (cur != prev).any():
        exact.append(float(cur.sum()))
        prev = cur
        cur = cur | ((cur.astype(np.float32) @ adj_f) > 0)
    nf = np.asarray(exact)
    target = 0.9 * nf[-1]
    t = int(np.searchsorted(nf, target))
    eff_exact = (
        0.0 if t == 0 else t - 1 + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
    )
    got_eff = float(rdf["eff_diameter"].iloc[0])
    got_rad = int(rdf["max_radius"].iloc[0])
    radius_ok = bool(got_rad == len(nf) - 1)
    err = float(abs(got_eff - eff_exact))
    return {
        "check": "exact_bfs_effective_diameter",
        "exact_eff_diameter": round(float(eff_exact), 4),
        "est_eff_diameter": got_eff,
        "abs_err": round(err, 4),
        "max_radius_exact": radius_ok,
        "pass": bool(radius_ok and err <= 0.75),
    }


def _check_approx_distinct(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """approx_distinct: every event type present, and each HLL estimate
    within 5% of the exact distinct user count (m=16384 gives ~0.8%
    standard error, so 5% is a >6-sigma bound)."""
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    exact = ev.groupby("event_type")["user_id"].nunique()
    got = rdf.set_index("event_type")["n_approx"]
    types_ok = set(got.index) == set(exact.index)
    rel_err = (
        float((abs(got - exact) / exact).max()) if types_ok else float("inf")
    )
    return {
        "check": "hll_within_5pct_of_exact",
        "types_match": bool(types_ok),
        "max_rel_err": round(rel_err, 6),
        "pass": types_ok and rel_err <= 0.05,
    }


def _check_harmonic(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """harmonic vs an independent scalar deque-BFS replay: for every
    vertex, Σ 1/dist over reachable peers summed in ascending-distance
    order (the engine's value-defined order), 6-decimal parity."""
    from collections import deque

    import numpy as np

    from graphsetintersection_ray.pipelines.queries import QUERIES

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    n = int(max(edf.src.max(), edf.dst.max())) + 1
    adj = [[] for _ in range(n)]
    for a, b in zip(edf.src, edf.dst):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    want = np.zeros(n)
    for s in range(n):
        dist = [-1] * n
        dist[s] = 0
        q = deque([s])
        per_d: dict[int, int] = {}
        while q:
            u = q.popleft()
            if dist[u] > 0:
                per_d[dist[u]] = per_d.get(dist[u], 0) + 1
            for w in adj[u]:
                if dist[w] == -1:
                    dist[w] = dist[u] + 1
                    q.append(w)
        want[s] = sum(per_d[d] / d for d in sorted(per_d))
    from graphsetintersection_ray.functions.kernels import round_half_away

    got = rdf.sort_values("v").reset_index(drop=True)
    full = np.zeros(n)
    full[got.v.to_numpy()] = got.harmonic.to_numpy()
    # round the replay the way the engine does (half-away-from-zero) —
    # np.round is half-to-even and would spuriously fail a .5 tie
    max_diff = float(np.max(np.abs(full - round_half_away(want, 6))))
    return {
        "check": "independent_scalar_bfs_replay",
        "rows": len(got),
        "rows_equal_n_vertices": bool(len(got) == n),
        "max_abs_diff": max_diff,
        "pass": bool(max_diff <= 1e-9 and len(got) == n),
    }


def _check_embedding_dups_lsh(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """embedding_dups_lsh (production LSH default): every emitted pair
    must be a true >= threshold pair with the exact rounded cosine
    (precision 1.0 — LSH candidates are exactly verified), and the
    measured recall vs the brute-force exact pair set is RECORDED.
    Recall < 1 is by design at thresholds far below ~0.95 (multiprobe
    hyperplane collision probability, see similarity.lsh_dup_pairs);
    the pass gate is precision + sim exactness + a sanity floor."""
    import numpy as np

    from graphsetintersection_ray.functions.kernels import round_half_away

    threshold = 0.4
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb.vec_id.to_numpy().astype(np.int64)
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1.0, norms)
    sims = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), k=1)
    s = round_half_away(sims[iu, ju], 6)
    keep = s >= threshold
    exact = {
        (int(min(a, b)), int(max(a, b))): float(v)
        for a, b, v in zip(ids[iu][keep], ids[ju][keep], s[keep])
    }
    got = {
        (int(a), int(b)): float(v)
        for a, b, v in zip(rdf.vec_a, rdf.vec_b, rdf.sim)
    }
    wrong = [
        p for p, v in got.items()
        if p not in exact or abs(exact[p] - v) > 1e-9
    ]
    recall = len(set(got) & set(exact)) / max(len(exact), 1)
    return {
        "check": "exact_verified_pairs_and_measured_recall",
        "threshold": threshold,
        "n_exact_pairs": len(exact),
        "n_emitted_pairs": len(got),
        "false_or_missim_pairs": len(wrong),
        "precision": 1.0 if not wrong else 1.0 - len(wrong) / max(len(got), 1),
        "recall_vs_exact": round(recall, 4),
        "pass": bool(not wrong and recall >= 0.3),
    }


def _check_mis_luby(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """mis_luby vs (a) structural assertions — independence (no edge with
    both endpoints IN) and maximality (every OUT vertex has an IN
    neighbor) — and (b) an EXACT sequential replay of the seeded Luby
    rounds (same splitmix64 priorities, same round constants)."""
    import numpy as np

    from graphsetintersection_ray.functions.hll import splitmix64
    from graphsetintersection_ray.pipelines.iterative import MIS_SEED

    nbrs = _nbr_sets(sf_dir)
    got = dict(zip(rdf.v.astype(int), rdf.in_mis.astype(int)))
    in_set = {v for v, m in got.items() if m == 1}
    indep_violations = sum(
        1 for v in in_set for w in nbrs.get(v, ()) if w in in_set
    )
    maximal_violations = sum(
        1
        for v, m in got.items()
        if m == 0 and not any(w in in_set for w in nbrs.get(v, ()))
    )

    # exact replay
    verts = np.array(sorted(got), dtype=np.int64)
    INF = np.int64(np.iinfo(np.int64).max)
    state = {int(v): 0 for v in verts}  # 0 undecided / 1 IN / 2 OUT
    for rnd in range(1, 201):
        c = np.uint64(
            (MIS_SEED * 0xD1B54A32D192ED03 + rnd) & 0xFFFFFFFFFFFFFFFF
        )
        h = splitmix64(verts.astype(np.uint64) + c).view(np.int64)
        h = np.where(h == INF, INF - 1, h)
        pri = {
            int(v): (int(x) if state[int(v)] == 0 else int(INF))
            for v, x in zip(verts, h)
        }
        new_in = [
            v
            for v in state
            if state[v] == 0
            and all(pri[v] < pri[w] for w in nbrs.get(v, ()) if w in pri)
        ]
        for v in new_in:
            state[v] = 1
        for v in state:
            if state[v] == 0 and any(state.get(w) == 1 for w in nbrs.get(v, ())):
                state[v] = 2
        if all(s != 0 for s in state.values()):
            break
    replay_mismatches = sum(
        1 for v in state if (1 if state[v] == 1 else 0) != got.get(v)
    )
    return {
        "check": "independence_maximality_and_exact_luby_replay",
        "n_in_mis": len(in_set),
        "indep_violations": indep_violations,
        "maximal_violations": maximal_violations,
        "replay_mismatches": replay_mismatches,
        "pass": bool(
            indep_violations == 0
            and maximal_violations == 0
            and replay_mismatches == 0
        ),
    }


def _check_approx_triangles(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """approx_triangles: exact replay of the value-defined DOULION
    sample — rebuild the degree-ordered orientation from edges_int +
    degree_table, redraw the splitmix64 keep mask, count triangles on
    the sampled graph exactly, require equality with the engine's
    sampled count and estimate; relative error vs the true triangle
    count is recorded."""
    import numpy as np

    from graphsetintersection_ray.functions.hll import splitmix64
    from graphsetintersection_ray.pipelines.queries import QUERIES

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    ddf = QUERIES["degree_table"](sf_dir).to_pandas()
    nv = np.int64(len(ddf))
    src = edf.src.to_numpy(np.int64)
    dst = edf.dst.to_numpy(np.int64)
    # the engine samples the CANONICAL (src < dst) edge set
    key = (src * nv + dst).astype(np.uint64)
    keep = (splitmix64(key) % np.uint64(4)) == 0
    ssrc, sdst = src[keep], dst[keep]

    # exact triangle count on the sampled (undirected) edge set
    es = set(zip(ssrc.tolist(), sdst.tolist()))
    nbr: dict[int, set] = {}
    for a, b in es:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    tri = 0
    for a, b in es:
        tri += len(nbr[a] & nbr[b])
    tri //= 3  # each triangle counted once per edge

    exact = int(
        QUERIES["triangle_count"](sf_dir).to_pandas().triangles.iloc[0]
    )
    got = rdf.iloc[0]
    est_ok = int(got.sampled_triangles) == tri
    edges_ok = int(got.sampled_edges) == int(keep.sum())
    scale_ok = int(got.triangles_est) == tri * 64
    rel_err = abs(tri * 64 - exact) / max(exact, 1)
    return {
        "check": "doulion_exact_sample_replay",
        "sampled_triangles_match": bool(est_ok),
        "sampled_edges_match": bool(edges_ok),
        "estimate_scaling_match": bool(scale_ok),
        "info_relative_error_vs_exact": round(float(rel_err), 4),
        "pass": bool(est_ok and edges_ok and scale_ok),
    }


def _check_graph_coloring(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """graph_coloring vs (a) properness — no edge with equal endpoint
    colors — and (b) an EXACT sequential replay of the iterated
    layer-salted Luby-MIS layers (same splitmix64 priorities and round
    constants as the engine)."""
    import numpy as np

    from graphsetintersection_ray.functions.hll import splitmix64
    from graphsetintersection_ray.pipelines.iterative import MIS_SEED

    nbrs = _nbr_sets(sf_dir)
    got = dict(zip(rdf.v.astype(int), rdf.color.astype(int)))
    proper_violations = sum(
        1
        for v, c in got.items()
        for w in nbrs.get(v, ())
        if got.get(w) == c
    )
    n_colors = len(set(got.values()))
    uncolored = sum(1 for c in got.values() if c < 0)

    verts = np.array(sorted(got), dtype=np.int64)
    INF = np.int64(np.iinfo(np.int64).max)
    color = {int(v): -1 for v in verts}
    for layer in range(512):
        if all(c >= 0 for c in color.values()):
            break
        seed = MIS_SEED + 1_000_003 * layer
        state = {
            int(v): (2 if color[int(v)] >= 0 else 0) for v in verts
        }
        for rnd in range(1, 201):
            cc = np.uint64(
                (seed * 0xD1B54A32D192ED03 + rnd) & 0xFFFFFFFFFFFFFFFF
            )
            h = splitmix64(verts.astype(np.uint64) + cc).view(np.int64)
            h = np.where(h == INF, INF - 1, h)
            pri = {
                int(v): (int(x) if state[int(v)] == 0 else int(INF))
                for v, x in zip(verts, h)
            }
            new_in = [
                v
                for v in state
                if state[v] == 0
                and all(
                    pri[v] < pri[w] for w in nbrs.get(v, ()) if w in pri
                )
            ]
            for v in new_in:
                state[v] = 1
            for v in state:
                if state[v] == 0 and any(
                    state.get(w) == 1 for w in nbrs.get(v, ())
                ):
                    state[v] = 2
            if all(s != 0 for s in state.values()):
                break
        for v in state:
            if state[v] == 1:
                color[v] = layer
    replay_mismatches = sum(1 for v in color if color[v] != got.get(v))
    return {
        "check": "properness_and_exact_layered_luby_replay",
        "n_colors": n_colors,
        "proper_violations": proper_violations,
        "uncolored": uncolored,
        "replay_mismatches": replay_mismatches,
        "pass": bool(
            proper_violations == 0
            and uncolored == 0
            and replay_mismatches == 0
        ),
    }


def _check_densest_subgraph(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """densest_subgraph vs an independent numpy replay of the exact
    level-batched cascade, plus the Charikar bound best ≥ degeneracy/2."""
    import numpy as np

    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.pipelines.queries import QUERIES

    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    src = edf.src.to_numpy(np.int64)
    dst = edf.dst.to_numpy(np.int64)
    n = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    deg = np.bincount(src, minlength=n) + np.bincount(dst, minlength=n)
    active = np.ones(n, bool)
    e_rem = len(src)
    best = (e_rem / n if n else 0.0, n, e_rem, 0)
    k = 0
    degeneracy = 0
    while active.any():
        k = max(k, int(deg[active].min()))
        degeneracy = max(degeneracy, k)
        while True:
            batch = active & (deg <= k)
            if not batch.any():
                break
            active &= ~batch
            if not active.any():
                break
            keep = batch[src] & active[dst]
            keep2 = batch[dst] & active[src]
            deg -= np.bincount(dst[keep], minlength=n)
            deg -= np.bincount(src[keep2], minlength=n)
            e_rem = int(deg[active].sum()) // 2
            nv = int(active.sum())
            rho = e_rem / nv
            if rho > best[0]:
                best = (rho, nv, e_rem, k)
    row = rdf.iloc[0]
    want_density = float(round_half_away(np.array([best[0]]), 6)[0])
    ok = (
        float(row.best_density) == want_density
        and int(row.n_vertices) == best[1]
        and int(row.n_edges) == best[2]
        and int(row.peel_level) == best[3]
        and best[0] * 2 >= degeneracy - 1e-9
    )
    return {
        "check": "exact_cascade_replay_and_charikar_bound",
        "want": [want_density, best[1], best[2], best[3]],
        "got": [
            float(row.best_density),
            int(row.n_vertices),
            int(row.n_edges),
            int(row.peel_level),
        ],
        "degeneracy": degeneracy,
        "pass": bool(ok),
    }


def _check_negative_edges(sf_dir: str, rdf: pd.DataFrame) -> dict:
    """negative_edges vs an exact sequential replay of the seeded draws
    (same splitmix64 stream, same first-k rule), plus structural
    assertions: no sampled pair is an edge, no self-pairs."""
    import numpy as np

    from graphsetintersection_ray.functions.hll import splitmix64
    from graphsetintersection_ray.pipelines.linkpred import (
        NEG_OVERSAMPLE,
        NEG_SEED,
    )
    from graphsetintersection_ray.pipelines.queries import QUERIES

    k = 3
    nbrs = _nbr_sets(sf_dir)
    edf = QUERIES["edges_int"](sf_dir).to_pandas()
    n = int(max(edf.src.max(), edf.dst.max())) + 1 if len(edf) else 0
    edge_set = set(zip(edf.src.astype(int), edf.dst.astype(int))) | set(
        zip(edf.dst.astype(int), edf.src.astype(int))
    )
    got = sorted(zip(rdf.u.astype(int), rdf.v.astype(int)))
    edge_hits = sum(1 for p in got if p in edge_set)
    self_pairs = sum(1 for u, v in got if u == v)

    want = []
    m = NEG_OVERSAMPLE * k
    for u in range(n):
        raw = (
            np.uint64(u) * np.uint64(0x9E3779B97F4A7C15)
            + np.arange(m, dtype=np.uint64)
            + np.uint64(NEG_SEED)
        )
        cand = (splitmix64(raw) % np.uint64(n)).astype(np.int64)
        taken = 0
        for c in cand:
            c = int(c)
            if c == u or (u, c) in edge_set:
                continue
            want.append((u, c))
            taken += 1
            if taken == k:
                break
    want.sort()
    return {
        "check": "structural_and_exact_seeded_replay",
        "rows": len(got),
        "edge_hits": edge_hits,
        "self_pairs": self_pairs,
        "replay_match": bool(got == want),
        "pass": bool(edge_hits == 0 and self_pairs == 0 and got == want),
    }


SEMANTIC_CHECKS = {
    "mis_luby": _check_mis_luby,
    "graph_coloring": _check_graph_coloring,
    "approx_triangles": _check_approx_triangles,
    "densest_subgraph": _check_densest_subgraph,
    "negative_edges": _check_negative_edges,
    "embedding_dups_lsh": _check_embedding_dups_lsh,
    "pagerank": _check_pagerank,
    "harmonic": _check_harmonic,
    "media_decode": _check_media_decode,
    "betweenness": _check_betweenness,
    "closeness": _check_closeness,
    "neighborhood_function": _check_neighborhood_fn,
    "kmeans_clusters": _check_kmeans,
    "coreness": _check_coreness,
    "trussness": _check_trussness,
    "gro_order": _check_gro_order,
    "bp_order": _check_bp_order,
    "dfs_order": _check_dfs_order,
    "rcm_order": _check_rcm_order,
    "bfsr_order": _check_bfsr_order,
    "slashburn_order": _check_slashburn_order,
    "simhash_pairs": _check_simhash_pairs,
    "knn_lsh": _check_knn_lsh,
    "knn_ivf": _check_knn_ivf,
    "bloom_dedup": _check_bloom_dedup,
    "approx_distinct": _check_approx_distinct,
    "effective_diameter": _check_effective_diameter,
    "image_decode": _check_image_decode,
    "weighted_sample": _check_weighted_sample,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from graphsetintersection_ray.pipelines.queries import QUERIES, ORACLE_SQL

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    semantic_results = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            rdf = res.to_pandas()
        else:
            rdf = pd.DataFrame(res)
        ray_sec = time.time() - t0
        if name not in ORACLE_SQL:
            checker = SEMANTIC_CHECKS.get(name)
            if checker is None:
                print(
                    f"{name:24s} rows={len(rdf):7d}  (no oracle) {ray_sec:6.1f}s"
                )
                continue
            try:
                result = checker(sf_dir, rdf)
            except Exception as exc:  # noqa: BLE001 - recorded, not hidden
                result = {"check": "error", "error": repr(exc), "pass": False}
            semantic_results[name] = dict(result, rows=len(rdf))
            status = "OK " if result.get("pass") else "FAIL"
            print(
                f"{name:24s} rows={len(rdf):7d} semantic[{result['check']}] "
                f"{status} {ray_sec:6.1f}s"
            )
            if not result.get("pass"):
                failures.append(name)
                print("  detail:", result)
            continue
        odf = con.execute(ORACLE_SQL[name]).df()
        a, b = normalize(rdf), normalize(odf)
        ok_rows = len(a) == len(b)
        ok_schema = list(a.columns) == list(b.columns)
        ok_hash = ok_rows and ok_schema and value_hash(rdf) == value_hash(odf)
        status = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name:24s} rows={len(rdf):7d}/{len(odf):7d} "
            f"schema={'Y' if ok_schema else 'N'} hash={'Y' if ok_hash else 'N'} "
            f"{status} {ray_sec:6.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            print("  ray:", a.head(3).to_dict("records"))
            print("  sql:", b.head(3).to_dict("records"))
    if semantic_results:
        import json
        import os

        out = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "NOORACLE_CHECKS.json")
        # runs MERGE per sf_dir: the file keeps one "checks" section per
        # scale ("by_sf"), so a single-query check at one sf never
        # clobbers the full gate's record at another. Top-level
        # sf_dir/checks mirror the primary (sf0.01) gate when present,
        # else the latest run, for backward compatibility.
        by_sf: dict = {}
        if os.path.exists(out):
            try:
                with open(out) as f:
                    prev = json.load(f)
                by_sf = prev.get("by_sf", {})
                if prev.get("sf_dir") and prev.get("checks"):
                    by_sf.setdefault(prev["sf_dir"], {}).update(
                        prev["checks"]
                    )
            except (json.JSONDecodeError, OSError):
                pass
        by_sf.setdefault(sf_dir, {}).update(semantic_results)
        primary = (
            "/root/testdata/sf0.01"
            if "/root/testdata/sf0.01" in by_sf
            else sf_dir
        )
        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": primary,
                    "checks": by_sf[primary],
                    "by_sf": by_sf,
                },
                f,
                indent=1,
            )
        print(f"semantic check results -> {out}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL QUERIES MATCH")
    ray.shutdown()


if __name__ == "__main__":
    main()
