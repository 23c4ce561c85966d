"""End-to-end graph pipeline tests (SURVEY.md §5 test plan).

Oracles: DuckDB SQL for the derivation chain; brute-force O(V^3) for
triangles; dense NumPy power iteration for PageRank; union-find for CC.
"""

import itertools

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def art(ray_session):
    from graphsetintersection_ray.pipelines.graph import build_graph

    return build_graph(SF, num_partitions=4)


@pytest.fixture(scope="module")
def sym_df(art):
    return art.sym.to_pandas()


def test_transcripts_match_sql_oracle(ray_session):
    import duckdb

    from graphsetintersection_ray.pipelines.graph import transcripts_from_sf
    from graphsetintersection_ray.sources.transcripts import TRANSCRIPTS_SQL

    tdf = transcripts_from_sf(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    odf = con.execute(TRANSCRIPTS_SQL).df()
    a = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = odf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = b[a.columns.tolist()]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_per_turn_text_preserved(ray_session):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — texts are the events' props, unchanged."""
    import duckdb

    from graphsetintersection_ray.pipelines.graph import transcripts_from_sf

    tdf = transcripts_from_sf(SF).to_pandas()
    con = duckdb.connect()
    src = con.execute(
        f"SELECT props FROM '{SF}/events.parquet' ORDER BY props"
    ).df()["props"]
    got = tdf["text"].sort_values().reset_index(drop=True)
    pd.testing.assert_series_equal(
        got, src.reset_index(drop=True), check_names=False
    )


def test_edges_canonical_and_distinct(art):
    edf = art.edges.to_pandas()
    assert (edf.src < edf.dst).all()
    assert not edf.duplicated().any()
    # dense ids: 0..n-1
    vdf = art.vertices.to_pandas()
    assert sorted(vdf.vid.tolist()) == list(range(len(vdf)))


def test_degree_sum(art, sym_df):
    ddf = art.degrees.to_pandas()
    assert ddf.degree.sum() == len(sym_df)
    assert len(ddf) == art.n_vertices


def test_triangle_count_vs_bruteforce(art):
    from graphsetintersection_ray.pipelines.triangle import (
        global_triangle_count,
        per_vertex_triangles,
    )

    edf = art.edges.to_pandas()
    E = set(map(tuple, edf.values.tolist()))
    V = sorted(set(edf.src) | set(edf.dst))
    per_v = {}
    total = 0
    for a, b, c in itertools.combinations(V, 3):
        if (a, b) in E and (a, c) in E and (b, c) in E:
            total += 1
            for x in (a, b, c):
                per_v[x] = per_v.get(x, 0) + 1
    # broadcast-CSR path (default at this size)
    assert global_triangle_count(art.oriented, num_partitions=4) == total
    pv = per_vertex_triangles(art.oriented, num_partitions=4).to_pandas()
    assert dict(zip(pv.v, pv.triangles)) == per_v

    # join path (the at-scale route) must agree
    from graphsetintersection_ray.pipelines import triangle as tri_mod

    old = tri_mod.BROADCAST_MAX_EDGES
    tri_mod.BROADCAST_MAX_EDGES = 0
    try:
        assert global_triangle_count(art.oriented, num_partitions=4) == total
        pv2 = per_vertex_triangles(art.oriented, num_partitions=4).to_pandas()
        assert dict(zip(pv2.v, pv2.triangles)) == per_v
    finally:
        tri_mod.BROADCAST_MAX_EDGES = old

    # third engine (batched BSR / Roaring analog) must agree too — the
    # reference's engine-agreement strategy (tc.cpp:14-16) made real
    from graphsetintersection_ray.pipelines.triangle import (
        global_triangle_count_bsr,
    )

    assert global_triangle_count_bsr(art.oriented, num_partitions=4) == total


def test_join_branch_build_matches_broadcast(art, ray_session):
    """Force BROADCAST_MAX_VERTICES=0 so edges_to_ids and orient_by_degree
    take their hash-join branches (the 100 TB code paths) and check the
    results equal the broadcast-path artifacts edge-for-edge."""
    from graphsetintersection_ray.stages import graph_build as gb

    old = gb.BROADCAST_MAX_VERTICES
    gb.BROADCAST_MAX_VERTICES = 0
    try:
        edges_j = gb.compact_blocks(
            gb.edges_to_ids(art.edges_str, art.vertices, num_partitions=4)
        )
        edf = edges_j.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        want = art.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(edf, want, check_dtype=False)

        oriented_j = gb.compact_blocks(
            gb.orient_by_degree(edges_j, art.degrees, num_partitions=4)
        )
        odf = oriented_j.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        wanto = art.oriented.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(odf, wanto, check_dtype=False)

        # and the join-path TC over the join-built DAG still agrees
        from graphsetintersection_ray.pipelines import triangle as tri_mod
        from graphsetintersection_ray.pipelines.triangle import (
            global_triangle_count,
        )

        old_e = tri_mod.BROADCAST_MAX_EDGES
        tri_mod.BROADCAST_MAX_EDGES = 0
        try:
            got = global_triangle_count(oriented_j, num_partitions=4)
        finally:
            tri_mod.BROADCAST_MAX_EDGES = old_e
        assert got == global_triangle_count(art.oriented, num_partitions=4)
    finally:
        gb.BROADCAST_MAX_VERTICES = old


def test_pagerank_allclose_numpy(art, sym_df):
    from graphsetintersection_ray.pipelines import iterative as it

    pr, stats = it.pagerank(art, tol=1e-6, resume=False)
    prd = pr.to_pandas().sort_values("v").reset_index(drop=True)
    N = art.n_vertices
    A = np.zeros((N, N))
    A[sym_df.dst, sym_df.src] = 1.0
    M = A / A.sum(axis=0)[None, :]
    s = np.full(N, 1.0 / N)
    for _ in range(500):
        s2 = 0.15 / N + 0.85 * (M @ s)
        if np.abs(s2 - s).max() < 1e-6:
            s = s2
            break
        s = s2
    assert np.allclose(prd.score.to_numpy(), s, atol=1e-6)
    assert abs(prd.score.sum() - 1.0) < 1e-9


def _union_find_components(sym_df, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(sym_df.src, sym_df.dst):
        a, b = find(s), find(d)
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp = np.array([find(v) for v in range(n)])
    return pd.Series(range(n)).groupby(comp).transform("min").to_numpy()


def test_cc_and_labelprop_exact(art, sym_df):
    from graphsetintersection_ray.pipelines import iterative as it

    minid = _union_find_components(sym_df, art.n_vertices)
    cc, _ = it.connected_components(art, resume=False)
    ccd = cc.to_pandas().sort_values("v").reset_index(drop=True)
    np.testing.assert_array_equal(ccd.component.to_numpy(), minid)
    lp, _ = it.label_propagation(art, resume=False)
    lpd = lp.to_pandas().sort_values("v").reset_index(drop=True)
    np.testing.assert_array_equal(lpd.label.to_numpy(), minid)


def test_checkpoint_resume(art, tmp_path):
    """Kill after superstep k, resume from checkpoint → identical result."""
    from graphsetintersection_ray.state.superstep import SuperstepEngine

    ck = str(tmp_path / "ckpt")
    e1 = SuperstepEngine(
        art.csr_path, art.csr_partitions, ckpt_dir=ck,
        graph_fingerprint=art.fingerprint,
    )
    e1.pagerank(max_iters=5, tol=0.0, resume=False, checkpoint_every=1)
    partial = e1.collect_state().to_pandas().sort_values("v")
    assert e1.latest_complete_iter("pagerank") == 4

    # fresh engine ("restarted job") resumes at iter 5 and finishes
    e2 = SuperstepEngine(
        art.csr_path, art.csr_partitions, ckpt_dir=ck,
        graph_fingerprint=art.fingerprint,
    )
    e2.pagerank(max_iters=30, tol=0.0, resume=True, checkpoint_every=1)
    resumed = e2.collect_state().to_pandas().sort_values("v")

    # uninterrupted 30-iteration run for comparison
    e3 = SuperstepEngine(
        art.csr_path, art.csr_partitions, ckpt_dir=None,
        graph_fingerprint=art.fingerprint,
    )
    e3.pagerank(max_iters=30, tol=0.0, resume=False)
    full = e3.collect_state().to_pandas().sort_values("v")

    np.testing.assert_allclose(
        resumed.state.to_numpy(), full.state.to_numpy(), rtol=0, atol=0
    )
    # and the 5-iter partial differs (the resume really continued)
    assert not np.allclose(partial.state.to_numpy(), full.state.to_numpy())


def test_gro_order_permutation_and_locality(art):
    """GRO-style order: valid dense permutation, deterministic, and on a
    scattered-clique adjacency the greedy window pass packs clique
    members into adjacent ids (strictly fewer BSR packs than the
    scattered identity layout)."""
    from graphsetintersection_ray.pipelines.ordering import (
        _greedy_window_order,
        gro_order,
    )

    out = gro_order(art).to_pandas().sort_values("v")
    assert sorted(out.new_id.tolist()) == list(range(art.n_vertices))
    assert sorted(out.v.tolist()) == list(range(art.n_vertices))
    out2 = gro_order(art).to_pandas().sort_values("v")
    assert out.new_id.tolist() == out2.new_id.tolist()

    # crafted graph: 8 cliques of 8, members scattered stride-8 apart
    k, c = 8, 8
    n = k * c
    members = np.arange(n, dtype=np.int64)
    adj = {}
    for v in range(n):
        group = v % c  # scattered: clique = ids congruent mod c
        peers = np.array(
            [u for u in range(group, n, c) if u != v], np.int64
        )
        adj[v] = peers

    def packs(order_of):
        rank = {v: i for i, v in enumerate(order_of)}
        seen = set()
        for v in range(n):
            for u in adj[v]:
                seen.add((rank[v], rank[u] >> 5))
        return len(seen)

    greedy = _greedy_window_order(members, adj, window=16)
    assert sorted(greedy.tolist()) == list(range(n))
    assert packs(greedy.tolist()) < packs(list(range(n)))


def test_bp_order_permutation_and_locality(art):
    """Recursive-bisection order (R3/R4 analog): valid dense permutation,
    deterministic, and on planted interleaved communities the top-level
    bisection separates them exactly (zero cut, the mloggapa locality
    objective)."""
    from graphsetintersection_ray.pipelines.ordering import (
        _local_bisection_order,
        bp_order,
    )

    out = bp_order(art).to_pandas().sort_values("v")
    assert sorted(out.new_id.tolist()) == list(range(art.n_vertices))
    assert sorted(out.v.tolist()) == list(range(art.n_vertices))
    out2 = bp_order(art).to_pandas().sort_values("v")
    assert out.new_id.tolist() == out2.new_id.tolist()

    # two dense communities, ids interleaved (evens vs odds), no cross edges
    rng = np.random.default_rng(0)
    n = 128
    adj = {v: [] for v in range(n)}
    for comm in (0, 1):
        mem = [v for v in range(n) if v % 2 == comm]
        for _ in range(n * 4):
            a, b = rng.choice(mem, 2, replace=False)
            adj[int(a)].append(int(b))
            adj[int(b)].append(int(a))
    adj = {v: np.unique(np.array(a, np.int64)) for v, a in adj.items()}
    members = np.arange(n, dtype=np.int64)
    order = _local_bisection_order(members, adj, leaf=16, iters=8)
    assert sorted(order.tolist()) == list(range(n))
    assert (
        order == _local_bisection_order(members, adj, leaf=16, iters=8)
    ).all()
    half = set(order[: n // 2].tolist())
    cut = sum(
        1 for v in range(n) for w in adj[v] if (v in half) != (int(w) in half)
    )
    assert cut == 0
    # leaf parts are contiguous id blocks in the new order by construction:
    # every vertex's new_id block of 16 holds only same-community members
    for i in range(0, n, 16):
        block = order[i : i + 16] % 2
        assert (block == block[0]).all()


def test_dfs_order_matches_recursive_reference(art, sym_df):
    """DFS preorder (Q9): the iterative stack implementation must equal an
    independent recursive ascending-neighbor DFS on the same adjacency."""
    import sys

    from graphsetintersection_ray.pipelines.ordering import dfs_order

    out = dfs_order(art).to_pandas().sort_values("v")
    n = art.n_vertices
    assert sorted(out.new_id.tolist()) == list(range(n))

    adj: dict[int, list] = {}
    for s, d in zip(sym_df["src"], sym_df["dst"]):
        adj.setdefault(int(s), []).append(int(d))
    sys.setrecursionlimit(max(10_000, 4 * n))
    new_id: dict[int, int] = {}

    def visit(v: int) -> None:
        new_id[v] = len(new_id)
        for w in sorted(adj.get(v, [])):
            if w not in new_id:
                visit(w)

    for seed in range(n):
        if seed not in new_id:
            visit(seed)
    assert out.new_id.tolist() == [new_id[v] for v in range(n)]


def test_state_dataset_and_parquet_match_collect(art, tmp_path):
    """The at-scale result paths (per-partition Dataset blocks / Parquet
    files, no driver concat) return exactly collect_state's rows."""
    import pyarrow.parquet as pq

    from graphsetintersection_ray.state.superstep import SuperstepEngine

    eng = SuperstepEngine(
        art.csr_path, art.csr_partitions, graph_fingerprint=art.fingerprint
    )
    eng.pagerank(max_iters=5, tol=0.0, resume=False, checkpoint_every=0)
    small = eng.collect_state().to_pandas().sort_values("v").reset_index(drop=True)

    ds = eng.state_dataset().to_pandas().sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(ds, small)

    out = eng.collect_state_to_parquet(str(tmp_path / "state"))
    written = (
        pq.read_table(out).to_pandas().sort_values("v").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(written[["v", "state"]], small)


def test_synth_transcripts_deterministic(ray_session):
    from graphsetintersection_ray.sources.transcripts import synth_transcripts

    a = synth_transcripts(50, seed=7).to_pandas()
    b = synth_transcripts(50, seed=7, override_num_blocks=13).to_pandas()
    a = a.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_iterative_dataset_path_equals_collect(art, monkeypatch):
    """With GRAFT_COLLECT_MAX_VERTICES=0 the query wrappers return a Ray
    Dataset via state_dataset (no driver concat); rows must equal the
    small-graph collect path exactly, for all four algorithms."""
    import ray.data as rd

    from graphsetintersection_ray.pipelines import iterative as it

    runs = {
        "pagerank": lambda: it.pagerank(
            art, max_iters=10, tol=0.0, resume=False, round_to=6
        ),
        "cc": lambda: it.connected_components(art, resume=False),
        "lp": lambda: it.label_propagation(art, resume=False),
        "bfs": lambda: it.bfs_distances(art, source=0, resume=False),
    }
    for name, run in runs.items():
        monkeypatch.delenv("GRAFT_COLLECT_MAX_VERTICES", raising=False)
        small, _ = run()
        assert not isinstance(small, rd.Dataset), name
        monkeypatch.setenv("GRAFT_COLLECT_MAX_VERTICES", "0")
        big, _ = run()
        assert isinstance(big, rd.Dataset), name
        a = small.to_pandas().sort_values("v").reset_index(drop=True)
        b = big.to_pandas().sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
    monkeypatch.delenv("GRAFT_COLLECT_MAX_VERTICES", raising=False)


def test_slashburn_order(art):
    """SlashBurn (R5): valid dense permutation, deterministic, and on a
    planted hub/spoke graph the hub takes id 0 while leaf spokes fill the
    back block in discovery order (porder.cpp:1009-1114 semantics)."""
    from graphsetintersection_ray.pipelines.ordering import (
        _local_slashburn_order,
        slashburn_order,
    )

    out = slashburn_order(art).to_pandas().sort_values("v")
    n = art.n_vertices
    assert sorted(out.new_id.tolist()) == list(range(n))
    assert sorted(out.v.tolist()) == list(range(n))
    out2 = slashburn_order(art).to_pandas().sort_values("v")
    assert out.new_id.tolist() == out2.new_id.tolist()

    # planted graph: hub 7 joined to everyone; 0..19 (minus 7) a connected
    # core (path); 20..39 leaves hanging off the hub only
    m = 40
    adj = {v: [7] for v in range(m)}
    core = [v for v in range(20) if v != 7]
    for a, b in zip(core, core[1:]):
        adj[a].append(b)
        adj[b].append(a)
    adj[7] = [v for v in range(m) if v != 7]
    adj = {v: np.unique(np.array(a, np.int64)) for v, a in adj.items()}
    members = np.arange(m, dtype=np.int64)
    placed = _local_slashburn_order(members, adj)
    new_id = np.empty(m, np.int64)
    new_id[placed] = np.arange(m)
    # round 1, k=1: hub 7 is the unique max-degree vertex -> front id 0
    assert new_id[7] == 0
    # leaves 20..39 become singleton CCs (min_h_idx 0, size 1), sorted
    # before the 19-vertex giant core; assigned from the back in
    # discovery order: vertex 20 -> id 39, 21 -> 38, ..., 39 -> 20
    for i, leaf in enumerate(range(20, 40)):
        assert new_id[leaf] == m - 1 - i
    # the core keeps the front block after the hub
    assert sorted(new_id[core].tolist()) == list(range(1, 20))


def test_coded_derivation_matches_legacy(ray_session):
    """derive_graph_tables (int-pair fast path AND forced string
    fallback) must produce the same edge set and vertex encoding as the
    legacy string path — including roles that prefix each other, where
    actor-key canonicalization by (role, tool) tuple order would differ
    from the full-string order the oracle defines."""
    import ray.data as rd

    from graphsetintersection_ray.stages import graph_build as gb

    rng = np.random.default_rng(23)
    roles = ["user", "user2", "assistant"]
    tools = [f"t{i}" for i in range(12)] + ["t1:x"]
    rows = []
    for conv in range(150):
        for i in range(int(rng.integers(1, 8))):
            rows.append(
                (
                    f"cv{conv}",
                    i,
                    roles[rng.integers(0, 3)],
                    tools[rng.integers(0, 13)],
                    "txt",
                    pd.Timestamp("2024-01-01"),
                )
            )
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "tool", "text", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    tr = rd.from_pandas(df).repartition(5)

    legacy_edges = gb._derive_edges_legacy(tr, num_buckets=8).to_pandas()
    legacy_set = set(zip(legacy_edges.src_key, legacy_edges.dst_key))
    legacy_verts = (
        gb.encode_vertices(gb._derive_edges_legacy(tr, num_buckets=8))
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )

    for forced_fallback in (False, True):
        old = gb.SMALL_DIMS_MAX
        if forced_fallback:
            gb.SMALL_DIMS_MAX = 0
        try:
            e_ds, v_ds = gb.derive_graph_tables(tr, num_buckets=8)
            edf = e_ds.to_pandas()
            eset = set(zip(edf.src_key, edf.dst_key))
            assert eset == legacy_set, forced_fallback
            assert len(edf) == len(eset)  # no dup rows
            vdf = v_ds.to_pandas().sort_values("key").reset_index(drop=True)
            pd.testing.assert_frame_equal(vdf, legacy_verts)
        finally:
            gb.SMALL_DIMS_MAX = old


def test_rcm_order_matches_independent_replay(art, sym_df):
    """RCM: ids descending via degree-ascending seeds/BFS must equal an
    independent queue-based replay, and the mean |gap| over edges must
    not exceed the identity ordering's (the bandwidth property RCM
    exists for)."""
    from collections import deque

    from graphsetintersection_ray.pipelines.ordering import rcm_order

    out = rcm_order(art).to_pandas().sort_values("v")
    n = art.n_vertices
    assert sorted(out.new_id.tolist()) == list(range(n))

    adj: dict[int, list] = {}
    for s, d in zip(sym_df["src"], sym_df["dst"]):
        adj.setdefault(int(s), []).append(int(d))
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
    got = out.new_id.to_numpy()
    assert got.tolist() == [new_id[v] for v in range(n)]
    src = sym_df["src"].to_numpy()
    dst = sym_df["dst"].to_numpy()
    assert np.abs(got[src] - got[dst]).mean() <= np.abs(src - dst).mean() * 1.05


def test_bfsr_order_permutation_and_determinism(art):
    """BFSR bisection: valid dense permutation, deterministic, and the
    sub-32 base case keeps array order (identity on a tiny graph)."""
    from graphsetintersection_ray.pipelines.ordering import bfsr_order

    out = bfsr_order(art).to_pandas().sort_values("v")
    n = art.n_vertices
    assert sorted(out.new_id.tolist()) == list(range(n))
    out2 = bfsr_order(art).to_pandas().sort_values("v")
    assert out.new_id.tolist() == out2.new_id.tolist()


def test_bfsr_sub32_identity(ray_session):
    """A graph with fewer than 32 vertices never recurses — bfsr must be
    the identity permutation."""
    import ray.data as rd

    from graphsetintersection_ray.pipelines.graph import (
        build_graph_from_transcripts,
    )
    from graphsetintersection_ray.pipelines.ordering import bfsr_order

    rows = []
    for conv in range(4):
        for i in range(3):
            rows.append((f"c{conv}", i, "user" if i % 2 == 0 else "assistant",
                         f"t{(conv + i) % 3}", "x", pd.Timestamp("2024-01-01")))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "tool", "text", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    art_small = build_graph_from_transcripts(
        rd.from_pandas(df), cache_key="bfsr-sub32", num_partitions=2
    )
    assert art_small.n_vertices < 32
    out = bfsr_order(art_small).to_pandas().sort_values("v")
    assert out.new_id.tolist() == list(range(art_small.n_vertices))


# ---------------------------------------------------------------------------
# Link prediction: per-edge support + scores (pipelines/linkpred.py)
# ---------------------------------------------------------------------------


def _bruteforce_linkpred(sym_df):
    """cn/jaccard/adamic_adar per canonical edge from neighbor sets."""
    import math

    nbrs = {}
    for s, d in zip(sym_df.src.to_numpy(), sym_df.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    out = {}
    for u, vs in nbrs.items():
        for v in vs:
            if u < v:
                common = nbrs[u] & nbrs[v]
                cn = len(common)
                jac = cn / (len(nbrs[u]) + len(nbrs[v]) - cn)
                aa = sum(1.0 / math.log(len(nbrs[w])) for w in common)
                out[(u, v)] = (cn, jac, aa)
    return out


def test_edge_support_bruteforce(art, sym_df):
    from graphsetintersection_ray.pipelines.linkpred import edge_support

    exact = _bruteforce_linkpred(sym_df)
    got = edge_support(art).to_pandas()
    assert len(got) == len(exact)  # every canonical edge exactly once
    for u, v, s in zip(got.u, got.v, got.support):
        assert exact[(int(u), int(v))][0] == int(s)


def test_link_scores_bruteforce(art, sym_df):
    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.pipelines.linkpred import link_scores

    exact = _bruteforce_linkpred(sym_df)
    got = link_scores(art).to_pandas()
    assert len(got) == len(exact)
    for row in got.itertuples():
        cn, jac, aa = exact[(int(row.u), int(row.v))]
        assert cn == int(row.cn)
        assert abs(float(round_half_away(jac, 6)) - row.jaccard) < 1e-12
        assert abs(float(round_half_away(aa, 6)) - row.adamic_adar) < 1e-9


def test_linkpred_join_paths_equal_broadcast(art):
    """Force the at-scale joined-bucket corner kernel AND the degree hash
    joins; results must match the broadcast path bit-for-bit."""
    from graphsetintersection_ray.pipelines import iterative as it_mod
    from graphsetintersection_ray.pipelines import linkpred as lp
    from graphsetintersection_ray.pipelines import triangle as tri_mod
    from graphsetintersection_ray.stages import graph_build as gb_mod

    # cached superstep actor pools (0.25 cpu each) can starve the hash-join
    # aggregator actors on the 4-cpu test cluster — release them first
    it_mod.release_engines()

    base_sup = (
        lp.edge_support(art).to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    )
    base_sc = (
        lp.link_scores(art).to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    )
    old_e, old_v = tri_mod.BROADCAST_MAX_EDGES, gb_mod.BROADCAST_MAX_VERTICES
    tri_mod.BROADCAST_MAX_EDGES = 0
    gb_mod.BROADCAST_MAX_VERTICES = 0
    try:
        sup = (
            lp.edge_support(art)
            .to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
        )
        sc = (
            lp.link_scores(art)
            .to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
        )
    finally:
        tri_mod.BROADCAST_MAX_EDGES = old_e
        gb_mod.BROADCAST_MAX_VERTICES = old_v
    pd.testing.assert_frame_equal(base_sup, sup, check_dtype=False)
    pd.testing.assert_frame_equal(
        base_sc, sc[base_sc.columns.tolist()], check_dtype=False
    )


def test_coreness_bruteforce(art, sym_df):
    """Level-batched distributed peel vs sequential min-degree peel."""
    import heapq

    from graphsetintersection_ray.pipelines.cliques import coreness

    nbrs = {}
    for s, d in zip(sym_df.src.to_numpy(), sym_df.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    n = art.n_vertices
    deg = {v: len(nbrs.get(v, ())) for v in range(n)}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    alive = set(range(n))
    core = {}
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v not in alive or d != deg[v]:
            continue
        k = max(k, d)
        core[v] = k
        alive.discard(v)
        for w in nbrs.get(v, ()):
            if w in alive:
                deg[w] -= 1
                heapq.heappush(heap, (deg[w], w))

    got = coreness(art).to_pandas()
    assert len(got) == n
    assert all(core[int(v)] == int(c) for v, c in zip(got.v, got.core))


def test_trussness_bruteforce(art, sym_df):
    """Batched distributed support peel vs textbook one-edge-at-a-time
    peel (truss = running max of support+2 at removal)."""
    import heapq

    from graphsetintersection_ray.pipelines.linkpred import trussness

    nbrs = {}
    for s, d in zip(sym_df.src.to_numpy(), sym_df.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    edges = {(u, v) for u, vs in nbrs.items() for v in vs if u < v}
    alive = set(edges)
    sup = {e: len(nbrs[e[0]] & nbrs[e[1]]) for e in edges}
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
            e1, e2 = (min(u, w), max(u, w)), (min(v, w), max(v, w))
            if e1 in alive and e2 in alive:
                for e3 in (e1, e2):
                    sup[e3] -= 1
                    heapq.heappush(heap, (sup[e3], e3))

    got = trussness(art).to_pandas()
    assert len(got) == len(edges)
    gd = {(int(r.u), int(r.v)): int(r.truss) for r in got.itertuples()}
    assert all(gd[e] == truss[e] for e in edges)


def test_clustering_coeff_bruteforce(art, sym_df):
    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.pipelines.queries import q_clustering_coeff

    nbrs = {}
    for s, d in zip(sym_df.src.to_numpy(), sym_df.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    got = q_clustering_coeff(SF).to_pandas()
    assert len(got) == art.n_vertices
    for v, lcc in zip(got.v, got.lcc):
        ns = nbrs.get(int(v), set())
        d = len(ns)
        if d < 2:
            want = 0.0
        else:
            t = sum(1 for a in ns for b in ns if a < b and b in nbrs[a])
            want = float(round_half_away(2.0 * t / (d * (d - 1)), 6))
        assert abs(lcc - want) < 1e-12, (v, lcc, want)


def test_link_candidates_bruteforce(art, sym_df):
    from graphsetintersection_ray.pipelines.linkpred import link_candidates

    nbrs = {}
    for s, d in zip(sym_df.src.to_numpy(), sym_df.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    edges = {(u, v) for u, vs in nbrs.items() for v in vs if u < v}
    # wedge-pair counts over non-edges
    cn = {}
    for c, ns in nbrs.items():
        for a in ns:
            for b in ns:
                if a < b and (a, b) not in edges:
                    cn[(a, b)] = cn.get((a, b), 0) + 1
    want = sorted(cn.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = link_candidates(art, topn=20).to_pandas()
    assert len(got) == min(20, len(cn))
    got_list = [((int(r.u), int(r.v)), int(r.cn)) for r in got.itertuples()]
    assert got_list == want


def test_two_hop_counts_bruteforce(art, sym_df):
    from graphsetintersection_ray.pipelines.linkpred import two_hop_counts

    nbrs = {}
    for s, d in zip(sym_df.src.to_numpy(), sym_df.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    want = {}
    for v, ns in nbrs.items():
        two = set()
        for w in ns:
            two |= nbrs.get(w, set())
        two.discard(v)
        if two:
            want[v] = len(two)
    got = two_hop_counts(art).to_pandas()
    assert dict(zip(got.v.astype(int), got.two_hop.astype(int))) == want


def test_personalized_pagerank_allclose_numpy(art, sym_df):
    """PPR (restart mass on vertex 0) vs dense NumPy random walk with
    restart; also: scores sum to 1 and the plain-pagerank path is
    untouched (engine shares the kind plumbing)."""
    from graphsetintersection_ray.pipelines import iterative as it

    ppr, _ = it.personalized_pagerank(art, source=0, tol=1e-9, resume=False)
    got = ppr.to_pandas().sort_values("v").reset_index(drop=True)
    N = art.n_vertices
    A = np.zeros((N, N))
    A[sym_df.dst, sym_df.src] = 1.0
    M = A / A.sum(axis=0)[None, :]
    e = np.zeros(N)
    e[0] = 1.0
    s = e.copy()
    for _ in range(1000):
        s2 = 0.15 * e + 0.85 * (M @ s)
        if np.abs(s2 - s).max() < 1e-9:
            s = s2
            break
        s = s2
    assert np.allclose(got.score.to_numpy(), s, atol=1e-7)
    assert abs(got.score.sum() - 1.0) < 1e-9


def test_link_candidates_skew_guard(art, sym_df):
    """max_center_degree drops exactly the hub-centered wedges (the
    jaccard max_df analog)."""
    from graphsetintersection_ray.pipelines.linkpred import link_candidates

    nbrs = {}
    for s, d in zip(sym_df.src.to_numpy(), sym_df.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    edges = {(u, v) for u, vs in nbrs.items() for v in vs if u < v}
    g = int(np.median([len(v) for v in nbrs.values()]))
    cn = {}
    for c, ns in nbrs.items():
        if len(ns) > g:
            continue
        for a in ns:
            for b in ns:
                if a < b and (a, b) not in edges:
                    cn[(a, b)] = cn.get((a, b), 0) + 1
    want = sorted(cn.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = link_candidates(art, topn=10, max_center_degree=g).to_pandas()
    got_list = [((int(r.u), int(r.v)), int(r.cn)) for r in got.itertuples()]
    assert got_list == want


def test_wedge_queries_join_paths_equal_broadcast(art):
    """link_candidates / two_hop_counts at-scale branches (hash join /
    packed-CSR join) must equal the broadcast branches bit-for-bit."""
    from graphsetintersection_ray.pipelines import iterative as it_mod
    from graphsetintersection_ray.pipelines import linkpred as lp
    from graphsetintersection_ray.pipelines import triangle as tri_mod

    it_mod.release_engines()
    base_lc = lp.link_candidates(art, topn=25).to_pandas().reset_index(drop=True)
    base_th = (
        lp.two_hop_counts(art).to_pandas().sort_values("v").reset_index(drop=True)
    )
    old = tri_mod.BROADCAST_MAX_EDGES
    tri_mod.BROADCAST_MAX_EDGES = 0
    try:
        lc = lp.link_candidates(art, topn=25).to_pandas().reset_index(drop=True)
        th = (
            lp.two_hop_counts(art).to_pandas().sort_values("v")
            .reset_index(drop=True)
        )
    finally:
        tri_mod.BROADCAST_MAX_EDGES = old
    pd.testing.assert_frame_equal(base_lc, lc, check_dtype=False)
    pd.testing.assert_frame_equal(base_th, th, check_dtype=False)


def test_degree_stats(art, sym_df):
    """degree_hist sums to V; assortativity equals np.corrcoef of
    endpoint degrees over directed sym edges (independent replay)."""
    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.pipelines.queries import (
        q_assortativity, q_degree_hist,
    )

    hist = q_degree_hist(SF).to_pandas()
    assert int(hist.cnt.sum()) == art.n_vertices
    deg = sym_df.groupby("src").size()
    dv = np.zeros(art.n_vertices, np.int64)
    dv[deg.index.to_numpy()] = deg.to_numpy()
    hd = dict(zip(hist.degree.astype(int), hist.cnt.astype(int)))
    vals, cnts = np.unique(dv[dv > 0], return_counts=True)
    assert hd == dict(zip(vals.tolist(), cnts.tolist()))

    x = dv[sym_df.src.to_numpy()]
    y = dv[sym_df.dst.to_numpy()]
    want = float(round_half_away(np.corrcoef(x, y)[0, 1], 6))
    got = float(q_assortativity(SF).to_pandas().assortativity.iloc[0])
    assert abs(got - want) < 1e-6


def test_hits_allclose_numpy(art):
    """HITS on the canonical directed edges vs dense numpy power
    iteration (same unnormalized-then-final-L2 semantics)."""
    from graphsetintersection_ray.pipelines import iterative as it

    res, stats = it.hits(art, iters=6)
    got = res.to_pandas().sort_values("v").reset_index(drop=True)

    edf = art.edges.to_pandas()
    N = art.n_vertices
    A = np.zeros((N, N))
    A[edf.src, edf.dst] = 1.0
    hub = np.ones(N)
    for _ in range(6):
        auth = A.T @ hub
        hub = A @ auth
    hub = hub / np.linalg.norm(hub)
    auth = auth / np.linalg.norm(auth)
    assert got.v.tolist() == list(range(N))
    assert np.allclose(got.hub.to_numpy(), hub, atol=1e-9)
    assert np.allclose(got.auth.to_numpy(), auth, atol=1e-9)


def test_hyperball_neighborhood_function(art, sym_df):
    """HyperBall nf vs the exact neighborhood function (boolean matrix
    powers): fixpoint radius must be exact, summed estimates within the
    single-sketch HLL error budget, and same-seed replay identical."""
    from graphsetintersection_ray.pipelines import iterative as it

    res, stats = it.neighborhood_function(art)
    got = res.to_pandas()

    n = art.n_vertices
    reach = np.eye(n, dtype=bool)
    reach[sym_df.src, sym_df.dst] = True
    adj = reach.astype(np.float32)
    exact = [float(n)]
    prev = np.eye(n, dtype=bool)
    cur = reach
    while (cur != prev).any():
        exact.append(float(cur.sum()))
        prev = cur
        cur = cur | ((cur.astype(np.float32) @ adj) > 0)
    assert len(got) == len(exact)
    rel = np.abs(got.est_reachable.to_numpy() - np.array(exact)) / np.array(exact)
    assert rel.max() < 0.20
    res2, _ = it.neighborhood_function(art)
    pd.testing.assert_frame_equal(got, res2.to_pandas())


def test_random_walks_are_valid_and_deterministic(ray_session):
    """Every step follows an existing edge (or stays on a dead end);
    same seed => identical corpus; walk count = vertex count; the
    broadcast and join paths agree (join path forced at zero
    threshold)."""
    from graphsetintersection_ray.pipelines.graph import build_graph
    from graphsetintersection_ray.pipelines import walks as wk

    art = build_graph("/root/testdata/sf0.001")
    w1 = wk.random_walks(art, walk_len=5, seed=3).to_pandas()
    w2 = wk.random_walks(art, walk_len=5, seed=3).to_pandas()
    key = ["walk_id", "pos"]
    w1s = w1.sort_values(key).reset_index(drop=True)
    assert w1s.equals(w2.sort_values(key).reset_index(drop=True))
    old = wk.WALK_BROADCAST_MAX_EDGES
    wk.WALK_BROADCAST_MAX_EDGES = 0
    try:
        wj = wk.random_walks(art, walk_len=5, seed=3).to_pandas()
    finally:
        wk.WALK_BROADCAST_MAX_EDGES = old
    assert w1s.equals(wj.sort_values(key).reset_index(drop=True))
    assert set(w1.pos) == set(range(5))
    assert w1.walk_id.nunique() == art.n_vertices

    edges = art.sym.to_pandas()
    eset = set(zip(edges.src, edges.dst))
    for wid, g in w1s.groupby("walk_id"):
        vs = g.sort_values("pos").v.to_numpy()
        for a, b in zip(vs[:-1], vs[1:]):
            assert (a, b) in eset or a == b


def test_betweenness_known_values_and_sampling(ray_session):
    """Star center carries all leaf pairs; path interior vertices carry
    2 pairs each; the stride-sampled estimate is scaled and close on a
    symmetric graph."""
    import dataclasses

    import pandas as pd
    import ray.data as rd

    from graphsetintersection_ray.pipelines.centrality import betweenness
    from graphsetintersection_ray.pipelines.graph import GraphArtifacts

    def art_for(edges):
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype("int32")
        sym = pd.concat(
            [df, df.rename(columns={"src": "dst", "dst": "src"})]
        )[["src", "dst"]]
        n = int(sym.max().max()) + 1
        return GraphArtifacts(
            transcripts=None, edges_str=None, vertices=None,
            edges=rd.from_pandas(df), sym=rd.from_pandas(sym),
            degrees=None, oriented=None, csr_path="",
            n_vertices=n, n_edges=len(df), num_partitions=4,
            csr_partitions=4, fingerprint="test",
        )

    # star K1,4 centered at 0
    star = art_for([(0, 1), (0, 2), (0, 3), (0, 4)])
    bc = betweenness(star).to_pandas().set_index("v").bc
    assert bc[0] == 6.0 and (bc.drop(0) == 0.0).all()

    # path 0-1-2-3
    path = art_for([(0, 1), (1, 2), (2, 3)])
    bc = betweenness(path).to_pandas().set_index("v").bc
    assert bc[1] == 2.0 and bc[2] == 2.0 and bc[0] == 0.0

    # sampled estimate on the star: sources {0, 2, 4} (stride 2), scaled
    est = betweenness(star, n_sources=3).to_pandas().set_index("v").bc
    assert est[0] > 0 and (est.drop(0) <= est[0]).all()


def test_closeness_star_values(ray_session):
    """K1,4: center closeness = 4/4 = 1.0; each leaf = 4/7."""
    import pandas as pd
    import ray.data as rd

    from graphsetintersection_ray.pipelines.centrality import closeness
    from graphsetintersection_ray.pipelines.graph import GraphArtifacts

    df = pd.DataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], columns=["src", "dst"]
    ).astype("int32")
    sym = pd.concat(
        [df, df.rename(columns={"src": "dst", "dst": "src"})]
    )[["src", "dst"]]
    art = GraphArtifacts(
        transcripts=None, edges_str=None, vertices=None,
        edges=rd.from_pandas(df), sym=rd.from_pandas(sym),
        degrees=None, oriented=None, csr_path="",
        n_vertices=5, n_edges=4, num_partitions=2,
        csr_partitions=2, fingerprint="t",
    )
    cl = closeness(art).to_pandas().set_index("v").closeness
    assert cl[0] == 1.0
    assert np.allclose(cl.drop(0), round(4 / 7, 6))


def test_eigenvector_matches_dense_numpy(art, sym_df):
    """8 symmetric multiplies from 1 + L2 normalization vs a dense
    numpy replay; top-score vertex = dominant-eigenvector argmax."""
    from graphsetintersection_ray.pipelines import iterative as it

    eig, _ = it.eigenvector(art, multiplies=8, round_to=None)
    got = eig.to_pandas().sort_values("v").reset_index(drop=True)
    N = art.n_vertices
    A = np.zeros((N, N))
    A[sym_df.src, sym_df.dst] = 1.0
    x = np.ones(N)
    for _ in range(8):
        x = A @ x
    x = x / np.linalg.norm(x)
    assert np.allclose(got.eig.to_numpy(), x, atol=1e-12)


def test_katz_matches_dense_numpy(art, sym_df):
    """8 affine supersteps x <- 1 + alpha*S.x from x = 0 vs a dense
    numpy replay — exact (alpha = 2^-7 is dyadic, terms are exact
    binary floats at this scale)."""
    from graphsetintersection_ray.pipelines import iterative as it
    from graphsetintersection_ray.state.superstep import KATZ_ALPHA

    kz, stats = it.katz(art, iters=8, resume=False, round_to=None)
    got = kz.to_pandas().sort_values("v").reset_index(drop=True)
    N = art.n_vertices
    A = np.zeros((N, N))
    A[sym_df.src, sym_df.dst] = 1.0
    x = np.zeros(N)
    for _ in range(8):
        x = 1.0 + KATZ_ALPHA * (A @ x)
    assert stats["iters"] == 8
    assert np.array_equal(got.katz.to_numpy(), x)


def test_closeness_superstep_path_equals_broadcast(art, ray_session):
    """Force the superstep-BFS per-source path (zero threshold) on a
    source subset and check it equals the broadcast path exactly."""
    from graphsetintersection_ray.pipelines import centrality as ct

    sources = np.array([0, 3, 17, 41], np.int64)
    base = (
        ct.closeness(art, sources=sources)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    old = ct.BC_BROADCAST_MAX_EDGES
    ct.BC_BROADCAST_MAX_EDGES = 0
    try:
        dist = (
            ct.closeness(art, sources=sources)
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
    finally:
        ct.BC_BROADCAST_MAX_EDGES = old
    pd.testing.assert_frame_equal(base, dist, check_dtype=False)


def test_coreness_trussness_match_recursive_sql(art, ray_session):
    """The recursive-CTE peel oracles (edge-set core peel with window
    degrees; support peel with min-lift) reproduce the engine's k-core
    and k-truss decompositions exactly at sf0.001."""
    import duckdb

    from graphsetintersection_ray.pipelines.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")

    eng = QUERIES["coreness"](SF).to_pandas().sort_values("v")
    orc = con.execute(ORACLE_SQL["coreness"]).df().sort_values("v")
    assert list(eng.core) == list(orc.core)

    engt = (
        QUERIES["trussness"](SF)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    orct = con.execute(ORACLE_SQL["trussness"]).df().sort_values(["u", "v"])
    assert list(engt.u) == list(orct.u)
    assert list(engt.v) == list(orct.v)
    assert list(engt.truss) == list(orct.truss)


def test_betweenness_superstep_path_equals_broadcast(art, ray_session):
    """Force the per-source Brandes superstep path (zero threshold) and
    check it matches the broadcast flat-CSR path to 1e-6 — exact
    (all-sources) AND stride-sampled estimator."""
    from graphsetintersection_ray.pipelines import centrality as ct

    for n_sources in (None, 13):
        base = (
            ct.betweenness(art, n_sources=n_sources)
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        old = ct.BC_BROADCAST_MAX_EDGES
        ct.BC_BROADCAST_MAX_EDGES = 0
        try:
            dist = (
                ct.betweenness(art, n_sources=n_sources)
                .to_pandas()
                .sort_values("v")
                .reset_index(drop=True)
            )
        finally:
            ct.BC_BROADCAST_MAX_EDGES = old
        assert np.array_equal(base.v.to_numpy(), dist.v.to_numpy())
        assert np.allclose(
            base.bc.to_numpy(), dist.bc.to_numpy(), atol=1e-6
        )


def test_effective_diameter_path_graph(ray_session):
    """Path 0-1-2-3: exact nf = [4, 10, 14, 16]; 90% target 14.4 lands
    between radii 2 and 3 -> interpolated 2.2. HLL at these tiny
    cardinalities is linear-counting-near-exact, so the estimate must
    land within 0.1; the fixpoint radius equals the diameter 3."""
    import pandas as pd
    import ray.data as rd

    from graphsetintersection_ray.pipelines import iterative as it
    from graphsetintersection_ray.pipelines.graph import GraphArtifacts

    df = pd.DataFrame(
        [(0, 1), (1, 2), (2, 3)], columns=["src", "dst"]
    ).astype("int32")
    sym = pd.concat(
        [df, df.rename(columns={"src": "dst", "dst": "src"})]
    )[["src", "dst"]]
    import tempfile

    from graphsetintersection_ray.stages.graph_build import (
        write_partitioned_csr,
    )

    csr_path = tempfile.mkdtemp(prefix="teff_csr_") + "/csr"
    write_partitioned_csr(rd.from_pandas(sym), csr_path, num_partitions=2)
    art = GraphArtifacts(
        transcripts=None, edges_str=None, vertices=None,
        edges=rd.from_pandas(df), sym=rd.from_pandas(sym),
        degrees=None, oriented=None, csr_path=csr_path,
        n_vertices=4, n_edges=3, num_partitions=2,
        csr_partitions=2, fingerprint="teff",
    )
    out = it.effective_diameter(art).to_pandas()
    assert int(out.max_radius[0]) == 3
    assert abs(float(out.eff_diameter[0]) - 2.2) < 0.1


def test_component_sizes_histogram(ray_session):
    """Size histogram sums to n_vertices and matches a union-find
    replay on the sf0.001 graph."""
    from graphsetintersection_ray.pipelines.queries import QUERIES

    out = QUERIES["component_sizes"](SF).to_pandas()
    cc = QUERIES["connected_components"](SF)
    ccd = cc.to_pandas() if hasattr(cc, "to_pandas") else cc
    sizes = ccd.groupby("component").size().value_counts().sort_index()
    got = out.set_index("size")["n_components"].sort_index()
    assert (got == sizes).all()
    assert int((out["size"] * out["n_components"]).sum()) == len(ccd)


def test_square_count_known_graphs(ray_session):
    """C4 -> 1 square; K4 -> 3; triangle -> 0; C4 plus a chord (K4 minus
    an edge) -> 1."""
    import pandas as pd
    import ray.data as rd

    from graphsetintersection_ray.pipelines.graph import GraphArtifacts
    from graphsetintersection_ray.pipelines.linkpred import square_count

    def art_for(edges, n):
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype("int32")
        sym = pd.concat(
            [df, df.rename(columns={"src": "dst", "dst": "src"})]
        )[["src", "dst"]]
        return GraphArtifacts(
            transcripts=None, edges_str=None, vertices=None,
            edges=rd.from_pandas(df), sym=rd.from_pandas(sym),
            degrees=None, oriented=None, csr_path="",
            n_vertices=n, n_edges=len(df), num_partitions=2,
            csr_partitions=2, fingerprint="tsq",
        )

    c4 = [(0, 1), (1, 2), (2, 3), (0, 3)]
    assert square_count(art_for(c4, 4)).to_pandas().squares[0] == 1
    k4 = c4 + [(0, 2), (1, 3)]
    assert square_count(art_for(k4, 4)).to_pandas().squares[0] == 3
    tri3 = [(0, 1), (1, 2), (0, 2)]
    assert square_count(art_for(tri3, 3)).to_pandas().squares[0] == 0
    diamond = c4 + [(0, 2)]
    assert square_count(art_for(diamond, 4)).to_pandas().squares[0] == 1


def test_engine_cache_evicts_lru_under_worker_budget(ray_session, art, monkeypatch):
    """The engine LRU must bound total live PartitionWorker actors: with a
    budget that fits only one engine, requesting a second graph's engine
    evicts (kills) the first, and re-requesting the first works again —
    the regression was unbounded cached actor pools starving the cluster
    until the next engine's creation blocked forever."""
    from graphsetintersection_ray.pipelines import iterative as it_mod

    it_mod.release_engines()
    monkeypatch.setenv(
        "GRAFT_ENGINE_WORKER_BUDGET", str(art.csr_partitions)
    )
    e1 = it_mod.engine_for(art)
    assert len(it_mod._ENGINES) == 1

    # distinct cache key: different ckpt_dir on the same graph
    e2 = it_mod.engine_for(art, ckpt_dir="/tmp/graft_test_evict_ckpt")
    assert e2 is not e1
    assert len(it_mod._ENGINES) == 1  # e1 evicted under the budget
    assert all(
        k[2] == "/tmp/graft_test_evict_ckpt" for k in it_mod._ENGINES
    )

    e1b = it_mod.engine_for(art)  # recreate after eviction: must not hang
    assert e1b is not e1
    assert int(e1b.n_total) == art.n_vertices
    it_mod.release_engines()


def test_modularity_known_value_and_join_path(ray_session, monkeypatch):
    """Two triangles bridged by one edge, split by triangle: m=7,
    intra=6, d_c=7 each -> Q = 6/7 - 2*49/(4*49) = 0.357143. One
    community -> Q = 0. The forced hash-join path must equal the
    broadcast path bit-for-bit."""
    import pandas as pd
    import ray.data as rd

    from graphsetintersection_ray.pipelines.graph import GraphArtifacts
    from graphsetintersection_ray.pipelines.linkpred import modularity
    from graphsetintersection_ray.stages import graph_build as gb_mod

    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    df = pd.DataFrame(edges, columns=["src", "dst"]).astype("int32")
    sym = pd.concat(
        [df, df.rename(columns={"src": "dst", "dst": "src"})]
    )[["src", "dst"]]
    degs = (
        sym.groupby("src").size().rename("degree").reset_index()
        .rename(columns={"src": "v"})
    )
    art = GraphArtifacts(
        transcripts=None, edges_str=None, vertices=None,
        edges=rd.from_pandas(df), sym=rd.from_pandas(sym),
        degrees=rd.from_pandas(degs), oriented=None, csr_path="",
        n_vertices=6, n_edges=len(df), num_partitions=2,
        csr_partitions=2, fingerprint="tmod",
    )
    labels = rd.from_pandas(
        pd.DataFrame({"v": range(6), "label": [0, 0, 0, 1, 1, 1]})
    )
    got = modularity(art, labels).to_pandas().modularity[0]
    assert got == round(6 / 7 - 2 * 49 / (4 * 49.0), 6)

    one = rd.from_pandas(pd.DataFrame({"v": range(6), "label": [0] * 6}))
    assert modularity(art, one).to_pandas().modularity[0] == 0.0

    monkeypatch.setattr(gb_mod, "BROADCAST_MAX_VERTICES", 0)
    got_join = modularity(art, labels).to_pandas().modularity[0]
    assert got_join == got


def test_harmonic_star_and_superstep_path(art, ray_session):
    """Star K1,4: center H = 4; each leaf H = 1 + 3/2 = 2.5. Then on the
    sf graph, the forced superstep-BFS path must equal the broadcast
    path exactly (integer counts through the shuffle on both routes)."""
    import ray.data as rd

    from graphsetintersection_ray.pipelines import centrality as ct
    from graphsetintersection_ray.pipelines.graph import GraphArtifacts

    edges = [(0, 1), (0, 2), (0, 3), (0, 4)]
    df = pd.DataFrame(edges, columns=["src", "dst"]).astype("int32")
    sym = pd.concat(
        [df, df.rename(columns={"src": "dst", "dst": "src"})]
    )[["src", "dst"]]
    star = GraphArtifacts(
        transcripts=None, edges_str=None, vertices=None,
        edges=rd.from_pandas(df), sym=rd.from_pandas(sym),
        degrees=None, oriented=None, csr_path="",
        n_vertices=5, n_edges=4, num_partitions=2,
        csr_partitions=2, fingerprint="thar",
    )
    got = (
        ct.harmonic(star).to_pandas().sort_values("v").reset_index(drop=True)
    )
    assert got.harmonic.tolist() == [4.0, 2.5, 2.5, 2.5, 2.5]

    sources = np.array([0, 3, 17, 41], np.int64)
    base = (
        ct.harmonic(art, sources=sources)
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    old = ct.BC_BROADCAST_MAX_EDGES
    ct.BC_BROADCAST_MAX_EDGES = 0
    try:
        dist = (
            ct.harmonic(art, sources=sources)
            .to_pandas().sort_values("v").reset_index(drop=True)
        )
    finally:
        ct.BC_BROADCAST_MAX_EDGES = old
    pd.testing.assert_frame_equal(base, dist, check_dtype=False)


def test_topo_levels_matches_longest_path(art):
    """topo_levels (monotone MAX-label superstep fixpoint on the
    directed out-CSR) vs an exact dense longest-path DP over the
    canonical DAG: level[v] = max over in-neighbors u of level[u]+1, 0
    for sources, evaluated in ascending-id order (valid because the
    canonical encoding guarantees src < dst)."""
    from graphsetintersection_ray.pipelines import iterative as it

    res, stats = it.topo_levels(art)
    got = res.to_pandas().sort_values("v").reset_index(drop=True)

    edf = art.edges.to_pandas()
    assert (edf.src < edf.dst).all()  # the acyclicity guarantee
    n = art.n_vertices
    want = np.zeros(n, np.int64)
    by_dst = edf.sort_values("dst")
    for s, d in zip(by_dst.src.to_numpy(), by_dst.dst.to_numpy()):
        want[d] = max(want[d], want[s] + 1)
    assert got.v.tolist() == list(range(n))
    np.testing.assert_array_equal(got.level.to_numpy(), want)
    assert stats["iters"] >= int(want.max()) + 1


def test_four_clique_count_both_paths(art):
    """global_four_clique_count vs a brute-force O(V^4) K4 oracle, on
    both the broadcast wedge-extension path and the forced join path
    (triangle corners ⋈ packed CSR three ways)."""
    from graphsetintersection_ray.pipelines import triangle as tri_mod
    from graphsetintersection_ray.pipelines.triangle import (
        global_four_clique_count,
    )

    edf = art.edges.to_pandas()
    E = set(zip(edf.src, edf.dst))
    V = sorted(set(edf.src) | set(edf.dst))
    total = 0
    for a, b, c, d in itertools.combinations(V, 4):
        if (
            (a, b) in E and (a, c) in E and (a, d) in E
            and (b, c) in E and (b, d) in E and (c, d) in E
        ):
            total += 1
    assert total > 0  # the fixture graph must actually exercise K4
    assert global_four_clique_count(art.oriented, num_partitions=4) == total

    old = tri_mod.BROADCAST_MAX_EDGES
    tri_mod.BROADCAST_MAX_EDGES = 0
    try:
        assert (
            global_four_clique_count(art.oriented, num_partitions=4) == total
        )
    finally:
        tri_mod.BROADCAST_MAX_EDGES = old


def test_rich_club_matches_bruteforce(art):
    """rich_club (two bounded histograms + driver suffix sums) vs a
    direct per-k recount over the pandas edge/degree tables."""
    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.pipelines.linkpred import rich_club

    got = rich_club(art).to_pandas().sort_values("k").reset_index(drop=True)
    edf = art.edges.to_pandas()
    ddf = art.degrees.to_pandas()
    deg = dict(zip(ddf.v, ddf.degree))
    max_deg = max(deg.values())
    rows = []
    for k in range(max_deg):
        nk = sum(1 for d in deg.values() if d > k)
        if nk < 2:
            continue
        ek = sum(
            1
            for s, d in zip(edf.src, edf.dst)
            if deg[s] > k and deg[d] > k
        )
        rows.append((k, float(round_half_away(2.0 * ek / (nk * (nk - 1)), 6))))
    want = pd.DataFrame(rows, columns=["k", "rich_club"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_neighbor_sample_deterministic_topk(art):
    """neighbor_sample vs a pandas groupby replay of the same
    multiplicative-hash ranking; re-run must be identical (determinism)."""
    from graphsetintersection_ray.pipelines.linkpred import neighbor_sample

    k = 3
    got = (
        neighbor_sample(art, k=k)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    sdf = art.sym.to_pandas()
    key = (
        sdf.dst.to_numpy(np.int64) * 2654435761
        + sdf.src.to_numpy(np.int64) * 40503
    ) % 1000000007
    rep = sdf.assign(key=key).sort_values(["src", "key", "dst"])
    want = (
        rep.groupby("src", sort=True)
        .head(k)[["src", "dst"]]
        .rename(columns={"src": "u", "dst": "v"})
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every vertex appears with min(degree, k) sampled neighbors
    ddf = art.degrees.to_pandas()
    counts = got.groupby("u").size()
    for v, d in zip(ddf.v, ddf.degree):
        assert counts.get(v, 0) == min(d, k)
    got2 = (
        neighbor_sample(art, k=k)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_greedy_coloring_proper_and_deterministic(art, sym_df):
    """Iterated-MIS coloring: every vertex colored, no edge with equal
    endpoint colors, colors contiguous from 0, identical across runs."""
    from graphsetintersection_ray.pipelines.iterative import greedy_coloring

    res1, stats = greedy_coloring(art)
    df1 = res1.to_pandas()
    col = dict(zip(df1.v.astype(int), df1.color.astype(int)))
    assert len(col) == art.n_vertices
    assert min(col.values()) == 0
    assert (df1.color >= 0).all()
    used = sorted(set(col.values()))
    assert used == list(range(len(used)))
    assert stats["colors"] == len(used)
    bad = [
        (u, w)
        for u, w in zip(sym_df.src.astype(int), sym_df.dst.astype(int))
        if u != w and col[u] == col[w]
    ]
    assert bad == []

    res2, _ = greedy_coloring(art)
    df2 = res2.to_pandas()
    assert df1.sort_values("v").color.tolist() == (
        df2.sort_values("v").color.tolist()
    )
