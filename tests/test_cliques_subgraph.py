"""Tests for maximal cliques, subgraph matching, and BFS distances."""

import itertools

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def art(ray_session):
    from graphsetintersection_ray.pipelines.graph import build_graph

    return build_graph(SF, num_partitions=4)


def _adj_sets(sym_df):
    adj = {}
    for s, d in zip(sym_df.src, sym_df.dst):
        adj.setdefault(s, set()).add(d)
    return adj


def _brute_maximal_cliques(adj):
    """Reference-free Bron-Kerbosch (no pivot) oracle."""
    cliques = []

    def bk(r, p, x):
        if not p and not x:
            cliques.append(frozenset(r))
            return
        for v in list(p):
            bk(r | {v}, p & adj.get(v, set()), x & adj.get(v, set()))
            p = p - {v}
            x = x | {v}

    vs = set(adj)
    bk(set(), vs, set())
    return set(cliques)


def test_maximal_cliques_vs_bruteforce(art):
    from graphsetintersection_ray.pipelines.cliques import maximal_cliques

    sym_df = art.sym.to_pandas()
    adj = _adj_sets(sym_df)
    expect = _brute_maximal_cliques(adj)
    got_strs = maximal_cliques(art).to_pandas()["members_str"]
    got = set(
        frozenset(int(x) for x in s.split(",")) for s in got_strs
    )
    assert got == expect
    assert len(got_strs) == len(got)  # each clique exactly once


def test_maximal_cliques_distributed_path(art):
    """Force the at-scale route (distributed peel + egonet join) and
    check it enumerates exactly the broadcast path's cliques."""
    from graphsetintersection_ray.pipelines import cliques as cl

    sym_df = art.sym.to_pandas()
    expect = _brute_maximal_cliques(_adj_sets(sym_df))
    old = cl.BROADCAST_MAX_EDGES
    cl.BROADCAST_MAX_EDGES = 0
    try:
        got_strs = cl.maximal_cliques(art).to_pandas()["members_str"]
    finally:
        cl.BROADCAST_MAX_EDGES = old
    got = set(frozenset(int(x) for x in s.split(",")) for s in got_strs)
    assert got == expect
    assert len(got_strs) == len(got)


def test_distributed_peel_order_is_valid(art):
    from graphsetintersection_ray.pipelines.cliques import distributed_peel_order

    order = distributed_peel_order(art)
    assert sorted(order.tolist()) == list(range(art.n_vertices))


def test_degeneracy_order_is_permutation(art):
    from graphsetintersection_ray.pipelines.cliques import (
        _sym_csr_arrays,
        degeneracy_order,
    )

    offsets, flat = _sym_csr_arrays(art)
    order = degeneracy_order(offsets, flat)
    assert sorted(order.tolist()) == list(range(art.n_vertices))


def test_subgraph_match_vs_bruteforce(art):
    from graphsetintersection_ray.pipelines.subgraph import (
        QUERY_GRAPHS,
        match_count,
        vertex_labels,
    )

    sym_df = art.sym.to_pandas()
    adj = _adj_sets(sym_df)
    # ONE execution: zipping columns from two separate .to_pandas() calls
    # pairs rows from independent runs, whose block order can differ
    lab_df = vertex_labels(art).to_pandas()
    labels = dict(zip(lab_df.v, lab_df.label))

    for name, q in QUERY_GRAPHS.items():
        got = match_count(art, q)
        # brute force: try all assignments via DFS over candidates
        def count_from(i, bound):
            if i == len(q.labels):
                return 1
            total = 0
            before = q.neighbors_before(i)
            if before:
                cand = set.intersection(
                    *[adj.get(bound[j], set()) for j in before]
                )
            else:
                cand = set(labels)
            for v in cand:
                if labels.get(v) == q.labels[i] and v not in bound[:i]:
                    total += count_from(i + 1, bound + [v])
            return total

        expect = count_from(0, [])
        assert got == expect, name

        # at-scale join path must agree
        from graphsetintersection_ray.pipelines import subgraph as sg

        old = sg.BROADCAST_MAX_EDGES
        sg.BROADCAST_MAX_EDGES = 0
        try:
            assert match_count(art, q) == expect, f"{name} (join path)"
        finally:
            sg.BROADCAST_MAX_EDGES = old


def test_query_file_loader_matches_named_patterns(art, tmp_path):
    """S6 parity (sm.cpp:15-43): a reference-format query file with
    PERMUTED vertex numbering parses, BFS-reorders into the expansion
    contract, and match-counts equal the equivalent named patterns."""
    from graphsetintersection_ray.pipelines.subgraph import (
        QUERY_GRAPHS,
        load_query_graphs,
        match_count,
        parse_query_file,
        reorder_connected,
    )

    # tri_ctt = labels (1,3,3), triangle — here written with the conv
    # vertex LAST and edges in reversed order; path_ctc = labels (1,3,1)
    # path through the tool — written tool-first (disconnected prefix
    # order that the loader must fix).
    spec = """
    3 3
    3 3 1
    2 1
    2 0
    1 0
    3 2
    3 1 1
    0 1
    0 2
    """
    qs = parse_query_file(spec)
    assert len(qs) == 2
    got_tri = match_count(art, qs[0])
    want_tri = match_count(art, QUERY_GRAPHS["tri_ctt"])
    # counts are per ordered embedding; both patterns have the same
    # automorphism count, so totals match exactly
    assert got_tri == want_tri > 0
    got_path = match_count(art, qs[1])
    want_path = match_count(art, QUERY_GRAPHS["path_ctc"])
    assert got_path == want_path > 0

    # file round-trip + naming
    p = tmp_path / "user.sm.queries"
    p.write_text(spec)
    loaded = load_query_graphs(str(p))
    assert set(loaded) == {"q0", "q1"}
    assert loaded["q0"] == qs[0]

    # the loader refuses disconnected patterns loudly
    with pytest.raises(ValueError, match="disconnected"):
        reorder_connected([0, 1, 2], [(0, 1)])


def test_bfs_distances_vs_bfs(art):
    from graphsetintersection_ray.pipelines.iterative import bfs_distances

    sym_df = art.sym.to_pandas()
    adj = _adj_sets(sym_df)
    # python BFS from 0
    from collections import deque

    dist = {0: 0}
    dq = deque([0])
    while dq:
        u = dq.popleft()
        for w in adj.get(u, ()):  # noqa
            if w not in dist:
                dist[w] = dist[u] + 1
                dq.append(w)
    out, _ = bfs_distances(art, source=0, resume=False)
    got = dict(zip(out["v"].to_pylist(), out["dist"].to_pylist()))
    assert got == dist
