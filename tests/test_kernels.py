"""Kernel conformance tests.

Mirrors the reference's test strategy (`exp/test_intersection_algos.cpp
-check 1`): generate parameterized random sorted-set pairs
(`exp/random_data_generator.cpp:4-45` gen_id_list semantics: len, skew,
selectivity, density knobs) and compare every kernel variant element-wise
against the trivial scalar-merge oracle.
"""

import numpy as np
import pytest

from graphsetintersection_ray.functions import kernels as K


def gen_id_list(rng, length, skew=1.0, select=0.1, dense=0.01):
    """Seeded analog of the reference's random sorted-set-pair generator
    (exp/random_data_generator.cpp:4-45): produce (a, b) with |b| =
    len/skew, expected overlap ratio `select`, and value density `dense`."""
    len_a = int(length)
    len_b = max(1, int(length / skew))
    universe = max(len_a + len_b + 8, int(len_a / max(dense, 1e-6)))
    a = np.sort(rng.choice(universe, size=len_a, replace=False)).astype(np.int32)
    n_common = int(min(len_a, len_b) * select)
    common = rng.choice(a, size=n_common, replace=False)
    rest = rng.choice(universe, size=len_b, replace=False)
    b = np.unique(np.concatenate([common, rest]))[:len_b].astype(np.int32)
    return a, np.sort(b)


def oracle_intersect(a, b):
    return np.array(sorted(set(a.tolist()) & set(b.tolist())), dtype=np.int32)


PARAM_GRID = [
    dict(length=100, skew=1.0, select=0.1, dense=0.01),
    dict(length=1000, skew=1.0, select=0.5, dense=0.1),
    dict(length=1000, skew=50.0, select=0.3, dense=0.01),   # galloping path
    dict(length=2000, skew=1000.0, select=1.0, dense=0.05),  # extreme skew
    dict(length=50, skew=1.0, select=0.0, dense=0.001),      # near-empty overlap
    dict(length=1, skew=1.0, select=0.0, dense=0.5),
]


@pytest.mark.parametrize("algo", sorted(K.INTERSECT_ALGOS))
@pytest.mark.parametrize("params", PARAM_GRID, ids=lambda p: f"len{p['length']}_skew{p['skew']}")
def test_intersect_conformance(algo, params):
    rng = np.random.default_rng(42)
    for rep in range(3):
        a, b = gen_id_list(rng, **params)
        got = K.INTERSECT_ALGOS[algo](a, b)
        np.testing.assert_array_equal(np.asarray(got), oracle_intersect(a, b))


def test_intersect_empty():
    e = np.empty(0, np.int32)
    x = np.array([1, 5, 9], np.int32)
    for algo, fn in K.INTERSECT_ALGOS.items():
        assert len(fn(e, x)) == 0, algo
        assert len(fn(x, e)) == 0, algo


def test_intersect_count():
    a = np.array([1, 3, 5, 7], np.int32)
    b = np.array([3, 4, 5, 100], np.int32)
    assert K.intersect_count_sorted(a, b) == 2


def test_union_difference():
    rng = np.random.default_rng(7)
    a, b = gen_id_list(rng, 500, skew=4.0, select=0.4)
    sa, sb = set(a.tolist()), set(b.tolist())
    np.testing.assert_array_equal(K.union_sorted(a, b), sorted(sa | sb))
    np.testing.assert_array_equal(K.difference_sorted(a, b), sorted(sa - sb))
    np.testing.assert_array_equal(K.difference_sorted(b, a), sorted(sb - sa))


def test_bsr_roundtrip():
    rng = np.random.default_rng(3)
    for params in PARAM_GRID:
        a, _ = gen_id_list(rng, **params)
        bases, states = K.bsr_pack(a)
        np.testing.assert_array_equal(K.bsr_unpack(bases, states), a)
        # comp_ratio sanity: packs <= elements
        assert len(bases) <= len(a)


def test_bsr_intersect_count_matches_uint():
    rng = np.random.default_rng(11)
    for params in PARAM_GRID:
        a, b = gen_id_list(rng, **params)
        ba, sa = K.bsr_pack(a)
        bb, sb = K.bsr_pack(b)
        expect = oracle_intersect(a, b)
        assert K.bsr_intersect_count(ba, sa, bb, sb) == len(expect)
        np.testing.assert_array_equal(
            K.bsr_unpack(*K.bsr_intersect(ba, sa, bb, sb)), expect
        )


def test_bsr_difference():
    a = np.array([0, 1, 31, 32, 64, 100], np.int32)
    b = np.array([1, 32, 33, 100], np.int32)
    ba, sa = K.bsr_pack(a)
    bb, sb = K.bsr_pack(b)
    np.testing.assert_array_equal(
        K.bsr_unpack(*K.bsr_difference(ba, sa, bb, sb)), [0, 31, 64]
    )


def test_popcount():
    x = np.array([0, 1, 3, 0xFFFFFFFF, 0x80000000], np.uint32)
    np.testing.assert_array_equal(K.popcount(x), [0, 1, 2, 32, 1])


def _make_list_col(list_of_arrays):
    offsets = np.zeros(len(list_of_arrays) + 1, np.int64)
    offsets[1:] = np.cumsum([len(a) for a in list_of_arrays])
    values = (
        np.concatenate(list_of_arrays)
        if list_of_arrays and sum(len(a) for a in list_of_arrays)
        else np.empty(0, np.int32)
    )
    return offsets, values.astype(np.int32)


def test_pairwise_intersect_count():
    rng = np.random.default_rng(5)
    pairs = [gen_id_list(rng, 1 + rng.integers(200), skew=float(rng.integers(1, 60)), select=0.3)
             for _ in range(50)]
    pairs.append((np.empty(0, np.int32), np.array([1, 2], np.int32)))
    pairs.append((np.array([7], np.int32), np.empty(0, np.int32)))
    oa, va = _make_list_col([p[0] for p in pairs])
    ob, vb = _make_list_col([p[1] for p in pairs])
    got = K.pairwise_intersect_count(oa, va, ob, vb)
    expect = [len(oracle_intersect(a, b)) for a, b in pairs]
    np.testing.assert_array_equal(got, expect)


def test_pairwise_intersect_values():
    pairs = [
        (np.array([1, 2, 3], np.int32), np.array([2, 3, 4], np.int32)),
        (np.array([5], np.int32), np.array([6], np.int32)),
        (np.array([0, 10, 20], np.int32), np.array([0, 20], np.int32)),
    ]
    oa, va = _make_list_col([p[0] for p in pairs])
    ob, vb = _make_list_col([p[1] for p in pairs])
    rows, vals = K.pairwise_intersect(oa, va, ob, vb)
    assert rows.tolist() == [0, 0, 2, 2]
    assert vals.tolist() == [2, 3, 0, 20]


def test_grouped_bsr_intersect_count():
    """Batched BSR engine kernel vs a per-pair set oracle: rows grouped
    into segments; each row's B set intersects its segment's A set."""
    rng = np.random.default_rng(11)
    n_segs, n_rows = 5, 40
    seg_sets = [
        np.unique(rng.integers(0, 500, size=rng.integers(1, 80)))
        for _ in range(n_segs)
    ]
    seg_of_row = rng.integers(0, n_segs, size=n_rows)
    b_sets = [
        np.unique(rng.integers(0, 500, size=rng.integers(0, 60)))
        for _ in range(n_rows)
    ]
    a_rows = np.concatenate(
        [np.full(len(s), i, np.int64) for i, s in enumerate(seg_sets)]
    )
    a_vals = np.concatenate(seg_sets)
    b_rows = np.concatenate(
        [np.full(len(s), i, np.int64) for i, s in enumerate(b_sets)]
    )
    b_vals = (
        np.concatenate([s for s in b_sets if len(s)])
        if any(len(s) for s in b_sets)
        else np.empty(0, np.int64)
    )
    got = K.grouped_bsr_intersect_count(seg_of_row, a_rows, a_vals, b_rows, b_vals)
    expect = sum(
        len(np.intersect1d(seg_sets[seg_of_row[r]], b_sets[r]))
        for r in range(n_rows)
    )
    assert got == expect


def test_bsr_merge_one():
    """K10: inserting one value = union with a singleton, for every insert
    position (before / between / after / existing base, set / unset bit)."""
    rng = np.random.default_rng(7)
    vals = np.sort(rng.choice(500, size=60, replace=False)).astype(np.int32)
    bases, states = K.bsr_pack(vals)
    for v in [0, 3, 64, 499, int(vals[0]), int(vals[-1]), 257]:
        nb, ns = K.bsr_merge_one(bases, states, v)
        got = K.bsr_unpack(nb, ns)
        want = np.union1d(vals, np.array([v], np.int32))
        np.testing.assert_array_equal(got, want)
        # input untouched (functional contract)
        np.testing.assert_array_equal(K.bsr_unpack(bases, states), vals)
    # empty-set insert
    nb, ns = K.bsr_merge_one(np.empty(0, np.int32), np.empty(0, np.uint32), 42)
    np.testing.assert_array_equal(K.bsr_unpack(nb, ns), [42])


def test_bsr_subtract_visited_unvisited():
    """K11/K12: A\\visited and A∩visited against a dense global bitmap
    partition the set A exactly (the P/X split of the BSR clique driver)."""
    rng = np.random.default_rng(11)
    universe = 2000
    a = np.sort(rng.choice(universe, size=300, replace=False)).astype(np.int32)
    marked = rng.choice(universe, size=700, replace=False).astype(np.int64)
    bases, states = K.bsr_pack(a)
    visited = K.visited_bitmap(universe)
    K.bitmap_mark(visited, marked)

    unv = K.bsr_unpack(*K.bsr_subtract_visited(bases, states, visited))
    vis = K.bsr_unpack(*K.bsr_subtract_unvisited(bases, states, visited))
    mset = set(marked.tolist())
    np.testing.assert_array_equal(
        unv, np.array(sorted(set(a.tolist()) - mset), np.int32)
    )
    np.testing.assert_array_equal(
        vis, np.array(sorted(set(a.tolist()) & mset), np.int32)
    )
    # exact partition of A
    np.testing.assert_array_equal(np.union1d(unv, vis), a)
    assert len(np.intersect1d(unv, vis)) == 0
    # empty A
    eb, es = K.bsr_subtract_visited(
        np.empty(0, np.int32), np.empty(0, np.uint32), visited
    )
    assert len(eb) == 0 and len(es) == 0
