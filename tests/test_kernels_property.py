"""Property-based kernel conformance (hypothesis).

Complements the fixed parameter grid in ``test_kernels.py`` (the
reference's `-check 1` harness, exp/test_intersection_algos.cpp:102-127)
with randomized property coverage: hypothesis drives arbitrary sorted
unique int32 set pairs — including empty, singleton, disjoint, nested and
fully-overlapping shapes the grid only samples — through every set
kernel and the BSR encoding, checking element-exact agreement with
Python-set oracles and the algebraic identities the reference relies on
(|A| = |A∩B| + |A\\B|, pack/unpack round-trip, bitmap-subtract
equivalence to set difference).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from graphsetintersection_ray.functions import kernels as K

# sorted unique int32 arrays over a universe small enough to force
# collisions yet wide enough to exercise the galloping/skew switch
sorted_set = st.lists(
    st.integers(min_value=0, max_value=5000), min_size=0, max_size=400
).map(lambda xs: np.unique(np.asarray(xs, dtype=np.int32)))

set_pair = st.tuples(sorted_set, sorted_set)


def _oracle(a, b, op):
    sa, sb = set(a.tolist()), set(b.tolist())
    return np.asarray(sorted(op(sa, sb)), dtype=np.int32)


@settings(max_examples=200, deadline=None)
@given(set_pair)
def test_intersect_algos_agree_with_set_oracle(pair):
    a, b = pair
    want = _oracle(a, b, set.intersection)
    for name, fn in K.INTERSECT_ALGOS.items():
        got = np.asarray(fn(a, b), dtype=np.int32)
        assert np.array_equal(got, want), name
    assert K.intersect_count_sorted(a, b) == len(want)


@settings(max_examples=200, deadline=None)
@given(set_pair)
def test_union_difference_oracle_and_partition_identity(pair):
    a, b = pair
    union = K.union_sorted(a, b)
    diff = K.difference_sorted(a, b)
    assert np.array_equal(union, _oracle(a, b, set.union))
    assert np.array_equal(diff, _oracle(a, b, set.difference))
    # |A| = |A ∩ B| + |A \ B| — the P/X-split invariant the clique
    # driver depends on (bitpack_maximal_clique.cpp:83-111)
    assert len(a) == K.intersect_count_sorted(a, b) + len(diff)


@settings(max_examples=200, deadline=None)
@given(sorted_set)
def test_bsr_roundtrip(v):
    bases, states = K.bsr_pack(v)
    assert np.array_equal(K.bsr_unpack(bases, states), v)
    # one (base,state) pair per occupied 32-id block (util.hpp:19-44)
    assert len(bases) == len(np.unique(v >> 5))
    assert int(K.popcount(states).sum()) == len(v)


@settings(max_examples=200, deadline=None)
@given(set_pair)
def test_bsr_set_ops_match_uint(pair):
    a, b = pair
    pa, pb = K.bsr_pack(a), K.bsr_pack(b)
    inter = K.bsr_unpack(*K.bsr_intersect(*pa, *pb))
    diff = K.bsr_unpack(*K.bsr_difference(*pa, *pb))
    assert np.array_equal(inter, K.intersect_sorted(a, b))
    assert np.array_equal(diff, K.difference_sorted(a, b))
    assert K.bsr_intersect_count(*pa, *pb) == K.intersect_count_sorted(a, b)


@settings(max_examples=200, deadline=None)
@given(sorted_set, st.integers(min_value=0, max_value=5000))
def test_bsr_merge_one_is_union_with_singleton(v, x):
    bases, states = K.bsr_merge_one(*K.bsr_pack(v), x)
    want = np.union1d(v, np.int32(x)).astype(np.int32)
    assert np.array_equal(K.bsr_unpack(bases, states), want)


@settings(max_examples=200, deadline=None)
@given(set_pair)
def test_bitmap_subtracts_match_set_ops(pair):
    a, marked = pair
    visited = K.visited_bitmap(5001)
    K.bitmap_mark(visited, marked)
    pa = K.bsr_pack(a)
    got_minus = K.bsr_unpack(*K.bsr_subtract_visited(*pa, visited))
    got_and = K.bsr_unpack(*K.bsr_subtract_unvisited(*pa, visited))
    assert np.array_equal(got_minus, _oracle(a, marked, set.difference))
    assert np.array_equal(got_and, _oracle(a, marked, set.intersection))
