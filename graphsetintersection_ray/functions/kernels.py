"""Sorted-set operation kernels — the heart of the engine.

Re-expresses the semantics of the reference's set-operation library
(`/root/reference/src/set_operation.cpp` K1-K14 and
`/root/reference/src/intersection_algos.cpp` A1-A10) as vectorized NumPy
kernels. The reference's SIMD micro-optimizations (SSE shuffles, QFilter
byte-check dictionaries, STTNI) are x86-specific *how*, not semantics; the
Ray-native *how* is NumPy vectorization over whole Arrow batches.

All single-pair kernels operate on sorted, deduplicated int arrays (the same
precondition every reference kernel documents). The batched kernels operate
on an entire batch of (set_a, set_b) pairs at once, encoded as Arrow-style
list columns (offsets + flat values) — one NumPy pass per *batch*, not per
pair, which is what makes `map_batches` hot loops fast.

Skew heuristic: the reference switches to galloping when
``32 * min(|a|,|b|) < max(|a|,|b|)`` (set_operation.cpp:912-913,
intersection_algos.cpp:88-114 `intersect_scalargalloping_uint`). We use the
same threshold to pick searchsorted-galloping vs sort-merge.
"""

from __future__ import annotations

import numpy as np

GALLOP_SKEW = 32  # reference: set_operation.cpp:912-913


def round_half_away(x, decimals: int = 6):
    """Round-half-away-from-zero, matching SQL ROUND() semantics —
    np.round is half-even (banker's) and disagrees with DuckDB on exact
    boundary ratios like 105/128 at 6 decimals."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale

# ---------------------------------------------------------------------------
# Single-pair kernels (K1/K13/K9 + A1/A2 semantics)
# ---------------------------------------------------------------------------


def intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted unique arrays (reference K1 `intersect`,
    set_operation.cpp:112-130; oracle A1 `intersect_scalarmerge_uint`)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0:
        return a[:0]
    if GALLOP_SKEW * len(a) < len(b):
        # galloping: binary-search each element of the small set in the big
        # one (A2 intersect_scalargalloping_uint, intersection_algos.cpp:88-114)
        idx = np.searchsorted(b, a)
        idx[idx == len(b)] = 0
        return a[b[idx] == a]
    return np.intersect1d(a, b, assume_unique=True)


def intersect_count_sorted(a: np.ndarray, b: np.ndarray) -> int:
    """Cardinality-only variant (reference K1 `intersect_count`,
    set_operation.cpp:132-144)."""
    return int(len(intersect_sorted(a, b)))


def union_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sorted union (reference K9 `merge`, set_operation.cpp:1189-1205 —
    unlike the reference we fully dedup at the boundary)."""
    return np.union1d(a, b)


def difference_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sorted set difference a \\ b (reference K13 `subtract`,
    set_operation.cpp:1342-1361)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if len(a) == 0 or len(b) == 0:
        return a.copy()
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = 0
    return a[b[idx] != a]


# ---------------------------------------------------------------------------
# BSR — Base & State Representation (bit-packed sorted sets)
# Reference: util.hpp:19-44 (PACK_WIDTH=32/PACK_SHIFT=5/PACK_MASK=31),
# pack loop bitpack_triangle_count.cpp:43-67, converters
# intersection_algos.cpp:1328-1357.
# ---------------------------------------------------------------------------

PACK_SHIFT = 5
PACK_MASK = 31

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def popcount(states: np.ndarray) -> np.ndarray:
    """Vectorized per-element popcount of a uint32/int array."""
    u = np.ascontiguousarray(states, dtype=np.uint32)
    return _POPCNT8[u.view(np.uint8)].reshape(len(u), 4).sum(axis=1)


def bsr_pack(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted unique int32 values → (bases, states) pair arrays
    (reference `offline_uint_trans_bsr`, intersection_algos.cpp:1328-1343)."""
    values = np.asarray(values, dtype=np.int64)
    if len(values) == 0:
        return np.empty(0, np.int32), np.empty(0, np.uint32)
    all_bases = values >> PACK_SHIFT
    bits = np.uint32(1) << (values & PACK_MASK).astype(np.uint32)
    bases, start = np.unique(all_bases, return_index=True)
    states = np.bitwise_or.reduceat(bits, start)
    return bases.astype(np.int32), states.astype(np.uint32)


def bsr_unpack(bases: np.ndarray, states: np.ndarray) -> np.ndarray:
    """(bases, states) → sorted unique int32 values (reference
    `offline_bsr_trans_uint`, intersection_algos.cpp:1345-1357)."""
    bases = np.asarray(bases, dtype=np.int64)
    states = np.ascontiguousarray(states, dtype=np.uint32)
    if len(bases) == 0:
        return np.empty(0, np.int32)
    # expand each (base, state) into its set bit positions
    bit_matrix = (states[:, None] >> np.arange(32, dtype=np.uint32)) & np.uint32(1)
    rows, bit_pos = np.nonzero(bit_matrix)
    return ((bases[rows] << PACK_SHIFT) | bit_pos).astype(np.int32)


def bsr_intersect(
    bases_a: np.ndarray,
    states_a: np.ndarray,
    bases_b: np.ndarray,
    states_b: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """BSR merge-intersection: match bases, AND states, drop zero states
    (reference K5 `bp_intersect`, set_operation.cpp:554-575)."""
    common, ia, ib = np.intersect1d(
        bases_a, bases_b, assume_unique=True, return_indices=True
    )
    states = np.asarray(states_a, np.uint32)[ia] & np.asarray(states_b, np.uint32)[ib]
    keep = states != 0
    return common[keep].astype(np.int32), states[keep]


def bsr_intersect_count(
    bases_a: np.ndarray,
    states_a: np.ndarray,
    bases_b: np.ndarray,
    states_b: np.ndarray,
) -> int:
    """Cardinality via popcount of ANDed states (reference K5
    `bp_intersect_count`, set_operation.cpp:577-591)."""
    _, states = bsr_intersect(bases_a, states_a, bases_b, states_b)
    return int(popcount(states).sum())


def bsr_difference(
    bases_a: np.ndarray,
    states_a: np.ndarray,
    bases_b: np.ndarray,
    states_b: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """BSR set difference a \\ b — AND-NOT states on matched bases
    (reference K14, set_operation.cpp:1363-1388)."""
    bases_a = np.asarray(bases_a, dtype=np.int64)
    states_a = np.ascontiguousarray(states_a, dtype=np.uint32).copy()
    bases_b = np.asarray(bases_b, dtype=np.int64)
    states_b = np.ascontiguousarray(states_b, dtype=np.uint32)
    _, ia, ib = np.intersect1d(bases_a, bases_b, assume_unique=True, return_indices=True)
    states_a[ia] &= ~states_b[ib]
    keep = states_a != 0
    return bases_a[keep].astype(np.int32), states_a[keep]


def bsr_merge_one(
    bases: np.ndarray, states: np.ndarray, value: int
) -> tuple[np.ndarray, np.ndarray]:
    """Insert one value into a sorted BSR set (reference K10 `bp_merge_one`,
    set_operation.cpp:1207-1232). The reference shifts in place with
    memmove; NumPy arrays are immutable-sized so this returns a fresh
    (bases, states) pair — same resulting set, O(n) either way."""
    bases = np.asarray(bases, dtype=np.int32)
    states = np.ascontiguousarray(states, dtype=np.uint32)
    v_base = np.int32(int(value) >> PACK_SHIFT)
    v_bit = np.uint32(1) << np.uint32(int(value) & PACK_MASK)
    i = int(np.searchsorted(bases, v_base))
    if i < len(bases) and bases[i] == v_base:
        out_states = states.copy()
        out_states[i] |= v_bit
        return bases.copy(), out_states
    return (
        np.insert(bases, i, v_base),
        np.insert(states, i, v_bit),
    )


def bsr_subtract_visited(
    bases_a: np.ndarray,
    states_a: np.ndarray,
    visited: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """A \\ visited where ``visited`` is a dense global bitmap indexed by
    base (reference K11 `bp_subtract_visited(_simd4x)`,
    set_operation.cpp:1306-1322, simd :1234-1268). The reference's global
    mutable bitmap maps to a per-partition dense uint32 array here —
    vectorized gather + AND-NOT instead of a scalar loop."""
    bases_a = np.asarray(bases_a, dtype=np.int64)
    states_a = np.ascontiguousarray(states_a, dtype=np.uint32)
    visited = np.ascontiguousarray(visited, dtype=np.uint32)
    if len(bases_a) == 0:
        return bases_a.astype(np.int32), states_a[:0]
    states = states_a & ~visited[bases_a]
    keep = states != 0
    return bases_a[keep].astype(np.int32), states[keep]


def bsr_subtract_unvisited(
    bases_a: np.ndarray,
    states_a: np.ndarray,
    visited: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """A ∩ visited against the same dense bitmap (reference K12
    `bp_subtract_unvisited(_simd4x)`, set_operation.cpp:1324-1340,
    simd :1270-1304) — the P/X split primitive of the BSR clique driver
    (bitpack_maximal_clique.cpp:68-125)."""
    bases_a = np.asarray(bases_a, dtype=np.int64)
    states_a = np.ascontiguousarray(states_a, dtype=np.uint32)
    visited = np.ascontiguousarray(visited, dtype=np.uint32)
    if len(bases_a) == 0:
        return bases_a.astype(np.int32), states_a[:0]
    states = states_a & visited[bases_a]
    keep = states != 0
    return bases_a[keep].astype(np.int32), states[keep]


def visited_bitmap(n_values: int) -> np.ndarray:
    """Dense all-zero visited bitmap covering values 0..n_values-1
    (the K11/K12 `visited` operand; reference allocates v_num/32+1
    PackStates, bitpack_maximal_clique.cpp:44-46)."""
    return np.zeros((int(n_values) >> PACK_SHIFT) + 1, dtype=np.uint32)


def bitmap_mark(visited: np.ndarray, values: np.ndarray) -> None:
    """Set the bits of ``values`` in a dense visited bitmap, in place."""
    values = np.asarray(values, dtype=np.int64)
    np.bitwise_or.at(
        visited,
        values >> PACK_SHIFT,
        (np.uint32(1) << (values & PACK_MASK).astype(np.uint32)),
    )


# ---------------------------------------------------------------------------
# Batched kernels over Arrow-style list columns (offsets + flat values).
# These are the map_batches hot path: ONE vectorized pass per batch of pairs.
# ---------------------------------------------------------------------------


def _row_ids(offsets: np.ndarray) -> np.ndarray:
    """Row id for every element of a flattened list column."""
    lengths = np.diff(offsets)
    return np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)


def _composite(rows: np.ndarray, values: np.ndarray) -> np.ndarray:
    """(row, value) → single sortable int64 key. Values must be < 2^31."""
    return (rows << np.int64(32)) | values.astype(np.int64)


def pairwise_intersect(
    offsets_a: np.ndarray,
    values_a: np.ndarray,
    offsets_b: np.ndarray,
    values_b: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """For each row i intersect sorted-unique lists A_i and B_i.

    Returns (match_rows, match_values): the row index and the value of every
    element in A_i ∩ B_i, ordered by (row, value). This is the whole-batch
    equivalent of looping the reference's K1 kernel over a batch of pairs —
    implemented as one galloping searchsorted of the smaller flattened side
    into the larger over composite (row, value) keys.
    """
    offsets_a = np.asarray(offsets_a, dtype=np.int64)
    offsets_b = np.asarray(offsets_b, dtype=np.int64)
    ka = _composite(_row_ids(offsets_a), np.asarray(values_a))
    kb = _composite(_row_ids(offsets_b), np.asarray(values_b))
    if len(ka) <= len(kb):
        small, big = ka, kb
    else:
        small, big = kb, ka
    if len(small) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    idx = np.searchsorted(big, small)
    idx[idx == len(big)] = 0
    hit = big[idx] == small
    matched = small[hit]
    rows = (matched >> np.int64(32)).astype(np.int64)
    vals = (matched & np.int64(0xFFFFFFFF)).astype(np.int32)
    return rows, vals


def _bsr_pack_composite(
    rows: np.ndarray, values: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Batched BSR pack over (row, value) pairs: one composite key
    ``row << 26 | base`` per populated (row, 32-value block), states OR'd.
    Values must be < 2^31 (base < 2^26); rows < 2^37."""
    values = np.asarray(values, np.int64)
    rows = np.asarray(rows, np.int64)
    base = values >> PACK_SHIFT
    bit = (np.uint32(1) << (values & PACK_MASK).astype(np.uint32))
    keys = (rows << np.int64(26)) | base
    order = np.argsort(keys, kind="stable")
    keys, bit = keys[order], bit[order]
    uk, start = np.unique(keys, return_index=True)
    states = np.bitwise_or.reduceat(bit, start) if len(uk) else bit[:0]
    return uk, states.astype(np.uint32)


def grouped_bsr_intersect_count(
    seg_of_row: np.ndarray,
    seg_values_rows: np.ndarray,
    seg_values: np.ndarray,
    rows_b: np.ndarray,
    values_b: np.ndarray,
) -> int:
    """Σ_r |A_{seg(r)} ∩ B_r| with both sides in batched BSR form — the
    whole-bucket analog of the reference's Roaring/BSR engine loop
    (roaring_triangle_count.cpp:38-48, bp_intersect_count K5): side A is
    one compressed set per *segment* (packed once, not replicated per
    row), side B one compressed set per row; each B block probes its
    segment's A block and the AND-state popcounts are summed."""
    ka, sa = _bsr_pack_composite(
        np.asarray(seg_values_rows, np.int64), seg_values
    )
    kb, sb = _bsr_pack_composite(np.asarray(rows_b, np.int64), values_b)
    if len(ka) == 0 or len(kb) == 0:
        return 0
    b_rows = (kb >> np.int64(26)).astype(np.int64)
    probe = (
        np.asarray(seg_of_row, np.int64)[b_rows] << np.int64(26)
    ) | (kb & np.int64((1 << 26) - 1))
    idx = np.searchsorted(ka, probe)
    idx[idx == len(ka)] = 0
    hit = ka[idx] == probe
    if not hit.any():
        return 0
    anded = sa[idx[hit]] & sb[hit]
    return int(popcount(anded).sum())


def pairwise_intersect_count(
    offsets_a: np.ndarray,
    values_a: np.ndarray,
    offsets_b: np.ndarray,
    values_b: np.ndarray,
) -> np.ndarray:
    """Per-row intersection cardinalities for a batch of sorted-set pairs
    (batched K1 `intersect_count`). Returns int64 array of len == n_rows."""
    n_rows = len(offsets_a) - 1
    rows, _ = pairwise_intersect(offsets_a, values_a, offsets_b, values_b)
    return np.bincount(rows, minlength=n_rows).astype(np.int64)


# ---------------------------------------------------------------------------
# Kernel registry — the reference exposes its kernel variants through an
# `algo_id` function-pointer table (exp/test_intersection_algos.cpp:16-99)
# and compile-time SIMD_STATE/SIMD_MODE switches (util.hpp:19-20). The Ray
# analog is a plain dict so pipelines/tests can select implementations.
# ---------------------------------------------------------------------------


def _merge_only_intersect(a, b):
    return np.intersect1d(np.asarray(a), np.asarray(b), assume_unique=True)


def _gallop_only_intersect(a, b):
    a, b = np.asarray(a), np.asarray(b)
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0:
        return a[:0]
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = 0
    return a[b[idx] == a]


def _bsr_adaptive(a, b):
    ba, sa = bsr_pack(a)
    bb, sb = bsr_pack(b)
    return bsr_unpack(*bsr_intersect(ba, sa, bb, sb))


INTERSECT_ALGOS = {
    # name → fn(sorted_unique_a, sorted_unique_b) -> sorted_unique result
    "scalarmerge_uint": _merge_only_intersect,   # A1 oracle
    "galloping_uint": _gallop_only_intersect,    # A2
    "adaptive_uint": intersect_sorted,           # K1 w/ skew switch (default)
    "bsr": _bsr_adaptive,                        # K5 via pack/intersect/unpack
}
