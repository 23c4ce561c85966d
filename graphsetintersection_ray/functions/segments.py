"""Vectorized segment utilities shared by bucketed group stages.

The pattern: instead of `groupby(key).map_groups(fn)` (one Python call per
group — death by overhead when groups are tiny and numerous), we hash rows
into a bounded number of buckets, run ONE vectorized call per bucket, and
compute per-group structure inside the bucket with NumPy segment ops.
This mirrors how the reference builds CSR by a single run-length pass over
globally sorted edges (`org_triangle_count.cpp:39-49`), applied per bucket.
"""

from __future__ import annotations

import numpy as np


def segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Indices where a new key run begins in a sorted key array."""
    if len(sorted_keys) == 0:
        return np.empty(0, np.int64)
    change = np.empty(len(sorted_keys), dtype=bool)
    change[0] = True
    np.not_equal(sorted_keys[1:], sorted_keys[:-1], out=change[1:])
    return np.flatnonzero(change).astype(np.int64)


def rank_within_groups(group_ids: np.ndarray) -> np.ndarray:
    """0-based rank of each element within its group.

    ``group_ids`` must be sorted (all members of a group contiguous).
    Vectorized: arange minus the repeated segment start offset.
    """
    n = len(group_ids)
    if n == 0:
        return np.empty(0, np.int64)
    starts = segment_starts(group_ids)
    lengths = np.diff(np.append(starts, n))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)


def segment_lengths(group_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique keys in order, run length per key) for sorted group_ids."""
    starts = segment_starts(group_ids)
    lengths = np.diff(np.append(starts, len(group_ids)))
    return group_ids[starts] if len(starts) else group_ids[:0], lengths
