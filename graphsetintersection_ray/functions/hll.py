"""HyperLogLog primitives shared by HyperBall (state/superstep.py) and
the approximate-distinct-count operator (stages/streaming.py).

All vectorized NumPy over uint64; deterministic (fixed splitmix64
constants), so every estimate is replayable."""

from __future__ import annotations

import numpy as np


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer) of an int array."""
    x = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hll_rank(w: np.ndarray, width: int) -> np.ndarray:
    """Position of the highest set bit from the top of a ``width``-bit
    value, i.e. leading zeros + 1 (HLL rank); w == 0 → width + 1.
    Vectorized 6-step binary-search bit length (no float rounding)."""
    bl = np.zeros(len(w), np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = (v >> np.uint64(s)) > 0
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl[w > 0] += 1  # bit_length
    return (width - bl + 1).astype(np.uint8)


def hll_registers(keys: np.ndarray, m: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rank) per key for an m-register HLL (m a power of two)."""
    b = int(np.log2(m))
    x = splitmix64(keys.astype(np.uint64) + np.uint64(seed))
    bucket = (x & np.uint64(m - 1)).astype(np.int64)
    rank = hll_rank(x >> np.uint64(b), 64 - b)
    return bucket, rank


def hll_estimate(regs: np.ndarray) -> np.ndarray:
    """Cardinality estimates for a (n, m) uint8 register matrix, with
    the standard small-range (linear-counting) correction."""
    regs = np.atleast_2d(regs)
    m = float(regs.shape[1])
    z = np.exp2(-regs.astype(np.float64)).sum(axis=1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / z
    zeros = (regs == 0).sum(axis=1).astype(np.float64)
    small = (est <= 2.5 * m) & (zeros > 0)
    est[small] = m * np.log(m / zeros[small])
    return est
