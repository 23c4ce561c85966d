"""Exact triangle counting — the reference's flagship query, Ray-Data-first.

Reference semantics (org_triangle_count.cpp:56-86, bitpack variant
:70-103): orient every undirected edge, build the oriented CSR, and for
each oriented edge (u, v) add |N+(u) ∩ N+(v)| — each triangle is counted
exactly once. The reference orients by vertex ID (u < v on reordered IDs);
we orient by (degree, id) toward the higher-degree endpoint
(stages/graph_build.orient_by_degree) so every oriented adjacency list is
O(sqrt(m))-bounded — the explicit skew handling that replaces the
reference's offline reordering at cluster scale.

Distributed plan (two shuffles total):
  1. A+ = CSR of the oriented DAG, hash-partitioned by src
     (= the reference's build step B3+B4).
  2. oriented edges ⋈ A+ on dst  → (src, dst, nbrs_dst)   [hash join]
  3. bucket by src, ONE vectorized pass per bucket: after sorting a bucket
     by (src, dst), the dst values of each src segment ARE N+(src) — so the
     segment supplies side A and the joined list column supplies side B of
     a single batched pairwise-intersect kernel call
     (functions/kernels.pairwise_intersect — the K1/A2 family applied to a
     whole bucket at once).
  4. every match (u,v,w) increments the per-vertex counters of u, v, w;
     partial counts are pre-aggregated per bucket (np.bincount) before the
     final small groupby — global count = sum(per-vertex)/3.

The per-thread-partial + final-sum structure mirrors the reference's MT
path (bitpack_triangle_count.cpp:143-206), with Ray blocks as the unit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphsetintersection_ray.functions.segments import segment_starts
from graphsetintersection_ray.stages.graph_build import build_csr


def _bucket_hits(batch: pd.DataFrame):
    """Triangle corners discovered in one joined bucket.

    Zero-replication kernel: after sorting by (src, dst), the rows of a src
    segment ARE N+(src), so side A is the edge list itself keyed by
    (segment, dst) — one composite int64 key per edge, no per-row copy of
    the segment (a Σ outdeg² blowup otherwise). Side B (the joined
    neighbor list of each row's dst) is searched against A with one
    galloping np.searchsorted — the batched analog of the reference's
    skew-side galloping kernel (intersection_algos.cpp:88-114).

    Returns (a, b, c) original-id arrays — one triangle per element, with
    (a, b) and (a, c) and (b, c) all oriented edges — or None when the
    bucket closes no triangle."""
    src = batch["src"].to_numpy()
    dst = batch["dst"].to_numpy()
    nbrs_bin = batch["nbrs_bin"].to_numpy()  # object array of int32-byte blobs
    nbrs_bin = np.array(
        [b"" if x is None else x for x in nbrs_bin], dtype=object
    )
    order = np.lexsort((dst, src))
    src, dst, nbrs_bin = src[order], dst[order], nbrs_bin[order]
    n = len(src)

    # segment id per row (one segment per distinct src)
    starts = segment_starts(src)
    bounds = np.append(starts, n)
    lens = np.diff(bounds)
    seg_of_row = np.repeat(np.arange(len(starts), dtype=np.int64), lens)

    # Side A: one key per edge — (segment << 32) | dst; sorted by build.
    keys_a = (seg_of_row << np.int64(32)) | dst.astype(np.int64)

    # Side B: flattened neighbor lists with their row ids.
    lens_b = (
        np.fromiter((len(x) for x in nbrs_bin), np.int64, count=len(nbrs_bin)) // 4
    )
    values_b = np.frombuffer(b"".join(nbrs_bin), dtype="<i4")
    rows_b = np.repeat(np.arange(n, dtype=np.int64), lens_b)
    keys_b = (seg_of_row[rows_b] << np.int64(32)) | values_b.astype(np.int64)

    if len(keys_b) == 0 or n == 0:
        return None
    idx = np.searchsorted(keys_a, keys_b)
    idx[idx == n] = 0
    hit = keys_a[idx] == keys_b
    rows = rows_b[hit]
    if len(rows) == 0:
        return None
    w = values_b[hit]
    # each match closes the triangle (src[row], dst[row], w)
    return src[rows], dst[rows], w


def _bucket_triangle_partials(batch: pd.DataFrame) -> pa.Table:
    """One bucket of (src, dst, nbrs_dst) rows → partial per-vertex triangle
    counts (see _bucket_hits for the kernel)."""
    hits = _bucket_hits(batch)
    if hits is None:
        return pa.table(
            {"v": pa.array([], pa.int32()), "partial": pa.array([], pa.int64())}
        )
    a, b, c = hits
    touched = np.concatenate([a, b, c]).astype(np.int64)
    v, cnt = np.unique(touched, return_counts=True)
    return pa.table(
        {"v": pa.array(v.astype(np.int32)), "partial": pa.array(cnt.astype(np.int64))}
    )


# Below this edge count the whole oriented CSR (two int arrays) is built on
# the driver and broadcast once via ray.put — every batch then intersects
# against object-store-shared arrays with zero join/shuffle. Above it, the
# hash-join path runs (the 100 TB path: adjacency never leaves the cluster).
# Env-overridable so tests/CORRECTNESS can force the join path at sf scale.
BROADCAST_MAX_EDGES = int(
    os.environ.get("GRAFT_BROADCAST_MAX_EDGES", 20_000_000)
)

# Join-path bucket granularity: buckets scale with edge count, NOT with the
# CSR partition count — at 100 TB a `src % P` bucket would put 1/P of all
# wedge-carrying edges+neighbor blobs in one pandas map_groups call.
JOIN_EDGES_PER_BUCKET = int(
    os.environ.get("GRAFT_JOIN_EDGES_PER_BUCKET", 1_000_000)
)


def _block_src_dst(tbl) -> tuple[np.ndarray, np.ndarray]:
    """src/dst arrays from a block ref that may be a pandas DataFrame or an
    Arrow table — including the column-less empty pandas blocks Ray's
    groupby shuffles emit for empty partitions."""
    import pandas as _pd

    if len(tbl) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if isinstance(tbl, _pd.DataFrame):
        return tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    return (
        tbl["src"].to_numpy(zero_copy_only=False),
        tbl["dst"].to_numpy(zero_copy_only=False),
    )


@ray.remote
def _block_degree_partial(tbl, n_vertices: int) -> np.ndarray:
    src, dst = _block_src_dst(tbl)
    return np.bincount(src, minlength=n_vertices) + np.bincount(
        dst, minlength=n_vertices
    )


@ray.remote
def _block_relabel_keys(tbl, rank_of: np.ndarray) -> np.ndarray:
    src, dst = _block_src_dst(tbl)
    return np.sort(
        (rank_of[src.astype(np.int64)] << np.int64(32))
        | rank_of[dst.astype(np.int64)]
    )


def _broadcast_wedge_state(oriented_edges: ray.data.Dataset, n_vertices: int):
    """Degree-rank relabeled DAG state for the wedge-join kernel.

    Relabels vertices by their (degree, id) rank — the reference's degree
    reordering (R6, porder.cpp:445-495) applied *inside* the kernel — so
    DAG edges satisfy src < dst numerically and every adjacency list is
    rank-sorted. Triangle test then reduces to membership of wedge keys in
    ONE sorted int64 edge-key array. Per-block work (degree partials,
    relabel, block-local sort) runs in remote tasks; the driver only sums
    degree vectors and merges pre-sorted key runs. Returns a ray.put ref
    of (edge_keys, offsets, flat, orig_of_rank, rank_of, bitmap) — rank_of
    ships in the broadcast state so the kernel never rebuilds the O(V)
    inverse permutation per batch.
    """
    import ray as _ray

    refs = oriented_edges.materialize().to_arrow_refs()
    deg_parts = _ray.get(
        [_block_degree_partial.remote(r, n_vertices) for r in refs]
    )
    deg = np.sum(deg_parts, axis=0) if deg_parts else np.zeros(n_vertices, np.int64)
    order = np.lexsort((np.arange(n_vertices), deg))  # rank by (deg, id)
    rank_of = np.empty(n_vertices, np.int64)
    rank_of[order] = np.arange(n_vertices)
    # orientation used the same (deg, id) order → src < dst after relabel
    rank_ref = _ray.put(rank_of)
    key_runs = _ray.get([_block_relabel_keys.remote(r, rank_ref) for r in refs])
    if key_runs:
        edge_keys = np.concatenate(key_runs)
        edge_keys.sort()  # in-place merge of pre-sorted runs
    else:
        edge_keys = np.empty(0, np.int64)
    src = edge_keys >> np.int64(32)
    dst = edge_keys & np.int64(0xFFFFFFFF)
    counts = np.bincount(src, minlength=n_vertices)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    # QFilter analog (set_operation.cpp:379-551): a compact hash bitmap
    # pre-filters wedge probes with ~1 cache line each before the exact
    # binary search touches the big sorted key array. Bool-scatter +
    # packbits is ~50x faster than np.bitwise_or.at. Sized to ~8 bits per
    # edge (capped at 16 MiB) so small graphs don't pay a 128 MB scatter.
    bitmap_bits = _bitmap_bits_for(len(edge_keys))
    bits = np.zeros(1 << bitmap_bits, bool)
    bits[_bitmap_hash(edge_keys, bitmap_bits)] = True
    bitmap = np.packbits(bits, bitorder="little")
    return _ray.put(
        (edge_keys, offsets, dst, order, rank_of, bitmap, bitmap_bits)
    )


MAX_BITMAP_BITS = 27  # cap: 2^27 bits = 16 MiB filter


def _bitmap_bits_for(n_keys: int) -> int:
    # ~8 bits per key keeps the false-positive rate under ~12%
    return min(MAX_BITMAP_BITS, max(16, int(np.ceil(np.log2(max(n_keys, 1) * 8)))))


def _bitmap_hash(keys: np.ndarray, bitmap_bits: int) -> np.ndarray:
    return (
        keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ) >> np.uint64(64 - bitmap_bits)


def _edge_member(edge_keys, bitmap, bitmap_bits, keys: np.ndarray) -> np.ndarray:
    """Exact membership of (src<<32|dst) int64 keys in the global sorted
    edge-key array — the same two-stage probe as the wedge kernel (bitmap
    pre-filter, then binary search over sorted probes so successive
    lookups stay cache-coherent)."""
    out = np.zeros(len(keys), bool)
    hp = _bitmap_hash(keys, bitmap_bits)
    maybe = (
        bitmap[hp >> np.uint64(3)]
        & (np.uint8(1) << (hp & np.uint64(7)).astype(np.uint8))
    ) != 0
    cand = np.flatnonzero(maybe)
    if len(cand) == 0:
        return out
    ckeys = keys[cand]
    probe_order = np.argsort(ckeys, kind="stable")
    sorted_probes = ckeys[probe_order]
    idx = np.searchsorted(edge_keys, sorted_probes)
    idx[idx == len(edge_keys)] = 0
    out[cand[probe_order]] = edge_keys[idx] == sorted_probes
    return out


def _wedge_hits(state, t: pa.Table):
    """Triangle corners (as degree ranks) closed by one batch of oriented
    edges, against the broadcast wedge state. Returns (u, v, w) rank arrays
    with u < v < w — one triangle per element — or None."""
    (
        edge_keys, offsets, flat, orig_of_rank, rank_of, bitmap,
        bitmap_bits,
    ) = state
    if t.num_rows == 0 or len(edge_keys) == 0:
        return None
    # this batch's edges, relabeled to ranks (rank_of comes from the
    # broadcast state — built once, shared zero-copy via the object store)
    u = rank_of[t["src"].to_numpy(zero_copy_only=False).astype(np.int64)]
    v = rank_of[t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]
    # position of (u,v) in the global sorted edge array = start of its
    # wedge partners (every w after v in N+(u))
    pos = np.searchsorted(edge_keys, (u << np.int64(32)) | v)
    seg_end = offsets[u + 1]
    lens = seg_end - pos - 1
    lens = np.maximum(lens, 0)
    total = int(lens.sum())
    if total == 0:
        return None
    # wedge (v, w) for each w in N+(u) after v — each wedge once
    idx = np.repeat(pos + 1, lens) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens)
    )
    w = flat[idx]
    wedge_v = np.repeat(v, lens)
    wedge_u = np.repeat(u, lens)
    wkeys = (wedge_v << np.int64(32)) | w
    # stage 1 — bitmap pre-filter (1 byte gather per probe)
    hp = _bitmap_hash(wkeys, bitmap_bits)
    maybe = (bitmap[hp >> np.uint64(3)] & (np.uint8(1) << (hp & np.uint64(7)).astype(np.uint8))) != 0
    cand = np.flatnonzero(maybe)
    if len(cand) == 0:
        return None
    # stage 2 — exact membership; probes sorted so successive binary
    # searches touch neighboring regions of edge_keys (cache-coherent)
    ckeys = wkeys[cand]
    probe_order = np.argsort(ckeys, kind="stable")
    sorted_probes = ckeys[probe_order]
    widx = np.searchsorted(edge_keys, sorted_probes)
    widx[widx == len(edge_keys)] = 0
    hit_sorted = edge_keys[widx] == sorted_probes
    hit = np.zeros(len(wkeys), bool)
    hit[cand[probe_order]] = hit_sorted
    if not hit.any():
        return None
    return wedge_u[hit], wedge_v[hit], w[hit]


def _make_wedge_counter(state_ref):
    import ray as _ray

    def count_batch(t: pa.Table) -> pa.Table:
        state = _ray.get(state_ref)
        orig_of_rank = state[3]
        empty = pa.table(
            {"v": pa.array([], pa.int32()), "partial": pa.array([], pa.int64())}
        )
        hits = _wedge_hits(state, t)
        if hits is None:
            return empty
        touched = orig_of_rank[np.concatenate(hits)]
        # dense ids → bincount beats sort-based np.unique by ~10x here
        cnt_vec = np.bincount(touched, minlength=len(orig_of_rank))
        nz = np.flatnonzero(cnt_vec)
        return pa.table(
            {
                "v": pa.array(nz.astype(np.int32)),
                "partial": pa.array(cnt_vec[nz].astype(np.int64)),
            }
        )

    return count_batch


# wedge state is derived graph data (like the CSR on disk): built once
# per oriented-edge dataset and reused across TC calls. WeakKey so the
# state dies with the dataset object.
import weakref

_WEDGE_STATE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def infer_n_vertices(oriented_edges: ray.data.Dataset) -> int:
    n = int(oriented_edges.max("src") or 0)
    return max(n, int(oriented_edges.max("dst") or 0)) + 1


def wedge_state_for(
    oriented_edges: ray.data.Dataset,
    num_partitions: int,
    n_vertices: int | None = None,
):
    """(materialized edges, broadcast wedge-state ref) — built once per
    oriented-edge dataset and cached, shared by triangle counting and the
    link-prediction kernels."""
    if n_vertices is None:
        n_vertices = infer_n_vertices(oriented_edges)
    try:
        cached = _WEDGE_STATE_CACHE.get(oriented_edges)
    except TypeError:  # non-weakref-able input
        cached = None
    if cached is not None and cached[2] == n_vertices:
        mat, state_ref, _ = cached
    else:
        mat = oriented_edges.materialize()
        state_ref = _broadcast_wedge_state(mat, n_vertices)
        # map_batches parallelism = #blocks, and a materialized small
        # edge table can land in ONE block — but an unconditional
        # repartition is a full AllToAll shuffle that costs more than
        # the kernel itself (measured 1-4.5 s on a 2M-edge table), so
        # only split when the block count is genuinely too low to fan
        # out. Small batches bound each task's wedge temporaries
        # (~50 MB/task): with 32 concurrent tasks, large temporaries
        # thrash allocation bandwidth and the kernel stops scaling.
        if mat.num_blocks() < num_partitions:
            mat = mat.repartition(max(32, num_partitions * 4)).materialize()
        try:
            _WEDGE_STATE_CACHE[oriented_edges] = (
                mat, state_ref, n_vertices,
            )
        except TypeError:
            pass
    return mat, state_ref


def _triangle_partials(
    oriented_edges: ray.data.Dataset,
    num_partitions: int,
    n_vertices: int | None = None,
    n_edges: int | None = None,
) -> ray.data.Dataset:
    """(v, partial) partial triangle-membership counts."""
    if n_edges is None:
        n_edges = oriented_edges.count()
    if n_edges <= BROADCAST_MAX_EDGES:
        mat, state_ref = wedge_state_for(
            oriented_edges, num_partitions, n_vertices
        )
        return mat.map_batches(
            _make_wedge_counter(state_ref),
            batch_format="pyarrow",
            batch_size=8_192,
        )
    return _triangle_partials_join(oriented_edges, num_partitions, n_edges)


def _joined_buckets(
    oriented_edges: ray.data.Dataset,
    num_partitions: int,
    n_edges: int,
):
    """Shared join plan of the at-scale engines: edges ⋈ packed CSR on
    dst, bucketed by src with data-sized granularity."""
    from graphsetintersection_ray.stages.graph_build import compact_blocks

    # bucket count tracks data size, not the CSR partition count — each
    # bucket holds ~JOIN_EDGES_PER_BUCKET wedge-carrying edges + blobs
    n_buckets = max(num_partitions, int(n_edges // JOIN_EDGES_PER_BUCKET) + 1)
    csr = compact_blocks(
        build_csr(oriented_edges, num_partitions=num_partitions, packed=True)
    )
    # LEFT join: an edge whose dst has no out-neighbors must still appear —
    # its dst is a valid member of other sides' N+(src) segments.
    joined = oriented_edges.join(
        csr,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("u",),
    )
    bucketed = joined.map_batches(
        lambda t: t.append_column(
            "bucket",
            pa.array(
                t["src"].to_numpy(zero_copy_only=False) % n_buckets,
                pa.int32(),
            ),
        ),
        batch_format="pyarrow",
    )

    def run_grouped(fn):
        # boundary sort pins shuffle fan-in to exactly n_buckets blocks
        # (one per bucket) at every parallelism level; both bucket fns
        # tolerate empty typed batches
        from graphsetintersection_ray.stages.shuffle import bucket_groups

        return bucket_groups(bucketed, fn, n_buckets, bucket_col="bucket")

    return run_grouped


def _triangle_partials_join(
    oriented_edges: ray.data.Dataset,
    num_partitions: int,
    n_edges: int,
) -> ray.data.Dataset:
    """Join-based partials — the at-scale path (no broadcast)."""
    return _joined_buckets(oriented_edges, num_partitions, n_edges)(
        _bucket_triangle_partials
    )


def _bucket_triangle_count_bsr(batch: pd.DataFrame) -> pa.Table:
    """One bucket → scalar partial count via the batched BSR engine."""
    from graphsetintersection_ray.functions.kernels import (
        grouped_bsr_intersect_count,
    )

    src = batch["src"].to_numpy()
    dst = batch["dst"].to_numpy()
    nbrs_bin = batch["nbrs_bin"].to_numpy()
    nbrs_bin = np.array(
        [b"" if x is None else x for x in nbrs_bin], dtype=object
    )
    order = np.lexsort((dst, src))
    src, dst, nbrs_bin = src[order], dst[order], nbrs_bin[order]
    n = len(src)
    if n == 0:
        return pa.table({"partial": pa.array([0], pa.int64())})
    starts = segment_starts(src)
    lens = np.diff(np.append(starts, n))
    seg_of_row = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
    lens_b = (
        np.fromiter((len(x) for x in nbrs_bin), np.int64, count=len(nbrs_bin))
        // 4
    )
    values_b = np.frombuffer(b"".join(nbrs_bin), dtype="<i4").astype(np.int64)
    rows_b = np.repeat(np.arange(n, dtype=np.int64), lens_b)
    cnt = grouped_bsr_intersect_count(
        seg_of_row, seg_of_row, dst.astype(np.int64), rows_b, values_b
    )
    return pa.table({"partial": pa.array([cnt], pa.int64())})


def global_triangle_count_bsr(
    oriented_edges: ray.data.Dataset,
    num_partitions: int = 32,
    n_edges: int | None = None,
) -> int:
    """Third-engine TC variant — the reference's Roaring/compressed-set
    engine (A11, roaring_triangle_count.cpp:33-48) as batched BSR blocks:
    every per-edge |N+(u) ∩ N+(v)| is an AND + popcount over compressed
    (base, state) blocks, segments packed once per bucket. Same join plan
    as the at-scale path; exists so the three engines can cross-check
    (the reference's tc.cpp:14-16 engine-agreement strategy)."""
    if n_edges is None:
        n_edges = oriented_edges.count()
    partials = _joined_buckets(oriented_edges, num_partitions, n_edges)(
        _bucket_triangle_count_bsr
    )
    return int(partials.sum("partial") or 0)


def per_vertex_triangles(
    oriented_edges: ray.data.Dataset,
    num_partitions: int = 32,
    n_vertices: int | None = None,
    n_edges: int | None = None,
) -> ray.data.Dataset:
    """(v:int32, triangles:int64) for every vertex in >=1 triangle."""
    partials = _triangle_partials(
        oriented_edges, num_partitions, n_vertices=n_vertices, n_edges=n_edges
    )
    from graphsetintersection_ray.stages.shuffle import sum_by

    return (
        sum_by(partials, ["v"], "partial", out_col="triangles")
        .map_batches(
            lambda t: pa.table(
                {
                    "v": t["v"].cast(pa.int32()),
                    "triangles": t["triangles"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def global_triangle_count(
    oriented_edges: ray.data.Dataset,
    num_partitions: int = 32,
    n_vertices: int | None = None,
    n_edges: int | None = None,
) -> int:
    """Exact global triangle count. Each triangle contributes 3 vertex
    increments to the partials, so the global count needs only a scalar
    sum — no per-vertex shuffle at all (the distributed analog of the
    reference's per-thread partial counters + final sum,
    bitpack_triangle_count.cpp:184-205)."""
    partials = _triangle_partials(
        oriented_edges, num_partitions, n_vertices=n_vertices, n_edges=n_edges
    )
    total = partials.sum("partial")
    return int(total or 0) // 3


# -- 4-clique counting --------------------------------------------------------
# The natural next rung of the reference's intersection ladder: where a
# triangle is one |N+(u) ∩ N+(v)| per oriented edge
# (org_triangle_count.cpp:56-86), a 4-clique extends each discovered
# triangle (u < v < w in degree-rank order) by every x ∈ N+(w) that is
# ALSO an out-neighbor of u and v — two more membership probes against
# the same sorted edge-key array. Each 4-clique {a<b<c<d} is counted
# exactly once, at (u,v,w,x) = (a,b,c,d).


def _make_four_clique_counter(state_ref):
    import ray as _ray

    def count_batch(t: pa.Table) -> pa.Table:
        state = _ray.get(state_ref)
        (
            edge_keys, offsets, flat, _orig, _rank, bitmap, bitmap_bits,
        ) = state
        empty = pa.table({"partial": pa.array([0], pa.int64())})
        hits = _wedge_hits(state, t)
        if hits is None:
            return empty
        u, v, w = hits
        # extension candidates: all x in N+(w) (every x > w by orientation)
        start = offsets[w]
        lens = offsets[w + 1] - start
        total = int(lens.sum())
        if total == 0:
            return empty
        idx = np.repeat(start, lens) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
        )
        x = flat[idx]
        ru = np.repeat(u, lens)
        ok = _edge_member(
            edge_keys, bitmap, bitmap_bits, (ru << np.int64(32)) | x
        )
        cnt = 0
        if ok.any():
            sel = np.flatnonzero(ok)
            rv = np.repeat(v, lens)[sel]
            ok2 = _edge_member(
                edge_keys, bitmap, bitmap_bits, (rv << np.int64(32)) | x[sel]
            )
            cnt = int(ok2.sum())
        return pa.table({"partial": pa.array([cnt], pa.int64())})

    return count_batch


def _bucket_triangle_corners(batch: pd.DataFrame) -> pa.Table:
    """One joined bucket → enumerated triangle corners (a, b, c), all
    three pairs oriented edges with a < b < c in (degree, id) order."""
    empty = pa.table(
        {
            "a": pa.array([], pa.int32()),
            "b": pa.array([], pa.int32()),
            "c": pa.array([], pa.int32()),
        }
    )
    hits = _bucket_hits(batch)
    if hits is None:
        return empty
    a, b, c = hits
    return pa.table(
        {
            "a": pa.array(a.astype(np.int32)),
            "b": pa.array(b.astype(np.int32)),
            "c": pa.array(c.astype(np.int32)),
        }
    )


def _bucket_four_clique_partials(batch: pd.DataFrame) -> pa.Table:
    """One bucket of triangle corners joined with the three packed
    adjacency blobs → scalar 4-clique partial: per row,
    |N+(a) ∩ N+(b) ∩ N+(c)| via two batched sorted-key intersections
    (row-composite int64 keys, same shape as _bucket_hits' side A/B)."""
    n = len(batch)
    if n == 0:
        return pa.table({"partial": pa.array([0], pa.int64())})

    def flat_keys(col):
        blobs = np.array(
            [b"" if x is None else x for x in batch[col].to_numpy()],
            dtype=object,
        )
        lens = (
            np.fromiter((len(x) for x in blobs), np.int64, count=n) // 4
        )
        vals = np.frombuffer(b"".join(blobs), dtype="<i4").astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        return (rows << np.int64(32)) | vals

    ka, kb, kc = flat_keys("na"), flat_keys("nb"), flat_keys("nc")
    if len(ka) == 0 or len(kb) == 0 or len(kc) == 0:
        return pa.table({"partial": pa.array([0], pa.int64())})
    # rows ascend and each adjacency list is sorted → all keys sorted
    idx = np.searchsorted(ka, kb)
    idx[idx == len(ka)] = 0
    kab = kb[ka[idx] == kb]
    if len(kab) == 0:
        return pa.table({"partial": pa.array([0], pa.int64())})
    idx = np.searchsorted(kc, kab)
    idx[idx == len(kc)] = 0
    cnt = int((kc[idx] == kab).sum())
    return pa.table({"partial": pa.array([cnt], pa.int64())})


def global_four_clique_count(
    oriented_edges: ray.data.Dataset,
    num_partitions: int = 32,
    n_vertices: int | None = None,
    n_edges: int | None = None,
) -> int:
    """Exact global 4-clique (K4) count.

    Broadcast path (≤ BROADCAST_MAX_EDGES): wedge kernel enumerates
    triangles per batch, then each is extended over N+(w) with two
    bitmap-prefiltered membership probes — no extra shuffle at all.

    At-scale path: triangles are enumerated by the same data-sized
    bucketed join plan as TC, then the corner table is hash-joined with
    the packed CSR three times (on a, b, c) and each bucket computes
    |N+(a) ∩ N+(b) ∩ N+(c)| with two batched sorted-key intersections —
    the K4 analog of the reference's oriented two-level nesting
    (org_triangle_count.cpp:56-86 extended one rung)."""
    if n_edges is None:
        n_edges = oriented_edges.count()
    if n_edges <= BROADCAST_MAX_EDGES:
        mat, state_ref = wedge_state_for(
            oriented_edges, num_partitions, n_vertices
        )
        partials = mat.map_batches(
            _make_four_clique_counter(state_ref),
            batch_format="pyarrow",
            batch_size=8_192,
        )
        return int(partials.sum("partial") or 0)

    from graphsetintersection_ray.stages.graph_build import compact_blocks
    from graphsetintersection_ray.stages.shuffle import bucket_groups

    corners = _joined_buckets(oriented_edges, num_partitions, n_edges)(
        _bucket_triangle_corners
    )
    csr = compact_blocks(
        build_csr(oriented_edges, num_partitions=num_partitions, packed=True)
    )
    cur = corners
    for corner, out_col in (("a", "na"), ("b", "nb"), ("c", "nc")):
        cur = cur.join(
            csr,
            join_type="inner",
            num_partitions=num_partitions,
            on=(corner,),
            right_on=("u",),
        ).map_batches(
            lambda t, _c=out_col: t.rename_columns(
                [_c if name == "nbrs_bin" else name for name in t.column_names]
            ).drop_columns([c for c in ("u",) if c in t.column_names]),
            batch_format="pyarrow",
        )
        # inner join is lossless here: a and b always have out-neighbors
        # (b, c ∈ N+(a), c ∈ N+(b)); a c with empty N+ contributes 0.
    n_buckets = max(num_partitions, int(n_edges // JOIN_EDGES_PER_BUCKET) + 1)
    bucketed = cur.map_batches(
        lambda t: t.append_column(
            "bucket",
            pa.array(
                t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
                % n_buckets,
                pa.int32(),
            ),
        ),
        batch_format="pyarrow",
    )
    partials = bucket_groups(
        bucketed, _bucket_four_clique_partials, n_buckets, bucket_col="bucket"
    )
    return int(partials.sum("partial") or 0)
