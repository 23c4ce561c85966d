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

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphsetintersection_ray.functions.segments import segment_starts
from graphsetintersection_ray.stages.graph_build import build_csr


def _bucket_triangle_partials(batch: pd.DataFrame) -> pa.Table:
    """One bucket of (src, dst, nbrs_dst) rows → partial per-vertex triangle
    counts.

    Zero-replication kernel: after sorting by (src, dst), the rows of a src
    segment ARE N+(src), so side A is the edge list itself keyed by
    (segment, dst) — one composite int64 key per edge, no per-row copy of
    the segment (a Σ outdeg² blowup otherwise). Side B (the joined
    neighbor list of each row's dst) is searched against A with one
    galloping np.searchsorted — the batched analog of the reference's
    skew-side galloping kernel (intersection_algos.cpp:88-114)."""
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
        return pa.table(
            {"v": pa.array([], pa.int32()), "partial": pa.array([], pa.int64())}
        )
    idx = np.searchsorted(keys_a, keys_b)
    idx[idx == n] = 0
    hit = keys_a[idx] == keys_b
    rows = rows_b[hit]
    w = values_b[hit]
    # each match closes the triangle (src[row], dst[row], w)
    touched = np.concatenate([src[rows], dst[rows], w]).astype(np.int64)
    if len(touched) == 0:
        return pa.table(
            {"v": pa.array([], pa.int32()), "partial": pa.array([], pa.int64())}
        )
    v, cnt = np.unique(touched, return_counts=True)
    return pa.table(
        {"v": pa.array(v.astype(np.int32)), "partial": pa.array(cnt.astype(np.int64))}
    )


def _triangle_partials(
    oriented_edges: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """(v, partial) per-bucket partial triangle-membership counts."""
    from graphsetintersection_ray.stages.graph_build import compact_blocks

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
                t["src"].to_numpy(zero_copy_only=False) % num_partitions,
                pa.int32(),
            ),
        ),
        batch_format="pyarrow",
    )
    return bucketed.groupby("bucket").map_groups(
        _bucket_triangle_partials, batch_format="pandas"
    )


def per_vertex_triangles(
    oriented_edges: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """(v:int32, triangles:int64) for every vertex in >=1 triangle."""
    partials = _triangle_partials(oriented_edges, num_partitions)
    from ray.data.aggregate import Sum

    return (
        partials.groupby("v")
        .aggregate(Sum("partial", alias_name="triangles"))
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
    oriented_edges: ray.data.Dataset, num_partitions: int = 32
) -> int:
    """Exact global triangle count. Each triangle contributes 3 vertex
    increments to the partials, so the global count needs only a scalar
    sum — no per-vertex shuffle at all (the distributed analog of the
    reference's per-thread partial counters + final sum,
    bitpack_triangle_count.cpp:184-205)."""
    partials = _triangle_partials(oriented_edges, num_partitions)
    total = partials.sum("partial")
    return int(total or 0) // 3
