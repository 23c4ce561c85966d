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

from graphsetintersection_ray.functions.kernels import pairwise_intersect
from graphsetintersection_ray.functions.segments import segment_starts
from graphsetintersection_ray.stages.graph_build import build_csr


def _bucket_triangle_partials(batch: pd.DataFrame) -> pa.Table:
    """One bucket of (src, dst, nbrs_dst) rows → partial per-vertex triangle
    counts. Fully vectorized: one pairwise-intersect kernel call."""
    src = batch["src"].to_numpy()
    dst = batch["dst"].to_numpy()
    nbrs_bin = batch["nbrs_bin"].to_numpy()  # object array of int32-byte blobs
    nbrs_bin = np.array(
        [b"" if x is None else x for x in nbrs_bin], dtype=object
    )
    order = np.lexsort((dst, src))
    src, dst, nbrs_bin = src[order], dst[order], nbrs_bin[order]

    # Side A: N+(src) = this src segment's dst values, repeated per row.
    starts = segment_starts(src)
    bounds = np.append(starts, len(src))
    seg_of_row = np.searchsorted(bounds, np.arange(len(src)), side="right") - 1
    offsets_a = np.empty(len(src) + 1, np.int64)
    offsets_a[:-1] = bounds[seg_of_row]
    offsets_a[-1] = len(src)
    # trick: every row's A-list is its whole segment [seg_start, seg_end);
    # pairwise kernels need per-row (start,end) — build explicit offsets by
    # flattening segment-per-row (values reused via fancy indexing).
    row_starts = bounds[seg_of_row]
    row_ends = bounds[seg_of_row + 1]
    lens_a = row_ends - row_starts
    flat_a_idx = np.repeat(row_starts, lens_a) + (
        np.arange(lens_a.sum()) - np.repeat(np.cumsum(lens_a) - lens_a, lens_a)
    )
    values_a = dst[flat_a_idx]
    offsets_a = np.concatenate([[0], np.cumsum(lens_a)])

    # Side B: the joined (packed) neighbor lists of dst.
    lens_b = np.fromiter((len(x) for x in nbrs_bin), np.int64, count=len(nbrs_bin)) // 4
    offsets_b = np.concatenate([[0], np.cumsum(lens_b)])
    values_b = np.frombuffer(b"".join(nbrs_bin), dtype="<i4")

    rows, w = pairwise_intersect(offsets_a, values_a, offsets_b, values_b)
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


def per_vertex_triangles(
    oriented_edges: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """(v:int32, triangles:int64) for every vertex in >=1 triangle."""
    csr = build_csr(oriented_edges, num_partitions=num_partitions, packed=True)
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
    partials = bucketed.groupby("bucket").map_groups(
        _bucket_triangle_partials, batch_format="pandas"
    )
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
    """Exact global triangle count (each triangle touches 3 vertices)."""
    pv = per_vertex_triangles(oriented_edges, num_partitions=num_partitions)
    total = pv.sum("triangles")
    return int(total or 0) // 3
