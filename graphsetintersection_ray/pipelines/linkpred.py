"""Per-edge set-intersection queries: triangle support and link-prediction
scores over the transcript-derived graph.

Per-edge triangle support IS |N(u) ∩ N(v)| — the same intersection the
reference's flagship kernel computes per oriented edge
(org_triangle_count.cpp:56-86) but aggregated per EDGE instead of summed
per vertex, which makes it the common-neighbor count of classic link
prediction and the building block of k-truss decomposition. Jaccard and
Adamic-Adar are the standard normalizations of that intersection
(Liben-Nowell & Kleinberg 2003, public).

Distributed plan — reuses the triangle kernels' exactly-once enumeration
(pipelines/triangle.py): every discovered triangle {a, b, c} contributes
one common neighbor to each of its three edges. Both the broadcast wedge
path and the at-scale joined-bucket path emit the same pre-aggregated
corner relation

    (ek:int64, other:int32, c:int64)

where ek packs the canonical edge (min<<32 | max, original ids), other is
the third triangle vertex, and c is the within-batch multiplicity (the
map-side combiner: batches pre-aggregate before any shuffle). Then

    support / cn  = Σ c per ek                        (one bucketed shuffle)
    adamic_adar   = Σ c / ln(deg(other)) per ek       (broadcast deg when it
                    fits, hash join on `other` otherwise — same gating as
                    stages/graph_build.orient_by_degree)
    jaccard       = cn / (deg(u) + deg(v) − cn)

Zero-support edges are preserved with a left join against the canonical
edge table, so every input edge appears in the output exactly once.
Floats are rounded half-away at 6 decimals (the repo's SQL-ROUND parity
convention, functions/kernels.round_half_away).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pandas as pd

import ray.data

from graphsetintersection_ray.functions.kernels import round_half_away
from graphsetintersection_ray.pipelines import triangle as tri
from graphsetintersection_ray.stages import graph_build as gb
from graphsetintersection_ray.stages.graph_build import compact_blocks
from graphsetintersection_ray.stages.shuffle import sum_by

_EMPTY_REL = pa.table(
    {
        "ek": pa.array([], pa.int64()),
        "other": pa.array([], pa.int32()),
        "c": pa.array([], pa.int64()),
    }
)


def _pack(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Canonical edge key: (min << 32) | max over original int ids."""
    u = u.astype(np.int64)
    v = v.astype(np.int64)
    return (np.minimum(u, v) << np.int64(32)) | np.maximum(u, v)


def _corner_table(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> pa.Table:
    """Triangle corners → pre-aggregated (ek, other, c) rows: 3 per
    triangle (edge ab sees c, edge ac sees b, edge bc sees a), combined
    by (ek, other) within the batch before the shuffle."""
    ek = np.concatenate([_pack(a, b), _pack(a, c), _pack(b, c)])
    other = np.concatenate([c, b, a]).astype(np.int64)
    order = np.lexsort((other, ek))
    ek, other = ek[order], other[order]
    newseg = np.empty(len(ek), dtype=bool)
    newseg[0] = True
    np.logical_or(ek[1:] != ek[:-1], other[1:] != other[:-1], out=newseg[1:])
    starts = np.flatnonzero(newseg)
    counts = np.diff(np.append(starts, len(ek)))
    return pa.table(
        {
            "ek": pa.array(ek[starts], pa.int64()),
            "other": pa.array(other[starts].astype(np.int32), pa.int32()),
            "c": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _make_wedge_corner_kernel(state_ref):
    import ray as _ray

    def corners(t: pa.Table) -> pa.Table:
        state = _ray.get(state_ref)
        orig_of_rank = state[3]
        hits = tri._wedge_hits(state, t)
        if hits is None:
            return _EMPTY_REL
        a, b, c = (orig_of_rank[h] for h in hits)
        return _corner_table(a, b, c)

    return corners


def _bucket_corner_rel(batch: pd.DataFrame) -> pa.Table:
    hits = tri._bucket_hits(batch)
    if hits is None:
        return _EMPTY_REL
    return _corner_table(*hits)


def edge_corner_rel(
    oriented_edges: ray.data.Dataset,
    num_partitions: int = 32,
    n_vertices: int | None = None,
    n_edges: int | None = None,
) -> ray.data.Dataset:
    """(ek, other, c): one pre-aggregated common-neighbor row per distinct
    (edge, third vertex). Broadcast wedge path under
    GRAFT_BROADCAST_MAX_EDGES (shares the cached wedge state with triangle
    counting), joined-bucket path at scale."""
    if n_edges is None:
        n_edges = oriented_edges.count()
    if n_edges <= tri.BROADCAST_MAX_EDGES:
        mat, state_ref = tri.wedge_state_for(
            oriented_edges, num_partitions, n_vertices
        )
        return mat.map_batches(
            _make_wedge_corner_kernel(state_ref),
            batch_format="pyarrow",
            batch_size=8_192,
        )
    return tri._joined_buckets(oriented_edges, num_partitions, n_edges)(
        _bucket_corner_rel
    )


def _packed_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical edge table (src < dst) → (u, v, ek)."""

    def pack(t: pa.Table) -> pa.Table:
        u = t["src"].to_numpy(zero_copy_only=False)
        v = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(u.astype(np.int32), pa.int32()),
                "v": pa.array(v.astype(np.int32), pa.int32()),
                "ek": pa.array(_pack(u, v), pa.int64()),
            }
        )

    return edges.map_batches(pack, batch_format="pyarrow", batch_size=None)


def _attach_by_ek(
    left: ray.data.Dataset,
    agg: ray.data.Dataset,
    val_cols: list[str],
    num_partitions: int,
    n_left: int | None = None,
) -> ray.data.Dataset:
    """LEFT-join an ek-keyed aggregate onto ``left`` (which carries an
    ``ek`` column), zero-filling misses.

    Under the broadcast gate the aggregate (≤ one row per edge) is pulled
    once, sorted, ``ray.put`` and probed with searchsorted per batch —
    the hash-join operator's actor fixed cost (~seconds) dominates these
    small aggregates otherwise (same gating rationale as
    orient_by_degree). Above the gate the hash join runs; join inputs are
    compacted (shuffle outputs carry column-less empty blocks that break
    Acero)."""
    import ray as _ray

    if n_left is not None and n_left <= tri.BROADCAST_MAX_EDGES:
        adf = agg.to_pandas()
        ek_b = adf["ek"].to_numpy().astype(np.int64)
        order = np.argsort(ek_b)
        ek_b = ek_b[order]
        vals_b = {c: adf[c].to_numpy()[order].astype(np.float64) for c in val_cols}
        ref = _ray.put((ek_b, vals_b))

        def attach(t: pa.Table) -> pa.Table:
            ekq = t["ek"].to_numpy(zero_copy_only=False).astype(np.int64)
            ekb, valsb = _ray.get(ref)
            cols = {n: t[n] for n in t.column_names}
            if len(ekb) == 0:
                for c in val_cols:
                    cols[c] = pa.array(np.zeros(len(ekq)), pa.float64())
                return pa.table(cols)
            idx = np.minimum(np.searchsorted(ekb, ekq), len(ekb) - 1)
            hit = ekb[idx] == ekq
            for c in val_cols:
                v = np.zeros(len(ekq), np.float64)
                v[hit] = valsb[c][idx[hit]]
                cols[c] = pa.array(v, pa.float64())
            return pa.table(cols)

        return left.map_batches(attach, batch_format="pyarrow", batch_size=None)
    return compact_blocks(left).join(
        compact_blocks(agg),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("ek",),
    )


def edge_support(art) -> ray.data.Dataset:
    """(u, v, support): triangles through every canonical edge — the
    k-truss support function. Zero-support edges included (LEFT join)."""
    rel = edge_corner_rel(
        art.oriented, art.num_partitions, art.n_vertices, art.n_edges
    )
    sup = sum_by(rel, ["ek"], "c", out_col="support")
    joined = _attach_by_ek(
        _packed_edges(art.edges), sup, ["support"],
        art.num_partitions, art.n_edges,
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["support"].to_numpy(zero_copy_only=False)
        s = np.where(np.isnan(s.astype(np.float64)), 0, s).astype(np.int64)
        return pa.table(
            {
                "u": t["u"].cast(pa.int32()),
                "v": t["v"].cast(pa.int32()),
                "support": pa.array(s, pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


def _aa_terms_broadcast(rel: ray.data.Dataset, deg_ref) -> ray.data.Dataset:
    """(ek, c, aap): Adamic-Adar partial per corner row via the broadcast
    dense degree vector. deg(other) >= 2 always — a common neighbor has
    both endpoints as neighbors — so ln() never hits zero."""
    import ray as _ray

    def terms(t: pa.Table) -> pa.Table:
        deg = _ray.get(deg_ref)
        other = t["other"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False)
        aap = c.astype(np.float64) / np.log(deg[other].astype(np.float64))
        return pa.table(
            {
                "ek": t["ek"],
                "c": t["c"],
                "aap": pa.array(aap, pa.float64()),
            }
        )

    return rel.map_batches(terms, batch_format="pyarrow", batch_size=None)


def _aa_terms_join(
    rel: ray.data.Dataset, degrees: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Same relation via a hash join on `other` — the at-scale path (no
    O(V) broadcast)."""
    joined = rel.join(
        degrees,
        join_type="inner",
        num_partitions=num_partitions,
        on=("other",),
        right_on=("v",),
    )

    def terms(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "ek": t["ek"],
                "c": t["c"],
                "aap": pa.array(c.astype(np.float64) / np.log(d), pa.float64()),
            }
        )

    return joined.map_batches(terms, batch_format="pyarrow", batch_size=None)


def link_scores(art) -> ray.data.Dataset:
    """(u, v, cn, jaccard, adamic_adar) for every canonical edge.

    cn = |N(u) ∩ N(v)|; jaccard = cn / (deg(u)+deg(v)−cn);
    adamic_adar = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w)). Floats rounded
    half-away at 6 decimals (SQL ROUND parity)."""
    import ray as _ray

    rel = edge_corner_rel(
        art.oriented, art.num_partitions, art.n_vertices, art.n_edges
    )
    broadcast = art.n_vertices <= gb.BROADCAST_MAX_VERTICES
    if broadcast:
        ddf = art.degrees.to_pandas()
        deg_vec = np.zeros(art.n_vertices, np.int64)
        deg_vec[ddf["v"].to_numpy()] = ddf["degree"].to_numpy()
        deg_ref = _ray.put(deg_vec)
        terms = _aa_terms_broadcast(rel, deg_ref)
    else:
        terms = _aa_terms_join(rel, art.degrees, art.num_partitions)
    agg = sum_by(terms, ["ek"], ["c", "aap"], out_col=["cn", "aa"])
    joined = _attach_by_ek(
        _packed_edges(art.edges), agg, ["cn", "aa"],
        art.num_partitions, art.n_edges,
    )

    if broadcast:

        def finish(t: pa.Table) -> pa.Table:
            deg = _ray.get(deg_ref)
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            cn = t["cn"].to_numpy(zero_copy_only=False).astype(np.float64)
            cn = np.where(np.isnan(cn), 0.0, cn)
            aa = t["aa"].to_numpy(zero_copy_only=False).astype(np.float64)
            aa = np.where(np.isnan(aa), 0.0, aa)
            union = deg[u] + deg[v] - cn
            return pa.table(
                {
                    "u": pa.array(u.astype(np.int32), pa.int32()),
                    "v": pa.array(v.astype(np.int32), pa.int32()),
                    "cn": pa.array(cn.astype(np.int64), pa.int64()),
                    "jaccard": pa.array(
                        round_half_away(cn / union, 6), pa.float64()
                    ),
                    "adamic_adar": pa.array(
                        round_half_away(aa, 6), pa.float64()
                    ),
                }
            )

        return joined.map_batches(
            finish, batch_format="pyarrow", batch_size=None
        )

    # at-scale: endpoint degrees via two projected hash joins (the
    # orient_by_degree pattern, stages/graph_build.py); join inputs
    # compacted — shuffle outputs carry column-less empty blocks that
    # break Acero (see stages/graph_build.compact_blocks)
    j1 = compact_blocks(joined).join(
        art.degrees,
        join_type="inner",
        num_partitions=art.num_partitions,
        on=("u",),
        right_on=("v",),
    ).map_batches(
        lambda t: t.select(["u", "v", "cn", "aa", "degree"]).rename_columns(
            ["u", "v", "cn", "aa", "deg_u"]
        ),
        batch_format="pyarrow", batch_size=None,
    )
    j2 = compact_blocks(j1).join(
        art.degrees,
        join_type="inner",
        num_partitions=art.num_partitions,
        on=("v",),
        right_on=("v",),
    )

    def finish_join(t: pa.Table) -> pa.Table:
        cn = t["cn"].to_numpy(zero_copy_only=False).astype(np.float64)
        cn = np.where(np.isnan(cn), 0.0, cn)
        aa = t["aa"].to_numpy(zero_copy_only=False).astype(np.float64)
        aa = np.where(np.isnan(aa), 0.0, aa)
        du = t["deg_u"].to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t["degree"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = du + dv - cn
        return pa.table(
            {
                "u": t["u"].cast(pa.int32()),
                "v": t["v"].cast(pa.int32()),
                "cn": pa.array(cn.astype(np.int64), pa.int64()),
                "jaccard": pa.array(round_half_away(cn / union, 6), pa.float64()),
                "adamic_adar": pa.array(round_half_away(aa, 6), pa.float64()),
            }
        )

    return j2.map_batches(finish_join, batch_format="pyarrow", batch_size=None)


def _pair_index(tp: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Row-relative (i, j) index pairs (i < j) for every row's
    l·(l−1)/2 neighbor combinations, fully vectorized. ``tp`` is pairs
    per row; returns (row_of_pair, i, j)."""
    total = int(tp.sum())
    row_of_pair = np.repeat(np.arange(len(tp), dtype=np.int64), tp)
    p = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(tp) - tp, tp
    )
    # enumerate pairs as (i, j) with j = smallest j s.t. j(j-1)/2 > p
    j = np.floor((1.0 + np.sqrt(1.0 + 8.0 * p)) / 2.0).astype(np.int64)
    # float fix-up at triangle-number boundaries
    j = np.where(j * (j - 1) // 2 > p, j - 1, j)
    j = np.where((j + 1) * j // 2 <= p, j + 1, j)
    i = p - j * (j - 1) // 2
    return row_of_pair, i, j  # pairs (i, j) with 0 <= i < j


def _wedge_pair_partials(t: pa.Table, max_center_degree: int | None = None) -> pa.Table:
    """CSR rows (u, nbrs) → batch-local counts of unordered neighbor
    pairs: (pk = a<<32|b with a<b, c). Every wedge centered at u
    contributes one pair of its endpoints — the open+closed wedge count
    of classic common-neighbor link prediction.

    ``max_center_degree`` is the hub skew guard (the jaccard max_df
    analog): a center of degree d expands to d(d−1)/2 pairs inside ONE
    batch, so at open-domain scale hubs must be dropped (and logged) or
    the task OOMs. None = exact (the oracle config)."""
    empty = pa.table(
        {"pk": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
    )
    if t.num_rows == 0 or "nbrs" not in t.column_names:
        return empty
    nbrs = t["nbrs"].combine_chunks()
    offsets = nbrs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = nbrs.values.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    if max_center_degree is not None and (lens > max_center_degree).any():
        import logging

        n_hubs = int((lens > max_center_degree).sum())
        logging.getLogger(__name__).info(
            "link_candidates skew guard: dropping %d hub centers with "
            "degree > %d", n_hubs, max_center_degree,
        )
        keep = lens <= max_center_degree
        row_sel = np.flatnonzero(keep)
        flat = np.concatenate(
            [flat[offsets[r]:offsets[r + 1]] for r in row_sel]
        ) if len(row_sel) else flat[:0]
        lens = lens[keep]
        offsets = np.concatenate([[0], np.cumsum(lens)])
    tp = lens * (lens - 1) // 2
    if int(tp.sum()) == 0:
        return empty
    row_of_pair, i, j = _pair_index(tp)
    base = offsets[:-1][row_of_pair]
    a = flat[base + i]
    b = flat[base + j]
    # CSR lists are sorted → a < b already
    pk = (a << np.int64(32)) | b
    pk.sort()
    starts = np.flatnonzero(np.concatenate([[True], pk[1:] != pk[:-1]]))
    counts = np.diff(np.append(starts, len(pk)))
    return pa.table(
        {
            "pk": pa.array(pk[starts], pa.int64()),
            "c": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def link_candidates(
    art, topn: int = 50, max_center_degree: int | None = None
) -> ray.data.Dataset:
    """(u, v, cn): the ``topn`` NON-adjacent vertex pairs with the most
    common neighbors — the open-wedge side of link prediction (every
    wedge the triangle kernel would probe and miss). Deterministic order:
    cn desc, then (u, v) asc; ties at the cutoff are resolved by that
    total order, so the result is unique.

    Plan: one pass over the symmetric CSR emits batch-local pair counts
    (Σ deg²/2 wedges, combined per batch before the shuffle), one bucketed
    sum, an anti-join against the edge table, then a top-k sort of the
    (already small) aggregate. ``max_center_degree`` gates hub centers at
    open-domain scale (see _wedge_pair_partials); None = exact, the
    oracle config."""
    from graphsetintersection_ray.stages.graph_build import build_csr

    csr = build_csr(art.sym, num_partitions=art.num_partitions)
    pairs = csr.map_batches(
        lambda t: _wedge_pair_partials(t, max_center_degree),
        batch_format="pyarrow", batch_size=None,
    )
    cnt = sum_by(pairs, ["pk"], "c", out_col="cn")

    def _unpack(pk: np.ndarray, cn) -> pa.Table:
        return pa.table(
            {
                "u": pa.array((pk >> np.int64(32)).astype(np.int32), pa.int32()),
                "v": pa.array(
                    (pk & np.int64(0xFFFFFFFF)).astype(np.int32), pa.int32()
                ),
                "cn": pa.array(np.asarray(cn).astype(np.int64), pa.int64()),
            }
        )

    if art.n_edges <= tri.BROADCAST_MAX_EDGES:
        # anti-join via a broadcast sorted edge-key array — the small side
        # is the edge set, the big side (wedge-pair counts) stays
        # distributed; skips the hash-join operator's actor fixed cost
        import ray as _ray

        edf = art.edges.to_pandas()
        eks = np.sort(_pack(edf["src"].to_numpy(), edf["dst"].to_numpy()))
        ek_ref = _ray.put(eks)

        def non_edges_bc(t: pa.Table) -> pa.Table:
            pk = t["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
            ekb = _ray.get(ek_ref)
            if len(ekb):
                idx = np.minimum(np.searchsorted(ekb, pk), len(ekb) - 1)
                keep = ekb[idx] != pk
            else:
                keep = np.ones(len(pk), bool)
            return _unpack(
                pk[keep],
                t["cn"].to_numpy(zero_copy_only=False)[keep],
            )

        cand = cnt.map_batches(
            non_edges_bc, batch_format="pyarrow", batch_size=None
        )
    else:
        marks = _packed_edges(art.edges).map_batches(
            lambda t: pa.table(
                {
                    "ek": t["ek"],
                    "is_edge": pa.array(
                        np.ones(t.num_rows, np.int8), pa.int8()
                    ),
                }
            ),
            batch_format="pyarrow", batch_size=None,
        )
        joined = compact_blocks(cnt).join(
            marks,
            join_type="left_outer",
            num_partitions=art.num_partitions,
            on=("pk",),
            right_on=("ek",),
        )

        def non_edges(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = t.filter(pc.is_null(t["is_edge"]))
            pk = keep["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
            return _unpack(
                pk, keep["cn"].to_numpy(zero_copy_only=False)
            )

        cand = joined.map_batches(
            non_edges, batch_format="pyarrow", batch_size=None
        )
    return cand.sort(
        ["cn", "u", "v"], descending=[True, False, False]
    ).limit(topn)


def two_hop_counts(art) -> ray.data.Dataset:
    """(v, two_hop): number of DISTINCT vertices reachable in exactly two
    hops (self excluded; direct neighbors count when 2-hop reachable) —
    the K9 union kernel as a distributed query: the 2-hop set is the
    union of the neighbor lists of N(v).

    Plan: sym edges ⋈ packed CSR on dst (the triangle join plan's
    transport), batch-local (v, n2) dedup, global distinct_by, then a
    bucketed count — shuffle volume is bounded by distinct pairs per
    batch, not the Σ deg² expansion."""
    from graphsetintersection_ray.stages.graph_build import build_csr
    from graphsetintersection_ray.stages.shuffle import distinct_by

    _EMPTY_VN2 = pa.table(
        {"v": pa.array([], pa.int32()), "n2": pa.array([], pa.int32())}
    )

    def _dedup_vn2(v: np.ndarray, n2: np.ndarray) -> pa.Table:
        keep = n2 != v  # exclude the 2-hop walk back to the start
        v, n2 = v[keep], n2[keep]
        if len(v) == 0:
            return _EMPTY_VN2
        # batch-local dedup before the shuffle
        pk = np.unique((v << np.int64(32)) | n2)
        return pa.table(
            {
                "v": pa.array((pk >> np.int64(32)).astype(np.int32), pa.int32()),
                "n2": pa.array(
                    (pk & np.int64(0xFFFFFFFF)).astype(np.int32), pa.int32()
                ),
            }
        )

    if art.n_edges <= tri.BROADCAST_MAX_EDGES:
        # broadcast dense symmetric CSR (offsets, flat) — the join-free
        # path under the same gate as the triangle wedge state
        import ray as _ray

        sdf = art.sym.to_pandas()
        s = sdf["src"].to_numpy().astype(np.int64)
        d = sdf["dst"].to_numpy().astype(np.int64)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        counts = np.bincount(s, minlength=art.n_vertices)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        adj_ref = _ray.put((offsets, d))

        def expand_bc(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _EMPTY_VN2
            offs, flat = _ray.get(adj_ref)
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            lens = offs[dst + 1] - offs[dst]
            total = int(lens.sum())
            if total == 0:
                return _EMPTY_VN2
            idx = np.repeat(offs[dst], lens) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(lens) - lens, lens)
            )
            return _dedup_vn2(np.repeat(src, lens), flat[idx])

        expanded = art.sym.map_batches(
            expand_bc, batch_format="pyarrow", batch_size=None
        )
    else:
        csr = compact_blocks(
            build_csr(art.sym, num_partitions=art.num_partitions, packed=True)
        )
        joined = art.sym.join(
            csr,
            join_type="inner",
            num_partitions=art.num_partitions,
            on=("dst",),
            right_on=("u",),
        )

        def expand(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "nbrs_bin" not in t.column_names:
                return _EMPTY_VN2
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            blobs = t["nbrs_bin"].to_numpy(zero_copy_only=False)
            blobs = np.array(
                [b"" if x is None else x for x in blobs], dtype=object
            )
            lens = np.fromiter(
                (len(x) for x in blobs), np.int64, count=len(blobs)
            ) // 4
            n2 = np.frombuffer(b"".join(blobs), dtype="<i4").astype(np.int64)
            return _dedup_vn2(np.repeat(src, lens), n2)

        expanded = joined.map_batches(
            expand, batch_format="pyarrow", batch_size=None
        )

    pairs = distinct_by(expanded, ["v", "n2"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"v": pa.array([], pa.int32()), "c": pa.array([], pa.int64())}
            )
        v, cnt = np.unique(
            t["v"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "v": pa.array(v.astype(np.int32), pa.int32()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = sum_by(
        pairs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["v"],
        "c",
        out_col="two_hop",
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "v": t["v"].cast(pa.int32()),
                "two_hop": t["two_hop"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow", batch_size=None,
    )


def trussness(art, max_rounds: int = 100_000) -> ray.data.Dataset:
    """(u, v, truss) per canonical edge: truss(e) = the largest k such that
    e belongs to the k-truss (the maximal subgraph where every edge closes
    >= k-2 triangles). Iterative support peel (Cohen 2008, public).

    Each round recomputes the support of the SURVIVING subgraph with the
    same distributed corner-relation plan as edge_support — re-derive
    degrees (one bucketed shuffle), re-orient toward the higher-degree
    endpoint, enumerate triangles exactly once, sum per edge — then strips
    every edge with support <= k-2 (cascades keep k; when the residual
    minimum support rises, k jumps to min_support + 2, skipping empty
    levels). All edge state stays in Ray datasets (materialized per round
    to keep lineage flat); the driver sees only scalar counts. Removed
    slices accumulate as materialized datasets and union at the end, so
    nothing is ever collected driver-side."""
    import pyarrow.compute as pc

    alive = _packed_edges(art.edges).materialize()
    parts: list[ray.data.Dataset] = []
    k = 2
    for _ in range(max_rounds):
        n_alive = alive.count()
        if n_alive == 0:
            break
        edges_r = alive.map_batches(
            lambda t: pa.table({"src": t["u"], "dst": t["v"]}),
            batch_format="pyarrow", batch_size=None,
        )
        sym_r = edges_r.map_batches(
            lambda t: pa.table(
                {
                    "src": pa.concat_arrays(
                        [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                    ),
                    "dst": pa.concat_arrays(
                        [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow", batch_size=None,
        )
        degs_r = gb.degrees(sym_r)
        oriented_r = gb.orient_by_degree(
            edges_r, degs_r, num_partitions=art.num_partitions,
            n_vertices=art.n_vertices,
        )
        rel = edge_corner_rel(
            oriented_r, art.num_partitions, art.n_vertices, n_alive
        )
        sup = sum_by(rel, ["ek"], "c", out_col="support").materialize()
        if sup.count() == 0:
            # no triangle left anywhere: every surviving edge has support 0,
            # which can only happen while k == 2 (higher levels imply the
            # previous cascade already stripped support-0 edges). Joining an
            # all-empty aggregate also trips Ray's schema-less empty blocks,
            # so finish directly.
            def stamp_rest(t: pa.Table, _k=k) -> pa.Table:
                return pa.table(
                    {
                        "u": t["u"].cast(pa.int32()),
                        "v": t["v"].cast(pa.int32()),
                        "truss": pa.array(
                            np.full(t.num_rows, _k, np.int64), pa.int64()
                        ),
                    }
                )

            parts.append(
                alive.map_batches(
                    stamp_rest, batch_format="pyarrow", batch_size=None
                ).materialize()
            )
            break
        joined = _attach_by_ek(
            alive, sup, ["support"], art.num_partitions, n_alive
        ).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("support"),
                "support",
                pc.fill_null(t["support"], 0),
            ),
            batch_format="pyarrow", batch_size=None,
        ).materialize()
        smin = int(joined.min("support"))
        if smin > k - 2:
            k = smin + 2
        kk = k  # bind for the closure

        def stamp(t: pa.Table, _k=kk) -> pa.Table:
            return pa.table(
                {
                    "u": t["u"].cast(pa.int32()),
                    "v": t["v"].cast(pa.int32()),
                    "truss": pa.array(
                        np.full(t.num_rows, _k, np.int64), pa.int64()
                    ),
                }
            )

        removed = joined.filter(expr=f"support <= {kk - 2}")
        parts.append(
            removed.map_batches(
                stamp, batch_format="pyarrow", batch_size=None
            ).materialize()
        )
        alive = compact_blocks(
            joined.filter(expr=f"support > {kk - 2}").drop_columns(
                ["support"]
            )
        )
    else:
        raise RuntimeError("trussness: max_rounds exceeded")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def square_count(
    art, max_center_degree: int | None = None
) -> ray.data.Dataset:
    """(squares,): EXACT global 4-cycle count via the wedge-pair
    relation — #C4 = Σ_{u<w} C(p2(u,w), 2) / 2, where p2 is the number
    of wedge centers (common neighbors) of the unordered pair: every
    4-cycle has exactly two opposite-corner pairs, each contributing
    one counted pair-of-centers. The quadrilateral analog of the
    triangle kernel, on the same machinery.

    Plan: one pass over the symmetric CSR emits batch-local pair
    counts (combined per batch), one bucketed sum keyed on the packed
    pair, then a per-block Σ C(p2, 2) partial and a scalar driver
    reduce. ``max_center_degree`` gates hub centers at open-domain
    scale (see _wedge_pair_partials); None = exact, the oracle
    config."""
    from graphsetintersection_ray.stages.graph_build import build_csr

    csr = build_csr(art.sym, num_partitions=art.num_partitions)
    pairs = csr.map_batches(
        lambda t: _wedge_pair_partials(t, max_center_degree),
        batch_format="pyarrow", batch_size=None,
    )
    cnt = sum_by(pairs, ["pk"], "c", out_col="p2")

    def partial(t: pa.Table) -> pa.Table:
        p2 = t["p2"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"s": pa.array([int((p2 * (p2 - 1) // 2).sum())], pa.int64())}
        )

    total = sum(
        r["s"] for r in cnt.map_batches(
            partial, batch_format="pyarrow"
        ).take_all()
    )
    return ray.data.from_arrow(
        pa.table({"squares": pa.array([total // 2], pa.int64())})
    )


def modularity(art, labels: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """(modularity,): EXACT Newman modularity Q of a vertex partition
    over the undirected graph — Q = intra/m − Σ_c (d_c/(2m))², where
    intra = # undirected edges with both endpoints in community c,
    d_c = degree sum of community c, m = |E|. Both reduce terms are
    integer sums (intra count, per-community degree sums), so the one
    float expression evaluates exactly once on the driver: bit-exact
    and reduction-order-free. ``labels`` is any (v, label) partition;
    defaults to the deterministic entity-type labels (S5/S10 analog).

    Plan: under BROADCAST_MAX_VERTICES the label vector broadcasts once
    (dense int64 indexed by vid) and both terms are map-only partials;
    above it labels hash-join onto the edge endpoints and the degree
    table, per-community degree sums take one bucketed ``sum_by`` keyed
    on label, then Σ d_c² reduces per block — the driver sees
    O(#blocks) rows, never the community list."""
    import ray as _ray

    if labels is None:
        from graphsetintersection_ray.pipelines.subgraph import vertex_labels

        labels = vertex_labels(art)
    m = art.n_edges
    broadcast = art.n_vertices <= gb.BROADCAST_MAX_VERTICES

    if broadcast:
        ldf = labels.to_pandas()
        if len(ldf) != art.n_vertices:
            # a dense scatter would silently assign community 0 to any
            # vertex missing from a caller-supplied partition, skewing
            # both the intra-edge and degree sums — fail loudly instead
            raise ValueError(
                f"modularity labels cover {len(ldf)} of "
                f"{art.n_vertices} vertices; the partition must label "
                "every vertex"
            )
        lab_vec = np.zeros(art.n_vertices, np.int64)
        lab_vec[ldf["v"].to_numpy()] = ldf["label"].to_numpy()
        lab_ref = _ray.put(lab_vec)

        def intra_partial(t: pa.Table) -> pa.Table:
            lab = _ray.get(lab_ref)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"ie": pa.array([int((lab[s] == lab[d]).sum())], pa.int64())}
            )

        intra_parts = art.edges.map_batches(
            intra_partial, batch_format="pyarrow", batch_size=None
        )

        def deg_partial(t: pa.Table) -> pa.Table:
            lab = _ray.get(lab_ref)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            deg = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
            part = pd.DataFrame({"label": lab[v], "dc": deg})
            out = part.groupby("label", sort=False)["dc"].sum().reset_index()
            return pa.Table.from_pandas(out, preserve_index=False)

        labeled_deg = art.degrees.map_batches(
            deg_partial, batch_format="pyarrow", batch_size=None
        )
    else:
        lsrc = labels.map_batches(
            lambda t: pa.table(
                {"src": t["v"].cast(pa.int32()), "ls": t["label"]}
            ),
            batch_format="pyarrow", batch_size=None,
        )
        ldst = labels.map_batches(
            lambda t: pa.table(
                {"dst": t["v"].cast(pa.int32()), "ld": t["label"]}
            ),
            batch_format="pyarrow", batch_size=None,
        )
        both = compact_blocks(
            compact_blocks(art.edges).join(
                compact_blocks(lsrc), join_type="inner",
                num_partitions=art.num_partitions, on=("src",),
            )
        ).join(
            compact_blocks(ldst), join_type="inner",
            num_partitions=art.num_partitions, on=("dst",),
        )

        def intra_partial_j(t: pa.Table) -> pa.Table:
            ls = t["ls"].to_numpy(zero_copy_only=False)
            ld = t["ld"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"ie": pa.array([int((ls == ld).sum())], pa.int64())}
            )

        intra_parts = both.map_batches(
            intra_partial_j, batch_format="pyarrow", batch_size=None
        )

        joined_deg = compact_blocks(art.degrees).join(
            compact_blocks(labels.map_batches(
                lambda t: pa.table(
                    {"v": t["v"].cast(pa.int32()), "label": t["label"]}
                ),
                batch_format="pyarrow", batch_size=None,
            )),
            join_type="inner",
            num_partitions=art.num_partitions, on=("v",),
        )
        labeled_deg = joined_deg.map_batches(
            lambda t: pa.table({"label": t["label"], "dc": t["degree"]}),
            batch_format="pyarrow", batch_size=None,
        )

    intra = sum(r["ie"] for r in intra_parts.take_all())
    dc = sum_by(labeled_deg, ["label"], "dc", out_col="dc")

    def sq_partial(t: pa.Table) -> pa.Table:
        d = t["dc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"s": pa.array([int((d * d).sum())], pa.int64())})

    sum_d2 = sum(
        r["s"]
        for r in dc.map_batches(
            sq_partial, batch_format="pyarrow"
        ).take_all()
    )
    q = intra / m - sum_d2 / (4.0 * m * m)
    return ray.data.from_arrow(
        pa.table(
            {"modularity": pa.array([float(round_half_away(q, 6))], pa.float64())}
        )
    )


def rich_club(art) -> "ray.data.Dataset":
    """(k, rich_club): the rich-club coefficient curve
    φ(k) = 2·E_k / (N_k·(N_k−1)) for k = 0..max_degree−1, where
    N_k = #vertices with degree > k and E_k = #edges with BOTH endpoint
    degrees > k (Colizza et al. 2006, public). Hub-connectivity audit of
    the transcript graph.

    Plan: two bounded histograms — the degree histogram and the per-edge
    min-endpoint-degree histogram — each pre-aggregated per batch
    (np.unique combiner) before one tiny sum_by shuffle; the driver only
    suffix-sums two max_degree-length vectors. Endpoint degrees come from
    the broadcast degree vector under BROADCAST_MAX_VERTICES, else from
    two projected hash joins (the link_scores at-scale pattern)."""
    import ray as _ray

    def deg_hist(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        val, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"degree": pa.array(val), "n": pa.array(cnt.astype(np.int64))}
        )

    dh = sum_by(
        art.degrees.map_batches(deg_hist, batch_format="pyarrow"),
        ["degree"], "n", out_col="n",
    ).to_pandas()  # ≤ max_degree rows

    def md_hist_cols(s: np.ndarray, d: np.ndarray) -> pa.Table:
        md = np.minimum(s, d)
        val, cnt = np.unique(md, return_counts=True)
        return pa.table(
            {"md": pa.array(val), "n": pa.array(cnt.astype(np.int64))}
        )

    if art.n_vertices <= gb.BROADCAST_MAX_VERTICES:
        ddf = art.degrees.to_pandas()
        deg_vec = np.zeros(art.n_vertices, np.int64)
        deg_vec[ddf["v"].to_numpy()] = ddf["degree"].to_numpy()
        deg_ref = _ray.put(deg_vec)

        def md_hist(t: pa.Table) -> pa.Table:
            deg = _ray.get(deg_ref)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            return md_hist_cols(deg[s], deg[d])

        mparts = art.edges.map_batches(md_hist, batch_format="pyarrow")
    else:
        j1 = compact_blocks(art.edges).join(
            art.degrees,
            join_type="inner",
            num_partitions=art.num_partitions,
            on=("src",),
            right_on=("v",),
        ).map_batches(
            lambda t: t.select(["src", "dst", "degree"]).rename_columns(
                ["src", "dst", "deg_s"]
            ),
            batch_format="pyarrow", batch_size=None,
        )
        j2 = compact_blocks(j1).join(
            art.degrees,
            join_type="inner",
            num_partitions=art.num_partitions,
            on=("dst",),
            right_on=("v",),
        )

        def md_hist_join(t: pa.Table) -> pa.Table:
            return md_hist_cols(
                t["deg_s"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["degree"].to_numpy(zero_copy_only=False).astype(np.int64),
            )

        mparts = j2.map_batches(md_hist_join, batch_format="pyarrow")

    mh = sum_by(mparts, ["md"], "n", out_col="n").to_pandas()

    max_deg = int(dh["degree"].max()) if len(dh) else 0
    hvec = np.zeros(max_deg + 1, np.int64)
    hvec[dh["degree"].to_numpy()] = dh["n"].to_numpy()
    mvec = np.zeros(max_deg + 1, np.int64)
    if len(mh):
        mvec[mh["md"].to_numpy()] = mh["n"].to_numpy()
    ks = np.arange(max_deg, dtype=np.int64)  # k = 0..max_deg-1
    n_k = art.n_vertices - np.cumsum(hvec)[ks]  # degree > k
    e_k = art.n_edges - np.cumsum(mvec)[ks]  # min endpoint degree > k
    keep = n_k >= 2
    phi = 2.0 * e_k[keep] / (n_k[keep] * (n_k[keep] - 1.0))
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(ks[keep], pa.int64()),
                "rich_club": pa.array(round_half_away(phi, 6), pa.float64()),
            }
        )
    )


# deterministic multiplicative-hash sampling key — identical int64
# arithmetic on the engine and SQL sides (no overflow: ids < 2^31, so
# v·2654435761 + u·40503 < 2^63)
_NS_MULT_V = 2_654_435_761
_NS_MULT_U = 40_503
_NS_MOD = 1_000_000_007


def _ns_partial_top_k(
    s: np.ndarray, d: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    key = (d * _NS_MULT_V + s * _NS_MULT_U) % _NS_MOD
    order = np.lexsort((d, key, s))
    s2, d2 = s[order], d[order]
    starts = np.flatnonzero(np.r_[True, s2[1:] != s2[:-1]])
    lens = np.diff(np.append(starts, len(s2)))
    pos = np.arange(len(s2), dtype=np.int64) - np.repeat(starts, lens)
    keep = pos < k
    return s2[keep], d2[keep]


def neighbor_sample(art, k: int = 3) -> "ray.data.Dataset":
    """(u, v): a deterministic k-neighbor sample per vertex over the
    symmetric adjacency — the GNN mini-batch fan-out primitive
    (GraphSAGE, Hamilton et al. 2017, public), made reproducible by
    ranking each vertex's neighbors with a multiplicative-hash key
    (v·2654435761 + u·40503 mod 1e9+7, ties by v) instead of an RNG.

    Plan: per-batch partial top-k first (≤k rows per (u, batch) — the
    map-side combiner that bounds shuffle volume by k·V, not |E|), then
    one data-sized bucketed merge applying the same rank-and-head pass,
    so a vertex's partials never need to fit anywhere but one bucket."""
    from graphsetintersection_ray.stages.shuffle import bucket_groups

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"u": pa.array([], pa.int32()), "v": pa.array([], pa.int32())}
            )
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        su, sv = _ns_partial_top_k(s, d, k)
        return pa.table(
            {
                "u": pa.array(su.astype(np.int32), pa.int32()),
                "v": pa.array(sv.astype(np.int32), pa.int32()),
            }
        )

    parts = art.sym.map_batches(partial, batch_format="pyarrow")
    # partial rows ≤ k·V; size buckets to the data, not the cpu count
    n_buckets = max(
        art.num_partitions, int(k * art.n_vertices) // 2_000_000 + 1
    )
    bucketed = parts.map_batches(
        lambda t: t.append_column(
            "bucket",
            pa.array(
                t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
                % n_buckets,
                pa.int32(),
            ),
        ),
        batch_format="pyarrow",
    )

    def merge(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([("u", pa.int32()), ("v", pa.int32())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        s = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        su, sv = _ns_partial_top_k(s, d, k)
        return pa.table(
            {
                "u": pa.array(su.astype(np.int32), pa.int32()),
                "v": pa.array(sv.astype(np.int32), pa.int32()),
            }
        )

    return bucket_groups(
        bucketed, merge, n_buckets, bucket_col="bucket",
        batch_format="pyarrow",
    )


NEG_SEED = 99
NEG_OVERSAMPLE = 4


def negative_edges(art, k: int = 3, seed: int = NEG_SEED) -> "ray.data.Dataset":
    """(u, v): deterministic k negative samples per vertex — candidate
    non-edges for link-prediction / GNN contrastive training (the
    complement of ``neighbor_sample``). For vertex u, candidates are
    ``splitmix64(u·P + i + seed) mod n`` for i = 0..4k-1; self-pairs and
    existing edges are dropped and the first k survivors (by i) kept, so
    the sample is reproducible at any parallelism. A vertex keeps < k
    rows only if all 4k draws collide with its adjacency (vanishingly
    rare below degree ≈ n/2; documented, not silent — the semantic check
    recounts).

    Edge-membership testing: below ``triangle.BROADCAST_MAX_EDGES`` the
    sorted composite-key array ((src<<32)|dst over the symmetric edge
    set) is broadcast once and probed with one searchsorted per batch
    (map-only). Above it, a bucketed anti-join on the composite key
    (candidates and edges co-bucketed by key hash) followed by a
    per-vertex first-k bucket pass — both paths tested equal."""
    import ray
    import ray.data as rd

    from graphsetintersection_ray.pipelines import triangle as tri
    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        sized_buckets,
    )
    from graphsetintersection_ray.functions.hll import splitmix64

    n = art.n_vertices
    m = NEG_OVERSAMPLE * k
    out_schema = pa.schema([("u", pa.int32()), ("v", pa.int32())])

    def candidates(t: pa.Table) -> pa.Table:
        vs = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vs) == 0:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "i": pa.array([], pa.int64()),
                }
            )
        i = np.arange(m, dtype=np.uint64)
        raw = (
            vs.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
            + i[None, :]
            + np.uint64(seed)
        ).ravel()
        cand = (splitmix64(raw) % np.uint64(n)).astype(np.int64)
        i = i.astype(np.int64)
        row = np.repeat(vs, m)
        keep = cand != row
        return pa.table(
            {
                "u": pa.array(row[keep]),
                "v": pa.array(cand[keep]),
                "i": pa.array(np.tile(i, len(vs))[keep]),
            }
        )

    cands = rd.range(n).map_batches(candidates, batch_format="pyarrow")

    def first_k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        i = t["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, u))
        u, v, i = u[order], v[order], i[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.append(starts, len(u)))
        pos = np.arange(len(u), dtype=np.int64) - np.repeat(starts, lens)
        keep = pos < k
        return pa.table(
            {
                "u": pa.array(u[keep].astype(np.int32), pa.int32()),
                "v": pa.array(v[keep].astype(np.int32), pa.int32()),
            }
        )

    if art.n_edges <= tri.BROADCAST_MAX_EDGES:
        import pyarrow.compute as pc

        et = pa.concat_tables(
            [gb_ensure(b) for b in ray.get(art.sym.to_arrow_refs())]
        )
        keys = np.sort(
            (
                et["src"].to_numpy(zero_copy_only=False).astype(np.int64) << 32
            )
            | et["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        keys_ref = ray.put(keys)

        def drop_edges(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            ks = ray.get(keys_ref)
            key = (
                t["u"].to_numpy(zero_copy_only=False) << 32
            ) | t["v"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, key)
            is_edge = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == key)
            return t.filter(pa.array(~is_edge))

        filtered = cands.map_batches(drop_edges, batch_format="pyarrow")
        # per-u first-k needs all of u's survivors in one place; rd.range
        # blocks can split a vertex only at block boundaries, but the
        # bucket pass makes it correct under ANY blocking
        nb = sized_buckets(n * m)
        bucketed = filtered.map_batches(
            lambda b: _add_bucket(b, ["u"], nb), batch_format="pandas"
        )
        return bucket_groups(
            bucketed, lambda g: first_k(pa.Table.from_pandas(g, preserve_index=False)), nb
        )

    # at-scale: bucketed anti-join on the composite key, then first-k
    nb = sized_buckets(2 * art.n_edges)

    def edge_keys(t: pa.Table) -> pa.Table:
        key = (
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64) << 32
        ) | t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(key),
                "u": pa.array(np.full(len(key), -1, np.int64)),
                "v": pa.array(np.full(len(key), -1, np.int64)),
                "i": pa.array(np.full(len(key), -1, np.int64)),
            }
        )

    def cand_keys(t: pa.Table) -> pa.Table:
        key = (
            t["u"].to_numpy(zero_copy_only=False) << 32
        ) | t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array(key), "u": t["u"], "v": t["v"], "i": t["i"]}
        )

    unioned = art.sym.map_batches(edge_keys, batch_format="pyarrow").union(
        cands.map_batches(cand_keys, batch_format="pyarrow")
    )

    def anti(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "i": pa.array([], pa.int64()),
                }
            )
        bad = set(g.loc[g["u"] < 0, "key"])
        keep = (g["u"] >= 0) & ~g["key"].isin(bad)
        return pa.table(
            {
                "u": pa.array(g.loc[keep, "u"].to_numpy(np.int64)),
                "v": pa.array(g.loc[keep, "v"].to_numpy(np.int64)),
                "i": pa.array(g.loc[keep, "i"].to_numpy(np.int64)),
            }
        )

    survivors = bucket_groups(
        unioned.map_batches(
            lambda b: _add_bucket(b, ["key"], nb), batch_format="pandas"
        ),
        anti,
        nb,
    )
    nb2 = sized_buckets(n * m)
    bucketed = survivors.map_batches(
        lambda b: _add_bucket(b, ["u"], nb2), batch_format="pandas"
    )
    return bucket_groups(
        bucketed, lambda g: first_k(pa.Table.from_pandas(g, preserve_index=False)), nb2
    )


def gb_ensure(b):
    from graphsetintersection_ray.stages.graph_build import _ensure_arrow

    return _ensure_arrow(b)


def khop_sample(art, k1: int = 3, k2: int = 2) -> "ray.data.Dataset":
    """(u, hop, v): deterministic 2-layer neighbor sampling — the
    GraphSAGE mini-batch fan-out one layer deeper: hop 1 is each seed's
    ``k1``-sample, hop 2 the ``k2``-sample of every hop-1 node (per-node
    samples are shared across seeds, exactly as a GNN sampler caches
    them within a batch; no self-avoidance, matching the algorithm).
    Rows are distinct per (u, hop, v).

    Plan: ONE ``neighbor_sample`` edge pass (map-side-combined to
    <= k1.V rows). For ``k2 <= k1`` the k2-sample is derivable from the
    materialized k1-sample — the hash ranking is identical, so each
    node's top-k2 is a re-rank of its top-k1 rows (no second |E| scan);
    a vertex's sample rows co-locate in one bucket block out of
    ``neighbor_sample``'s boundary sort, which ``batch_size=None``
    preserves. Then ONE hash join hop1.v = sample2.node — the joined
    side is the k2-sample, never the adjacency — and a bounded distinct
    shuffle. At 10^12 turns nothing exceeds k1*k2*V rows."""
    from graphsetintersection_ray.stages.graph_build import compact_blocks
    from graphsetintersection_ray.stages.shuffle import distinct_by

    s1 = neighbor_sample(art, k=k1).materialize()
    if k2 <= k1:

        def rerank(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"w": pa.array([], pa.int32()),
                     "x": pa.array([], pa.int32())}
                )
            s = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            su, sv = _ns_partial_top_k(s, d, k2)
            return pa.table(
                {
                    "w": pa.array(su.astype(np.int32), pa.int32()),
                    "x": pa.array(sv.astype(np.int32), pa.int32()),
                }
            )

        s2 = s1.map_batches(rerank, batch_format="pyarrow", batch_size=None)
    else:
        s2 = neighbor_sample(art, k=k2).map_batches(
            lambda t: pa.table({"w": t["u"], "x": t["v"]}),
            batch_format="pyarrow",
        )
    joined = compact_blocks(s1).join(
        compact_blocks(s2),
        join_type="inner",
        num_partitions=art.num_partitions,
        on=("v",),
        right_on=("w",),
    )
    hop1 = s1.map_batches(
        lambda t: pa.table(
            {
                "u": t["u"],
                "hop": pa.array(np.ones(t.num_rows, np.int64)),
                "v": t["v"],
            }
        ),
        batch_format="pyarrow",
    )
    hop2 = joined.map_batches(
        lambda t: pa.table(
            {
                "u": t["u"],
                "hop": pa.array(np.full(t.num_rows, 2, np.int64)),
                "v": t["x"],
            }
        ),
        batch_format="pyarrow",
    )
    return distinct_by(hop1.union(hop2), ["u", "hop", "v"])
