"""Graph construction stages: transcript table → canonical int32 edge table
→ degree / orientation / CSR adjacency blocks.

Reference parity (all cited into /root/reference/):
  * dense-ID encoding  = python/trans_graph.py:3-22 ``gen_continuous_id_graph``
    (external key → contiguous int IDs), rebuilt as a distributed
    sorted-distinct + dense-rank (one shuffle).
  * edge sort + dedup  = B3, org_triangle_count.cpp:31-34 / util.cpp:120-124.
  * CSR build          = B4, org_triangle_count.cpp:39-49 (run-length over
    sorted edges → per-vertex neighbor segments), rebuilt as a bucketed
    groupby with ONE vectorized pass per bucket producing an Arrow
    ``list_<int32>`` adjacency column (offsets ≡ UVertex.start/deg,
    values ≡ pool_edges).
  * degree computation = B9, porder.cpp:61-64.
  * degree-ordered orientation = the skew strategy replacing the
    reference's layout reordering (porder.cpp deg_order :445-495): orient
    every undirected edge toward the higher-(degree, id) endpoint so each
    oriented adjacency list is O(sqrt(m))-bounded — the standard
    distributed-TC mitigation for hub vertices.

Edge model over transcripts (BASELINE.json north_star: "conv_id↔tool/role
co-occurrence and turn-adjacency edges"):
  E1  conv ↔ tool         ('c:<conv>', 't:<tool>')    distinct co-occurrence
  E2  conv ↔ role         ('c:<conv>', 'r:<role>')    distinct co-occurrence
  E3  actor(turn k) ↔ actor(turn k+1) within a conversation ordered by
      turn_idx, actor = 'a:<role>:<tool>'              turn-adjacency
  E4  tool ↔ tool          ('t:<A>', 't:<B>') for tools co-occurring in the
      same conversation (the tool-projection edges that make the triangle
      structure non-trivial)
All edges canonical (src_key < dst_key lexicographically — the prefixes
'a:' < 'c:' < 'r:' < 't:' make E1/E2 canonical by construction) and
globally distinct. Every step is SQL-expressible (see pipelines/queries.py
oracles).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphsetintersection_ray.functions.segments import segment_starts

DEFAULT_NUM_PARTITIONS = 32


def _conv_bucket(batch: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    # prune to the columns the edge derivation reads — text/ts never
    # enter the conversation shuffle
    batch = batch[["conv_id", "turn_idx", "role", "tool"]].copy()
    batch["bucket"] = (
        pd.util.hash_array(batch["conv_id"].to_numpy(object)) % num_buckets
    ).astype(np.int64)
    return batch


def _rank_by_string(uniques: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """code → string-rank mapping: rank[i] is the lexicographic rank of
    uniques[i]; second return is uniques sorted (the string for each rank)."""
    order = np.argsort(uniques)
    rank = np.empty(len(uniques), np.int64)
    rank[order] = np.arange(len(uniques))
    return rank, uniques[order]


def _prefixed(prefix: str, strings: np.ndarray, codes: np.ndarray) -> pa.Array:
    """Vectorized ``prefix + strings[codes]`` via Arrow's C++ concat."""
    import pyarrow.compute as pc

    taken = pa.array(strings, pa.string()).take(pa.array(codes, pa.int64()))
    out = pc.binary_join_element_wise(prefix, taken, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _edges_for_bucket(batch: pd.DataFrame) -> pa.Table:
    """All four edge families for one bucket of whole conversations,
    locally deduplicated. Emits a ``g`` flag: 0 = globally distinct by
    construction (E1/E2 — their conv_id key is pinned to this bucket),
    1 = needs the global distinct (E3/E4 — the same actor/tool pair can
    arise in many conversations across buckets).

    Everything runs on factorized integer codes (pack-into-int64 +
    ``np.unique`` replaces string drop_duplicates — measured 4x faster per
    bucket); tool/actor codes are re-ranked to lexicographic string order
    first, so min/max canonicalization matches the SQL oracle's string
    comparisons exactly. Key strings are built once, on the final deduped
    rows, with Arrow concat kernels."""
    if len(batch) == 0:
        return pa.table(
            {
                "src_key": pa.array([], pa.string()),
                "dst_key": pa.array([], pa.string()),
                "g": pa.array([], pa.int8()),
            }
        )

    conv_raw = batch["conv_id"].to_numpy(object)
    tool_raw = batch["tool"].to_numpy(object)
    role_raw = batch["role"].to_numpy(object)
    turn = batch["turn_idx"].to_numpy()

    cc, conv_u = pd.factorize(conv_raw)
    tc0, tool_u = pd.factorize(tool_raw)
    rc0, role_u = pd.factorize(role_raw)
    conv_u = np.asarray(conv_u, dtype=object)
    tool_u = np.asarray(tool_u, dtype=object)
    role_u = np.asarray(role_u, dtype=object)
    nt, nr = len(tool_u), len(role_u)

    # integer order == string order for the canonicalized families
    t_rank, tool_sorted = _rank_by_string(tool_u)
    r_rank, role_sorted = _rank_by_string(role_u)
    tc = t_rank[tc0]
    rc = r_rank[rc0]
    cc64 = cc.astype(np.int64)

    # E1: distinct (conv, tool) — doubles as E4's per-conv tool sets
    p1 = np.unique(cc64 * nt + tc)
    e1_c, e1_t = p1 // nt, p1 % nt
    # E2: distinct (conv, role)
    p2 = np.unique(cc64 * nr + rc)
    e2_c, e2_r = p2 // nr, p2 % nr

    # E3: consecutive-turn actor adjacency. The actor key is
    # 'a:<role>:<tool>' and canonical order is the order of that FULL
    # string (not the (role, tool) tuple — a role that prefixes another
    # sorts differently), so rank the observed combos by their
    # materialized key strings.
    combo_raw = rc0.astype(np.int64) * nt + tc0
    combos = np.unique(combo_raw)
    a_keys = np.array(
        ["a:" + role_u[c // nt] + ":" + tool_u[c % nt] for c in combos],
        dtype=object,
    )
    a_rank, a_sorted = _rank_by_string(a_keys)
    ar = a_rank[np.searchsorted(combos, combo_raw)]

    order = np.lexsort((turn, cc))
    cs, as_ = cc[order], ar[order]
    e3_lo = e3_hi = np.empty(0, np.int64)
    if len(cs) > 1:
        same = cs[1:] == cs[:-1]
        x, y = as_[:-1][same], as_[1:][same]
        ne = x != y
        x, y = x[ne], y[ne]
        na = np.int64(len(a_keys))
        p3 = np.unique(np.minimum(x, y) * na + np.maximum(x, y))
        e3_lo, e3_hi = p3 // na, p3 % na

    # E4: distinct tool pairs co-occurring in a conversation. p1 is
    # sorted by (conv, tool-rank), so the i<j local pairs within each
    # conv group are canonical by construction.
    starts = segment_starts(e1_c)
    k = np.diff(np.append(starts, len(e1_c)))
    pos = np.arange(len(e1_c)) - np.repeat(starts, k)
    rep = pos  # element at local pos p is the 'hi' side of p pairs
    total = int(rep.sum())
    if total:
        j_idx = np.repeat(np.arange(len(e1_c)), rep)
        off = np.arange(total) - np.repeat(np.cumsum(rep) - rep, rep)
        i_idx = j_idx - np.repeat(pos, rep) + off
        p4 = np.unique(e1_t[i_idx] * nt + e1_t[j_idx])
        e4_lo, e4_hi = p4 // nt, p4 % nt
    else:
        e4_lo = e4_hi = np.empty(0, np.int64)

    a_sorted_arr = pa.array(a_sorted, pa.string())
    src = pa.concat_arrays(
        [
            _prefixed("c:", conv_u, e1_c),
            _prefixed("c:", conv_u, e2_c),
            a_sorted_arr.take(pa.array(e3_lo, pa.int64())),
            _prefixed("t:", tool_sorted, e4_lo),
        ]
    )
    dst = pa.concat_arrays(
        [
            _prefixed("t:", tool_sorted, e1_t),
            _prefixed("r:", role_sorted, e2_r),
            a_sorted_arr.take(pa.array(e3_hi, pa.int64())),
            _prefixed("t:", tool_sorted, e4_hi),
        ]
    )
    n_local = len(p1) + len(p2)
    n_glob = len(e3_lo) + len(e4_lo)
    flags = np.concatenate(
        [np.zeros(n_local, np.int8), np.ones(n_glob, np.int8)]
    )
    return pa.table(
        {"src_key": src, "dst_key": dst, "g": pa.array(flags, pa.int8())}
    )


def _derive_edges_legacy(
    transcripts: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """String-payload derivation path (fallback when the tool/role
    dimension is too large to broadcast — see ``derive_graph_tables``).
    Two shuffles — conv-bucket grouping, then a global dedup carrying
    ONLY the edge families that can repeat across conversation buckets
    (E3/E4); conv-keyed families (E1/E2) are globally distinct after the
    per-bucket dedup and bypass it."""
    from graphsetintersection_ray.stages.shuffle import bucket_groups, distinct_by

    bucketed = transcripts.map_batches(
        _conv_bucket, batch_format="pandas", fn_kwargs=dict(num_buckets=num_buckets), batch_size=None)
    edges = bucket_groups(
        bucketed, _edges_for_bucket, num_buckets, bucket_col="bucket"
    ).materialize()

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src_key": t["src_key"], "dst_key": t["dst_key"]})

    local = edges.filter(expr="g == 0").map_batches(
        project, batch_format="pyarrow", batch_size=None)
    needs_dedup = edges.filter(expr="g == 1").map_batches(
        project, batch_format="pyarrow", batch_size=None)
    deduped = distinct_by(
        needs_dedup, ["src_key", "dst_key"], num_buckets=num_buckets
    )
    return local.union(deduped)


# ---------------------------------------------------------------------------
# Coded derivation: the E3/E4 families draw their endpoints from the SMALL
# tool/role/actor dimensions, so the global dedup shuffle can move int32
# pairs instead of ~50-byte string pairs, and the vertex table can be
# assembled structurally (conv keys are bucket-distinct — zero shuffle)
# instead of re-deduplicating 2x|E| endpoint strings. Falls back to the
# string path when the dimension tables outgrow the broadcast budget.
# ---------------------------------------------------------------------------

# Above this many distinct (role, tool) combos — or this many amap cells —
# the dimension broadcast stops being "small" and the string path runs.
SMALL_DIMS_MAX = int(os.environ.get("GRAFT_SMALL_DIMS_MAX", 4_000_000))
_AMAP_CELLS_MAX = 64_000_000


def _small_dims(transcripts: ray.data.Dataset, num_buckets: int):
    """Global (tool, role, actor) rank tables, broadcast once.

    Returns (dims_ref, tools_np, roles_np) or None when the dimension is
    too large (fallback to the string path). Ranks are lexicographic, so
    integer comparisons reproduce the oracle's string canonicalization;
    actor ranks are computed on the full 'a:<role>:<tool>' key strings
    (tuple order differs when one role prefixes another)."""

    def local_combos(b: pd.DataFrame) -> pa.Table:
        rc, ru = pd.factorize(b["role"].to_numpy(object))
        tc, tu = pd.factorize(b["tool"].to_numpy(object))
        nt = max(len(tu), 1)
        u = np.unique(rc.astype(np.int64) * nt + tc)
        return pa.table(
            {
                "role": pa.array(np.asarray(ru, object)[u // nt], pa.string()),
                "tool": pa.array(np.asarray(tu, object)[u % nt], pa.string()),
            }
        )

    # per-block uniques collapse to the driver directly (no shuffle):
    # the combo dimension is tiny next to the row count, and the size
    # guard below falls back to the string path if it is not
    partial = transcripts.map_batches(
        local_combos, batch_format="pandas", batch_size=None
    ).materialize()
    if partial.count() > SMALL_DIMS_MAX:
        return None
    cdf = partial.to_pandas()
    role_np = cdf["role"].to_numpy(object)
    tool_np = cdf["tool"].to_numpy(object)
    # driver-side global dedup of the per-block partials
    rc0, ru = pd.factorize(role_np)
    tc0, tu = pd.factorize(tool_np)
    u = np.unique(rc0.astype(np.int64) * max(len(tu), 1) + tc0)
    role_np = np.asarray(ru, object)[u // max(len(tu), 1)]
    tool_np = np.asarray(tu, object)[u % max(len(tu), 1)]
    if len(u) > SMALL_DIMS_MAX:
        return None
    tools_sorted = np.unique(tool_np)
    roles_sorted = np.unique(role_np)
    nt, nr = len(tools_sorted), len(roles_sorted)
    if nt * nr > _AMAP_CELLS_MAX:
        return None
    r_codes = np.searchsorted(roles_sorted, role_np)
    t_codes = np.searchsorted(tools_sorted, tool_np)
    a_keys = np.array(
        ["a:" + r + ":" + t for r, t in zip(role_np, tool_np)], dtype=object
    )
    order = np.argsort(a_keys)
    a_sorted = a_keys[order]
    amap = np.full(max(nr * nt, 1), -1, np.int32)
    amap[(r_codes * nt + t_codes)[order]] = np.arange(len(order), dtype=np.int32)
    dims_ref = ray.put(
        (
            pa.array(tools_sorted, pa.string()),
            pa.array(roles_sorted, pa.string()),
            pa.array(a_sorted, pa.string()),
            amap,
            nt,
            nr,
        )
    )
    return dims_ref, tools_sorted, roles_sorted


def _conv_bucket_coded(t: pa.Table, num_buckets: int, dims_ref) -> pa.Table:
    """Prune + bucket by conv hash, mapping tool/role to their global
    ranks BEFORE the shuffle (int32 travels instead of the strings)."""
    import pyarrow.compute as pc

    tools, roles, *_ = ray.get(dims_ref)
    convnp = t["conv_id"].to_numpy(zero_copy_only=False)
    bucket = (pd.util.hash_array(convnp) % num_buckets).astype(np.int64)
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"].cast(pa.int32()),
            "rc": pc.index_in(t["role"], value_set=roles).cast(pa.int32()),
            "tc": pc.index_in(t["tool"], value_set=tools).cast(pa.int32()),
            "bucket": pa.array(bucket),
        }
    )


def _empty_strings(n: int) -> pa.Array:
    """Arrow string array of n empty strings in O(n) int32 work."""
    offsets = pa.array(np.zeros(n + 1, np.int32)).buffers()[1]
    return pa.StringArray.from_buffers(n, offsets, pa.py_buffer(b""))


def _take_prefixed(prefix: str, strings: pa.Array, codes: np.ndarray) -> pa.Array:
    import pyarrow.compute as pc

    out = pc.binary_join_element_wise(
        prefix, strings.take(pa.array(codes, pa.int64())), ""
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _edges_for_bucket_coded(batch: pd.DataFrame, dims_ref) -> pa.Table:
    """Edge families for one conv bucket over global integer ranks.

    Output rows are either string edges (fam = -1: E1/E2, globally
    distinct by construction) or int32 rank pairs (fam = 3: actor-actor
    E3, fam = 4: tool-tool E4) that the global distinct dedups before
    ``_int_pairs_to_strings`` rebuilds their keys."""
    tools, roles, a_sorted, amap, nt, nr = ray.get(dims_ref)
    if len(batch) == 0:
        return pa.table(
            {
                "src_key": pa.array([], pa.string()),
                "dst_key": pa.array([], pa.string()),
                "fam": pa.array([], pa.int8()),
                "a": pa.array([], pa.int32()),
                "b": pa.array([], pa.int32()),
            }
        )
    conv_raw = batch["conv_id"].to_numpy(object)
    turn = batch["turn_idx"].to_numpy()
    tc = batch["tc"].to_numpy().astype(np.int64)
    rc = batch["rc"].to_numpy().astype(np.int64)
    cc, conv_u = pd.factorize(conv_raw)
    conv_u = np.asarray(conv_u, dtype=object)
    cc64 = cc.astype(np.int64)

    nt64, nr64 = np.int64(nt), np.int64(nr)
    p1 = np.unique(cc64 * nt64 + tc)
    e1_c, e1_t = p1 // nt64, p1 % nt64
    p2 = np.unique(cc64 * nr64 + rc)
    e2_c, e2_r = p2 // nr64, p2 % nr64

    # E3 pairs over global actor ranks (string-ordered, so min/max is
    # the oracle's canonical order)
    ar = amap[rc * nt64 + tc].astype(np.int64)
    order = np.lexsort((turn, cc))
    cs, as_ = cc[order], ar[order]
    na = np.int64(max(len(a_sorted), 1))
    e3 = np.empty(0, np.int64)
    if len(cs) > 1:
        same = cs[1:] == cs[:-1]
        x, y = as_[:-1][same], as_[1:][same]
        ne = x != y
        x, y = x[ne], y[ne]
        e3 = np.unique(np.minimum(x, y) * na + np.maximum(x, y))
    e3_a, e3_b = e3 // na, e3 % na

    # E4 pairs over global tool ranks; p1 sorted by (conv, rank) makes
    # local i<j pairs canonical
    starts = segment_starts(e1_c)
    k = np.diff(np.append(starts, len(e1_c)))
    pos = np.arange(len(e1_c)) - np.repeat(starts, k)
    rep = pos
    total = int(rep.sum())
    if total:
        j_idx = np.repeat(np.arange(len(e1_c)), rep)
        off = np.arange(total) - np.repeat(np.cumsum(rep) - rep, rep)
        i_idx = j_idx - np.repeat(pos, rep) + off
        p4 = np.unique(e1_t[i_idx] * nt64 + e1_t[j_idx])
        e4_a, e4_b = p4 // nt64, p4 % nt64
    else:
        e4_a = e4_b = np.empty(0, np.int64)

    n_local = len(p1) + len(p2)
    n_int = len(e3) + len(e4_a)
    src = pa.concat_arrays(
        [
            _prefixed("c:", conv_u, e1_c),
            _prefixed("c:", conv_u, e2_c),
            _empty_strings(n_int),
        ]
    )
    dst = pa.concat_arrays(
        [
            _take_prefixed("t:", tools, e1_t),
            _take_prefixed("r:", roles, e2_r),
            _empty_strings(n_int),
        ]
    )
    fam = np.concatenate(
        [
            np.full(n_local, -1, np.int8),
            np.full(len(e3), 3, np.int8),
            np.full(len(e4_a), 4, np.int8),
        ]
    )
    a = np.concatenate([np.zeros(n_local, np.int64), e3_a, e4_a]).astype(np.int32)
    b = np.concatenate([np.zeros(n_local, np.int64), e3_b, e4_b]).astype(np.int32)
    return pa.table(
        {
            "src_key": src,
            "dst_key": dst,
            "fam": pa.array(fam),
            "a": pa.array(a),
            "b": pa.array(b),
        }
    )


def _int_pairs_to_strings(t: pa.Table, dims_ref) -> pa.Table:
    """Deduped (fam, a, b) rank pairs → canonical string edges."""
    tools, roles, a_sorted, *_ = ray.get(dims_ref)
    fam = t["fam"].to_numpy(zero_copy_only=False)
    a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    m3 = fam == 3
    m4 = fam == 4
    src = pa.concat_arrays(
        [
            a_sorted.take(pa.array(a[m3], pa.int64())),
            _take_prefixed("t:", tools, a[m4]),
        ]
    )
    dst = pa.concat_arrays(
        [
            a_sorted.take(pa.array(b[m3], pa.int64())),
            _take_prefixed("t:", tools, b[m4]),
        ]
    )
    return pa.table({"src_key": src, "dst_key": dst})


def derive_graph_tables(
    transcripts: ray.data.Dataset,
    num_buckets: int = 64,
    want_vertices: bool = True,
) -> tuple[ray.data.Dataset, ray.data.Dataset | None]:
    """transcript table → (distinct canonical string edges, vertex map).

    The fast path shuffles E3/E4 as int32 rank pairs and assembles the
    vertex table structurally: conv keys are distinct per bucket (zero
    extra shuffle), tool/role keys come from the broadcast dimension,
    actor keys from the deduped E3 pairs. The vertex set equals the
    distinct endpoints of the edge set by construction (every
    conv/tool/role appears in an E1/E2 edge; actors appear iff they
    survive into an E3 edge). ``want_vertices=False`` skips the vertex
    assembly (its dense-rank sort runs eagerly) and returns None."""
    from graphsetintersection_ray.stages.shuffle import bucket_groups, distinct_by

    dims = _small_dims(transcripts, num_buckets)
    if dims is None:
        edges = _derive_edges_legacy(transcripts, num_buckets)
        return edges, (encode_vertices(edges) if want_vertices else None)
    dims_ref, tools_np, roles_np = dims

    bucketed = transcripts.map_batches(
        _conv_bucket_coded,
        batch_format="pyarrow",
        fn_kwargs=dict(num_buckets=num_buckets, dims_ref=dims_ref),
        batch_size=None,
    )

    def fn(batch: pd.DataFrame) -> pa.Table:
        return _edges_for_bucket_coded(batch, dims_ref)

    raw = bucket_groups(bucketed, fn, num_buckets, bucket_col="bucket").materialize()

    def project_str(t: pa.Table) -> pa.Table:
        return pa.table({"src_key": t["src_key"], "dst_key": t["dst_key"]})

    def project_int(t: pa.Table) -> pa.Table:
        return pa.table({"fam": t["fam"], "a": t["a"], "b": t["b"]})

    local = raw.filter(expr="fam < 0").map_batches(
        project_str, batch_format="pyarrow", batch_size=None)
    ints = raw.filter(expr="fam >= 0").map_batches(
        project_int, batch_format="pyarrow", batch_size=None)
    deduped_int = distinct_by(
        ints, ["fam", "a", "b"], num_buckets=num_buckets
    ).materialize()
    glob = deduped_int.map_batches(
        _int_pairs_to_strings,
        batch_format="pyarrow",
        fn_kwargs=dict(dims_ref=dims_ref),
        batch_size=None,
    )
    edges = local.union(glob)
    if not want_vertices:
        return edges, None

    # vertices: conv keys are bucket-pinned (block-local unique IS the
    # global distinct); actor keys come off the deduped E3 pairs; the
    # tool/role key lists are the driver-side dimension
    def conv_keys_block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.unique(t["src_key"].combine_chunks())
        return pa.table({"key": u})

    conv_keys = local.map_batches(
        conv_keys_block, batch_format="pyarrow", batch_size=None)

    def actor_keys_block(t: pa.Table) -> pa.Table:
        fam = t["fam"].to_numpy(zero_copy_only=False)
        m3 = fam == 3
        ab = np.unique(
            np.concatenate(
                [
                    t["a"].to_numpy(zero_copy_only=False)[m3],
                    t["b"].to_numpy(zero_copy_only=False)[m3],
                ]
            )
        ).astype(np.int64)
        _, _, a_sorted, *_ = ray.get(dims_ref)
        return pa.table({"key": a_sorted.take(pa.array(ab))})

    actor_partial = deduped_int.map_batches(
        actor_keys_block, batch_format="pyarrow", batch_size=None)
    actor_keys = distinct_by(actor_partial, ["key"], num_buckets=8)

    small_keys = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(
                    ["t:" + t for t in tools_np] + ["r:" + r for r in roles_np],
                    pa.string(),
                )
            }
        )
    )
    vertices = dense_rank_ids(
        conv_keys.union(actor_keys).union(small_keys), "key"
    )
    return edges, vertices


def derive_edges(
    transcripts: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """transcript table → distinct canonical string-keyed edge table
    (src_key < dst_key). See ``derive_graph_tables``."""
    return derive_graph_tables(transcripts, num_buckets, want_vertices=False)[0]


def _ensure_arrow(tbl) -> pa.Table:
    """to_arrow_refs can hand back raw pandas blocks — normalize."""
    if isinstance(tbl, pd.DataFrame):
        return pa.Table.from_pandas(tbl, preserve_index=False)
    return tbl


@ray.remote
def _block_nrows(tbl) -> int:
    return len(tbl)


@ray.remote
def _block_to_arrow(tbl) -> pa.Table:
    return _ensure_arrow(tbl)


def compact_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize, normalize blocks to Arrow, and drop empty blocks.

    Ray's groupby/map_groups shuffle emits column-less empty pandas blocks
    for empty partitions; if one of those lands first in a hash-join
    partition, Acero fails with "No match ... for key field on left side".
    Join inputs are compacted through this (driver work is O(#blocks))."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    keep = [_block_to_arrow.remote(r) for r, c in zip(refs, counts) if c > 0]
    if not keep:
        return mat
    return ray.data.from_arrow_refs(keep)


@ray.remote
def _block_enumerate(
    tbl, offset: int, keep_cols: list, id_col: str
) -> pa.Table:
    tbl = _ensure_arrow(tbl)
    ids = pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int32))
    return pa.table({c: tbl[c] for c in keep_cols} | {id_col: ids})


def enumerate_sorted(
    sorted_ds: ray.data.Dataset, keep_cols: list, id_col: str
) -> ray.data.Dataset:
    """Attach a global 0-based row number to an already-sorted dataset.

    Distributed: driver work is O(#blocks) — per-block row counts are
    fetched by cheap remote tasks, prefix offsets computed on the driver,
    and each block is enumerated by its own remote task; nothing large
    lands on the driver.
    """
    mat = sorted_ds.materialize()
    refs = mat.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    # skip empty blocks: the sort can emit COLUMN-LESS empty pandas
    # blocks for empty ranges, which would KeyError on keep_cols
    out_refs = [
        _block_enumerate.remote(r, int(off), keep_cols, id_col)
        for r, off, c in zip(refs, offsets, counts)
        if c > 0
    ]
    if not out_refs:
        return mat
    return ray.data.from_arrow_refs(out_refs)


def dense_rank_ids(
    ds: ray.data.Dataset, key_col: str, id_col: str = "vid"
) -> ray.data.Dataset:
    """Globally sorted dense 0-based IDs for the distinct values of key_col.

    = trans_graph.py:3-22 rebuilt distributed: sort the distinct keys, then
    enumerate blocks with their global offsets. IDs are assigned in key
    order, so key order and id order agree — canonical string edges stay
    canonical as int edges.

    Below BROADCAST_MAX_VERTICES keys the rank is computed driver-side
    with Arrow's C++ sort (the map is about to be collected for the
    broadcast lookup anyway, and a distributed string sort costs seconds
    of fixed shuffle); above it, the distributed sort+enumerate runs.
    """
    import pyarrow.compute as pc

    mat = ds.materialize()
    if mat.count() <= BROADCAST_MAX_VERTICES:
        # drop zero-row blocks: shuffles can emit COLUMN-LESS empty
        # pandas blocks whose schema breaks concat_tables
        tbls = [
            t
            for t in (_ensure_arrow(b) for b in ray.get(mat.to_arrow_refs()))
            if t.num_rows > 0
        ]
        if not tbls:
            return ray.data.from_arrow(
                pa.table(
                    {
                        key_col: pa.array([], pa.string()),
                        id_col: pa.array([], pa.int32()),
                    }
                )
            )
        tbl = pa.concat_tables(tbls).combine_chunks()
        idx = pc.sort_indices(tbl[key_col])
        keys_sorted = tbl[key_col].take(idx)
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: keys_sorted,
                    id_col: pa.array(
                        np.arange(tbl.num_rows, dtype=np.int32)
                    ),
                }
            )
        )
    return enumerate_sorted(mat.sort(key_col), [key_col], id_col)


def encode_vertices(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct endpoint keys → (key, vid:int32) dense mapping."""
    def _flatten(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": pa.concat_arrays(
                [t["src_key"].combine_chunks(), t["dst_key"].combine_chunks()]
            )}
        )

    from graphsetintersection_ray.stages.shuffle import distinct_by

    endpoints = edges.map_batches(_flatten, batch_format="pyarrow", batch_size=None)
    return dense_rank_ids(distinct_by(endpoints, ["key"]), "key")


# Below this vertex count the key→vid map / degree vector is broadcast via
# ray.put (a few tens of MB) and joins become map-side lookups; above it the
# hash-shuffle join path runs. 10^12-turn graphs take the join path.
# Env-overridable so tests/CORRECTNESS can force the join path at sf scale.
BROADCAST_MAX_VERTICES = int(
    os.environ.get("GRAFT_BROADCAST_MAX_VERTICES", 2_000_000)
)


def edges_to_ids(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    n_vertices: int | None = None,
) -> ray.data.Dataset:
    """String edges ⋈ vertex map (twice) → canonical (src,dst) int32 edges.

    Small side broadcast (``ray.put`` once, Arrow ``index_in`` probe per
    batch) when the vertex map fits; hash-shuffle join otherwise. Because
    dense ranks are order-preserving, src < dst still holds after mapping.
    """
    if n_vertices is None:
        n_vertices = vertices.count()
    if n_vertices <= BROADCAST_MAX_VERTICES:
        # Broadcast the map as a raw Arrow string array + int32 vid vector:
        # Arrow buffers travel zero-copy through the object store (no
        # per-worker unpickle), and the probe runs Arrow's C++ hash kernel
        # (``pc.index_in``) without ever materializing Python strings —
        # measured 4.8x faster per batch than the previous pickled
        # pandas-Index probe (which anti-scaled badly enough to need a
        # concurrency cap; this path needs none and scales with cores).
        import pyarrow.compute as pc

        vtbl = pa.concat_tables(
            [_ensure_arrow(b) for b in ray.get(vertices.to_arrow_refs())]
        )
        keys_arr = vtbl["key"].combine_chunks()
        vids = vtbl["vid"].to_numpy().astype(np.int32)
        ref = ray.put((keys_arr, vids))

        def lookup(t: pa.Table) -> pa.Table:
            ks, vv = ray.get(ref)
            n = t.num_rows
            if n == 0:
                e = pa.array([], pa.int32())
                return pa.table({"src": e, "dst": e})
            # one index_in call per block: the kernel builds its hash
            # table per call, so probing src+dst together halves that
            both = pa.chunked_array(t["src_key"].chunks + t["dst_key"].chunks)
            pos = pc.index_in(both, value_set=ks)
            if pos.null_count:
                raise ValueError("edge endpoint missing from vertex map")
            mapped = vv[pos.to_numpy(zero_copy_only=False)]
            return pa.table(
                {
                    "src": pa.array(mapped[:n]),
                    "dst": pa.array(mapped[n:]),
                }
            )

        return edges.map_batches(lookup, batch_format="pyarrow", batch_size=None)
    j1 = edges.join(
        vertices,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src_key",),
        right_on=("key",),
    ).map_batches(
        lambda t: pa.table({"dst_key": t["dst_key"], "src": t["vid"]}),
        batch_format="pyarrow", batch_size=None)
    j2 = j1.join(
        vertices,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst_key",),
        right_on=("key",),
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"].cast(pa.int32()),
                "dst": t["vid"].cast(pa.int32()),
            }
        ),
        batch_format="pyarrow", batch_size=None)
    return j2


def symmetrize(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical (src<dst) edges → both directions (the reference stores
    undirected graphs with both directions materialized, README.md:46-56)."""
    rev = edges.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow", batch_size=None)
    return edges.union(rev)


def degrees(sym_edges: ray.data.Dataset) -> ray.data.Dataset:
    """(v, degree) from the symmetrized edge table (B9, porder.cpp:61-64).
    Pre-aggregates per batch before the global groupby shuffle."""
    def _partial(t: pa.Table) -> pa.Table:
        v, cnt = np.unique(t["src"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"v": pa.array(v, pa.int32()), "partial": pa.array(cnt, pa.int64())}
        )

    from graphsetintersection_ray.stages.shuffle import sum_by

    return sum_by(
        sym_edges.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["v"],
        "partial",
        out_col="degree",
    ).map_batches(
        lambda t: pa.table(
            {
                "v": t["v"].cast(pa.int32()),
                "degree": t["degree"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow", batch_size=None)


def degrees_from_csr(csr: ray.data.Dataset) -> ray.data.Dataset:
    """(v, degree) read off the CSR adjacency lists — ZERO extra shuffle.

    On a globally-distinct symmetric edge table the CSR's per-vertex
    neighbor count IS the degree (B9, porder.cpp:61-64: ``deg[u] =
    adj_list_end - adj_list_start``), so when a CSR is being built anyway
    the standalone ``degrees`` sum-shuffle over every symmetric edge is
    redundant work. Schema matches ``degrees`` exactly."""

    def lens(t: pa.Table) -> pa.Table:
        lists = t["nbrs"].combine_chunks()
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "v": t["u"].cast(pa.int32()),
                "degree": pa.array(np.diff(offs), pa.int64()),
            }
        )

    return csr.map_batches(lens, batch_format="pyarrow", batch_size=None)


def orient_by_degree(
    edges: ray.data.Dataset,
    degs: ray.data.Dataset,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    n_vertices: int | None = None,
) -> ray.data.Dataset:
    """Orient canonical edges toward the higher-(degree, id) endpoint.

    The resulting DAG adjacency lists are O(sqrt(m))-bounded — the explicit
    skew mitigation replacing the reference's degree reordering
    (porder.cpp:445-495) for distributed triangle counting. Degree vector
    broadcast when it fits (dense int64 array indexed by vid); hash joins
    otherwise.
    """
    if n_vertices is None:
        n_vertices = degs.count()
    if n_vertices <= BROADCAST_MAX_VERTICES:
        ddf = degs.to_pandas()
        deg_vec = np.zeros(int(ddf["v"].max()) + 1 if len(ddf) else 0, np.int64)
        deg_vec[ddf["v"].to_numpy()] = ddf["degree"].to_numpy()
        ref = ray.put(deg_vec)

        def orient_bc(t: pa.Table) -> pa.Table:
            dv = ray.get(ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            ds_, dd = dv[src], dv[dst]
            keep = (ds_ < dd) | ((ds_ == dd) & (src < dst))
            return pa.table(
                {
                    "src": pa.array(np.where(keep, src, dst).astype(np.int32)),
                    "dst": pa.array(np.where(keep, dst, src).astype(np.int32)),
                }
            )

        return edges.map_batches(orient_bc, batch_format="pyarrow", batch_size=None)

    j1 = edges.join(
        degs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("v",),
    ).map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "deg_src": t["degree"]}
        ),
        batch_format="pyarrow", batch_size=None)
    j2 = j1.join(
        degs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("v",),
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "deg_src": t["deg_src"],
                "deg_dst": t["degree"],
            }
        ),
        batch_format="pyarrow", batch_size=None)

    def orient(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        ds_ = t["deg_src"].to_numpy(zero_copy_only=False)
        dd = t["deg_dst"].to_numpy(zero_copy_only=False)
        # src stays the tail when (deg_src, src) < (deg_dst, dst)
        keep = (ds_ < dd) | ((ds_ == dd) & (src < dst))
        return pa.table(
            {
                "src": pa.array(np.where(keep, src, dst), pa.int32()),
                "dst": pa.array(np.where(keep, dst, src), pa.int32()),
            }
        )

    return j2.map_batches(orient, batch_format="pyarrow", batch_size=None)


def _csr_for_bucket(batch: pd.DataFrame) -> pa.Table:
    """One vectorized CSR pass per bucket: sort by (src, dst), run-length
    encode into an Arrow list column (B3+B4 semantics, dedup included)."""
    src = batch["src"].to_numpy()
    dst = batch["dst"].to_numpy()
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if len(src):
        keep = np.empty(len(src), dtype=bool)
        keep[0] = True
        np.logical_or(src[1:] != src[:-1], dst[1:] != dst[:-1], out=keep[1:])
        src, dst = src[keep], dst[keep]
    starts = segment_starts(src)
    bounds = np.append(starts, len(src))
    u = src[starts] if len(starts) else src[:0]
    nbrs = pa.ListArray.from_arrays(
        pa.array(bounds, pa.int32()), pa.array(dst, pa.int32())
    )
    return pa.table({"u": pa.array(u, pa.int32()), "nbrs": nbrs})


def _csr_for_bucket_packed(batch: pd.DataFrame) -> pa.Table:
    """Like _csr_for_bucket but emits the neighbor list as little-endian
    int32 bytes (`nbrs_bin: binary`) — Acero hash joins reject list-typed
    payload columns, so the joinable CSR encoding is the packed one. The
    byte blob is the exact analog of the reference's flat `pool_edges`
    int32 arena segment per vertex (util.hpp:46-51)."""
    t = _csr_for_bucket(batch)
    lists = t["nbrs"].combine_chunks()
    offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.values.to_numpy(zero_copy_only=False).astype(np.int32)
    raw = flat.tobytes()
    blobs = [raw[offs[i] * 4 : offs[i + 1] * 4] for i in range(len(offs) - 1)]
    return pa.table({"u": t["u"], "nbrs_bin": pa.array(blobs, pa.binary())})


def build_csr(
    sym_edges: ray.data.Dataset,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    packed: bool = False,
    shuffle_buckets: int | None = None,
) -> ray.data.Dataset:
    """Edge table → (u:int32, nbrs:list_<int32>) sorted deduped adjacency,
    hash-partitioned by u (bucket = u % P, the partitioning key every
    downstream stage reuses). With ``packed=True`` the list is emitted as
    an int32-bytes binary column (join-transportable).

    ``shuffle_buckets`` decouples the groupby fan-out from the OUTPUT
    partition count: a vertex's edges only need to share a group, so the
    shuffle runs at >= 64-way parallelism even when the superstep engine
    wants few fat partitions (reducer count == bucket count on this
    path — 8 buckets would idle 24 of 32 cores)."""
    buckets = shuffle_buckets or max(num_partitions, 64)
    bucketed = sym_edges.map_batches(
        lambda t: t.append_column(
            "bucket",
            pa.array(
                t["src"].to_numpy(zero_copy_only=False) % buckets, pa.int32()
            ),
        ),
        batch_format="pyarrow", batch_size=None)
    from graphsetintersection_ray.stages.shuffle import bucket_groups

    fn = _csr_for_bucket_packed if packed else _csr_for_bucket
    return bucket_groups(bucketed, fn, buckets, bucket_col="bucket")


def write_partitioned_csr(
    sym_edges: ray.data.Dataset,
    path: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> str:
    """Build the CSR and persist it as hash-partitioned Parquet
    (``<path>/bucket=p/``). This is the durable graph state the superstep
    engine's PartitionWorkers load once per actor — and the first
    checkpoint of any iterative run (resume skips the whole graph build
    if the CSR directory already exists)."""
    csr = build_csr(sym_edges, num_partitions=num_partitions)
    return write_csr_dataset(csr, path, num_partitions)


def write_csr_dataset(
    csr: ray.data.Dataset,
    path: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> str:
    """Persist an already-built (u, nbrs) CSR dataset as hash-partitioned
    Parquet — lets callers that also consume the CSR in memory (degrees,
    adjacency queries) pay the groupby shuffle once."""
    with_bucket = csr.map_batches(
        lambda t: t.append_column(
            "bucket",
            pa.array(
                t["u"].to_numpy(zero_copy_only=False) % num_partitions, pa.int32()
            ),
        ),
        batch_format="pyarrow", batch_size=None)
    with_bucket.write_parquet(path, partition_cols=["bucket"])
    return path
