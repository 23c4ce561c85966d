"""Label-filtered subgraph matching (reference sm: Q6).

Reference semantics (org_subgraph_match.cpp:72-184): pick the start query
vertex with the rarest label (:99-103), expand partial embeddings level by
level in a DFS join order (:105, :186-197); at each level intersect the
label-candidate list with the adjacency of every already-bound query
neighbor (:138-153), dedup bound vertices (:155-167); report match counts
(sm.cpp:60-77).

Ray design, two gated paths (BROADCAST_MAX_EDGES, env-overridable):
  * small graphs — adjacency + labels broadcast once (ray.put); each
    level is one ``map_batches`` whose whole batch expands in ONE
    vectorized pass (``pairwise_intersect`` over gathered CSR segments —
    no per-row Python loop).
  * at scale — level-wise expansion repartitioned by join vertex: each
    already-bound query neighbor contributes one hash join against the
    packed CSR (adjacency never leaves the cluster), candidate labels are
    checked by a join against the label table, and the per-row
    intersection of fetched lists runs vectorized per batch.

Vertex labels derive from the entity type (the first character of the
vertex key: a/c/r/t → 0..3) so the whole pipeline — including match
counts — is reproducible by the SQL oracle as a multi-way self-join.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from graphsetintersection_ray.functions.kernels import pairwise_intersect
from graphsetintersection_ray.pipelines.graph import GraphArtifacts

LABEL_OF_PREFIX = {"a": 0, "c": 1, "r": 2, "t": 3}

# above this many symmetric edges the broadcast path is refused and the
# join-based expansion runs
BROADCAST_MAX_EDGES = int(
    os.environ.get("GRAFT_SM_BROADCAST_MAX_EDGES", 40_000_000)
)


@dataclass(frozen=True)
class QueryGraph:
    """labels[i] = required label of query vertex i; edges = (i, j) pairs
    (undirected). Vertex 0 is expanded first, then 1, 2, ... — callers
    order vertices so each one is adjacent to an earlier one."""

    labels: tuple
    edges: tuple

    def neighbors_before(self, i: int):
        return [
            (a if b == i else b)
            for (a, b) in self.edges
            if (a == i and b < i) or (b == i and a < i)
        ]


def reorder_connected(labels, edges, start: int = 0) -> QueryGraph:
    """Relabel an arbitrary connected query graph into QueryGraph's
    expansion contract (every vertex adjacent to an earlier one) via BFS
    from ``start``. A pure vertex relabeling: the set of embeddings is
    permuted, so match COUNTS are unchanged."""
    labels = list(labels)
    n = len(labels)
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    order = [start]
    seen = {start}
    qi = 0
    while qi < len(order):
        u = order[qi]
        qi += 1
        for w in sorted(adj[u]):
            if w not in seen:
                seen.add(w)
                order.append(w)
    if len(order) != n:
        raise ValueError(
            f"query graph is disconnected ({len(order)} of {n} vertices "
            "reachable) — the level-expansion matcher needs a connected "
            "pattern"
        )
    pos = {old: new for new, old in enumerate(order)}
    new_edges = tuple(
        sorted(tuple(sorted((pos[a], pos[b]))) for a, b in edges)
    )
    return QueryGraph(
        labels=tuple(labels[old] for old in order), edges=new_edges
    )


def parse_query_file(text: str) -> list[QueryGraph]:
    """Parse the reference's ``.sm.queries`` format (sm.cpp:15-43, S6
    parity): repeated whitespace-separated blocks of
    ``v_num e_num``, then ``v_num`` per-vertex labels, then ``e_num``
    ``u v`` edge pairs (canonicalized u < v, as the reference does).
    Each parsed query is BFS-reordered into the matcher's expansion
    contract — counts are order-invariant."""
    toks = text.split()
    out: list[QueryGraph] = []
    i = 0
    while i < len(toks):
        v_num, e_num = int(toks[i]), int(toks[i + 1])
        i += 2
        labels = [int(t) for t in toks[i : i + v_num]]
        i += v_num
        edges = []
        for _ in range(e_num):
            u, v = int(toks[i]), int(toks[i + 1])
            i += 2
            edges.append((u, v) if u < v else (v, u))
        out.append(reorder_connected(labels, edges))
    return out


def load_query_graphs(path: str) -> dict[str, QueryGraph]:
    """Load user query graphs from a reference-format file; queries are
    named ``q0``, ``q1``, ... in file order (sm.cpp answers them by
    index)."""
    with open(path) as f:
        qs = parse_query_file(f.read())
    return {f"q{i}": q for i, q in enumerate(qs)}


# The reference's query workloads are generated files (gen_queries.py);
# ours are fixed named patterns over the entity-type label alphabet.
# Arbitrary user patterns load via ``load_query_graphs`` (S6 parity).
QUERY_GRAPHS = {
    # conv - tool - conv path: two conversations sharing a tool
    "path_ctc": QueryGraph(labels=(1, 3, 1), edges=((0, 1), (1, 2))),
    # tool triangle: three tools pairwise co-occurring
    "tri_ttt": QueryGraph(labels=(3, 3, 3), edges=((0, 1), (0, 2), (1, 2))),
    # conv with two co-occurring tools (wedge + closing tool-tool edge)
    "tri_ctt": QueryGraph(labels=(1, 3, 3), edges=((0, 1), (0, 2), (1, 2))),
}


def vertex_labels(art: GraphArtifacts) -> ray.data.Dataset:
    """(v, label) — entity-type labels (S5/S10 analog, deterministic)."""

    def lab(t: pa.Table) -> pa.Table:
        keys = t["key"].to_pylist()
        labels = [LABEL_OF_PREFIX[k[0]] for k in keys]
        return pa.table(
            {
                "v": t["vid"].cast(pa.int32()),
                "label": pa.array(labels, pa.int32()),
            }
        )

    return art.vertices.map_batches(lab, batch_format="pyarrow")


def _broadcast_graph(art: GraphArtifacts):
    """ray.put((offsets, flat, labels)) — only legal under the broadcast
    threshold; callers gate on ``2 * art.n_edges <= BROADCAST_MAX_EDGES``."""
    df = art.sym.to_pandas()
    if len(df) != 2 * art.n_edges:
        raise RuntimeError(
            f"sym edge table has {len(df)} rows, expected {2 * art.n_edges}"
        )
    src = df["src"].to_numpy().astype(np.int64)
    dst = df["dst"].to_numpy().astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=art.n_vertices)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    lab_df = vertex_labels(art).to_pandas().drop_duplicates("v")
    if len(lab_df) != art.n_vertices:
        raise RuntimeError(
            f"label table has {len(lab_df)} vertices, expected {art.n_vertices}"
        )
    # scatter by vertex id — robust to row order
    labels = np.zeros(art.n_vertices, np.int64)
    labels[lab_df["v"].to_numpy()] = lab_df["label"].to_numpy()
    return ray.put((offsets, dst, labels))


def _gather_segments(
    offs: np.ndarray, flat: np.ndarray, verts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row CSR segments flat[offs[v]:offs[v+1]] for v in verts →
    (list offsets, concatenated values), fully vectorized."""
    starts = offs[verts]
    lens = offs[verts + 1] - starts
    total = int(lens.sum())
    if total == 0:
        return np.zeros(len(verts) + 1, np.int64), flat[:0]
    idx = (
        np.repeat(starts, lens)
        + np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens)
    )
    return np.concatenate([[0], np.cumsum(lens)]), flat[idx]


def _filter_and_emit(
    rows: np.ndarray,
    vals: np.ndarray,
    bound: dict[str, np.ndarray],
    cols: list[str],
    want_mask: np.ndarray,
    i: int,
) -> pa.Table:
    """Shared tail of a level expansion: label + injectivity filters and
    the output table (all vectorized)."""
    keep = want_mask
    for c in cols:
        keep &= vals != bound[c][rows]
    rows, vals = rows[keep], vals[keep]
    return pa.table(
        {
            **{c: pa.array(bound[c][rows], pa.int64()) for c in cols},
            f"b{i}": pa.array(vals.astype(np.int64), pa.int64()),
        }
    )


def _match_count_broadcast(art: GraphArtifacts, query: QueryGraph) -> int:
    state_ref = _broadcast_graph(art)
    offsets, flat, labels = ray.get(state_ref)

    # level 0: candidates of label[0]. Split into blocks locally (NOT via
    # repartition — that is an AllToAll shuffle stage, pure overhead for a
    # driver-built seed table) so the expansion fans out.
    cands = np.flatnonzero(labels == query.labels[0]).astype(np.int64)
    if len(cands) == 0:
        return 0
    n_blocks = min(32, max(1, len(cands) // 64))
    emb = ray.data.from_arrow(
        [
            pa.table({"b0": pa.array(chunk)})
            for chunk in np.array_split(cands, n_blocks)
        ]
    )

    for i in range(1, len(query.labels)):
        want = query.labels[i]
        before = query.neighbors_before(i)
        cols = [f"b{j}" for j in range(i)]

        def expand(t: pa.Table, _want=want, _before=before, _cols=cols, _i=i):
            offs, fl, lab = ray.get(state_ref)
            n = t.num_rows
            if n == 0:
                return pa.table(
                    {
                        **{c: pa.array([], pa.int64()) for c in _cols},
                        f"b{_i}": pa.array([], pa.int64()),
                    }
                )
            bound = {c: t[c].to_numpy(zero_copy_only=False) for c in _cols}
            # candidates start as the first bound neighbor's CSR segment,
            # then intersect against each further bound neighbor's segment
            # — ONE pairwise_intersect per query edge for the whole batch
            cur_off, vals = _gather_segments(
                offs, fl, bound[f"b{_before[0]}"]
            )
            for j in _before[1:]:
                off_b, vals_b = _gather_segments(offs, fl, bound[f"b{j}"])
                rows, vals = pairwise_intersect(cur_off, vals, off_b, vals_b)
                cnt = np.bincount(rows, minlength=n)
                cur_off = np.concatenate([[0], np.cumsum(cnt)])
            rows = np.repeat(
                np.arange(n, dtype=np.int64), np.diff(cur_off)
            )
            vals = np.asarray(vals, np.int64)
            return _filter_and_emit(
                rows, vals, bound, _cols, lab[vals] == _want, _i
            )

        emb = emb.map_batches(expand, batch_format="pyarrow", batch_size=8192)

    return emb.count()


def _unpack_blob_lists(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """binary int32-bytes column → (list offsets, int64 values)."""
    blobs = col.to_pylist()
    lens = np.fromiter(
        (0 if b is None else len(b) // 4 for b in blobs), np.int64,
        count=len(blobs),
    )
    flat = np.frombuffer(
        b"".join(b for b in blobs if b), dtype="<i4"
    ).astype(np.int64)
    return np.concatenate([[0], np.cumsum(lens)]), flat


def _match_count_join(art: GraphArtifacts, query: QueryGraph) -> int:
    """At-scale path: each level's expansion is one hash join per bound
    query neighbor against the packed CSR (repartitioned by the join
    vertex), plus one join against the label table for the candidate
    filter. The adjacency never lands on the driver."""
    from graphsetintersection_ray.stages.graph_build import (
        build_csr,
        compact_blocks,
    )

    csr = compact_blocks(
        build_csr(art.sym, num_partitions=art.num_partitions, packed=True)
    ).materialize()
    labels = compact_blocks(
        vertex_labels(art).map_batches(
            lambda t: pa.table(
                {"lv": t["v"].cast(pa.int64()), "label": t["label"]}
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    emb = labels.filter(expr=f"label == {int(query.labels[0])}").map_batches(
        lambda t: pa.table({"b0": t["lv"].cast(pa.int64())}),
        batch_format="pyarrow",
    )

    for i in range(1, len(query.labels)):
        want = int(query.labels[i])
        before = query.neighbors_before(i)
        cols = [f"b{j}" for j in range(i)]

        # fetch the packed adjacency of every bound query neighbor
        cur = compact_blocks(emb)
        blob_cols = []
        for bi, j in enumerate(before):
            key = f"__u{bi}"
            blob = f"__nb{bi}"
            right = csr.map_batches(
                lambda t, _key=key, _blob=blob: pa.table(
                    {_key: t["u"].cast(pa.int64()), _blob: t["nbrs_bin"]}
                ),
                batch_format="pyarrow",
            )
            cur = compact_blocks(
                cur.join(
                    right,
                    join_type="inner",
                    num_partitions=art.num_partitions,
                    on=(f"b{j}",),
                    right_on=(key,),
                )
            )
            blob_cols.append(blob)

        def expand(
            t: pa.Table, _cols=cols, _blob_cols=blob_cols, _i=i
        ) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return pa.table(
                    {
                        **{c: pa.array([], pa.int64()) for c in _cols},
                        f"b{_i}": pa.array([], pa.int64()),
                    }
                )
            bound = {c: t[c].to_numpy(zero_copy_only=False) for c in _cols}
            cur_off, vals = _unpack_blob_lists(t[_blob_cols[0]])
            for bc in _blob_cols[1:]:
                off_b, vals_b = _unpack_blob_lists(t[bc])
                rows, vals = pairwise_intersect(cur_off, vals, off_b, vals_b)
                cnt = np.bincount(rows, minlength=n)
                cur_off = np.concatenate([[0], np.cumsum(cnt)])
            rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(cur_off))
            vals = np.asarray(vals, np.int64)
            # injectivity here; the label filter is a join below
            return _filter_and_emit(
                rows, vals, bound, _cols, np.ones(len(vals), bool), _i
            )

        expanded = compact_blocks(
            cur.map_batches(expand, batch_format="pyarrow", batch_size=8192)
        )
        filtered = expanded.join(
            compact_blocks(labels.filter(expr=f"label == {want}")),
            join_type="inner",
            num_partitions=art.num_partitions,
            on=(f"b{i}",),
            right_on=("lv",),
        )
        emb = filtered.map_batches(
            lambda t, _keep=cols + [f"b{i}"]: pa.table(
                {c: t[c].cast(pa.int64()) for c in _keep}
            ),
            batch_format="pyarrow",
        )

    return emb.count()


def match_count(art: GraphArtifacts, query: QueryGraph) -> int:
    """Number of distinct embeddings (injective, label-respecting, every
    query edge present). Counts ordered tuples like the reference
    (org_subgraph_match.cpp counts row embeddings, not automorphism
    classes)."""
    if 2 * art.n_edges <= BROADCAST_MAX_EDGES:
        return _match_count_broadcast(art, query)
    return _match_count_join(art, query)


def match_counts_table(art: GraphArtifacts) -> pa.Table:
    """(query, matches) for every named query graph (= sm.cpp's
    per-query `ansK=N` output)."""
    names = sorted(QUERY_GRAPHS)
    counts = [match_count(art, QUERY_GRAPHS[n]) for n in names]
    return pa.table(
        {
            "query": pa.array(names, pa.string()),
            "matches": pa.array(counts, pa.int64()),
        }
    )
