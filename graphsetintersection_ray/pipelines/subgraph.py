"""Label-filtered subgraph matching (reference sm: Q6).

Reference semantics (org_subgraph_match.cpp:72-184): pick the start query
vertex with the rarest label (:99-103), expand partial embeddings level by
level in a DFS join order (:105, :186-197); at each level intersect the
label-candidate list with the adjacency of every already-bound query
neighbor (:138-153), dedup bound vertices (:155-167); report match counts
(sm.cpp:60-77).

Ray design: embeddings are a Dataset that grows one query-vertex per
level; each expansion is a ``map_batches`` against the broadcast adjacency
and label index (both ray.put once). Vertex labels derive from the entity
type (the first character of the vertex key: a/c/r/t → 0..3) so the whole
pipeline — including match counts — is reproducible by the SQL oracle as a
multi-way self-join.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphsetintersection_ray.functions.kernels import intersect_sorted
from graphsetintersection_ray.pipelines.graph import GraphArtifacts

LABEL_OF_PREFIX = {"a": 0, "c": 1, "r": 2, "t": 3}


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


# The reference's query workloads are generated files (gen_queries.py);
# ours are fixed named patterns over the entity-type label alphabet.
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
    df = art.sym.to_pandas()
    src = df["src"].to_numpy().astype(np.int64)
    dst = df["dst"].to_numpy().astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=art.n_vertices)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    lab_df = vertex_labels(art).to_pandas().sort_values("v")
    labels = lab_df["label"].to_numpy().astype(np.int64)
    return ray.put((offsets, dst, labels))


def match_count(art: GraphArtifacts, query: QueryGraph) -> int:
    """Number of distinct embeddings (injective, label-respecting, every
    query edge present). Counts ordered tuples like the reference
    (org_subgraph_match.cpp counts row embeddings, not automorphism
    classes)."""
    state_ref = _broadcast_graph(art)
    offsets, flat, labels = ray.get(state_ref)

    # level 0: candidates of label[0]
    cands = np.flatnonzero(labels == query.labels[0]).astype(np.int64)
    if len(cands) == 0:
        return 0
    emb = ray.data.from_arrow(
        pa.table({"b0": pa.array(cands)})
    ).repartition(32)

    for i in range(1, len(query.labels)):
        want = query.labels[i]
        before = query.neighbors_before(i)
        cols = [f"b{j}" for j in range(i)]

        def expand(t: pa.Table, _want=want, _before=before, _cols=cols, _i=i):
            offs, fl, lab = ray.get(state_ref)
            bound = {c: t[c].to_numpy(zero_copy_only=False) for c in _cols}
            n = t.num_rows
            out = {c: [] for c in _cols}
            out_new = []
            for r in range(n):
                cand = None
                for j in _before:
                    nb = fl[offs[bound[f"b{j}"][r]]: offs[bound[f"b{j}"][r] + 1]]
                    cand = nb if cand is None else intersect_sorted(cand, nb)
                    if len(cand) == 0:
                        break
                if cand is None or len(cand) == 0:
                    continue
                cand = cand[lab[cand] == _want]
                # injectivity: drop already-bound vertices
                used = np.array([bound[c][r] for c in _cols], np.int64)
                cand = np.setdiff1d(cand, used, assume_unique=False)
                if len(cand) == 0:
                    continue
                for c in _cols:
                    out[c].append(np.full(len(cand), bound[c][r], np.int64))
                out_new.append(cand.astype(np.int64))
            if not out_new:
                return pa.table(
                    {
                        **{c: pa.array([], pa.int64()) for c in _cols},
                        f"b{_i}": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    **{
                        c: pa.array(np.concatenate(out[c]), pa.int64())
                        for c in _cols
                    },
                    f"b{_i}": pa.array(np.concatenate(out_new), pa.int64()),
                }
            )

        emb = emb.map_batches(expand, batch_format="pyarrow", batch_size=8192)

    return emb.count()


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
