"""Query registry: every named pipeline plus its DuckDB oracle SQL.

Each entry in ``QUERIES`` is a callable ``fn(sf_dir) -> Dataset | pa.Table
| pandas.DataFrame``; ``ORACLE_SQL`` holds the ANSI-SQL equivalent the
driver runs on the same parquet tables (views: region nation customer
supplier part orders lineitem events documents embeddings). Column names
match exactly between both sides. Queries whose semantics SQL can't
express (iterative-to-convergence, hashing-based near-dup) have no oracle
entry — the driver records a rows-only check and pytest carries the
oracle (numpy power iteration, union-find, brute force).

Graph-query oracles share one CTE prelude that recomputes the whole
derivation chain (transcripts → string edges → dense vertex ids → int
edges → symmetric edges → degrees) in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from graphsetintersection_ray.sources.transcripts import TRANSCRIPTS_SQL
from graphsetintersection_ray.pipelines.graph import (
    build_graph,
    transcripts_from_sf,
)
from graphsetintersection_ray.pipelines import iterative as it
from graphsetintersection_ray.pipelines.triangle import (
    global_triangle_count,
    per_vertex_triangles,
)
from graphsetintersection_ray.stages import graph_build as gb

PAGERANK_ORACLE_ITERS = 30

# --------------------------------------------------------------------------
# Shared SQL prelude: the full derivation chain (must stay semantically
# identical to sources/transcripts.py + stages/graph_build.py).
# --------------------------------------------------------------------------

GRAPH_PRELUDE = f"""
t AS ({TRANSCRIPTS_SQL}),
actors AS (
  SELECT conv_id, turn_idx, 'a:' || role || ':' || tool AS ak FROM t
),
adjp AS (
  SELECT conv_id, ak,
         lead(ak) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS bk
  FROM actors
),
ctl AS (SELECT DISTINCT conv_id, 't:' || tool AS tk FROM t),
e_all AS (
  SELECT DISTINCT src_key, dst_key FROM (
    SELECT 'c:' || conv_id AS src_key, 't:' || tool AS dst_key FROM t
    UNION
    SELECT 'c:' || conv_id, 'r:' || role FROM t
    UNION
    SELECT least(ak, bk), greatest(ak, bk)
      FROM adjp WHERE bk IS NOT NULL AND ak <> bk
    UNION
    SELECT p.tk, q.tk
      FROM ctl p JOIN ctl q ON p.conv_id = q.conv_id AND p.tk < q.tk
  )
),
verts AS (
  SELECT key, CAST(dense_rank() OVER (ORDER BY key) - 1 AS INTEGER) AS vid
  FROM (
    SELECT DISTINCT src_key AS key FROM e_all
    UNION
    SELECT DISTINCT dst_key FROM e_all
  )
),
edges AS (
  SELECT v1.vid AS src, v2.vid AS dst
  FROM e_all JOIN verts v1 ON v1.key = e_all.src_key
             JOIN verts v2 ON v2.key = e_all.dst_key
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT src AS v, count(*) AS degree FROM sym GROUP BY src),
nv AS (SELECT count(*) AS n FROM verts)
"""


def _with(prelude_and_query: str) -> str:
    q = prelude_and_query.lstrip()
    sep = "" if q.upper().startswith("SELECT") else ", "
    return "WITH " + GRAPH_PRELUDE + sep + prelude_and_query


# --------------------------------------------------------------------------
# Query implementations
# --------------------------------------------------------------------------


def q_transcripts(sf_dir: str):
    return transcripts_from_sf(sf_dir)


def q_edge_table(sf_dir: str):
    return build_graph(sf_dir).edges_str


def q_vertex_encoding(sf_dir: str):
    return build_graph(sf_dir).vertices


def q_edges_int(sf_dir: str):
    return build_graph(sf_dir).edges


def q_degree_table(sf_dir: str):
    return build_graph(sf_dir).degrees


def q_triangle_count(sf_dir: str):
    art = build_graph(sf_dir)
    n = global_triangle_count(art.oriented, num_partitions=art.num_partitions)
    return pa.table({"triangles": pa.array([n], pa.int64())})


def q_triangle_per_vertex(sf_dir: str):
    art = build_graph(sf_dir)
    return per_vertex_triangles(art.oriented, num_partitions=art.num_partitions)


def q_pagerank_fixed(sf_dir: str):
    """Exactly PAGERANK_ORACLE_ITERS power iterations (deterministic,
    SQL-reproducible); scores rounded to 6 decimals for hash-stable
    comparison across summation orders."""
    art = build_graph(sf_dir)
    out, _ = it.pagerank(
        art, max_iters=PAGERANK_ORACLE_ITERS, tol=0.0, resume=False, round_to=6
    )
    return out


def q_pagerank(sf_dir: str):
    """Converged PageRank (tol 1e-6) — the north-rule query; no SQL oracle
    (iteration count is data-dependent), pytest checks vs dense NumPy."""
    art = build_graph(sf_dir)
    out, _ = it.pagerank(art, max_iters=200, tol=1e-6, resume=False)
    return out


def q_connected_components(sf_dir: str):
    art = build_graph(sf_dir)
    out, _ = it.connected_components(art, resume=False)
    return out


def q_label_propagation(sf_dir: str):
    art = build_graph(sf_dir)
    out, _ = it.label_propagation(art, resume=False)
    return out


def q_csr_adjacency(sf_dir: str):
    """CSR rows rendered as (u, nbrs_str) — comma-joined sorted neighbor
    list, a hash-stable encoding of the list column (B4 semantics)."""
    art = build_graph(sf_dir)
    csr = gb.build_csr(art.sym, num_partitions=art.num_partitions)

    def render(t: pa.Table) -> pa.Table:
        lists = t["nbrs"].combine_chunks()
        offs = lists.offsets.to_numpy(zero_copy_only=False)
        flat = lists.values.to_numpy(zero_copy_only=False)
        strs = [
            ",".join(map(str, flat[offs[i]: offs[i + 1]]))
            for i in range(len(offs) - 1)
        ]
        return pa.table({"u": t["u"], "nbrs_str": pa.array(strs, pa.string())})

    return csr.map_batches(render, batch_format="pyarrow")


def q_leaf_count(sf_dir: str):
    """Count of degree-1 vertices (R9, porder.cpp:82-91)."""
    art = build_graph(sf_dir)
    n = art.degrees.filter(expr="degree == 1").count()
    return pa.table({"leaves": pa.array([n], pa.int64())})


def q_degree_order(sf_dir: str):
    """Degree-descending dense renumbering (R6, porder.cpp:445-495):
    (v, new_id) with new_id = rank by (degree desc, v asc)."""
    art = build_graph(sf_dir)
    sorted_deg = art.degrees.sort(["degree", "v"], descending=[True, False])
    out = gb.enumerate_sorted(sorted_deg, ["v"], "new_id")
    return out.map_batches(
        lambda t: pa.table(
            {"v": t["v"].cast(pa.int32()), "new_id": t["new_id"].cast(pa.int32())}
        ),
        batch_format="pyarrow",
    )


def q_bignode_select(sf_dir: str, deg_ratio: float = 0.5):
    """Hub list: smallest set of highest-degree vertices covering
    ``deg_ratio`` of total degree (R8 select_bignode, porder.cpp:353-392;
    = SlashBurn hub extraction porder.cpp:1026-1046). Streams the sorted
    prefix to the driver — only the hubs are pulled."""
    art = build_graph(sf_dir)
    total = art.degrees.sum("degree")
    cutoff = deg_ratio * total
    sorted_deg = art.degrees.sort(["degree", "v"], descending=[True, False])
    vs, ds_ = [], []
    acc = 0.0
    done = False
    for batch in sorted_deg.iter_batches(batch_size=4096, batch_format="pyarrow"):
        v = batch["v"].to_numpy(zero_copy_only=False)
        d = batch["degree"].to_numpy(zero_copy_only=False)
        cums = acc + np.cumsum(d)
        take = int(np.searchsorted(cums - d, cutoff, side="left"))
        vs.append(v[:take])
        ds_.append(d[:take])
        acc = cums[-1] if len(cums) else acc
        if take < len(v):
            done = True
            break
    if not done and not vs:
        return pa.table({"v": pa.array([], pa.int32()),
                         "degree": pa.array([], pa.int64())})
    return pa.table(
        {
            "v": pa.array(np.concatenate(vs).astype(np.int32)),
            "degree": pa.array(np.concatenate(ds_).astype(np.int64)),
        }
    )


# --------------------------------------------------------------------------
# Registry + oracles
# --------------------------------------------------------------------------

QUERIES = {
    "transcripts": q_transcripts,
    "edge_table": q_edge_table,
    "vertex_encoding": q_vertex_encoding,
    "edges_int": q_edges_int,
    "degree_table": q_degree_table,
    "csr_adjacency": q_csr_adjacency,
    "triangle_count": q_triangle_count,
    "triangle_per_vertex": q_triangle_per_vertex,
    "pagerank_fixed": q_pagerank_fixed,
    "pagerank": q_pagerank,
    "connected_components": q_connected_components,
    "label_propagation": q_label_propagation,
    "leaf_count": q_leaf_count,
    "degree_order": q_degree_order,
    "bignode_select": q_bignode_select,
}

ORACLE_SQL = {
    "transcripts": TRANSCRIPTS_SQL,
    "edge_table": _with("SELECT src_key, dst_key FROM e_all"),
    "vertex_encoding": _with("SELECT key, vid FROM verts"),
    "edges_int": _with("SELECT src, dst FROM edges"),
    "degree_table": _with("SELECT v, degree FROM deg"),
    "csr_adjacency": _with(
        "SELECT src AS u, string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) "
        "AS nbrs_str FROM sym GROUP BY src"
    ),
    "triangle_count": _with(
        "SELECT count(*) AS triangles FROM edges e1 "
        "JOIN edges e2 ON e2.src = e1.src AND e2.dst > e1.dst "
        "JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst"
    ),
    "triangle_per_vertex": _with(
        "tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM edges e1 "
        "  JOIN edges e2 ON e2.src = e1.src AND e2.dst > e1.dst "
        "  JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst) "
        "SELECT v, count(*) AS triangles FROM ("
        "  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri "
        "  UNION ALL SELECT c FROM tri) GROUP BY v"
    ),
    "pagerank_fixed": _with(
        f"""pr AS (
  WITH RECURSIVE prr(v, score, it) AS (
    SELECT v, CAST(1.0 AS DOUBLE) / (SELECT n FROM nv), 0 FROM deg
    UNION ALL
    SELECT s.dst,
           CAST(0.15 AS DOUBLE) / (SELECT n FROM nv)
             + CAST(0.85 AS DOUBLE) * sum(p.score / d.degree),
           p.it + 1
    FROM prr p
    JOIN deg d ON d.v = p.v
    JOIN sym s ON s.src = p.v
    WHERE p.it < {PAGERANK_ORACLE_ITERS}
    GROUP BY s.dst, p.it
  )
  SELECT v, score FROM prr WHERE it = {PAGERANK_ORACLE_ITERS}
)
SELECT v, round(score, 6) AS score FROM pr"""
    ),
    "connected_components": _with(
        """reach AS (
  WITH RECURSIVE r(v, w) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT r.v, s.dst FROM r JOIN sym s ON s.src = r.w
  )
  SELECT v, w FROM r
)
SELECT v, CAST(min(w) AS BIGINT) AS component FROM reach GROUP BY v"""
    ),
    "label_propagation": _with(
        """reach AS (
  WITH RECURSIVE r(v, w) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT r.v, s.dst FROM r JOIN sym s ON s.src = r.w
  )
  SELECT v, w FROM r
)
SELECT v, CAST(min(w) AS BIGINT) AS label FROM reach GROUP BY v"""
    ),
    "leaf_count": _with(
        "SELECT count(*) AS leaves FROM deg WHERE degree = 1"
    ),
    "degree_order": _with(
        "SELECT v, CAST(row_number() OVER (ORDER BY degree DESC, v) - 1 "
        "AS INTEGER) AS new_id FROM deg"
    ),
    "bignode_select": _with(
        """ranked AS (
  SELECT v, degree,
         sum(degree) OVER (ORDER BY degree DESC, v
                           ROWS UNBOUNDED PRECEDING) - degree AS before_me
  FROM deg
)
SELECT v, degree FROM ranked
WHERE before_me < 0.5 * (SELECT sum(degree) FROM deg)"""
    ),
}
