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
    global_four_clique_count,
    global_triangle_count,
    per_vertex_triangles,
)
from graphsetintersection_ray.functions.kernels import round_half_away
from graphsetintersection_ray.stages import graph_build as gb
from graphsetintersection_ray.stages.text import (
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
)

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


# deterministic per-vertex random walk (must match pipelines/walks.py:
# same hash constants, dst-sorted adjacency, dead ends stay in place)
_WALK_SQL = """adjidx AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
         count(*) OVER (PARTITION BY src) AS deg_n
  FROM sym
),
walk AS (
  WITH RECURSIVE w(walk_id, pos, v) AS (
    SELECT vid, 0, vid FROM verts
    UNION ALL
    SELECT w.walk_id, w.pos + 1, CAST(coalesce(a.dst, w.v) AS INTEGER)
    FROM w LEFT JOIN adjidx a
      ON a.src = w.v
     AND a.idx = (CAST(w.walk_id AS BIGINT) * 1103
                  + w.pos * 12347 + 7) % a.deg_n
    WHERE w.pos < 7
  )
  SELECT * FROM w
)"""


def _with(prelude_and_query: str) -> str:
    q = prelude_and_query.lstrip()
    sep = "" if q.upper().startswith("SELECT") else ", "
    return "WITH " + GRAPH_PRELUDE + sep + prelude_and_query


# The same graph prelude over ONLY the first half of event time: t is
# filtered at the integer-microsecond midpoint lo + (hi - lo) // 2 of the
# global [min(ts), max(ts)] — mirrored exactly by the engine's
# q_temporal_pagerank cutoff arithmetic.
_TEMPORAL_PRELUDE = GRAPH_PRELUDE.replace(
    f"t AS ({TRANSCRIPTS_SQL}),",
    f"""t0 AS ({TRANSCRIPTS_SQL}),
mm AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM t0),
t AS (
  SELECT t0.* FROM t0, mm
  WHERE epoch_us(t0.ts) < mm.lo + (mm.hi - mm.lo) // 2
),""",
    1,
)
assert _TEMPORAL_PRELUDE != GRAPH_PRELUDE


def _with_temporal(prelude_and_query: str) -> str:
    q = prelude_and_query.lstrip()
    sep = "" if q.upper().startswith("SELECT") else ", "
    return "WITH " + _TEMPORAL_PRELUDE + sep + prelude_and_query


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
    n = global_triangle_count(art.oriented, num_partitions=art.num_partitions, n_vertices=art.n_vertices, n_edges=art.n_edges)
    return pa.table({"triangles": pa.array([n], pa.int64())})


def q_approx_triangles(sf_dir: str):
    """(triangles_est, sampled_triangles, sampled_edges): DOULION
    approximate triangle count (Tsourakakis et al., KDD'09) — sparsify
    the oriented edge set by a VALUE-DEFINED splitmix64 edge-key draw
    (keep probability 1/4, partitioning-independent and exactly
    replayable), run the exact distributed TC kernel on the sample,
    scale by p^-3. Semantic oracle: exact replay of the sampled edge
    set + exact triangle count on it + recorded relative error vs the
    true count. The scale path when even the oriented pass is too much:
    1/p^3 variance is documented in the paper; p is a parameter."""
    from graphsetintersection_ray.functions.hll import splitmix64
    from graphsetintersection_ray.stages.graph_build import orient_by_degree
    from graphsetintersection_ray.stages.shuffle import sum_by

    art = build_graph(sf_dir)
    p_inv = 4
    nv = np.int64(art.n_vertices)

    def sample(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (src * nv + dst).astype(np.uint64)
        keep = (splitmix64(key) % np.uint64(p_inv)) == 0
        return t.filter(pa.array(keep))

    # sample the CANONICAL (src < dst) edge set, then re-orient by the
    # SAMPLED graph's own degrees — the TC kernel re-ranks vertices by
    # the degrees of the edge set it is handed, so the full graph's
    # orientation would break its src<dst-after-relabel invariant
    sampled = art.edges.map_batches(
        sample, batch_format="pyarrow"
    ).materialize()
    n_kept = sampled.count()

    def endpoint_ones(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int32)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int32)
        return pa.table(
            {
                "v": pa.array(np.concatenate([src, dst])),
                "one": pa.array(
                    np.ones(2 * len(src), np.int64)
                ),
            }
        )

    sdegs = sum_by(
        sampled.map_batches(endpoint_ones, batch_format="pyarrow"),
        ["v"],
        "one",
        out_col="degree",
    )
    soriented = orient_by_degree(
        sampled, sdegs, num_partitions=art.num_partitions,
        n_vertices=art.n_vertices,
    )
    tri = global_triangle_count(
        soriented,
        num_partitions=art.num_partitions,
        n_vertices=art.n_vertices,
        n_edges=max(n_kept, 1),
    )
    return pa.table(
        {
            "triangles_est": pa.array([tri * p_inv**3], pa.int64()),
            "sampled_triangles": pa.array([tri], pa.int64()),
            "sampled_edges": pa.array([n_kept], pa.int64()),
        }
    )


def q_triangle_per_vertex(sf_dir: str):
    art = build_graph(sf_dir)
    return per_vertex_triangles(art.oriented, num_partitions=art.num_partitions, n_vertices=art.n_vertices, n_edges=art.n_edges)


def q_edge_support(sf_dir: str):
    """Per-edge triangle support |N(u) ∩ N(v)| — the k-truss support
    function; zero-support edges included."""
    from graphsetintersection_ray.pipelines.linkpred import edge_support

    return edge_support(build_graph(sf_dir))


def q_link_scores(sf_dir: str):
    """Common-neighbor / Jaccard / Adamic-Adar link-prediction scores per
    canonical edge (floats rounded half-away at 6 decimals)."""
    from graphsetintersection_ray.pipelines.linkpred import link_scores

    return link_scores(build_graph(sf_dir))


def q_degree_hist(sf_dir: str):
    """(degree, cnt): the degree distribution — one bucketed count over
    the degree table."""
    from graphsetintersection_ray.stages.shuffle import counted_groups

    art = build_graph(sf_dir)
    return counted_groups(art.degrees, ["degree"], count_col="cnt").map_batches(
        lambda t: pa.table(
            {
                "degree": t["degree"].cast(pa.int64()),
                "cnt": t["cnt"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_assortativity(sf_dir: str):
    """Degree assortativity (Pearson correlation of endpoint degrees over
    all directed edges of the symmetric table) — five exact integer sums
    reduced per batch, one float expression at the end (round-6 parity
    with the SQL oracle's HUGEINT sums)."""
    import math

    import ray as _ray

    art = build_graph(sf_dir)
    if art.n_vertices <= gb.BROADCAST_MAX_VERTICES:
        ddf = art.degrees.to_pandas()
        deg_vec = np.zeros(art.n_vertices, np.int64)
        deg_vec[ddf["v"].to_numpy()] = ddf["degree"].to_numpy()
        ref = _ray.put(deg_vec)

        def partial(t: pa.Table) -> pa.Table:
            dv = _ray.get(ref)
            x = dv[t["src"].to_numpy(zero_copy_only=False).astype(np.int64)]
            y = dv[t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]
            return pa.table(
                {
                    "m": pa.array([len(x)], pa.int64()),
                    "sx": pa.array([int(x.sum())], pa.int64()),
                    "sy": pa.array([int(y.sum())], pa.int64()),
                    "sxy": pa.array([int((x * y).sum())], pa.int64()),
                    "sxx": pa.array([int((x * x).sum())], pa.int64()),
                    "syy": pa.array([int((y * y).sum())], pa.int64()),
                }
            )

        sums = art.sym.map_batches(partial, batch_format="pyarrow")
    else:
        # at-scale: attach degrees via the two projected hash joins
        # (orient_by_degree pattern) and reduce the same integer sums
        j1 = art.sym.join(
            art.degrees, join_type="inner",
            num_partitions=art.num_partitions, on=("src",), right_on=("v",),
        ).map_batches(
            lambda t: pa.table(
                {"dst": t["dst"], "deg_src": t["degree"]}
            ),
            batch_format="pyarrow",
        )
        j2 = j1.join(
            art.degrees, join_type="inner",
            num_partitions=art.num_partitions, on=("dst",), right_on=("v",),
        )

        def partial_j(t: pa.Table) -> pa.Table:
            x = t["deg_src"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "m": pa.array([len(x)], pa.int64()),
                    "sx": pa.array([int(x.sum())], pa.int64()),
                    "sy": pa.array([int(y.sum())], pa.int64()),
                    "sxy": pa.array([int((x * y).sum())], pa.int64()),
                    "sxx": pa.array([int((x * x).sum())], pa.int64()),
                    "syy": pa.array([int((y * y).sum())], pa.int64()),
                }
            )

        sums = j2.map_batches(partial_j, batch_format="pyarrow")

    sdf = sums.to_pandas()  # O(#batches) rows — a scalar reduce
    m = int(sdf["m"].sum())
    sx, sy = int(sdf["sx"].sum()), int(sdf["sy"].sum())
    sxy = int(sdf["sxy"].sum())
    sxx, syy = int(sdf["sxx"].sum()), int(sdf["syy"].sum())
    num = float(m * sxy - sx * sy)
    den = math.sqrt(float((m * sxx - sx * sx)) * float((m * syy - sy * sy)))
    r = num / den if den else 0.0
    return pa.table(
        {"assortativity": pa.array([float(round_half_away(r, 6))], pa.float64())}
    )


def q_random_walks(sf_dir: str):
    """(walk_id, pos, v): one deterministic 8-step random walk per
    vertex — hash-chosen neighbor at each step, exactly replayable
    (recursive-CTE SQL oracle). The corpus-generation input of
    node2vec-style graph embedding training."""
    from graphsetintersection_ray.pipelines.walks import random_walks

    art = build_graph(sf_dir)
    return random_walks(art, walk_len=8, seed=7)


def q_skipgram_pairs(sf_dir: str):
    """(center, context, n): skip-gram window-2 co-occurrence counts over
    the walk corpus — the node2vec trainer input pair table."""
    from graphsetintersection_ray.pipelines.walks import (
        random_walks,
        skipgram_pairs,
    )

    art = build_graph(sf_dir)
    return skipgram_pairs(random_walks(art, walk_len=8, seed=7), window=2)


def q_betweenness(sf_dir: str):
    """(v, bc): EXACT betweenness centrality (all sources; undirected
    pair-counted-once convention, rounded 6) — sampled-source Brandes
    parallel over sources."""
    from graphsetintersection_ray.pipelines.centrality import betweenness

    art = build_graph(sf_dir)
    return betweenness(art)


def q_closeness(sf_dir: str):
    """(v, closeness): EXACT closeness centrality (reach−1)/Σdist,
    source-parallel BFS accumulation."""
    from graphsetintersection_ray.pipelines.centrality import closeness

    art = build_graph(sf_dir)
    return closeness(art)


def q_harmonic(sf_dir: str):
    """(v, harmonic): EXACT harmonic centrality Σ 1/dist over reachable
    peers — integer per-distance counts through the shuffle, one
    value-ordered float series per vertex in the reduce."""
    from graphsetintersection_ray.pipelines.centrality import harmonic

    art = build_graph(sf_dir)
    return harmonic(art)


def q_clustering_coeff(sf_dir: str):
    """(v, lcc): local clustering coefficient 2·T(v)/(deg·(deg−1)) for
    every vertex (0.0 below degree 2), rounded half-away at 6 decimals —
    the per-vertex normalization of the triangle counters."""
    from graphsetintersection_ray.stages.graph_build import compact_blocks

    art = build_graph(sf_dir)
    tri_pv = per_vertex_triangles(
        art.oriented, num_partitions=art.num_partitions,
        n_vertices=art.n_vertices, n_edges=art.n_edges,
    )
    joined = compact_blocks(art.degrees).join(
        compact_blocks(tri_pv),
        join_type="left_outer",
        num_partitions=art.num_partitions,
        on=("v",),
    )

    def finish(t: pa.Table):
        import numpy as np

        deg = t["degree"].to_numpy(zero_copy_only=False).astype(np.float64)
        tri_n = t["triangles"].to_numpy(zero_copy_only=False).astype(np.float64)
        tri_n = np.where(np.isnan(tri_n), 0.0, tri_n)
        denom = deg * (deg - 1.0)
        lcc = np.where(deg >= 2, (2.0 * tri_n) / np.where(denom == 0, 1.0, denom), 0.0)
        return pa.table(
            {
                "v": t["v"].cast(pa.int32()),
                "lcc": pa.array(round_half_away(lcc, 6), pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_link_candidates(sf_dir: str):
    """Top-50 non-adjacent vertex pairs by common-neighbor count (open
    wedges), deterministic order (cn desc, u asc, v asc)."""
    from graphsetintersection_ray.pipelines.linkpred import link_candidates

    return link_candidates(build_graph(sf_dir), topn=50)


def q_two_hop_counts(sf_dir: str):
    """Distinct 2-hop neighborhood size per vertex (self excluded) — the
    union kernel (K9) as a distributed query."""
    from graphsetintersection_ray.pipelines.linkpred import two_hop_counts

    return two_hop_counts(build_graph(sf_dir))


def q_coreness(sf_dir: str):
    """k-core decomposition (level-batched distributed peel; semantic
    oracle = independent sequential Matula-Beck replay)."""
    from graphsetintersection_ray.pipelines.cliques import coreness

    return coreness(build_graph(sf_dir))


def q_trussness(sf_dir: str):
    """k-truss decomposition (iterative distributed support peel;
    semantic oracle = textbook one-edge-at-a-time replay)."""
    from graphsetintersection_ray.pipelines.linkpred import trussness

    return trussness(build_graph(sf_dir))


def q_pagerank_fixed(sf_dir: str):
    """Exactly PAGERANK_ORACLE_ITERS power iterations (deterministic,
    SQL-reproducible); scores rounded to 6 decimals for hash-stable
    comparison across summation orders."""
    art = build_graph(sf_dir)
    out, _ = it.pagerank(
        art, max_iters=PAGERANK_ORACLE_ITERS, tol=0.0, resume=False, round_to=6
    )
    return out


_TEMPORAL_ART_CACHE: dict = {}


def _temporal_snapshot_art(sf_dir: str):
    """Graph artifacts for the TEMPORAL SNAPSHOT — the edge set derived
    from only the first half of event time (cutoff = integer-microsecond
    midpoint lo + (hi - lo) // 2 of the global ts range, mirrored
    exactly by the SQL oracles' epoch_us arithmetic). Windowed
    transcript filter → the SAME edge derivation, vertex encoding and
    CSR build as the full corpus; the ARTIFACTS are cached per sf_dir,
    so the temporal query family pays the transcript derivation,
    min/max scan and snapshot build exactly once. At 10^12 turns the
    window filter is a map-only pass before the build — snapshots cost
    one graph build each, nothing engine-side changes."""
    if sf_dir in _TEMPORAL_ART_CACHE:
        return _TEMPORAL_ART_CACHE[sf_dir]
    from graphsetintersection_ray.pipelines.graph import (
        build_graph_from_transcripts,
        transcripts_from_sf,
    )

    tr = transcripts_from_sf(sf_dir).materialize()

    def mm(t: pa.Table) -> pa.Table:
        ts = (
            t["ts"]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(ts) == 0:
            return pa.table(
                {
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                }
            )
        return pa.table({"lo": [int(ts.min())], "hi": [int(ts.max())]})

    parts = tr.map_batches(mm, batch_format="pyarrow").to_pandas()
    lo, hi = int(parts["lo"].min()), int(parts["hi"].max())
    cutoff = lo + (hi - lo) // 2

    def filt(t: pa.Table) -> pa.Table:
        ts = (
            t["ts"]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return t.filter(pa.array(ts < cutoff))

    half = tr.map_batches(filt, batch_format="pyarrow")
    art = build_graph_from_transcripts(
        half, cache_key=f"temporal:{sf_dir}:{cutoff}"
    )
    _TEMPORAL_ART_CACHE[sf_dir] = art
    return art


def q_temporal_pagerank(sf_dir: str):
    """(v, score): fixed-iteration PageRank over the first-half-of-time
    snapshot graph (see _temporal_snapshot_art); exact recursive-CTE
    SQL oracle over the identically windowed prelude."""
    art = _temporal_snapshot_art(sf_dir)
    out, _ = it.pagerank(
        art, max_iters=PAGERANK_ORACLE_ITERS, tol=0.0, resume=False,
        round_to=6,
    )
    return out


def q_temporal_triangles(sf_dir: str):
    """(triangles,): exact triangle count of the first-half-of-time
    snapshot graph — the structural-drift readout (how much closure the
    early corpus already has); same shared snapshot artifacts and TC
    kernel as the full-corpus count."""
    art = _temporal_snapshot_art(sf_dir)
    n = global_triangle_count(
        art.oriented,
        num_partitions=art.num_partitions,
        n_vertices=art.n_vertices,
        n_edges=art.n_edges,
    )
    return pa.table({"triangles": pa.array([n], pa.int64())})


def q_temporal_cc(sf_dir: str):
    """(v, component): connected components of the first-half-of-time
    snapshot graph — min-label BSP fixpoint on the shared snapshot
    artifacts; exact recursive-closure SQL oracle."""
    art = _temporal_snapshot_art(sf_dir)
    out, _ = it.connected_components(art, resume=False)
    return out


def q_pagerank(sf_dir: str):
    """Converged PageRank (tol 1e-6) — the north-rule query; no SQL oracle
    (iteration count is data-dependent), pytest checks vs dense NumPy."""
    art = build_graph(sf_dir)
    out, _ = it.pagerank(art, max_iters=200, tol=1e-6, resume=False)
    return out


KATZ_ORACLE_ITERS = 8


def q_katz_fixed(sf_dir: str):
    """(v, katz): truncated Katz centrality — exactly KATZ_ORACLE_ITERS
    affine supersteps x <- 1 + alpha*S.x from x = 0 (alpha = 2^-7,
    dyadic, so every series term is an exact binary float), rounded at 6.
    Exact recursive-CTE SQL oracle."""
    art = build_graph(sf_dir)
    out, _ = it.katz(
        art, iters=KATZ_ORACLE_ITERS, resume=False, round_to=6
    )
    return out


PPR_SOURCE = 0  # deterministic seed vertex for the oracle query


def q_ppr_fixed(sf_dir: str):
    """Personalized PageRank from vertex PPR_SOURCE, exactly
    PAGERANK_ORACLE_ITERS iterations (SQL-reproducible), rounded at 6."""
    art = build_graph(sf_dir)
    out, _ = it.personalized_pagerank(
        art, source=PPR_SOURCE, max_iters=PAGERANK_ORACLE_ITERS,
        tol=0.0, resume=False, round_to=6,
    )
    return out


HITS_ORACLE_ITERS = 6


EIGEN_MULTIPLIES = 8


def q_eigenvector(sf_dir: str):
    """(v, eig): eigenvector centrality — 8 unnormalized symmetric
    power iterations from x = 1 + one final global L2 normalization
    (linear updates make that exact), so the SQL oracle is an exact
    chained-CTE replay. Unnormalized values stay integer-valued, so
    the distributed sum order cannot perturb them."""
    art = build_graph(sf_dir)
    res, _ = it.eigenvector(art, multiplies=EIGEN_MULTIPLIES, round_to=6)
    return res


def _eigen_oracle_sql(k: int) -> str:
    """Chained-CTE replay of k symmetric multiplies + L2 normalization
    (MATERIALIZED for the same CTE-inlining reason as _hits_oracle_sql)."""
    parts = ["x0 AS (SELECT v, CAST(1.0 AS DOUBLE) AS x FROM deg)"]
    for i in range(1, k + 1):
        parts.append(
            f"x{i} AS (SELECT d.v, coalesce(s.x, 0.0) AS x FROM deg d "
            f"LEFT JOIN (SELECT s.src AS v, sum(p.x) AS x FROM sym s "
            f"JOIN x{i - 1} p ON p.v = s.dst GROUP BY s.src) s ON s.v = d.v)"
        )
    parts.append(f"nrm AS (SELECT sqrt(sum(x*x)) AS nx FROM x{k})")
    import re

    sql = _with(
        ", ".join(parts)
        + f" SELECT v, round(x / nx, 6) AS eig FROM x{k}, nrm"
    )
    return re.sub(r"(\w+ AS) \(", r"\1 MATERIALIZED (", sql)


def q_hits(sf_dir: str):
    """HITS hubs/authorities on the canonical directed edge set: 6 full
    unnormalized power iterations + one final global L2 normalization
    (linear updates make that exactly equal to per-iteration
    normalization), so the SQL oracle is an exact chained-CTE replay."""
    art = build_graph(sf_dir)
    res, _ = it.hits(art, iters=HITS_ORACLE_ITERS, round_to=6)
    return res


def q_pagerank_weighted(sf_dir: str):
    """(v, score): alpha-weighted PageRank — edge weight α_u·α_v with
    α = √degree, 5 fixed iterations from x = 1/n. The weighting
    collapses to an unweighted neighbor sum of x/S on the existing BSP
    engine (one α-sum pre-pass); exact recursive-CTE SQL oracle."""
    art = build_graph(sf_dir)
    res, _ = it.weighted_pagerank(art, iters=it.WPR_ITERS, round_to=6)
    return res


def q_topo_levels(sf_dir: str):
    """Longest-path DAG levels (dependency/scheduling depth) on the
    canonical directed edge set: level[v] = longest directed path ending
    at v, via a monotone MAX-label superstep fixpoint. Exact
    recursive-CTE SQL oracle."""
    art = build_graph(sf_dir)
    res, _ = it.topo_levels(art)
    return res


def q_tool_flow_scc(sf_dir: str):
    """(node, scc): strongly connected components of the per-conversation
    tool-flow digraph (node = '<conv>:<tool>', edge = consecutive-turn
    tool transition — genuinely cyclic, unlike the canonical DAG
    encoding). scc = lexicographically minimal member key. Distributed
    forward/backward min-label peel on a partitioned directed-CSR pair
    (pipelines/flowgraph.py); exact SQL oracle via mutual reachability
    over the recursive closure."""
    from graphsetintersection_ray.pipelines import flowgraph

    art = flowgraph.build_flow_graph(sf_dir)
    res, _ = flowgraph.scc(art)
    return res


def q_tool_transitions(sf_dir: str):
    """(src_tool, dst_tool, n): the corpus's tool-transition Markov
    matrix — counts of consecutive-turn tool pairs within conversations
    (self-transitions included). Conv-bucketed shuffle with per-bucket
    partial counts; exact SQL oracle via a lead() window."""
    from graphsetintersection_ray.pipelines import flowgraph

    return flowgraph.tool_transitions(transcripts_from_sf(sf_dir))


def q_densest_subgraph(sf_dir: str):
    """(best_density, n_vertices, n_edges, peel_level): greedy densest
    subgraph — the best-density suffix of the level-batched degeneracy
    cascade (Charikar's 2-approximation). Deterministic; semantic oracle
    replays the exact cascade independently over the edge table."""
    from graphsetintersection_ray.pipelines.cliques import densest_subgraph

    return densest_subgraph(build_graph(sf_dir))


def q_mis_luby(sf_dir: str):
    """(v, in_mis): maximal independent set via Luby's algorithm —
    deterministic seeded splitmix64 round priorities on the symmetric
    adjacency, two combiner exchanges per round, O(log n) rounds. No SQL
    oracle (the round structure is not relational); the semantic check
    verifies independence + maximality against the edge table AND replays
    the exact run driver-side (same hash, same rounds)."""
    art = build_graph(sf_dir)
    res, _ = it.mis(art)
    return res


def q_graph_coloring(sf_dir: str):
    """(v, color): greedy coloring by iterated Luby-MIS layers — proper
    by construction (adjacent vertices never share a layer's MIS),
    deterministic via layer-salted splitmix64 priorities. No SQL oracle
    (iterative round structure); the semantic check verifies properness
    on every edge, per-layer MIS maximality, and an exact driver-side
    replay."""
    art = build_graph(sf_dir)
    res, _ = it.greedy_coloring(art)
    return res


def q_scc_sizes(sf_dir: str):
    """(size, n_sccs): size distribution of the tool-flow SCCs (how many
    recurrent tool-loop cores of each size the corpus has). One
    pre-aggregated count shuffle over the SCC assignment."""
    from graphsetintersection_ray.pipelines import flowgraph
    from graphsetintersection_ray.stages.shuffle import counted_groups

    art = flowgraph.build_flow_graph(sf_dir)
    res, _ = flowgraph.scc(art)
    ds = res if isinstance(res, rd.Dataset) else rd.from_arrow(res)
    per_scc = counted_groups(ds, ["scc"], count_col="size")
    return counted_groups(
        per_scc.map_batches(
            lambda t: pa.table({"size": t["size"].cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        ["size"],
        count_col="n_sccs",
    ).map_batches(
        lambda t: pa.table(
            {
                "size": t["size"].cast(pa.int64()),
                "n_sccs": t["n_sccs"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_tool_pmi(sf_dir: str):
    """(tool_a, tool_b, n_uv, pmi): pointwise mutual information between
    tool pairs co-occurring in a conversation (collocation strength of
    the E4 relation). Exact SQL oracle."""
    from graphsetintersection_ray.pipelines.flowgraph import tool_pmi

    return tool_pmi(transcripts_from_sf(sf_dir))


def q_conv_flatten(sf_dir: str):
    """(conv_id, n_turns, n_user_turns, n_tools, n_chars, conv_text):
    the per-conversation chat render — turns ordered by turn_idx as
    'role: text' joined by newline, text preserved byte-for-byte (the
    input_hint's per-turn text-equality invariant as a product operator:
    what a training pipeline feeds the tokenizer). One conv-bucketed
    shuffle, Arrow-vectorized join inside (stages/conversations.py)."""
    from graphsetintersection_ray.stages.conversations import conv_flatten

    return conv_flatten(transcripts_from_sf(sf_dir))


def q_conv_dedup(sf_dir: str):
    """(conv_id, canonical_conv, group_size): structural conversation
    dedup — identical (role:tool) turn sequences form a group, canonical
    = min conv_id (the survivor a training pipeline keeps). Signature
    build + signature-keyed group shuffle; exact window-function SQL
    oracle."""
    from graphsetintersection_ray.stages.conversations import conv_dedup

    return conv_dedup(transcripts_from_sf(sf_dir))


CONV_PACK_SEQ_LEN = 8192


def q_pack_stats(sf_dir: str):
    """(pack_id, n_convs, used_chars, fill_ratio): packing-efficiency
    readout over conv_pack's 8192-char windows — used_chars counts only
    the portion of each conversation landing inside its starting window
    (a conversation longer than the remainder spills into later windows,
    which is exactly the waste this readout surfaces). One tiny
    per-pack count shuffle over the pack schedule."""
    from graphsetintersection_ray.stages.conversations import conv_pack
    from graphsetintersection_ray.stages.shuffle import sum_by

    sched = conv_pack(transcripts_from_sf(sf_dir), seq_len=CONV_PACK_SEQ_LEN)

    def partial(t: pa.Table) -> pa.Table:
        start = t["start_offset"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        pid = t["pack_id"].to_numpy(zero_copy_only=False)
        window_end = (pid + 1) * CONV_PACK_SEQ_LEN
        used = np.minimum(start + nch, window_end) - start
        return pa.table(
            {
                "pack_id": pa.array(pid.astype(np.int64)),
                "n_convs": pa.array(np.ones(len(pid), np.int64)),
                "used_chars": pa.array(used.astype(np.int64)),
            }
        )

    summed = sum_by(
        sched.map_batches(partial, batch_format="pyarrow"),
        ["pack_id"],
        ["n_convs", "used_chars"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        used = t["used_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pack_id": t["pack_id"].cast(pa.int64()),
                "n_convs": t["n_convs"].cast(pa.int64()),
                "used_chars": pa.array(used),
                "fill_ratio": pa.array(
                    round_half_away(used / CONV_PACK_SEQ_LEN, 6), pa.float64()
                ),
            }
        )

    return summed.map_batches(finalize, batch_format="pyarrow")


def q_role_alternation(sf_dir: str):
    """(conv_id, n_turns, n_same_role_adj): transcript QC — adjacent
    turn pairs sharing a role per conversation (0 for a strict
    user/assistant dialogue). Exact lag()-window SQL oracle."""
    from graphsetintersection_ray.stages.conversations import role_alternation

    return role_alternation(transcripts_from_sf(sf_dir))


def q_conv_near_dups(sf_dir: str):
    """(conv_a, conv_b, jaccard): CONVERSATION-level near-duplicate
    pairs — word-3-shingle Jaccard >= 0.2 over the chat-template render
    (conv_flatten's conv_text), the transcript-native complement of the
    document near-dedup family. Composition: render -> dense-rank conv
    keys (the S9 vertex encoding, rank order == lexicographic order) ->
    the SAME distributed jaccard shuffle as jaccard_pairs -> keys joined
    back, so conv_a < conv_b lexicographically. Exact SQL oracle over
    the identically rendered prelude."""
    from graphsetintersection_ray.pipelines.graph import transcripts_from_sf
    from graphsetintersection_ray.stages import graph_build as gb
    from graphsetintersection_ray.stages.conversations import conv_flatten
    from graphsetintersection_ray.stages.dedup import jaccard_pairs
    from graphsetintersection_ray.stages.graph_build import compact_blocks

    tr = transcripts_from_sf(sf_dir)
    cf = conv_flatten(tr).select_columns(["conv_id", "conv_text"])

    keys = cf.map_batches(
        lambda t: pa.table({"src_key": t["conv_id"], "dst_key": t["conv_id"]}),
        batch_format="pyarrow",
    )
    verts = gb.encode_vertices(keys).materialize()

    docs = compact_blocks(cf).join(
        compact_blocks(verts),
        join_type="inner",
        num_partitions=8,
        on=("conv_id",),
        right_on=("key",),
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["vid"].cast(pa.int64()),
                "text": t["conv_text"],
            }
        ),
        batch_format="pyarrow",
    )
    pairs = jaccard_pairs(docs, threshold=0.2, max_df=None).materialize()
    if pairs.count() == 0:
        # a typed pa.Table, not rd.from_arrow: Ray drops the schema of an
        # all-empty dataset on to_pandas, losing the column names
        return pa.schema(
            [
                pa.field("conv_a", pa.string()),
                pa.field("conv_b", pa.string()),
                pa.field("jaccard", pa.float64()),
            ]
        ).empty_table()

    back = verts.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"].cast(pa.int64()), "key": t["key"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    j1 = compact_blocks(pairs).join(
        compact_blocks(back), join_type="inner", num_partitions=8,
        on=("doc_a",), right_on=("vid",),
    ).map_batches(
        lambda t: pa.table(
            {
                "conv_a": t["key"],
                "doc_b": t["doc_b"],
                "jaccard": t["jaccard"],
            }
        ),
        batch_format="pyarrow",
    )
    return compact_blocks(j1).join(
        compact_blocks(back), join_type="inner", num_partitions=8,
        on=("doc_b",), right_on=("vid",),
    ).map_batches(
        lambda t: pa.table(
            {
                "conv_a": t["conv_a"],
                "conv_b": t["key"],
                "jaccard": t["jaccard"],
            }
        ),
        batch_format="pyarrow",
    )


def q_conv_pack(sf_dir: str):
    """(conv_id, n_chars, start_offset, pack_id): greedy context-window
    packing of whole rendered conversations in (user, seq) order —
    sequence_pack's two-phase distributed scan applied to the
    conversation table (8192-char windows). Exact window-function SQL
    oracle."""
    from graphsetintersection_ray.stages.conversations import conv_pack

    return conv_pack(transcripts_from_sf(sf_dir))


def q_tool_entropy(sf_dir: str):
    """(conv_id, n_turns, n_tools, tool_entropy): Shannon entropy of each
    conversation's tool distribution (diversity signal: single-tool loops
    0, uniform use ln(n_tools)). Integer counts in value-defined order;
    exact SQL oracle."""
    from graphsetintersection_ray.stages.conversations import tool_entropy

    return tool_entropy(transcripts_from_sf(sf_dir))


def q_conv_length_hist(sf_dir: str):
    """(n_turns, n_convs): conversation-length histogram (the corpus
    shape panel next to degree_hist). Two pre-aggregated count shuffles;
    exact SQL oracle."""
    from graphsetintersection_ray.stages.shuffle import counted_groups

    tr = transcripts_from_sf(sf_dir)
    per_conv = counted_groups(
        tr.map_batches(
            lambda t: pa.table({"conv_id": t["conv_id"]}),
            batch_format="pyarrow",
        ),
        ["conv_id"],
        count_col="n_turns",
    )
    out = counted_groups(
        per_conv.map_batches(
            lambda t: pa.table({"n_turns": t["n_turns"].cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        ["n_turns"],
        count_col="n_convs",
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "n_turns": t["n_turns"].cast(pa.int64()),
                "n_convs": t["n_convs"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_conv_segments(sf_dir: str):
    """(conv_id, turn_idx, segment_id): sub-conversation segmentation at
    >1 h turn gaps — the resegmentation prep before rendering stale
    multi-session logs as separate examples. Exact window SQL oracle."""
    from graphsetintersection_ray.stages.conversations import conv_segments

    return conv_segments(transcripts_from_sf(sf_dir))


def q_turn_latency(sf_dir: str):
    """(conv_id, n_gaps, mean_gap_s, max_gap_us): per-conversation
    response-latency stats from consecutive-turn timestamp gaps (agent
    responsiveness signal). Integer microsecond sums, one rounded
    division — bit-exact; single-turn conversations absent."""
    from graphsetintersection_ray.stages.conversations import turn_latency

    return turn_latency(transcripts_from_sf(sf_dir))


def q_lang_mix_weights(sf_dir: str):
    """(lang, n_docs, weight): temperature-resampled language mixing
    weights over the document corpus — weight ∝ sqrt(n_docs), normalized
    (T=2 temperature sampling, the standard multilingual rebalance). Per-
    batch partial counts shuffle O(#langs) rows; the finalize runs on the
    driver over #langs rows (inherently tiny). sqrt keeps both sides
    IEEE-exact (no libm pow divergence vs the oracle)."""
    from graphsetintersection_ray.stages.shuffle import counted_groups

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    counts = counted_groups(docs, ["lang"], count_col="n_docs")
    df = counts.to_pandas().sort_values("lang").reset_index(drop=True)
    w = np.sqrt(df["n_docs"].to_numpy(np.float64))
    weight = round_half_away(w / w.sum(), 6)
    return pa.table(
        {
            "lang": pa.array(df["lang"].astype(str)),
            "n_docs": pa.array(df["n_docs"].to_numpy(np.int64)),
            "weight": pa.array(weight, pa.float64()),
        }
    )


def q_neighborhood_function(sf_dir: str):
    """HyperBall approximate neighborhood function (radius,
    est_reachable): per-vertex HyperLogLog ball counters max-merged along
    edges to the fixpoint radius. No SQL oracle (probabilistic sketch) —
    the semantic check replays the exact neighborhood function with BFS
    matrix powers and bounds the relative error, plus a same-seed
    determinism replay (tools/check_oracles.py)."""
    art = build_graph(sf_dir)
    res, _ = it.neighborhood_function(art)
    return res


def q_effective_diameter(sf_dir: str):
    """(eff_diameter, max_radius): interpolated 90% effective diameter
    from the HyperBall neighborhood function; max_radius is the
    fixpoint radius (= exact diameter of the largest component).
    Semantic oracle: exact BFS neighborhood function replay, |est −
    exact effective diameter| ≤ 0.75 and exact max_radius."""
    art = build_graph(sf_dir)
    return it.effective_diameter(art)


def q_connected_components(sf_dir: str):
    art = build_graph(sf_dir)
    out, _ = it.connected_components(art, resume=False)
    return out


def q_square_count(sf_dir: str):
    """(squares,): exact global 4-cycle count — the quadrilateral
    analog of triangle counting on the same wedge machinery (one CSR
    pass of batch-combined pair counts, one bucketed sum, a scalar
    reduce)."""
    from graphsetintersection_ray.pipelines.linkpred import square_count

    art = build_graph(sf_dir)
    return square_count(art)


def q_four_clique_count(sf_dir: str):
    """(cliques4,): exact global 4-clique (K4) count — each discovered
    triangle extended over N+(w) with two membership probes against the
    sorted edge-key array (the intersection ladder one rung above TC);
    at scale, triangle corners joined with the packed CSR three ways."""
    art = build_graph(sf_dir)
    n = global_four_clique_count(
        art.oriented,
        num_partitions=art.num_partitions,
        n_vertices=art.n_vertices,
        n_edges=art.n_edges,
    )
    return pa.table({"cliques4": pa.array([n], pa.int64())})


def q_transitivity(sf_dir: str):
    """(transitivity,): global clustering ratio 3·triangles / wedges,
    wedges = Σ_v deg(v)·(deg(v)−1)/2 — one scalar TC reduce plus one
    pre-aggregated wedge sum over the degree table."""
    art = build_graph(sf_dir)
    tri = global_triangle_count(
        art.oriented,
        num_partitions=art.num_partitions,
        n_vertices=art.n_vertices,
        n_edges=art.n_edges,
    )
    def wedge_partial(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64())})

    wedge_partials = art.degrees.map_batches(
        wedge_partial, batch_format="pyarrow"
    )
    wedges = int(wedge_partials.sum("w") or 0)
    val = 3.0 * tri / wedges if wedges else 0.0
    return pa.table(
        {"transitivity": pa.array([float(round_half_away(val, 6))], pa.float64())}
    )


def q_rich_club(sf_dir: str):
    """(k, rich_club): rich-club coefficient curve φ(k) for
    k = 0..max_degree−1 — two pre-aggregated bounded histograms, driver
    suffix sums (output size = max degree)."""
    from graphsetintersection_ray.pipelines.linkpred import rich_club

    return rich_club(build_graph(sf_dir))


def q_neighbor_sample(sf_dir: str):
    """(u, v): deterministic 3-neighbor sample per vertex (GraphSAGE
    fan-out primitive) via multiplicative-hash ranking — per-batch
    partial top-k, one bucketed merge."""
    from graphsetintersection_ray.pipelines.linkpred import neighbor_sample

    return neighbor_sample(build_graph(sf_dir), k=3)


def q_khop_sample(sf_dir: str):
    """(u, hop, v): deterministic 2-layer GraphSAGE-style fan-out —
    hop 1 = each vertex's 3-sample, hop 2 = the 2-sample of every hop-1
    node (per-node samples shared across seeds); distinct rows.
    Exact window-function SQL oracle."""
    from graphsetintersection_ray.pipelines.linkpred import khop_sample

    return khop_sample(build_graph(sf_dir), k1=3, k2=2)


def q_modularity(sf_dir: str):
    """(modularity,): exact Newman modularity of the deterministic
    entity-type vertex partition — intra-edge count and per-community
    degree sums reduce as integers; one float expression on the driver."""
    from graphsetintersection_ray.pipelines.linkpred import modularity

    art = build_graph(sf_dir)
    return modularity(art)


def q_component_sizes(sf_dir: str):
    """(size, n_components): connected-component size distribution —
    two pre-aggregated count shuffles on top of the BSP min-label
    fixpoint (per-component sizes bounded by #components, then the
    tiny size histogram). Works on both the collected-table and
    at-scale Dataset result paths."""
    art = build_graph(sf_dir)
    res, _ = it.connected_components(art, resume=False)
    from graphsetintersection_ray.stages.shuffle import sum_by

    if not hasattr(res, "map_batches"):
        res = rd.from_arrow(
            res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
        )

    def ones_by_comp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "component": t["component"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    comp_sizes = sum_by(
        res.map_batches(ones_by_comp, batch_format="pyarrow"),
        ["component"],
        "one",
        out_col="size",
        num_buckets=16,
    )

    def ones_by_size(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "size": t["size"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    return sum_by(
        comp_sizes.map_batches(ones_by_size, batch_format="pyarrow"),
        ["size"],
        "one",
        out_col="n_components",
        num_buckets=1,
    )


def q_label_propagation(sf_dir: str):
    art = build_graph(sf_dir)
    out, _ = it.label_propagation(art, resume=False)
    return out


def q_bfs_distances(sf_dir: str):
    """Unweighted shortest distances from vertex 0 (reference BFS /
    shortest-distance query workload, porder.cpp:545-584, gen_queries.py)."""
    art = build_graph(sf_dir)
    out, _ = it.bfs_distances(art, source=0, resume=False)
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


def q_alpha_weights(sf_dir: str):
    """R10 `set_alpha_by_deg` (porder.cpp:394-422): per-vertex √degree
    weights normalized by Σ(alpha_out + alpha_in). The reference keeps
    separate out/in degrees; our graphs are undirected (out ≡ in), so both
    columns derive from the symmetric degree — still emitted separately to
    preserve the reference's (alpha_out, alpha_in) surface. One tiny scalar
    aggregate (Σ 2·√deg) + one broadcast-scalar map; no shuffle."""
    art = build_graph(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        s = np.sqrt(t["degree"].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"s": pa.array([2.0 * float(s.sum())], pa.float64())})

    tot = float(
        art.degrees.map_batches(_partial, batch_format="pyarrow").sum(on="s")
    )

    def _alpha(t: pa.Table) -> pa.Table:
        a = np.sqrt(
            t["degree"].to_numpy(zero_copy_only=False).astype(np.float64)
        ) / tot
        r = round_half_away(a, 9)
        return pa.table(
            {
                "v": t["v"].cast(pa.int32()),
                "alpha_out": pa.array(r, pa.float64()),
                "alpha_in": pa.array(r, pa.float64()),
            }
        )

    return art.degrees.map_batches(_alpha, batch_format="pyarrow")


def q_hybrid_order(sf_dir: str):
    """R2 hybrid_bfsdeg (porder.cpp:93-140): renumber by (BFS level from
    the max-degree hub, degree desc, id) — unreached vertices last."""
    import ray as _ray

    from graphsetintersection_ray.pipelines.iterative import bfs_distances

    art = build_graph(sf_dir)
    # hub = max-degree vertex, ties by smallest id
    hub_df = (
        art.degrees.sort(["degree", "v"], descending=[True, False])
        .limit(1)
        .to_pandas()
    )
    hub = int(hub_df["v"].iloc[0])
    dist, _ = it.bfs_distances(art, source=hub, resume=False)
    ddf = dist.to_pandas()
    # vertices are dense 0..V-1: broadcast a dense int64 distance array
    # (unreached = sentinel) and probe with vectorized fancy indexing —
    # no per-element dict .get loop
    dense = np.full(art.n_vertices, 1 << 40, np.int64)
    dense[ddf["v"].to_numpy().astype(np.int64)] = ddf["dist"].to_numpy()
    dist_ref = _ray.put(dense)

    def attach(t: pa.Table) -> pa.Table:
        lookup = _ray.get(dist_ref)
        v = t["v"].to_numpy(zero_copy_only=False)
        d = lookup[v.astype(np.int64)]
        return pa.table(
            {
                "v": t["v"],
                "degree": t["degree"],
                "dist": pa.array(d),
                "neg_degree": pa.array(-t["degree"].to_numpy(zero_copy_only=False)),
            }
        )

    ranked = art.degrees.map_batches(attach, batch_format="pyarrow").sort(
        ["dist", "neg_degree", "v"]
    )
    out = gb.enumerate_sorted(ranked, ["v"], "new_id")
    return out.map_batches(
        lambda t: pa.table(
            {"v": t["v"].cast(pa.int32()), "new_id": t["new_id"].cast(pa.int32())}
        ),
        batch_format="pyarrow",
    )


def q_gro_order(sf_dir: str):
    """R1 GRO greedy-window reorder (porder.cpp:142-235), sharded
    distributed analog: per-shard greedy window pass over the
    shard-induced subgraph, shard offsets merged into one dense
    permutation. No SQL oracle (order-sensitive greedy); pytest checks
    permutation validity, determinism, and BSR-locality improvement."""
    from graphsetintersection_ray.pipelines.ordering import gro_order

    return gro_order(build_graph(sf_dir))


def q_bp_order(sf_dir: str):
    """R3/R4 recursive-bisection reorder (mloggapa porder.cpp:634-930 /
    metis_order porder.cpp:932-986 analog): shard-parallel recursive
    bisection with KL-style cut refinement; leaf parts of 32 vertices get
    contiguous new ids (the reference's v_num/32 part grain). No SQL
    oracle (iterative heuristic); pytest checks permutation validity,
    determinism, and log-gap/locality improvement on planted communities."""
    from graphsetintersection_ray.pipelines.ordering import bp_order

    return bp_order(build_graph(sf_dir))


def q_dfs_order(sf_dir: str):
    """Q9 DFS preorder (porder.cpp:497-533): start at vertex 0, neighbors
    ascending, restart at the smallest unvisited vertex. Sequential by
    nature (driver-side below GRAFT_DFS_MAX_VERTICES, loud error above) —
    the reference runs it single-threaded too. No SQL oracle
    (stack-order-sensitive); pytest compares against an independent
    recursive DFS."""
    from graphsetintersection_ray.pipelines.ordering import dfs_order

    return dfs_order(build_graph(sf_dir))


def q_slashburn_order(sf_dir: str):
    """R5 slashburn_order (porder.cpp:1009-1114): per round pull the k
    highest-degree hubs to the front, push every non-giant connected
    component of the remainder to the back, recurse on the giant.
    Shard-parallel exact replay per range shard (same skeleton as
    gro/bp). No SQL oracle (iterative hub/CC heuristic); semantic checks
    verify permutation validity, determinism, and the hub-front
    property."""
    from graphsetintersection_ray.pipelines.ordering import slashburn_order

    return slashburn_order(build_graph(sf_dir))


def q_rcm_order(sf_dir: str):
    """Reverse Cuthill-McKee reorder (porder.cpp:586-631): seeds in
    ascending total degree, BFS visiting neighbors in ascending degree,
    ids assigned descending from v_num-1. Ties break by vertex id (the
    reference's std::sort leaves them unspecified). No SQL oracle
    (BFS-order-sensitive); semantic checks replay it independently and
    verify the bandwidth-reduction property."""
    from graphsetintersection_ray.pipelines.ordering import rcm_order

    return rcm_order(build_graph(sf_dir))


def q_bfsr_order(sf_dir: str):
    """BFS recursive-bisection reorder (porder.cpp:1116-1213): exact
    replay — pseudo-peripheral front swap, tot/4-seeded BFS growth of the
    left half with the reference's tot/2 and 3*tot/4 cutoffs, swap-based
    partition, recursion; ranges under 32 keep their order. No SQL
    oracle (BFS-order-sensitive); semantic checks verify permutation
    validity, determinism, and sub-32 identity."""
    from graphsetintersection_ray.pipelines.ordering import bfsr_order

    return bfsr_order(build_graph(sf_dir))


HUB_MIN_DEGREE = 8


def q_negative_edges(sf_dir: str):
    """(u, v): deterministic k=3 negative samples per vertex (non-edges)
    — the contrastive-training complement of neighbor_sample. Seeded
    splitmix64 candidates, edge membership via a broadcast sorted
    composite-key array below the edge threshold (bucketed anti-join
    above). No SQL oracle (the draw order is procedural); semantic check:
    no sampled pair is an edge, no self-pairs, per-vertex counts, exact
    seeded replay."""
    from graphsetintersection_ray.pipelines.linkpred import negative_edges

    art = build_graph(sf_dir)
    return negative_edges(art)


def q_hub_subgraph(sf_dir: str):
    """(src, dst): the induced subgraph on vertices of degree ≥ 8 — the
    hub-core extraction that precedes dense-region mining (SlashBurn's
    hub view as a reusable operator). Below BROADCAST_MAX_VERTICES the
    degree mask is one broadcast boolean vector probed per batch
    (map-only); above it, two hash joins against the degree table. Exact
    SQL oracle."""
    import pyarrow.compute as pc

    art = build_graph(sf_dir)
    if art.n_vertices <= gb.BROADCAST_MAX_VERTICES:
        ddf = art.degrees.to_pandas()
        mask = np.zeros(art.n_vertices, bool)
        mask[ddf["v"].to_numpy()] = ddf["degree"].to_numpy() >= HUB_MIN_DEGREE
        import ray as _ray

        ref = _ray.put(mask)

        def filt(t: pa.Table) -> pa.Table:
            import ray as _ray2

            m = _ray2.get(ref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = m[s] & m[d]
            return pa.table(
                {
                    "src": pa.array(s[keep].astype(np.int32)),
                    "dst": pa.array(d[keep].astype(np.int32)),
                }
            )

        return art.edges.map_batches(filt, batch_format="pyarrow")

    hubs = art.degrees.filter(expr=f"degree >= {HUB_MIN_DEGREE}").select_columns(["v"])
    j1 = gb.compact_blocks(art.edges).join(
        gb.compact_blocks(hubs),
        join_type="inner",
        num_partitions=art.num_partitions,
        on=("src",),
        right_on=("v",),
    )
    j2 = j1.join(
        gb.compact_blocks(hubs),
        join_type="inner",
        num_partitions=art.num_partitions,
        on=("dst",),
        right_on=("v",),
    )
    return j2.map_batches(
        lambda t: pa.table(
            {"src": t["src"].cast(pa.int32()), "dst": t["dst"].cast(pa.int32())}
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


def q_vertex_labels(sf_dir: str):
    """(v, label) entity-type labels (reference S5 load_labels /
    gen_labels.py made deterministic)."""
    from graphsetintersection_ray.pipelines.subgraph import vertex_labels

    return vertex_labels(build_graph(sf_dir))


def q_subgraph_match(sf_dir: str):
    """Match counts for the named label-filtered query graphs (reference
    sm.cpp per-query `ansK=N` output)."""
    from graphsetintersection_ray.pipelines.subgraph import match_counts_table

    return match_counts_table(build_graph(sf_dir))


def q_maximal_cliques(sf_dir: str):
    """(mc_num, max_clique_size) — degeneracy-order Tomita enumeration
    (reference mc.cpp:36-47). SQL oracle: recursive-CTE clique growth
    (each clique enumerated once via ascending-id extension, adjacency
    checked with list_has_all) + non-extensible filter; pytest
    additionally checks the full clique list vs brute-force
    Bron-Kerbosch."""
    from graphsetintersection_ray.pipelines.cliques import clique_stats

    return clique_stats(build_graph(sf_dir))


def q_comp_ratio(sf_dir: str):
    """BSR layout-quality metric (R7, porder.cpp:295-351 /
    bitpack_triangle_count.cpp:66-67): packed (base,state) blocks per edge
    over the symmetric adjacency; lower = better vertex-ID locality."""
    art = build_graph(sf_dir)

    from graphsetintersection_ray.stages.shuffle import distinct_by

    pairs = distinct_by(
        art.sym.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "pack": pa.array(
                        t["dst"].to_numpy(zero_copy_only=False) >> 5, pa.int32()
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["src", "pack"],
    )
    packs = pairs.count()
    edges = art.sym.count()
    return pa.table(
        {
            "packs": pa.array([packs], pa.int64()),
            "edges": pa.array([edges], pa.int64()),
            "comp_ratio": pa.array(
                [float(np.floor(packs / edges * 1e6 + 0.5) / 1e6)], pa.float64()
            ),
        }
    )


# --------------------------------------------------------------------------
# Relational queries over the star schema (general-engine coverage:
# joins, grouped aggregates, sort/top-k — SURVEY.md §2.6 checklist)
# --------------------------------------------------------------------------


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style grouped aggregate with a computed column."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "q": t["l_quantity"].to_pandas(),
                "rev": rev.to_pandas(),
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(sum_qty=("q", "sum"), revenue=("rev", "sum"), n=("q", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "l_returnflag": [g["l_returnflag"].iloc[0]],
                    "l_linestatus": [g["l_linestatus"].iloc[0]],
                    "sum_qty": [
                        float(np.floor(g["sum_qty"].sum() * 100 + 0.5) / 100)
                    ],
                    "revenue": [
                        float(np.floor(g["revenue"].sum() * 100 + 0.5) / 100)
                    ],
                    "n": [int(g["n"].sum())],
                }
            ),
            batch_format="pandas",
        )
    )
    return merged


def q_customer_revenue(sf_dir: str):
    """Join pipeline: orders ⋈ customer ⋈ nation → revenue per nation."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    # small sides broadcast (dimension tables)
    cdf = cust.to_pandas()
    ndf = nation.to_pandas()
    c2n = dict(zip(cdf.c_custkey, cdf.c_nationkey))
    n2name = dict(zip(ndf.n_nationkey, ndf.n_name))
    import ray as _ray

    ref = _ray.put((c2n, n2name))

    def partial(t: pa.Table) -> pa.Table:
        c2n_, n2name_ = _ray.get(ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        names = pd.Series(ck).map(c2n_).map(n2name_).to_numpy(object)
        df = (
            pd.DataFrame({"n_name": names, "p": price})
            .groupby("n_name", sort=False)["p"]
            .agg(["sum", "size"])
            .reset_index()
        )
        return pa.table(
            {
                "n_name": pa.array(df["n_name"], pa.string()),
                "s": pa.array(df["sum"], pa.float64()),
                "c": pa.array(df["size"], pa.int64()),
            }
        )

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "n_name": [g["n_name"].iloc[0]],
                    "revenue": [float(np.floor(g["s"].sum() * 100 + 0.5) / 100)],
                    "n_orders": [int(g["c"].sum())],
                }
            ),
            batch_format="pandas",
        )
    )


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: top-10 unshipped BUILDING-segment orders by
    revenue. Dimension filter broadcast (customer keys), fact-fact hash
    join lineitem ⋈ orders on orderkey, pre-aggregated revenue sum, and
    an exact top-10 cut on the (revenue DESC, o_orderdate, l_orderkey)
    total order via per-block partial top-ks."""
    import ray as _ray

    from graphsetintersection_ray.stages.graph_build import compact_blocks
    from graphsetintersection_ray.stages.shuffle import sum_by

    cutoff = np.datetime64("1998-01-01")

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    keys_ref = _ray.put(
        np.sort(
            cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"]
            .to_numpy(np.int64)
        )
    )

    def filter_orders(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = np.isin(ck, _ray.get(keys_ref)) & (od < cutoff)
        return t.filter(pa.array(keep)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    def rev_rows(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = sd > cutoff
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "l_orderkey": pa.array(
                    t["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "rev": pa.array(price * (1.0 - disc), pa.float64()),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(filter_orders, batch_format="pyarrow")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(rev_rows, batch_format="pyarrow")

    joined = compact_blocks(li).join(
        compact_blocks(orders),
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    summed = sum_by(
        joined,
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        "rev",
        out_col="revenue",
        num_buckets=16,
    )

    sort_cols = ["revenue", "o_orderdate", "l_orderkey"]
    asc = [False, True, True]

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["revenue"] = np.floor(df["revenue"].to_numpy() * 100 + 0.5) / 100
        return pa.Table.from_pandas(
            df.sort_values(sort_cols, ascending=asc).head(10),
            preserve_index=False,
        )

    top = (
        summed.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(sort_cols, ascending=asc)
        .head(10)
    )
    return rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array(top["l_orderkey"], pa.int64()),
                "revenue": pa.array(top["revenue"], pa.float64()),
                "o_orderdate": pa.array(top["o_orderdate"]),
                "o_orderpriority": pa.array(top["o_orderpriority"], pa.string()),
            }
        )
    )


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: revenue per nation from lineitems where the
    customer and the supplier sit in the SAME nation of one region,
    for orders placed in one year. The four dimension tables
    (region, nation, supplier, customer) broadcast once as dense /
    dict lookups; the only exchange is the fact-fact hash join
    lineitem ⋈ filtered-orders on orderkey. Revenue accumulates as
    integer micro-units per row so the aggregate is bit-exact and
    reduction-order-free at any parallelism."""
    import ray as _ray

    from graphsetintersection_ray.stages.graph_build import compact_blocks
    from graphsetintersection_ray.stages.shuffle import sum_by

    region = "ASIA"
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    ndf = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    rdf = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(rdf.loc[rdf.r_name == region, "r_regionkey"].iloc[0])
    ndf = ndf[ndf.n_regionkey == rkey]
    nat_keys = ndf.n_nationkey.to_numpy(np.int64)
    nat_names = dict(zip(ndf.n_nationkey, ndf.n_name))

    # supplier / customer → nationkey as dense int64 vectors (-1 = not
    # in the region); at 100 TB these stay dimension-sized (TPC-H dims
    # are ~1e5 rows per SF) and broadcast once via ray.put
    sdf = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    cdf = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()

    def dense_map(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
        m = np.full(int(keys.max()) + 1, -1, np.int64)
        m[keys] = np.where(np.isin(vals, nat_keys), vals, -1)
        return m

    s2n_ref = _ray.put(
        dense_map(
            sdf.s_suppkey.to_numpy(np.int64), sdf.s_nationkey.to_numpy(np.int64)
        )
    )
    c2n_ref = _ray.put(
        dense_map(
            cdf.c_custkey.to_numpy(np.int64), cdf.c_nationkey.to_numpy(np.int64)
        )
    )

    def filter_orders(t: pa.Table) -> pa.Table:
        c2n = _ray.get(c2n_ref)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c_nat = c2n[ck]
        keep = (od >= lo) & (od < hi) & (c_nat >= 0)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    t["o_orderkey"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "c_nat": pa.array(c_nat[keep], pa.int64()),
            }
        )

    def li_rows(t: pa.Table) -> pa.Table:
        s2n = _ray.get(s2n_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat = s2n[sk]
        keep = s_nat >= 0
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[keep]
        micro = np.floor(price * (1.0 - disc) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(
                    t["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "s_nat": pa.array(s_nat[keep], pa.int64()),
                "rev_micro": pa.array(micro, pa.int64()),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(filter_orders, batch_format="pyarrow")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_rows, batch_format="pyarrow")

    joined = compact_blocks(li).join(
        compact_blocks(orders),
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def same_nation(t: pa.Table) -> pa.Table:
        s_nat = t["s_nat"].to_numpy(zero_copy_only=False)
        c_nat = t["c_nat"].to_numpy(zero_copy_only=False)
        keep = s_nat == c_nat
        return pa.table(
            {
                "nk": pa.array(s_nat[keep], pa.int64()),
                "rev_micro": pa.array(
                    t["rev_micro"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
            }
        )

    summed = sum_by(
        joined.map_batches(same_nation, batch_format="pyarrow"),
        ["nk"],
        "rev_micro",
        out_col="micro",
        num_buckets=16,
    )

    def finalize(t: pa.Table) -> pa.Table:
        nk = t["nk"].to_numpy(zero_copy_only=False)
        micro = t["micro"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(
                    [nat_names[int(k)] for k in nk], pa.string()
                ),
                "revenue": pa.array(micro / 1e6, pa.float64()),
            }
        )

    return summed.map_batches(finalize, batch_format="pyarrow")


def q_top_parts(sf_dir: str):
    """Top-10 parts by total lineitem quantity (sort + limit + join)."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
                    "q": t["l_quantity"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby("l_partkey", sort=False)["q"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "l_partkey": pa.array(df["l_partkey"], pa.int64()),
                "partial": pa.array(df["q"], pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("partial", alias_name="total_qty"))
    )
    top = totals.sort(["total_qty", "l_partkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"].cast(pa.int64()),
                "total_qty": t["total_qty"].cast(pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# Data-pipeline queries (documents / embeddings tables)
# --------------------------------------------------------------------------


def _docs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _embs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def q_token_count(sf_dir: str):
    from graphsetintersection_ray.stages.text import token_count

    return _docs(sf_dir).map_batches(token_count, batch_format="pandas")


def q_token_count_bpe(sf_dir: str):
    from graphsetintersection_ray.stages.text import token_count_bpe

    return _docs(sf_dir).map_batches(token_count_bpe, batch_format="pandas")


def q_sequence_pack(sf_dir: str):
    """Fixed-length training-sequence packing schedule: each doc assigned
    to the 2048-token pack containing its first token (doc_id
    concatenation order). Distributed two-phase prefix-sum scan — see
    stages.text.sequence_pack."""
    from graphsetintersection_ray.stages.text import sequence_pack

    return sequence_pack(_docs(sf_dir), seq_len=2048)


def q_doc_chunks(sf_dir: str):
    """Overlapping 64-token / 16-overlap chunk schedule per document
    (map-only flat expansion) — the RAG / long-context prep step."""
    from graphsetintersection_ray.stages.text import doc_chunks

    return doc_chunks(_docs(sf_dir), chunk_len=64, overlap=16)


def q_text_quality(sf_dir: str):
    from graphsetintersection_ray.stages.text import TextQualityScorer

    return _docs(sf_dir).map_batches(
        TextQualityScorer, batch_format="pandas", concurrency=2
    )


def q_vocab_growth(sf_dir: str):
    """(doc_threshold, vocab): Heaps-law vocabulary growth — distinct
    lowercase tokens first seen at doc_id ≤ t for 8 even thresholds;
    one bucketed token-min shuffle, map-only histogram."""
    from graphsetintersection_ray.stages.text import vocab_growth

    return vocab_growth(_docs(sf_dir))


def q_quality_logistic(sf_dir: str):
    """(doc_id, lr_score): fixed-weight logistic quality classifier over
    the SQL-reproducible text features — map-only actor-pool scoring."""
    from graphsetintersection_ray.stages.text import QualityLogistic

    return _docs(sf_dir).map_batches(
        QualityLogistic, batch_format="pandas", concurrency=2
    )


def q_lang_id(sf_dir: str):
    from graphsetintersection_ray.stages.text import lang_id

    return _docs(sf_dir).map_batches(lang_id, batch_format="pandas")


def q_fingerprint(sf_dir: str):
    from graphsetintersection_ray.stages.text import fingerprint

    return _docs(sf_dir).map_batches(fingerprint, batch_format="pandas")


def q_winnow_fingerprint(sf_dir: str):
    """(doc_id, pos, fp): winnowing (MOSS) substring fingerprints —
    robust-winnowed k-gram hash minima per document (k=5, w=4,
    polynomial hash over code points). Map-only, exact SQL oracle via
    per-window min_by with a composite (hash, rightmost-pos) key."""
    from graphsetintersection_ray.stages.text import winnow_fingerprint

    return _docs(sf_dir).map_batches(winnow_fingerprint, batch_format="pandas")


def q_winnow_dup_pairs(sf_dir: str):
    """(doc_a, doc_b, shared, overlap): substring-level near-dup pairs —
    docs sharing >= WINNOW_MIN_SHARED distinct winnow hashes, overlap =
    containment shared/min(|fp_a|,|fp_b|). Exact SQL oracle (max_df=None
    keeps pair generation exact; production uses the skew guard)."""
    from graphsetintersection_ray.stages.dedup import winnow_dup_pairs

    return winnow_dup_pairs(
        _docs(sf_dir), min_shared=WINNOW_MIN_SHARED,
        min_overlap=WINNOW_MIN_OVERLAP, max_df=None,
    )


def q_dedup_exact(sf_dir: str):
    from graphsetintersection_ray.stages.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def q_jaccard_pairs(sf_dir: str):
    from graphsetintersection_ray.stages.dedup import jaccard_pairs

    # max_df=None: exact semantics for the SQL oracle; production runs
    # keep the DEFAULT_MAX_DF skew guard
    return jaccard_pairs(_docs(sf_dir), threshold=0.5, max_df=None)


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH candidates verified by exact (distributed) Jaccard —
    equals q_jaccard_pairs up to LSH recall. The SQL oracle IS the exact
    jaccard query: with 16 bands x 4 rows and the fixtures' minimum true
    jaccard of 0.8-0.9, the per-pair miss probability is <= ~2e-4, and
    measured recall is 1.0 at sf0.001/0.01/0.1 (precision is exact by
    construction — every candidate is verified)."""
    from graphsetintersection_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), threshold=0.5)


def q_dedup_clusters(sf_dir: str):
    """Near-duplicate clusters: exact-Jaccard pairs → connected
    components (alternating large-star/small-star over the pair graph)
    → (doc_id, cluster=min id in component) for every paired doc."""
    from graphsetintersection_ray.stages.dedup import jaccard_pairs, pair_components

    pairs = jaccard_pairs(_docs(sf_dir), threshold=0.5, max_df=None)
    return pair_components(pairs)


def q_dedup_survivors(sf_dir: str):
    """End-to-end near-dedup: keep the canonical (minimum-id) document
    per duplicate cluster plus all unpaired documents."""
    from graphsetintersection_ray.stages.dedup import jaccard_pairs, near_dedup

    docs = _docs(sf_dir)
    pairs = jaccard_pairs(docs, threshold=0.5, max_df=None)
    return near_dedup(docs, pairs)


def q_simhash_pairs(sf_dir: str):
    from graphsetintersection_ray.stages.dedup import simhash_near_pairs

    return simhash_near_pairs(_docs(sf_dir), max_hamming=3)


def q_knn_topk(sf_dir: str):
    from graphsetintersection_ray.stages.similarity import brute_force_topk

    return brute_force_topk(_embs(sf_dir), query_ids=list(range(10)), k=5)


def q_knn_lsh(sf_dir: str):
    from graphsetintersection_ray.stages.similarity import lsh_topk

    return lsh_topk(_embs(sf_dir), query_ids=list(range(10)), k=5)


def q_knn_ivf(sf_dir: str):
    """IVF (inverted-file, spherical-k-means cells) ANN — the index-based
    sibling of knn_lsh; semantic oracle = algorithm-exact replay in
    tools/check_oracles.py plus recall-on-clusters in tests."""
    from graphsetintersection_ray.stages.similarity import ivf_topk

    return ivf_topk(_embs(sf_dir), query_ids=list(range(10)), k=5)


def q_kmeans_clusters(sf_dir: str):
    """(vec_id, cluster): distributed Lloyd's spherical k-means (k=8,
    10 iterations, deterministic smallest-vec_id init). Semantic oracle =
    exact numpy replay of the same algorithm (tools/check_oracles.py)
    plus planted-cluster recovery in pytest."""
    from graphsetintersection_ray.stages.similarity import kmeans_clusters

    return kmeans_clusters(_embs(sf_dir), k=8)


def q_embedding_dups(sf_dir: str):
    """Oracle configuration: the EXACT block-pair engine (matches the SQL
    all-pairs join). The production default is the near-linear LSH route —
    ``similarity.dup_pairs(method='lsh')`` — whose recall vs this exact
    engine is measured in tests/test_data_pipeline.py."""
    from graphsetintersection_ray.stages.similarity import dup_pairs

    return dup_pairs(_embs(sf_dir), threshold=0.4, method="exact")


def q_embedding_dups_lsh(sf_dir: str):
    """PRODUCTION configuration: the near-linear LSH-bucketed near-dup
    path (``dup_pairs(method='lsh')``). Verified semantically: every
    emitted pair must be a true >= threshold pair with the exact rounded
    cosine (precision 1.0); recall vs the exact engine is measured and
    recorded in NOORACLE_CHECKS (LSH recall is probabilistic by design,
    see similarity.lsh_dup_pairs)."""
    from graphsetintersection_ray.stages.similarity import dup_pairs

    return dup_pairs(_embs(sf_dir), threshold=0.4, method="lsh")


def q_event_windows(sf_dir: str):
    """Tumbling 1-hour event-time windows per event type (stream-shaped
    workload over the ordered events log)."""
    from graphsetintersection_ray.stages.streaming import tumbling_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    return tumbling_window_agg(ev)


def q_sessionize(sf_dir: str):
    """(user_id, n_sessions) with 30-minute-gap session splits."""
    from graphsetintersection_ray.stages.streaming import sessionize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    return sessionize(ev)


def q_daily_active(sf_dir: str):
    """(day, n_users): exact daily active users — per-batch distinct
    (day, user) partials, one bounded distinct shuffle, a tiny per-day
    count. The exact complement of approx_distinct's HLL path."""
    from graphsetintersection_ray.stages.shuffle import (
        counted_groups,
        distinct_by,
    )

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "day": t["ts"].cast(pa.timestamp("us")).cast(pa.date32()),
                "user_id": t["user_id"],
            }
        )

    pairs = distinct_by(
        ev.map_batches(proj, batch_format="pyarrow"), ["day", "user_id"]
    )
    out = counted_groups(pairs, ["day"], count_col="n_users")
    # timestamp("us"), not date32: matches DuckDB DATE's pandas round-trip
    # (datetime64[us]) so the gate's dtype-sensitive value hash agrees.
    return out.map_batches(
        lambda t: pa.table(
            {
                "day": t["day"].cast(pa.timestamp("us")),
                "n_users": t["n_users"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_retention_cohorts(sf_dir: str):
    """(cohort_week, week, n_users): weekly cohort retention — users by
    Monday-truncated first-event week, counted per active week. Distinct
    (user, week) partials + one user-keyed bucket shuffle + a tiny
    (cohort, week) reduce; exact SQL oracle."""
    from graphsetintersection_ray.stages.streaming import retention_cohorts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return retention_cohorts(ev)


def q_funnel_counts(sf_dir: str):
    """(stage, step, n_users): view -> click -> purchase funnel reach —
    users completing each prefix as an ordered subsequence of their
    (ts, event_id)-ordered stream, greedy-earliest matching."""
    from graphsetintersection_ray.stages.streaming import funnel_counts

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return funnel_counts(ev)


def q_conversion_time(sf_dir: str):
    """(user_id, conv_us): microseconds from each user's earliest view
    to the earliest purchase strictly after it ((ts, event_id) order);
    non-converting users absent."""
    from graphsetintersection_ray.stages.streaming import conversion_time

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return conversion_time(ev)


def q_source_quality(sf_dir: str):
    """(source, n_docs, mean_quality): per-source doc counts and mean
    quality (domain-level curation signal). Quality summed as integer
    micro-units — bit-exact, reduction-order-free."""
    from graphsetintersection_ray.stages.text import source_quality

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return source_quality(docs)


def q_image_decode(sf_dir: str):
    """(doc_id, n_pixels, mean_gray): REAL byte-level image decode over
    MIXED payload formats — each doc carries a deterministic 8x8 RGB
    image encoded as 24-bit BMP (doc_id %% 3 == 0), truecolor PNG with
    scanline filter doc_id %% 5 (== 1), or baseline JPEG at quality 90
    (== 2); DecodeStage sniffs the magic and decodes with pure NumPy +
    stdlib zlib, reduced here to pixel count + mean grayscale (rounded
    to 6). Semantic oracle: byte-free Philox replay of every image
    (JPEG rows replay encode+decode — deterministic), exact equality."""
    from graphsetintersection_ray.stages.multimodal import (
        DecodeStage,
        attach_media_payload,
    )

    payloads = attach_media_payload(_docs(sf_dir), kind="image")
    frames = payloads.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=256, concurrency=2
    )

    def summarize(t: pa.Table) -> pa.Table:
        lists = t["frame"].combine_chunks()
        vals = lists.values.to_numpy(zero_copy_only=False)
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        sums = np.add.reduceat(vals.astype(np.float64), offs[:-1])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_pixels": pa.array(lens, pa.int64()),
                "mean_gray": pa.array(
                    round_half_away(sums / np.maximum(lens, 1), 6),
                    pa.float64(),
                ),
            }
        )

    return frames.map_batches(summarize, batch_format="pyarrow")


def q_unigram_logprob(sf_dir: str):
    """(doc_id, n_tokens, avg_logprob): mean per-token unigram-LM log
    probability under the corpus's own unigram distribution — the
    KenLM-style perplexity filtering signal. Per-token logprobs are
    rounded to 6 decimals and summed as integer micro-units, so the
    aggregate is bit-exact; zero-token docs are absent."""
    from graphsetintersection_ray.stages.text import unigram_logprob

    return unigram_logprob(_docs(sf_dir))


def q_ngram_novelty(sf_dir: str):
    """(doc_id, n_shingles, n_novel, novelty_rate): share of a doc's
    distinct word-3-shingles first seen (min doc_id) in that doc — the
    corpus-freshness curation signal (boilerplate re-crawls ≈ 0, new
    content ≈ 1). One shingle-keyed bucket shuffle emitting per-doc
    partials + one per-doc sum shuffle; exact SQL oracle on the shared
    shingle prelude."""
    from graphsetintersection_ray.stages.dedup import ngram_novelty

    return ngram_novelty(_docs(sf_dir))


def q_bigram_logprob(sf_dir: str):
    """(doc_id, n_bigrams, avg_logprob): add-one-smoothed bigram-LM
    fluency score under the corpus's own bigram counts — the conditional
    complement of unigram_logprob (catches rare-next-token text whose
    unigrams are common). Integer micro-unit sums (bit-exact); docs with
    <2 tokens absent. Dual path: broadcast LM below
    BIGRAM_BROADCAST_MAX distinct bigrams, hash-join scoring above (the
    100 TB shape — bigram vocabulary is unbounded)."""
    from graphsetintersection_ray.stages.text import bigram_logprob

    return bigram_logprob(_docs(sf_dir))


def q_corpus_report(sf_dir: str):
    """(n_docs, total_tokens, mean_quality): the composed end-to-end
    curation pipeline — CurationFilter gates, then exact dedup among
    survivors (min doc_id per fingerprint), then benchmark
    decontamination (doc_id % 97 blocklist over the full corpus) —
    reported as one corpus-level row. Quality aggregated as integer
    micro-units (bit-exact)."""
    from graphsetintersection_ray.stages.text import corpus_report

    return corpus_report(_docs(sf_dir), benchmark_mod=97)


def q_oov_rate(sf_dir: str):
    """(doc_id, n_tokens, n_oov, oov_rate): out-of-vocab rate vs the
    corpus top-20 token vocabulary (count DESC, token ASC ties) — the
    tokenizer-coverage curation signal. vocab_k=20 because the
    synthetic corpus has ~31 distinct tokens (production default is
    65536); zero-token docs are absent."""
    from graphsetintersection_ray.stages.text import oov_rate

    return oov_rate(_docs(sf_dir), vocab_k=20)


def q_centroid_sim(sf_dir: str):
    """(vec_id, label, centroid_sim): cosine of every embedding to its
    own label's centroid — the cluster-coherence / outlier signal.
    EXACT: integer milli-unit quantization + integer-sum centroid
    direction (cosine is scale-invariant), one identical double
    expression both sides."""
    from graphsetintersection_ray.stages.similarity import centroid_sim

    return centroid_sim(_embs(sf_dir))


def q_weighted_sample(sf_dir: str):
    """(rk, event_id, value): Efraimidis-Spirakis weighted sample
    without replacement — 100 events with inclusion probability
    proportional to value, deterministic (splitmix64 uniforms), exact
    per-block partial top-k. Semantic oracle: bit-exact numpy replay."""
    from graphsetintersection_ray.stages.streaming import weighted_sample

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    return weighted_sample(ev, k=100)


def q_approx_distinct(sf_dir: str):
    """(event_type, n_approx): HyperLogLog approximate distinct users
    per event type (m=16384, ~0.8% standard error); semantic oracle
    compares against the exact distinct count with a 5% bound."""
    from graphsetintersection_ray.stages.streaming import (
        approx_distinct_users,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return approx_distinct_users(ev)


def q_sample_docs(sf_dir: str):
    """Deterministic 1-in-16 systematic sample of documents (sampling
    operator with an exact oracle — seeded random sampling is covered by
    the synthetic corpus generators)."""
    docs = _docs(sf_dir)
    return docs.map_batches(
        lambda t: t.filter(
            pa.compute.equal(pa.compute.bit_wise_and(t["doc_id"], 15), 0)
        ),
        batch_format="pyarrow",
    )


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample over events: per event_type keep
    event_id % ceil(n_type/1000) == 0 — equal-size samples across skewed
    strata, value-defined and replayable."""
    from graphsetintersection_ray.stages.streaming import stratified_sample

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type"])
    return stratified_sample(ev, target_per_stratum=1000)


def q_token_quantiles(sf_dir: str):
    """Exact per-language token-count quantiles (q = 0.25/0.5/0.9,
    quantile_disc semantics) via the (lang, n_tokens) count histogram —
    no sort of the corpus."""
    from graphsetintersection_ray.stages.text import token_quantiles

    return token_quantiles(_docs(sf_dir))


def q_top_docs_per_lang(sf_dir: str):
    """(lang_pred, doc_id, quality, rk): each language's 10
    highest-quality docs — group top-k with deterministic (quality
    DESC, doc_id ASC) order, via per-block partial top-ks."""
    from graphsetintersection_ray.stages.text import top_per_lang

    return top_per_lang(_docs(sf_dir), k=10)


def q_decontaminate(sf_dir: str):
    """(doc_id, fp): corpus minus every doc whose normalized-content
    fingerprint matches the value-defined benchmark set
    (doc_id % 97 == 0) — eval-leakage removal by content, not id."""
    from graphsetintersection_ray.stages.dedup import decontaminate

    return decontaminate(_docs(sf_dir), benchmark_mod=97)


def q_ngram_decontaminate(sf_dir: str):
    """(doc_id, n_hits): non-benchmark docs sharing >= 1 word-3-shingle
    with the value-defined benchmark set (doc_id % 97 == 0), with the
    count of DISTINCT overlapping shingles — shingle-level eval-leakage
    detection (catches partial quotes, not just verbatim copies)."""
    from graphsetintersection_ray.stages.dedup import ngram_decontaminate

    return ngram_decontaminate(_docs(sf_dir), benchmark_mod=97)


def q_tfidf_top_terms(sf_dir: str):
    """(doc_id, term, score, rk): each doc's 3 highest tf-idf terms
    (idf = ln(N/df); ties by term asc)."""
    from graphsetintersection_ray.stages.text import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir), k=3)


def q_bm25_scores(sf_dir: str):
    """(doc_id, score): Okapi BM25 (k1=1.2, b=0.75, Lucene idf) of every
    document matching the fixed query {merge, sort, spark} — the
    ranked-retrieval primitive behind benchmark-similarity curation.
    Integer micro-unit per-term components keep the per-doc sum
    reduction-order-free; the SQL oracle mirrors the exact
    parenthesization."""
    from graphsetintersection_ray.stages.text import bm25_scores

    return bm25_scores(_docs(sf_dir))


def q_curation_filter(sf_dir: str):
    """(doc_id, lang_pred, quality, rep_ratio): the documents a
    curation pipeline KEEPS — English, quality >= 0.3, bigram
    repetition <= 0.05 — one fused actor-pool map pass."""
    from graphsetintersection_ray.stages.text import CurationFilter

    return _docs(sf_dir).map_batches(
        CurationFilter, batch_format="pandas", concurrency=2
    )


def q_bloom_dedup(sf_dir: str):
    """(doc_id, maybe_seen): Bloom-filter incremental dedup — for every
    "new" doc (odd doc_id), whether its normalized content is possibly
    in the value-defined seen corpus (even doc_id). No false negatives
    by construction; FP rate measured by the semantic oracle. The
    filter is fixed-size regardless of corpus size (bounded-memory
    membership for 100 TB ingestion)."""
    from graphsetintersection_ray.stages.dedup import bloom_membership

    return bloom_membership(_docs(sf_dir), seen_mod=2)


def q_pii_scrub(sf_dir: str):
    """(event_id, n_emails, n_phones, n_ips, clean): PII detection and
    redaction over value-defined per-event raw-log lines (contact
    fields derived from each event's own columns — see FIXTURES.md).
    Two map-only stages: vectorized line assembly, then the PIIScrubber
    actor pool (regexes compiled once per actor). Zero shuffle."""
    from graphsetintersection_ray.stages.text import (
        PIIScrubber,
        event_log_lines,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )
    return ev.map_batches(event_log_lines, batch_format="pandas").map_batches(
        PIIScrubber,
        fn_constructor_kwargs={"id_col": "event_id"},
        batch_format="pandas",
        concurrency=2,
    )


def q_repetition_ratio(sf_dir: str):
    """(doc_id, n_bigrams, n_distinct, rep_ratio): within-doc bigram
    repetition (C4/Gopher boilerplate signal) — map-only, no shuffle."""
    from graphsetintersection_ray.stages.text import repetition_ratio

    return _docs(sf_dir).map_batches(repetition_ratio, batch_format="pandas")


def q_ngram_counts(sf_dir: str):
    """(bigram, n): the corpus's 50 most frequent adjacent token
    bigrams, deterministic (n DESC, bigram ASC) cut."""
    from graphsetintersection_ray.stages.text import ngram_counts

    return ngram_counts(_docs(sf_dir), top=50)


def q_asof_join(sf_dir: str):
    """(purchase_id, purchase_ts, click_id, click_ts): each purchase
    joined to the user's most recent prior click (event-time AS-OF
    join, inner semantics)."""
    from graphsetintersection_ray.stages.streaming import as_of_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return as_of_join(ev, left_type="purchase", right_type="click")


def q_hopping_windows(sf_dir: str):
    """(event_type, window_start, n, value_sum): 1-hour windows hopping
    every 30 min — each event in exactly two overlapping windows."""
    from graphsetintersection_ray.stages.streaming import hopping_window_agg

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return hopping_window_agg(ev)


def q_range_join(sf_dir: str):
    """(purchase_id, n_errors_1h): errors by the same user within the
    hour before each purchase (event-time range join, zero-counts
    included)."""
    from graphsetintersection_ray.stages.streaming import range_join_counts

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return range_join_counts(ev, left_type="purchase", right_type="error")


def q_media_decode(sf_dir: str):
    """(doc_id, n_samples, rms): REAL byte-level media decode — each doc
    carries a deterministic PCM16 WAV payload; DecodeStage parses the
    RIFF container with pure NumPy and emits normalized samples, reduced
    here to length + RMS amplitude (rounded to 6)."""
    from graphsetintersection_ray.stages.multimodal import (
        DecodeStage,
        attach_media_payload,
    )

    payloads = attach_media_payload(_docs(sf_dir), kind="wav")
    frames = payloads.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=256, concurrency=2
    )

    def summarize(t: pa.Table) -> pa.Table:
        lists = t["frame"].combine_chunks()
        vals = lists.values.to_numpy(zero_copy_only=False)
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        sq = np.add.reduceat(vals.astype(np.float64) ** 2, offs[:-1])
        rms = np.sqrt(sq / np.maximum(lens, 1))
        from graphsetintersection_ray.functions.kernels import round_half_away

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_samples": pa.array(lens, pa.int64()),
                "rms": pa.array(round_half_away(rms, 6), pa.float64()),
            }
        )

    return frames.map_batches(summarize, batch_format="pyarrow")


def q_media_metadata(sf_dir: str):
    from graphsetintersection_ray.stages.multimodal import (
        MediaMetadata,
        attach_binary_payload,
    )

    payloads = attach_binary_payload(_docs(sf_dir))
    return payloads.map_batches(
        MediaMetadata, batch_format="pyarrow", batch_size=256, concurrency=2
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
    "edge_support": q_edge_support,
    "link_scores": q_link_scores,
    "clustering_coeff": q_clustering_coeff,
    "random_walks": q_random_walks,
    "skipgram_pairs": q_skipgram_pairs,
    "degree_hist": q_degree_hist,
    "assortativity": q_assortativity,
    "link_candidates": q_link_candidates,
    "two_hop_counts": q_two_hop_counts,
    "coreness": q_coreness,
    "trussness": q_trussness,
    "pagerank_fixed": q_pagerank_fixed,
    "temporal_pagerank": q_temporal_pagerank,
    "temporal_cc": q_temporal_cc,
    "temporal_triangles": q_temporal_triangles,
    "katz_fixed": q_katz_fixed,
    "ppr_fixed": q_ppr_fixed,
    "hits": q_hits,
    "pagerank_weighted": q_pagerank_weighted,
    "topo_levels": q_topo_levels,
    "tool_flow_scc": q_tool_flow_scc,
    "tool_transitions": q_tool_transitions,
    "tool_pmi": q_tool_pmi,
    "scc_sizes": q_scc_sizes,
    "conv_flatten": q_conv_flatten,
    "conv_dedup": q_conv_dedup,
    "conv_near_dups": q_conv_near_dups,
    "conv_pack": q_conv_pack,
    "pack_stats": q_pack_stats,
    "role_alternation": q_role_alternation,
    "tool_entropy": q_tool_entropy,
    "conv_segments": q_conv_segments,
    "conv_length_hist": q_conv_length_hist,
    "turn_latency": q_turn_latency,
    "lang_mix_weights": q_lang_mix_weights,
    "mis_luby": q_mis_luby,
    "graph_coloring": q_graph_coloring,
    "approx_triangles": q_approx_triangles,
    "densest_subgraph": q_densest_subgraph,
    "eigenvector": q_eigenvector,
    "neighborhood_function": q_neighborhood_function,
    "effective_diameter": q_effective_diameter,
    "pagerank": q_pagerank,
    "connected_components": q_connected_components,
    "component_sizes": q_component_sizes,
    "square_count": q_square_count,
    "four_clique_count": q_four_clique_count,
    "transitivity": q_transitivity,
    "rich_club": q_rich_club,
    "neighbor_sample": q_neighbor_sample,
    "khop_sample": q_khop_sample,
    "modularity": q_modularity,
    "label_propagation": q_label_propagation,
    "bfs_distances": q_bfs_distances,
    "leaf_count": q_leaf_count,
    "degree_order": q_degree_order,
    "alpha_weights": q_alpha_weights,
    "hybrid_order": q_hybrid_order,
    "gro_order": q_gro_order,
    "bp_order": q_bp_order,
    "dfs_order": q_dfs_order,
    "rcm_order": q_rcm_order,
    "bfsr_order": q_bfsr_order,
    "slashburn_order": q_slashburn_order,
    "bignode_select": q_bignode_select,
    "hub_subgraph": q_hub_subgraph,
    "negative_edges": q_negative_edges,
    "vertex_labels": q_vertex_labels,
    "subgraph_match": q_subgraph_match,
    "maximal_cliques": q_maximal_cliques,
    "comp_ratio": q_comp_ratio,
    "lineitem_agg": q_lineitem_agg,
    "customer_revenue": q_customer_revenue,
    "local_supplier_volume": q_local_supplier_volume,
    "top_parts": q_top_parts,
    "shipping_priority": q_shipping_priority,
    "token_count": q_token_count,
    "token_count_bpe": q_token_count_bpe,
    "sequence_pack": q_sequence_pack,
    "doc_chunks": q_doc_chunks,
    "text_quality": q_text_quality,
    "vocab_growth": q_vocab_growth,
    "quality_logistic": q_quality_logistic,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "winnow_fingerprint": q_winnow_fingerprint,
    "winnow_dup_pairs": q_winnow_dup_pairs,
    "dedup_exact": q_dedup_exact,
    "jaccard_pairs": q_jaccard_pairs,
    "minhash_pairs": q_minhash_pairs,
    "dedup_clusters": q_dedup_clusters,
    "dedup_survivors": q_dedup_survivors,
    "simhash_pairs": q_simhash_pairs,
    "knn_topk": q_knn_topk,
    "knn_lsh": q_knn_lsh,
    "knn_ivf": q_knn_ivf,
    "kmeans_clusters": q_kmeans_clusters,
    "embedding_dups": q_embedding_dups,
    "embedding_dups_lsh": q_embedding_dups_lsh,
    "media_metadata": q_media_metadata,
    "event_windows": q_event_windows,
    "sessionize": q_sessionize,
    "retention_cohorts": q_retention_cohorts,
    "daily_active": q_daily_active,
    "funnel_counts": q_funnel_counts,
    "conversion_time": q_conversion_time,
    "source_quality": q_source_quality,
    "oov_rate": q_oov_rate,
    "unigram_logprob": q_unigram_logprob,
    "bigram_logprob": q_bigram_logprob,
    "ngram_novelty": q_ngram_novelty,
    "corpus_report": q_corpus_report,
    "approx_distinct": q_approx_distinct,
    "weighted_sample": q_weighted_sample,
    "centroid_sim": q_centroid_sim,
    "sample_docs": q_sample_docs,
    "stratified_sample": q_stratified_sample,
    "token_quantiles": q_token_quantiles,
    "top_docs_per_lang": q_top_docs_per_lang,
    "decontaminate": q_decontaminate,
    "ngram_decontaminate": q_ngram_decontaminate,
    "ngram_counts": q_ngram_counts,
    "bloom_dedup": q_bloom_dedup,
    "pii_scrub": q_pii_scrub,
    "repetition_ratio": q_repetition_ratio,
    "curation_filter": q_curation_filter,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "hopping_windows": q_hopping_windows,
    "tfidf_top_terms": q_tfidf_top_terms,
    "bm25_scores": q_bm25_scores,
    "media_decode": q_media_decode,
    "image_decode": q_image_decode,
    "betweenness": q_betweenness,
    "closeness": q_closeness,
    "harmonic": q_harmonic,
}

_STOP_ALTERNATION = "|".join(("the", "and", "of", "to", "is"))

# the BPE/whitespace patterns are raw strings of portable regex syntax —
# single-quote-escaped they are byte-identical inside a DuckDB literal
from graphsetintersection_ray.stages.text import (  # noqa: E402
    BPE_TOKEN_RE as _BPE_RE,
    WS_TOKEN_RE as _WS_RE,
)

_BPE_RE_SQL = _BPE_RE.replace("'", "''")

_LANG_SCORES_SQL = """
ls AS (
  SELECT doc_id, lower(text) AS lt FROM documents
),
sc AS (
  SELECT doc_id,
    (CASE WHEN regexp_matches(lt, '\\bthe\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\band\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\bof\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\bis\\b') THEN 1 ELSE 0 END) AS s_en,
    (CASE WHEN regexp_matches(lt, '\\bder\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\bdie\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\bund\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\bist\\b') THEN 1 ELSE 0 END) AS s_de,
    (CASE WHEN regexp_matches(lt, '\\bel\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\blos\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\by\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\bes\\b') THEN 1 ELSE 0 END) AS s_es,
    (CASE WHEN regexp_matches(lt, '\\ble\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\bla\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\bet\\b') THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lt, '\\best\\b') THEN 1 ELSE 0 END) AS s_fr
  FROM ls
)
"""

WINNOW_MIN_SHARED = 8  # pair thresholds for winnow_dup_pairs (+ oracle)
WINNOW_MIN_OVERLAP = 0.5

# Winnowing CTE chain (shared by winnow_fingerprint / winnow_dup_pairs):
# k-gram polynomial hashes at every position of the normalized text,
# then per window of 4 the minimum hash with rightmost tie-breaking.
_WINNOW_SQL = """norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
  FROM documents
),
h AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         (ord(substr(s, CAST(i AS INTEGER), 1)) * 4362470401
        + ord(substr(s, CAST(i + 1 AS INTEGER), 1)) * 16974593
        + ord(substr(s, CAST(i + 2 AS INTEGER), 1)) * 66049
        + ord(substr(s, CAST(i + 3 AS INTEGER), 1)) * 257
        + ord(substr(s, CAST(i + 4 AS INTEGER), 1))) % 1000000007 AS hv
  FROM norm, unnest(range(1, length(s) - 3)) AS u(i)
  WHERE length(s) >= 8
),
win AS (
  SELECT doc_id, CAST(t AS BIGINT) AS t
  FROM norm, unnest(range(1, length(s) - 6)) AS u(t)
  WHERE length(s) >= 8
),
sel AS (
  SELECT w.doc_id,
         min_by(h.pos, h.hv * 2097152 + (2097152 - h.pos)) AS pos,
         min(h.hv) AS fp
  FROM win w
  JOIN h ON h.doc_id = w.doc_id AND h.pos BETWEEN w.t AND w.t + 3
  GROUP BY w.doc_id, w.t
)"""

_SHINGLES_SQL = """
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-zA-Z0-9_]+') AS ws
  FROM documents
),
sh3 AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM toks
),
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM sh3
    UNION ALL
    SELECT doc_id, array_to_string(ws, ' ') AS s FROM toks
      WHERE len(ws) BETWEEN 1 AND 2
  )
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""

def _hits_oracle_sql(k: int) -> str:
    """Chained-CTE replay of k unnormalized HITS iterations over the
    canonical directed ``edges`` + one final L2 normalization.

    Every CTE is declared MATERIALIZED: the chain references ``edges`` /
    ``deg`` ~2k times and each a_i/h_i twice, and DuckDB's default CTE
    inlining re-derives the whole transcript→graph prelude per reference
    — exponential work/memory at sf0.01+ without the hint."""
    parts = ["h0 AS (SELECT v, CAST(1.0 AS DOUBLE) AS hub FROM deg)"]
    for i in range(1, k + 1):
        parts.append(
            f"a{i} AS (SELECT d.v, coalesce(s.x, 0.0) AS auth FROM deg d "
            f"LEFT JOIN (SELECT e.dst AS v, sum(h.hub) AS x FROM edges e "
            f"JOIN h{i - 1} h ON h.v = e.src GROUP BY e.dst) s ON s.v = d.v)"
        )
        parts.append(
            f"h{i} AS (SELECT d.v, coalesce(s.x, 0.0) AS hub FROM deg d "
            f"LEFT JOIN (SELECT e.src AS v, sum(a.auth) AS x FROM edges e "
            f"JOIN a{i} a ON a.v = e.dst GROUP BY e.src) s ON s.v = d.v)"
        )
    parts.append(
        f"hits AS (SELECT h.v, h.hub, a.auth FROM h{k} h JOIN a{k} a ON a.v = h.v)"
    )
    parts.append(
        "nrm AS (SELECT sqrt(sum(hub*hub)) AS nh, sqrt(sum(auth*auth)) AS na "
        "FROM hits)"
    )
    import re

    sql = _with(
        ", ".join(parts)
        + " SELECT v, round(hub / nh, 6) AS hub, round(auth / na, 6) AS auth "
        "FROM hits, nrm"
    )
    return re.sub(r"(\w+ AS) \(", r"\1 MATERIALIZED (", sql)


# duplicate clusters: transitive closure over the exact-jaccard pair
# graph (WITH RECURSIVE), cluster label = min doc_id in the component
_DUP_CLUSTERS_SQL = (
    "WITH RECURSIVE "
    + _SHINGLES_SQL
    + """,
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN cnt ca ON ca.doc_id = doc_a
  JOIN cnt cb ON cb.doc_id = doc_b
  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM prs
  UNION
  SELECT doc_b, doc_a FROM prs
),
reach(v, w) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.v, u.b FROM reach r JOIN und u ON u.a = r.w
),
roots AS (
  SELECT v AS doc_id, least(v, min(w)) AS cluster FROM reach GROUP BY v
)
"""
)

# k-core decomposition as a recursive peel carried on the EDGE set: each
# iteration recomputes remaining degrees with window functions over the
# working table; vertices with deg < k drop out as tombstone rows
# (core = k-1), vertices orphaned of every edge at threshold k tombstone
# at the same k (their residual degree hits 0 < k in the cascade).
# Matches cliques.py::coreness (Matula-Beck, deg <= k ⟺ deg < k+1).
_CORENESS_SQL = _with("""
peelres AS (
  WITH RECURSIVE peel(a, b, k, tomb) AS (
    SELECT src, dst, CAST(1 AS BIGINT), false FROM sym
    UNION ALL
    (
      WITH cur AS (SELECT a, b, k FROM peel WHERE NOT tomb),
      w1 AS (SELECT a, b, k, count(*) OVER (PARTITION BY a) AS da FROM cur),
      w2 AS (SELECT a, b, k, da, count(*) OVER (PARTITION BY b) AS db,
                    min(da) OVER () AS mindeg FROM w1)
      SELECT * FROM (
        SELECT a, b, CASE WHEN mindeg < k THEN k ELSE k + 1 END AS k,
               false AS tomb
        FROM w2 WHERE mindeg >= k OR (da >= k AND db >= k)
        UNION ALL
        SELECT DISTINCT a, NULL, k, true FROM w2 WHERE mindeg < k AND da < k
        UNION ALL
        SELECT a, NULL, k, true FROM w2
        WHERE mindeg < k AND da >= k
        GROUP BY a, k HAVING count(*) FILTER (WHERE db >= k) = 0
      )
    )
  )
  SELECT a AS v, max(k) - 1 AS core FROM peel WHERE tomb GROUP BY a
)
SELECT d.v, coalesce(p.core, 0) AS core
FROM deg d LEFT JOIN peelres p ON p.v = d.v
""")

# k-truss decomposition as a recursive support peel over canonical edges:
# each iteration recomputes per-edge triangle support (self-join of the
# symmetric working set on the shared neighbor), lifts k to min_support+2
# when the cascade drains a level, and tombstones edges with
# support <= k-2 at the lifted k. Matches linkpred.py::trussness.
_TRUSSNESS_SQL = _with("""
trussres AS (
  WITH RECURSIVE peel(a, b, k, tomb) AS (
    SELECT src, dst, CAST(2 AS BIGINT), false FROM edges
    UNION ALL
    (
      WITH cur AS (SELECT a, b, k FROM peel WHERE NOT tomb),
      s AS (SELECT a, b FROM cur UNION ALL SELECT b, a FROM cur),
      tri AS (
        SELECT s1.a AS a, s2.a AS b, count(*) AS supp
        FROM s s1 JOIN s s2 ON s1.b = s2.b AND s1.a < s2.a
        GROUP BY s1.a, s2.a
      ),
      sup AS (
        SELECT e.a, e.b, e.k, coalesce(t.supp, 0) AS supp
        FROM cur e LEFT JOIN tri t ON t.a = e.a AND t.b = e.b
      ),
      m AS (SELECT min(supp) AS smin FROM sup)
      SELECT a, b, nk, (supp <= nk - 2) AS tomb FROM (
        SELECT sup.a, sup.b, sup.supp,
               CASE WHEN m.smin > sup.k - 2 THEN m.smin + 2 ELSE sup.k END
                 AS nk
        FROM sup, m
      )
    )
  )
  SELECT a AS u, b AS v, max(k) AS truss FROM peel WHERE tomb GROUP BY a, b
)
SELECT u, v, truss FROM trussres
""")

ORACLE_SQL = {
    "transcripts": TRANSCRIPTS_SQL,
    # tool-flow digraph: node = conv:tool, edge = consecutive-turn tool
    # transition (cyclic — unlike the canonical src<dst DAG). SCC id =
    # min member key via mutual reachability over the recursive closure
    # (closure rows stay conv-local, so it is cheap at sf scale).
    "tool_flow_scc": _with(
        """fnodes AS (SELECT DISTINCT conv_id || ':' || tool AS k FROM t),
fseq AS (
  SELECT conv_id, tool,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
  FROM t
),
fedges AS (
  SELECT DISTINCT conv_id || ':' || tool AS s, conv_id || ':' || nxt AS d
  FROM fseq WHERE nxt IS NOT NULL AND nxt <> tool
),
freach AS (
  WITH RECURSIVE r(v, w) AS (
    SELECT k, k FROM fnodes
    UNION
    SELECT r.v, e.d FROM r JOIN fedges e ON e.s = r.w
  )
  SELECT v, w FROM r
)
SELECT a.v AS node, min(a.w) AS scc
FROM freach a JOIN freach b ON b.v = a.w AND b.w = a.v
GROUP BY a.v"""
    ),
    "tool_transitions": _with(
        """fseq AS (
  SELECT tool,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
  FROM t
)
SELECT tool AS src_tool, nxt AS dst_tool, count(*) AS n
FROM fseq WHERE nxt IS NOT NULL
GROUP BY tool, nxt"""
    ),
    "tool_pmi": _with(
        """ctp AS (SELECT DISTINCT conv_id, tool FROM t),
ncv AS (SELECT count(DISTINCT conv_id) AS nc FROM t),
tup AS (SELECT tool, count(*) AS n_u FROM ctp GROUP BY tool),
prp AS (
  SELECT a.tool AS tool_a, b.tool AS tool_b, count(*) AS n_uv
  FROM ctp a JOIN ctp b ON a.conv_id = b.conv_id AND a.tool < b.tool
  GROUP BY a.tool, b.tool
)
SELECT tool_a, tool_b, n_uv,
       round(ln(CAST(n_uv AS DOUBLE) * nc / (ta.n_u * tb.n_u)), 6) AS pmi
FROM prp JOIN tup ta ON ta.tool = prp.tool_a
         JOIN tup tb ON tb.tool = prp.tool_b, ncv"""
    ),
    "scc_sizes": _with(
        """fnodes AS (SELECT DISTINCT conv_id || ':' || tool AS k FROM t),
fseq AS (
  SELECT conv_id, tool,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
  FROM t
),
fedges AS (
  SELECT DISTINCT conv_id || ':' || tool AS s, conv_id || ':' || nxt AS d
  FROM fseq WHERE nxt IS NOT NULL AND nxt <> tool
),
freach AS (
  WITH RECURSIVE r(v, w) AS (
    SELECT k, k FROM fnodes
    UNION
    SELECT r.v, e.d FROM r JOIN fedges e ON e.s = r.w
  )
  SELECT v, w FROM r
),
fscc AS (
  SELECT a.v AS node, min(a.w) AS scc
  FROM freach a JOIN freach b ON b.v = a.w AND b.w = a.v
  GROUP BY a.v
),
szs AS (SELECT scc, count(*) AS sz FROM fscc GROUP BY scc)
SELECT sz AS size, count(*) AS n_sccs FROM szs GROUP BY sz"""
    ),
    "conv_flatten": _with(
        """SELECT conv_id,
       count(*) AS n_turns,
       CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_user_turns,
       count(DISTINCT tool) AS n_tools,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
         AS conv_text
FROM t GROUP BY conv_id"""
    ),
    "conv_dedup": _with(
        """cfsig AS (
  SELECT conv_id,
         string_agg(role || ':' || tool, '>' ORDER BY turn_idx) AS sig
  FROM t GROUP BY conv_id
)
SELECT conv_id,
       min(conv_id) OVER (PARTITION BY sig) AS canonical_conv,
       count(*) OVER (PARTITION BY sig) AS group_size
FROM cfsig"""
    ),
    "conv_near_dups": _with(
        """cfr AS (
  SELECT conv_id,
         string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS text
  FROM t GROUP BY conv_id
),
ctoks AS (
  SELECT conv_id, regexp_extract_all(lower(text), '[a-zA-Z0-9_]+') AS ws
  FROM cfr
),
csh3 AS (
  SELECT conv_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
  FROM ctoks
),
csh AS (
  SELECT DISTINCT conv_id, s FROM (
    SELECT conv_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
    FROM csh3
    UNION ALL
    SELECT conv_id, array_to_string(ws, ' ') FROM ctoks
      WHERE len(ws) BETWEEN 1 AND 2
  )
),
ccnt AS (SELECT conv_id, count(*) AS n FROM csh GROUP BY conv_id),
cinter AS (
  SELECT a.conv_id AS conv_a, b.conv_id AS conv_b, count(*) AS i
  FROM csh a JOIN csh b ON a.s = b.s AND a.conv_id < b.conv_id
  GROUP BY 1, 2
)
SELECT conv_a, conv_b,
       round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
FROM cinter
JOIN ccnt ca ON ca.conv_id = conv_a
JOIN ccnt cb ON cb.conv_id = conv_b
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2"""
    ),
    "pack_stats": _with(
        f"""cfp AS (
  SELECT conv_id, CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM t GROUP BY conv_id
),
ckey AS (
  SELECT conv_id, n_chars,
         CAST(regexp_extract(conv_id, '^c(\\d+)_(\\d+)$', 1) AS BIGINT)
           * 1048576
         + CAST(regexp_extract(conv_id, '^c(\\d+)_(\\d+)$', 2) AS BIGINT)
           AS k
  FROM cfp
),
sc AS (
  SELECT n_chars,
         CAST(COALESCE(sum(n_chars) OVER (
           ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM ckey
),
pk AS (
  SELECT CAST(start_offset // {CONV_PACK_SEQ_LEN} AS BIGINT) AS pack_id,
         least(start_offset + n_chars,
               (start_offset // {CONV_PACK_SEQ_LEN} + 1)
                 * {CONV_PACK_SEQ_LEN}) - start_offset AS used
  FROM sc
)
SELECT pack_id, count(*) AS n_convs,
       CAST(sum(used) AS BIGINT) AS used_chars,
       round(CAST(sum(used) AS DOUBLE) / {CONV_PACK_SEQ_LEN}, 6)
         AS fill_ratio
FROM pk GROUP BY pack_id"""
    ),
    "role_alternation": _with(
        """ra AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM t
)
SELECT conv_id, count(*) AS n_turns,
       CAST(sum(CASE WHEN role = prev THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_role_adj
FROM ra GROUP BY conv_id"""
    ),
    "conv_pack": _with(
        """cfp AS (
  SELECT conv_id, CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM t GROUP BY conv_id
),
ckey AS (
  SELECT conv_id, n_chars,
         CAST(regexp_extract(conv_id, '^c(\\d+)_(\\d+)$', 1) AS BIGINT)
           * 1048576
         + CAST(regexp_extract(conv_id, '^c(\\d+)_(\\d+)$', 2) AS BIGINT)
           AS k
  FROM cfp
),
sc AS (
  SELECT conv_id, n_chars,
         CAST(COALESCE(sum(n_chars) OVER (
           ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM ckey
)
SELECT conv_id, n_chars, start_offset,
       CAST(start_offset // 8192 AS BIGINT) AS pack_id
FROM sc"""
    ),
    "tool_entropy": _with(
        """tc AS (
  SELECT conv_id, tool, count(*) AS k FROM t GROUP BY conv_id, tool
),
te AS (
  SELECT conv_id, sum(k) AS n, count(*) AS n_tools,
         sum(k * ln(k)) AS klnk
  FROM tc GROUP BY conv_id
)
SELECT conv_id, CAST(n AS BIGINT) AS n_turns, n_tools,
       round(ln(n) - klnk / n, 6) AS tool_entropy
FROM te"""
    ),
    "conv_length_hist": _with(
        """clh AS (SELECT conv_id, count(*) AS n_turns FROM t GROUP BY conv_id)
SELECT n_turns, count(*) AS n_convs FROM clh GROUP BY n_turns"""
    ),
    "conv_segments": _with(
        """sg AS (
  SELECT conv_id, turn_idx,
         ts - lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           > INTERVAL 1 HOUR AS gap
  FROM t
)
SELECT conv_id, turn_idx,
       CAST(sum(CASE WHEN gap THEN 1 ELSE 0 END) OVER (
         PARTITION BY conv_id ORDER BY turn_idx
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS segment_id
FROM sg"""
    ),
    "turn_latency": _with(
        """g AS (
  SELECT conv_id,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx))
           AS gap_us
  FROM t
)
SELECT conv_id, count(*) AS n_gaps,
       round(CAST(sum(gap_us) AS DOUBLE) / (1000000.0 * count(*)), 6)
         AS mean_gap_s,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY conv_id"""
    ),
    "lang_mix_weights": (
        "WITH lc AS (SELECT lang, count(*) AS n_docs FROM documents "
        "GROUP BY lang) "
        "SELECT lang, n_docs, "
        "round(sqrt(n_docs) / sum(sqrt(n_docs)) OVER (), 6) AS weight "
        "FROM lc"
    ),
    "coreness": _CORENESS_SQL,
    "trussness": _TRUSSNESS_SQL,
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
    "random_walks": _with(
        _WALK_SQL
        + """
SELECT walk_id, CAST(pos AS BIGINT) AS pos, v FROM walk"""
    ),
    "skipgram_pairs": _with(
        _WALK_SQL
        + """
SELECT w1.v AS center, w2.v AS context, count(*) AS n
FROM walk w1 JOIN walk w2
  ON w1.walk_id = w2.walk_id AND w1.pos <> w2.pos
 AND abs(w1.pos - w2.pos) <= 2
GROUP BY center, context"""
    ),
    "clustering_coeff": _with(
        """tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM edges e1
  JOIN edges e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
tpv AS (
  SELECT v, count(*) AS t FROM (
    SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY v
)
SELECT d.v AS v,
       round(CASE WHEN d.degree >= 2
                  THEN (2.0 * coalesce(tpv.t, 0)) / (d.degree * (d.degree - 1))
                  ELSE 0.0 END, 6) AS lcc
FROM deg d LEFT JOIN tpv ON tpv.v = d.v"""
    ),
    # Q = intra/m − Σ_c (d_c/2m)² over the entity-type partition; both
    # reduce terms are exact integer sums, one float expression at the end
    "modularity": _with(
        """labv AS (
  SELECT vid, CASE substr(key, 1, 1) WHEN 'a' THEN 0 WHEN 'c' THEN 1
              WHEN 'r' THEN 2 ELSE 3 END AS label
  FROM verts
),
intra AS (
  SELECT count(*) AS ie FROM edges e
  JOIN labv a ON a.vid = e.src
  JOIN labv b ON b.vid = e.dst
  WHERE a.label = b.label
),
dsum AS (
  SELECT l.label, sum(d.degree) AS dc
  FROM deg d JOIN labv l ON l.vid = d.v GROUP BY l.label
),
em AS (SELECT count(*) AS m FROM edges)
SELECT round(
  ie * 1.0 / m
  - (SELECT sum(dc * dc) FROM dsum) * 1.0 / (4.0 * m * m),
  6) AS modularity
FROM intra, em"""
    ),
    # each 4-clique {a<b<c<d} matched exactly once on canonical ids
    "four_clique_count": _with(
        """SELECT count(*) AS cliques4 FROM edges ab
JOIN edges ac ON ac.src = ab.src AND ac.dst > ab.dst
JOIN edges ad ON ad.src = ab.src AND ad.dst > ac.dst
JOIN edges bc ON bc.src = ab.dst AND bc.dst = ac.dst
JOIN edges bd ON bd.src = ab.dst AND bd.dst = ad.dst
JOIN edges cd ON cd.src = ac.dst AND cd.dst = ad.dst"""
    ),
    "transitivity": _with(
        """tri AS (
  SELECT count(*) AS t FROM edges e1
  JOIN edges e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
wedg AS (SELECT sum(degree * (degree - 1) // 2) AS w FROM deg)
SELECT round(CASE WHEN w > 0 THEN 3.0 * t / w ELSE 0.0 END, 6)
  AS transitivity
FROM tri, wedg"""
    ),
    "rich_club": _with(
        """emin AS (
  SELECT least(da.degree, db.degree) AS md
  FROM edges e
  JOIN deg da ON da.v = e.src
  JOIN deg db ON db.v = e.dst
),
ks AS (
  SELECT DISTINCT unnest(generate_series(0, degree - 1)) AS k FROM deg
),
curve AS (
  SELECT k,
         (SELECT count(*) FROM deg WHERE degree > k) AS n_k,
         (SELECT count(*) FROM emin WHERE md > k) AS e_k
  FROM ks
)
SELECT k, round(2.0 * e_k / (n_k * (n_k - 1.0)), 6) AS rich_club
FROM curve WHERE n_k >= 2"""
    ),
    "neighbor_sample": _with(
        """SELECT src AS u, dst AS v FROM (
  SELECT src, dst, row_number() OVER (
    PARTITION BY src
    ORDER BY (dst * 2654435761 + src * 40503) % 1000000007, dst
  ) AS rn FROM sym
) WHERE rn <= 3"""
    ),
    "khop_sample": _with(
        """s1 AS (
  SELECT src AS u, dst AS v FROM (
    SELECT src, dst, row_number() OVER (
      PARTITION BY src
      ORDER BY (dst * 2654435761 + src * 40503) % 1000000007, dst
    ) AS rn FROM sym
  ) WHERE rn <= 3
),
s2 AS (
  SELECT src AS w, dst AS x FROM (
    SELECT src, dst, row_number() OVER (
      PARTITION BY src
      ORDER BY (dst * 2654435761 + src * 40503) % 1000000007, dst
    ) AS rn FROM sym
  ) WHERE rn <= 2
)
SELECT DISTINCT u, hop, v FROM (
  SELECT u, CAST(1 AS BIGINT) AS hop, v FROM s1
  UNION ALL
  SELECT s1.u, CAST(2 AS BIGINT) AS hop, s2.x AS v
  FROM s1 JOIN s2 ON s2.w = s1.v
)"""
    ),
    # #C4 = sum over unordered pairs of C(common-neighbors, 2) / 2 —
    # every 4-cycle has exactly two opposite-corner pairs
    "square_count": _with(
        """w AS (
  SELECT e1.dst AS a, e2.dst AS b FROM sym e1
  JOIN sym e2 ON e2.src = e1.src AND e2.dst > e1.dst
),
p2 AS (SELECT a, b, count(*) AS n FROM w GROUP BY a, b)
SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) // 2 AS BIGINT) AS squares
FROM p2"""
    ),
    "edge_support": _with(
        """tri_e AS (
  SELECT e.src AS u, e.dst AS v
  FROM edges e
  JOIN sym a ON a.src = e.src
  JOIN sym b ON b.src = e.dst AND b.dst = a.dst
)
SELECT e.src AS u, e.dst AS v, CAST(count(te.u) AS BIGINT) AS support
FROM edges e LEFT JOIN tri_e te ON te.u = e.src AND te.v = e.dst
GROUP BY e.src, e.dst"""
    ),
    "link_scores": _with(
        """cnw AS (
  SELECT e.src AS u, e.dst AS v, a.dst AS w
  FROM edges e
  JOIN sym a ON a.src = e.src
  JOIN sym b ON b.src = e.dst AND b.dst = a.dst
),
agg AS (
  SELECT cnw.u AS u, cnw.v AS v,
         count(*) AS cn, sum(1.0 / ln(d.degree)) AS aa
  FROM cnw JOIN deg d ON d.v = cnw.w
  GROUP BY cnw.u, cnw.v
)
SELECT e.src AS u, e.dst AS v,
       CAST(coalesce(agg.cn, 0) AS BIGINT) AS cn,
       round(coalesce(agg.cn, 0)
             / (du.degree + dv.degree - coalesce(agg.cn, 0)), 6) AS jaccard,
       round(coalesce(agg.aa, 0.0), 6) AS adamic_adar
FROM edges e
JOIN deg du ON du.v = e.src
JOIN deg dv ON dv.v = e.dst
LEFT JOIN agg ON agg.u = e.src AND agg.v = e.dst"""
    ),
    "degree_hist": _with(
        """SELECT degree, CAST(count(*) AS BIGINT) AS cnt
FROM deg GROUP BY degree"""
    ),
    "assortativity": _with(
        """s AS (
  SELECT du.degree AS x, dv.degree AS y
  FROM sym JOIN deg du ON du.v = sym.src JOIN deg dv ON dv.v = sym.dst
),
agg AS (
  SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
         sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
  FROM s
)
SELECT round((m*sxy - sx*sy)
             / sqrt(CAST((m*sxx - sx*sx) AS DOUBLE)
                    * CAST((m*syy - sy*sy) AS DOUBLE)), 6) AS assortativity
FROM agg"""
    ),
    "link_candidates": _with(
        """wp AS (
  SELECT a.dst AS u, b.dst AS w
  FROM sym a JOIN sym b ON b.src = a.src AND a.dst < b.dst
),
cnt AS (SELECT u, w, count(*) AS cn FROM wp GROUP BY u, w)
SELECT cnt.u AS u, cnt.w AS v, CAST(cnt.cn AS BIGINT) AS cn
FROM cnt LEFT JOIN edges e ON e.src = cnt.u AND e.dst = cnt.w
WHERE e.src IS NULL
ORDER BY cn DESC, u, v LIMIT 50"""
    ),
    "two_hop_counts": _with(
        """SELECT a.src AS v, CAST(count(DISTINCT b.dst) AS BIGINT) AS two_hop
FROM sym a JOIN sym b ON b.src = a.dst AND b.dst <> a.src
GROUP BY a.src"""
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
    "temporal_pagerank": _with_temporal(
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
    "temporal_triangles": _with_temporal(
        "SELECT count(*) AS triangles FROM edges e1 "
        "JOIN edges e2 ON e2.src = e1.src AND e2.dst > e1.dst "
        "JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst"
    ),
    "temporal_cc": _with_temporal(
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
    # Exact replay of the engine's truncated Katz series: alpha = 2^-7
    # is dyadic so every term alpha^j (S^j . 1) is an exact binary
    # float on both sides; it = 0 seeds x = 0 (iteration 1 then lands
    # on the all-ones beta vector exactly as the engine does).
    "katz_fixed": _with(
        f"""kz AS (
  WITH RECURSIVE kr(v, score, it) AS (
    SELECT v, CAST(0.0 AS DOUBLE), 0 FROM deg
    UNION ALL
    SELECT s.dst,
           CAST(1.0 AS DOUBLE)
             + CAST(0.0078125 AS DOUBLE) * sum(p.score),
           p.it + 1
    FROM kr p
    JOIN sym s ON s.src = p.v
    WHERE p.it < {KATZ_ORACLE_ITERS}
    GROUP BY s.dst, p.it
  )
  SELECT v, score FROM kr WHERE it = {KATZ_ORACLE_ITERS}
)
SELECT v, round(score, 6) AS katz FROM kz"""
    ),
    "hits": _hits_oracle_sql(HITS_ORACLE_ITERS),
    # alpha-weighted PageRank: w_uv = a_u*a_v with a = sqrt(degree)
    # collapses to P(u->v) = a_v / S_u, S_u = sum of neighbor alphas —
    # an exact 5-iteration recursive replay of the engine's fixpoint
    "pagerank_weighted": _with(
        """salpha AS (SELECT v, sqrt(CAST(degree AS DOUBLE)) AS a FROM deg),
ssum AS (
  SELECT s.src AS v, sum(a2.a) AS sw
  FROM sym s JOIN salpha a2 ON a2.v = s.dst GROUP BY s.src
),
wpr AS (
  WITH RECURSIVE wr(v, x, it) AS (
    SELECT d.v, CAST(1.0 AS DOUBLE) / mx.n, 0 FROM deg d, nv mx
    UNION ALL
    SELECT s.dst,
           CAST(0.15 AS DOUBLE) / mx.n
             + CAST(0.85 AS DOUBLE) * aa.a * sum(p.x / su.sw),
           p.it + 1
    FROM wr p
    JOIN ssum su ON su.v = p.v
    JOIN sym s ON s.src = p.v
    JOIN salpha aa ON aa.v = s.dst, nv mx
    WHERE p.it < 5
    GROUP BY s.dst, aa.a, p.it, mx.n
  )
  SELECT v, x FROM wr WHERE it = 5
)
SELECT v, round(x, 6) AS score FROM wpr"""
    ),
    "topo_levels": _with(
        """lvls AS (
  WITH RECURSIVE lv(v, level) AS (
    SELECT v, CAST(0 AS BIGINT) FROM deg
    UNION
    SELECT e.dst, lv.level + 1
    FROM lv JOIN edges e ON e.src = lv.v
  )
  SELECT v, level FROM lv
)
SELECT v, MAX(level) AS level FROM lvls GROUP BY v"""
    ),
    "eigenvector": _eigen_oracle_sql(EIGEN_MULTIPLIES),
    "ppr_fixed": _with(
        f"""ppr AS (
  WITH RECURSIVE prr(v, score, it) AS (
    SELECT v,
           CASE WHEN v = {PPR_SOURCE} THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END,
           0
    FROM deg
    UNION ALL
    SELECT s.dst,
           CASE WHEN s.dst = {PPR_SOURCE} THEN CAST(0.15 AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END
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
SELECT v, round(score, 6) AS score FROM ppr"""
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
    "component_sizes": _with(
        """reach AS (
  WITH RECURSIVE r(v, w) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT r.v, s.dst FROM r JOIN sym s ON s.src = r.w
  )
  SELECT v, w FROM r
),
cc AS (SELECT v, min(w) AS component FROM reach GROUP BY v),
cs AS (SELECT component, count(*) AS size FROM cc GROUP BY component)
SELECT CAST(size AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_components
FROM cs GROUP BY size"""
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
    "bfs_distances": _with(
        """walk AS (
  WITH RECURSIVE w(v, dist) AS (
    SELECT CAST(0 AS INTEGER), CAST(0 AS BIGINT)
    UNION
    SELECT s.dst, w.dist + 1 FROM w JOIN sym s ON s.src = w.v
    WHERE w.dist < 64  -- cycle guard; must exceed the graph's eccentricity
  )
  SELECT v, dist FROM w
)
SELECT v, min(dist) AS dist FROM walk GROUP BY v"""
    ),
    "leaf_count": _with(
        "SELECT count(*) AS leaves FROM deg WHERE degree = 1"
    ),
    "degree_order": _with(
        "SELECT v, CAST(row_number() OVER (ORDER BY degree DESC, v) - 1 "
        "AS INTEGER) AS new_id FROM deg"
    ),
    "alpha_weights": _with(
        "tot AS (SELECT sum(2 * sqrt(degree)) AS s FROM deg) "
        "SELECT v, round(sqrt(degree) / (SELECT s FROM tot), 9) AS alpha_out, "
        "round(sqrt(degree) / (SELECT s FROM tot), 9) AS alpha_in FROM deg"
    ),
    "hybrid_order": _with(
        """hub AS (
  SELECT v FROM deg ORDER BY degree DESC, v LIMIT 1
),
walk AS (
  WITH RECURSIVE w(v, dist) AS (
    SELECT (SELECT v FROM hub), CAST(0 AS BIGINT)
    UNION
    SELECT s.dst, w.dist + 1 FROM w JOIN sym s ON s.src = w.v
    WHERE w.dist < 64
  )
  SELECT v, min(dist) AS dist FROM w GROUP BY v
)
SELECT d.v,
       CAST(row_number() OVER (
         ORDER BY coalesce(walk.dist, 1099511627776), d.degree DESC, d.v
       ) - 1 AS INTEGER) AS new_id
FROM deg d LEFT JOIN walk ON walk.v = d.v""",
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
    "hub_subgraph": _with(
        f"""hubs AS (SELECT v FROM deg WHERE degree >= {HUB_MIN_DEGREE})
SELECT e.src, e.dst
FROM edges e JOIN hubs a ON a.v = e.src JOIN hubs b ON b.v = e.dst"""
    ),
    "vertex_labels": _with(
        "SELECT vid AS v, CASE substr(key, 1, 1) WHEN 'a' THEN 0 "
        "WHEN 'c' THEN 1 WHEN 'r' THEN 2 ELSE 3 END AS label FROM verts"
    ),
    "subgraph_match": _with(
        """labv AS (
  SELECT vid, CASE substr(key, 1, 1) WHEN 'a' THEN 0 WHEN 'c' THEN 1
              WHEN 'r' THEN 2 ELSE 3 END AS label
  FROM verts
),
c_path AS (
  SELECT count(*) AS c FROM sym e1
  JOIN sym e2 ON e2.src = e1.dst
  JOIN labv l0 ON l0.vid = e1.src
  JOIN labv l1 ON l1.vid = e1.dst
  JOIN labv l2 ON l2.vid = e2.dst
  WHERE l0.label = 1 AND l1.label = 3 AND l2.label = 1
    AND e2.dst <> e1.src
),
c_ttt AS (
  SELECT count(*) AS c FROM sym a
  JOIN sym b ON b.src = a.src
  JOIN sym cc ON cc.src = a.dst AND cc.dst = b.dst
  JOIN labv l0 ON l0.vid = a.src
  JOIN labv l1 ON l1.vid = a.dst
  JOIN labv l2 ON l2.vid = b.dst
  WHERE l0.label = 3 AND l1.label = 3 AND l2.label = 3
),
c_ctt AS (
  SELECT count(*) AS c FROM sym a
  JOIN sym b ON b.src = a.src
  JOIN sym cc ON cc.src = a.dst AND cc.dst = b.dst
  JOIN labv l0 ON l0.vid = a.src
  JOIN labv l1 ON l1.vid = a.dst
  JOIN labv l2 ON l2.vid = b.dst
  WHERE l0.label = 1 AND l1.label = 3 AND l2.label = 3
)
SELECT 'path_ctc' AS query, (SELECT c FROM c_path) AS matches
UNION ALL SELECT 'tri_ctt', (SELECT c FROM c_ctt)
UNION ALL SELECT 'tri_ttt', (SELECT c FROM c_ttt)"""
    ),
    # every maximal clique exactly once: grow cliques by ascending vertex
    # id (so each clique has one growth path), keep the non-extensible
    # ones. list_has_all(adj(w), members) = "w adjacent to all members".
    "maximal_cliques": _with(
        """adjl AS (SELECT src, list(dst) AS ns FROM sym GROUP BY src),
cl AS (
  WITH RECURSIVE c(members, last) AS (
    SELECT [vid], vid FROM verts
    UNION ALL
    SELECT list_append(c.members, e.dst), e.dst
    FROM c
    JOIN sym e ON e.src = c.last AND e.dst > c.last
    JOIN adjl a ON a.src = e.dst
    WHERE list_has_all(a.ns, c.members)
  )
  SELECT members FROM c
)
SELECT count(*) AS mc_num, max(len(members)) AS max_clique_size
FROM cl WHERE NOT EXISTS (
  SELECT 1 FROM adjl a
  WHERE NOT list_contains(cl.members, a.src) AND list_has_all(a.ns, cl.members)
)"""
    ),
    "comp_ratio": _with(
        """pk AS (
  SELECT count(*) AS packs FROM (
    SELECT DISTINCT src, dst // 32 AS pack FROM sym)
),
ec AS (SELECT count(*) AS edges FROM sym)
SELECT packs, edges,
       round(CAST(packs AS DOUBLE) / edges, 6) AS comp_ratio
FROM pk, ec"""
    ),
    "lineitem_agg": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "customer_revenue": """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name""",
    "local_supplier_volume": """
SELECT n_name,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
                AS BIGINT)) / 1000000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name""",
    "top_parts": """
SELECT l_partkey, sum(l_quantity) AS total_qty
FROM lineitem GROUP BY l_partkey
ORDER BY total_qty DESC, l_partkey LIMIT 10""",
    "token_count": (
        "SELECT doc_id, len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) "
        "AS n_tokens FROM documents"
    ),
    "token_count_bpe": (
        f"SELECT doc_id, len(regexp_extract_all(text, '{_BPE_RE_SQL}')) "
        f"AS n_tokens, len(regexp_extract_all(text, '{_WS_RE}')) "
        "AS n_ws_tokens FROM documents"
    ),
    "sequence_pack": """
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
       start_offset // 2048 AS pack_id
FROM s""",
    "doc_chunks": """
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) AS n
  FROM documents
), k AS (
  SELECT doc_id, n,
         CASE WHEN n <= 0 THEN 0
              WHEN n <= 64 THEN 1
              ELSE CAST(CEIL((n - 64) / 48.0) AS BIGINT) + 1 END AS nc
  FROM t
)
SELECT k.doc_id, u.chunk_idx, u.chunk_idx * 48 AS chunk_start,
       LEAST(64, k.n - u.chunk_idx * 48) AS chunk_len
FROM k, UNNEST(range(k.nc)) AS u(chunk_idx)""",
    "text_quality": f"""
SELECT doc_id,
  length(text) AS n_chars,
  len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) AS n_tokens,
  round(CASE WHEN length(text) > 0
        THEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
             / length(text) ELSE 0 END, 6) AS alpha_ratio,
  round(CASE WHEN len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) > 0
        THEN CAST(len(regexp_extract_all(text, '\\b({_STOP_ALTERNATION})\\b'))
             AS DOUBLE) / len(regexp_extract_all(text, '[a-zA-Z0-9_]+'))
        ELSE 0 END, 6) AS stopword_ratio,
  round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1)
        * least(CAST(1.0 AS DOUBLE),
                len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) / 100.0),
        6) AS quality
FROM documents""",
    "vocab_growth": """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-zA-Z0-9_]+')) AS tok
  FROM documents
),
first_seen AS (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok),
m AS (SELECT max(doc_id) AS md FROM documents),
ts AS (
  SELECT DISTINCT (i * md) // 8 AS doc_threshold
  FROM m, (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8]) AS i)
)
SELECT doc_threshold,
       (SELECT count(*) FROM first_seen WHERE first_doc <= doc_threshold)
         AS vocab
FROM ts""",
    "quality_logistic": f"""
WITH feats AS (
  SELECT doc_id,
    round(CASE WHEN length(text) > 0
          THEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               AS DOUBLE) / length(text) ELSE 0 END, 6) AS alpha_ratio,
    round(CASE WHEN len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) > 0
          THEN CAST(len(regexp_extract_all(text,
               '\\b({_STOP_ALTERNATION})\\b'))
               AS DOUBLE) / len(regexp_extract_all(text, '[a-zA-Z0-9_]+'))
          ELSE 0 END, 6) AS stopword_ratio,
    len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) AS n_tokens
  FROM documents
)
SELECT doc_id,
  round(1.0 / (1.0 + exp(-(-1.0 + 2.5 * alpha_ratio + 1.5 * stopword_ratio
                           + 1.0 * least(1.0, n_tokens / 500.0)))), 6)
    AS lr_score
FROM feats""",
    "lang_id": "WITH "
    + _LANG_SCORES_SQL
    + """
SELECT doc_id,
  CASE
    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
    WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
    WHEN s_fr > 0 THEN 'fr'
    ELSE 'und'
  END AS lang_pred
FROM sc""",
    "fingerprint": (
        "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) "
        "AS fp FROM documents"
    ),
    # Winnowing replay: k-gram polynomial hashes at every position, then
    # per window of 4 the minimum hash with RIGHTMOST tie-breaking via a
    # composite min_by key (hash * 2^21 + (2^21 - pos); positions fit
    # 2^21 at oracle scale). 257^4 = 4362470401 etc.; 5 Horner terms of
    # code points stay < 2^55, exact in BIGINT like the engine's int64.
    "winnow_fingerprint": "WITH "
    + _WINNOW_SQL
    + "\nSELECT DISTINCT doc_id, pos, fp FROM sel",
    # Containment overlap over DISTINCT winnow hashes — the MOSS pair
    # report: shared = |fp_a ∩ fp_b|, overlap = shared / min set size.
    "winnow_dup_pairs": "WITH "
    + _WINNOW_SQL
    + f""",
fset AS (SELECT DISTINCT doc_id, fp FROM sel),
fcnt AS (SELECT doc_id, count(*) AS n FROM fset GROUP BY doc_id),
finter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM fset a JOIN fset b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, i AS shared,
       round(CAST(i AS DOUBLE) / least(ca.n, cb.n), 6) AS overlap
FROM finter
JOIN fcnt ca ON ca.doc_id = doc_a
JOIN fcnt cb ON cb.doc_id = doc_b
WHERE i >= {WINNOW_MIN_SHARED}
  AND CAST(i AS DOUBLE) / least(ca.n, cb.n) >= {WINNOW_MIN_OVERLAP}""",
    "dedup_exact": (
        "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"
    ),
    "jaccard_pairs": "WITH "
    + _SHINGLES_SQL
    + """,
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5""",
    # minhash output is the LSH-candidate subset of the exact jaccard
    # pairs, each verified with exact Jaccard; measured recall is 1.0 at
    # every sf scale (see q_minhash_pairs docstring), so the exact-jaccard
    # SQL doubles as its oracle.
    "minhash_pairs": "WITH "
    + _SHINGLES_SQL
    + """,
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5""",
    "dedup_clusters": _DUP_CLUSTERS_SQL + "SELECT doc_id, cluster FROM roots",
    "dedup_survivors": _DUP_CLUSTERS_SQL
    + """SELECT d.doc_id, d.text FROM documents d
LEFT JOIN roots r ON r.doc_id = d.doc_id
WHERE r.cluster IS NULL OR r.cluster = d.doc_id""",
    "knn_topk": """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings WHERE vec_id < 10),
n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id >= 10),
sims AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_cosine_similarity(q.emb, n.emb) AS sim
  FROM q, n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
  FROM sims
)
SELECT query_id, neighbor_id, round(sim, 6) AS sim FROM ranked WHERE rk <= 5""",
    "embedding_dups": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4""",
    "media_metadata": (
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
        "md5(text) AS checksum FROM documents"
    ),
    # integer milli-unit quantization makes every sum exact; the only
    # float ops are the final sqrt/divide on identical operands
    "centroid_sim": """
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000, 0) AS BIGINT)) AS emb
  FROM embeddings
),
ex AS (
  SELECT vec_id, label, i, emb[i] AS v
  FROM e, unnest(generate_series(1, len(emb))) AS g(i)
),
cent AS (SELECT label, i, sum(v) AS c FROM ex GROUP BY label, i),
cn AS (SELECT label, sum(c * c) AS n2 FROM cent GROUP BY label),
dots AS (
  SELECT x.vec_id, x.label,
         sum(x.v * c.c) AS dot, sum(x.v * x.v) AS n1
  FROM ex x JOIN cent c ON c.label = x.label AND c.i = x.i
  GROUP BY x.vec_id, x.label
)
SELECT d.vec_id, d.label,
       round(CASE WHEN d.n1 = 0 THEN 0.0
             ELSE CAST(d.dot AS DOUBLE)
                  / (sqrt(CAST(d.n1 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
             END, 6) AS centroid_sim
FROM dots d JOIN cn USING (label)""",
    "event_windows": """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n, round(sum(value), 2) AS value_sum
FROM events GROUP BY event_type, date_trunc('hour', ts)""",
    "daily_active": (
        "SELECT CAST(ts AS DATE) AS day, "
        "count(DISTINCT user_id) AS n_users FROM events GROUP BY day"
    ),
    "retention_cohorts": """
WITH fw AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
)
SELECT f.cohort_week, u.week, count(*) AS n_users
FROM uw u JOIN fw f ON f.user_id = u.user_id
GROUP BY f.cohort_week, u.week""",
    "sessionize": """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN pts IS NULL
                     OR ts - pts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sessions
FROM o GROUP BY user_id""",
    # greedy-earliest subsequence matching on per-user (ts, event_id)
    # ranks; stage k's match is the earliest step-k event after stage
    # k-1's match.
    "funnel_counts": """
WITH e AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
s1 AS (SELECT user_id, min(rn) AS r FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(rn) AS r FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND rn > s1.r GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(rn) AS r FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND rn > s2.r GROUP BY e.user_id)
SELECT * FROM (
  SELECT 1 AS stage, 'view' AS step, count(*) AS n_users FROM s1
  UNION ALL SELECT 2, 'click', count(*) FROM s2
  UNION ALL SELECT 3, 'purchase', count(*) FROM s3
)""",
    # earliest view per user (ties by event_id), then earliest purchase
    # strictly after it in the (ts, event_id) total order
    "conversion_time": """
WITH v AS (
  SELECT user_id, min(ts) AS vts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
ve AS (
  SELECT e.user_id, v.vts, min(e.event_id) AS vid
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts = v.vts
  WHERE e.event_type = 'view' GROUP BY e.user_id, v.vts
),
p AS (
  SELECT e.user_id, min(e.ts) AS pts
  FROM events e JOIN ve ON ve.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND (e.ts, e.event_id) > (ve.vts, ve.vid)
  GROUP BY e.user_id
)
SELECT p.user_id, epoch_us(p.pts) - epoch_us(ve.vts) AS conv_us
FROM p JOIN ve ON ve.user_id = p.user_id""",
    "source_quality": """
WITH q AS (
  SELECT source,
    CAST(round(round(
        CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1)
        * least(CAST(1.0 AS DOUBLE),
                len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) / 100.0),
      6) * 1000000, 0) AS BIGINT) AS qi
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(CAST(sum(qi) AS DOUBLE) / (1000000.0 * count(*)), 6)
         AS mean_quality
FROM q GROUP BY source""",
    "oov_rate": """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
  FROM documents
),
vc AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
vocab AS (SELECT t FROM vc ORDER BY n DESC, t LIMIT 20),
per AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END)
           AS n_oov
  FROM toks GROUP BY doc_id
)
SELECT doc_id, n_tokens, CAST(n_oov AS BIGINT) AS n_oov,
       round(CAST(n_oov AS DOUBLE) / n_tokens, 6) AS oov_rate
FROM per""",
    "unigram_logprob": """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
  FROM documents
),
vc AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
tot AS (SELECT count(*) AS total FROM toks),
lp AS (
  SELECT t,
         CAST(round(round(ln(CAST(n AS DOUBLE) / total), 6) * 1000000, 0)
              AS BIGINT) AS lpi
  FROM vc, tot
),
per AS (
  SELECT doc_id, count(*) AS n_tokens, sum(lpi) AS s
  FROM toks JOIN lp USING (t) GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(s AS DOUBLE) / (1000000.0 * n_tokens), 6) AS avg_logprob
FROM per""",
    "ngram_novelty": (
        "WITH "
        + _SHINGLES_SQL
        + """,
fo AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
SELECT sh.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty_rate
FROM sh JOIN fo ON fo.s = sh.s GROUP BY sh.doc_id"""
    ),
    "bigram_logprob": """
WITH dl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
  FROM documents
),
toks AS (SELECT doc_id, unnest(l) AS t FROM dl),
bi AS (
  SELECT doc_id, b[1] AS t1, b[2] AS t2 FROM (
    SELECT doc_id, unnest(list_zip(l[:-2], l[2:])) AS b
    FROM dl WHERE len(l) >= 2
  )
),
bc AS (SELECT t1, t2, count(*) AS c12 FROM bi GROUP BY t1, t2),
uc AS (SELECT t, count(*) AS c1 FROM toks GROUP BY t),
v AS (SELECT count(*) AS vocab FROM uc),
lm AS (
  SELECT t1, t2,
         CAST(round(round(ln((c12 + 1.0) / (c1 + vocab)), 6) * 1000000, 0)
              AS BIGINT) AS lpi
  FROM bc JOIN uc ON uc.t = bc.t1, v
),
per AS (
  SELECT bi.doc_id, count(*) AS n_bigrams, sum(lpi) AS s
  FROM bi JOIN lm ON lm.t1 = bi.t1 AND lm.t2 = bi.t2
  GROUP BY bi.doc_id
)
SELECT doc_id, n_bigrams,
       round(CAST(s AS DOUBLE) / (1000000.0 * n_bigrams), 6) AS avg_logprob
FROM per""",
    "sample_docs": (
        "SELECT doc_id, text FROM documents WHERE doc_id % 16 = 0"
    ),
    "stratified_sample": """
WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type
FROM events e JOIN c ON c.event_type = e.event_type
WHERE e.event_id % greatest(1, CAST(ceil(n / 1000.0) AS BIGINT)) = 0""",
    "token_quantiles": "WITH "
    + _LANG_SCORES_SQL
    + """,
lang AS (
  SELECT doc_id,
    CASE
      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
      WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
      WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
      WHEN s_fr > 0 THEN 'fr'
      ELSE 'und'
    END AS lang_pred
  FROM sc
),
tok AS (
  SELECT doc_id, len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) AS n
  FROM documents
),
j AS (SELECT l.lang_pred, t.n FROM lang l JOIN tok t ON t.doc_id = l.doc_id)
SELECT lang_pred, CAST(0.25 AS DOUBLE) AS q,
       quantile_disc(n, 0.25) AS n_tokens FROM j GROUP BY lang_pred
UNION ALL
SELECT lang_pred, CAST(0.5 AS DOUBLE), quantile_disc(n, 0.5)
FROM j GROUP BY lang_pred
UNION ALL
SELECT lang_pred, CAST(0.9 AS DOUBLE), quantile_disc(n, 0.9)
FROM j GROUP BY lang_pred""",
    "top_docs_per_lang": "WITH "
    + _LANG_SCORES_SQL
    + """,
lang AS (
  SELECT doc_id,
    CASE
      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
      WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
      WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
      WHEN s_fr > 0 THEN 'fr'
      ELSE 'und'
    END AS lang_pred
  FROM sc
),
q AS (
  SELECT doc_id,
    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1)
          * least(CAST(1.0 AS DOUBLE),
                  len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) / 100.0),
          6) AS quality
  FROM documents
),
r AS (
  SELECT l.lang_pred, q.doc_id, q.quality,
    row_number() OVER (
      PARTITION BY l.lang_pred ORDER BY q.quality DESC, q.doc_id
    ) AS rk
  FROM lang l JOIN q ON q.doc_id = l.doc_id
)
SELECT lang_pred, doc_id, quality, rk FROM r WHERE rk <= 10""",
    "decontaminate": """
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
bl AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 97 = 0)
SELECT f.doc_id, f.fp FROM fp f
WHERE f.fp NOT IN (SELECT fp FROM bl)""",
    "ngram_decontaminate": "WITH "
    + _SHINGLES_SQL
    + """,
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
hits AS (
  SELECT d.doc_id, d.s FROM sh d JOIN bench b ON d.s = b.s
  WHERE d.doc_id % 97 <> 0
)
SELECT doc_id, count(*) AS n_hits FROM hits GROUP BY doc_id""",
    # value-defined log lines (see event_log_lines / FIXTURES.md); the
    # scrub itself is the same three patterns, counted on the raw line
    # and redacted in fixed email -> phone -> ip order.
    "pii_scrub": """
WITH lines AS (
  SELECT event_id,
    'user ' || user_id
    || CASE WHEN user_id % 3 <> 0
         THEN ' <u' || user_id || '@ex' || (user_id % 10) || '.com>'
         ELSE '' END
    || CASE WHEN event_id % 2 = 0
         THEN ' call 555-' || (100 + user_id % 900) || '-'
              || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
         ELSE '' END
    || CASE WHEN (user_id + event_id) % 5 <> 0
         THEN ' from 10.' || (user_id % 256) || '.' || (event_id % 256)
              || '.' || ((user_id + event_id) % 256)
         ELSE '' END
    || ' during ' || event_type AS line
  FROM events
)
SELECT event_id,
  len(regexp_extract_all(line, '"""
    + PII_EMAIL_RE
    + """')) AS n_emails,
  len(regexp_extract_all(line, '"""
    + PII_PHONE_RE
    + """')) AS n_phones,
  len(regexp_extract_all(line, '"""
    + PII_IP_RE
    + """')) AS n_ips,
  regexp_replace(regexp_replace(regexp_replace(line,
    '"""
    + PII_EMAIL_RE
    + """', '[EMAIL]', 'g'),
    '"""
    + PII_PHONE_RE
    + """', '[PHONE]', 'g'),
    '"""
    + PII_IP_RE
    + """', '[IP]', 'g') AS clean
FROM lines""",
    "ngram_counts": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
),
pairs AS (
  SELECT ts[i] || ' ' || ts[i + 1] AS bigram
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
)
SELECT bigram, count(*) AS n FROM pairs
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""",
    "repetition_ratio": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
),
b AS (
  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bg
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
)
SELECT doc_id, count(*) AS n_bigrams, count(DISTINCT bg) AS n_distinct,
       round(1 - CAST(count(DISTINCT bg) AS DOUBLE) / count(*), 6)
         AS rep_ratio
FROM b GROUP BY doc_id""",
    "curation_filter": "WITH "
    + _LANG_SCORES_SQL
    + """,
lang AS (
  SELECT doc_id,
    CASE
      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
      WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
      WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
      WHEN s_fr > 0 THEN 'fr'
      ELSE 'und'
    END AS lang_pred
  FROM sc
),
q AS (
  SELECT doc_id,
    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1)
          * least(CAST(1.0 AS DOUBLE),
                  len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) / 100.0),
          6) AS quality
  FROM documents
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
),
bg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bg
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
),
rep AS (
  SELECT doc_id,
         round(1 - CAST(count(DISTINCT bg) AS DOUBLE) / count(*), 6)
           AS rep_ratio
  FROM bg GROUP BY doc_id
)
SELECT d.doc_id, l.lang_pred, q.quality,
       coalesce(r.rep_ratio, 0.0) AS rep_ratio
FROM documents d
JOIN lang l ON l.doc_id = d.doc_id
JOIN q ON q.doc_id = d.doc_id
LEFT JOIN rep r ON r.doc_id = d.doc_id
WHERE l.lang_pred = 'en' AND q.quality >= 0.3
  AND coalesce(r.rep_ratio, 0.0) <= 0.05""",
    # curate -> dedup-among-survivors -> decontaminate -> aggregate;
    # the filter order is the pipeline contract (see
    # stages/text.py::corpus_report)
    "corpus_report": "WITH "
    + _LANG_SCORES_SQL
    + """,
lang AS (
  SELECT doc_id,
    CASE
      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
      WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
      WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
      WHEN s_fr > 0 THEN 'fr'
      ELSE 'und'
    END AS lang_pred
  FROM sc
),
q AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) AS n_tokens,
    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1)
          * least(CAST(1.0 AS DOUBLE),
                  len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) / 100.0),
          6) AS quality
  FROM documents
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
),
bg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bg
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
),
rep AS (
  SELECT doc_id,
         round(1 - CAST(count(DISTINCT bg) AS DOUBLE) / count(*), 6)
           AS rep_ratio
  FROM bg GROUP BY doc_id
),
fps AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
keep AS (
  SELECT d.doc_id, f.fp, q.n_tokens,
         CAST(round(q.quality * 1000000, 0) AS BIGINT) AS qi
  FROM documents d
  JOIN lang l ON l.doc_id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id
  JOIN fps f ON f.doc_id = d.doc_id
  LEFT JOIN rep r ON r.doc_id = d.doc_id
  WHERE l.lang_pred = 'en' AND q.quality >= 0.3
    AND coalesce(r.rep_ratio, 0.0) <= 0.05
),
canon AS (SELECT fp, min(doc_id) AS doc_id FROM keep GROUP BY fp),
bl AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0),
surv AS (
  SELECT k.n_tokens, k.qi
  FROM keep k JOIN canon c ON c.doc_id = k.doc_id AND c.fp = k.fp
  WHERE k.fp NOT IN (SELECT fp FROM bl)
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total_tokens,
       round(CAST(coalesce(sum(qi), 0) AS DOUBLE)
             / (1000000.0 * greatest(count(*), 1)), 6) AS mean_quality
FROM surv""",
    "asof_join": """
WITH l AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
),
cand AS (
  SELECT l.event_id AS purchase_id, l.ts AS purchase_ts,
         r.event_id AS click_id, r.ts AS click_ts,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY r.ts DESC, r.event_id DESC
         ) AS rk
  FROM l JOIN r ON r.user_id = l.user_id AND r.ts <= l.ts
)
SELECT purchase_id, purchase_ts, click_id, click_ts FROM cand
WHERE rk = 1""",
    "range_join": """
WITH l AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT ts, user_id FROM events WHERE event_type = 'error'
)
SELECT l.event_id AS purchase_id, count(r.ts) AS n_errors_1h
FROM l LEFT JOIN r ON r.user_id = l.user_id
  AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 1 HOUR
GROUP BY l.event_id""",
    "hopping_windows": """
WITH e2 AS (
  SELECT event_type, value,
         unnest([time_bucket(INTERVAL 30 MINUTES, ts),
                 time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES])
           AS window_start
  FROM events
)
SELECT event_type, window_start, count(*) AS n,
       round(sum(value), 2) AS value_sum
FROM e2 GROUP BY event_type, window_start""",
    "tfidf_top_terms": """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
nn AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(nn.n AS DOUBLE) / df.df), 6) AS score
  FROM tf JOIN df ON df.term = tf.term CROSS JOIN nn
),
r AS (
  SELECT doc_id, term, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term
         ) AS rk
  FROM s
)
SELECT doc_id, term, score, rk FROM r WHERE rk <= 3""",
    "bm25_scores": """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nn AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM toks) AS total
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ('merge', 'sort', 'spark') GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
comp AS (
  SELECT tf.doc_id,
         CAST(round(
           (ln((nn.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
            * (tf.tf * (1.2 + 1.0))
            / (tf.tf + 1.2 * (1.0 - 0.75
                              + 0.75 * dl.dl
                                / (CAST(nn.total AS DOUBLE) / nn.n))))
           * 1000000) AS BIGINT) AS micro
  FROM tf
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN df ON df.term = tf.term
  CROSS JOIN nn
)
SELECT doc_id, sum(micro) / 1000000.0 AS score FROM comp GROUP BY doc_id""",
    "shipping_priority": """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10""",
    # All-pairs BFS distances by bounded recursive CTE: the UNION dedups
    # (s, v, dist) triples, so the guard must exceed the graph's
    # eccentricity (measured 3 at sf0.01 AND sf0.1 — the transcript
    # graph is a 2-hop small world through its conv/tool hubs; 8 is a
    # >2.5x margin — each level past saturation re-joins all n^2 pairs,
    # so the guard is also the oracle's cost knob). min(dist) per
    # (s, v) is then the true distance.
    "closeness": _with(
        """apd AS (
  WITH RECURSIVE w(s, v, dist) AS (
    SELECT vid, vid, CAST(0 AS BIGINT) FROM verts
    UNION
    SELECT w.s, e.dst, w.dist + 1
    FROM w JOIN sym e ON e.src = w.v
    WHERE w.dist < 8
  )
  SELECT s, v, min(dist) AS dist FROM w GROUP BY s, v
)
SELECT v,
       round(CASE WHEN sum(dist) > 0
                  THEN (count(*) - 1) / CAST(sum(dist) AS DOUBLE)
                  ELSE 0.0 END, 6) AS closeness
FROM apd GROUP BY v"""
    ),
    # Same distance CTE; the engine sums INTEGER per-distance counts and
    # evaluates cnt_d / d once per distinct distance (reduction-order-
    # free), so the oracle groups to (v, dist, cnt) first — summing raw
    # 1/dist rows instead would drift a ulp (3 x (1/3) != 3/3).
    "harmonic": _with(
        """apd AS (
  WITH RECURSIVE w(s, v, dist) AS (
    SELECT vid, vid, CAST(0 AS BIGINT) FROM verts
    UNION
    SELECT w.s, e.dst, w.dist + 1
    FROM w JOIN sym e ON e.src = w.v
    WHERE w.dist < 8
  )
  SELECT s, v, min(dist) AS dist FROM w GROUP BY s, v
),
per_d AS (
  SELECT v, dist, count(*) AS cnt FROM apd GROUP BY v, dist
)
SELECT v,
       round(coalesce(sum(CASE WHEN dist > 0
                                THEN cnt / CAST(dist AS DOUBLE) END),
                      0.0), 6) AS harmonic
FROM per_d GROUP BY v"""
    ),
}

# The driver's correctness gate samples the FIRST 50 registry entries and
# the window is static, so rotate it each round: the 50 least-recently-
# driver-verified SQL-oracled queries go first (round-5 rotation below),
# then the remaining oracled ones, then the semantic-only ones (verified
# via NOORACLE_CHECKS.json replays instead).
#
# LAST_DRIVER_VERIFIED (from CORRECTNESS_r0N.json): the 38 queries that
# open the round-5 window never produced a driver row in rounds 1-4 (the
# sampled prefix was static); the next 12 were last driver-verified in
# rounds 1-2; the trailing oracled block was driver-green in rounds 3-4.
_ROUND5_WINDOW = [
    "hub_subgraph",
    "local_supplier_volume",
    "shipping_priority",
    "token_count_bpe",
    "sequence_pack",
    "doc_chunks",
    "vocab_growth",
    "quality_logistic",
    "winnow_fingerprint",
    "winnow_dup_pairs",
    "dedup_clusters",
    "dedup_survivors",
    "retention_cohorts",
    "daily_active",
    "funnel_counts",
    "conversion_time",
    "source_quality",
    "oov_rate",
    "unigram_logprob",
    "bigram_logprob",
    "ngram_novelty",
    "corpus_report",
    "centroid_sim",
    "stratified_sample",
    "token_quantiles",
    "top_docs_per_lang",
    "decontaminate",
    "ngram_decontaminate",
    "ngram_counts",
    "pii_scrub",
    "repetition_ratio",
    "curation_filter",
    "asof_join",
    "range_join",
    "hopping_windows",
    "tfidf_top_terms",
    "closeness",
    "harmonic",
    "token_count",
    "text_quality",
    "lang_id",
    "fingerprint",
    "dedup_exact",
    "jaccard_pairs",
    "minhash_pairs",
    "knn_topk",
    "embedding_dups",
    "media_metadata",
    "event_windows",
    "sessionize",
]
QUERIES = {
    **{k: QUERIES[k] for k in _ROUND5_WINDOW},
    **{k: v for k, v in QUERIES.items()
       if k in ORACLE_SQL and k not in _ROUND5_WINDOW},
    **{k: v for k, v in QUERIES.items() if k not in ORACLE_SQL},
}

