"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

``entry()`` runs the flagship pipeline (transcript derivation → edge graph
→ exact triangle count + converged PageRank summary) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full registry from
``graphsetintersection_ray.pipelines.queries``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def _quiet() -> None:
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def entry() -> Any:
    """Flagship pipeline on sf0.001: build the transcript-derived link
    graph, run exact TC + converged PageRank + CC, return a per-vertex
    summary table (v, score, component, triangles)."""
    _quiet()
    import pandas as pd

    from graphsetintersection_ray.pipelines.graph import build_graph
    from graphsetintersection_ray.pipelines import iterative as it
    from graphsetintersection_ray.pipelines.triangle import per_vertex_triangles

    art = build_graph(SF_SMOKE)
    pr, _ = it.pagerank(art, tol=1e-6, resume=False)
    cc, _ = it.connected_components(art, resume=False)
    tri = per_vertex_triangles(art.oriented, num_partitions=art.num_partitions, n_vertices=art.n_vertices, n_edges=art.n_edges)

    out = (
        pr.to_pandas()
        .merge(cc.to_pandas(), on="v")
        .merge(tri.to_pandas(), on="v", how="left")
    )
    out["triangles"] = out["triangles"].fillna(0).astype("int64")
    return out.sort_values("v").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    _quiet()
    from graphsetintersection_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graphsetintersection_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
