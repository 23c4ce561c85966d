"""Graph pipeline orchestration: transcripts → all graph artifacts, cached.

One call builds (and caches, per (source, num_partitions)) everything the
queries share: the string edge table, the dense vertex encoding, canonical
int32 edges, symmetric edges, degrees, the degree-oriented DAG, and the
hash-partitioned CSR directory the superstep engine loads. Materialized
once so the driver's repeated ``queries()[name](sf_dir)`` calls don't
re-shuffle the build for every query.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import ray.data as rd

from graphsetintersection_ray.sources.transcripts import derive_transcripts
from graphsetintersection_ray.stages import graph_build as gb

DEFAULT_PARTITIONS = 8

# bump when edge-derivation/CSR semantics change: invalidates cached
# /tmp/gsi_graphs CSR directories from older code
GRAPH_SCHEMA_VERSION = 2

# PR/CC/BFS superstep partitions are sized by DATA, not by the build
# partition count: per-superstep coordination grows ~P² (P×P message refs)
# while per-partition compute shrinks ~1/P, so small graphs want few fat
# partitions. Measured on 4M directed edges @32cpus: P=8 0.86s/10it,
# P=16 1.07s, P=32 2.49s → ~2M directed edges per superstep partition.
SUPERSTEP_EDGES_PER_PARTITION = int(
    os.environ.get("GRAFT_SUPERSTEP_EDGES_PER_PARTITION", 2_000_000)
)
# P×P coordination outgrows per-partition compute beyond this many
# partitions on measured graphs (single node). On a multi-node cluster the
# cap follows the node count — each node hosts at least one fat partition
# so adding nodes adds superstep parallelism — unless pinned by env.


def _superstep_max_partitions() -> int:
    env = os.environ.get("GRAFT_SUPERSTEP_MAX_PARTITIONS")
    if env is not None:
        return int(env)
    try:
        import ray

        if not ray.is_initialized():
            return 16
        n_nodes = len(ray.nodes())
        if n_nodes <= 1:
            # single node: allow one partition per core — measured on the
            # 19.1M-edge corpus @32 cpus: P=16 91.8M PR-edges/s, P=24
            # 105.2M, P=32 109.3M (the 2M-edges/partition data rule still
            # bounds P on smaller graphs, where P x P coordination wins)
            return max(16, int(ray.cluster_resources().get("CPU", 16)))
        # multi-node: at least one fat partition per node so added nodes
        # add superstep parallelism; per-node memory bandwidth is private
        return max(16, n_nodes)
    except Exception:
        return 16


def _auto_csr_partitions(n_edges: int, cap: int) -> int:
    cap = min(cap, _superstep_max_partitions())
    # floor of 8 (when the cap allows): fewer partitions than workers
    # leaves cpus idle; P=8 measured faster than P=4 on a 4M-directed-edge
    # graph at 32 cpus
    floor = min(cap, 8)
    return max(floor, min(cap, 2 * n_edges // SUPERSTEP_EDGES_PER_PARTITION + 1))


@dataclass
class GraphArtifacts:
    transcripts: rd.Dataset
    edges_str: rd.Dataset
    vertices: rd.Dataset
    edges: rd.Dataset       # canonical (src < dst) int32
    sym: rd.Dataset         # both directions
    degrees: rd.Dataset
    oriented: rd.Dataset    # degree-ordered DAG
    csr_path: str
    n_vertices: int
    n_edges: int
    num_partitions: int
    csr_partitions: int     # superstep-engine partitioning (data-sized)
    fingerprint: str


_CACHE: dict[tuple, GraphArtifacts] = {}


def transcripts_from_sf(sf_dir: str) -> rd.Dataset:
    events = rd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    return derive_transcripts(events)


def build_graph_from_transcripts(
    transcripts: rd.Dataset,
    cache_key: str,
    num_partitions: int = DEFAULT_PARTITIONS,
    workdir: str | None = None,
    csr_partitions: int | None = None,
) -> GraphArtifacts:
    key = (cache_key, num_partitions, csr_partitions)
    if key in _CACHE:
        return _CACHE[key]
    transcripts = transcripts.materialize()
    # bucket count sized by data (shuffle.sized_buckets): ~150k rows per
    # bucket in the small band where stage fixed cost dominates, growing
    # linearly past 64 so one bucket of conversations ALWAYS fits a
    # worker heap at any corpus size. GRAFT_DERIVE_BUCKETS pins it
    # (bucket count is semantics-free).
    from graphsetintersection_ray.stages.shuffle import sized_buckets

    n_rows = transcripts.count()
    num_buckets = int(
        os.environ.get("GRAFT_DERIVE_BUCKETS", sized_buckets(n_rows))
    )
    edges_str, vertices = gb.derive_graph_tables(
        transcripts, num_buckets=num_buckets
    )
    edges_str = edges_str.materialize()
    vertices = vertices.materialize()
    n_vertices = vertices.count()
    edges = gb.compact_blocks(
        gb.edges_to_ids(edges_str, vertices, num_partitions, n_vertices=n_vertices)
    )
    sym = gb.compact_blocks(gb.symmetrize(edges))
    n_edges = edges.count()
    if csr_partitions is None:
        csr_partitions = _auto_csr_partitions(n_edges, cap=num_partitions)
    fingerprint = (
        f"v{GRAPH_SCHEMA_VERSION}:{cache_key}:p{num_partitions}:"
        f"c{csr_partitions}:{n_vertices}v:{n_edges}e"
    )
    if workdir is None:
        workdir = os.path.join(
            "/tmp/gsi_graphs", hashlib.md5(fingerprint.encode()).hexdigest()[:16]
        )
    csr_path = os.path.join(workdir, "csr")
    # A pre-existing CSR dir written with a DIFFERENT partition count would
    # leave partition dirs silently unread (workers miss vertices), so
    # reuse is gated on a manifest matching both the fingerprint and the
    # partition count; any mismatch rebuilds.
    manifest_path = os.path.join(csr_path, "_csr_manifest.json")
    reuse = False
    if os.path.isdir(csr_path) and os.path.exists(manifest_path):
        import json as _json

        with open(manifest_path) as f:
            m = _json.load(f)
        reuse = (
            m.get("fingerprint") == fingerprint
            and m.get("csr_partitions") == csr_partitions
        )
    if not reuse:
        if os.path.isdir(csr_path):
            import shutil

            shutil.rmtree(csr_path)
        # the CSR groupby is the ONE vertex-keyed shuffle of the build:
        # degrees fall out of it for free (list lengths), so no separate
        # degree sum-shuffle over the symmetric edge table
        # shuffle fan-out sized by data (2·|E| symmetric rows, ~250k per
        # bucket small-band, uncapped growth at scale), floored at the
        # partition count so every output partition gets its own reducer
        csr_buckets = max(
            csr_partitions, sized_buckets(2 * n_edges, rows_per_bucket=250_000)
        )
        csr = gb.build_csr(
            sym, num_partitions=csr_partitions, shuffle_buckets=csr_buckets
        ).materialize()
        degs = gb.degrees_from_csr(csr).materialize()
        gb.write_csr_dataset(csr, csr_path, csr_partitions)
        import json as _json

        with open(manifest_path, "w") as f:
            _json.dump(
                {"fingerprint": fingerprint, "csr_partitions": csr_partitions},
                f,
            )
    else:
        degs = gb.degrees_from_csr(rd.read_parquet(csr_path)).materialize()
    oriented = gb.compact_blocks(
        gb.orient_by_degree(edges, degs, num_partitions, n_vertices=n_vertices)
    )
    art = GraphArtifacts(
        transcripts=transcripts,
        edges_str=edges_str,
        vertices=vertices,
        edges=edges,
        sym=sym,
        degrees=degs,
        oriented=oriented,
        csr_path=csr_path,
        n_vertices=n_vertices,
        n_edges=n_edges,
        num_partitions=num_partitions,
        csr_partitions=csr_partitions,
        fingerprint=fingerprint,
    )
    _CACHE[key] = art
    return art


def build_graph(
    sf_dir: str, num_partitions: int = DEFAULT_PARTITIONS
) -> GraphArtifacts:
    return build_graph_from_transcripts(
        transcripts_from_sf(sf_dir),
        cache_key=os.path.abspath(sf_dir),
        num_partitions=num_partitions,
    )
