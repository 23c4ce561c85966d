"""graphsetintersection_ray — a Ray-Data-native link-graph analytics engine.

From-scratch rebuild of the capabilities of pkumod/GraphSetIntersection
(SIGMOD'18 "Speeding Up Set Intersections in Graph Algorithms using SIMD
Instructions") on Ray Data: sorted-set intersection kernels as vectorized
NumPy/Arrow batch functions, exact triangle counting, PageRank, connected
components and label propagation over an edge table derived from multi-turn
transcript Parquet, with hash-partitioned CSR state, explicit skew handling
(degree-ordered orientation), per-superstep checkpointing, and a DuckDB
oracle for every SQL-expressible operator.

Layout:
  functions/  pure vectorized kernels (set ops, text analysis, hashing)
  sources/    transcript derivation + deterministic synthetic generators
  stages/     batch-transform stages (edge derivation, vertex encoding, CSR,
              dedup, similarity, multimodal stubs)
  pipelines/  end-to-end queries (triangle count, pagerank, cc, lp, registry)
  state/      partitioned BSP superstep engine with checkpoint/resume
"""

__version__ = "0.1.0"
