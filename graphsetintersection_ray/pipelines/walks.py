"""Deterministic random-walk corpus generation (node2vec-style input).

One fixed-length walk per vertex over the symmetric adjacency; the step
choice is a value-defined hash ``(walk_id*1103 + pos*12347 + seed) % deg``
into the dst-sorted neighbor list, so the corpus is exactly replayable
(and SQL-expressible as a recursive CTE — the driver gate compares it to
DuckDB bit-for-bit).

Scale shape: ``walk_len - 1`` bounded hash joins frontier ⋈ packed CSR
(binary adjacency blobs, never Python lists), each advancing every walk
one step with one vectorized gather; the frontier (one row per walk) is
materialized per step so the union of per-position outputs replays no
shared lineage. Nothing lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from graphsetintersection_ray.pipelines.graph import GraphArtifacts


def random_walks(
    art: GraphArtifacts, walk_len: int = 8, seed: int = 7
) -> rd.Dataset:
    """(walk_id, pos, v): position ``pos`` of vertex ``walk_id``'s walk."""
    from graphsetintersection_ray.stages.graph_build import (
        build_csr,
        compact_blocks,
    )

    P = art.num_partitions
    csr = compact_blocks(
        build_csr(art.sym, num_partitions=P, packed=True)
    ).materialize()

    def init_rows(t: pa.Table) -> pa.Table:
        u = t["u"].cast(pa.int32())
        return pa.table({"walk_id": u, "v": u})

    def with_pos(pos: int):
        def add(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "walk_id": t["walk_id"],
                    "pos": pa.array(np.full(t.num_rows, pos, np.int64)),
                    "v": t["v"],
                }
            )

        return add

    def advance(prev_pos: int):
        def step(t: pa.Table) -> pa.Table:
            wid = t["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cur = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            blobs = t["nbrs_bin"].to_numpy(zero_copy_only=False)
            n = len(wid)
            lens = np.fromiter(
                (0 if b is None else len(b) // 4 for b in blobs),
                np.int64,
                count=n,
            )
            if int(lens.sum()):
                flat = np.frombuffer(
                    b"".join(b for b in blobs if b), dtype="<i4"
                ).astype(np.int64)
            else:
                flat = np.zeros(1, np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1])) if n else lens
            h = (wid * 1103 + prev_pos * 12347 + seed) % np.maximum(lens, 1)
            idx = np.minimum(offs + h, max(len(flat) - 1, 0))
            nxt = np.where(lens > 0, flat[idx], cur)
            return pa.table(
                {
                    "walk_id": pa.array(wid.astype(np.int32), pa.int32()),
                    "v": pa.array(nxt.astype(np.int32), pa.int32()),
                }
            )

        return step

    frontier = csr.map_batches(init_rows, batch_format="pyarrow").materialize()
    outs = [frontier.map_batches(with_pos(0), batch_format="pyarrow")]
    for pos in range(1, walk_len):
        joined = compact_blocks(frontier).join(
            csr,
            join_type="left_outer",
            num_partitions=P,
            on=("v",),
            right_on=("u",),
        )
        frontier = joined.map_batches(
            advance(pos - 1), batch_format="pyarrow"
        ).materialize()
        outs.append(frontier.map_batches(with_pos(pos), batch_format="pyarrow"))

    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds
