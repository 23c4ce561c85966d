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

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from graphsetintersection_ray.pipelines.graph import GraphArtifacts

# below this directed-edge count the whole symmetric CSR is built on the
# driver and broadcast once (ray.put) — each batch of start vertices then
# walks ALL steps locally with vectorized gathers, zero joins. Above it,
# the walk_len-1 hash-join path runs (the 100 TB path: adjacency never
# leaves the cluster). Env-overridable so tests can force the join path.
WALK_BROADCAST_MAX_EDGES = int(
    os.environ.get("GRAFT_WALK_BROADCAST_MAX_EDGES", 20_000_000)
)


def random_walks(
    art: GraphArtifacts, walk_len: int = 8, seed: int = 7
) -> rd.Dataset:
    """(walk_id, pos, v): position ``pos`` of vertex ``walk_id``'s walk."""
    if 2 * art.n_edges <= WALK_BROADCAST_MAX_EDGES:
        return _random_walks_broadcast(art, walk_len, seed)
    return _random_walks_join(art, walk_len, seed)


def _random_walks_broadcast(
    art: GraphArtifacts, walk_len: int, seed: int
) -> rd.Dataset:
    import ray as _ray

    edf = art.sym.to_pandas()
    src = edf["src"].to_numpy().astype(np.int64)
    dst = edf["dst"].to_numpy().astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    n = art.n_vertices
    indptr = np.concatenate(
        ([0], np.cumsum(np.bincount(src, minlength=n)))
    )
    ref = _ray.put((indptr, dst))

    def walk_batch(t: pa.Table) -> pa.Table:
        indptr_, dst_ = _ray.get(ref)
        dst_pad = dst_ if len(dst_) else np.zeros(1, np.int64)
        v0 = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(v0)
        cur = v0.copy()
        vs = [v0]
        for pos in range(1, walk_len):
            deg = indptr_[cur + 1] - indptr_[cur]
            h = (v0 * 1103 + (pos - 1) * 12347 + seed) % np.maximum(deg, 1)
            idx = indptr_[cur] + np.minimum(h, np.maximum(deg - 1, 0))
            cur = np.where(
                deg > 0, dst_pad[np.minimum(idx, len(dst_pad) - 1)], cur
            )
            vs.append(cur)
        return pa.table(
            {
                "walk_id": pa.array(
                    np.tile(v0, walk_len).astype(np.int32), pa.int32()
                ),
                "pos": pa.array(
                    np.repeat(np.arange(walk_len, dtype=np.int64), m)
                ),
                "v": pa.array(
                    np.concatenate(vs).astype(np.int32), pa.int32()
                ),
            }
        )

    return rd.range(n).map_batches(walk_batch, batch_format="pyarrow")


def _random_walks_join(
    art: GraphArtifacts, walk_len: int, seed: int
) -> rd.Dataset:
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


def skipgram_pairs(
    walks: rd.Dataset, window: int = 2, num_buckets: int = 32
) -> rd.Dataset:
    """(center, context, n): skip-gram co-occurrence counts within
    ``window`` positions inside each walk — the (center, context) pair
    corpus a word2vec/node2vec trainer consumes.

    Scale shape: walks bucketed by walk_id (whole walks co-locate), one
    vectorized offset-compare pass per window distance inside each
    bucket, local pair counts pre-aggregated before one bounded
    (center, context) count shuffle."""
    import pandas as pd

    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        sum_by,
    )

    out_schema = pa.schema(
        [
            pa.field("center", pa.int32()),
            pa.field("context", pa.int32()),
            pa.field("n", pa.int64()),
        ]
    )

    def local_pairs(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(["walk_id", "pos"])
        wid = g["walk_id"].to_numpy()
        v = g["v"].to_numpy()
        cs, xs = [], []
        for d in range(1, window + 1):
            if d >= len(v):
                break
            same = wid[:-d] == wid[d:]
            a, b = v[:-d][same], v[d:][same]
            cs.append(a)
            xs.append(b)
            cs.append(b)
            xs.append(a)
        if not cs:
            return out_schema.empty_table()
        df = pd.DataFrame(
            {"center": np.concatenate(cs), "context": np.concatenate(xs)}
        )
        out = (
            df.groupby(["center", "context"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "center": pa.array(out["center"].to_numpy(np.int32)),
                "context": pa.array(out["context"].to_numpy(np.int32)),
                "n": pa.array(out["n"].to_numpy(np.int64)),
            }
        )

    part = bucket_groups(
        walks.map_batches(
            lambda b: _add_bucket(b, ["walk_id"], num_buckets),
            batch_format="pandas",
        ),
        local_pairs,
        num_buckets,
    )
    return sum_by(part, ["center", "context"], "n", num_buckets=num_buckets)
