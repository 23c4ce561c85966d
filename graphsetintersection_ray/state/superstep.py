"""Partitioned BSP superstep engine for iterative graph algorithms.

Why not a per-iteration Dataset pipeline: PageRank / label propagation run
tens of supersteps; re-deriving a Dataset each iteration grows lineage
unboundedly and re-shuffles the (static) adjacency every round. The
north-star design is the reference's in-RAM CSR arenas
(bitpack_triangle_count.cpp:8-9, build once, read every query) made
distributed: the adjacency is hash-partitioned by ``src % P`` into CSR
blocks, written ONCE as partitioned Parquet, and loaded ONCE by an actor
pool of ``PartitionWorker``s (stateful stage: load in ``__init__``, work
per superstep). Per-superstep score/label exchange is a pre-aggregated
all-to-all through the object store — the "groupby-aggregate shuffle of
frontier/score deltas" expressed directly, with combiner-side aggregation
(np.bincount per destination partition) before anything moves. Because
the adjacency is static, each partition-pair's destination-id list is
exchanged ONCE at engine construction; steady-state supersteps ship bare
value vectors aligned to that structure (half the bytes, no per-iteration
sort or searchsorted anywhere in the loop).

Checkpoint/resume: after every superstep each partition's state is written
to ``<ckpt>/<algo>/iter=K/part=P.parquet`` plus a ``manifest.json`` with
lineage (graph fingerprint, iteration, per-partition metrics). ``resume``
loads the newest complete iteration and continues — mid-run failure costs
one superstep, not the run.

Parallelism contract: the engine is pure task/actor BSP — the same code
runs at any ``num_partitions`` and any cluster size; scaling efficiency is
evidenced by bench.py --scaling (two fresh sessions at different
num_cpus).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

DAMPING = 0.85
# Katz attenuation: dyadic (2^-7) so every term of the Katz series
# alpha^j * (S^j . 1) is an exactly-representable binary float — the
# engine's partition-order partial sums and the SQL oracle's sum then
# agree bit-for-bit at 6-decimal rounding.
KATZ_ALPHA = 0.0078125


def _part_dir(base: str, p: int) -> str:
    return os.path.join(base, f"bucket={p}")


@ray.remote(num_cpus=0.25)
class PartitionWorker:
    """Holds one hash-partition of the CSR adjacency (vertices with
    ``v % P == p``) plus that partition's per-vertex state vector.

    CSR layout mirrors the reference's UVertex{start,deg} + pool_edges
    (util.hpp:46-51): ``self.u`` sorted vertex ids, ``self.offsets``
    segment bounds, ``self.flat`` neighbor pool.
    """

    def __init__(self, csr_path: str, p: int, num_partitions: int):
        self.p = p
        self.P = num_partitions
        d = _part_dir(csr_path, p)
        if os.path.isdir(d):
            t = pq.read_table(d)
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            lists = t["nbrs"].combine_chunks()
            offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = lists.values.to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(u, kind="stable")
            if not np.array_equal(order, np.arange(len(u))):
                # re-sort segments by vertex id so searchsorted lookups work
                lens = np.diff(offs)
                new_flat = np.concatenate(
                    [flat[offs[i] : offs[i + 1]] for i in order]
                ) if len(u) else flat[:0]
                flat = new_flat
                lens = lens[order]
                offs = np.concatenate([[0], np.cumsum(lens)])
                u = u[order]
            self.u, self.offsets, self.flat = u, offs, flat
        else:  # empty partition
            self.u = np.empty(0, np.int64)
            self.offsets = np.zeros(1, np.int64)
            self.flat = np.empty(0, np.int64)
        self.deg = np.diff(self.offsets).astype(np.float64)
        self.flat_part = (self.flat % self.P).astype(np.int64)
        # per-destination-partition edge index, computed once
        self._dst_sel = [np.flatnonzero(self.flat_part == q) for q in range(self.P)]
        # static message structure, computed once: the adjacency never
        # changes across supersteps, so each (this-partition → q) pair's
        # unique destination list and inverse index are loop-invariant —
        # the per-pair np.unique (an O(E log E) sort PER ITERATION, and
        # the dominant share of the engine's O(P²) per-superstep fixed
        # cost at high partition counts) moves out of the loop entirely
        self._dst_uniq = []
        self._dst_inv = []
        for q in range(self.P):
            uniq, inv = np.unique(
                self.flat[self._dst_sel[q]], return_inverse=True
            )
            self._dst_uniq.append(uniq)
            self._dst_inv.append(inv.astype(np.int32))
        self.state: np.ndarray | None = None
        self.metrics: dict = {}

    # -- state management ---------------------------------------------------

    def num_vertices(self) -> int:
        return int(len(self.u))

    UNREACHED = np.int64(1 << 60)

    def init_state(self, kind: str, n_total: int, source: int | None = None) -> None:
        if kind == "pagerank":
            self.state = np.full(len(self.u), 1.0 / max(n_total, 1), np.float64)
        elif kind == "ppr":
            # personalized PageRank: all restart mass on the source vertex
            self.state = np.zeros(len(self.u), np.float64)
            self.ppr_source = source
            if source is not None:
                idx = np.searchsorted(self.u, source)
                if idx < len(self.u) and self.u[idx] == source:
                    self.state[idx] = 1.0
        elif kind == "katz":
            # x_0 = 0: iteration k yields the k-term Katz series
            # sum_{j<k} alpha^j (S^j . 1)
            self.state = np.zeros(len(self.u), np.float64)
        elif kind in ("cc", "labelprop"):
            self.state = self.u.astype(np.int64).copy()
        elif kind == "bfs":
            self.state = np.full(len(self.u), self.UNREACHED, np.int64)
            if source is not None:
                idx = np.searchsorted(self.u, source)
                if idx < len(self.u) and self.u[idx] == source:
                    self.state[idx] = 0
        else:
            raise ValueError(kind)

    def set_source(self, kind: str, source: int | None) -> None:
        """Re-attach the restart/source vertex after a checkpoint reload
        (load_state restores only the state vector)."""
        if kind == "ppr":
            self.ppr_source = source

    def load_state(self, path: str) -> None:
        t = pq.read_table(_part_dir(path, self.p))
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["state"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.u, v)
        st = np.empty(len(self.u), s.dtype)
        st[idx] = s
        self.state = st

    def checkpoint(self, path: str) -> dict:
        os.makedirs(_part_dir(path, self.p), exist_ok=True)
        pq.write_table(
            pa.table({"v": pa.array(self.u), "state": pa.array(self.state)}),
            os.path.join(_part_dir(path, self.p), "data.parquet"),
        )
        return {"partition": self.p, "vertices": len(self.u), **self.metrics}

    def state_table(self) -> pa.Table:
        return pa.table({"v": pa.array(self.u), "state": pa.array(self.state)})

    # -- static message structure handshake ----------------------------------

    def structure_lists(self) -> list:
        """The static unique-destination lists, one per destination
        partition. Exchanged ONCE at engine construction: steady-state
        supersteps then ship bare value vectors (no dst column, no
        Arrow table build, no per-iteration searchsorted at the
        receiver) — at P partitions this halves per-superstep shuffle
        bytes and removes the O(P) receiver-side binary searches."""
        return list(self._dst_uniq)

    def cache_incoming_structure(self, *uniqs) -> None:
        """Receiver-side positional index for each source partition's
        static destination list, computed once."""
        if len(uniqs) == 1 and isinstance(uniqs[0], list):
            # P == 1: num_returns=1 ships the whole return list as one
            # object instead of unpacking it
            uniqs = tuple(uniqs[0])
        self._in_idx = [
            np.searchsorted(self.u, u).astype(np.int64) for u in uniqs
        ]

    # -- supersteps ---------------------------------------------------------

    def compute_messages(self, kind: str) -> list[np.ndarray]:
        """Per destination partition q: the partial-aggregated value
        vector aligned to the static unique-destination list exchanged at
        engine construction (structure_lists). Combiner runs HERE
        (np.bincount over precomputed inverse ids) — the shuffle moves
        one float per (dst, src-partition), not per edge, and no dst
        ids at all in steady state."""
        t0 = time.time()
        if kind in ("pagerank", "ppr"):
            per_edge = np.repeat(
                np.divide(
                    self.state, self.deg, out=np.zeros_like(self.state),
                    where=self.deg > 0,
                ),
                np.diff(self.offsets),
            )
        elif kind == "katz":
            # unnormalized propagation: each neighbor receives the raw
            # score (the alpha attenuation is applied at the receiver)
            per_edge = np.repeat(self.state, np.diff(self.offsets))
        elif kind == "bfs":
            # frontier relaxation: dist+1 along every out-edge (monotone
            # min fixpoint = unweighted shortest distance from the source)
            per_edge = np.repeat(
                np.where(
                    self.state >= self.UNREACHED, self.UNREACHED, self.state + 1
                ),
                np.diff(self.offsets),
            )
        else:  # cc / labelprop: propagate current label, reduce by min
            per_edge = np.repeat(self.state, np.diff(self.offsets))
        out = []
        for q in range(self.P):
            sel = self._dst_sel[q]
            uniq = self._dst_uniq[q]
            vals = per_edge[sel]
            if len(uniq) == 0:
                out.append(vals[:0])
                continue
            inv = self._dst_inv[q]
            if kind in ("pagerank", "ppr", "katz"):
                red = np.bincount(inv, weights=vals, minlength=len(uniq))
            else:
                red = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
                np.minimum.at(red, inv, vals.astype(np.int64))
            out.append(red)
        self.metrics = {
            "edges": int(len(self.flat)),
            "compute_sec": time.time() - t0,
        }
        return out

    def step(self, kind: str, n_total: int, *vals) -> list:
        """Fused superstep: apply the incoming messages of iteration k,
        then immediately compute the outgoing messages of iteration k+1 —
        ONE remote call per worker per superstep instead of two, halving
        the per-iteration scheduling/barrier overhead. Returns
        [msg_q for q in 0..P-1] + [apply_stats] (num_returns = P + 1)."""
        stats = self.apply_messages(kind, n_total, *vals)
        msgs = self.compute_messages(kind)
        return msgs + [stats]

    def apply_messages(self, kind: str, n_total: int, *vals) -> dict:
        """Apply the value vectors of one superstep, positionally aligned
        to the per-source-partition indices cached by
        cache_incoming_structure (the dst lists are np.unique outputs, so
        direct fancy indexing is exact — and ~10x faster than the
        buffered np.add.at)."""
        t0 = time.time()
        if len(vals) == 1 and isinstance(vals[0], list):
            # P == 1 num_returns quirk, as in cache_incoming_structure
            vals = tuple(vals[0])
        if kind in ("pagerank", "ppr", "katz"):
            incoming = np.zeros(len(self.u), np.float64)
            for idx, val in zip(self._in_idx, vals):
                if len(val):
                    incoming[idx] += val
            if kind == "katz":
                new = 1.0 + KATZ_ALPHA * incoming
            elif kind == "ppr":
                new = DAMPING * incoming
                src = getattr(self, "ppr_source", None)
                if src is not None:
                    sidx = np.searchsorted(self.u, src)
                    if sidx < len(self.u) and self.u[sidx] == src:
                        new[sidx] += 1.0 - DAMPING
            else:
                new = (1.0 - DAMPING) / max(n_total, 1) + DAMPING * incoming
            delta = float(np.abs(new - self.state).max()) if len(new) else 0.0
            l1 = float(np.abs(new - self.state).sum()) if len(new) else 0.0
            self.state = new
            self.metrics.update(apply_sec=time.time() - t0)
            return {"max_delta": delta, "l1_delta": l1}
        else:
            new = self.state.copy()
            for idx, val in zip(self._in_idx, vals):
                if len(val):
                    new[idx] = np.minimum(new[idx], val)
            changed = int((new != self.state).sum())
            self.state = new
            self.metrics.update(apply_sec=time.time() - t0)
            return {"changed": changed}

    # -- HITS (hubs/authorities over the directed edge set) ------------------

    def _load_aligned_csr(self, path: str) -> tuple[np.ndarray, np.ndarray]:
        """Load a directed CSR partition and align it to ``self.u``:
        vertices of this partition absent from the directed table get
        empty segments, so hub/auth state vectors index positionally."""
        d = _part_dir(path, self.p)
        lens_full = np.zeros(len(self.u), np.int64)
        if not os.path.isdir(d):
            return np.concatenate([[0], np.cumsum(lens_full)]), np.empty(0, np.int64)
        t = pq.read_table(d)
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = t["nbrs"].combine_chunks()
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lists.values.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        order = np.argsort(u, kind="stable")
        # gather segments into sorted-by-u order without a Python loop
        starts = offs[:-1][order]
        ls = lens[order]
        ends_out = np.cumsum(ls)
        j = (
            np.arange(int(ls.sum()), dtype=np.int64)
            - np.repeat(ends_out - ls, ls)
            + np.repeat(starts, ls)
        )
        flat_sorted = flat[j]
        pos = np.searchsorted(self.u, u[order])
        lens_full[pos] = ls
        return np.concatenate([[0], np.cumsum(lens_full)]), flat_sorted

    def load_directed(self, out_path: str, in_path: str) -> None:
        """Attach the directed adjacency (canonical src→dst edges): the
        out-CSR partitioned by src and the in-CSR partitioned by dst —
        both aligned to this partition's vertex list."""
        self.out_offs, self.out_flat = self._load_aligned_csr(out_path)
        self.in_offs, self.in_flat = self._load_aligned_csr(in_path)
        P = self.P
        self._out_sel = [
            np.flatnonzero(self.out_flat % P == q) for q in range(P)
        ]
        self._in_sel = [np.flatnonzero(self.in_flat % P == q) for q in range(P)]
        # loop-invariant unique/inverse per pair, as for the symmetric CSR
        self._out_uniq, self._out_inv = [], []
        self._in_uniq, self._in_inv = [], []
        for q in range(P):
            u_o, i_o = np.unique(
                self.out_flat[self._out_sel[q]], return_inverse=True
            )
            self._out_uniq.append(u_o)
            self._out_inv.append(i_o.astype(np.int32))
            u_i, i_i = np.unique(
                self.in_flat[self._in_sel[q]], return_inverse=True
            )
            self._in_uniq.append(u_i)
            self._in_inv.append(i_i.astype(np.int32))

    def hits_init(self) -> None:
        self.hub = np.ones(len(self.u), np.float64)
        self.auth = np.ones(len(self.u), np.float64)

    def hits_messages(self, which: str) -> list[pa.Table]:
        """'hub': current hub scores along out-edges (u→v) — the auth
        contributions. 'auth': current auth scores along in-edges (v→u
        reversed) — the hub contributions. Same combiner pre-aggregation
        as compute_messages (one row per (dst, src-partition))."""
        if which == "hub":
            state, offs, sels = self.hub, self.out_offs, self._out_sel
            uniqs, invs = self._out_uniq, self._out_inv
        else:
            state, offs, sels = self.auth, self.in_offs, self._in_sel
            uniqs, invs = self._in_uniq, self._in_inv
        per_edge = np.repeat(state, np.diff(offs))
        out = []
        for q in range(self.P):
            uniq = uniqs[q]
            if len(uniq) == 0:
                out.append(
                    pa.table(
                        {"dst": pa.array([], pa.int64()),
                         "val": pa.array([], pa.float64())}
                    )
                )
                continue
            vals = per_edge[sels[q]]
            red = np.bincount(invs[q], weights=vals, minlength=len(uniq))
            out.append(pa.table({"dst": pa.array(uniq), "val": pa.array(red)}))
        return out

    def hits_apply(self, which: str, *tables: pa.Table) -> None:
        incoming = np.zeros(len(self.u), np.float64)
        for t in tables:
            dst = t["dst"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            # unique-dst contract (np.unique output per table)
            incoming[np.searchsorted(self.u, dst)] += val
        if which == "hub":
            self.auth = incoming
        else:
            self.hub = incoming

    def hits_sumsq(self) -> tuple[float, float]:
        return float((self.hub**2).sum()), float((self.auth**2).sum())

    def hits_scale(self, hub_norm: float, auth_norm: float) -> None:
        if hub_norm > 0:
            self.hub /= hub_norm
        if auth_norm > 0:
            self.auth /= auth_norm

    def hits_table(self) -> pa.Table:
        return pa.table(
            {
                "v": pa.array(self.u),
                "hub": pa.array(self.hub),
                "auth": pa.array(self.auth),
            }
        )

    # -- DAG longest-path levels (topological depth) ---------------------------

    def topo_init(self) -> None:
        """level[v] = length of the longest directed path ending at v
        (0 for sources). Monotone MAX fixpoint: the canonical edge set
        is a DAG by construction (src < dst after dense-rank encoding),
        so the fixpoint exists and converges in longest-path rounds."""
        self.level = np.zeros(len(self.u), np.int64)

    def topo_messages(self) -> list[pa.Table]:
        """level+1 along every out-edge, pre-aggregated by MAX per
        (dst, src-partition) — same combiner shape as compute_messages."""
        per_edge = np.repeat(self.level + 1, np.diff(self.out_offs))
        out = []
        for q in range(self.P):
            uniq = self._out_uniq[q]
            if len(uniq) == 0:
                out.append(
                    pa.table(
                        {"dst": pa.array([], pa.int64()),
                         "val": pa.array([], pa.int64())}
                    )
                )
                continue
            red = np.full(len(uniq), -1, np.int64)
            np.maximum.at(red, self._out_inv[q], per_edge[self._out_sel[q]])
            out.append(pa.table({"dst": pa.array(uniq), "val": pa.array(red)}))
        return out

    def topo_apply(self, *tables: pa.Table) -> int:
        incoming = np.full(len(self.u), -1, np.int64)
        for t in tables:
            dst = t["dst"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            np.maximum.at(incoming, np.searchsorted(self.u, dst), val)
        changed = incoming > self.level
        np.copyto(self.level, incoming, where=changed)
        return int(changed.sum())

    def topo_table(self) -> pa.Table:
        return pa.table(
            {"v": pa.array(self.u), "level": pa.array(self.level)}
        )

    # -- alpha-weighted PageRank ----------------------------------------------
    # Edge weight w_uv = α_u·α_v with α = √degree (the reference's R10
    # alpha surface, porder.cpp:394-422, as a weighting). The transition
    # probability collapses to P(u→v) = α_v / S_u with S_u = Σ_{v∈N(u)} α_v,
    # so the weighted power iteration is an UNWEIGHTED neighbor sum of
    # y = x/S: one α-sum pre-pass, then per iteration
    #   x'(v) = 0.15/n + 0.85·α_v·Σ_{u∈N(v)} y_u,   y' = x'/S.
    # Same combiner-preaggregated all-to-all as PageRank.

    def wpr_init(self) -> None:
        self._wpr_alpha = np.sqrt(self.deg)

    def wpr_alpha_messages(self) -> list[pa.Table]:
        return self._wpr_sum_messages(self._wpr_alpha)

    def _wpr_sum_messages(self, state: np.ndarray) -> list[pa.Table]:
        per_edge = np.repeat(state, np.diff(self.offsets))
        out = []
        for q in range(self.P):
            uniq = self._dst_uniq[q]
            if len(uniq) == 0:
                out.append(
                    pa.table(
                        {"dst": pa.array([], pa.int64()),
                         "val": pa.array([], pa.float64())}
                    )
                )
                continue
            red = np.bincount(
                self._dst_inv[q],
                weights=per_edge[self._dst_sel[q]],
                minlength=len(uniq),
            )
            out.append(pa.table({"dst": pa.array(uniq), "val": pa.array(red)}))
        return out

    def _wpr_incoming(self, tables) -> np.ndarray:
        incoming = np.zeros(len(self.u), np.float64)
        for t in tables:
            dst = t["dst"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            incoming[np.searchsorted(self.u, dst)] += val
        return incoming

    def wpr_alpha_apply(self, n_total: int, *tables: pa.Table) -> None:
        S = self._wpr_incoming(tables)
        # canonical graphs have no isolated vertices; guard anyway so a
        # zero S yields zero flow, not a NaN cascade
        self._wpr_S = np.where(S > 0, S, 1.0)
        x0 = np.full(len(self.u), 1.0 / max(n_total, 1), np.float64)
        self._wpr_x = x0
        self._wpr_y = x0 / self._wpr_S

    def wpr_messages(self) -> list[pa.Table]:
        return self._wpr_sum_messages(self._wpr_y)

    def wpr_apply(self, n_total: int, *tables: pa.Table) -> None:
        m = self._wpr_incoming(tables)
        x = np.float64(0.15) / max(n_total, 1) + np.float64(
            0.85
        ) * self._wpr_alpha * m
        self._wpr_x = x
        self._wpr_y = x / self._wpr_S

    def wpr_table(self) -> pa.Table:
        return pa.table(
            {"v": pa.array(self.u), "score": pa.array(self._wpr_x)}
        )

    # -- strongly connected components (directed, cyclic edge sets) ------------
    # Iterative forward/backward min-label peel: each round runs two
    # min-label fixpoints over the UNASSIGNED subgraph —
    #   f[v] = min vertex reachable FROM v      (push along the in-CSR:
    #          for edge (w,u), u's forward-min lowers w's)
    #   b[v] = min vertex that REACHES v        (push along the out-CSR)
    # Vertices with f[v] == b[v] = m are exactly the members of SCC(m)
    # whose minimum member m is both their forward- and backward-min;
    # assign scc = m and peel. Assigned vertices carry the +INF sentinel,
    # so they neither win a min nor relay one — paths through them are
    # dead, which is what makes the peel correct round over round.

    _SCC_INF = np.int64(1) << 62

    def scc_init(self) -> None:
        self.scc = np.full(len(self.u), -1, np.int64)

    def scc_phase_init(self) -> int:
        """Reset f/b to self for unassigned vertices (INF for assigned).
        Returns this partition's unassigned count."""
        active = self.scc < 0
        self.fmin = np.where(active, self.u, self._SCC_INF)
        self.bmin = np.where(active, self.u, self._SCC_INF)
        return int(active.sum())

    def scc_messages(self, which: str) -> list[pa.Table]:
        """Min-combined per (dst, src-partition), same combiner shape as
        compute_messages. 'f' pushes forward-mins to in-neighbors (in-CSR
        adjacency); 'b' pushes backward-mins to out-neighbors (out-CSR)."""
        if which == "f":
            state, offs = self.fmin, self.in_offs
            sels, uniqs, invs = self._in_sel, self._in_uniq, self._in_inv
        else:
            state, offs = self.bmin, self.out_offs
            sels, uniqs, invs = self._out_sel, self._out_uniq, self._out_inv
        per_edge = np.repeat(state, np.diff(offs))
        out = []
        for q in range(self.P):
            uniq = uniqs[q]
            if len(uniq) == 0:
                out.append(
                    pa.table(
                        {"dst": pa.array([], pa.int64()),
                         "val": pa.array([], pa.int64())}
                    )
                )
                continue
            red = np.full(len(uniq), self._SCC_INF, np.int64)
            np.minimum.at(red, invs[q], per_edge[sels[q]])
            out.append(pa.table({"dst": pa.array(uniq), "val": pa.array(red)}))
        return out

    def scc_apply(self, which: str, *tables: pa.Table) -> int:
        incoming = np.full(len(self.u), self._SCC_INF, np.int64)
        for t in tables:
            dst = t["dst"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            np.minimum.at(incoming, np.searchsorted(self.u, dst), val)
        state = self.fmin if which == "f" else self.bmin
        upd = (self.scc < 0) & (incoming < state)
        np.copyto(state, incoming, where=upd)
        return int(upd.sum())

    def scc_assign(self) -> int:
        """Assign scc = f where the fixpoints agree; return the number of
        vertices STILL unassigned in this partition."""
        active = self.scc < 0
        done = active & (self.fmin == self.bmin)
        self.scc[done] = self.fmin[done]
        return int(active.sum()) - int(done.sum())

    def scc_table(self) -> pa.Table:
        return pa.table({"v": pa.array(self.u), "scc": pa.array(self.scc)})

    def scc_sync_state(self) -> None:
        """Mirror the scc assignment into the generic state slot so the
        shared per-partition checkpoint/load machinery applies. f/b are
        round-local (re-initialized by scc_phase_init), so the assignment
        vector is the complete round-boundary state."""
        self.state = self.scc

    def scc_from_state(self) -> None:
        self.scc = self.state.astype(np.int64)

    # -- maximal independent set (Luby 1986) -----------------------------------
    # Each round, every undecided vertex draws a deterministic priority
    # (splitmix64 of v + a round constant — a bijection, so priorities
    # are DISTINCT within a round and ties cannot occur); a vertex joins
    # the MIS iff its priority beats every undecided neighbor's, and
    # neighbors of new members drop out. Two pre-aggregated exchanges per
    # round (min-priority, then member-notify) on the symmetric CSR;
    # O(log n) rounds w.h.p. States: 0 undecided / 1 IN / 2 OUT.

    _MIS_INF = np.int64(np.iinfo(np.int64).max)

    def mis_init(self, seed: int) -> None:
        self.mis = np.zeros(len(self.u), np.int8)
        self._mis_seed = int(seed)

    def _mis_pri(self, rnd: int) -> np.ndarray:
        from graphsetintersection_ray.functions.hll import splitmix64

        # python-int modular product, identical to the uint64 wraparound
        # (numpy's scalar multiply warns on overflow for large layer-
        # salted seeds; the wrap itself is intended)
        c = np.uint64(
            (self._mis_seed * 0xD1B54A32D192ED03 + rnd)
            & 0xFFFFFFFFFFFFFFFF
        )
        h = splitmix64(self.u.astype(np.uint64) + c).view(np.int64)
        # keep the INF sentinel unambiguous (remap the one colliding value)
        h = np.where(h == self._MIS_INF, self._MIS_INF - 1, h)
        return np.where(self.mis == 0, h, self._MIS_INF)

    def mis_messages(self, rnd: int, which: str) -> list[pa.Table]:
        if which == "p":
            self._mis_pri_cur = self._mis_pri(rnd)
            per_edge = np.repeat(self._mis_pri_cur, np.diff(self.offsets))
            empty_fill, reduce_at = self._MIS_INF, np.minimum.at
        else:  # 'n': notify neighbors of new members
            per_edge = np.repeat(
                (self.mis == 1).astype(np.int64), np.diff(self.offsets)
            )
            empty_fill, reduce_at = np.int64(0), np.maximum.at
        out = []
        for q in range(self.P):
            uniq = self._dst_uniq[q]
            if len(uniq) == 0:
                out.append(
                    pa.table(
                        {"dst": pa.array([], pa.int64()),
                         "val": pa.array([], pa.int64())}
                    )
                )
                continue
            red = np.full(len(uniq), empty_fill, np.int64)
            reduce_at(red, self._dst_inv[q], per_edge[self._dst_sel[q]])
            out.append(pa.table({"dst": pa.array(uniq), "val": pa.array(red)}))
        return out

    def mis_apply(self, which: str, *tables: pa.Table) -> int:
        if which == "p":
            incoming = np.full(len(self.u), self._MIS_INF, np.int64)
            for t in tables:
                dst = t["dst"].to_numpy(zero_copy_only=False)
                val = t["val"].to_numpy(zero_copy_only=False)
                np.minimum.at(incoming, np.searchsorted(self.u, dst), val)
            win = (self.mis == 0) & (self._mis_pri_cur < incoming)
            self.mis[win] = 1
            return int(win.sum())
        incoming = np.zeros(len(self.u), np.int64)
        for t in tables:
            dst = t["dst"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            np.maximum.at(incoming, np.searchsorted(self.u, dst), val)
        drop = (self.mis == 0) & (incoming == 1)
        self.mis[drop] = 2
        return int((self.mis == 0).sum())

    def mis_table(self) -> pa.Table:
        return pa.table(
            {
                "v": pa.array(self.u),
                "in_mis": pa.array((self.mis == 1).astype(np.int64)),
            }
        )

    # -- greedy coloring via iterated MIS layers ---------------------------

    def color_init(self) -> None:
        self.color = np.full(len(self.u), -1, np.int64)

    def color_round_init(self, seed: int) -> None:
        """Start one MIS layer: already-colored vertices enter decided-out
        (state 2) so the Luby round runs on the residual graph only."""
        self._mis_seed = int(seed)
        self.mis = np.where(self.color >= 0, np.int8(2), np.int8(0))

    def color_assign(self, c: int) -> int:
        """Color this layer's MIS members; returns the uncolored count."""
        sel = self.mis == 1
        self.color[sel] = int(c)
        return int((self.color < 0).sum())

    def color_table(self) -> pa.Table:
        return pa.table(
            {"v": pa.array(self.u), "color": pa.array(self.color)}
        )

    # -- HyperBall (approximate neighborhood function) ------------------------
    # HLL primitives shared with the approx-distinct operator live in
    # functions/hll.py.

    def hb_init(self, m: int, seed: int) -> None:
        """Per-vertex HyperLogLog registers seeded with {v} itself
        (radius-0 ball). Deterministic splitmix64 vertex hash."""
        from graphsetintersection_ray.functions.hll import hll_registers

        self.hb_m = m
        bucket, rank = hll_registers(self.u, m, seed)
        self.hb = np.zeros((len(self.u), m), np.uint8)
        self.hb[np.arange(len(self.u)), bucket] = rank

    def _hb_estimates(self) -> np.ndarray:
        from graphsetintersection_ray.functions.hll import hll_estimate

        if len(self.u) == 0:
            return np.empty(0, np.float64)
        return hll_estimate(self.hb)

    def hb_messages(self) -> list[pa.Table]:
        """Per destination partition: register rows max-merged by dst.
        Transient cost is E×m bytes per partition (the per-edge register
        gather) — size m and the per-partition edge budget together."""
        rows_per_edge = np.repeat(
            np.arange(len(self.u)), np.diff(self.offsets)
        )
        out = []
        for q in range(self.P):
            sel = self._dst_sel[q]
            uniq = self._dst_uniq[q]
            if len(uniq) == 0:
                out.append(
                    pa.table(
                        {
                            "dst": pa.array([], pa.int64()),
                            "regs": pa.array(
                                [], pa.list_(pa.uint8(), self.hb_m)
                            ),
                        }
                    )
                )
                continue
            inv = self._dst_inv[q]
            acc = np.zeros((len(uniq), self.hb_m), np.uint8)
            np.maximum.at(acc, inv, self.hb[rows_per_edge[sel]])
            out.append(
                pa.table(
                    {
                        "dst": pa.array(uniq),
                        "regs": pa.FixedSizeListArray.from_arrays(
                            pa.array(acc.ravel()), self.hb_m
                        ),
                    }
                )
            )
        return out

    def hb_apply(self, *tables: pa.Table) -> dict:
        new = self.hb.copy()
        for t in tables:
            if t.num_rows == 0:
                continue
            dst = t["dst"].to_numpy(zero_copy_only=False)
            regs = (
                t["regs"]
                .combine_chunks()
                .values.to_numpy(zero_copy_only=False)
                .reshape(-1, self.hb_m)
            )
            # unique-dst contract (np.unique output per table)
            idx = np.searchsorted(self.u, dst)
            new[idx] = np.maximum(new[idx], regs)
        changed = int((new != self.hb).any(axis=1).sum())
        self.hb = new
        return {"changed": changed, "sum_est": float(self._hb_estimates().sum())}

    def hb_sum(self) -> float:
        return float(self._hb_estimates().sum())

    def hb_table(self) -> pa.Table:
        return pa.table(
            {"v": pa.array(self.u), "ball": pa.array(self._hb_estimates())}
        )

    # -- Brandes betweenness (forward σ-BFS + reverse dependency sweep) ------
    # The at-scale path: per-source supersteps on the SAME partitioned CSR
    # (no broadcast adjacency). Forward: level-synchronous BFS that also
    # accumulates σ (shortest-path counts) — all of a vertex's level-L
    # predecessors fire in the same superstep, so one additive apply per
    # level is exact. Backward: vertices at level L send (1+δ_w)/σ_w along
    # every edge; only receivers at level L−1 accept (that filter IS the
    # shortest-path DAG), accumulating δ_u += σ_u · Σ incoming.

    def brandes_reset(self) -> None:
        self.bc_acc = np.zeros(len(self.u), np.float64)

    def brandes_init(self, source: int) -> None:
        self.br_dist = np.full(len(self.u), self.UNREACHED, np.int64)
        self.br_sigma = np.zeros(len(self.u), np.float64)
        self.br_delta = np.zeros(len(self.u), np.float64)
        self.br_source = source
        idx = np.searchsorted(self.u, source)
        if idx < len(self.u) and self.u[idx] == source:
            self.br_dist[idx] = 0
            self.br_sigma[idx] = 1.0

    def _edge_messages_from(
        self, mask: np.ndarray, per_vertex_val: np.ndarray
    ) -> list[pa.Table]:
        """(dst, val) float messages along every edge of the masked
        vertices, sum-combined per destination BEFORE the shuffle (same
        combiner shape as compute_messages)."""
        lens = np.diff(self.offsets)
        per_edge_mask = np.repeat(mask, lens)
        per_edge_val = np.repeat(per_vertex_val, lens)
        out = []
        for q in range(self.P):
            sel = self._dst_sel[q]
            selm = sel[per_edge_mask[sel]]
            dsts = self.flat[selm]
            vals = per_edge_val[selm]
            if len(dsts) == 0:
                out.append(
                    pa.table(
                        {
                            "dst": pa.array([], pa.int64()),
                            "val": pa.array([], pa.float64()),
                        }
                    )
                )
                continue
            uniq, inv = np.unique(dsts, return_inverse=True)
            red = np.bincount(inv, weights=vals, minlength=len(uniq))
            out.append(pa.table({"dst": pa.array(uniq), "val": pa.array(red)}))
        return out

    def brandes_forward_messages(self, level: int) -> list[pa.Table]:
        mask = self.br_dist == level
        return self._edge_messages_from(mask, self.br_sigma)

    def brandes_forward_apply(self, level: int, *tables: pa.Table) -> int:
        """Apply σ messages sent by the level-``level`` frontier: targets
        still unreached become level+1 and sum σ; targets already set to
        level+1 by an earlier table in this same superstep keep summing.
        Returns the number of newly discovered vertices."""
        newly = 0
        for t in tables:
            if t.num_rows == 0:
                continue
            dst = t["dst"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.u, dst)
            ok = (self.br_dist[idx] == self.UNREACHED) | (
                self.br_dist[idx] == level + 1
            )
            idx, val = idx[ok], val[ok]
            newly += int((self.br_dist[idx] == self.UNREACHED).sum())
            self.br_dist[idx] = level + 1
            # unique-dst contract (np.unique output per table)
            self.br_sigma[idx] += val
        return newly

    def brandes_backward_messages(self, level: int) -> list[pa.Table]:
        mask = self.br_dist == level
        val = np.where(
            mask & (self.br_sigma > 0),
            (1.0 + self.br_delta) / np.maximum(self.br_sigma, 1.0e-300),
            0.0,
        )
        return self._edge_messages_from(mask, val)

    def brandes_backward_apply(self, level: int, *tables: pa.Table) -> None:
        inc = np.zeros(len(self.u), np.float64)
        for t in tables:
            if t.num_rows == 0:
                continue
            dst = t["dst"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            # unique-dst contract (np.unique output per table)
            inc[np.searchsorted(self.u, dst)] += val
        ok = self.br_dist == level - 1
        self.br_delta[ok] += self.br_sigma[ok] * inc[ok]

    def brandes_accumulate(self) -> None:
        d = self.br_delta
        idx = np.searchsorted(self.u, self.br_source)
        if idx < len(self.u) and self.u[idx] == self.br_source:
            d = d.copy()
            d[idx] = 0.0
        self.bc_acc += d

    def brandes_table(self) -> pa.Table:
        return pa.table({"v": pa.array(self.u), "part": pa.array(self.bc_acc)})


class SuperstepEngine:
    """Drives P PartitionWorkers through BSP supersteps with per-iteration
    checkpointing and resume."""

    def __init__(
        self,
        csr_path: str,
        num_partitions: int,
        ckpt_dir: str | None = None,
        graph_fingerprint: str = "",
    ):
        if not os.path.isdir(csr_path):
            # a missing CSR dir would otherwise load ZERO vertices and
            # every algorithm would silently return empty results
            raise FileNotFoundError(
                f"superstep engine needs a partitioned CSR dir, got "
                f"{csr_path!r} (write one with write_partitioned_csr)"
            )
        self.P = num_partitions
        self.ckpt_dir = ckpt_dir
        self.fingerprint = graph_fingerprint
        self.workers = [
            PartitionWorker.remote(csr_path, p, num_partitions)
            for p in range(num_partitions)
        ]
        self.n_total = sum(ray.get([w.num_vertices.remote() for w in self.workers]))
        # one-time static-structure exchange: each pair's destination
        # list never changes, so steady-state supersteps ship bare value
        # vectors (see PartitionWorker.structure_lists)
        struct_refs = [
            w.structure_lists.options(num_returns=self.P).remote()
            for w in self.workers
        ]
        if self.P == 1:
            struct_refs = [[r] for r in struct_refs]
        ray.get(
            [
                w.cache_incoming_structure.remote(
                    *[struct_refs[p][q] for p in range(self.P)]
                )
                for q, w in enumerate(self.workers)
            ]
        )

    # -- checkpoint bookkeeping --------------------------------------------

    def _iter_dir(self, algo: str, k: int) -> str:
        return os.path.join(self.ckpt_dir, algo, f"iter={k}")

    def _manifest_path(self, algo: str, k: int) -> str:
        return os.path.join(self._iter_dir(algo, k), "manifest.json")

    def latest_complete_iter(self, algo: str) -> int:
        """Newest iteration with a complete manifest, or -1."""
        if not self.ckpt_dir:
            return -1
        base = os.path.join(self.ckpt_dir, algo)
        if not os.path.isdir(base):
            return -1
        best = -1
        for name in os.listdir(base):
            if not name.startswith("iter="):
                continue
            k = int(name.split("=")[1])
            mp = self._manifest_path(algo, k)
            if os.path.exists(mp):
                with open(mp) as f:
                    m = json.load(f)
                if m.get("complete") and m.get("fingerprint") == self.fingerprint:
                    best = max(best, k)
        return best

    def _checkpoint(self, algo: str, k: int, step_stats: dict) -> None:
        if not self.ckpt_dir:
            return
        d = self._iter_dir(algo, k)
        os.makedirs(d, exist_ok=True)
        parts = ray.get([w.checkpoint.remote(d) for w in self.workers])
        tmp = self._manifest_path(algo, k) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "algo": algo,
                    "iter": k,
                    "fingerprint": self.fingerprint,
                    "num_partitions": self.P,
                    "n_vertices": self.n_total,
                    "complete": True,
                    "partitions": parts,
                    **step_stats,
                },
                f,
            )
        os.replace(tmp, self._manifest_path(algo, k))

    # -- drivers ------------------------------------------------------------

    def _run(
        self,
        algo: str,
        kind: str,
        max_iters: int,
        converged,
        resume: bool = True,
        checkpoint_every: int = 1,
        source: int | None = None,
    ) -> dict:
        start_iter = self.latest_complete_iter(algo) if resume else -1
        if start_iter >= 0:
            d = self._iter_dir(algo, start_iter)
            ray.get([w.load_state.remote(d) for w in self.workers])
            if source is not None:
                ray.get(
                    [w.set_source.remote(kind, source) for w in self.workers]
                )
        else:
            ray.get(
                [
                    w.init_state.remote(kind, self.n_total, source=source)
                    for w in self.workers
                ]
            )
        stats = {"iters": 0, "edges_per_iter": 0, "sec_per_iter": []}
        # first superstep's messages; thereafter each fused step call
        # applies iteration k and pre-computes iteration k+1's messages
        msg_refs = [
            w.compute_messages.options(num_returns=self.P).remote(kind)
            for w in self.workers
        ]
        if self.P == 1:
            msg_refs = [[r] for r in msg_refs]
        # Without checkpointing, iterations are submitted in bursts of
        # CHUNK: the actor-to-actor message flow is per-iteration (BSP
        # semantics unchanged) but the driver only barriers once per
        # chunk, amortizing its per-iteration fixed cost. Convergence is
        # then detected up to CHUNK-1 iterations late — harmless: the
        # fixpoints are monotone (no further change) and extra PageRank
        # iterations only tighten the result. Checkpointed runs keep the
        # one-barrier-per-iteration loop (chunk=1).
        chunk = 1 if checkpoint_every else 4
        k = start_iter + 1
        while k < max_iters:
            end = min(k + chunk, max_iters)
            t0 = time.time()
            stat_refs: list = []
            for _ in range(k, end):
                outs = [
                    w.step.options(num_returns=self.P + 1).remote(
                        kind,
                        self.n_total,
                        *[msg_refs[p][q] for p in range(self.P)],
                    )
                    for q, w in enumerate(self.workers)
                ]
                msg_refs = [o[: self.P] for o in outs]
                stat_refs.append([o[self.P] for o in outs])
            done = False
            for kk, srefs in zip(range(k, end), stat_refs):
                results = ray.get(srefs)
                stats["iters"] = kk + 1
                if checkpoint_every and (kk % checkpoint_every == 0):
                    self._checkpoint(algo, kk, {"step": results})
                if converged(results):
                    done = True
                    break
            # the whole chunk was pre-submitted, so actor STATE is at
            # iteration `end` even when convergence fired mid-chunk;
            # stats["iters"] stays the converged iteration. Harmless for
            # the monotone fixpoints (no further change) and for PageRank
            # (extra iterations only tighten), but callers comparing to a
            # fixed-iteration oracle should read iters_applied.
            stats["iters_applied"] = end
            stats["sec_per_iter"].append(
                (time.time() - t0) / max(stats["iters"] - k, 1)
            )
            if done:
                break
            k = end
        return stats

    def pagerank(
        self,
        max_iters: int = 100,
        tol: float = 1e-6,
        resume: bool = True,
        checkpoint_every: int = 1,
    ) -> dict:
        """Power iteration with damping 0.85 on the symmetric adjacency,
        converging when the global max per-vertex delta < tol."""
        return self._run(
            "pagerank",
            "pagerank",
            max_iters,
            lambda rs: max(r["max_delta"] for r in rs) < tol,
            resume=resume,
            checkpoint_every=checkpoint_every,
        )

    def katz(
        self,
        iters: int = 8,
        resume: bool = True,
        checkpoint_every: int = 1,
    ) -> dict:
        """Katz centrality, exactly ``iters`` affine iterations
        x <- 1 + KATZ_ALPHA * S.x from x = 0 on the symmetric adjacency
        (beta = 1). Fixed-iteration by design: the truncated Katz series
        is deterministic and SQL-replayable; convergence needs
        alpha < 1/lambda_max, which a fixed prefix never depends on."""
        return self._run(
            "katz",
            "katz",
            iters,
            lambda rs: False,
            resume=resume,
            checkpoint_every=checkpoint_every,
        )

    def personalized_pagerank(
        self,
        source: int,
        max_iters: int = 100,
        tol: float = 1e-6,
        resume: bool = True,
        checkpoint_every: int = 1,
    ) -> dict:
        """Random walk with restart: all (1−d) restart mass on ``source``
        instead of uniform — the proximity/seeded-relevance variant of the
        same power iteration. Checkpoints are namespaced per source."""
        return self._run(
            f"ppr_s{source}",
            "ppr",
            max_iters,
            lambda rs: max(r["max_delta"] for r in rs) < tol,
            resume=resume,
            checkpoint_every=checkpoint_every,
            source=source,
        )

    def connected_components(
        self, max_iters: int = 200, resume: bool = True, checkpoint_every: int = 1
    ) -> dict:
        """Min-label propagation to fixpoint — exact component ids (the
        label of a component is its minimum vertex id). Same discovery
        semantics as the reference's BFS CC inside SlashBurn
        (porder.cpp:1052-1075), expressed as a monotone BSP fixpoint."""
        return self._run(
            "cc",
            "cc",
            max_iters,
            lambda rs: sum(r["changed"] for r in rs) == 0,
            resume=resume,
            checkpoint_every=checkpoint_every,
        )

    def label_propagation(
        self, max_iters: int = 200, resume: bool = True, checkpoint_every: int = 1
    ) -> dict:
        """Min-rule label propagation (identical fixpoint to CC on
        undirected graphs; kept as a separately-named query per the spec)."""
        return self._run(
            "labelprop",
            "labelprop",
            max_iters,
            lambda rs: sum(r["changed"] for r in rs) == 0,
            resume=resume,
            checkpoint_every=checkpoint_every,
        )

    def bfs(
        self,
        source: int,
        max_iters: int = 500,
        resume: bool = True,
        checkpoint_every: int = 1,
    ) -> dict:
        """Unweighted shortest distance from ``source`` to every reachable
        vertex (the reference's BFS traversal / shortest-distance queries,
        porder.cpp:545-584, python/gen_queries.py) as a monotone min
        fixpoint; unreached vertices keep PartitionWorker.UNREACHED."""
        return self._run(
            f"bfs_s{source}",
            "bfs",
            max_iters,
            lambda rs: sum(r["changed"] for r in rs) == 0,
            resume=resume,
            checkpoint_every=checkpoint_every,
            source=source,
        )

    def hits(
        self, out_csr_path: str, in_csr_path: str, iters: int = 6
    ) -> dict:
        """HITS hubs/authorities by power iteration on the canonical
        directed edge set: auth_k = Aᵀ·hub_{k-1}, hub_k = A·auth_k, run
        ``iters`` full iterations unnormalized (the updates are linear, so
        one final global L2 normalization is equivalent to per-iteration
        normalization) — which keeps the SQL oracle an exact chained-CTE
        replay. Two message exchanges per iteration through the same
        pre-aggregated all-to-all as PageRank."""
        ray.get(
            [w.load_directed.remote(out_csr_path, in_csr_path) for w in self.workers]
        )
        ray.get([w.hits_init.remote() for w in self.workers])
        t0 = time.time()
        for _ in range(iters):
            for which in ("hub", "auth"):
                msgs = [
                    w.hits_messages.options(num_returns=self.P).remote(which)
                    for w in self.workers
                ]
                if self.P == 1:
                    msgs = [[r] for r in msgs]
                ray.get(
                    [
                        w.hits_apply.remote(
                            which, *[msgs[p][q] for p in range(self.P)]
                        )
                        for q, w in enumerate(self.workers)
                    ]
                )
        ss = ray.get([w.hits_sumsq.remote() for w in self.workers])
        hub_norm = float(np.sqrt(sum(h for h, _ in ss)))
        auth_norm = float(np.sqrt(sum(a for _, a in ss)))
        ray.get([w.hits_scale.remote(hub_norm, auth_norm) for w in self.workers])
        return {"iters": iters, "sec": time.time() - t0}

    def topo_levels(
        self, out_csr_path: str, in_csr_path: str, max_levels: int = 1_000_000
    ) -> dict:
        """Longest-path DAG levels (scheduling / dependency depth) on the
        canonical directed edge set: level[v] = longest directed path
        ending at v, computed as a monotone MAX-label fixpoint — one
        pre-aggregated all-to-all per superstep, converging in
        longest-path-length rounds (the DAG's condensation depth).
        Raises loudly past ``max_levels`` — the only way a monotone max
        fixpoint fails to converge is a cycle, which the canonical
        src<dst encoding rules out by construction."""
        ray.get(
            [
                w.load_directed.remote(out_csr_path, in_csr_path)
                for w in self.workers
            ]
        )
        ray.get([w.topo_init.remote() for w in self.workers])
        t0 = time.time()
        it = 0
        while True:
            msgs = [
                w.topo_messages.options(num_returns=self.P).remote()
                for w in self.workers
            ]
            if self.P == 1:
                msgs = [[r] for r in msgs]
            changed = ray.get(
                [
                    w.topo_apply.remote(*[msgs[p][q] for p in range(self.P)])
                    for q, w in enumerate(self.workers)
                ]
            )
            it += 1
            if sum(changed) == 0:
                break
            if it > max_levels:
                raise RuntimeError(
                    f"topo_levels exceeded {max_levels} supersteps — "
                    "the edge set contains a cycle"
                )
        return {"iters": it, "sec": time.time() - t0}

    def topo_dataset(self):
        """(v, level) as a Ray Dataset — one block per partition, no
        driver concatenation (the at-scale result path)."""
        import ray.data as rd

        return rd.from_arrow_refs([w.topo_table.remote() for w in self.workers])

    def collect_topo(self) -> pa.Table:
        tables = ray.get([w.topo_table.remote() for w in self.workers])
        return pa.concat_tables([t for t in tables if t.num_rows])

    def weighted_pagerank(self, iters: int = 5) -> dict:
        """Alpha-weighted PageRank (w_uv = α_u·α_v, α = √degree): one
        α-sum pre-exchange, then ``iters`` fixed unweighted-sum
        supersteps of y = x/S (see the wpr_* worker docstrings). Fixed
        iteration count by design — the exact recursive-CTE SQL replay
        needs a deterministic prefix."""
        ray.get([w.wpr_init.remote() for w in self.workers])
        t0 = time.time()
        msgs = [
            w.wpr_alpha_messages.options(num_returns=self.P).remote()
            for w in self.workers
        ]
        if self.P == 1:
            msgs = [[r] for r in msgs]
        ray.get(
            [
                w.wpr_alpha_apply.remote(
                    self.n_total, *[msgs[p][q] for p in range(self.P)]
                )
                for q, w in enumerate(self.workers)
            ]
        )
        for _ in range(iters):
            msgs = [
                w.wpr_messages.options(num_returns=self.P).remote()
                for w in self.workers
            ]
            if self.P == 1:
                msgs = [[r] for r in msgs]
            ray.get(
                [
                    w.wpr_apply.remote(
                        self.n_total, *[msgs[p][q] for p in range(self.P)]
                    )
                    for q, w in enumerate(self.workers)
                ]
            )
        return {"iters": iters, "sec": time.time() - t0}

    def wpr_dataset(self):
        import ray.data as rd

        return rd.from_arrow_refs([w.wpr_table.remote() for w in self.workers])

    def collect_wpr(self) -> pa.Table:
        tables = ray.get([w.wpr_table.remote() for w in self.workers])
        return pa.concat_tables([t for t in tables if t.num_rows])

    def scc(
        self,
        out_csr_path: str,
        in_csr_path: str,
        max_rounds: int = 10_000,
        resume: bool = True,
    ) -> dict:
        """Strongly connected components on a (cyclic) directed edge set
        by iterative forward/backward min-label peel (see the scc_*
        worker docstrings). Each peel round runs two min-label superstep
        fixpoints over the unassigned subgraph and assigns every SCC
        whose minimum member is simultaneously its members' forward- and
        backward-min — at least the SCC of the globally minimal
        unassigned vertex, so rounds ≤ #SCCs (in practice a handful).
        Raises loudly past ``max_rounds`` rather than spinning.

        Checkpointing (when the engine has a ckpt_dir): the assignment
        vector is persisted per partition at every peel-round boundary
        (f/b are round-local, so it is the complete state); ``resume``
        reloads the newest complete round and continues peeling from
        there — a killed run redoes at most one round's fixpoints."""
        ray.get(
            [
                w.load_directed.remote(out_csr_path, in_csr_path)
                for w in self.workers
            ]
        )
        start = self.latest_complete_iter("scc") if (
            resume and self.ckpt_dir
        ) else -1
        if start >= 0:
            d = self._iter_dir("scc", start)
            ray.get([w.load_state.remote(d) for w in self.workers])
            ray.get([w.scc_from_state.remote() for w in self.workers])
        else:
            ray.get([w.scc_init.remote() for w in self.workers])
        t0 = time.time()
        rounds = max(start + 1, 0)
        supersteps = 0
        while True:
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    f"scc exceeded {max_rounds} peel rounds — pathological "
                    "SCC structure; raise max_rounds explicitly"
                )
            ray.get([w.scc_phase_init.remote() for w in self.workers])
            for which in ("f", "b"):
                while True:
                    msgs = [
                        w.scc_messages.options(num_returns=self.P).remote(which)
                        for w in self.workers
                    ]
                    if self.P == 1:
                        msgs = [[r] for r in msgs]
                    changed = ray.get(
                        [
                            w.scc_apply.remote(
                                which, *[msgs[p][q] for p in range(self.P)]
                            )
                            for q, w in enumerate(self.workers)
                        ]
                    )
                    supersteps += 1
                    if sum(changed) == 0:
                        break
            remaining = sum(ray.get([w.scc_assign.remote() for w in self.workers]))
            if self.ckpt_dir:
                ray.get([w.scc_sync_state.remote() for w in self.workers])
                self._checkpoint("scc", rounds - 1, {"remaining": remaining})
            if remaining == 0:
                break
        return {
            "rounds": rounds,
            "supersteps": supersteps,
            "sec": time.time() - t0,
        }

    def scc_dataset(self):
        """(v, scc) as a Ray Dataset — one block per partition, no driver
        concatenation (the at-scale result path)."""
        import ray.data as rd

        return rd.from_arrow_refs([w.scc_table.remote() for w in self.workers])

    def collect_scc(self) -> pa.Table:
        tables = ray.get([w.scc_table.remote() for w in self.workers])
        return pa.concat_tables([t for t in tables if t.num_rows])

    def mis(self, seed: int = 7, max_rounds: int = 200) -> dict:
        """Luby's maximal independent set on the symmetric adjacency:
        two pre-aggregated exchanges per round (min neighbor priority,
        member notification); terminates when no vertex is undecided —
        O(log n) rounds w.h.p., loud failure past ``max_rounds``."""
        ray.get([w.mis_init.remote(seed) for w in self.workers])
        t0 = time.time()
        rnd = 0
        while True:
            rnd += 1
            if rnd > max_rounds:
                raise RuntimeError(
                    f"mis exceeded {max_rounds} rounds (expected O(log n))"
                )
            for which in ("p", "n"):
                msgs = [
                    w.mis_messages.options(num_returns=self.P).remote(rnd, which)
                    for w in self.workers
                ]
                if self.P == 1:
                    msgs = [[r] for r in msgs]
                counts = ray.get(
                    [
                        w.mis_apply.remote(
                            which, *[msgs[p][q] for p in range(self.P)]
                        )
                        for q, w in enumerate(self.workers)
                    ]
                )
            if sum(counts) == 0:
                break
        return {"rounds": rnd, "sec": time.time() - t0}

    def mis_dataset(self):
        import ray.data as rd

        return rd.from_arrow_refs([w.mis_table.remote() for w in self.workers])

    def collect_mis(self) -> pa.Table:
        tables = ray.get([w.mis_table.remote() for w in self.workers])
        return pa.concat_tables([t for t in tables if t.num_rows])

    def greedy_coloring(
        self, seed: int = 7, max_colors: int = 512, max_rounds: int = 200
    ) -> dict:
        """Greedy graph coloring by iterated Luby-MIS layers: layer c runs
        a full MIS on the residual (uncolored) graph and assigns color c
        to its members — every vertex is adjacent to some member of each
        earlier layer's MIS (maximality), so layer count stays near the
        degeneracy in practice and is hard-capped loudly. Deterministic:
        layer c reuses the seeded splitmix64 priorities with a
        layer-salted seed, so the run replays exactly at any
        partitioning."""
        ray.get([w.color_init.remote() for w in self.workers])
        t0 = time.time()
        total_rounds = 0
        c = 0
        while True:
            if c >= max_colors:
                raise RuntimeError(
                    f"coloring exceeded {max_colors} layers"
                )
            layer_seed = int(seed) + 1_000_003 * c
            ray.get(
                [w.color_round_init.remote(layer_seed) for w in self.workers]
            )
            rnd = 0
            while True:
                rnd += 1
                if rnd > max_rounds:
                    raise RuntimeError(
                        f"mis layer {c} exceeded {max_rounds} rounds"
                    )
                for which in ("p", "n"):
                    msgs = [
                        w.mis_messages.options(num_returns=self.P).remote(
                            rnd, which
                        )
                        for w in self.workers
                    ]
                    if self.P == 1:
                        msgs = [[r] for r in msgs]
                    counts = ray.get(
                        [
                            w.mis_apply.remote(
                                which, *[msgs[p][q] for p in range(self.P)]
                            )
                            for q, w in enumerate(self.workers)
                        ]
                    )
                if sum(counts) == 0:
                    break
            total_rounds += rnd
            remaining = sum(
                ray.get([w.color_assign.remote(c) for w in self.workers])
            )
            c += 1
            if remaining == 0:
                break
        return {
            "colors": c,
            "layers": c,
            "rounds": total_rounds,
            "sec": time.time() - t0,
        }

    def coloring_dataset(self):
        import ray.data as rd

        return rd.from_arrow_refs(
            [w.color_table.remote() for w in self.workers]
        )

    def collect_coloring(self) -> pa.Table:
        tables = ray.get([w.color_table.remote() for w in self.workers])
        return pa.concat_tables([t for t in tables if t.num_rows])

    def hyperball(
        self, max_iters: int = 64, m: int = 64, seed: int = 77
    ) -> dict:
        """HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
        Centralities with HyperBall", 2013): per-vertex HyperLogLog
        counters of the radius-t ball, grown by max-merging neighbor
        registers each superstep until no register changes. Returns the
        approximate neighborhood function ``nf[t] = Σ_v |ball(v,t)|``
        — the basis for effective-diameter / average-distance estimates
        at scales where exact all-pairs BFS is impossible. Registers are
        m bytes/vertex; the exchange is the same pre-aggregated
        all-to-all as PageRank with max instead of sum."""
        ray.get([w.hb_init.remote(m, seed) for w in self.workers])
        nf = [float(sum(ray.get([w.hb_sum.remote() for w in self.workers])))]
        t0 = time.time()
        for _ in range(max_iters):
            msgs = [
                w.hb_messages.options(num_returns=self.P).remote()
                for w in self.workers
            ]
            if self.P == 1:
                msgs = [[r] for r in msgs]
            results = ray.get(
                [
                    w.hb_apply.remote(*[msgs[p][q] for p in range(self.P)])
                    for q, w in enumerate(self.workers)
                ]
            )
            if sum(r["changed"] for r in results) == 0:
                break
            nf.append(float(sum(r["sum_est"] for r in results)))
        return {"nf": nf, "radius": len(nf) - 1, "sec": time.time() - t0}

    def brandes(self, sources, max_levels: int = 500) -> dict:
        """Accumulate per-source Brandes dependency vectors over
        ``sources`` with forward σ-BFS + reverse dependency supersteps on
        the partitioned CSR — the no-broadcast at-scale betweenness path.
        Cost: |sources| × 2·diameter barriers; production runs sample
        sources (the standard pivot estimator) exactly like closeness."""
        ray.get([w.brandes_reset.remote() for w in self.workers])
        stats = {"sources": 0, "supersteps": 0}
        t0 = time.time()
        for s in sources:
            ray.get([w.brandes_init.remote(int(s)) for w in self.workers])
            level = 0
            while True:
                msgs = [
                    w.brandes_forward_messages.options(
                        num_returns=self.P
                    ).remote(level)
                    for w in self.workers
                ]
                if self.P == 1:
                    msgs = [[r] for r in msgs]
                newly = ray.get(
                    [
                        w.brandes_forward_apply.remote(
                            level, *[msgs[p][q] for p in range(self.P)]
                        )
                        for q, w in enumerate(self.workers)
                    ]
                )
                stats["supersteps"] += 1
                if sum(newly) == 0:
                    break
                level += 1
                if level > max_levels:
                    raise RuntimeError(
                        f"brandes forward pass exceeded {max_levels} levels"
                    )
            for L in range(level, 0, -1):
                msgs = [
                    w.brandes_backward_messages.options(
                        num_returns=self.P
                    ).remote(L)
                    for w in self.workers
                ]
                if self.P == 1:
                    msgs = [[r] for r in msgs]
                ray.get(
                    [
                        w.brandes_backward_apply.remote(
                            L, *[msgs[p][q] for p in range(self.P)]
                        )
                        for q, w in enumerate(self.workers)
                    ]
                )
                stats["supersteps"] += 1
            ray.get([w.brandes_accumulate.remote() for w in self.workers])
            stats["sources"] += 1
        stats["sec"] = time.time() - t0
        return stats

    def brandes_dataset(self):
        """(v, part) accumulated dependency sums as a Ray Dataset — one
        block per partition, no driver concatenation."""
        import ray.data as rd

        return rd.from_arrow_refs([w.brandes_table.remote() for w in self.workers])

    def hb_dataset(self):
        """(v, ball) final per-vertex ball-size estimates as a Dataset."""
        import ray.data as rd

        return rd.from_arrow_refs([w.hb_table.remote() for w in self.workers])

    def hits_dataset(self):
        """(v, hub, auth) as a Ray Dataset — one block per partition, no
        driver concatenation (the at-scale result path)."""
        import ray.data as rd

        return rd.from_arrow_refs([w.hits_table.remote() for w in self.workers])

    def collect_hits(self) -> pa.Table:
        tables = ray.get([w.hits_table.remote() for w in self.workers])
        return pa.concat_tables([t for t in tables if t.num_rows])

    def collect_state(self) -> pa.Table:
        """Gather (v, state) from all partitions (small results only —
        at scale use ``state_dataset`` / ``collect_state_to_parquet``)."""
        tables = ray.get([w.state_table.remote() for w in self.workers])
        return pa.concat_tables([t for t in tables if t.num_rows])

    def state_dataset(self):
        """(v, state) as a Ray Dataset — one block per partition built
        from the actor-held state refs, with NO driver concatenation.
        The at-scale result path: consume with ``write_parquet``,
        ``iter_batches`` or further transforms."""
        import ray.data as rd

        return rd.from_arrow_refs(
            [w.state_table.remote() for w in self.workers]
        )

    def collect_state_to_parquet(self, path: str) -> str:
        """Each partition writes its own (v, state) Parquet file under
        ``path`` (same layout as a checkpoint iteration dir) — resumable,
        partitioned output that never aggregates on the driver."""
        os.makedirs(path, exist_ok=True)
        ray.get([w.checkpoint.remote(path) for w in self.workers])
        return path
