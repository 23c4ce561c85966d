"""Per-conversation tool-flow digraph + distributed SCC / transition counts.

The canonical encoded edge set is a DAG by construction (src < dst after
dense-rank, graph_build.py), so strongly-connected components there are
trivial. The natural CYCLIC digraph in transcript data is the tool-flow
graph: node key = '<conv_id>:<tool>', directed edge = consecutive-turn
tool transition within a conversation (tool A → B → A is a real 2-cycle).
SCC over it surfaces the recurrent tool-call loops of each conversation —
the "retry/agentic-loop" structure of an agent transcript corpus.

Derivation is one conversation-bucketed shuffle (whole convs per bucket,
vectorized inside), identical in shape to the canonical edge derivation
(stages/graph_build.py). Every node also gets a self-loop edge before the
CSR build: self-loops cannot change SCCs (v always reaches itself) but
guarantee single-tool conversations — which have no transition edges —
appear in the CSR vertex set as their own singleton SCC.

SCC algorithm (state/superstep.py ``SuperstepEngine.scc``): iterative
forward/backward min-label peel — the BSP variant of FW-BW/coloring
(Fleischer et al., "On Identifying Strongly Connected Components in
Parallel", IPDPS 2000): per round, two min-label superstep fixpoints over
the unassigned subgraph compute f[v] (min vertex reachable from v) and
b[v] (min vertex reaching v); f[v] == b[v] == m identifies SCC(m) exactly,
which is assigned and peeled. Rounds ≤ #SCCs, in practice the depth of the
per-conversation condensation (a handful). Runs on the same partitioned
directed-CSR pair + pre-aggregated all-to-all as HITS/topo_levels, so it
inherits their scale path (one fat partition per node, combiner shuffles).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from graphsetintersection_ray.pipelines.graph import (
    _auto_csr_partitions,
    DEFAULT_PARTITIONS,
    GRAPH_SCHEMA_VERSION,
)
from graphsetintersection_ray.stages import graph_build as gb
from graphsetintersection_ray.stages.shuffle import (
    bucket_groups,
    distinct_by,
    sized_buckets,
    sum_by,
)


def _flow_rows_for_bucket(b: pd.DataFrame) -> pa.Table:
    """One conversation bucket → distinct flow edges (self-loops for every
    distinct (conv, tool) node + differing-tool transitions). Convs are
    whole within a bucket, so bucket-local distinct IS globally distinct."""
    conv = b["conv_id"].to_numpy(object)
    tool = b["tool"].to_numpy(object)
    turn = b["turn_idx"].to_numpy()
    cc, conv_u = pd.factorize(conv)
    tc, tool_u = pd.factorize(tool)
    conv_u = np.asarray(conv_u, dtype=object)
    tool_u = np.asarray(tool_u, dtype=object)
    nt = np.int64(max(len(tool_u), 1))

    def key(ci: np.ndarray, ti: np.ndarray) -> pa.Array:
        return pa.array(conv_u[ci] + ":" + tool_u[ti], pa.string())

    nodes = np.unique(cc.astype(np.int64) * nt + tc)
    self_k = key(nodes // nt, nodes % nt)

    order = np.lexsort((turn, cc))
    cs, ts = cc[order], tc[order]
    parts = [pa.table({"src_key": self_k, "dst_key": self_k})]
    if len(cs) > 1:
        same = (cs[1:] == cs[:-1]) & (ts[1:] != ts[:-1])
        if same.any():
            c2 = cs[:-1][same].astype(np.int64)
            a, d = ts[:-1][same].astype(np.int64), ts[1:][same].astype(np.int64)
            pair = (c2 * nt + a) * nt + d
            pair = np.unique(pair)
            c3, rest = pair // (nt * nt), pair % (nt * nt)
            parts.append(
                pa.table(
                    {
                        "src_key": key(c3, rest // nt),
                        "dst_key": key(c3, rest % nt),
                    }
                )
            )
    return pa.concat_tables(parts)


def flow_edges(transcripts: rd.Dataset, num_buckets: int | None = None) -> rd.Dataset:
    """transcripts → distinct (src_key, dst_key) flow edges (with per-node
    self-loops). One conv-hash bucketed shuffle, vectorized per bucket."""
    if num_buckets is None:
        num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        gb._conv_bucket,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    return bucket_groups(bucketed, _flow_rows_for_bucket, num_buckets, bucket_col="bucket")


def _transition_partials(b: pd.DataFrame) -> pd.DataFrame:
    conv = b["conv_id"].to_numpy(object)
    turn = b["turn_idx"].to_numpy()
    order = np.lexsort((turn, conv))
    cs = conv[order]
    ts = b["tool"].to_numpy(object)[order]
    if len(cs) < 2:
        return pd.DataFrame(
            {
                "src_tool": pd.Series([], dtype=object),
                "dst_tool": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            }
        )
    same = cs[1:] == cs[:-1]
    part = pd.DataFrame({"src_tool": ts[:-1][same], "dst_tool": ts[1:][same]})
    return part.groupby(["src_tool", "dst_tool"], sort=False).size().reset_index(
        name="n"
    )


def tool_transitions(transcripts: rd.Dataset) -> rd.Dataset:
    """(src_tool, dst_tool, n): global consecutive-turn tool-transition
    counts (the Markov flow matrix of the corpus, self-transitions
    included). Per-batch partial counts make the shuffle O(#tools²) per
    batch, not O(rows) — but the partial must see whole conversations to
    count cross-batch turn pairs, so it runs after the same conv-hash
    bucketing as the edge derivation."""
    num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        gb._conv_bucket,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    partials = bucket_groups(bucketed, _transition_partials, num_buckets, bucket_col="bucket")

    def to_i64(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_tool": t["src_tool"],
                "dst_tool": t["dst_tool"],
                "n": t["n"].cast(pa.int64()),
            }
        )

    return sum_by(partials, ["src_tool", "dst_tool"], "n").map_batches(
        to_i64, batch_format="pyarrow"
    )


def _pmi_pair_partials(b: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket (tool_a < tool_b, count) partials over distinct
    conversation-tool incidence — the E4 pair expansion (repeat/arange,
    no per-conversation Python loop), with counts kept."""
    ct = b[["conv_id", "tool"]].drop_duplicates().sort_values(
        ["conv_id", "tool"]
    )
    conv = ct["conv_id"].to_numpy(object)
    tool = ct["tool"].to_numpy(object)
    empty = pd.DataFrame(
        {
            "tool_a": pd.Series([], dtype=object),
            "tool_b": pd.Series([], dtype=object),
            "n_uv": pd.Series([], dtype="int64"),
        }
    )
    n = len(conv)
    if n < 2:
        return empty
    starts = np.concatenate([[0], np.flatnonzero(conv[1:] != conv[:-1]) + 1])
    lens = np.diff(np.append(starts, n))
    pos = np.arange(n) - np.repeat(starts, lens)
    rep = pos  # element at local pos p is the 'b' side of p pairs
    total = int(rep.sum())
    if total == 0:
        return empty
    j_idx = np.repeat(np.arange(n), rep)
    off = np.arange(total) - np.repeat(np.cumsum(rep) - rep, rep)
    i_idx = np.repeat(np.repeat(starts, lens), rep) + off
    return (
        pd.DataFrame({"tool_a": tool[i_idx], "tool_b": tool[j_idx]})
        .groupby(["tool_a", "tool_b"], sort=False)
        .size()
        .reset_index(name="n_uv")
    )


def tool_pmi(transcripts: rd.Dataset) -> rd.Dataset:
    """(tool_a, tool_b, n_uv, pmi): pointwise mutual information between
    tool pairs co-occurring in a conversation — collocation strength of
    the tool vocabulary (the E4 co-occurrence relation with statistics).
    pmi = ln(n_uv·N / (n_u·n_v)) over conversation incidence, rounded at
    6. Per-bucket pair partials are bounded by Σ tools-per-conv² (convs
    are short); the tool marginals and N are tiny driver scalars."""
    import ray  # noqa: F401

    from graphsetintersection_ray.functions.kernels import round_half_away
    from graphsetintersection_ray.stages.shuffle import sum_by

    num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        gb._conv_bucket,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    pair_parts = bucket_groups(
        bucketed, _pmi_pair_partials, num_buckets, bucket_col="bucket"
    )
    pairs_ds = sum_by(pair_parts, ["tool_a", "tool_b"], "n_uv")

    # tool marginals + N: #tools rows — inherently tiny, driver-side
    def inc_partials(b: pd.DataFrame) -> pd.DataFrame:
        ct = b[["conv_id", "tool"]].drop_duplicates()
        g = ct.groupby("tool", sort=False).size().reset_index(name="n_u")
        g["n_convs"] = 0
        uc = pd.DataFrame(
            {
                "tool": ["\x00convs"],
                "n_u": [0],
                "n_convs": [ct["conv_id"].nunique()],
            }
        )
        return pd.concat([g, uc], ignore_index=True)

    marg = (
        bucket_groups(
            bucketed,
            lambda g: pa.Table.from_pandas(
                inc_partials(g), preserve_index=False
            ),
            num_buckets,
            bucket_col="bucket",
        )
        .to_pandas()
        .groupby("tool")[["n_u", "n_convs"]]
        .sum()
    )
    N = int(marg["n_convs"].sum())
    n_u = {k: int(v) for k, v in marg["n_u"].items() if k != "\x00convs"}
    # marginals are #tools rows (tiny); the PAIR table stays distributed —
    # pmi is a broadcast-dict map, never a driver collect
    marg_ref = ray.put((n_u, N))

    def pmi_map(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "tool_a": pa.array([], pa.string()),
                    "tool_b": pa.array([], pa.string()),
                    "n_uv": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        nu, nn = ray.get(marg_ref)
        ta = t["tool_a"].to_numpy(zero_copy_only=False)
        tb = t["tool_b"].to_numpy(zero_copy_only=False)
        nuv = t["n_uv"].to_numpy(zero_copy_only=False).astype(np.float64)
        a = np.array([nu[x] for x in ta], np.float64)
        bb = np.array([nu[x] for x in tb], np.float64)
        pmi = round_half_away(np.log(nuv * nn / (a * bb)), 6)
        return pa.table(
            {
                "tool_a": pa.array(ta, pa.string()),
                "tool_b": pa.array(tb, pa.string()),
                "n_uv": pa.array(nuv.astype(np.int64)),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return pairs_ds.map_batches(pmi_map, batch_format="pyarrow")


@dataclass
class FlowArtifacts:
    edges_str: rd.Dataset
    vertices: rd.Dataset
    edges: rd.Dataset  # directed int32 (src, dst), self-loops included
    n_vertices: int
    n_edges: int
    csr_path: str      # symmetrized CSR (worker vertex alignment)
    out_path: str      # directed out-CSR (partitioned by src)
    in_path: str       # directed in-CSR (reversed edges, by dst)
    csr_partitions: int
    fingerprint: str


_CACHE: dict[tuple, FlowArtifacts] = {}


def build_flow_graph(sf_dir: str, num_partitions: int = DEFAULT_PARTITIONS) -> FlowArtifacts:
    from graphsetintersection_ray.pipelines.queries import transcripts_from_sf

    return build_flow_graph_from_transcripts(
        transcripts_from_sf(sf_dir), cache_key=sf_dir, num_partitions=num_partitions
    )


def build_flow_graph_from_transcripts(
    transcripts: rd.Dataset,
    cache_key: str,
    num_partitions: int = DEFAULT_PARTITIONS,
) -> FlowArtifacts:
    key = (cache_key, num_partitions)
    if key in _CACHE:
        return _CACHE[key]
    transcripts = transcripts.materialize()
    edges_str = flow_edges(transcripts).materialize()
    vertices = gb.encode_vertices(edges_str).materialize()
    n_vertices = vertices.count()
    edges = gb.compact_blocks(
        gb.edges_to_ids(edges_str, vertices, num_partitions, n_vertices=n_vertices)
    ).materialize()
    n_edges = edges.count()
    csr_partitions = _auto_csr_partitions(n_edges, cap=num_partitions)
    fingerprint = (
        f"flow-v{GRAPH_SCHEMA_VERSION}:{cache_key}:p{num_partitions}:"
        f"c{csr_partitions}:{n_vertices}v:{n_edges}e"
    )
    workdir = os.path.join(
        "/tmp/gsi_graphs", hashlib.md5(fingerprint.encode()).hexdigest()[:16]
    )
    csr_path = os.path.join(workdir, "flow_csr")
    out_path = os.path.join(workdir, "flow_out")
    in_path = os.path.join(workdir, "flow_in")
    manifest = os.path.join(workdir, "_flow_manifest.json")
    reuse = False
    if os.path.exists(manifest):
        with open(manifest) as f:
            m = json.load(f)
        reuse = (
            m.get("fingerprint") == fingerprint
            and m.get("csr_partitions") == csr_partitions
        )
    if not reuse:
        import shutil

        buckets = max(
            csr_partitions, sized_buckets(2 * n_edges, rows_per_bucket=250_000)
        )
        sym = distinct_by(
            gb.symmetrize(edges), ["src", "dst"], num_buckets=buckets
        )

        def rev(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["dst"], "dst": t["src"]})

        for path, eds in (
            (csr_path, sym),
            (out_path, edges),
            (in_path, edges.map_batches(rev, batch_format="pyarrow")),
        ):
            if os.path.isdir(path):
                shutil.rmtree(path)
            csr = gb.build_csr(
                eds, num_partitions=csr_partitions, shuffle_buckets=buckets
            )
            gb.write_csr_dataset(csr, path, csr_partitions)
        with open(manifest, "w") as f:
            json.dump(
                {"fingerprint": fingerprint, "csr_partitions": csr_partitions}, f
            )
    art = FlowArtifacts(
        edges_str=edges_str,
        vertices=vertices,
        edges=edges,
        n_vertices=n_vertices,
        n_edges=n_edges,
        csr_path=csr_path,
        out_path=out_path,
        in_path=in_path,
        csr_partitions=csr_partitions,
        fingerprint=fingerprint,
    )
    _CACHE[key] = art
    return art


def scc(
    art: FlowArtifacts,
    max_rounds: int = 10_000,
    ckpt_dir: str | None = None,
    resume: bool = True,
) -> tuple:
    """(node, scc) strings: SCC id = the lexicographically minimal member
    key (dense ranks are assigned in key order, so int-min == string-min
    and the DuckDB oracle's min(varchar) matches exactly). With a
    ``ckpt_dir`` the assignment vector checkpoints at every peel-round
    boundary and a killed run resumes from the newest complete round."""
    from graphsetintersection_ray.pipelines.iterative import (
        _collect_max_vertices,
        engine_for,
    )

    eng = engine_for(art, ckpt_dir)
    stats = eng.scc(
        art.out_path, art.in_path, max_rounds=max_rounds, resume=resume
    )

    if art.n_vertices <= gb.BROADCAST_MAX_VERTICES:
        vtbl = pa.concat_tables(
            [gb._ensure_arrow(b) for b in ray.get(art.vertices.to_arrow_refs())]
        )
        order = np.argsort(vtbl["vid"].to_numpy())
        keys = vtbl["key"].combine_chunks().take(pa.array(order))
        ref = ray.put(keys)

        def decode(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            vi = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            si = t["scc"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "node": ks.take(pa.array(vi)),
                    "scc": ks.take(pa.array(si)),
                }
            )

        if art.n_vertices > _collect_max_vertices():
            return (
                eng.scc_dataset().map_batches(decode, batch_format="pyarrow"),
                stats,
            )
        return decode(eng.collect_scc()), stats

    # at-scale path: two hash joins against the vertex map (same shape as
    # edges_to_ids' join fallback)
    def as_i32(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t["v"].cast(pa.int32()), "scc": t["scc"].cast(pa.int32())}
        )

    # compact_blocks: empty per-partition blocks crash Acero hash joins
    ds = gb.compact_blocks(
        eng.scc_dataset().map_batches(as_i32, batch_format="pyarrow")
    )
    j1 = ds.join(
        art.vertices,
        join_type="inner",
        num_partitions=art.csr_partitions,
        on=("v",),
        right_on=("vid",),
    ).map_batches(
        lambda t: pa.table({"node": t["key"], "scc": t["scc"]}),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        art.vertices,
        join_type="inner",
        num_partitions=art.csr_partitions,
        on=("scc",),
        right_on=("vid",),
    ).map_batches(
        lambda t: pa.table({"node": t["node"], "scc": t["key"]}),
        batch_format="pyarrow",
    )
    return j2, stats
