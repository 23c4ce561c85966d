"""Tool-flow digraph SCC: brute-force mutual-reachability oracle.

The synthetic transcripts below are built to exercise every SCC shape the
peel must handle: a 2-cycle (A→B→A), a 3-cycle that takes several peel
rounds (its min member is not the forward-min of round one for everyone),
a pure chain (all singleton SCCs), and a single-tool conversation (no
transition edges at all — the self-loop carrier path).
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module", autouse=True)
def _release_engine_pools(ray_session):
    """The flowgraph tests cache several small superstep engines (each
    worker reserves 0.25 CPU). On the 4-cpu test cluster those idle
    reservations can starve later Dataset-heavy tests, so kill the
    cached pools when this module finishes."""
    yield
    from graphsetintersection_ray.pipelines import iterative

    iterative.release_engines()


def _mk_transcripts(rows):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "tool"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["role"] = "user"
    df["text"] = "x"
    df["ts"] = pd.Timestamp("2026-01-01")
    return rd.from_pandas(df)


def _brute_scc(edges):
    """scc[node] = min mutually-reachable node (string min), via boolean
    closure over the dense node set."""
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    reach = np.eye(n, dtype=bool)
    for s, d in edges:
        reach[idx[s], idx[d]] = True
    for _ in range(n):
        new = reach | (reach @ reach)
        if (new == reach).all():
            break
        reach = new
    mutual = reach & reach.T
    return {
        nodes[i]: min(nodes[j] for j in np.flatnonzero(mutual[i]))
        for i in range(n)
    }


ROWS = (
    # conv A: view→click→view→click  (2-cycle between A:view and A:click)
    [("A", i, t) for i, t in enumerate(["view", "click", "view", "click"])]
    # conv B: a 3-cycle x→y→z→x plus a tail into w (singleton)
    + [("B", i, t) for i, t in enumerate(["x", "y", "z", "x", "w"])]
    # conv C: pure chain p→q→r (all singletons)
    + [("C", i, t) for i, t in enumerate(["p", "q", "r"])]
    # conv D: single tool only (no transition edges; self-loop carrier)
    + [("D", 0, "solo"), ("D", 1, "solo")]
    # conv E: two disjoint 2-cycles sharing the conv (m↔n then u↔v)
    + [("E", i, t) for i, t in enumerate(["m", "n", "m", "u", "v", "u"])]
)


def _expected():
    seq = {}
    for conv, i, t in ROWS:
        seq.setdefault(conv, []).append((i, t))
    edges = set()
    nodes = set()
    for conv, turns in seq.items():
        turns.sort()
        ks = [f"{conv}:{t}" for _, t in turns]
        nodes.update(ks)
        for a, b in zip(ks, ks[1:]):
            if a != b:
                edges.add((a, b))
    edges |= {(k, k) for k in nodes}
    return _brute_scc(edges)


def test_scc_matches_brute_force(ray_session, tmp_path):
    from graphsetintersection_ray.pipelines import flowgraph

    art = flowgraph.build_flow_graph_from_transcripts(
        _mk_transcripts(ROWS), cache_key=f"test-{tmp_path.name}", num_partitions=2
    )
    res, stats = flowgraph.scc(art)
    got = dict(zip(res["node"].to_pylist(), res["scc"].to_pylist()))
    assert got == _expected()
    assert stats["rounds"] >= 1


def test_scc_sf_matches_sql_oracle(ray_session):
    """End-to-end vs the recursive-closure DuckDB oracle at sf0.001."""
    import duckdb

    from graphsetintersection_ray.pipelines.queries import (
        ORACLE_SQL,
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    res = QUERIES["tool_flow_scc"](sf)
    got = (
        res.to_pandas()
        .sort_values(["node", "scc"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = (
        con.execute(ORACLE_SQL["tool_flow_scc"]).df()
        .sort_values(["node", "scc"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["node", "scc"]], want[["node", "scc"]])


def test_tool_transitions_matches_pandas(ray_session):
    from graphsetintersection_ray.pipelines import flowgraph

    ds = _mk_transcripts(ROWS)
    got = (
        flowgraph.tool_transitions(ds)
        .to_pandas()
        .sort_values(["src_tool", "dst_tool"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame(ROWS, columns=["conv_id", "turn_idx", "tool"]).sort_values(
        ["conv_id", "turn_idx"]
    )
    pairs = {}
    for conv, g in df.groupby("conv_id"):
        ts = g["tool"].tolist()
        for a, b in zip(ts, ts[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    want = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in pairs.items()],
            columns=["src_tool", "dst_tool", "n"],
        )
        .sort_values(["src_tool", "dst_tool"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_conv_flatten_preserves_text_bytes(ray_session):
    """The render must carry text byte-for-byte — including embedded
    newlines and 'role: ' look-alikes — in strict turn order."""
    import ray.data as rd
    from graphsetintersection_ray.stages.conversations import conv_flatten

    rows = [
        ("c1", 1, "assistant", "t1", "second\nline"),
        ("c1", 0, "user", "t0", "first: tricky"),
        ("c2", 0, "user", "t0", ""),
    ]
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "tool", "text"]
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = pd.Timestamp("2026-01-01")
    out = conv_flatten(rd.from_pandas(df)).to_pandas().set_index("conv_id")
    assert out.loc["c1", "conv_text"] == (
        "user: first: tricky\nassistant: second\nline"
    )
    assert out.loc["c1", "n_turns"] == 2
    assert out.loc["c1", "n_user_turns"] == 1
    assert out.loc["c1", "n_tools"] == 2
    assert out.loc["c1", "n_chars"] == len("first: tricky") + len("second\nline")
    assert out.loc["c2", "conv_text"] == "user: "


def test_scc_checkpoint_resume(ray_session, tmp_path):
    """A run killed after its first peel round resumes from the round-1
    checkpoint and finishes with the exact uncheckpointed result."""
    from graphsetintersection_ray.pipelines import flowgraph

    art = flowgraph.build_flow_graph_from_transcripts(
        _mk_transcripts(ROWS), cache_key=f"ckpt-{tmp_path.name}", num_partitions=2
    )
    want, _ = flowgraph.scc(art)
    want_map = dict(zip(want["node"].to_pylist(), want["scc"].to_pylist()))

    ck = str(tmp_path / "scc_ckpt")
    with pytest.raises(RuntimeError, match="peel rounds"):
        flowgraph.scc(art, max_rounds=1, ckpt_dir=ck)
    # the killed run left a complete round-0 checkpoint behind
    import os

    assert os.path.isdir(os.path.join(ck, "scc", "iter=0"))
    res, stats = flowgraph.scc(art, ckpt_dir=ck, resume=True)
    got = dict(zip(res["node"].to_pylist(), res["scc"].to_pylist()))
    assert got == want_map


def test_conv_pack_matches_pandas_scan(ray_session):
    """Packing offsets equal a driver-side cumsum in (user, seq) order,
    under any blocking; malformed conversation ids fail loudly."""
    import ray.data as rd

    from graphsetintersection_ray.stages.conversations import conv_pack

    rows = []
    for u, s, text in [
        (2, 0, "x" * 30), (0, 1, "y" * 50), (0, 0, "z" * 20), (10, 0, "w" * 45)
    ]:
        rows.append((f"c{u}_{s}", 0, "user", "t", text))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "tool", "text"]
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = pd.Timestamp("2026-01-01")
    out = (
        conv_pack(rd.from_pandas(df).repartition(3), seq_len=64)
        .to_pandas()
        .set_index("conv_id")
    )
    # order: c0_0(20), c0_1(50), c2_0(30), c10_0(45)
    assert out.loc["c0_0"].tolist() == [20, 0, 0]
    assert out.loc["c0_1"].tolist() == [50, 20, 0]
    assert out.loc["c2_0"].tolist() == [30, 70, 1]
    assert out.loc["c10_0"].tolist() == [45, 100, 1]

    # non-conforming ids: lexicographic fallback, deterministic under any
    # blocking (sampled string range buckets + exact prefix sums)
    other = df.copy()
    other["conv_id"] = ["sess-B", "sess-A", "za/9", "0aa"]
    want_order = ["0aa", "sess-A", "sess-B", "za/9"]
    lens = dict(zip(other["conv_id"], other["text"].str.len()))
    starts = np.cumsum([0] + [lens[c] for c in want_order[:-1]])
    for parts in (1, 3):
        got = (
            conv_pack(rd.from_pandas(other).repartition(parts), seq_len=64)
            .to_pandas()
            .sort_values("start_offset")
        )
        assert got["conv_id"].tolist() == want_order
        assert got["start_offset"].tolist() == starts.tolist()
        assert got["pack_id"].tolist() == (starts // 64).tolist()

    # mixed corpus (one malformed id) also takes the lexicographic path
    mixed = df.copy()
    mixed.loc[0, "conv_id"] = "weird!"
    got = conv_pack(rd.from_pandas(mixed), seq_len=64).to_pandas()
    order = got.sort_values("start_offset")["conv_id"].tolist()
    assert order == sorted(mixed["conv_id"].unique())

    # huge user ids that would overflow (or wrap) the u<<20 numeric key
    # must fall back to lexicographic order, not crash or mis-order
    huge = df.copy()
    huge.loc[0, "conv_id"] = "c99999999999999999999_1"   # > int64
    huge.loc[1, "conv_id"] = "c9223372036854775_1"       # u<<20 wraps
    got = conv_pack(rd.from_pandas(huge), seq_len=64).to_pandas()
    order = got.sort_values("start_offset")["conv_id"].tolist()
    assert order == sorted(huge["conv_id"].unique())
