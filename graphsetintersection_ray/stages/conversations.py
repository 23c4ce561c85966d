"""Conversation-level transforms over the transcript table.

The engine's core input invariant (BASELINE.json input_hint) is per-turn
text equality under stable (conv_id, turn_idx) ordering — ``conv_flatten``
turns that invariant into a product operator: the chat-template render
that a training-data pipeline feeds to a tokenizer (one row per
conversation, turns concatenated in order with role tags, byte-for-byte).

Scale shape: one conv-hash bucketed shuffle (whole conversations per
bucket, same partitioning key as the edge derivation), then fully
vectorized Arrow inside the bucket — the per-conversation join is
``pc.binary_join`` over a ListArray built from group offsets, not a
Python loop over conversations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from graphsetintersection_ray.stages.shuffle import bucket_groups, sized_buckets


def _conv_bucket_full(batch: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Like graph_build._conv_bucket but keeps text (the render input)."""
    batch = batch[["conv_id", "turn_idx", "role", "tool", "text"]].copy()
    batch["bucket"] = (
        pd.util.hash_array(batch["conv_id"].to_numpy(object)) % num_buckets
    ).astype(np.int64)
    return batch


def _flatten_bucket(b: pd.DataFrame) -> pa.Table:
    conv = b["conv_id"].to_numpy(object)
    turn = b["turn_idx"].to_numpy()
    order = np.lexsort((turn, conv))
    conv = conv[order]
    role = pa.array(b["role"].to_numpy(object)[order], pa.string())
    text = pa.array(b["text"].to_numpy(object)[order], pa.string())
    tool = b["tool"].to_numpy(object)[order]

    # group offsets over the sorted conv column
    n = len(conv)
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "n_user_turns": pa.array([], pa.int64()),
                "n_tools": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "conv_text": pa.array([], pa.string()),
            }
        )
    starts = np.concatenate([[0], np.flatnonzero(conv[1:] != conv[:-1]) + 1])
    ends = np.concatenate([starts[1:], [n]])
    counts = ends - starts

    # 'role: text' per turn, then one vectorized per-conversation join
    lines = pc.binary_join_element_wise(role, text, ": ")
    joined = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(np.concatenate([starts, [n]]), pa.int32()), lines
        ),
        "\n",
    )

    is_user = (
        pc.equal(role, "user").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n_user = np.add.reduceat(is_user, starts)
    chars = pc.utf8_length(text).to_numpy().astype(np.int64)
    n_chars = np.add.reduceat(chars, starts)
    # distinct tools per conversation: sorted (conv, tool) boundary count
    t_order = np.lexsort((tool, conv))
    ct, tt = conv[t_order], tool[t_order]
    new_pair = np.concatenate(
        [[True], (ct[1:] != ct[:-1]) | (tt[1:] != tt[:-1])]
    )
    n_tools = np.add.reduceat(new_pair.astype(np.int64), starts)

    return pa.table(
        {
            "conv_id": pa.array(conv[starts], pa.string()),
            "n_turns": pa.array(counts.astype(np.int64)),
            "n_user_turns": pa.array(n_user),
            "n_tools": pa.array(n_tools),
            "n_chars": pa.array(n_chars),
            "conv_text": joined,
        }
    )


def _latency_bucket_cols(batch: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    batch = batch[["conv_id", "turn_idx", "ts"]].copy()
    batch["bucket"] = (
        pd.util.hash_array(batch["conv_id"].to_numpy(object)) % num_buckets
    ).astype(np.int64)
    return batch


def _latency_for_bucket(b: pd.DataFrame) -> pa.Table:
    conv = b["conv_id"].to_numpy(object)
    turn = b["turn_idx"].to_numpy()
    ts = b["ts"].to_numpy("datetime64[us]").view(np.int64)
    order = np.lexsort((turn, conv))
    conv, ts = conv[order], ts[order]
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_gaps": pa.array([], pa.int64()),
            "mean_gap_s": pa.array([], pa.float64()),
            "max_gap_us": pa.array([], pa.int64()),
        }
    )
    if len(conv) < 2:
        return empty
    same = conv[1:] == conv[:-1]
    if not same.any():
        return empty
    gc = conv[:-1][same]
    gaps = (ts[1:] - ts[:-1])[same]
    starts = np.concatenate([[0], np.flatnonzero(gc[1:] != gc[:-1]) + 1])
    n = np.diff(np.concatenate([starts, [len(gc)]]))
    s = np.add.reduceat(gaps, starts)
    mx = np.maximum.reduceat(gaps, starts)
    from graphsetintersection_ray.functions.kernels import round_half_away

    return pa.table(
        {
            "conv_id": pa.array(gc[starts], pa.string()),
            "n_gaps": pa.array(n.astype(np.int64)),
            # integer micro-second sums → one rounded division (bit-exact,
            # reduction-order-free)
            "mean_gap_s": pa.array(
                round_half_away(s / (1e6 * n), 6), pa.float64()
            ),
            "max_gap_us": pa.array(mx.astype(np.int64)),
        }
    )


def turn_latency(transcripts: rd.Dataset) -> rd.Dataset:
    """(conv_id, n_gaps, mean_gap_s, max_gap_us): response-latency stats
    per conversation — the gap between consecutive turns (turn_idx
    order). Single-turn conversations are absent. Same conv-bucketed
    shuffle as the flatten; integer microsecond sums keep the mean
    bit-exact at any parallelism."""
    num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        _latency_bucket_cols,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    return bucket_groups(
        bucketed, _latency_for_bucket, num_buckets, bucket_col="bucket"
    )


def _alternation_for_bucket(b: pd.DataFrame) -> pa.Table:
    conv = b["conv_id"].to_numpy(object)
    turn = b["turn_idx"].to_numpy()
    order = np.lexsort((turn, conv))
    conv = conv[order]
    role = b["role"].to_numpy(object)[order]
    n = len(conv)
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "n_same_role_adj": pa.array([], pa.int64()),
            }
        )
    starts = np.concatenate([[0], np.flatnonzero(conv[1:] != conv[:-1]) + 1])
    counts = np.diff(np.concatenate([starts, [n]]))
    same = np.concatenate(
        [[False], (conv[1:] == conv[:-1]) & (role[1:] == role[:-1])]
    ).astype(np.int64)
    viol = np.add.reduceat(same, starts)
    return pa.table(
        {
            "conv_id": pa.array(conv[starts], pa.string()),
            "n_turns": pa.array(counts.astype(np.int64)),
            "n_same_role_adj": pa.array(viol),
        }
    )


def role_alternation(transcripts: rd.Dataset) -> rd.Dataset:
    """(conv_id, n_turns, n_same_role_adj): transcript-QC — the number of
    adjacent turn pairs sharing a role (a strict user/assistant dialogue
    has zero). One conv-bucketed shuffle, vectorized inside."""
    num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        _conv_bucket_full,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    return bucket_groups(
        bucketed, _alternation_for_bucket, num_buckets, bucket_col="bucket"
    )


SEGMENT_GAP_US = 3_600_000_000  # 1 hour


def _segments_for_bucket(b: pd.DataFrame) -> pa.Table:
    conv = b["conv_id"].to_numpy(object)
    turn = b["turn_idx"].to_numpy()
    ts = b["ts"].to_numpy("datetime64[us]").view(np.int64)
    order = np.lexsort((turn, conv))
    conv, turn, ts = conv[order], turn[order], ts[order]
    n = len(conv)
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "segment_id": pa.array([], pa.int64()),
            }
        )
    new_conv = np.concatenate([[True], conv[1:] != conv[:-1]])
    gap_break = np.concatenate(
        [[False], (ts[1:] - ts[:-1]) > SEGMENT_GAP_US]
    ) & ~new_conv
    # segment_id = running count of gap breaks within the conversation
    csum = np.cumsum(gap_break.astype(np.int64))
    starts = np.flatnonzero(new_conv)
    seg = csum - np.repeat(csum[starts], np.diff(np.append(starts, n)))
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn.astype(np.int32)),
            "segment_id": pa.array(seg),
        }
    )


def conv_segments(transcripts: rd.Dataset) -> rd.Dataset:
    """(conv_id, turn_idx, segment_id): sub-conversation segmentation —
    a conversation splits where consecutive turns are more than an hour
    apart (the resegmentation step before rendering stale multi-session
    logs as separate training examples). One conv-bucketed shuffle,
    vectorized cumulative gap counting inside."""
    num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        _latency_bucket_cols,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    return bucket_groups(
        bucketed, _segments_for_bucket, num_buckets, bucket_col="bucket"
    )


def _sig_for_bucket(b: pd.DataFrame) -> pa.Table:
    conv = b["conv_id"].to_numpy(object)
    turn = b["turn_idx"].to_numpy()
    order = np.lexsort((turn, conv))
    conv = conv[order]
    role = pa.array(b["role"].to_numpy(object)[order], pa.string())
    tool = pa.array(b["tool"].to_numpy(object)[order], pa.string())
    n = len(conv)
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "sig": pa.array([], pa.string()),
            }
        )
    starts = np.concatenate([[0], np.flatnonzero(conv[1:] != conv[:-1]) + 1])
    lines = pc.binary_join_element_wise(role, tool, ":")
    sig = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(np.concatenate([starts, [n]]), pa.int32()), lines
        ),
        ">",
    )
    return pa.table({"conv_id": pa.array(conv[starts], pa.string()), "sig": sig})


def conv_dedup(transcripts: rd.Dataset) -> rd.Dataset:
    """(conv_id, canonical_conv, group_size): structural conversation
    dedup — conversations with the IDENTICAL (role:tool) turn sequence
    form a group; canonical = min conv_id (the survivor a training
    pipeline keeps; group_size > 1 marks boilerplate agent loops).

    Two bounded shuffles: the conv-bucketed signature build, then a
    signature-keyed group shuffle (pre-deduped per batch, so shuffle
    volume tracks distinct signatures, not conversations)."""
    from graphsetintersection_ray.stages.shuffle import _add_bucket

    num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        _conv_bucket_full,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    sigs = bucket_groups(
        bucketed, _sig_for_bucket, num_buckets, bucket_col="bucket"
    )

    def sig_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        return _add_bucket(batch, ["sig"], num_buckets)

    def dedup_group(g: pd.DataFrame) -> pa.Table:
        canon = g.groupby("sig", sort=False)["conv_id"].transform("min")
        size = g.groupby("sig", sort=False)["conv_id"].transform("size")
        return pa.table(
            {
                "conv_id": pa.array(g["conv_id"].to_numpy(object), pa.string()),
                "canonical_conv": pa.array(canon.to_numpy(object), pa.string()),
                "group_size": pa.array(size.to_numpy(np.int64)),
            }
        )

    return bucket_groups(
        sigs.map_batches(sig_bucket, batch_format="pandas"),
        dedup_group,
        num_buckets,
    )


def _entropy_for_bucket(b: pd.DataFrame) -> pa.Table:
    conv = b["conv_id"].to_numpy(object)
    tool = b["tool"].to_numpy(object)
    if len(conv) == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "n_tools": pa.array([], pa.int64()),
                "tool_entropy": pa.array([], pa.float64()),
            }
        )
    df = pd.DataFrame({"c": conv, "t": tool})
    cnt = df.groupby(["c", "t"], sort=True).size().reset_index(name="k")
    k = cnt["k"].to_numpy(np.float64)
    cc = cnt["c"].to_numpy(object)
    starts = np.concatenate([[0], np.flatnonzero(cc[1:] != cc[:-1]) + 1])
    n = np.add.reduceat(k, starts)
    # H = ln(n) - (1/n) Σ k ln k  — evaluated from integer counts in the
    # value-defined sorted (conv, tool) order, so the float result is
    # independent of partitioning/parallelism
    klnk = np.add.reduceat(k * np.log(k), starts)
    n_tools = np.diff(np.concatenate([starts, [len(cc)]]))
    from graphsetintersection_ray.functions.kernels import round_half_away

    return pa.table(
        {
            "conv_id": pa.array(cc[starts], pa.string()),
            "n_turns": pa.array(n.astype(np.int64)),
            "n_tools": pa.array(n_tools.astype(np.int64)),
            "tool_entropy": pa.array(
                round_half_away(np.log(n) - klnk / n, 6), pa.float64()
            ),
        }
    )


def tool_entropy(transcripts: rd.Dataset) -> rd.Dataset:
    """(conv_id, n_turns, n_tools, tool_entropy): Shannon entropy of the
    per-conversation tool distribution — the tool-diversity signal
    (single-tool loops score 0, uniform tool use scores ln(n_tools)).
    Evaluated from integer counts in a value-defined order, so the float
    is partitioning-independent; one conv-bucketed shuffle."""
    num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        _conv_bucket_full,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    return bucket_groups(
        bucketed, _entropy_for_bucket, num_buckets, bucket_col="bucket"
    )


def _conv_key(conv_ids: np.ndarray) -> tuple[np.ndarray, bool]:
    """Deterministic packing key for 'c<user>_<seq>' conversation ids:
    key = user * 2^20 + seq (numeric, not string, order — mirrored
    exactly by the SQL oracle's regexp parse). Returns ``(keys, ok)``;
    ``ok=False`` (keys are -1) when any id is malformed or the seq
    overflows the 2^20 stride — the caller then falls back to the
    lexicographic string-order packing path instead of failing."""
    ex = pd.Series(conv_ids, dtype=object).str.extract(r"^c(\d+)_(\d+)$")
    if ex.isna().any().any():
        return np.full(len(conv_ids), -1, np.int64), False
    # parse as python ints (no silent int64 wrap on huge user ids) and
    # bound u so u << 20 stays inside int64 — anything outside takes the
    # lexicographic fallback instead of crashing or mis-ordering
    u_int = ex[0].map(int)
    s_int = ex[1].map(int)
    if (u_int >= (1 << 43)).any() or (s_int >= (1 << 20)).any():
        return np.full(len(conv_ids), -1, np.int64), False
    u = u_int.astype(np.int64).to_numpy()
    s = s_int.astype(np.int64).to_numpy()
    return (u << 20) | s, True


def conv_pack(transcripts: rd.Dataset, seq_len: int = 8192) -> rd.Dataset:
    """(conv_id, n_chars, start_offset, pack_id): greedy context-window
    packing of WHOLE conversations — the training step after the chat
    render: conversations are concatenated in (user, seq) order and each
    is assigned to the window holding its first character.

    Same two-phase distributed scan as ``text.sequence_pack`` (its
    docstring has the scale analysis): order-preserving range buckets
    over the conversation key, per-bucket totals reduced on the driver
    (O(#buckets) rows), exclusive offsets broadcast, bucket-local
    cumsum. The length unit is characters of the rendered conversation
    (= conv_flatten's n_chars).

    Ordering key: ids matching 'c<user>_<seq>' pack in (user, seq)
    NUMERIC order (the SQL-oracled path). Any other id shape falls back
    to plain lexicographic conv_id order, with range buckets drawn from
    per-block sorted split candidates instead of the numeric stride —
    the output depends only on the global string order, so it stays
    deterministic under any block partitioning."""
    import ray

    from graphsetintersection_ray.stages.shuffle import bucket_groups

    cf = conv_flatten(transcripts).select_columns(["conv_id", "n_chars"])

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["conv_id"].to_numpy(zero_copy_only=False)
        k, _ = _conv_key(ids)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "n_chars": t["n_chars"],
                "k": pa.array(k),
            }
        )

    counts = cf.map_batches(keyed, batch_format="pyarrow").materialize()
    # malformed ids key as -1 per batch; a non-negative global min means
    # every block parsed, so the numeric (oracle-parity) path applies
    numeric_key = counts.count() == 0 or int(counts.min("k")) >= 0

    out_schema = pa.schema(
        {
            "conv_id": pa.string(),
            "n_chars": pa.int64(),
            "start_offset": pa.int64(),
            "pack_id": pa.int64(),
        }
    )

    n_total = counts.count()
    if n_total == 0:
        import ray.data as rd2

        return rd2.from_arrow(out_schema.empty_table())
    num_buckets = sized_buckets(n_total)

    if numeric_key:
        sort_col = "k"

        def id_partials(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {
                        "lo": pd.Series([], dtype=np.int64),
                        "hi": pd.Series([], dtype=np.int64),
                    }
                )
            ks = b["k"].to_numpy(np.int64)
            return pd.DataFrame({"lo": [ks.min()], "hi": [ks.max()]})

        parts = counts.map_batches(
            id_partials, batch_format="pandas"
        ).to_pandas()
        lo, hi = int(parts["lo"].min()), int(parts["hi"].max())
        span = hi - lo + 1

        # division form, not (ks-lo)*B//span: the conversation key carries
        # a 2^20 stride, so the multiply would overflow int64 once user ids
        # pass ~2^33 at high bucket counts; ceil-division is equally monotone
        stride = (span + num_buckets - 1) // num_buckets

        def bucket_of(b: pd.DataFrame) -> np.ndarray:
            return (b["k"].to_numpy(np.int64) - lo) // stride

    else:
        # lexicographic fallback: order-preserving range buckets over the
        # conv_id STRING, with split points drawn from per-block sorted
        # candidates (O(blocks * 32) driver rows). Bucket boundaries may
        # shift with block layout, but the output — global string order +
        # exact prefix sums — does not.
        sort_col = "conv_id"

        def split_candidates(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({"conv_id": pd.Series([], dtype=object)})
            ids = np.sort(b["conv_id"].to_numpy(object))
            take = np.linspace(0, len(ids) - 1, min(32, len(ids))).astype(int)
            return pd.DataFrame({"conv_id": ids[take]})

        cand = np.sort(
            counts.map_batches(split_candidates, batch_format="pandas")
            .to_pandas()["conv_id"]
            .to_numpy(object)
        )
        pick = np.linspace(0, len(cand) - 1, num_buckets + 1).astype(int)[1:-1]
        splits = np.unique(cand[pick])
        num_buckets = len(splits) + 1

        def bucket_of(b: pd.DataFrame) -> np.ndarray:
            return np.searchsorted(
                splits, b["conv_id"].to_numpy(object), side="right"
            ).astype(np.int64)

    def local_totals(b: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "__bucket": bucket_of(b),
                    "n_chars": b["n_chars"].to_numpy(np.int64),
                }
            )
            .groupby("__bucket", sort=False)["n_chars"]
            .sum()
            .reset_index()
        )

    tot = counts.map_batches(local_totals, batch_format="pandas").to_pandas()
    tot = tot.groupby("__bucket")["n_chars"].sum()
    offsets = np.zeros(num_buckets + 1, np.int64)
    offsets[tot.index.to_numpy(np.int64) + 1] = tot.to_numpy(np.int64)
    offsets = np.cumsum(offsets)
    off_ref = ray.put(offsets)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = bucket_of(b)
        return b

    def pack(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(sort_col)
        nch = g["n_chars"].to_numpy(np.int64)
        off = ray.get(off_ref)[int(g["__bucket"].iloc[0])]
        start = off + np.cumsum(nch) - nch
        return pa.table(
            {
                "conv_id": pa.array(g["conv_id"].to_numpy(object), pa.string()),
                "n_chars": pa.array(nch),
                "start_offset": pa.array(start),
                "pack_id": pa.array(start // seq_len),
            }
        )

    return bucket_groups(
        counts.map_batches(add_bucket, batch_format="pandas"),
        pack,
        num_buckets,
    )


def conv_flatten(transcripts: rd.Dataset) -> rd.Dataset:
    """(conv_id, n_turns, n_user_turns, n_tools, n_chars, conv_text): the
    per-conversation chat render — turns ordered by turn_idx, each as
    'role: text', joined by newline, text bytes preserved exactly —
    plus the per-conversation stats a curation filter reads."""
    num_buckets = sized_buckets(transcripts.count())
    bucketed = transcripts.map_batches(
        _conv_bucket_full,
        batch_format="pandas",
        fn_kwargs=dict(num_buckets=num_buckets),
    )
    return bucket_groups(
        bucketed, _flatten_bucket, num_buckets, bucket_col="bucket"
    )
