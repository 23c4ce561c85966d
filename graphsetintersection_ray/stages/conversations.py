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
