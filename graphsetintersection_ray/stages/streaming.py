"""Stream-shaped operators over the ordered events log.

Ray Data is a batch engine; stream semantics are expressed by treating
`events` as an ordered, partitioned log: hash users into buckets so each
user's full history is co-located, sort within the bucket by (user, ts,
event_id), and compute windows/sessions with one vectorized pass per
bucket (the pattern recommended for stream-shaped references). Event-time
only — no watermarks; ordering is the (ts, event_id) total order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from graphsetintersection_ray.functions.segments import segment_starts

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def tumbling_window_agg(events: rd.Dataset) -> rd.Dataset:
    """Per (event_type, 1-hour tumbling window): event count + value sum.
    Partial-aggregated per batch before one bucketed grouped sum."""

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        win = ts.astype("datetime64[h]").astype("datetime64[us]")
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "window_start": win,
                "n": 1,
                "value_sum": t["value"].to_numpy(zero_copy_only=False),
            }
        )
        g = (
            df.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("n", "sum"), value_sum=("value_sum", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    win_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("window_start", pa.timestamp("us")),
            pa.field("n", pa.int64()),
            pa.field("value_sum", pa.float64()),
        ]
    )

    def merge(g: pd.DataFrame) -> pa.Table:
        # empty buckets reach fn as empty typed batches under the
        # boundary sort; from_pandas on an empty object column would
        # emit a null-typed column and poison schema unification
        if len(g) == 0:
            return win_schema.empty_table()
        out = (
            g.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("n", "sum"), value_sum=("value_sum", "sum"))
            .reset_index()
        )
        out["value_sum"] = np.floor(out["value_sum"] * 100 + 0.5) / 100
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    from graphsetintersection_ray.stages.shuffle import _add_bucket, bucket_groups

    return bucket_groups(
        events.map_batches(partial, batch_format="pyarrow").map_batches(
            _add_bucket,
            batch_format="pandas",
            fn_kwargs=dict(cols=["event_type"], num_buckets=16),
        ),
        merge,
        16,
    )


def sessionize(events: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """(user_id, n_sessions): sessions split at >30-minute gaps in each
    user's (ts, event_id)-ordered stream."""

    sess_schema = pa.schema(
        [pa.field("user_id", pa.int64()), pa.field("n_sessions", pa.int64())]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sess_schema.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t["ts"]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        user, ts = user[order], ts[order]
        starts = segment_starts(user)
        is_start = np.zeros(len(user), bool)
        is_start[starts] = True
        gap_break = np.zeros(len(user), bool)
        if len(user) > 1:
            gap_break[1:] = (ts[1:] - ts[:-1]) > SESSION_GAP_US
        new_session = (is_start | gap_break).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(user[starts], pa.int64()),
                "n_sessions": pa.array(np.add.reduceat(new_session, starts)),
            }
        )

    from graphsetintersection_ray.stages.shuffle import bucket_groups

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__bucket", pa.array(uid % num_buckets, pa.int64())
        )

    bucketed = events.map_batches(add_bucket, batch_format="pyarrow")
    return bucket_groups(
        bucketed, per_bucket, num_buckets, batch_format="pyarrow"
    )


def stratified_sample(
    events: rd.Dataset,
    stratum_col: str = "event_type",
    key_col: str = "event_id",
    target_per_stratum: int = 1000,
) -> rd.Dataset:
    """Deterministic stratified sample: per stratum keep rows whose key
    satisfies ``key % stride == 0`` with ``stride = ceil(n_s / target)``
    — equalizing per-stratum sample sizes regardless of skew (the rare
    stratum is kept whole, the hot one thinned).

    Scale shape: one pre-aggregated count shuffle over (stratum) — a
    handful of rows — broadcast as a dict into a vectorized filter pass.
    Value-defined (key-modulus) selection, so the sample is replayable
    from the raw table and independent of block order."""
    import ray

    from graphsetintersection_ray.stages.shuffle import sum_by

    ones = events.map_batches(
        lambda t: pa.table(
            {
                stratum_col: t[stratum_col],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    counts = sum_by(ones, [stratum_col], "n").to_pandas()
    stride = {
        s: max(1, int(np.ceil(n / target_per_stratum)))
        for s, n in zip(counts[stratum_col], counts["n"])
    }
    stride_ref = ray.put(stride)

    def pick(t: pa.Table) -> pa.Table:
        st = ray.get(stride_ref)
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        strata = t[stratum_col].to_pandas()
        strides = strata.map(st).fillna(1).to_numpy(np.int64)
        return t.filter(pa.array(keys % strides == 0))

    return events.map_batches(pick, batch_format="pyarrow")


def as_of_join(
    events: rd.Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Event-time AS-OF join (the custom-operator case Ray Data lacks
    natively): for every ``left_type`` event, the most recent
    ``right_type`` event of the SAME user with ``ts <= left.ts`` — ties
    on ts broken by highest event_id; left events with no prior right
    event are dropped (inner as-of semantics, matching the SQL oracle's
    rk = 1 window).

    Scale shape: both sides co-located by a user bucket (one bounded
    boundary-sort shuffle), then one vectorized ``pandas.merge_asof``
    (C-level backward search) per bucket. The partitioning assumption:
    a single user's history fits one bucket — raise ``num_buckets`` so
    buckets stay heap-sized; users are never split."""
    from graphsetintersection_ray.stages.shuffle import bucket_groups

    out_schema = pa.schema(
        [
            pa.field("purchase_id", pa.int64()),
            pa.field("purchase_ts", pa.timestamp("us")),
            pa.field("click_id", pa.int64()),
            pa.field("click_ts", pa.timestamp("us")),
        ]
    )

    def pick(t: pa.Table) -> pa.Table:
        # Arrow-native map-side projection: the WHOLE events table flows
        # through here, so filter/select/bucket run as Arrow kernels on
        # the zero-copy batch instead of a full pandas conversion
        import pyarrow.compute as pc

        keep = pc.is_in(
            t["event_type"], value_set=pa.array([left_type, right_type])
        )
        t = t.filter(keep).select(["event_id", "ts", "user_id", "event_type"])
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__bucket", pa.array(uid % num_buckets, pa.int64())
        )

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        left = g[g["event_type"] == left_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        right = g[g["event_type"] == right_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        if len(left) == 0 or len(right) == 0:
            return out_schema.empty_table()
        m = pd.merge_asof(
            left,
            right,
            on="ts",
            by="user_id",
            direction="backward",
            suffixes=("_l", "_r"),
        )
        # merge_asof keeps left.ts as "ts"; recover the right event's ts
        r_ts = right.set_index("event_id")["ts"]
        m = m.dropna(subset=["event_id_r"])
        click_id = m["event_id_r"].astype(np.int64)
        return pa.table(
            {
                "purchase_id": pa.array(
                    m["event_id_l"].to_numpy(np.int64), pa.int64()
                ),
                "purchase_ts": pa.array(m["ts"]),
                "click_id": pa.array(click_id.to_numpy(), pa.int64()),
                "click_ts": pa.array(
                    click_id.map(r_ts).to_numpy()
                ),
            }
        )

    return bucket_groups(
        events.map_batches(pick, batch_format="pyarrow"),
        join_bucket,
        num_buckets,
    )


def range_join_counts(
    events: rd.Dataset,
    left_type: str = "purchase",
    right_type: str = "error",
    window_us: int = 3600 * 1_000_000,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Event-time RANGE join (the other custom-operator case Ray Data
    lacks natively): for every ``left_type`` event, the COUNT of
    ``right_type`` events of the same user inside
    ``[left.ts - window, left.ts]`` (both ends inclusive). Left events
    with no matches report 0.

    Scale shape: one bounded user-bucket shuffle co-locating both
    sides, then two vectorized ``searchsorted`` probes per bucket over
    a composite (dense-user, relative-ts) int64 key — no per-row or
    per-user Python loop. Partitioning assumptions documented: a
    user's history fits one bucket, and <= 2^16 distinct users per
    bucket with a <= 2^47-microsecond (~4.5-year) timestamp span
    (raise ``num_buckets`` to hold both at scale)."""
    from graphsetintersection_ray.stages.shuffle import bucket_groups

    out_schema = pa.schema(
        [
            pa.field("purchase_id", pa.int64()),
            pa.field("n_errors_1h", pa.int64()),
        ]
    )

    def pick(t: pa.Table) -> pa.Table:
        # Arrow-native map-side projection: the WHOLE events table flows
        # through here, so filter/select/bucket run as Arrow kernels on
        # the zero-copy batch instead of a full pandas conversion
        import pyarrow.compute as pc

        keep = pc.is_in(
            t["event_type"], value_set=pa.array([left_type, right_type])
        )
        t = t.filter(keep).select(["event_id", "ts", "user_id", "event_type"])
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__bucket", pa.array(uid % num_buckets, pa.int64())
        )

    def count_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        left = g[g["event_type"] == left_type]
        if len(left) == 0:
            return out_schema.empty_table()
        right = g[g["event_type"] == right_type]
        l_ts = left["ts"].to_numpy("datetime64[us]").astype(np.int64)
        l_id = left["event_id"].to_numpy(np.int64)
        if len(right) == 0:
            return pa.table(
                {
                    "purchase_id": pa.array(l_id, pa.int64()),
                    "n_errors_1h": pa.array(
                        np.zeros(len(l_id), np.int64)
                    ),
                }
            )
        r_ts = right["ts"].to_numpy("datetime64[us]").astype(np.int64)
        all_u = np.concatenate(
            [left["user_id"].to_numpy(np.int64),
             right["user_id"].to_numpy(np.int64)]
        )
        users, inv = np.unique(all_u, return_inverse=True)
        l_u, r_u = inv[: len(left)], inv[len(left):]
        t0 = min(int(l_ts.min()), int(r_ts.min()))
        rel_l, rel_r = l_ts - t0, r_ts - t0
        if len(users) >= 1 << 16 or max(
            int(rel_l.max()), int(rel_r.max())
        ) >= 1 << 47:
            raise ValueError(
                "range_join_counts bucket overflow: raise num_buckets "
                f"(users={len(users)}, span_us={max(int(rel_l.max()), int(rel_r.max()))})"
            )
        key_r = np.sort((r_u << np.int64(47)) | rel_r)
        hi = (l_u << np.int64(47)) | rel_l
        lo = (l_u << np.int64(47)) | np.maximum(rel_l - window_us, 0)
        n = np.searchsorted(key_r, hi, side="right") - np.searchsorted(
            key_r, lo, side="left"
        )
        return pa.table(
            {
                "purchase_id": pa.array(l_id, pa.int64()),
                "n_errors_1h": pa.array(n.astype(np.int64)),
            }
        )

    return bucket_groups(
        events.map_batches(pick, batch_format="pyarrow"),
        count_bucket,
        num_buckets,
    )


def hopping_window_agg(events: rd.Dataset) -> rd.Dataset:
    """Per (event_type, 1-hour window hopping every 30 min): event count
    + value sum. Each event lands in exactly two overlapping windows
    (starts at floor30(ts) and floor30(ts) − 30 min). Same
    partial-aggregate-then-bounded-merge shape as the tumbling variant:
    replication factor (window/hop = 2) is paid BEFORE the per-batch
    partial aggregation, so shuffle volume stays (types × windows), not
    2 × events."""
    HOP_US = 30 * 60 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts_us = ts.astype(np.int64)
        base = (ts_us // HOP_US) * HOP_US
        frames = []
        for start in (base, base - HOP_US):
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": t["event_type"].to_pandas(),
                        "window_start": start.astype("datetime64[us]"),
                        "n": 1,
                        "value_sum": t["value"].to_numpy(
                            zero_copy_only=False
                        ),
                    }
                )
            )
        df = pd.concat(frames, ignore_index=True)
        g = (
            df.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("n", "sum"), value_sum=("value_sum", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    win_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("window_start", pa.timestamp("us")),
            pa.field("n", pa.int64()),
            pa.field("value_sum", pa.float64()),
        ]
    )

    def merge(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return win_schema.empty_table()
        out = (
            g.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("n", "sum"), value_sum=("value_sum", "sum"))
            .reset_index()
        )
        out["value_sum"] = np.floor(out["value_sum"] * 100 + 0.5) / 100
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    from graphsetintersection_ray.stages.shuffle import _add_bucket, bucket_groups

    return bucket_groups(
        events.map_batches(partial, batch_format="pyarrow").map_batches(
            _add_bucket,
            batch_format="pandas",
            fn_kwargs=dict(cols=["event_type"], num_buckets=16),
        ),
        merge,
        16,
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(
    events: rd.Dataset,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    num_buckets: int = 32,
) -> rd.Dataset:
    """(stage, step, n_users): classic funnel analysis — how many users
    completed the first ``stage`` steps of ``steps`` as an ordered
    subsequence of their (ts, event_id)-ordered event stream (each step
    matched greedily at its earliest occurrence after the previous
    step's match; greedy-earliest is optimal for subsequence reach).

    Scale shape: users are hash-bucketed so each user's history is
    co-located, one vectorized pass per bucket computes per-bucket
    reach counts with len(steps) ``np.minimum.at`` sweeps (no per-user
    Python loop), and the final reduce sums a stage-count table bounded
    by len(steps) x num_buckets rows."""
    from graphsetintersection_ray.stages.shuffle import bucket_groups, sum_by

    out_schema = pa.schema(
        [
            pa.field("stage", pa.int64()),
            pa.field("step", pa.string()),
            pa.field("n_users", pa.int64()),
        ]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t["ts"]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        user = user[order]
        etype = t["event_type"].to_numpy(zero_copy_only=False)[order]
        uids, uidx = np.unique(user, return_inverse=True)
        nu = len(uids)
        pos = np.arange(len(user), dtype=np.int64)
        inf = np.int64(len(user) + 1)
        cur = np.full(nu, -1, np.int64)  # last matched position per user
        stage_counts = np.zeros(len(steps), np.int64)
        for si, step in enumerate(steps):
            mask = (etype == step) & (pos > cur[uidx])
            nxt = np.full(nu, inf, np.int64)
            if mask.any():
                np.minimum.at(nxt, uidx[mask], pos[mask])
            cur = nxt  # dropped-out users hold inf -> never match again
            stage_counts[si] = int((nxt < inf).sum())
        return pa.table(
            {
                "stage": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
                "step": pa.array(list(steps), pa.string()),
                "n_users": pa.array(stage_counts),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__bucket", pa.array(uid % num_buckets, pa.int64())
        )

    bucketed = events.map_batches(add_bucket, batch_format="pyarrow")
    partials = bucket_groups(
        bucketed, per_bucket, num_buckets, batch_format="pyarrow"
    )
    return sum_by(
        partials, ["stage", "step"], "n_users", num_buckets=1
    )


def approx_distinct_users(
    events: rd.Dataset, m: int = 16384, seed: int = 7
) -> rd.Dataset:
    """(event_type, n_approx): HyperLogLog approximate distinct user
    count per event type — the bounded-memory distinct-count primitive
    (standard error ~1.04/sqrt(m) ≈ 0.8% at the default m; measured
    against the exact count in the semantic oracle). Deterministic:
    fixed splitmix64 hash, so estimates are replayable.

    Scale shape: one map pass emits per-block per-type register rows
    (m bytes each — the per-block state is FIXED SIZE regardless of
    rows); the driver max-combines types × #blocks rows. At 100 TB the
    same shape holds: the combine input is bounded by block count, not
    user count."""
    from graphsetintersection_ray.functions.hll import (
        hll_estimate,
        hll_registers,
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        uid = b["user_id"].to_numpy(np.int64)
        et = b["event_type"].to_numpy(object)
        bucket, rank = hll_registers(uid, m, seed)
        types, tidx = np.unique(et, return_inverse=True)
        regs = np.zeros((len(types), m), np.uint8)
        np.maximum.at(regs, (tidx, bucket), rank)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "regs": pa.array(
                    [r.tobytes() for r in regs], pa.binary()
                ),
            }
        )

    parts = events.map_batches(partial, batch_format="pandas").to_pandas()
    out_types, out_est = [], []
    for t, g in parts.groupby("event_type", sort=True):
        agg = np.zeros(m, np.uint8)
        for raw in g["regs"]:
            np.maximum(agg, np.frombuffer(raw, np.uint8), out=agg)
        out_types.append(t)
        out_est.append(int(round(hll_estimate(agg)[0])))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(out_types, pa.string()),
                "n_approx": pa.array(out_est, pa.int64()),
            }
        )
    )


def conversion_time(events: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """(user_id, conv_us): time from each user's EARLIEST view to the
    earliest purchase strictly after it (the funnel's stage-2 latency),
    in microseconds; non-converting users are absent. Ordering is the
    (ts, event_id) total order, so the result is deterministic under
    timestamp ties.

    Scale shape: same as funnel_counts — user-bucketed histories, one
    vectorized pass per bucket (two np.minimum.at sweeps), map-only
    after the one bucketing shuffle."""
    from graphsetintersection_ray.stages.shuffle import bucket_groups

    out_schema = pa.schema(
        [pa.field("user_id", pa.int64()), pa.field("conv_us", pa.int64())]
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        order = np.lexsort(
            (
                b["event_id"].to_numpy(),
                b["ts"].to_numpy(),
                b["user_id"].to_numpy(),
            )
        )
        user = b["user_id"].to_numpy()[order]
        etype = b["event_type"].to_numpy(object)[order]
        ts = (
            b["ts"].to_numpy()[order].astype("datetime64[us]").astype(np.int64)
        )
        uids, uidx = np.unique(user, return_inverse=True)
        nu = len(uids)
        pos = np.arange(len(user), dtype=np.int64)
        inf = np.int64(len(user) + 1)
        vpos = np.full(nu, inf, np.int64)
        vmask = etype == "view"
        if vmask.any():
            np.minimum.at(vpos, uidx[vmask], pos[vmask])
        ppos = np.full(nu, inf, np.int64)
        pmask = (etype == "purchase") & (vpos[uidx] < pos)
        if pmask.any():
            np.minimum.at(ppos, uidx[pmask], pos[pmask])
        conv = (ppos < inf) & (vpos < inf)
        return pa.table(
            {
                "user_id": pa.array(uids[conv], pa.int64()),
                "conv_us": pa.array(ts[ppos[conv]] - ts[vpos[conv]]),
            }
        )

    bucketed = events.map_batches(
        lambda b: b.assign(__bucket=(b["user_id"].to_numpy() % num_buckets)),
        batch_format="pandas",
    )
    return bucket_groups(bucketed, per_bucket, num_buckets)


def weighted_sample(
    events: rd.Dataset, k: int = 100, seed: int = 13
) -> rd.Dataset:
    """(rk, event_id, value): weighted sample WITHOUT replacement of k
    events with inclusion probability proportional to ``value`` — the
    Efraimidis-Spirakis A-ES scheme: key_i = u_i^(1/w_i) with u_i a
    DETERMINISTIC uniform from splitmix64(event_id + seed), take the k
    largest keys (ties by event_id asc). Deterministic end-to-end, so
    the semantic oracle replays it exactly; importance sampling for
    curation (sample big-value events more often) at any scale.

    Scale shape: one map pass computes keys and keeps a per-block
    partial top-k under the same total order (key DESC, event_id ASC);
    the driver reduce sees at most k x #blocks rows."""
    from graphsetintersection_ray.functions.hll import splitmix64

    def partial(b: pd.DataFrame) -> pa.Table:
        eid = b["event_id"].to_numpy(np.int64)
        w = b["value"].to_numpy(np.float64)
        u = (splitmix64(eid + seed).astype(np.float64) + 1.0) / 2.0**64
        key = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), -1.0)
        df = pd.DataFrame({"event_id": eid, "value": b["value"], "key": key})
        df = df.sort_values(["key", "event_id"], ascending=[False, True])
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    cand = (
        events.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .sort_values(["key", "event_id"], ascending=[False, True])
        .head(k)
    )
    cand = cand[cand["key"] >= 0]
    return rd.from_arrow(
        pa.table(
            {
                "rk": pa.array(
                    np.arange(1, len(cand) + 1, dtype=np.int64)
                ),
                "event_id": pa.array(
                    cand["event_id"].to_numpy(np.int64), pa.int64()
                ),
                "value": pa.array(
                    cand["value"].to_numpy(np.float64), pa.float64()
                ),
            }
        )
    )


def retention_cohorts(events: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """(cohort_week, week, n_users): weekly cohort retention — users
    grouped by the ISO week (Monday-truncated) of their FIRST event,
    counted in every week they were active.

    Scale shape: per-batch distinct (user, week) partials (shuffle volume
    tracks user-weeks, not events), one user-keyed bucket shuffle so each
    user's weeks co-locate with their min (the cohort), then a tiny
    (cohort, week) count reduce."""
    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        sum_by,
    )

    def _monday(ts: np.ndarray) -> np.ndarray:
        days = ts.astype("datetime64[D]")
        di = days.astype(np.int64)  # days since 1970-01-01 (a Thursday)
        return days - ((di + 3) % 7)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        wk = _monday(b["ts"].to_numpy("datetime64[us]"))
        part = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(np.int64), "wk": wk}
        ).drop_duplicates()
        return _add_bucket(part, ["user_id"], num_buckets)

    out_schema = pa.schema(
        [
            pa.field("cohort_week", pa.date32()),
            pa.field("week", pa.date32()),
            pa.field("n", pa.int64()),
        ]
    )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.drop_duplicates(["user_id", "wk"])
        cohort = g.groupby("user_id", sort=False)["wk"].transform("min")
        cnt = (
            g.assign(cohort=cohort)
            .groupby(["cohort", "wk"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "cohort_week": pa.array(
                    cnt["cohort"].to_numpy("datetime64[D]")
                ),
                "week": pa.array(cnt["wk"].to_numpy("datetime64[D]")),
                "n": pa.array(cnt["n"].to_numpy(np.int64)),
            }
        )

    partials = bucket_groups(
        events.map_batches(partial, batch_format="pandas"),
        per_bucket,
        num_buckets,
    )
    summed = sum_by(partials, ["cohort_week", "week"], "n", out_col="n_users")

    def to_schema(t: pa.Table) -> pa.Table:
        # timestamp("us"), not date32: DuckDB `CAST AS DATE` round-trips
        # to pandas as datetime64[us], and the gate's value hash is
        # dtype-sensitive — date32 (python date objects) hashes differently
        # even when every value is identical.
        return pa.table(
            {
                "cohort_week": t["cohort_week"].cast(pa.timestamp("us")),
                "week": t["week"].cast(pa.timestamp("us")),
                "n_users": t["n_users"].cast(pa.int64()),
            }
        )

    return summed.map_batches(to_schema, batch_format="pyarrow")
