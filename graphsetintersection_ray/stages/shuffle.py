"""Bucketed shuffle helpers.

Ray Data's multi-key ``groupby().aggregate()`` runs on the hash-shuffle
aggregator-actor path, which costs seconds of fixed startup per stage. For
the common distinct / counted-group cases we instead hash the key tuple
into a bounded number of buckets (single-key groupby — cheap path) and do
the group work vectorized inside each bucket: rows with equal keys always
land in the same bucket, so bucket-local results are globally correct.

``num_buckets`` bounds shuffle fan-out; raise it so a bucket fits in a
worker heap at scale (buckets are fully independent).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

# Above the small-input band, one bucket holds at most this many rows —
# bucket count GROWS with data so per-bucket (per-reducer) memory stays
# flat at any corpus size instead of scaling as input/64.
TARGET_ROWS_PER_BUCKET = int(
    os.environ.get("GRAFT_TARGET_ROWS_PER_BUCKET", 2_000_000)
)


def sized_buckets(
    n_rows: int,
    rows_per_bucket: int = 150_000,
    floor: int = 8,
    small_cap: int = 64,
) -> int:
    """Shuffle fan-out derived from a row estimate.

    Small inputs are FIXED-COST bound (64 near-empty shuffle blocks per
    stage measured ~2x slower than 8 at sf0.01), so they get
    ``floor``..``small_cap`` buckets of ~``rows_per_bucket`` rows. Large
    inputs leave the cap behind: bucket count grows linearly as
    ``n_rows / TARGET_ROWS_PER_BUCKET`` (uncapped), so a bucket — the
    unit one reducer holds in heap — never exceeds ~2M rows at ANY
    scale. (A fixed 64-bucket fan-out makes per-bucket memory grow
    linearly with the corpus and blows a worker heap at 100x.)"""
    n_rows = int(n_rows)
    return int(
        max(
            floor,
            min(small_cap, n_rows // rows_per_bucket + floor),
            n_rows // TARGET_ROWS_PER_BUCKET,
        )
    )


def _add_bucket(batch: pd.DataFrame, cols: list[str], num_buckets: int) -> pd.DataFrame:
    h = np.zeros(len(batch), np.uint64)
    for c in cols:
        h ^= pd.util.hash_array(batch[c].to_numpy()) * np.uint64(0x9E3779B97F4A7C15)
        h = (h << np.uint64(13)) | (h >> np.uint64(51))
    batch = batch.copy()
    batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
    return batch


def bucket_groups(
    ds: rd.Dataset,
    fn,
    num_buckets: int,
    bucket_col: str = "__bucket",
    batch_format: str = "pandas",
) -> rd.Dataset:
    """``groupby(bucket_col).map_groups(fn)`` with a BOUNDED shuffle.

    ``groupby().map_groups`` runs a sort shuffle whose output partition
    count tracks the INPUT block count — and Ray Data block counts grow
    with cpu count, so the B_in x B_out intermediate-object grid makes the
    same job SLOWER at 32 cpus than at 8 (measured: 45k shuffle objects at
    32 cpus vs 4k at 8 on an identical 15M-row CSR build). Bucket values
    are dense ints in [0, num_buckets), so an explicit-``boundaries`` sort
    pins the fan-in to exactly ``num_buckets`` partitions — one block per
    bucket — at every parallelism level, and ``fn`` then maps over whole
    blocks. Empty buckets reach ``fn`` as empty TYPED batches (schema is
    preserved through the sort); the helpers' fns all tolerate that.
    """
    if num_buckets <= 1:
        part = ds.repartition(1)
    else:
        part = ds.sort(bucket_col, boundaries=list(range(1, num_buckets)))
    return part.map_batches(fn, batch_format=batch_format, batch_size=None)


def distinct_by(
    ds: rd.Dataset, cols: list[str], num_buckets: int = 64
) -> rd.Dataset:
    """Globally distinct rows over ``cols`` (other columns dropped).

    Map-side combiner: each batch is deduplicated BEFORE the shuffle, so
    shuffle volume is bounded by (batches x distinct-per-batch), not input
    rows — on heavy-duplicate inputs (vertex endpoint keys: ~25x) this is
    the difference between shuffling the dataset and shuffling the keys."""

    def local_dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return _add_bucket(
            batch[cols].drop_duplicates(), cols, num_buckets
        )

    def dedup(t: pa.Table) -> pa.Table:
        # empty buckets: project the input's TYPED schema (from_pandas on
        # an empty object column would emit a null-typed column and poison
        # downstream schema unification)
        if t.num_rows == 0:
            return t.select(cols)
        out = t.to_pandas().drop_duplicates(cols)
        return pa.Table.from_pandas(out[cols], preserve_index=False)

    return bucket_groups(
        ds.map_batches(local_dedup, batch_format="pandas", batch_size=None),
        dedup,
        num_buckets,
        batch_format="pyarrow",
    )


def sum_by(
    ds: rd.Dataset,
    key_cols: list[str],
    val_col: str | list[str],
    out_col: str | list[str] | None = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Equivalent of ``groupby(key_cols).sum(val_col)`` via the bucket
    path (bucket-local sums are globally correct: equal keys share a
    bucket). ``val_col`` may be a list — all columns are summed in the
    same single shuffle."""
    val_cols = [val_col] if isinstance(val_col, str) else list(val_col)
    if out_col is None:
        out_cols = val_cols
    else:
        out_cols = [out_col] if isinstance(out_col, str) else list(out_col)

    def local_sum(batch: pd.DataFrame) -> pd.DataFrame:
        # map-side combiner: partial sums per batch before the shuffle
        part = (
            batch.groupby(key_cols, sort=False)[val_cols]
            .sum()
            .reset_index()
        )
        part.columns = key_cols + out_cols
        return _add_bucket(part, key_cols, num_buckets)

    def reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(key_cols + out_cols)
        out = (
            t.to_pandas()
            .groupby(key_cols, sort=False)[out_cols]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucket_groups(
        ds.map_batches(local_sum, batch_format="pandas", batch_size=None),
        reduce,
        num_buckets,
        batch_format="pyarrow",
    )


def counted_groups(
    ds: rd.Dataset, cols: list[str], count_col: str = "count", num_buckets: int = 64
) -> rd.Dataset:
    """Equivalent of ``groupby(cols).count()`` via the bucket path (with a
    map-side partial count per batch, summed after the shuffle)."""

    def local_count(batch: pd.DataFrame) -> pd.DataFrame:
        part = batch.groupby(cols, sort=False).size().reset_index(name=count_col)
        return _add_bucket(part, cols, num_buckets)

    def count(g: pd.DataFrame) -> pa.Table:
        out = (
            g.groupby(cols, sort=False)[count_col]
            .sum()
            .reset_index(name=count_col)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucket_groups(
        ds.map_batches(local_count, batch_format="pandas", batch_size=None),
        count,
        num_buckets,
    )


def grouped_apply(
    ds: rd.Dataset,
    key_cols: list[str],
    fn,
    out_schema: pa.Schema,
    num_buckets: int = 64,
) -> rd.Dataset:
    """``groupby(key_cols).map_groups(fn)`` via the bounded bucket path:
    equal keys always share a bucket, so applying ``fn`` to each
    key-group inside a bucket is globally correct, and the boundary sort
    pins shuffle fan-in to exactly ``num_buckets`` partitions at every
    parallelism level (Ray's native groupby fan-out tracks input block
    count — the B_in x B_out object grid that anti-scales with cpus).
    ``fn``: group DataFrame -> ``pa.Table``; every output (and the empty
    bucket case) must match ``out_schema``."""

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        tables = [fn(sub) for _, sub in g.groupby(key_cols, sort=False)]
        return pa.concat_tables(tables)

    return bucket_groups(
        ds.map_batches(
            lambda b: _add_bucket(b, key_cols, num_buckets),
            batch_format="pandas",
        ),
        per_bucket,
        num_buckets,
    )
