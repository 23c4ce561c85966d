"""Deduplication stages: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design:
  * exact — content-hash column → hash-partitioned groupby → first-by-id
    per group. One shuffle keyed by the hash.
  * n-gram Jaccard — shingle explode → groupby(shingle) pair generation →
    pair-count groupby → per-doc counts joined back (NO driver-side
    materialization anywhere). Skew note: a shingle shared by d docs emits
    d(d-1)/2 pairs; EXACT by default (``max_df=None``) — production runs
    over open-domain corpora opt into the hub-key guard with
    ``max_df=DEFAULT_MAX_DF``.
  * MinHash+LSH — k multiply-shift permutations over vectorized shingle
    hashes, b bands → band-hash buckets → candidate pairs → exact Jaccard
    verification through the SAME shuffle path as jaccard_pairs, with the
    shingle table semi-joined down to candidate docs first. Candidates are
    a superset filter; output equals the exact-Jaccard result up to LSH
    recall (recall measured in tests, 1.0 on the fixtures).
  * SimHash — 64-bit token-hash majority signature, one vectorized pass
    per batch (no per-token Python loop).
  * embedding cosine — see stages/similarity.py (block-partitioned pairs).

All signature hashing uses ``pd.util.hash_array`` (deterministic SipHash
with a fixed key) over the exploded shingle/token column — one C-level
pass per batch instead of a per-string Python ``zlib.crc32`` loop.
"""

from __future__ import annotations

import itertools
import logging

import numpy as np

from graphsetintersection_ray.functions.kernels import round_half_away
import pandas as pd
import pyarrow as pa

import ray.data as rd

from graphsetintersection_ray.stages.text import TOKEN_RE

logger = logging.getLogger(__name__)

SHINGLE_W = 3
_M61 = (1 << 61) - 1

# opt-in production skew guard: a shingle appearing in more than this many
# documents is dropped from pair generation (it would emit d(d-1)/2 pairs
# and contributes almost no discriminative signal). The default everywhere
# is max_df=None (exact — matches the SQL oracle); pass
# max_df=DEFAULT_MAX_DF on open-domain corpora.
DEFAULT_MAX_DF = 1024


def _flat_tokens(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a batch → (lens per doc, flat token array). One pandas
    str pass; the flatten is a single chain, not a per-doc loop."""
    toks = batch["text"].str.lower().str.findall(TOKEN_RE).tolist()
    lens = np.fromiter((len(t) for t in toks), np.int64, count=len(toks))
    flat = np.array(
        list(itertools.chain.from_iterable(toks)), dtype=object
    )
    return lens, flat


def _exploded_shingles(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, shingle) distinct word-3-shingles per document, vectorized:
    w-grams are built by shifting the flat token array against itself
    (pandas str.cat), short docs (<w tokens) contribute their full join."""
    doc_ids = batch["doc_id"].to_numpy()
    lens, flat = _flat_tokens(batch)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)

    out_doc: list[np.ndarray] = []
    out_sh: list[np.ndarray] = []
    if len(flat) >= SHINGLE_W:
        s = pd.Series(flat)
        grams = s.str.cat([s.shift(-1), s.shift(-2)], sep=" ").to_numpy(
            object
        )[: len(flat) - (SHINGLE_W - 1)]
        valid = doc_idx[: len(grams)] == doc_idx[SHINGLE_W - 1 :]
        out_doc.append(doc_ids[doc_idx[: len(grams)][valid]])
        out_sh.append(grams[valid])
    short = np.flatnonzero((lens > 0) & (lens < SHINGLE_W))
    if len(short):
        offs = np.concatenate([[0], np.cumsum(lens)])
        out_doc.append(doc_ids[short])
        out_sh.append(
            np.array(
                [" ".join(flat[offs[i] : offs[i + 1]]) for i in short],
                dtype=object,
            )
        )
    if not out_doc:
        return pd.DataFrame({"doc_id": np.empty(0, np.int64), "shingle": []})
    df = pd.DataFrame(
        {
            "doc_id": np.concatenate(out_doc),
            "shingle": np.concatenate(out_sh),
        }
    )
    return df.drop_duplicates()


_SHINGLE_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.int64()), pa.field("shingle", pa.string())]
)


def shingle_table(batch) -> pa.Table:
    """(doc_id, shingle) — distinct word-w-shingles per document.

    Arrow-native hot path (the explode feeding jaccard/minhash):
    lowercase / token-split / w-gram join all run as Arrow C++ kernels
    over the zero-copy batch (``replace_substring_regex`` + ``split`` +
    ``binary_join_element_wise`` on the flat token array shifted against
    itself), and the per-doc DISTINCT is one Arrow hash-aggregate — no
    per-batch Arrow→pandas hop, no Python-object token lists. Equality
    with the pandas ``_exploded_shingles`` reference is pytest-gated."""
    import pyarrow.compute as pc

    if isinstance(batch, pd.DataFrame):
        doc_ids = pa.array(batch["doc_id"].to_numpy(), pa.int64())
        texts = pa.array(batch["text"].to_numpy(object), pa.string())
    else:
        doc_ids = batch["doc_id"].combine_chunks().cast(pa.int64())
        texts = batch["text"].combine_chunks()
    n = len(doc_ids)
    if n == 0:
        return _SHINGLE_SCHEMA.empty_table()
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), "[^a-z0-9_]+", " "
    )
    toks = pc.split_pattern(pc.utf8_trim(cleaned, " "), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    raw_flat = toks.values
    raw_offs = toks.offsets.to_numpy().astype(np.int64)
    # an empty/whitespace-only doc splits to one "" token — drop those
    # (every raw list has >= 1 slot, so reduceat's indices are strict)
    keep = pc.not_equal(raw_flat, "")
    flat = raw_flat.filter(keep)
    lens = np.add.reduceat(
        keep.to_numpy(zero_copy_only=False).astype(np.int64), raw_offs[:-1]
    )
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    total = len(flat)

    doc_parts: list[pa.Array] = []
    sh_parts: list[pa.Array] = []
    if total >= SHINGLE_W:
        m = total - (SHINGLE_W - 1)
        grams = pc.binary_join_element_wise(
            flat.slice(0, m), flat.slice(1, m), flat.slice(2, m), " "
        )
        valid = doc_idx[:m] == doc_idx[SHINGLE_W - 1 :]
        doc_parts.append(doc_ids.take(pa.array(doc_idx[:m][valid])))
        sh_parts.append(grams.filter(pa.array(valid)))
    short = np.flatnonzero((lens > 0) & (lens < SHINGLE_W))
    if len(short):
        lists = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32), pa.int32()), flat
        )
        doc_parts.append(doc_ids.take(pa.array(short)))
        sh_parts.append(pc.binary_join(lists.take(pa.array(short)), " "))
    if not doc_parts:
        return _SHINGLE_SCHEMA.empty_table()
    tbl = pa.table(
        {
            "doc_id": pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in doc_parts]),
            "shingle": pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in sh_parts]),
        }
    )
    return tbl.group_by(["doc_id", "shingle"]).aggregate([])


def _hash_strings(arr: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 63-bit string hash (one SipHash pass)."""
    h = pd.util.hash_array(np.asarray(arr, dtype=object))
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """Keep the minimum doc_id per exact text value. Hash-partition by a
    content hash (never by raw text — bounded key size at scale).

    The hash is one vectorized SipHash pass (no per-row Python loop) and
    is only a PARTITIONING key: rows that collide on the 64-bit hash are
    still deduplicated by the actual text inside the group, so the result
    is exact regardless of hash collisions."""

    def add_hash(b: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_array(b["text"].to_numpy(object)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"], pa.int64()),
                "text": pa.array(b["text"], pa.string()),
                "h": pa.array(h, pa.int64()),
            }
        )

    def keep_first(g: pd.DataFrame) -> pa.Table:
        # one C-level pass over the WHOLE bucket: equal texts always share
        # a bucket (their hashes are equal), so bucket-wide dedup-by-text
        # equals per-hash-group dedup without a Python loop over groups
        g = g.sort_values("doc_id").drop_duplicates("text", keep="first")
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"], pa.int64()),
                "text": pa.array(g["text"], pa.string()),
            }
        )

    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        sized_buckets,
    )

    num_buckets = sized_buckets(docs.count())
    return bucket_groups(
        docs.map_batches(add_hash, batch_format="pandas").map_batches(
            lambda b: _add_bucket(b, ["h"], num_buckets),
            batch_format="pandas",
        ),
        keep_first,
        num_buckets,
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (the shared verification shuffle)
# --------------------------------------------------------------------------


_PAIR_SCHEMA = pa.schema(
    [pa.field("doc_a", pa.int64()), pa.field("doc_b", pa.int64())]
)


def _keyed_pair_rows(
    ds,
    key_cols: list,
    max_df: int | None,
    num_buckets: int,
    dedup_ids: bool = False,
):
    """(doc_a, doc_b) co-occurrence rows, one per (key group, unordered
    doc pair) with doc_a < doc_b — the VECTORIZED replacement for
    applying a pair-builder per key group (shingles, LSH band buckets).
    Inside each bucket, groups are batched BY SIZE: all groups of size s
    emit their pairs in one ``triu_indices(s)`` gather over an
    (n_groups_of_size_s, s) matrix, so the work is a handful of numpy
    calls per DISTINCT group size instead of a Python call per group
    (millions of tiny groups dominated dedup-family wall time), and
    peak memory is exactly the emitted pair count. ``dedup_ids`` drops
    duplicate (group, doc) rows first (the LSH banding case, where a
    doc can land in a band bucket once per batch)."""
    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
    )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _PAIR_SCHEMA.empty_table()
        if len(key_cols) == 1:
            codes, _ = pd.factorize(g[key_cols[0]], sort=False)
        else:
            mat = np.stack(
                [g[c].to_numpy(np.int64) for c in key_cols], axis=1
            )
            _, codes = np.unique(mat, axis=0, return_inverse=True)
        ids = g["doc_id"].to_numpy(np.int64)
        order = np.lexsort((ids, codes))
        codes, ids = codes[order], ids[order]
        if dedup_ids:
            keep = np.concatenate(
                [[True], (codes[1:] != codes[:-1]) | (ids[1:] != ids[:-1])]
            )
            codes, ids = codes[keep], ids[keep]
        n = len(ids)
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]
        )
        sizes = np.diff(np.concatenate([starts, [n]]))
        if max_df is not None:
            big = sizes > max_df
            if big.any():
                logger.info(
                    "jaccard skew guard: dropping %d shingles with "
                    "df > max_df=%d", int(big.sum()), max_df,
                )
                starts, sizes = starts[~big], sizes[~big]
        out_a, out_b = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            sel = starts[sizes == s]
            mat = ids[sel[:, None] + np.arange(s)]
            ai, bi = np.triu_indices(int(s), k=1)
            out_a.append(mat[:, ai].ravel())
            out_b.append(mat[:, bi].ravel())
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a)),
                "doc_b": pa.array(np.concatenate(out_b)),
            }
        )

    return bucket_groups(
        ds.map_batches(
            lambda b: _add_bucket(b, list(key_cols), num_buckets),
            batch_format="pandas",
        ),
        per_bucket,
        num_buckets,
    )


def _attach_pair_counts(
    pair_counts: rd.Dataset,
    counts: rd.Dataset,
    threshold: float,
    num_partitions: int = 16,
) -> rd.Dataset:
    """(doc_a, doc_b, i) ⋈ per-doc shingle counts (twice, hash joins — the
    counts table never lands on the driver) → thresholded jaccard."""
    from graphsetintersection_ray.stages.graph_build import compact_blocks

    j1 = compact_blocks(pair_counts).join(
        compact_blocks(counts),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table(
            {"doc_a": t["doc_a"], "doc_b": t["doc_b"], "i": t["i"],
             "n_a": t["n_sh"]}
        ),
        batch_format="pyarrow",
    )
    j2 = compact_blocks(j1).join(
        compact_blocks(counts),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
        right_on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        inter = t["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["n_sh"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = inter / (na + nb - inter)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(round_half_away(jac[keep], 6), pa.float64()),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


def _sized_buckets(n_rows: int, rows_per_bucket: int = 250_000) -> int:
    """Shuffle fan-out sized by data volume (shared shuffle.sized_buckets
    rule: ~rows_per_bucket rows per bucket in the small band, then grows
    linearly past 64 so a bucket always fits a worker heap). Pin with
    GRAFT_DEDUP_BUCKETS if needed (bucket count is semantics-free)."""
    import os

    env = os.environ.get("GRAFT_DEDUP_BUCKETS")
    if env:
        return int(env)
    from graphsetintersection_ray.stages.shuffle import sized_buckets

    return sized_buckets(n_rows, rows_per_bucket=rows_per_bucket)


def _shingle_pair_rows(ds, max_df: int | None, num_buckets: int):
    """Single-key (shingle) entry point over ``_keyed_pair_rows``."""
    return _keyed_pair_rows(
        ds, ["shingle"], max_df, num_buckets, dedup_ids=False
    )


def jaccard_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    max_df: int | None = None,
    num_partitions: int = 16,
) -> rd.Dataset:
    """(doc_a, doc_b, jaccard) for all pairs with word-3-shingle Jaccard
    >= threshold, doc_a < doc_b, jaccard rounded to 6.

    EXACT by default (``max_df=None``). Production entry points running
    over open-domain corpora should opt into the skew guard with
    ``max_df=DEFAULT_MAX_DF``: a shingle shared by d docs emits d(d-1)/2
    pairs, and dropping hub shingles (df > max_df) bounds that blowup at
    the cost of losing pairs whose overlap is carried ONLY by hub
    shingles (near-zero discriminative signal)."""
    sh = docs.map_batches(shingle_table, batch_format="pyarrow").materialize()

    from graphsetintersection_ray.stages.shuffle import counted_groups, grouped_apply

    nb = _sized_buckets(sh.count())
    counts = counted_groups(sh, ["doc_id"], count_col="n_sh", num_buckets=nb)
    pair_counts = counted_groups(
        _shingle_pair_rows(sh, max_df, num_buckets=nb),
        ["doc_a", "doc_b"],
        count_col="i",
        num_buckets=nb,
    )
    return _attach_pair_counts(
        pair_counts, counts, threshold, num_partitions=num_partitions
    )


def ngram_novelty(docs: rd.Dataset, num_buckets: int | None = None) -> rd.Dataset:
    """(doc_id, n_shingles, n_novel, novelty_rate): per-document n-gram
    novelty — the share of a doc's distinct word-3-shingles whose FIRST
    corpus occurrence (minimum doc_id) is this doc. The corpus-freshness
    complement of the dedup family: boilerplate re-crawls score ~0,
    genuinely new content ~1 (the "how much new text does this source
    add" curation signal).

    Scale shape: one shingle-keyed bucketed shuffle (a shingle's every
    occurrence lands in one bucket, so the bucket-local min doc_id IS
    the global first occurrence) emitting per-doc PARTIAL counts, then
    one pre-aggregated per-doc sum shuffle. No joins, no broadcast, no
    driver state."""
    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        sized_buckets,
        sum_by,
    )

    sh = docs.map_batches(shingle_table, batch_format="pyarrow").materialize()
    if num_buckets is None:
        num_buckets = sized_buckets(sh.count())

    def bucketed(batch: pd.DataFrame) -> pd.DataFrame:
        return _add_bucket(batch, ["shingle"], num_buckets)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        first = g.groupby("shingle", sort=False)["doc_id"].transform("min")
        part = (
            g.assign(novel=(g["doc_id"] == first).astype(np.int64))
            .groupby("doc_id", sort=False)
            .agg(n_shingles=("shingle", "size"), n_novel=("novel", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "doc_id": pa.array(part["doc_id"].to_numpy(np.int64)),
                "n_shingles": pa.array(part["n_shingles"].to_numpy(np.int64)),
                "n_novel": pa.array(part["n_novel"].to_numpy(np.int64)),
            }
        )

    partials = bucket_groups(
        sh.map_batches(bucketed, batch_format="pandas"), per_bucket, num_buckets
    )
    summed = sum_by(partials, ["doc_id"], ["n_shingles", "n_novel"])

    def finalize(t: pa.Table) -> pa.Table:
        ns = t["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = t["n_novel"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_shingles": pa.array(ns),
                "n_novel": pa.array(nn),
                "novelty_rate": pa.array(
                    round_half_away(nn / ns, 6), pa.float64()
                ),
            }
        )

    return summed.map_batches(finalize, batch_format="pyarrow")


def hot_shingles(docs: rd.Dataset, max_df: int = DEFAULT_MAX_DF) -> rd.Dataset:
    """(shingle, df) diagnostics: shingles the skew guard would drop."""
    from graphsetintersection_ray.stages.shuffle import counted_groups

    sh = docs.map_batches(shingle_table, batch_format="pyarrow")
    dfs = counted_groups(sh, ["shingle"], count_col="df")
    return dfs.filter(expr=f"df > {int(max_df)}")


def winnow_dup_pairs(
    docs: rd.Dataset,
    min_shared: int = 8,
    min_overlap: float = 0.5,
    max_df: int | None = None,
    num_partitions: int = 16,
) -> rd.Dataset:
    """(doc_a, doc_b, shared, overlap): substring-level near-duplicate
    pairs via winnowing fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS pipeline): pairs of documents sharing >= ``min_shared``
    DISTINCT winnowed k-gram hashes AND containment overlap = shared /
    min(|fp_a|, |fp_b|) >= ``min_overlap`` (containment is robust when
    a small doc is embedded in a large one, unlike Jaccard; the ratio
    gate matters — templated corpora share boilerplate k-grams, so an
    absolute count alone selects near-all-pairs). doc_a < doc_b,
    overlap rounded to 6 (thresholds applied PRE-rounding, mirrored in
    the SQL oracle).

    EXACT by default; open-domain runs should pass
    ``max_df=DEFAULT_MAX_DF``: a fingerprint shared by d docs emits
    d(d-1)/2 pairs (same blowup/guard trade-off as ``jaccard_pairs``).

    Scale shape: map-only fingerprinting, then the same bounded
    machinery as the shingle pipelines — distinct (doc, fp) with a
    map-side combiner, fp-bucketed pair generation, pre-aggregated
    pair counts, and two hash joins for the per-doc set sizes. No
    stage ever holds more than one bucket."""
    from graphsetintersection_ray.stages.graph_build import compact_blocks
    from graphsetintersection_ray.stages.shuffle import (
        counted_groups,
        distinct_by,
        grouped_apply,
    )
    from graphsetintersection_ray.stages.text import winnow_fingerprint

    fp = distinct_by(
        docs.map_batches(winnow_fingerprint, batch_format="pandas"),
        ["doc_id", "fp"],
    ).materialize()
    nb = _sized_buckets(fp.count())
    counts = counted_groups(fp, ["doc_id"], count_col="n_fp", num_buckets=nb)
    pair_counts = counted_groups(
        _shingle_pair_rows(
            fp.map_batches(
                lambda t: pa.table(
                    {"doc_id": t["doc_id"], "shingle": t["fp"]}
                ),
                batch_format="pyarrow",
            ),
            max_df,
            num_buckets=nb,
        ),
        ["doc_a", "doc_b"],
        count_col="i",
        num_buckets=nb,
    )

    j1 = compact_blocks(pair_counts).join(
        compact_blocks(counts),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table(
            {"doc_a": t["doc_a"], "doc_b": t["doc_b"], "i": t["i"],
             "n_a": t["n_fp"]}
        ),
        batch_format="pyarrow",
    )
    j2 = compact_blocks(j1).join(
        compact_blocks(counts),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
        right_on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        inter = t["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nbv = t["n_fp"].to_numpy(zero_copy_only=False).astype(np.float64)
        ov_all = inter.astype(np.float64) / np.minimum(na, nbv)
        keep = (inter >= min_shared) & (ov_all >= min_overlap)
        ov = ov_all[keep]
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "shared": pa.array(inter[keep], pa.int64()),
                "overlap": pa.array(round_half_away(ov, 6), pa.float64()),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

MINHASH_K = 64
LSH_BANDS = 16  # 16 bands x 4 rows


def _minhash_params(k: int = MINHASH_K, seed: int = 1234):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=k, dtype=np.int64)
    b = rng.integers(0, _M61, size=k, dtype=np.int64)
    return a, b


def minhash_signatures(batch: pd.DataFrame, k: int = MINHASH_K) -> pa.Table:
    """(doc_id, sig: list<int64>) — k multiply-shift min-hashes over the
    hashes of the doc's distinct shingles. Fully vectorized: ONE string
    hash pass for the whole batch, then k (column-at-a-time)
    ``np.minimum.reduceat`` reductions over doc boundaries."""
    a, b = _minhash_params(k)
    doc_ids = batch["doc_id"].to_numpy()
    df = _exploded_shingles(batch)
    sigs = np.full((len(doc_ids), k), _M61, np.int64)
    if len(df):
        # rows come out grouped by doc position (construction order)
        pos_of_doc = {d: i for i, d in enumerate(doc_ids)}
        row_pos = df["doc_id"].map(pos_of_doc).to_numpy()
        order = np.argsort(row_pos, kind="stable")
        row_pos = row_pos[order]
        hashes = _hash_strings(df["shingle"].to_numpy(object))[order]
        starts = np.flatnonzero(
            np.concatenate([[True], row_pos[1:] != row_pos[:-1]])
        )
        docs_present = row_pos[starts]
        for j in range(k):
            hj = (hashes * a[j] + b[j]) % _M61
            sigs[docs_present, j] = np.minimum.reduceat(hj, starts)
    sig_arr = pa.array(sigs.tolist(), pa.list_(pa.int64()))
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64()), "sig": sig_arr})


def minhash_lsh_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    verify_max_df: int | None = None,
) -> rd.Dataset:
    """Candidate pairs from LSH banding, verified with exact shingle
    Jaccard — the verification runs through the same distributed shuffle
    as ``jaccard_pairs`` (shingles semi-joined down to candidate docs
    first); nothing corpus-sized ever lands on the driver. Output schema
    matches jaccard_pairs; equals it up to LSH recall (1.0 on fixtures,
    measured in tests).

    ``verify_max_df=None`` (default) keeps verification exact — dropping
    a shingle would undercount intersections and skew the reported
    jaccard. The candidate semi-join already bounds group membership to
    candidate docs; set verify_max_df only when a hub shingle shared by
    many CANDIDATES would blow up pair generation, accepting approximate
    jaccard values for pairs carried by dropped shingles."""
    docs = docs.materialize()
    # ~100 shingle/band rows per doc flow through each shuffle stage
    nb = _sized_buckets(docs.count() * 100)
    sigs = docs.map_batches(
        minhash_signatures, batch_format="pandas", fn_kwargs=dict(k=k)
    )
    rows_per_band = k // bands

    def band_rows(t: pa.Table) -> pa.Table:
        lists = t["sig"].combine_chunks()
        sig = lists.values.to_numpy(zero_copy_only=False).reshape(-1, k)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_band, out_hash = [], [], []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = np.bitwise_xor.reduce(
                chunk * np.int64(0x9E3779B97F4A7C15 & 0x7FFFFFFFFFFFFFFF), axis=1
            )
            out_doc.append(doc)
            out_band.append(np.full(len(doc), bi, np.int64))
            out_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "band": pa.array(np.concatenate(out_band), pa.int64()),
                "bh": pa.array(np.concatenate(out_hash), pa.int64()),
            }
        )

    from graphsetintersection_ray.stages.graph_build import compact_blocks
    from graphsetintersection_ray.stages.shuffle import (
        counted_groups,
        distinct_by,
    )

    candidates = compact_blocks(
        distinct_by(
            _keyed_pair_rows(
                sigs.map_batches(band_rows, batch_format="pyarrow"),
                ["band", "bh"],
                None,
                num_buckets=nb,
                dedup_ids=True,
            ),
            ["doc_a", "doc_b"],
            num_buckets=nb,
        )
    )

    # exact-Jaccard verification, fully distributed: semi-join the shingle
    # table down to candidate docs, regenerate pair intersections through
    # the jaccard shuffle, keep only LSH-candidate pairs.
    cand_docs = distinct_by(
        candidates.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.concat_arrays(
                        [
                            t["doc_a"].combine_chunks().cast(pa.int64()),
                            t["doc_b"].combine_chunks().cast(pa.int64()),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        ["doc_id"],
        num_buckets=nb,
    )
    sh = docs.map_batches(shingle_table, batch_format="pyarrow")
    sh_cand = compact_blocks(sh).join(
        compact_blocks(cand_docs),
        join_type="inner",
        num_partitions=8,
        on=("doc_id",),
    ).materialize()

    counts = counted_groups(
        sh_cand, ["doc_id"], count_col="n_sh", num_buckets=nb
    )
    pair_counts = counted_groups(
        _shingle_pair_rows(sh_cand, verify_max_df, num_buckets=nb),
        ["doc_a", "doc_b"],
        count_col="i",
        num_buckets=nb,
    )
    # restrict to LSH candidates (inner join on the pair key)
    cand_pairs = compact_blocks(pair_counts).join(
        candidates,
        join_type="inner",
        num_partitions=8,
        on=("doc_a", "doc_b"),
    )
    return _attach_pair_counts(cand_pairs, counts, threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, simhash: int64) — 64-bit token-hash majority signature,
    one vectorized hash pass per batch and 64 column-wise sign
    accumulations (``np.add.reduceat`` over doc boundaries)."""
    doc_ids = batch["doc_id"].to_numpy()
    lens, flat = _flat_tokens(batch)
    acc = np.zeros((len(doc_ids), 64), np.int64)
    if len(flat):
        h = pd.util.hash_array(flat).astype(np.uint64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        nonempty = np.flatnonzero(lens > 0)
        starts = offs[nonempty]
        for j in range(64):
            bit_j = ((h >> np.uint64(j)) & np.uint64(1)).astype(np.int64) * 2 - 1
            acc[nonempty, j] = np.add.reduceat(bit_j, starts)
    bits = (acc > 0).astype(np.uint64)
    sig = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(sig.astype(np.int64), pa.int64()),
        }
    )


def simhash_near_pairs(docs: rd.Dataset, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs with simhash Hamming distance <= max_hamming,
    bucketed by 16-bit bands (a pair within distance 3 shares at least
    one of 4 bands — pigeonhole)."""
    sigs = docs.map_batches(simhash_signatures, batch_format="pandas")

    def band_rows(t: pa.Table) -> pa.Table:
        sig = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        frames = []
        for bi in range(4):
            part = ((sig >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            frames.append(
                pa.table(
                    {
                        "doc_id": pa.array(doc, pa.int64()),
                        "band": pa.array(np.full(len(doc), bi, np.int64)),
                        "bh": pa.array(part),
                        "sig": pa.array(sig.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(frames)

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs_ = g["sig"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        x = sigs_[a_idx] ^ sigs_[b_idx]
        ham = np.zeros(len(x), np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[a_idx][keep], pa.int64()),
                "doc_b": pa.array(ids[b_idx][keep], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    from graphsetintersection_ray.stages.shuffle import distinct_by, grouped_apply

    # a pair recovered from several bands carries the same full-signature
    # hamming distance, so the multi-band dedup is a plain distinct
    return distinct_by(
        grouped_apply(
            sigs.map_batches(band_rows, batch_format="pyarrow"),
            ["band", "bh"],
            bucket_pairs,
            out_schema=pa.schema(
                [
                    pa.field("doc_a", pa.int64()),
                    pa.field("doc_b", pa.int64()),
                    pa.field("hamming", pa.int64()),
                ]
            ),
        ),
        ["doc_a", "doc_b", "hamming"],
    )


# --------------------------------------------------------------------------
# Duplicate-cluster connected components + canonical-survivor dedup
# --------------------------------------------------------------------------

# broadcast the drop-id set into the filter stage only while it is small;
# above this the anti-join runs as a distributed hash join
DEDUP_BROADCAST_MAX = 4_000_000


def _edges_signature(edges: rd.Dataset) -> tuple[int, int]:
    """(row_count, order-independent checksum) of an (u, v) edge set —
    O(#blocks) driver work, used only for star-round convergence."""

    def sig(b: pd.DataFrame) -> pd.DataFrame:
        h = (
            pd.util.hash_array(b["u"].to_numpy())
            * np.uint64(0x9E3779B97F4A7C15)
        ) ^ pd.util.hash_array(b["v"].to_numpy())
        return pd.DataFrame(
            {"cnt": [len(b)], "chk": [int(h.sum(dtype=np.uint64))]}
        )

    s = edges.map_batches(sig, batch_format="pandas").to_pandas()
    cnt = int(s["cnt"].sum())
    chk = int(np.asarray(s["chk"], dtype=np.uint64).sum(dtype=np.uint64))
    return cnt, chk


def _large_star(g: pd.DataFrame) -> pa.Table:
    """Large-star round over one bucket of the SYMMETRIC adjacency
    (columns u, v = neighbor): for every node n, link each strictly
    larger neighbor to m = min(N(n) ∪ {n})."""
    if len(g) == 0:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    gm = pd.Series(v).groupby(pd.Series(u)).min()
    m_of = pd.Series(np.minimum(gm.to_numpy(), gm.index.to_numpy()), index=gm.index)
    m = pd.Series(u).map(m_of).to_numpy()
    keep = v > u
    out_u, out_v = v[keep], m[keep]
    ne = out_u != out_v
    return pa.table(
        {"u": pa.array(out_u[ne], pa.int64()), "v": pa.array(out_v[ne], pa.int64())}
    )


def _small_star(g: pd.DataFrame) -> pa.Table:
    """Small-star round over one bucket of the (u > v)-oriented edge set:
    for every node u, link each smaller neighbor (and u itself) to
    m = min(N<(u))."""
    if len(g) == 0:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    gm = pd.Series(v).groupby(pd.Series(u)).min()
    m = pd.Series(u).map(pd.Series(gm)).to_numpy()
    out_u = np.concatenate([v, gm.index.to_numpy()])
    out_v = np.concatenate([m, gm.to_numpy()])
    ne = out_u != out_v
    return pa.table(
        {"u": pa.array(out_u[ne], pa.int64()), "v": pa.array(out_v[ne], pa.int64())}
    )


def _driver_union_find(pairs_df: pd.DataFrame) -> pa.Table:
    """Union-find with path compression over a small pair list (the
    under-threshold path): exact min-id component labels."""
    a = pairs_df.iloc[:, 0].to_numpy(np.int64)
    b = pairs_df.iloc[:, 1].to_numpy(np.int64)
    ids = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    parent = np.arange(len(ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(ai, bi):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    roots = np.array([find(i) for i in range(len(ids))])
    # component label = min original id in the component; roots are
    # compacted indices, and ids is sorted, so ids[root] IS the min
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(ids[roots], pa.int64()),
        }
    )


def pair_components(
    pairs: rd.Dataset,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    num_buckets: int = 32,
    max_rounds: int = 30,
    driver_max_pairs: int | None = None,
) -> rd.Dataset:
    """Connected components over an arbitrary-id pair list → (doc_id,
    cluster) where cluster = min id in the component, for every id that
    appears in a pair.

    Under ``driver_max_pairs`` (env GRAFT_PAIR_CC_DRIVER_MAX, default
    2M) the pair list collapses to a driver union-find — duplicate-pair
    graphs are usually tiny relative to the corpus. Above it: alternating
    large-star / small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — O(log n) rounds, each round one
    bounded bucketed shuffle over the CURRENT edge set, never over the
    corpus, so a 100 TB corpus with heavy duplication only ever shuffles
    the pair graph. Unlike the superstep CC engine (state/superstep.py),
    neither path needs a dense vertex encoding: ids stay raw int64 doc
    ids. Both paths are equality-tested at a forced-zero threshold."""
    import os

    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        distinct_by,
    )

    if driver_max_pairs is None:
        driver_max_pairs = int(
            os.environ.get("GRAFT_PAIR_CC_DRIVER_MAX", 2_000_000)
        )
    pairs = pairs.materialize()
    if pairs.count() <= driver_max_pairs:
        df = pairs.select_columns([col_a, col_b]).to_pandas()
        return rd.from_arrow(_driver_union_find(df))

    def canon(b: pd.DataFrame) -> pa.Table:
        a = b[col_a].to_numpy()
        c = b[col_b].to_numpy()
        keep = a != c
        return pa.table(
            {
                "u": pa.array(np.maximum(a, c)[keep], pa.int64()),
                "v": pa.array(np.minimum(a, c)[keep], pa.int64()),
            }
        )

    edges = distinct_by(
        pairs.map_batches(canon, batch_format="pandas"), ["u", "v"], num_buckets
    ).materialize()
    prev = _edges_signature(edges)

    for _ in range(max_rounds):
        # large-star works on symmetric adjacency grouped by node
        symm = edges.map_batches(
            lambda t: pa.table(
                {
                    "u": pa.concat_arrays(
                        [t["u"].combine_chunks(), t["v"].combine_chunks()]
                    ),
                    "v": pa.concat_arrays(
                        [t["v"].combine_chunks(), t["u"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        after_large = distinct_by(
            bucket_groups(
                symm.map_batches(
                    lambda b: _add_bucket(b, ["u"], num_buckets),
                    batch_format="pandas",
                ),
                lambda t: _large_star(t.to_pandas()),
                num_buckets,
                batch_format="pyarrow",
            ),
            ["u", "v"],
            num_buckets,
        )
        edges = distinct_by(
            bucket_groups(
                after_large.map_batches(
                    lambda b: _add_bucket(b, ["u"], num_buckets),
                    batch_format="pandas",
                ),
                lambda t: _small_star(t.to_pandas()),
                num_buckets,
                batch_format="pyarrow",
            ),
            ["u", "v"],
            num_buckets,
        ).materialize()
        cur = _edges_signature(edges)
        if cur == prev:
            break
        prev = cur
    else:
        logger.warning("pair_components: no convergence in %d rounds", max_rounds)

    def finish(t: pa.Table) -> pa.Table:
        # converged star edges (child > root): each child maps to its
        # root, and every root maps to itself
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.table(
            {
                "doc_id": pa.concat_arrays([u, v]),
                "cluster": pa.concat_arrays([v, v]),
            }
        )

    return distinct_by(
        edges.map_batches(finish, batch_format="pyarrow"),
        ["doc_id", "cluster"],
        num_buckets,
    )


def near_dedup(
    docs: rd.Dataset,
    pairs: rd.Dataset,
    num_buckets: int = 32,
    broadcast_max: int = DEDUP_BROADCAST_MAX,
) -> rd.Dataset:
    """End-to-end near-duplicate removal: duplicate pairs → connected
    components → keep only the canonical (minimum-id) document per
    cluster plus every unpaired document.

    The drop-id set (non-canonical cluster members) is broadcast via
    ``ray.put`` into a vectorized ``np.isin`` filter while it is small;
    above ``broadcast_max`` it anti-joins through a bounded bucket
    cogroup (union + one sort shuffle — no actor-pool hash-join stage to
    contend for CPUs), so a corpus that is 50% duplicates never lands on
    the driver."""
    import ray

    from graphsetintersection_ray.stages.shuffle import _add_bucket, bucket_groups

    comp = pair_components(pairs, num_buckets=num_buckets)
    drops = comp.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["doc_id"], t["cluster"])).select(
            ["doc_id"]
        ),
        batch_format="pyarrow",
    ).materialize()

    n_drop = drops.count()
    if n_drop <= broadcast_max:
        drop_ref = ray.put(
            np.sort(drops.to_pandas()["doc_id"].to_numpy().astype(np.int64))
        )

        def keep(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            bad = np.isin(ids, ray.get(drop_ref), assume_unique=False)
            return t.filter(pa.array(~bad))

        return docs.map_batches(keep, batch_format="pyarrow")

    # distributed anti-join: union docs with marker rows (doc_id + nulls),
    # cogroup by doc_id bucket, drop doc rows whose id has a marker
    docs = docs.map_batches(lambda t: t, batch_format="pyarrow")
    schema = docs.schema().base_schema
    cols = schema.names

    def mark_docs(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__drop", pa.array(np.zeros(t.num_rows, np.int8))
        )

    def mark_drops(t: pa.Table) -> pa.Table:
        arrays = [
            t["doc_id"] if c == "doc_id" else pa.nulls(t.num_rows, schema.field(c).type)
            for c in cols
        ]
        return pa.table(
            dict(zip(cols, arrays))
        ).append_column("__drop", pa.array(np.ones(t.num_rows, np.int8)))

    unioned = docs.map_batches(mark_docs, batch_format="pyarrow").union(
        drops.map_batches(mark_drops, batch_format="pyarrow")
    )

    def anti(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.Table.from_pylist([], schema=schema)
        bad = g.loc[g["__drop"] == 1, "doc_id"].to_numpy()
        keep_rows = (g["__drop"] == 0) & ~g["doc_id"].isin(bad)
        out = g.loc[keep_rows, cols]
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    return bucket_groups(
        unioned.map_batches(
            lambda b: _add_bucket(b, ["doc_id"], num_buckets),
            batch_format="pandas",
        ),
        anti,
        num_buckets,
    )


def decontaminate(
    docs: rd.Dataset,
    benchmark_mod: int = 97,
    num_buckets: int = 32,
    broadcast_max: int = DEDUP_BROADCAST_MAX,
) -> rd.Dataset:
    """Benchmark decontamination: drop every document whose normalized
    content fingerprint matches a document in the benchmark set (here
    value-defined as ``doc_id % benchmark_mod == 0`` so the check is
    replayable without external data). Removes the benchmark docs
    themselves AND any exact near-verbatim copy of them elsewhere in
    the corpus — the standard eval-leakage guard in training-data
    pipelines. Returns the surviving (doc_id, fp) rows.

    Scale shape: the blocklist is built by fingerprinting ONLY the
    benchmark slice (1/benchmark_mod of the corpus) in its own small
    pass; the corpus fingerprint pass then STREAMS — never
    materialized — into either a broadcast ``ray.put`` + vectorized
    isin filter (blocklist small) or, above ``broadcast_max``, the
    same bounded bucket-cogroup anti-join as ``dedup_survivors`` keyed
    on fp. No driver or object-store materialization of the corpus
    either way."""
    import ray

    from graphsetintersection_ray.stages.shuffle import _add_bucket, bucket_groups
    from graphsetintersection_ray.stages.text import fingerprint

    def _bench_fps(b: pd.DataFrame) -> pa.Table:
        sel = b[(b["doc_id"].to_numpy(np.int64) % benchmark_mod) == 0]
        return fingerprint(sel).select(["fp"])

    bench = docs.map_batches(_bench_fps, batch_format="pandas").materialize()
    fps = docs.map_batches(fingerprint, batch_format="pandas")

    if bench.count() <= broadcast_max:
        block_ref = ray.put(
            np.unique(bench.to_pandas()["fp"].to_numpy(dtype=object))
        )

        def keep(b: pd.DataFrame) -> pa.Table:
            bad = b["fp"].isin(ray.get(block_ref)).to_numpy()
            return pa.Table.from_pandas(b[~bad], preserve_index=False)

        return fps.map_batches(keep, batch_format="pandas")

    # distributed anti-join on fp: union doc rows with blocklist marker
    # rows, cogroup by fp bucket, keep doc rows whose fp has no marker
    def mark_docs(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bench", pa.array(np.zeros(t.num_rows, np.int8))
        )

    def mark_bench(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.nulls(t.num_rows, pa.int64()),
                "fp": t["fp"],
            }
        ).append_column("__bench", pa.array(np.ones(t.num_rows, np.int8)))

    unioned = fps.map_batches(mark_docs, batch_format="pyarrow").union(
        bench.map_batches(mark_bench, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("fp", pa.string())]
    )

    def anti(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        bad = set(g.loc[g["__bench"] == 1, "fp"])
        keep_rows = (g["__bench"] == 0) & ~g["fp"].isin(bad)
        return pa.Table.from_pandas(
            g.loc[keep_rows, ["doc_id", "fp"]],
            schema=out_schema,
            preserve_index=False,
        )

    return bucket_groups(
        unioned.map_batches(
            lambda b: _add_bucket(b, ["fp"], num_buckets),
            batch_format="pandas",
        ),
        anti,
        num_buckets,
    )


# --------------------------------------------------------------------------
# N-gram-overlap decontamination
# --------------------------------------------------------------------------


def ngram_decontaminate(
    docs: rd.Dataset,
    benchmark_mod: int = 97,
    num_buckets: int = 32,
    broadcast_max: int = DEDUP_BROADCAST_MAX,
) -> rd.Dataset:
    """(doc_id, n_hits): n-gram-overlap eval-leakage detection — every
    NON-benchmark document sharing at least one word-3-shingle with the
    value-defined benchmark set (``doc_id % benchmark_mod == 0``), with
    the count of DISTINCT overlapping shingles. The shingle-level
    complement of ``decontaminate``'s whole-content fingerprint rule:
    it catches partial quotes of eval items, not just verbatim copies
    (the GPT-3-appendix-style n-gram contamination check; production
    corpora use 8-13-token windows — the window here is ``SHINGLE_W``
    so the check shares ``jaccard_pairs``' shingle machinery and its
    SQL-oracle prelude).

    Scale shape: the benchmark shingle set is built from the small
    benchmark slice only (1/benchmark_mod of the corpus). Below
    ``broadcast_max`` distinct benchmark shingles the corpus pass is
    MAP-ONLY — broadcast ``ray.put`` set + one vectorized isin and a
    within-batch count per document (a doc's shingles never leave the
    batch that tokenized it; zero shuffle at any corpus size). Above
    it, one bucketed cogroup semi-join keyed on shingle + one
    pre-aggregated per-doc count shuffle. Both paths are tested equal
    at a forced-zero threshold."""
    import ray

    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        sum_by,
    )

    def _bench_shingles(b: pd.DataFrame) -> pa.Table:
        sel = b[(b["doc_id"].to_numpy(np.int64) % benchmark_mod) == 0]
        return shingle_table(sel).select(["shingle"])

    bench = docs.map_batches(
        _bench_shingles, batch_format="pandas"
    ).materialize()

    out_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("n_hits", pa.int64())]
    )

    if bench.count() <= broadcast_max:
        block_ref = ray.put(
            np.unique(bench.to_pandas()["shingle"].to_numpy(dtype=object))
        )

        def hits(b: pd.DataFrame) -> pa.Table:
            corp = b[(b["doc_id"].to_numpy(np.int64) % benchmark_mod) != 0]
            sh = _exploded_shingles(corp)
            if len(sh) == 0:
                return out_schema.empty_table()
            hit = sh[sh["shingle"].isin(ray.get(block_ref)).to_numpy()]
            g = (
                hit.groupby("doc_id", sort=False)
                .size()
                .reset_index(name="n_hits")
            )
            return pa.table(
                {
                    "doc_id": pa.array(
                        g["doc_id"].to_numpy(np.int64), pa.int64()
                    ),
                    "n_hits": pa.array(
                        g["n_hits"].to_numpy(np.int64), pa.int64()
                    ),
                }
            )

        return docs.map_batches(hits, batch_format="pandas")

    # distributed semi-join on shingle: corpus (doc_id, shingle) rows
    # unioned with benchmark marker rows, cogrouped by shingle bucket;
    # a corpus row survives iff its shingle has a marker in the group.
    # (doc_id, shingle) is globally distinct — _exploded_shingles
    # dedups within the doc and a doc lives in one row — so counting
    # surviving rows per doc gives the distinct-overlap count.
    def corpus_rows(b: pd.DataFrame) -> pa.Table:
        corp = b[(b["doc_id"].to_numpy(np.int64) % benchmark_mod) != 0]
        sh = _exploded_shingles(corp)
        return pa.table(
            {
                "doc_id": pa.array(
                    sh["doc_id"].to_numpy(np.int64), pa.int64()
                ),
                "shingle": pa.array(
                    sh["shingle"].to_numpy(object), pa.string()
                ),
                "__bench": pa.array(np.zeros(len(sh), np.int8)),
            }
        )

    def mark_bench(t: pa.Table) -> pa.Table:
        # sentinel -1 (not null): a nullable int64 column would upcast
        # to float64 in the pandas group stage and silently corrupt
        # corpus doc_ids above 2^53; bench rows never reach the output
        # (filtered by __bench == 0) so the sentinel is unobservable
        return pa.table(
            {
                "doc_id": pa.array(
                    np.full(t.num_rows, -1, np.int64), pa.int64()
                ),
                "shingle": t["shingle"],
                "__bench": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    unioned = docs.map_batches(corpus_rows, batch_format="pandas").union(
        bench.map_batches(mark_bench, batch_format="pyarrow")
    )

    ones_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("n", pa.int64())]
    )

    def semi(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return ones_schema.empty_table()
        good = set(g.loc[g["__bench"] == 1, "shingle"])
        keep = (g["__bench"] == 0) & g["shingle"].isin(good)
        kept = g.loc[keep]
        return pa.table(
            {
                "doc_id": pa.array(
                    kept["doc_id"].to_numpy().astype(np.int64), pa.int64()
                ),
                "n": pa.array(np.ones(len(kept), np.int64)),
            }
        )

    hit_rows = bucket_groups(
        unioned.map_batches(
            lambda b: _add_bucket(b, ["shingle"], num_buckets),
            batch_format="pandas",
        ),
        semi,
        num_buckets,
    )
    return sum_by(
        hit_rows, ["doc_id"], "n", out_col="n_hits", num_buckets=num_buckets
    )


# --------------------------------------------------------------------------
# Bloom-filter incremental dedup (membership against a seen corpus)
# --------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 23  # 1 MiB filter; size to ln(2)*m/k inserts at scale
BLOOM_K = 4


def _bloom_positions(texts: pd.Series, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing of the normalized content:
    one SipHash pass (pd.util.hash_array) split into h1/h2, positions
    h1 + i*h2 mod m — the standard Kirsch-Mitzenmacher construction, so
    k probes cost ONE string-hash pass regardless of k."""
    norm = (
        texts.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    )
    h = pd.util.hash_array(norm.to_numpy(object))
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def bloom_membership(
    docs: rd.Dataset,
    seen_mod: int = 2,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> rd.Dataset:
    """(doc_id, maybe_seen): incremental-ingestion dedup — for every
    "new" document (``doc_id % seen_mod != 0``), whether its normalized
    content is POSSIBLY in the value-defined seen corpus
    (``doc_id % seen_mod == 0``), per a Bloom filter built over the
    seen corpus's content hashes. maybe_seen=0 is definite (no false
    negatives, the Bloom guarantee); maybe_seen=1 is probabilistic with
    FP rate ~(1 - e^(-k·n/m))^k — measured in the semantic oracle.
    The classic bounded-memory "have we ingested this before" primitive
    for 100 TB crawl pipelines: the filter is FIXED SIZE (m bits)
    regardless of corpus size.

    Scale shape: one map pass over the seen slice emits per-block
    packed partial filters (m/8 bytes each); the driver ORs #blocks
    fixed-size byte arrays (bounded by block count, not rows) and
    broadcasts the result once via ``ray.put``; the probe pass is
    map-only. Filter construction and probing are fully vectorized
    (one hash pass + np.bitwise_or.at per batch)."""
    import ray

    nbytes = m_bits // 8

    def build(b: pd.DataFrame) -> pa.Table:
        sel = b[(b["doc_id"].to_numpy(np.int64) % seen_mod) == 0]
        bits = np.zeros(nbytes, np.uint8)
        if len(sel):
            pos = _bloom_positions(sel["text"], m_bits, k).ravel()
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8),
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = docs.map_batches(build, batch_format="pandas").to_pandas()
    agg = np.zeros(nbytes, np.uint8)
    for raw in parts["bits"]:
        agg |= np.frombuffer(raw, np.uint8)
    filt_ref = ray.put(agg)

    def probe(b: pd.DataFrame) -> pa.Table:
        sel = b[(b["doc_id"].to_numpy(np.int64) % seen_mod) != 0]
        if len(sel) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "maybe_seen": pa.array([], pa.int64()),
                }
            )
        bits = ray.get(filt_ref)
        pos = _bloom_positions(sel["text"], m_bits, k)
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        hit = (
            byte & (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8)
        ) != 0
        maybe = hit.all(axis=0).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(
                    sel["doc_id"].to_numpy(np.int64), pa.int64()
                ),
                "maybe_seen": pa.array(maybe),
            }
        )

    return docs.map_batches(probe, batch_format="pandas")
