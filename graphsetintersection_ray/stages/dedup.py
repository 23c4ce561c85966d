"""Deduplication stages: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design:
  * exact — content-hash column → hash-partitioned groupby → first-by-id
    per group. One shuffle keyed by the hash.
  * n-gram Jaccard — shingle explode → groupby(shingle) pair generation →
    pair-count groupby → verify against per-doc shingle counts. Skew note:
    a shingle shared by d docs emits d(d-1)/2 pairs; production runs drop
    shingles with document frequency > max_df (hub-key salting analog).
    The oracle-checked query leaves max_df unset so SQL matches exactly.
  * MinHash+LSH — k permutations via multiply-shift hashing of shingle
    CRCs (vectorized), b bands → band-hash buckets → candidate pairs →
    exact Jaccard verify. Candidates are a superset filter; output equals
    the exact-Jaccard result with high probability (recall tested).
  * SimHash — 64-bit hyperplane-free signature from token hashes.
  * embedding cosine — all-pairs via broadcast matrix (ray.put once),
    batch-sized matmuls; the O(n^2) scale path is LSH-bucketed (see
    stages/similarity.py).
"""

from __future__ import annotations

import zlib

import numpy as np

from graphsetintersection_ray.functions.kernels import round_half_away
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from graphsetintersection_ray.stages.text import TOKEN_RE

SHINGLE_W = 3
_M61 = (1 << 61) - 1


def _tokenize(text: pd.Series) -> list[list[str]]:
    return text.str.lower().str.findall(TOKEN_RE).tolist()


def _shingles(tokens: list[str], w: int = SHINGLE_W) -> set[str]:
    if len(tokens) < w:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + w]) for i in range(len(tokens) - w + 1)}


def shingle_table(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, shingle) — distinct word-w-shingles per document."""
    ids, sh = [], []
    for doc_id, toks in zip(batch["doc_id"], _tokenize(batch["text"])):
        for s in _shingles(toks):
            ids.append(doc_id)
            sh.append(s)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "shingle": pa.array(sh, pa.string())}
    )


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """Keep the minimum doc_id per exact text value. Hash-partition by a
    content hash (never by raw text — bounded key size at scale)."""
    import hashlib

    def add_hash(b: pd.DataFrame) -> pa.Table:
        h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in b["text"]]
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"], pa.int64()),
                "text": pa.array(b["text"], pa.string()),
                "h": pa.array(h, pa.string()),
            }
        )

    def keep_first(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id").head(1)
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"], pa.int64()),
                "text": pa.array(g["text"], pa.string()),
            }
        )

    return (
        docs.map_batches(add_hash, batch_format="pandas")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard pairs
# --------------------------------------------------------------------------


def jaccard_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    max_df: int | None = None,
    num_partitions: int = 16,
) -> rd.Dataset:
    """(doc_a, doc_b, jaccard) for all pairs with word-3-shingle Jaccard
    >= threshold, doc_a < doc_b, jaccard rounded to 6."""
    sh = docs.map_batches(shingle_table, batch_format="pandas").materialize()

    # per-doc shingle counts (broadcast — |docs| rows, small relative to pairs)
    counts = (
        sh.groupby("doc_id")
        .count()
        .map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "n_sh": t["count()"]}
            ),
            batch_format="pyarrow",
        )
    )
    counts_df = counts.to_pandas()
    counts_ref = ray.put(
        dict(zip(counts_df["doc_id"].tolist(), counts_df["n_sh"].tolist()))
    )

    def pairs_for_shingle_group(g: pd.DataFrame) -> pa.Table:
        ids = np.sort(g["doc_id"].to_numpy())
        if max_df is not None and len(ids) > max_df:
            ids = ids[:0]
        if len(ids) < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[a_idx], pa.int64()),
                "doc_b": pa.array(ids[b_idx], pa.int64()),
            }
        )

    from graphsetintersection_ray.stages.shuffle import counted_groups

    pair_counts = counted_groups(
        sh.groupby("shingle").map_groups(
            pairs_for_shingle_group, batch_format="pandas"
        ),
        ["doc_a", "doc_b"],
        count_col="i",
    )

    def verify(t: pa.Table) -> pa.Table:
        lookup = ray.get(counts_ref)
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        inter = t["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([lookup[x] for x in a], np.float64)
        nb = np.array([lookup[x] for x in b], np.float64)
        jac = inter / (na + nb - inter)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(round_half_away(jac[keep], 6), pa.float64()),
            }
        )

    return pair_counts.map_batches(verify, batch_format="pyarrow")


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
    CRC32s of the doc's shingles. Vectorized: one (n_shingles x k) pass."""
    a, b = _minhash_params(k)
    ids, sigs = [], []
    for doc_id, toks in zip(batch["doc_id"], _tokenize(batch["text"])):
        sh = _shingles(toks)
        if not sh:
            sigs.append(np.full(k, _M61, np.int64))
            ids.append(doc_id)
            continue
        crcs = np.array(
            [zlib.crc32(s.encode("utf-8")) for s in sh], dtype=np.int64
        )
        hashes = (crcs[:, None] * a[None, :] + b[None, :]) % _M61
        sigs.append(hashes.min(axis=0))
        ids.append(doc_id)
    sig_arr = pa.array([s.tolist() for s in sigs], pa.list_(pa.int64()))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "sig": sig_arr})


def minhash_lsh_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
) -> rd.Dataset:
    """Candidate pairs from LSH banding, verified with exact shingle
    Jaccard. Output schema matches jaccard_pairs."""
    docs = docs.materialize()
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

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        ids = np.sort(np.unique(g["doc_id"].to_numpy()))
        if len(ids) < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[a_idx], pa.int64()),
                "doc_b": pa.array(ids[b_idx], pa.int64()),
            }
        )

    from graphsetintersection_ray.stages.shuffle import distinct_by

    candidates = distinct_by(
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(bucket_pairs, batch_format="pandas"),
        ["doc_a", "doc_b"],
    )

    # exact-Jaccard verification of the candidate set
    sh = docs.map_batches(shingle_table, batch_format="pandas")
    sh_df = sh.to_pandas()
    by_doc = sh_df.groupby("doc_id")["shingle"].apply(set)
    by_doc_ref = ray.put(dict(by_doc))

    def verify(t: pa.Table) -> pa.Table:
        lookup = ray.get(by_doc_ref)
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, b):
            sa, sb = lookup.get(x, set()), lookup.get(y, set())
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                out_a.append(x)
                out_b.append(y)
                out_j.append(round(jac, 6))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return candidates.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, simhash: int64) — 64-bit token-hash majority signature."""
    ids, sigs = [], []
    for doc_id, toks in zip(batch["doc_id"], _tokenize(batch["text"])):
        acc = np.zeros(64, np.int64)
        for t in toks:
            h = np.uint64(
                zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits > 0, 1, -1)
        sig = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        ids.append(doc_id)
        sigs.append(np.int64(sig - (1 << 64) if sig >= (1 << 63) else sig))
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "simhash": pa.array(sigs, pa.int64())}
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

    from graphsetintersection_ray.stages.shuffle import distinct_by

    # a pair recovered from several bands carries the same full-signature
    # hamming distance, so the multi-band dedup is a plain distinct
    return distinct_by(
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(bucket_pairs, batch_format="pandas"),
        ["doc_a", "doc_b", "hamming"],
    )
