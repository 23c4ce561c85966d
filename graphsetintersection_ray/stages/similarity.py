"""Similarity search over the embeddings table (list<float> column).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul, per-batch top-k partials
are merged in a tiny final groupby (pre-aggregation before the shuffle).

Scale path: LSH-bucketed ANN (random-hyperplane signs → bucket groupby),
searching only colliding buckets — recall measured against brute force in
tests rather than promised.
"""

from __future__ import annotations

import numpy as np

from graphsetintersection_ray.functions.kernels import round_half_away
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


_TOPK_SCHEMA = pa.schema(
    [
        pa.field("query_id", pa.int64()),
        pa.field("neighbor_id", pa.int64()),
        pa.field("sim", pa.float64()),
    ]
)


def _emb_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    lists = t["embedding"].combine_chunks()
    dim = len(lists[0]) if len(lists) else 0
    mat = lists.values.to_numpy(zero_copy_only=False).reshape(len(ids), dim)
    return ids, mat.astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def brute_force_topk(
    embeddings: rd.Dataset,
    query_ids: np.ndarray | list,
    k: int = 5,
) -> rd.Dataset:
    """For each query vec_id, the top-k most-cosine-similar OTHER vectors.
    Output: (query_id, neighbor_id, sim) with sim rounded to 6."""
    embeddings = embeddings.materialize()
    q_arr = pa.array(sorted(int(q) for q in query_ids), pa.int64())
    qdf = embeddings.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=q_arr)),
        batch_format="pyarrow",
    ).to_pandas()
    q_ids = qdf["vec_id"].to_numpy()
    q_mat = _normalize(
        np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    )
    q_ref = ray.put((q_ids, q_mat))

    def partial_topk(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids, mat = _emb_matrix(t)
        keep = ~np.isin(ids, qi)
        ids, mat = ids[keep], mat[keep]
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        sims = qm @ _normalize(mat).T  # (Q, batch)
        kk = min(k, sims.shape[1])
        # per-batch candidate selection must use the SAME total order as the
        # final merge — (sim desc, neighbor_id asc) — or a tied neighbor at
        # the kk boundary can be dropped before the merge sees it
        nq = len(qi)
        q_idx = np.repeat(np.arange(nq), sims.shape[1])
        order = np.lexsort((np.tile(ids, nq), -sims.ravel(), q_idx))
        take = (np.arange(nq)[:, None] * sims.shape[1] + np.arange(kk)).ravel()
        sel = order[take]
        out_q = np.repeat(qi, kk)
        out_n = np.tile(ids, nq)[sel]
        out_s = sims.ravel()[sel]
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pa.table(
            {
                "query_id": pa.array(g["query_id"], pa.int64()),
                "neighbor_id": pa.array(g["neighbor_id"], pa.int64()),
                "sim": pa.array(round_half_away(g["sim"].to_numpy(), 6), pa.float64()),
            }
        )

    from graphsetintersection_ray.stages.shuffle import grouped_apply

    return grouped_apply(
        embeddings.map_batches(partial_topk, batch_format="pyarrow"),
        ["query_id"],
        final_topk,
        out_schema=pa.schema(
            [
                pa.field("query_id", pa.int64()),
                pa.field("neighbor_id", pa.int64()),
                pa.field("sim", pa.float64()),
            ]
        ),
        num_buckets=8,
    )


@ray.remote
def _normalized_block(tbl) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(tbl, pd.DataFrame):
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    ids, mat = _emb_matrix(tbl)
    return ids, _normalize(mat)


@ray.remote
def _block_pair_sims(blk_a, blk_b, threshold: float, diagonal: bool) -> pa.Table:
    """One tile of the pairwise-cosine matrix. On the diagonal (blk_a is
    blk_b) keep only a < b so each within-block pair appears once; on an
    off-diagonal tile EVERY (row, col) combination is unique to this tile,
    so keep all of them (minus accidental id collisions) and canonicalise
    to (min, max) — ids need NOT be sorted across blocks."""
    ids_a, mat_a = blk_a
    ids_b, mat_b = blk_b
    if len(ids_a) == 0 or len(ids_b) == 0:
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    sims = mat_a @ mat_b.T
    rows, cols = np.nonzero(sims >= threshold)
    a = ids_a[rows]
    b = ids_b[cols]
    if diagonal:
        keep = a < b
        lo, hi = a[keep], b[keep]
    else:
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
    return pa.table(
        {
            "vec_a": pa.array(lo, pa.int64()),
            "vec_b": pa.array(hi, pa.int64()),
            "sim": pa.array(
                round_half_away(sims[rows, cols][keep], 6), pa.float64()
            ),
        }
    )


def cosine_dup_pairs(
    embeddings: rd.Dataset, threshold: float = 0.95, block_rows: int = 16_384
) -> rd.Dataset:
    """All pairs (a < b) with cosine >= threshold — EXACT, via
    block-partitioned pairwise comparison.

    The corpus is split into B row blocks that live in the object store;
    one remote task per unordered block pair (i <= j) computes that tile
    of the similarity matrix. Nothing corpus-sized touches the driver (it
    only holds B object refs), peak task memory is two blocks plus one
    tile, and the i <= j enumeration halves the work (every (a < b) pair
    is covered because each task keeps only a < b). Compute is O(n²/2)
    tiles — the price of exactness at a low threshold; for high-threshold
    near-dup detection prefer the LSH-bucketed route (``lsh_topk``'s
    bucketing), which trades recall for a near-linear tile count."""
    n = embeddings.count()
    n_blocks = max(1, -(-n // block_rows))
    refs = embeddings.repartition(n_blocks).materialize().to_arrow_refs()
    norm_refs = [_normalized_block.remote(r) for r in refs]
    pair_refs = [
        _block_pair_sims.remote(norm_refs[i], norm_refs[j], threshold, i == j)
        for i in range(len(norm_refs))
        for j in range(i, len(norm_refs))
    ]
    return rd.from_arrow_refs(pair_refs)


# few planes → coarse buckets with real collisions; at 2^p buckets the
# expected bucket population is n / 2^p, so p should track log2(n) - 5ish
LSH_PLANES = 6


def lsh_dup_pairs(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 4,
    seed: int = 99,
) -> rd.Dataset:
    """Near-dup pairs via hyperplane-LSH bucketing — the production-scale
    route. ``n_tables`` independent hash tables; in each, every vector is
    hashed to a sign-bucket over ``n_planes`` random hyperplanes and
    replicated into each 1-bit-flip bucket (multiprobe), so a pair whose
    signatures differ in <= 2 bits in ANY table collides somewhere.
    Within-bucket all-pairs cosine keeps sims >= threshold; duplicates
    from multi-bucket collisions are removed by a bucketed distinct.

    Work is sum(bucket_pop^2) over ~n_tables * 2^p buckets: with p
    tracking log2(n) the expected population stays constant, giving a
    near-linear tile count vs ``cosine_dup_pairs``'s O(n^2/2) tiles, at a
    shuffle replication factor of n_tables * (n_planes + 1). Recall < 1
    by construction and degrades toward the threshold boundary (a pair at
    sim ~0.95 is near-certain; at sim ~0.4 each table catches it with
    p~0.6) — measured against the exact engine in tests, not promised."""
    from graphsetintersection_ray.stages.shuffle import distinct_by

    embeddings = embeddings.materialize()
    n = embeddings.count()
    if n == 0:
        return embeddings.map_batches(
            lambda t: pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    if n_planes is None:
        n_planes = max(LSH_PLANES, int(np.log2(n)) - 5)
    sample = embeddings.take(1)
    dim = len(sample[0]["embedding"])
    rng = np.random.default_rng(seed)
    # one (dim, n_planes) slab per table, broadcast once
    planes_ref = ray.put(rng.standard_normal((n_tables, dim, n_planes)))

    def with_buckets(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids, mat = _emb_matrix(t)
        if len(ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "embedding": pa.array([], t["embedding"].type),
                }
            )
        nm = _normalize(mat)
        rows = np.arange(len(ids))
        rep_rows = []
        rep_buckets = []
        for ti in range(n_tables):
            signs = (nm @ pl[ti]) > 0
            sig = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
            base = np.int64(ti) << np.int64(n_planes + 1)
            rep_rows.append(rows)
            rep_buckets.append(base + sig)
            for b in range(n_planes):
                rep_rows.append(rows)
                rep_buckets.append(base + (sig ^ (1 << b)))
        all_rows = np.concatenate(rep_rows)
        emb_list = t["embedding"].combine_chunks()
        return pa.table(
            {
                "vec_id": pa.array(
                    np.tile(ids, n_tables * (n_planes + 1)), pa.int64()
                ),
                "bucket": pa.array(np.concatenate(rep_buckets), pa.int64()),
                "embedding": emb_list.take(pa.array(all_rows, pa.int32())),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        # multiprobe can land the same vector in one bucket several times
        _, first = np.unique(ids, return_index=True)
        ids = ids[first]
        if len(ids) < 2:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        mat = _normalize(
            np.stack(g["embedding"].to_numpy()[first]).astype(np.float64)
        )
        sims = mat @ mat.T
        iu, ju = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids[iu], ids[ju]
        return pa.table(
            {
                "vec_a": pa.array(np.minimum(a, b), pa.int64()),
                "vec_b": pa.array(np.maximum(a, b), pa.int64()),
                "sim": pa.array(
                    round_half_away(sims[iu, ju], 6), pa.float64()
                ),
            }
        )

    from graphsetintersection_ray.stages.shuffle import grouped_apply

    pairs = grouped_apply(
        embeddings.map_batches(with_buckets, batch_format="pyarrow"),
        ["bucket"],
        bucket_pairs,
        out_schema=pa.schema(
            [
                pa.field("vec_a", pa.int64()),
                pa.field("vec_b", pa.int64()),
                pa.field("sim", pa.float64()),
            ]
        ),
    )
    return distinct_by(pairs, ["vec_a", "vec_b", "sim"])


def dup_pairs(
    embeddings: rd.Dataset, threshold: float = 0.95, method: str = "lsh", **kw
) -> rd.Dataset:
    """Embedding near-dup pairs. ``method='lsh'`` (production default) is
    the near-linear LSH-bucketed path; ``method='exact'`` is the O(n^2/2)
    block-pair engine used as the oracle configuration."""
    if method == "lsh":
        return lsh_dup_pairs(embeddings, threshold=threshold, **kw)
    if method == "exact":
        return cosine_dup_pairs(embeddings, threshold=threshold, **kw)
    raise ValueError(f"unknown dup_pairs method: {method!r}")


def _kmeans_cosine(
    sample: np.ndarray, n_cells: int, iters: int, seed: int
) -> np.ndarray:
    """Deterministic spherical k-means on a (rows, dim) sample of
    NORMALIZED vectors: seeded init from sample rows, argmax-cosine
    assignment (ties → lowest cell), mean + renormalize update. Empty
    cells keep their previous centroid. Returns (n_cells, dim)
    normalized centroids."""
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(sample))
    cent = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cent[c] = m / nrm
    return cent


IVF_TRAIN_ROWS = 4096
IVF_KMEANS_ITERS = 8


def ivf_topk(
    embeddings: rd.Dataset,
    query_ids: np.ndarray | list,
    k: int = 5,
    n_cells: int | None = None,
    nprobe: int | None = None,
    seed: int = 99,
) -> rd.Dataset:
    """ANN via an IVF (inverted-file) index — the k-means sibling of
    ``lsh_topk``. Same output schema as brute force; recall < 1 by
    construction, measured in tests.

    Train: spherical k-means centroids on a value-defined sample (rows
    with ``vec_id % stride == 0`` — replayable from the raw table, no
    dependence on block order), driver-side over <= IVF_TRAIN_ROWS rows,
    broadcast once. Index: one map_batches pass assigns every vector to
    its argmax-cosine cell (each non-query vector lives in EXACTLY one
    cell — no multiprobe replication of the corpus, unlike LSH). Search:
    each query is replicated into its ``nprobe`` nearest cells; a
    per-cell groupby computes exact cosines against only that cell's
    vectors; a final per-query merge keeps the global top-k.

    At 100 TB the corpus-side work is one shuffle keyed by cell
    (sum(cell_pop * probing_queries) tile work); n_cells ~ sqrt(n) keeps
    cells worker-heap-sized and the driver holds only the centroid slab."""
    embeddings = embeddings.materialize()
    n = embeddings.count()
    if n_cells is None:
        n_cells = max(4, int(np.sqrt(n)))
    if nprobe is None:
        # 0.7 * n_cells: holds measured recall >= 0.9 even on the isotropic
        # test embeddings (where centroid ranking carries little signal and
        # recall ~ tracks the probed-cell fraction); clustered real-world
        # embeddings reach the same recall at much smaller nprobe — pass it
        # explicitly to trade recall for probe cost.
        nprobe = max(2, int(np.ceil(0.7 * n_cells)))
    nprobe = min(nprobe, n_cells)
    stride = max(1, n // IVF_TRAIN_ROWS)

    def _train_rows(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(vid % stride == 0))

    sample_df = (
        embeddings.map_batches(_train_rows, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")  # canonical row order for the seeded init
    )
    sample = _normalize(
        np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    )
    centroids = _kmeans_cosine(
        sample, n_cells, iters=IVF_KMEANS_ITERS, seed=seed
    )
    cent_ref = ray.put(centroids)
    qset = set(int(q) for q in query_ids)

    def with_cell(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        ids, mat = _emb_matrix(t)
        if len(ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "embedding": pa.array([], t["embedding"].type),
                }
            )
        nm = _normalize(mat)
        sims = nm @ cent.T
        cell = np.argmax(sims, axis=1).astype(np.int64)
        rep_ids = [ids]
        rep_cells = [cell]
        rep_rows = [np.arange(len(ids))]
        # queries probe their nprobe nearest cells (the home cell is the
        # argmax, included by construction)
        q_rows = np.flatnonzero(np.isin(ids, np.fromiter(qset, np.int64)))
        if len(q_rows) and nprobe > 1:
            probe = np.argsort(-sims[q_rows], axis=1, kind="stable")[
                :, 1:nprobe
            ]
            for p in range(probe.shape[1]):
                rep_ids.append(ids[q_rows])
                rep_cells.append(probe[:, p].astype(np.int64))
                rep_rows.append(q_rows)
        emb_list = t["embedding"].combine_chunks()
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(rep_ids), pa.int64()),
                "cell": pa.array(np.concatenate(rep_cells), pa.int64()),
                "embedding": emb_list.take(
                    pa.array(np.concatenate(rep_rows), pa.int32())
                ),
            }
        )

    def search_cell(g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        q_mask = np.isin(ids, list(qset))
        if not q_mask.any() or (~q_mask).sum() == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        qi, qm = ids[q_mask], mat[q_mask]
        ni, nm = ids[~q_mask], mat[~q_mask]
        sims = qm @ nm.T
        kk = min(k, sims.shape[1])
        nq = len(qi)
        # (sim desc, neighbor_id asc) — same total order as the final merge
        q_idx = np.repeat(np.arange(nq), sims.shape[1])
        order = np.lexsort((np.tile(ni, nq), -sims.ravel(), q_idx))
        take = (np.arange(nq)[:, None] * sims.shape[1] + np.arange(kk)).ravel()
        sel = order[take]
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qi, kk), pa.int64()),
                "neighbor_id": pa.array(np.tile(ni, nq)[sel], pa.int64()),
                "sim": pa.array(
                    round_half_away(sims.ravel()[sel], 6), pa.float64()
                ),
            }
        )

    def merge_topk(g: pd.DataFrame) -> pa.Table:
        g = (
            g.drop_duplicates(["query_id", "neighbor_id"])
            .sort_values(["sim", "neighbor_id"], ascending=[False, True])
            .head(k)
        )
        return pa.table(
            {
                "query_id": pa.array(g["query_id"], pa.int64()),
                "neighbor_id": pa.array(g["neighbor_id"], pa.int64()),
                "sim": pa.array(g["sim"].to_numpy(), pa.float64()),
            }
        )

    from graphsetintersection_ray.stages.shuffle import grouped_apply

    return grouped_apply(
        grouped_apply(
            embeddings.map_batches(with_cell, batch_format="pyarrow"),
            ["cell"],
            search_cell,
            out_schema=_TOPK_SCHEMA,
        ),
        ["query_id"],
        merge_topk,
        out_schema=_TOPK_SCHEMA,
        num_buckets=8,
    )


LSH_TOPK_TABLES = 8
LSH_TOPK_PLANES = 8
LSH_TOPK_FLIP_BITS = 2


def lsh_topk(
    embeddings: rd.Dataset,
    query_ids: np.ndarray | list,
    k: int = 5,
    n_planes: int = LSH_TOPK_PLANES,
    n_tables: int = LSH_TOPK_TABLES,
    flip_bits: int = LSH_TOPK_FLIP_BITS,
    seed: int = 99,
) -> rd.Dataset:
    """ANN variant: multi-table random-hyperplane LSH buckets; each query
    searches its bucket in every table, plus all <=``flip_bits``-bit-flip
    probe buckets. Same output schema as brute force; recall < 1 by
    construction — measured in tests AND recorded vs global brute force in
    NOORACLE_CHECKS.json.

    Default tuning (8 tables x 8 planes, 2-bit multiprobe) holds measured
    recall >= 0.9 even on the ISOTROPIC test embeddings (near-random
    cosines, the hardest case for LSH) at the cost of a wide candidate set
    (~60-70%% of the corpus per query there). On clustered real-world
    embeddings the same defaults probe a small corpus fraction — the
    planted-cluster pytest covers that regime. Corpus-side shuffle
    replication is exactly ``n_tables``; query-side is
    ``n_tables * (1 + P + C(P,2))`` rows per query, negligible for
    query-list workloads."""
    embeddings = embeddings.materialize()
    sample = embeddings.take(1)
    dim = len(sample[0]["embedding"])
    rng = np.random.default_rng(seed)
    # one (dim, n_planes) slab per table, broadcast once
    planes = rng.standard_normal((n_tables, dim, n_planes))
    planes_ref = ray.put(planes)

    if not 0 <= flip_bits <= 2:
        raise ValueError(
            f"flip_bits={flip_bits} unsupported: only 0, 1 or 2-bit "
            "multiprobe is implemented"
        )

    def _probe_masks() -> np.ndarray:
        masks = [0]
        if flip_bits >= 1:
            masks += [1 << b for b in range(n_planes)]
        if flip_bits >= 2:
            masks += [
                (1 << i) | (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        return np.asarray(masks, np.int64)

    def with_bucket(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids, mat = _emb_matrix(t)
        nmat = _normalize(mat)
        emb_list = t["embedding"].combine_chunks()
        is_q = np.isin(ids, np.fromiter(qset, np.int64))
        q_rows = np.flatnonzero(is_q)
        masks = _probe_masks()
        rep_ids, rep_buckets, rep_rows = [], [], []
        for ti in range(n_tables):
            signs = (nmat @ pl[ti]) > 0
            sig = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
            base = np.int64(ti) << np.int64(n_planes)
            # corpus rows: one bucket per table
            rep_ids.append(ids)
            rep_buckets.append(base + sig)
            rep_rows.append(np.arange(len(ids)))
            # query rows: every probe bucket beyond the home one
            for m in masks[1:]:
                rep_ids.append(ids[q_rows])
                rep_buckets.append(base + (sig[q_rows] ^ m))
                rep_rows.append(q_rows)
        all_rows = np.concatenate(rep_rows)
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(rep_ids), pa.int64()),
                "bucket": pa.array(np.concatenate(rep_buckets), pa.int64()),
                "embedding": emb_list.take(pa.array(all_rows, pa.int32())),
            }
        )

    qset = set(int(q) for q in query_ids)
    bucketed = embeddings.map_batches(with_bucket, batch_format="pyarrow")

    def search_bucket(g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        q_mask = np.isin(ids, list(qset))
        if not q_mask.any() or (~q_mask).sum() == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        qi, qm = ids[q_mask], mat[q_mask]
        ni, nm = ids[~q_mask], mat[~q_mask]
        sims = qm @ nm.T
        kk = min(k, sims.shape[1])
        top = np.argsort(-sims, axis=1)[:, :kk]
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qi, kk), pa.int64()),
                "neighbor_id": pa.array(ni[top.ravel()], pa.int64()),
                "sim": pa.array(
                    round_half_away(np.take_along_axis(sims, top, axis=1).ravel(), 6),
                    pa.float64(),
                ),
            }
        )

    def merge_topk(g: pd.DataFrame) -> pa.Table:
        g = (
            g.drop_duplicates(["query_id", "neighbor_id"])
            .sort_values(["sim", "neighbor_id"], ascending=[False, True])
            .head(k)
        )
        return pa.table(
            {
                "query_id": pa.array(g["query_id"], pa.int64()),
                "neighbor_id": pa.array(g["neighbor_id"], pa.int64()),
                "sim": pa.array(g["sim"].to_numpy(), pa.float64()),
            }
        )

    from graphsetintersection_ray.stages.shuffle import grouped_apply

    return grouped_apply(
        grouped_apply(
            bucketed, ["bucket"], search_bucket, out_schema=_TOPK_SCHEMA
        ),
        ["query_id"],
        merge_topk,
        out_schema=_TOPK_SCHEMA,
        num_buckets=8,
    )


# --------------------------------------------------------------------------
# Distributed spherical k-means (topic clustering over embeddings)
# --------------------------------------------------------------------------

KMEANS_ITERS = 10


def kmeans_clusters(
    embeddings: rd.Dataset, k: int = 8, iters: int = KMEANS_ITERS
) -> rd.Dataset:
    """(vec_id, cluster): Lloyd's spherical k-means over the full corpus
    — the topic-clustering stage of a training-data pipeline.

    Deterministic and exactly replayable: init = the k smallest-vec_id
    vectors (value-defined, independent of block order), assignment =
    argmax cosine with ties to the lowest cluster, update = renormalized
    mean; empty clusters keep their previous centroid.

    Scale shape: per iteration ONE streaming pass — centroids broadcast
    via ``ray.put`` (k×dim doubles), each batch emits pre-aggregated
    per-cluster (count, vector-sum) partials, and the driver reduces
    k×#blocks small rows to the next centroid slab. No shuffle of the
    corpus, ever; the final labeling is one more map pass."""
    embeddings = embeddings.materialize()

    def _smallest(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) <= k:
            return t.select(["vec_id", "embedding"])
        keep = np.argsort(ids, kind="stable")[:k]
        return t.select(["vec_id", "embedding"]).take(pa.array(np.sort(keep)))

    seed_df = (
        embeddings.map_batches(_smallest, batch_format="pyarrow")
        .to_pandas()
        .nsmallest(k, "vec_id")
        .sort_values("vec_id")
    )
    cent = _normalize(np.stack(seed_df["embedding"].to_numpy()).astype(np.float64))
    kk = len(cent)

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            ids, mat = _emb_matrix(t)
            if len(ids) == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            mat = _normalize(mat)
            assign = np.argmax(mat @ c.T, axis=1)
            sums = np.zeros((kk, mat.shape[1]), np.float64)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=kk)
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(nz, pa.int64()),
                    "n": pa.array(counts[nz], pa.int64()),
                    "vsum": pa.array(list(sums[nz]), pa.list_(pa.float64())),
                }
            )

        agg = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
        new_cent = cent.copy()
        for c_id, grp in agg.groupby("cluster"):
            s = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
            nrm = np.linalg.norm(s)
            if nrm > 0:
                new_cent[int(c_id)] = s / nrm
        cent = new_cent

    cent_ref = ray.put(cent)

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, mat = _emb_matrix(t)
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64())}
            )
        assign = np.argmax(_normalize(mat) @ c.T, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
            }
        )

    return embeddings.map_batches(label, batch_format="pyarrow")


def centroid_sim(embs: rd.Dataset) -> rd.Dataset:
    """(vec_id, label, centroid_sim): cosine of every vector to its own
    label's centroid — the embedding-space cluster-coherence / outlier
    signal (low sim = the vector sits far from its labeled cluster).

    EXACT and reduction-order-free: embeddings are quantized to integer
    MILLI-units (round(x*1000), never a .5 tie because k/1000 is not
    dyadic), the centroid direction is the per-label integer SUM vector
    (cosine is scale-invariant, so no division by count), and dot/norm
    sums stay far below 2^53 — both this implementation and the SQL
    oracle compute identical integers, then one identical double
    expression dot/(sqrt(n1)*sqrt(n2)).

    Scale shape: pass 1 emits per-block (label, count=1 row of summed
    int vectors) partials — bounded by labels x blocks, combined on the
    driver and broadcast via ``ray.put``; pass 2 is map-only."""

    def label_sums(t: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(t)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        vi = np.round(mat.astype(np.float64) * 1000.0).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), vi.shape[1]), np.int64)
        np.add.at(sums, inv, vi)
        offsets = np.arange(len(uniq) + 1, dtype=np.int32) * vi.shape[1]
        return pa.table(
            {
                "label": pa.array(uniq, pa.int64()),
                "csum": pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(sums.ravel(), pa.int64())
                ),
            }
        )

    parts = embs.map_batches(label_sums, batch_format="pyarrow").to_pandas()
    cent: dict[int, np.ndarray] = {}
    for lbl, cs in zip(parts["label"], parts["csum"]):
        v = np.asarray(cs, np.int64)
        cent[int(lbl)] = cent.get(int(lbl), 0) + v
    # exact arbitrary-precision norm: int64 np.dot would silently wrap —
    # the norm grows as dim*(N*1000*max|v|)^2, past 2^63 around ~10^7
    # vectors per label. Python ints match the oracle's HUGEINT sum
    # exactly before the single double conversion.
    cent_n2 = {
        k: float(sum(int(x) * int(x) for x in v)) for k, v in cent.items()
    }
    cent_ref = ray.put((cent, cent_n2))

    def sims(t: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(t)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        vi = np.round(mat.astype(np.float64) * 1000.0).astype(np.int64)
        cmap, n2map = ray.get(cent_ref)
        out = np.empty(len(ids), np.float64)
        for lbl in np.unique(labels):
            m = labels == lbl
            c = cmap[int(lbl)]
            dots = vi[m] @ c
            n1 = np.einsum("ij,ij->i", vi[m], vi[m]).astype(np.float64)
            denom = np.sqrt(n1) * np.sqrt(n2map[int(lbl)])
            safe = np.where(denom > 0, denom, 1.0)
            out[m] = np.where(
                denom > 0, dots.astype(np.float64) / safe, 0.0
            )
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "label": pa.array(labels, pa.int64()),
                "centroid_sim": pa.array(
                    round_half_away(out, 6), pa.float64()
                ),
            }
        )

    return embs.map_batches(sims, batch_format="pyarrow")
