"""Tests for dedup / similarity / text / multimodal stages."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _docs_with_planted_dups():
    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "pack my box with five dozen liquor jugs before the night falls",
        "how vexingly quick daft zebras jump over fences in the morning sun",
        "completely unrelated text about distributed systems and arrow tables",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": i, "text": t})
    # near-dup of doc 0 (one word changed) and exact dup of doc 1
    rows.append({"doc_id": 10, "text": base[0].replace("lazy", "sleepy")})
    rows.append({"doc_id": 11, "text": base[1]})
    return pd.DataFrame(rows)


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(_docs_with_planted_dups())


def test_exact_dedup(docs_ds):
    from graphsetintersection_ray.stages.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas().sort_values("doc_id")
    assert out.doc_id.tolist() == [0, 1, 2, 3, 10]  # 11 collapsed into 1


def test_jaccard_and_minhash_agree(docs_ds):
    from graphsetintersection_ray.stages.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    exact = jaccard_pairs(docs_ds, threshold=0.5).to_pandas()
    exact_pairs = set(zip(exact.doc_a, exact.doc_b))
    assert (0, 10) in exact_pairs  # planted near-dup
    assert (1, 11) in exact_pairs  # exact dup
    lsh = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
    lsh_pairs = set(zip(lsh.doc_a, lsh.doc_b))
    # LSH-verified output is a subset of exact; with 16 bands and
    # jaccard >= 0.5 the planted pairs must be recalled
    assert lsh_pairs <= exact_pairs
    assert {(0, 10), (1, 11)} <= lsh_pairs


def test_minhash_recall_on_real_docs(ray_session):
    """On the sf0.001 documents table, LSH recall vs exact jaccard >= 0.9."""
    import ray.data as rd

    from graphsetintersection_ray.stages.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exact = jaccard_pairs(docs, threshold=0.5).to_pandas()
    lsh = minhash_lsh_pairs(docs, threshold=0.5).to_pandas()
    exact_pairs = set(zip(exact.doc_a, exact.doc_b))
    lsh_pairs = set(zip(lsh.doc_a, lsh.doc_b))
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) >= 0.9 * len(exact_pairs)


def test_jaccard_max_df_skew_guard(ray_session):
    """A hub shingle shared by every doc is dropped under max_df: pairs
    that only share the hub disappear; genuinely similar pairs stay."""
    import ray.data as rd

    from graphsetintersection_ray.stages.dedup import hot_shingles, jaccard_pairs

    hub = "common hub phrase"
    rows = [
        {"doc_id": 0, "text": f"{hub} alpha beta gamma delta"},
        {"doc_id": 1, "text": f"{hub} alpha beta gamma delta"},   # true dup of 0
        {"doc_id": 2, "text": f"{hub} epsilon zeta eta theta"},
        {"doc_id": 3, "text": f"{hub} iota kappa lambda mu"},
    ]
    docs = rd.from_pandas(pd.DataFrame(rows))
    exact = jaccard_pairs(docs, threshold=0.1, max_df=None).to_pandas()
    capped = jaccard_pairs(docs, threshold=0.1, max_df=3).to_pandas()
    exact_pairs = set(zip(exact.doc_a, exact.doc_b))
    capped_pairs = set(zip(capped.doc_a, capped.doc_b))
    assert capped_pairs <= exact_pairs
    assert (0, 1) in capped_pairs          # true dup survives the cap
    assert len(capped_pairs) < len(exact_pairs)  # hub-only pairs dropped
    hot = hot_shingles(docs, max_df=3).to_pandas()
    assert (hot.df > 3).all() and len(hot) > 0


def test_simhash_detects_near_dup(docs_ds):
    from graphsetintersection_ray.stages.dedup import simhash_near_pairs

    out = simhash_near_pairs(docs_ds, max_hamming=12).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (1, 11) in pairs  # exact dup: hamming 0
    ham = dict(zip(zip(out.doc_a, out.doc_b), out.hamming))
    assert ham[(1, 11)] == 0


def test_knn_brute_force_vs_numpy(ray_session):
    import ray.data as rd

    from graphsetintersection_ray.stages.similarity import brute_force_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    out = brute_force_topk(emb, query_ids=[0, 1, 2], k=3).to_pandas()
    df = emb.to_pandas()
    ids = df.vec_id.to_numpy()
    mat = np.stack(df.embedding.to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in [0, 1, 2]:
        qv = mat[ids == q][0]
        mask = ~np.isin(ids, [0, 1, 2])
        sims = mat[mask] @ qv
        order = np.lexsort((ids[mask], -sims))[:3]
        expect = ids[mask][order].tolist()
        got = out[out.query_id == q].sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).neighbor_id.tolist()
        assert got == expect, q


def test_lsh_topk_recall_on_clusters(ray_session):
    """LSH ANN recall is only meaningful on data with locality: plant 20
    clusters, query one member per cluster, expect >= 60% of the
    brute-force top-5 to be found via bucket+multiprobe search."""
    import ray.data as rd

    from graphsetintersection_ray.stages.similarity import brute_force_topk, lsh_topk

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((20, 32))
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(10):
            rows.append(
                {
                    "vec_id": vid,
                    "embedding": (centers[c] + 0.05 * rng.standard_normal(32))
                    .astype(np.float32)
                    .tolist(),
                }
            )
            vid += 1
    emb = rd.from_pandas(pd.DataFrame(rows))
    qids = [c * 10 for c in range(20)]
    bf = brute_force_topk(emb, query_ids=qids, k=5).to_pandas()
    ann = lsh_topk(emb, query_ids=qids, k=5).to_pandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    ann_set = set(zip(ann.query_id, ann.neighbor_id))
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall >= 0.6, recall


def test_ivf_topk_recall_on_clusters(ray_session):
    """IVF ANN on the same planted-cluster fixture as the LSH test:
    k-means cells capture cluster locality, so the cell+nprobe search
    should recover >= 60% of the brute-force top-5. Also deterministic:
    two runs return identical tables (seeded sample-defined training)."""
    import ray.data as rd

    from graphsetintersection_ray.stages.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((20, 32))
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(10):
            rows.append(
                {
                    "vec_id": vid,
                    "embedding": (centers[c] + 0.05 * rng.standard_normal(32))
                    .astype(np.float32)
                    .tolist(),
                }
            )
            vid += 1
    emb = rd.from_pandas(pd.DataFrame(rows))
    qids = [c * 10 for c in range(20)]
    bf = brute_force_topk(emb, query_ids=qids, k=5).to_pandas()
    ann = ivf_topk(emb, query_ids=qids, k=5).to_pandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    ann_set = set(zip(ann.query_id, ann.neighbor_id))
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall >= 0.6, recall
    again = (
        ivf_topk(emb, query_ids=qids, k=5)
        .to_pandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    first = ann.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(first, again)


def test_token_count_bpe_matches_duckdb(ray_session):
    """The BPE-ish pre-tokenizer count must agree between pandas/re and
    DuckDB/RE2 on adversarial strings (contractions, digit runs, mixed
    punctuation, repeated whitespace, empties) — the portability claim
    behind the SQL oracle."""
    import duckdb
    import ray.data as rd

    from graphsetintersection_ray.stages.text import (
        BPE_TOKEN_RE,
        WS_TOKEN_RE,
        token_count_bpe,
    )

    texts = [
        "don't stop, it's 2x42 tokens!",
        "I'll we've they're he'd I'm that's",
        "  leading and   trailing  ",
        "",
        "no-punct",
        "a1b2c3",
        "tabs\tand\nnewlines\r\nmix",
        "... !!! ??? '' ' lone quotes",
        "snake_case under_scores",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        rd.from_pandas(df)
        .map_batches(token_count_bpe, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    bpe_sql = BPE_TOKEN_RE.replace("'", "''")
    want = con.execute(
        f"SELECT doc_id, len(regexp_extract_all(text, '{bpe_sql}')) AS n_tokens, "
        f"len(regexp_extract_all(text, '{WS_TOKEN_RE}')) AS n_ws_tokens "
        "FROM documents ORDER BY doc_id"
    ).df()
    assert got.n_tokens.tolist() == want.n_tokens.tolist()
    assert got.n_ws_tokens.tolist() == want.n_ws_tokens.tolist()
    # sanity on semantics: "don't" splits into [don]["'t"], whitespace is
    # its own token stream position
    assert got.n_tokens[3] == 0 and got.n_ws_tokens[3] == 0


def test_lang_id_heuristic(ray_session):
    import ray.data as rd

    from graphsetintersection_ray.stages.text import lang_id

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "the cat and the dog is here",
                "der hund und die katze ist da",
                "el perro y los gatos es aqui",
                "le chien et la vache est ici",
                "xyzzy plugh qwerty",
            ],
        }
    )
    out = (
        rd.from_pandas(df)
        .map_batches(lang_id, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.lang_pred.tolist() == ["en", "de", "es", "fr", "und"]


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from graphsetintersection_ray.stages.multimodal import (
        DecodeStage,
        FeatureExtract,
        MediaMetadata,
        attach_binary_payload,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    payloads = attach_binary_payload(docs)
    meta = payloads.map_batches(MediaMetadata, batch_format="pyarrow",
                                concurrency=1).to_pandas()
    assert len(meta) == 500 and (meta.n_bytes > 0).all()

    # real decode is stubbed: must raise, not silently fake
    with pytest.raises(Exception):
        payloads.map_batches(
            DecodeStage, batch_format="pyarrow", concurrency=1
        ).materialize()

    frames = payloads.limit(32).map_batches(
        DecodeStage, fn_constructor_kwargs=dict(fake=True),
        batch_format="pyarrow", batch_size=8, concurrency=1,
    )
    feats = frames.map_batches(
        FeatureExtract, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert len(feats) == 32
    assert all(len(f) == 4 for f in feats.feature)
    # deterministic: same payload -> same fake frame features
    feats2 = payloads.limit(32).map_batches(
        DecodeStage, fn_constructor_kwargs=dict(fake=True),
        batch_format="pyarrow", batch_size=8, concurrency=1,
    ).map_batches(FeatureExtract, batch_format="pyarrow", concurrency=1).to_pandas()
    a = feats.sort_values("doc_id").feature.apply(list).tolist()
    b = feats2.sort_values("doc_id").feature.apply(list).tolist()
    assert a == b


def test_multimodal_resize_and_frame_sample(ray_session):
    """ResizeStage mean-pools decoded frames exactly (numpy oracle per
    row); FrameSampleStage keeps every k-th frame with ragged per-row
    frame counts — both as actor-pool map_batches stages."""
    import ray.data as rd

    from graphsetintersection_ray.stages.multimodal import (
        DecodeStage,
        FrameSampleStage,
        ResizeStage,
        attach_binary_payload,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    frames = attach_binary_payload(docs).limit(16).map_batches(
        DecodeStage, fn_constructor_kwargs=dict(fake=True),
        batch_format="pyarrow", batch_size=8, concurrency=1,
    ).materialize()
    fdf = frames.to_pandas()
    resized = frames.map_batches(
        ResizeStage,
        fn_constructor_kwargs=dict(in_shape=(8, 8), out_shape=(4, 4)),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    merged = fdf.merge(resized, on="doc_id", suffixes=("_in", "_out"))
    assert len(merged) == 16
    for _, row in merged.iterrows():
        want = (
            np.asarray(row.frame_in, np.float32)
            .reshape(8, 8)
            .reshape(4, 2, 4, 2)
            .mean(axis=(1, 3), dtype=np.float32)
            .ravel()
        )
        np.testing.assert_allclose(
            np.asarray(row.frame_out, np.float32), want, rtol=1e-6
        )

    # ragged video rows: doc i has i+1 frames of size 3
    # (explicit list<float32> column — the stage's documented schema)
    import pyarrow as pa

    flat, offs = [], [0]
    for i in range(6):
        nf = i + 1
        flat.append(np.arange(nf * 3, dtype=np.float32) + 100 * i)
        offs.append(offs[-1] + nf * 3)
    vids = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "frames": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()),
                    pa.array(np.concatenate(flat), pa.float32()),
                ),
                "n_frames": pa.array(range(1, 7), pa.int32()),
            }
        )
    )
    out = vids.map_batches(
        FrameSampleStage, fn_constructor_kwargs=dict(every_k=2),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas().sort_values("doc_id")
    for _, row in out.iterrows():
        i = int(row.doc_id)
        nf = i + 1
        full = (np.arange(nf * 3, dtype=np.float32) + 100 * i).reshape(nf, 3)
        want = full[::2]
        assert int(row.n_frames) == len(want)
        np.testing.assert_array_equal(
            np.asarray(row.frames, np.float32).reshape(-1, 3), want
        )


def test_cosine_dup_pairs_interleaved_block_ids(ray_session):
    """Cross-block tiles must not drop pairs when vec_ids are NOT
    non-decreasing across block order (round-2 ADVICE high finding):
    ids are deliberately scrambled so planted dups straddle blocks in
    both orders, and the result is checked against a numpy all-pairs
    oracle."""
    import ray.data as rd

    from graphsetintersection_ray.stages.similarity import cosine_dup_pairs

    rng = np.random.default_rng(7)
    n, dim = 40, 16
    mat = rng.standard_normal((n, dim))
    for a, b in [(30, 1), (35, 2), (20, 3)]:  # dups across distant ids
        mat[b] = mat[a] + 0.01 * rng.standard_normal(dim)
    ids = rng.permutation(n)
    df = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [mat[i].astype(np.float32).tolist() for i in ids],
        }
    )
    got = cosine_dup_pairs(
        rd.from_pandas(df), threshold=0.8, block_rows=8
    ).to_pandas()
    norm32 = mat.astype(np.float32).astype(np.float64)
    norm = norm32 / np.linalg.norm(norm32, axis=1, keepdims=True)
    sims = norm @ norm.T
    iu, ju = np.nonzero(np.triu(sims >= 0.8, k=1))
    expect = set(zip(iu.tolist(), ju.tolist()))
    got_pairs = set(zip(got.vec_a.tolist(), got.vec_b.tolist()))
    assert got_pairs == expect
    assert {(1, 30), (2, 35), (3, 20)} <= got_pairs


def test_lsh_dup_pairs_vs_exact_engine(ray_session):
    """The production LSH dup-pairs path against the exact block-pair
    engine on the fixture embeddings: strict subset, sims identical on
    recovered pairs, and recall >= 0.9 even though every fixture pair
    sits in the marginal sim 0.40-0.51 band (measured 0.97 with 4
    tables; at production thresholds ~0.95 recall is near-certain)."""
    import ray.data as rd

    from graphsetintersection_ray.stages.similarity import dup_pairs

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    exact = dup_pairs(emb, threshold=0.4, method="exact").to_pandas()
    lsh = dup_pairs(emb, threshold=0.4, method="lsh").to_pandas()
    e = set(zip(exact.vec_a, exact.vec_b))
    got = set(zip(lsh.vec_a, lsh.vec_b))
    assert got <= e
    assert len(got & e) >= 0.9 * len(e)
    es = dict(zip(zip(exact.vec_a, exact.vec_b), exact.sim))
    ls = dict(zip(zip(lsh.vec_a, lsh.vec_b), lsh.sim))
    assert all(es[k] == ls[k] for k in got)


def test_lsh_dup_pairs_high_sim_recall(ray_session):
    """At real dedup thresholds (planted sim ~0.999 dups) LSH recall is
    total: every planted pair is recovered."""
    import ray.data as rd

    from graphsetintersection_ray.stages.similarity import dup_pairs

    rng = np.random.default_rng(11)
    rows = []
    planted = []
    vid = 0
    for c in range(30):
        base = rng.standard_normal(32)
        rows.append({"vec_id": vid, "embedding": base.astype(np.float32).tolist()})
        dup = base + 0.01 * rng.standard_normal(32)
        rows.append({"vec_id": vid + 1, "embedding": dup.astype(np.float32).tolist()})
        planted.append((vid, vid + 1))
        vid += 2
    emb = rd.from_pandas(pd.DataFrame(rows))
    out = dup_pairs(emb, threshold=0.95, method="lsh").to_pandas()
    got = set(zip(out.vec_a, out.vec_b))
    assert set(planted) <= got


def test_pair_components_chain_and_clusters(ray_session):
    """Driver union-find CC over an adversarial pair graph: a long chain
    (worst case for naive min-propagation), a star, a triangle, and an
    isolated pair — cluster label must be the component minimum."""
    import ray.data as rd
    from graphsetintersection_ray.stages.dedup import pair_components

    pairs = []
    pairs += [(i + 1, i) for i in range(100, 120)]      # chain 100..120
    pairs += [(7, k) for k in (200, 201, 202, 203)]     # star rooted at 7
    pairs += [(300, 301), (301, 302), (300, 302)]       # triangle
    pairs += [(400, 401)]                               # lone pair
    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"]).sample(
        frac=1.0, random_state=7
    )
    out = (
        pair_components(rd.from_pandas(df), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out.doc_id, out.cluster))
    for v in range(100, 121):
        assert got[v] == 100
    for v in (7, 200, 201, 202, 203):
        assert got[v] == 7
    for v in (300, 301, 302):
        assert got[v] == 300
    assert got[400] == 400 and got[401] == 400
    assert len(out) == 21 + 5 + 3 + 2


def test_pair_components_star_rounds_match_driver(ray_session):
    """The at-scale large-star/small-star path (forced with
    driver_max_pairs=0) must equal the driver union-find on a graph with
    a chain (multi-round convergence), a star, and a lone pair."""
    import ray.data as rd
    from graphsetintersection_ray.stages.dedup import pair_components

    pairs = [(i + 1, i) for i in range(50, 58)]
    pairs += [(9, k) for k in (70, 71, 72)]
    pairs += [(80, 81)]
    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"]).sample(
        frac=1.0, random_state=3
    )
    ds = rd.from_pandas(df)
    drv = pair_components(ds, num_buckets=4).to_pandas()
    dist = pair_components(
        ds, num_buckets=4, driver_max_pairs=0
    ).to_pandas()
    drv = drv.sort_values("doc_id").reset_index(drop=True)
    dist = dist.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(drv, dist)


def test_near_dedup_survivors(docs_ds):
    """Survivor set = canonical doc per near-dup cluster + unpaired docs,
    on the planted-duplicate fixture, via both the broadcast filter and
    the forced distributed anti-join."""
    from graphsetintersection_ray.stages.dedup import jaccard_pairs, near_dedup

    pairs = jaccard_pairs(docs_ds, threshold=0.5, max_df=None)
    kept = near_dedup(docs_ds, pairs).to_pandas().sort_values("doc_id")
    # clusters: {0,10} near-dup, {1,11} exact dup -> keep 0,1,2,3
    assert kept.doc_id.tolist() == [0, 1, 2, 3]

    kept2 = (
        near_dedup(docs_ds, pairs, broadcast_max=0)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert kept2.doc_id.tolist() == [0, 1, 2, 3]
    assert set(kept2.columns) == set(kept.columns)


def test_kmeans_recovers_planted_clusters(ray_session):
    """Distributed spherical k-means on well-separated planted clusters:
    assignments must recover the planted partition (up to relabeling)
    and be deterministic across runs."""
    import ray.data as rd
    from graphsetintersection_ray.stages.similarity import kmeans_clusters

    rng = np.random.default_rng(42)
    centers = np.eye(4, 16)  # 4 orthogonal cluster directions
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + 0.05 * rng.standard_normal(16)
        rows.append({"vec_id": i, "embedding": v.astype(np.float64).tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows))

    out = kmeans_clusters(ds, k=4).to_pandas().sort_values("vec_id")
    planted = out.vec_id.to_numpy() % 4
    got = out.cluster.to_numpy()
    # one-to-one relabeling: each planted cluster maps to exactly one
    # k-means cluster and vice versa
    mapping = {}
    for p, g in zip(planted, got):
        assert mapping.setdefault(p, g) == g
    assert len(set(mapping.values())) == 4

    out2 = kmeans_clusters(ds, k=4).to_pandas().sort_values("vec_id")
    assert out.cluster.tolist() == out2.cluster.tolist()


def test_stratified_sample_equalizes_skewed_strata(ray_session):
    """Hot stratum thinned to ~target, rare stratum kept whole, selection
    value-defined (key-modulus) so block order can't change the sample."""
    import ray.data as rd

    from graphsetintersection_ray.stages.streaming import stratified_sample

    df = pd.DataFrame(
        {
            "event_id": np.arange(10_000, dtype=np.int64),
            "event_type": ["hot"] * 9_900 + ["rare"] * 100,
        }
    )
    out = stratified_sample(
        rd.from_pandas(df).repartition(8), target_per_stratum=500
    ).to_pandas()
    by = out.groupby("event_type").size()
    # stride for hot = ceil(9900/500) = 20 -> 495 rows; rare stride 1 -> all 100
    assert by["hot"] == 495
    assert by["rare"] == 100
    # replayable: the kept hot keys are exactly the multiples of 20
    hot = np.sort(out[out.event_type == "hot"].event_id.to_numpy())
    assert (hot % 20 == 0).all()


def test_token_quantiles_matches_sorted_definition(ray_session):
    """quantile_disc semantics: value at sorted index ceil(q*n)-1 per lang."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import token_quantiles

    rng = np.random.default_rng(7)
    texts = [
        " ".join(["the"] * int(k)) for k in rng.integers(1, 40, size=200)
    ]
    df = pd.DataFrame({"doc_id": np.arange(200), "text": texts})
    out = (
        token_quantiles(rd.from_pandas(df).repartition(4))
        .to_pandas()
        .set_index("q")
    )
    # all-"the" docs are English; token count = word count
    n_tok = np.sort(df.text.str.split().str.len().to_numpy())
    assert set(out.index) == {0.25, 0.5, 0.9}
    for q in (0.25, 0.5, 0.9):
        expect = int(n_tok[int(np.ceil(q * len(n_tok))) - 1])
        assert int(out.loc[q, "n_tokens"]) == expect


def test_decontaminate_removes_benchmark_content(ray_session):
    """Benchmark docs AND their verbatim copies are dropped, broadcast
    and distributed anti-join paths agree."""
    import ray.data as rd

    from graphsetintersection_ray.stages.dedup import decontaminate

    # doc 0 is a benchmark doc (0 % 5 == 0); doc 7 copies its content
    texts = {
        0: "held out eval question about arithmetic",
        1: "ordinary web text one",
        2: "ordinary web text two",
        3: "ordinary web text three",
        4: "ordinary web text four",
        6: "ordinary web text six",
        7: "held out eval question about arithmetic",  # leak of doc 0
        8: "ordinary web text eight",
    }
    df = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    )
    docs = rd.from_pandas(df).repartition(3)
    out = decontaminate(docs, benchmark_mod=5).to_pandas()
    # 0 and 5 are benchmark ids (5 absent); 0 and its copy 7 must go
    assert set(out.doc_id) == {1, 2, 3, 4, 6, 8}
    # forced-zero broadcast threshold -> distributed bucket anti-join
    out2 = decontaminate(
        docs, benchmark_mod=5, broadcast_max=0, num_buckets=4
    ).to_pandas()
    assert set(out2.doc_id) == set(out.doc_id)
    assert sorted(out2.fp) == sorted(out.fp)


def test_top_per_lang_partial_topk_is_exact(ray_session):
    """Per-block partial top-k union contains the global top-k: result
    equals a direct single-partition computation under any blocking."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import top_per_lang

    rng = np.random.default_rng(3)
    texts = []
    for i in range(120):
        lang_word = ["the and of", "der und die", "el la de"][i % 3]
        filler = " ".join(["word"] * int(rng.integers(1, 120)))
        texts.append(f"{lang_word} {filler}")
    df = pd.DataFrame({"doc_id": np.arange(120), "text": texts})
    many = top_per_lang(rd.from_pandas(df).repartition(10), k=5).to_pandas()
    one = top_per_lang(rd.from_pandas(df), k=5).to_pandas()
    key = ["lang_pred", "rk"]
    assert many.sort_values(key).reset_index(drop=True).equals(
        one.sort_values(key).reset_index(drop=True)
    )
    assert (many.groupby("lang_pred").rk.max() <= 5).all()


def test_ngram_counts_cross_batch_and_boundaries(ray_session):
    """Bigrams never span documents; counts aggregate across blocks;
    the top-k cut uses the deterministic (n DESC, bigram ASC) order."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import ngram_counts

    df = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "a b c",
                "b c d",
                "c a B",  # case-folded: "c a", "a b"
                "x",      # no bigram
                "",       # empty
                "a b",
            ],
        }
    )
    out = (
        ngram_counts(rd.from_pandas(df).repartition(4), top=3)
        .to_pandas()
        .set_index("bigram")["n"]
    )
    # full counts: a-b:3, b-c:2, c-a:1, c-d:1, x none
    assert list(out.index) == ["a b", "b c", "c a"]
    assert out["a b"] == 3 and out["b c"] == 2 and out["c a"] == 1


def test_repetition_ratio_values(ray_session):
    """rep_ratio = 1 - distinct/total bigrams per doc; <2-token docs
    excluded; blocks don't change per-doc values."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import repetition_ratio

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b a b a b", "x y z", "w", ""],
        }
    )
    out = (
        rd.from_pandas(df)
        .repartition(3)
        .map_batches(repetition_ratio, batch_format="pandas")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1]
    assert out.loc[0, "n_bigrams"] == 5 and out.loc[0, "n_distinct"] == 2
    assert abs(out.loc[0, "rep_ratio"] - 0.6) < 1e-9
    assert out.loc[1, "rep_ratio"] == 0.0


def test_curation_filter_composes_signals(ray_session):
    """Keeps only English docs above the quality floor and below the
    repetition ceiling; short docs are rejected by quality."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import CurationFilter

    good = "the and of is " + " ".join(f"word{i}" for i in range(120))
    repetitive = "the and of is " + "spam ham " * 80
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                good,                       # keep
                repetitive,                 # rejected: repetition
                "der und die ist " + good,  # mixed-language; outcome not asserted
                "the",                      # rejected: too short (quality)
            ],
        }
    )
    out = (
        rd.from_pandas(df)
        .map_batches(CurationFilter, batch_format="pandas", concurrency=1)
        .to_pandas()
    )
    assert 0 in set(out.doc_id)
    assert 1 not in set(out.doc_id)
    assert 3 not in set(out.doc_id)
    assert (out.lang_pred == "en").all()
    assert (out.quality >= 0.3).all() and (out.rep_ratio <= 0.05).all()


def test_grouped_apply_string_keys_and_empty_buckets(ray_session):
    """grouped_apply: equal keys co-locate (group fn sees whole groups),
    empty buckets yield typed empty tables, output equals a pandas
    reference groupby."""
    import pyarrow as pa
    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import grouped_apply

    rng = np.random.default_rng(11)
    keys = rng.choice(list("abcde"), size=300)
    vals = rng.integers(0, 100, size=300)
    df = pd.DataFrame({"k": keys, "x": vals})

    def per_group(g: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "k": pa.array([g["k"].iloc[0]], pa.string()),
                "s": pa.array([int(g["x"].sum())], pa.int64()),
                "n": pa.array([len(g)], pa.int64()),
            }
        )

    out = (
        grouped_apply(
            rd.from_pandas(df).repartition(7),
            ["k"],
            per_group,
            out_schema=pa.schema(
                [
                    pa.field("k", pa.string()),
                    pa.field("s", pa.int64()),
                    pa.field("n", pa.int64()),
                ]
            ),
            num_buckets=16,  # > 5 keys -> some buckets MUST be empty
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = (
        df.groupby("k")["x"]
        .agg(["sum", "size"])
        .reset_index()
        .rename(columns={"sum": "s", "size": "n"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out.k) == list(ref.k)
    assert list(out.s) == list(ref.s.astype(int))
    assert list(out.n) == list(ref.n.astype(int))


def test_arrow_shingle_table_equals_pandas_reference():
    """The Arrow-kernel shingle explode (the hot map stage feeding
    jaccard/minhash) must emit exactly the pandas reference's distinct
    (doc_id, shingle) set — including empty, whitespace-only and
    short (<w tokens) documents."""
    import pyarrow as pa

    from graphsetintersection_ray.stages.dedup import (
        _exploded_shingles,
        shingle_table,
    )

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    extra = pd.DataFrame(
        {
            "doc_id": [10**9 + 1, 10**9 + 2, 10**9 + 3, 10**9 + 4],
            "text": ["", "   ", "Hello", "ONE two-Three  four"],
        }
    )
    for c in docs.columns:
        if c not in extra.columns:
            extra[c] = None
    docs = pd.concat([docs, extra[docs.columns]], ignore_index=True)
    got = (
        shingle_table(
            pa.Table.from_pandas(
                docs[["doc_id", "text"]], preserve_index=False
            )
        )
        .to_pandas()
        .sort_values(["doc_id", "shingle"])
        .reset_index(drop=True)
    )
    want = (
        _exploded_shingles(docs)
        .astype({"doc_id": "int64"})
        .sort_values(["doc_id", "shingle"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[["doc_id", "shingle"]])


def test_sized_buckets_flat_per_bucket_memory():
    """Bucket count derives from the row estimate: fixed-cost-bound
    small band (8..64 buckets of ~rows_per_bucket rows), then linear
    growth so per-bucket rows never exceed the target at ANY scale —
    the round-3 fixed num_buckets=64 default made bucket size grow
    with the corpus."""
    from graphsetintersection_ray.stages.shuffle import (
        TARGET_ROWS_PER_BUCKET,
        sized_buckets,
    )

    assert sized_buckets(0) == 8
    assert sized_buckets(100_000) == 8
    assert sized_buckets(5_000_000) == 5_000_000 // 150_000 + 8
    assert sized_buckets(20_000_000) == max(64, 20_000_000 // TARGET_ROWS_PER_BUCKET)
    for rows in (10**9, 10**11, 10**13):
        nb = sized_buckets(rows)
        assert nb == rows // TARGET_ROWS_PER_BUCKET
        assert rows / nb <= 1.001 * TARGET_ROWS_PER_BUCKET


def test_bucket_count_invariance(ray_session):
    """distinct_by / sum_by / counted_groups give identical results at a
    forced-tiny bucket target and at the default fan-out (bucket count
    is semantics-free)."""
    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import (
        counted_groups,
        distinct_by,
        sum_by,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=2000),
            "x": rng.integers(0, 9, size=2000),
        }
    )
    ds = rd.from_pandas(df).repartition(6)
    for nb_a, nb_b in ((64, 3), (64, 1)):
        a = distinct_by(ds, ["k"], num_buckets=nb_a).to_pandas()
        b = distinct_by(ds, ["k"], num_buckets=nb_b).to_pandas()
        assert sorted(a.k) == sorted(b.k)
        sa = sum_by(ds, ["k"], "x", num_buckets=nb_a).to_pandas().sort_values("k")
        sb = sum_by(ds, ["k"], "x", num_buckets=nb_b).to_pandas().sort_values("k")
        assert list(sa.x) == list(sb.x)
        ca = (
            counted_groups(ds, ["k"], num_buckets=nb_a)
            .to_pandas()
            .sort_values("k")
        )
        cb = (
            counted_groups(ds, ["k"], num_buckets=nb_b)
            .to_pandas()
            .sort_values("k")
        )
        assert list(ca["count"]) == list(cb["count"])
    ref = df.groupby("k")["x"].sum()
    assert list(sa.x) == list(ref.loc[sa.k].astype(int))


def test_as_of_join_ties_and_missing(ray_session):
    """Backward as-of semantics: equal-ts ties go to the highest
    event_id, purchases before any click are dropped, users never mix."""
    import ray.data as rd

    from graphsetintersection_ray.stages.streaming import as_of_join

    t = pd.Timestamp("2026-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # user 1: two clicks at the same ts, purchase at that ts
        {"event_id": 100, "ts": t + 10 * s, "user_id": 1, "event_type": "click"},
        {"event_id": 101, "ts": t + 10 * s, "user_id": 1, "event_type": "click"},
        {"event_id": 200, "ts": t + 10 * s, "user_id": 1, "event_type": "purchase"},
        # user 1: purchase BEFORE any click -> dropped
        {"event_id": 201, "ts": t + 5 * s, "user_id": 1, "event_type": "purchase"},
        # user 2: click later than user 1's purchase must not leak
        {"event_id": 300, "ts": t + 20 * s, "user_id": 2, "event_type": "click"},
        {"event_id": 301, "ts": t + 30 * s, "user_id": 2, "event_type": "purchase"},
        # noise
        {"event_id": 400, "ts": t, "user_id": 1, "event_type": "view"},
    ]
    out = (
        as_of_join(rd.from_pandas(pd.DataFrame(rows)).repartition(3))
        .to_pandas()
        .set_index("purchase_id")
    )
    assert set(out.index) == {200, 301}
    assert out.loc[200, "click_id"] == 101  # tie -> highest event_id
    assert out.loc[301, "click_id"] == 300


def test_range_join_window_boundaries(ray_session):
    """Both window ends inclusive; zero-count purchases present; other
    users' errors never counted."""
    import ray.data as rd

    from graphsetintersection_ray.stages.streaming import range_join_counts

    t = pd.Timestamp("2026-01-01 12:00:00")
    h, s = pd.Timedelta(hours=1), pd.Timedelta(seconds=1)
    rows = [
        {"event_id": 1, "ts": t - h, "user_id": 1, "event_type": "error"},      # exactly 1h before: IN
        {"event_id": 2, "ts": t - h - s, "user_id": 1, "event_type": "error"},  # just outside: OUT
        {"event_id": 3, "ts": t, "user_id": 1, "event_type": "error"},          # same instant: IN
        {"event_id": 4, "ts": t - s, "user_id": 2, "event_type": "error"},      # other user: OUT
        {"event_id": 10, "ts": t, "user_id": 1, "event_type": "purchase"},
        {"event_id": 11, "ts": t, "user_id": 3, "event_type": "purchase"},      # no errors: 0
    ]
    out = (
        range_join_counts(rd.from_pandas(pd.DataFrame(rows)).repartition(2))
        .to_pandas()
        .set_index("purchase_id")
    )
    assert out.loc[10, "n_errors_1h"] == 2
    assert out.loc[11, "n_errors_1h"] == 0


def test_hopping_windows_double_count(ray_session):
    """Each event lands in exactly two 1-hour windows 30 min apart, so
    sum(n) over windows = 2 x events per type."""
    import ray.data as rd

    from graphsetintersection_ray.stages.streaming import hopping_window_agg

    t = pd.Timestamp("2026-01-01 10:15:00")
    df = pd.DataFrame(
        {
            "ts": [t, t + pd.Timedelta(minutes=20)],
            "event_type": ["click", "click"],
            "value": [1.0, 2.0],
        }
    )
    out = hopping_window_agg(rd.from_pandas(df)).to_pandas()
    assert out.n.sum() == 4
    w = out.set_index("window_start")
    # 10:15 -> windows starting 10:00 and 09:30; 10:35 -> 10:30 and 10:00
    assert w.loc[pd.Timestamp("2026-01-01 10:00:00"), "n"] == 2
    assert w.loc[pd.Timestamp("2026-01-01 10:00:00"), "value_sum"] == 3.0
    assert w.loc[pd.Timestamp("2026-01-01 09:30:00"), "n"] == 1


def test_tfidf_top_terms_ranking(ray_session):
    """A term unique to one doc outranks corpus-wide terms; rk ordering
    deterministic (score desc, term asc)."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import tfidf_top_terms

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "shared shared zebra",
                "shared shared shared",
                "shared quokka quokka",
            ],
        }
    )
    out = (
        tfidf_top_terms(rd.from_pandas(df).repartition(2), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rk"])
    )
    top0 = out[(out.doc_id == 0) & (out.rk == 1)].term.iloc[0]
    top2 = out[(out.doc_id == 2) & (out.rk == 1)].term.iloc[0]
    assert top0 == "zebra" and top2 == "quokka"
    # 'shared' appears in every doc: idf = ln(1) = 0
    assert (out[out.term == "shared"].score == 0.0).all()


def test_wav_bmp_codecs_roundtrip_and_decode_stage(ray_session):
    """Pure-NumPy codecs are bit-exact roundtrips; DecodeStage sniffs
    magics and really decodes WAV/BMP while still refusing unknown
    formats without fake=True."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from graphsetintersection_ray.stages.multimodal import (
        DecodeStage,
        bmp24_bytes,
        decode_bmp24,
        decode_pcm16_wav,
        pcm16_wav_bytes,
    )

    rng = np.random.default_rng(2)
    samples = rng.integers(-32768, 32768, size=333, dtype=np.int64).astype(
        np.int16
    )
    assert np.array_equal(decode_pcm16_wav(pcm16_wav_bytes(samples)), samples)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.int64).astype(np.uint8)
    assert np.array_equal(decode_bmp24(bmp24_bytes(img)), img)

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "content": pa.array(
                [pcm16_wav_bytes(samples), bmp24_bytes(img)], pa.binary()
            ),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .set_index("doc_id")
    )
    wav_frame = np.asarray(out.loc[0, "frame"], np.float32)
    assert len(wav_frame) == 333
    assert np.array_equal(
        wav_frame, samples.astype(np.float32) / np.float32(32768.0)
    )
    bmp_frame = np.asarray(out.loc[1, "frame"], np.float32)
    assert len(bmp_frame) == 15
    assert np.allclose(
        bmp_frame,
        (img.astype(np.float32).mean(axis=2) / 255.0).ravel(),
    )

    # unknown format still refuses without fake=True
    with _pytest.raises(Exception):
        DecodeStage()(
            pa.table(
                {
                    "doc_id": pa.array([9], pa.int64()),
                    "content": pa.array([b"\xff\xd8JPEGish"], pa.binary()),
                }
            )
        )


def test_ngram_decontaminate_counts_shingle_overlap(ray_session):
    """Docs quoting a benchmark shingle are flagged with the distinct
    overlap count; benchmark docs themselves are excluded; the broadcast
    and bucketed semi-join paths agree."""
    import ray.data as rd

    from graphsetintersection_ray.stages.dedup import ngram_decontaminate

    texts = {
        0: "alpha beta gamma delta epsilon",  # benchmark (0 % 5)
        1: "x alpha beta gamma y",            # quotes 1 bench shingle
        2: "alpha beta gamma delta z",        # quotes 2 bench shingles
        3: "totally unrelated words here",
        4: "q r s t u",
        5: "another benchmark doc entirely",  # benchmark (5 % 5)
        6: "v another benchmark doc w",       # quotes 1 shingle of doc 5
        7: "alpha beta gamma alpha beta gamma",  # repeats count ONCE
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    docs = rd.from_pandas(df).repartition(3)
    out = (
        ngram_decontaminate(docs, benchmark_mod=5)
        .to_pandas()
        .set_index("doc_id")["n_hits"]
        .to_dict()
    )
    assert out == {1: 1, 2: 2, 6: 1, 7: 1}
    # forced-zero broadcast threshold -> bucketed semi-join path
    out2 = (
        ngram_decontaminate(docs, benchmark_mod=5, broadcast_max=0, num_buckets=4)
        .to_pandas()
        .set_index("doc_id")["n_hits"]
        .to_dict()
    )
    assert out2 == out


def test_pii_scrubber_counts_and_redacts(ray_session):
    """Multiple PII spans per doc are each counted and redacted; the
    email -> phone -> ip chain leaves non-PII text intact."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import PIIScrubber

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail a.b@host.com and c_d@ex7.org now",
                "call 555-123-4567 or 555-000-9999 from 192.168.1.254",
                "nothing sensitive here",
            ],
        }
    )
    out = (
        rd.from_pandas(df)
        .map_batches(PIIScrubber, batch_format="pandas", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_emails.tolist() == [2, 0, 0]
    assert out.n_phones.tolist() == [0, 2, 0]
    assert out.n_ips.tolist() == [0, 1, 0]
    assert out.clean[0] == "mail [EMAIL] and [EMAIL] now"
    assert out.clean[1] == "call [PHONE] or [PHONE] from [IP]"
    assert out.clean[2] == "nothing sensitive here"


def test_event_log_lines_field_presence():
    """Value-defined line fields appear exactly per the presence rules."""
    from graphsetintersection_ray.stages.text import event_log_lines

    batch = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "user_id": [3, 4, 5, 6],
            "event_type": ["view", "click", "view", "error"],
        }
    )
    out = event_log_lines(batch)
    # uid=3 -> no email; eid=0 even -> phone; (3+0)%5=3 -> ip
    assert out.text[0] == "user 3 call 555-103-0000 from 10.3.0.3 during view"
    # uid=4 -> email; eid=1 odd -> no phone; (4+1)%5=0 -> no ip
    assert out.text[1] == "user 4 <u4@ex4.com> during click"


def test_bloom_membership_no_false_negatives(ray_session):
    """Planted cross-parity duplicates are always flagged (the Bloom
    no-false-negative guarantee), unique docs stay clean at default
    sizing, and a deliberately tiny filter still never misses."""
    import ray.data as rd

    from graphsetintersection_ray.stages.dedup import bloom_membership

    n = 400
    texts = [f"unique document number {i} body text" for i in range(n)]
    # plant duplicates: odd docs 1..39 copy the preceding even doc
    for i in range(1, 40, 2):
        texts[i] = texts[i - 1]
    df = pd.DataFrame({"doc_id": np.arange(n), "text": texts})
    docs = rd.from_pandas(df).repartition(4)
    out = (
        bloom_membership(docs, seen_mod=2)
        .to_pandas()
        .set_index("doc_id")["maybe_seen"]
    )
    assert set(out.index) == set(range(1, n, 2))
    planted = list(range(1, 40, 2))
    assert (out.loc[planted] == 1).all()
    # default sizing: no false positives on this tiny corpus
    fresh = [i for i in range(1, n, 2) if i not in planted]
    assert (out.loc[fresh] == 0).all()
    # tiny filter (high FP pressure) must STILL have zero false negatives
    out2 = (
        bloom_membership(docs, seen_mod=2, m_bits=256, k=2)
        .to_pandas()
        .set_index("doc_id")["maybe_seen"]
    )
    assert (out2.loc[planted] == 1).all()


def test_funnel_counts_greedy_subsequence(ray_session):
    """Reach counts follow greedy-earliest subsequence matching: order
    matters (purchase before click doesn't count), and a user is counted
    at every stage they reach."""
    import ray.data as rd

    from graphsetintersection_ray.stages.streaming import funnel_counts

    base = pd.Timestamp("2024-01-01")
    rows = []

    def ev(uid, t, typ):
        rows.append(
            {
                "event_id": len(rows),
                "ts": base + pd.Timedelta(minutes=t),
                "user_id": uid,
                "event_type": typ,
            }
        )

    # u0: full funnel in order
    ev(0, 0, "view"); ev(0, 5, "click"); ev(0, 9, "purchase")
    # u1: purchase BEFORE click -> reaches stage 2 only
    ev(1, 0, "view"); ev(1, 2, "purchase"); ev(1, 4, "click")
    # u2: view only
    ev(2, 1, "view")
    # u3: click/purchase but never a view -> reaches nothing
    ev(3, 0, "click"); ev(3, 1, "purchase")
    # u4: full funnel with noise interleaved
    ev(4, 0, "signup"); ev(4, 1, "view"); ev(4, 2, "error")
    ev(4, 3, "click"); ev(4, 4, "purchase")
    df = pd.DataFrame(rows)
    out = (
        funnel_counts(rd.from_pandas(df).repartition(3), num_buckets=4)
        .to_pandas()
        .set_index("stage")
    )
    assert out.loc[1, "n_users"] == 4  # u0 u1 u2 u4
    assert out.loc[2, "n_users"] == 3  # u0 u1 u4
    assert out.loc[3, "n_users"] == 2  # u0 u4
    assert out.loc[1, "step"] == "view"
    assert out.loc[3, "step"] == "purchase"


def test_approx_distinct_accuracy_and_determinism(ray_session):
    """HLL estimates land within 3% of exact on 20k users, are identical
    across block layouts (deterministic hash + max-merge), and exact on
    tiny cardinalities (linear-counting range)."""
    import ray.data as rd

    from graphsetintersection_ray.stages.streaming import approx_distinct_users

    rng = np.random.default_rng(11)
    n = 60000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 20000, size=n),
            "event_type": np.where(
                np.arange(n) % 3 == 0, "click", "view"
            ),
        }
    )
    exact = df.groupby("event_type")["user_id"].nunique()
    out1 = (
        approx_distinct_users(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .set_index("event_type")["n_approx"]
    )
    out2 = (
        approx_distinct_users(rd.from_pandas(df).repartition(7))
        .to_pandas()
        .set_index("event_type")["n_approx"]
    )
    assert (out1 == out2).all()  # layout-independent
    for t in exact.index:
        assert abs(out1[t] - exact[t]) / exact[t] < 0.03
    # tiny cardinality -> linear counting is near-exact
    small = pd.DataFrame(
        {"user_id": np.arange(10), "event_type": ["x"] * 10}
    )
    outs = (
        approx_distinct_users(rd.from_pandas(small))
        .to_pandas()
        .set_index("event_type")["n_approx"]
    )
    assert outs["x"] == 10


def test_conversion_time_strictly_after_view(ray_session):
    """conv time = earliest view -> earliest purchase AFTER it; a
    purchase before the first view is ignored; users without both are
    absent."""
    import ray.data as rd

    from graphsetintersection_ray.stages.streaming import conversion_time

    base = pd.Timestamp("2024-01-01")
    rows = []

    def ev(uid, t, typ):
        rows.append(
            {
                "event_id": len(rows),
                "ts": base + pd.Timedelta(minutes=t),
                "user_id": uid,
                "event_type": typ,
            }
        )

    ev(0, 0, "view"); ev(0, 7, "purchase"); ev(0, 9, "purchase")
    ev(1, 3, "purchase"); ev(1, 5, "view"); ev(1, 11, "purchase")
    ev(2, 0, "view")             # never converts
    ev(3, 0, "purchase")         # no view
    df = pd.DataFrame(rows)
    out = (
        conversion_time(rd.from_pandas(df).repartition(3), num_buckets=4)
        .to_pandas()
        .set_index("user_id")["conv_us"]
    )
    assert set(out.index) == {0, 1}
    assert out[0] == 7 * 60 * 1_000_000
    assert out[1] == 6 * 60 * 1_000_000


def test_source_quality_integer_exact(ray_session):
    """Per-source mean quality equals the integer-micro-unit average of
    per-doc qualities, independent of block layout."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import (
        TextQualityScorer,
        source_quality,
    )

    texts = [
        "the and of is " + " ".join(["word"] * (5 + 7 * i)) for i in range(40)
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(40),
            "text": texts,
            "source": ["s%d" % (i % 3) for i in range(40)],
        }
    )
    out = (
        source_quality(rd.from_pandas(df).repartition(5), num_buckets=2)
        .to_pandas()
        .set_index("source")
    )
    q = TextQualityScorer()(df).to_pandas()
    qi = np.rint(q["quality"].to_numpy() * 1e6).astype(np.int64)
    for s in ("s0", "s1", "s2"):
        mask = (df["source"] == s).to_numpy()
        assert out.loc[s, "n_docs"] == mask.sum()
        expect = round(qi[mask].sum() / (1e6 * mask.sum()), 6)
        assert out.loc[s, "mean_quality"] == expect


def test_oov_rate_against_direct_computation(ray_session):
    """OOV rate vs the corpus top-k vocab matches a direct pandas
    replay; vocab ties break (count DESC, token ASC); zero-token docs
    are absent."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import oov_rate

    texts = [
        "aa aa aa bb bb cc",   # aa:3 bb:2 cc:1
        "bb cc dd",            # dd:1
        "aa dd dd",            # dd:2 more
        "!!!",                 # zero tokens -> absent
    ]
    df = pd.DataFrame({"doc_id": np.arange(4), "text": texts})
    # counts: aa=4 bb=3 dd=3 cc=2 -> vocab_k=2 keeps {aa, bb}
    out = (
        oov_rate(rd.from_pandas(df).repartition(2), vocab_k=2, num_buckets=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert set(out.index) == {0, 1, 2}
    assert out.loc[0, "n_oov"] == 1          # cc
    assert out.loc[1, "n_oov"] == 2          # cc dd
    assert out.loc[2, "n_oov"] == 2          # dd dd
    assert out.loc[2, "oov_rate"] == round(2 / 3, 6)


def test_corpus_report_composition(ray_session):
    """The composed pipeline applies curate -> dedup-among-survivors ->
    decontaminate in that order: a duplicated good doc counts once, a
    benchmark-contaminated good doc counts zero, rejected docs never
    reach dedup."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import corpus_report

    def body(tag):
        # distinct filler words -> near-zero bigram repetition
        return "the and of is " + " ".join(f"{tag}{i}" for i in range(120))

    good = body("clean")
    texts = {
        0: good,                      # benchmark doc (0 % 5): blocked
        1: good,                      # copy of benchmark content: blocked
        2: body("fine"),              # survives
        3: body("fine"),              # dup of 2: dropped
        4: "der und die ist " + " ".join(f"wort{i}" for i in range(120)),  # German: rejected
        6: body("other"),             # survives
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = corpus_report(
        rd.from_pandas(df).repartition(3), benchmark_mod=5, num_buckets=4
    ).to_pandas()
    assert int(out.n_docs[0]) == 2  # docs 2 and 6
    from graphsetintersection_ray.stages.text import TextQualityScorer

    q = TextQualityScorer()(df.set_index("doc_id").loc[[2, 6]].reset_index())
    qdf = q.to_pandas()
    assert int(out.total_tokens[0]) == int(qdf["n_tokens"].sum())
    qi = np.rint(qdf["quality"].to_numpy() * 1e6).astype(np.int64)
    assert float(out.mean_quality[0]) == round(qi.sum() / (1e6 * 2), 6)


def test_unigram_logprob_ranks_gibberish_below_fluent(ray_session):
    """Common-word docs score higher than rare-word docs; values match a
    direct replay (integer micro-unit exactness, any block layout)."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import unigram_logprob

    texts = (
        ["the the the the"] * 8            # very common tokens
        + ["zxqv wkjy qpzt mlrb"]          # singleton gibberish
    )
    df = pd.DataFrame({"doc_id": np.arange(9), "text": texts})
    out = (
        unigram_logprob(rd.from_pandas(df).repartition(3), num_buckets=2)
        .to_pandas()
        .set_index("doc_id")["avg_logprob"]
    )
    assert out[8] < out[0]
    # direct replay: the=32/36; each gibberish token 1/36
    lp_the = round(round(np.log(32 / 36), 6) * 1e6)
    lp_rare = round(round(np.log(1 / 36), 6) * 1e6)
    assert out[0] == round(4 * lp_the / (1e6 * 4), 6)
    assert out[8] == round(4 * lp_rare / (1e6 * 4), 6)


def test_png_codec_all_filters_roundtrip():
    """decode(encode(img, filter_type=ft)) == img for every PNG scanline
    filter and odd shapes, and the decoder rejects non-PNG payloads."""
    import pytest as _pytest

    from graphsetintersection_ray.stages.multimodal import (
        decode_png,
        png_bytes,
    )

    rng = np.random.default_rng(21)
    for ft in range(5):
        for shape in [(1, 1, 3), (8, 8, 3), (13, 7, 3), (3, 31, 3)]:
            img = rng.integers(0, 256, size=shape).astype(np.uint8)
            assert np.array_equal(decode_png(png_bytes(img, ft)), img)
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_jpeg_codec_roundtrips():
    """Baseline JPEG: deterministic encode+decode, near-lossless on
    smooth gradients and flat blocks at high quality, odd shapes handled
    via edge-pad + crop, non-baseline streams rejected loudly."""
    import pytest as _pytest

    from graphsetintersection_ray.stages.multimodal import (
        decode_jpeg,
        jpeg_bytes,
    )

    for h, w in [(8, 8), (17, 23), (24, 40), (1, 1)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], -1
        ).astype(np.uint8)
        dec = decode_jpeg(jpeg_bytes(img, quality=95))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8
    flat = np.full((16, 16, 3), 120, np.uint8)
    flat[8:] = 40
    assert np.array_equal(decode_jpeg(jpeg_bytes(flat, quality=95)), flat)
    # determinism: same bytes, same pixels, twice
    noisy = np.random.default_rng(3).integers(
        0, 256, size=(11, 9, 3)
    ).astype(np.uint8)
    b1, b2 = jpeg_bytes(noisy, 80), jpeg_bytes(noisy, 80)
    assert b1 == b2
    assert np.array_equal(decode_jpeg(b1), decode_jpeg(b2))
    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_image_decode_mixed_formats(ray_session):
    """DecodeStage sniffs BMP / PNG / JPEG by magic; lossless formats
    decode to the exact grayscale frame, JPEG rows to the deterministic
    re-encoded frame, for the same Philox image."""
    import ray.data as rd

    from graphsetintersection_ray.stages.multimodal import (
        DecodeStage,
        attach_media_payload,
        decode_jpeg,
        jpeg_bytes,
    )

    df = pd.DataFrame(
        {"doc_id": np.arange(10), "text": ["x"] * 10}
    )
    payloads = attach_media_payload(
        rd.from_pandas(df).repartition(2), kind="image"
    )
    tbl = payloads.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=8, concurrency=1
    ).to_pandas().set_index("doc_id")
    for did in range(10):
        rng = np.random.Generator(np.random.Philox(key=[did, 77]))
        img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.int64).astype(
            np.uint8
        )
        if did % 3 == 2:
            img = decode_jpeg(jpeg_bytes(img, quality=90))
        want = (
            img.astype(np.float32).mean(axis=2) / np.float32(255.0)
        ).ravel()
        got = np.asarray(tbl.loc[did, "frame"], np.float32)
        assert np.array_equal(got, want)


def test_weighted_sample_determinism_and_bias(ray_session):
    """A-ES sample: block-layout independent, a dominant-weight item is
    always included, zero/negative weights never sampled."""
    import ray.data as rd

    from graphsetintersection_ray.stages.streaming import weighted_sample

    n = 2000
    rng = np.random.default_rng(4)
    vals = rng.uniform(0.1, 1.0, size=n)
    vals[7] = 1e9       # dominant weight
    vals[11] = 0.0      # never sampled
    vals[13] = -3.0     # never sampled
    df = pd.DataFrame({"event_id": np.arange(n), "value": vals})
    out1 = weighted_sample(
        rd.from_pandas(df).repartition(3), k=50
    ).to_pandas()
    out2 = weighted_sample(
        rd.from_pandas(df).repartition(9), k=50
    ).to_pandas()
    pd.testing.assert_frame_equal(out1, out2)
    assert 7 in set(out1.event_id)
    assert 11 not in set(out1.event_id)
    assert 13 not in set(out1.event_id)
    assert len(out1) == 50 and (out1.rk.to_numpy() == np.arange(1, 51)).all()


def test_centroid_sim_exact_and_outlier_signal(ray_session):
    """centroid_sim is block-layout independent (integer sums), a vector
    aligned with its cluster scores ~1, a deliberate outlier scores
    lower, and values match a direct integer replay."""
    import ray.data as rd

    from graphsetintersection_ray.stages.similarity import centroid_sim

    rng = np.random.default_rng(6)
    base = rng.normal(0, 0.1, size=(1, 16))
    vecs = base + rng.normal(0, 0.01, size=(30, 16))
    vecs[29] = -base[0] * 3  # planted outlier, anti-aligned
    df = pd.DataFrame(
        {
            "vec_id": np.arange(30),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
            "label": np.zeros(30, np.int32),
        }
    )
    out1 = (
        centroid_sim(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .set_index("vec_id")["centroid_sim"]
        .sort_index()
    )
    out2 = (
        centroid_sim(rd.from_pandas(df).repartition(5))
        .to_pandas()
        .set_index("vec_id")["centroid_sim"]
        .sort_index()
    )
    assert (out1 == out2).all()
    assert out1[29] < 0 < out1[0]
    # direct integer replay for one row
    vi = np.round(vecs.astype(np.float32).astype(np.float64) * 1000).astype(np.int64)
    c = vi.sum(axis=0)
    want = vi[0] @ c / (np.sqrt(float(vi[0] @ vi[0])) * np.sqrt(float(c @ c)))
    from graphsetintersection_ray.functions.kernels import round_half_away

    assert out1[0] == round_half_away(np.array([want]), 6)[0]


def test_sequence_pack_matches_pandas_scan(ray_session):
    """sequence_pack (distributed two-phase prefix-sum scan) vs a
    single-threaded pandas replay on sparse, shuffled doc_ids: identical
    (start_offset, pack_id) for every doc, and pack occupancy never
    exceeds seq_len except for a doc spanning a pack boundary."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import TOKEN_RE, sequence_pack

    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 10_000, 400))
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 120)))
        for _ in range(len(ids))
    ]
    df = pd.DataFrame({"doc_id": ids, "text": texts}).sample(
        frac=1.0, random_state=3
    )
    seq_len = 256
    got = (
        sequence_pack(rd.from_pandas(df, override_num_blocks=7), seq_len)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = df.sort_values("doc_id").reset_index(drop=True)
    want["n_tokens"] = want["text"].str.count(TOKEN_RE).astype(np.int64)
    want["start_offset"] = want["n_tokens"].cumsum() - want["n_tokens"]
    want["pack_id"] = want["start_offset"] // seq_len
    for col in ("doc_id", "n_tokens", "start_offset", "pack_id"):
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy())


def test_sequence_pack_empty_input(ray_session):
    import ray.data as rd

    from graphsetintersection_ray.stages.text import sequence_pack

    empty = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64), "text": []})
    )
    out = sequence_pack(empty)
    # typed schema survives the empty path (to_pandas() on an empty
    # Dataset drops columns — a Ray behavior, not an engine one)
    assert out.schema().names == [
        "doc_id",
        "n_tokens",
        "start_offset",
        "pack_id",
    ]
    assert out.count() == 0


def test_doc_chunks_cover_every_token(ray_session):
    """Chunk schedule invariants on random lengths: chunks tile [0, n)
    with stride chunk_len-overlap, consecutive chunks overlap by exactly
    `overlap` tokens (except the short tail), every token is covered,
    and zero-token docs emit no chunks."""
    import ray.data as rd

    from graphsetintersection_ray.stages.text import doc_chunks

    rng = np.random.default_rng(11)
    texts = [""] + [
        " ".join(["tok"] * int(n)) for n in rng.integers(1, 300, 60)
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    chunk_len, overlap = 48, 12
    out = (
        doc_chunks(rd.from_pandas(df), chunk_len, overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    n_of = df["text"].str.split().str.len().fillna(0).astype(int)
    assert 0 not in set(out["doc_id"])  # empty doc -> no chunks
    for doc_id, g in out.groupby("doc_id"):
        n = int(n_of[doc_id])
        starts = g["chunk_start"].to_numpy()
        lens = g["chunk_len"].to_numpy()
        assert starts[0] == 0
        assert (np.diff(starts) == chunk_len - overlap).all()
        assert (lens[:-1] == chunk_len).all() and 0 < lens[-1] <= chunk_len
        assert starts[-1] + lens[-1] == n  # full coverage, exact tail
        assert (lens == np.minimum(chunk_len, n - starts)).all()


def test_winnow_fingerprint_brute_force_replay():
    """Stage output equals a scalar-Python winnowing replay (per-window
    rightmost-min scan) on crafted docs: periodic text forces hash TIES
    inside windows (the rightmost rule is load-bearing), plus unicode,
    short-doc, and whitespace-normalization cases."""
    from graphsetintersection_ray.stages.text import (
        WINNOW_B,
        WINNOW_K,
        WINNOW_M,
        WINNOW_W,
        winnow_fingerprint,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "abcabcabcabcabcabc",       # periodic: every k-gram hash repeats
                "The  quick\tbrown fox jumps over the lazy dog",
                "héllo wörld héllo wörld again",  # non-ascii code points
                "short",                     # L < K + W - 1: no output
                "aaaaaaaaaaaaaaa",           # all ties everywhere
            ],
        }
    )
    got = (
        winnow_fingerprint(docs)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )

    want_rows = []
    for doc_id, text in zip(docs.doc_id, docs.text):
        s = " ".join(text.lower().split())
        cps = [ord(c) for c in s]
        if len(cps) < WINNOW_K + WINNOW_W - 1:
            continue
        hs = [
            sum(
                cps[i + j] * WINNOW_B ** (WINNOW_K - 1 - j)
                for j in range(WINNOW_K)
            )
            % WINNOW_M
            for i in range(len(cps) - WINNOW_K + 1)
        ]
        sel = set()
        for t in range(len(hs) - WINNOW_W + 1):
            best = t
            for p in range(t, t + WINNOW_W):
                if hs[p] <= hs[best]:  # <= : rightmost wins ties
                    best = p
            sel.add(best)
        want_rows += [
            {"doc_id": doc_id, "pos": p + 1, "fp": hs[p]} for p in sorted(sel)
        ]
    want = pd.DataFrame(want_rows, columns=["doc_id", "pos", "fp"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # doc 4 is below the minimum length: nothing emitted
    assert 4 not in set(got.doc_id)
    # the winnowing guarantee: docs 1 and 5 are dense-tie cases and
    # still select ~2/(w+1) of positions, never zero
    assert (got.doc_id == 1).sum() > 0 and (got.doc_id == 5).sum() > 0


def test_bigram_logprob_paths_match_brute(ray_session, monkeypatch):
    """Broadcast and hash-join scoring paths equal each other and a
    driver-side brute-force add-one bigram LM."""
    import math
    import re

    import ray.data as rd

    from graphsetintersection_ray.stages import text as tx

    texts = {
        1: "the cat sat on the mat",
        2: "the cat the cat the",
        3: "one",          # <2 tokens -> absent
        4: "zz yy zz yy zz",
        5: "",
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    docs = rd.from_pandas(df).repartition(3)

    out = (
        tx.bigram_logprob(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(tx, "BIGRAM_BROADCAST_MAX", 0)
    out2 = (
        tx.bigram_logprob(docs, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)

    # brute force
    tok = {d: re.findall(r"[a-z0-9_]+", t.lower()) for d, t in texts.items()}
    uni, bi = {}, {}
    for ts in tok.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    from graphsetintersection_ray.functions.kernels import round_half_away

    want = {}
    for d, ts in tok.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        s = sum(
            int(
                np.rint(
                    round_half_away(
                        np.array([math.log((bi[p] + 1) / (uni[p[0]] + V))]), 6
                    )[0]
                    * 1e6
                )
            )
            for p in pairs
        )
        want[d] = (len(pairs), float(round_half_away(
            np.array([s / (1e6 * len(pairs))]), 6)[0]))
    got = {
        int(r.doc_id): (int(r.n_bigrams), float(r.avg_logprob))
        for r in out.itertuples()
    }
    assert got == want


def test_keyed_pair_rows_multikey_matches_bruteforce(ray_session):
    """_keyed_pair_rows over a composite (band, bh) key equals the
    brute-force per-group triu pair multiset, with duplicate
    (group, doc) rows collapsed by dedup_ids."""
    import itertools as it_

    import ray.data as rd

    from graphsetintersection_ray.stages.dedup import _keyed_pair_rows

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame(
        {
            "band": rng.integers(0, 4, n),
            "bh": rng.integers(0, 12, n),
            "doc_id": rng.integers(0, 40, n),
        }
    )
    got = (
        _keyed_pair_rows(
            rd.from_pandas(df).repartition(3),
            ["band", "bh"],
            None,
            num_buckets=4,
            dedup_ids=True,
        )
        .to_pandas()
        .groupby(["doc_a", "doc_b"])
        .size()
        .to_dict()
    )
    want: dict = {}
    for (_b, _h), g in df.drop_duplicates().groupby(["band", "bh"]):
        ids = sorted(g["doc_id"].unique())
        for a, b in it_.combinations(ids, 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want
