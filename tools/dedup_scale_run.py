"""Scale-evidence run for the dedup/text family (round-4 verdict item 6):
a deterministic 50k-doc synthetic corpus (10x sf0.1's documents table,
same word-soup text statistics, planted near-duplicate groups) pushed
through minhash_pairs -> dedup_clusters -> decontaminate, with
wall-times and peak-memory notes recorded for BASELINE.md.

Usage: PYTHONPATH=/root/repo python tools/dedup_scale_run.py [n_docs]
"""

from __future__ import annotations

import json
import resource
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data shard block plan scan join limit skew probe build stage tuple"
).split()


def synth_corpus(path: str, n_docs: int, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    rows = []
    did = 0
    while did < n_docs:
        n_words = int(rng.integers(8, 110))
        base = rng.choice(WORDS, size=n_words)
        text = " ".join(base)
        rows.append((did, text))
        did += 1
        # every ~25th doc seeds a near-dup group of 1-3 mutated copies
        if did % 25 == 0:
            for _ in range(int(rng.integers(1, 4))):
                if did >= n_docs:
                    break
                mut = base.copy()
                for _k in range(max(1, n_words // 20)):
                    mut[int(rng.integers(n_words))] = WORDS[
                        int(rng.integers(len(WORDS)))
                    ]
                rows.append((did, " ".join(mut)))
                did += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = np.where(df.doc_id % 3 == 0, "en", "zh")
    df["source"] = "synth"
    df["n_chars"] = df.text.str.len().astype(np.int64)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def peak_rss_gib() -> float:
    # ru_maxrss is KiB on Linux; 2**20 KiB = 1 GiB
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    corpus = f"/tmp/dedup_scale_{n_docs}.parquet"
    synth_corpus(corpus, n_docs)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from graphsetintersection_ray.stages.dedup import (
        decontaminate,
        jaccard_pairs,
        minhash_lsh_pairs,
        near_dedup,
        pair_components,
    )

    def docs():
        return rd.read_parquet(corpus)

    out = {"n_docs": n_docs, "stages": {}}

    t0 = time.time()
    mh = minhash_lsh_pairs(docs(), threshold=0.5)
    n_mh = mh.count()
    out["stages"]["minhash_pairs"] = {
        "sec": round(time.time() - t0, 2), "rows": n_mh,
    }

    t0 = time.time()
    pairs = jaccard_pairs(docs(), threshold=0.5, max_df=None)
    clusters = pair_components(pairs)
    n_cl = clusters.count()
    out["stages"]["dedup_clusters"] = {
        "sec": round(time.time() - t0, 2), "rows": n_cl,
    }

    t0 = time.time()
    surv = near_dedup(docs(), jaccard_pairs(docs(), threshold=0.5,
                                            max_df=None))
    n_sv = surv.count()
    out["stages"]["dedup_survivors"] = {
        "sec": round(time.time() - t0, 2), "rows": n_sv,
    }

    t0 = time.time()
    dec = decontaminate(docs())
    n_dc = dec.count()
    out["stages"]["decontaminate"] = {
        "sec": round(time.time() - t0, 2), "rows": n_dc,
    }

    out["driver_peak_rss_gib"] = round(peak_rss_gib(), 2)
    try:
        mem = ray._private.internal_api.memory_summary(stats_only=True)
        out["object_store_note"] = [
            ln for ln in mem.splitlines() if "Plasma" in ln or "Spilled" in ln
        ]
    except Exception:
        pass
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
