"""Text-analysis stages for large-scale training-data pipelines.

Beyond the reference's operator set (per the build spec): token counting,
quality scoring, language ID, document fingerprinting — each a vectorized
``map_batches`` function over the ``documents`` table. Regexes are
ASCII-anchored (`[a-zA-Z0-9_]+`) so Python `re` and DuckDB RE2 agree
exactly — the SQL oracles in pipelines/queries.py recompute every column.

The scorer class (``TextQualityScorer``) is the canonical stateful
actor-pool stage: regexes compile once per actor in ``__init__``, batches
stream through ``__call__``.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from graphsetintersection_ray.functions.kernels import round_half_away
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[a-zA-Z0-9_]+"

# GPT-2-style BPE pre-tokenization split, restricted to lookahead-free
# ASCII constructs so Python re and DuckDB RE2 produce identical matches:
# contraction suffixes, space-prefixed letter/digit/punctuation runs,
# whitespace runs. (The original GPT-2 pattern's \p{L}/\p{N} classes and
# trailing-space lookahead are not portable across the two engines.)
BPE_TOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[a-zA-Z]+"
    r"| ?[0-9]+"
    r"| ?[^a-zA-Z0-9 \t\n\r\f]+"
    r"|[ \t\n\r\f]+"
)

# whitespace-delimited word runs (the "whitespace tokenizer")
WS_TOKEN_RE = r"[^ \t\n\r\f]+"

EN_STOPWORDS = ("the", "and", "of", "to", "is")

# language marker words; ties broken by this ordering (first wins)
LANG_MARKERS = [
    ("en", ("the", "and", "of", "is")),
    ("de", ("der", "die", "und", "ist")),
    ("es", ("el", "los", "y", "es")),
    ("fr", ("le", "la", "et", "est")),
]


def token_count(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, n_tokens): ASCII-word token count, vectorized."""
    n = batch["text"].str.count(TOKEN_RE).astype(np.int64)
    return pa.table(
        {"doc_id": pa.array(batch["doc_id"], pa.int64()), "n_tokens": pa.array(n)}
    )


def token_count_bpe(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, n_tokens, n_ws_tokens): BPE-ish pre-tokenizer count
    (GPT-2 split pattern, portable subset — see BPE_TOKEN_RE) alongside
    the plain whitespace-split count. Vectorized pandas-str over the
    batch; the SQL oracle recomputes both via regexp_extract_all with
    the byte-identical patterns."""
    text = batch["text"]
    return pa.table(
        {
            "doc_id": pa.array(batch["doc_id"], pa.int64()),
            "n_tokens": pa.array(
                text.str.count(BPE_TOKEN_RE).astype(np.int64)
            ),
            "n_ws_tokens": pa.array(
                text.str.count(WS_TOKEN_RE).astype(np.int64)
            ),
        }
    )


class TextQualityScorer:
    """Actor-pool stage: per-doc quality features.

    quality = alpha_ratio * min(1, n_tokens / 100), rounded to 6 — a
    deterministic, SQL-reproducible proxy for length/charset quality.
    """

    def __init__(self) -> None:
        import re

        self.token_re = re.compile(TOKEN_RE)
        self.alpha_re = re.compile(r"[^a-zA-Z]")
        self.stop = set(EN_STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        text = batch["text"]
        n_chars = text.str.len().astype(np.int64)
        n_tokens = text.str.count(TOKEN_RE).astype(np.int64)
        n_alpha = text.str.count(r"[a-zA-Z]").astype(np.int64)
        n_stop = sum(
            text.str.count(rf"\b{w}\b").astype(np.int64) for w in self.stop
        )
        alpha_ratio = round_half_away(
            np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0), 6
        )
        stop_ratio = round_half_away(
            np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0), 6
        )
        quality = round_half_away(
            (n_alpha / np.maximum(n_chars, 1))
            * np.minimum(1.0, n_tokens / 100.0),
            6,
        )
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"], pa.int64()),
                "n_chars": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
                "quality": pa.array(quality, pa.float64()),
            }
        )


def lang_id(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, lang_pred): marker-presence n-gram heuristic. Score per
    language = number of its marker words present; argmax with fixed
    priority tie-break; 'und' when no marker matches."""
    text = batch["text"].str.lower()
    scores = np.zeros((len(batch), len(LANG_MARKERS)), np.int64)
    for j, (_, markers) in enumerate(LANG_MARKERS):
        for w in markers:
            scores[:, j] += text.str.contains(rf"\b{w}\b", regex=True).to_numpy()
    best = np.argmax(scores, axis=1)  # first max wins = priority order
    has_any = scores.max(axis=1) > 0
    langs = np.array([name for name, _ in LANG_MARKERS], dtype=object)
    pred = np.where(has_any, langs[best], "und")
    return pa.table(
        {
            "doc_id": pa.array(batch["doc_id"], pa.int64()),
            "lang_pred": pa.array(pred, pa.string()),
        }
    )


def fingerprint(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, fp): md5 of whitespace-normalized lowercase text —
    the exact-dedup key (SQL: md5(trim(regexp_replace(lower(text),
    '\\s+', ' ', 'g'))))."""
    norm = (
        batch["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    )
    fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm]
    return pa.table(
        {
            "doc_id": pa.array(batch["doc_id"], pa.int64()),
            "fp": pa.array(fps, pa.string()),
        }
    )


WINNOW_K = 5  # k-gram length (chars of the normalized text)
WINNOW_W = 4  # winnowing window (hashes); guarantee: any shared
#               substring of >= K + W - 1 = 8 chars yields a shared
#               fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03)
WINNOW_B = 257  # polynomial hash base over Unicode code points
WINNOW_M = 1_000_000_007  # modulus; 5 Horner terms stay < 2^55, so
#               both int64 NumPy and DuckDB BIGINT evaluate exactly


def winnow_fingerprint(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, pos, fp): winnowing fingerprints — per document, the
    k-gram hash minima selected by robust winnowing (in every window of
    W consecutive k-gram hashes keep the minimum, rightmost on ties),
    the MOSS substring-matching sketch. pos is the 1-based k-gram start
    in the whitespace-normalized lowercase text; fp the polynomial hash
    sum code_j * B^(K-1-j) mod M over Unicode code points, chosen so an
    exact SQL replay exists (same normalization as ``fingerprint``).

    Scale shape: map-only — no shuffle; the fingerprint set is ~2/(W+1)
    of the k-gram stream per document, emitted per batch. Downstream
    substring-level dedup joins on fp (hash-bucketed) exactly like the
    shingle pipelines. Per-doc loop: the hash/winnow math is vectorized
    NumPy per document (code points via utf-32 reinterpretation); docs
    are the short axis of a batch."""
    from numpy.lib.stride_tricks import sliding_window_view

    norm = (
        batch["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    )
    ids_out: list[np.ndarray] = []
    pos_out: list[np.ndarray] = []
    fp_out: list[np.ndarray] = []
    b1 = WINNOW_B
    b2, b3, b4 = b1 * b1, b1 * b1 * b1, b1 * b1 * b1 * b1
    for doc_id, s in zip(batch["doc_id"], norm):
        cp = np.frombuffer(s.encode("utf-32-le"), np.uint32).astype(np.int64)
        L = len(cp)
        if L < WINNOW_K + WINNOW_W - 1:
            continue
        h = (
            cp[: L - 4] * b4
            + cp[1 : L - 3] * b3
            + cp[2 : L - 2] * b2
            + cp[3 : L - 1] * b1
            + cp[4:]
        ) % WINNOW_M
        win = sliding_window_view(h, WINNOW_W)
        # rightmost minimum: argmin over the reversed window is the
        # FIRST minimum in reversed order = last in original order
        am = win[:, ::-1].argmin(axis=1)
        sel = np.unique(np.arange(len(win)) + (WINNOW_W - 1 - am))
        ids_out.append(np.full(len(sel), doc_id, np.int64))
        pos_out.append(sel + 1)  # 1-based, matching SQL substr
        fp_out.append(h[sel])
    empty = np.array([], np.int64)
    return pa.table(
        {
            "doc_id": pa.array(
                np.concatenate(ids_out) if ids_out else empty, pa.int64()
            ),
            "pos": pa.array(
                np.concatenate(pos_out) if pos_out else empty, pa.int64()
            ),
            "fp": pa.array(
                np.concatenate(fp_out) if fp_out else empty, pa.int64()
            ),
        }
    )


def token_quantiles(docs, qs=(0.25, 0.5, 0.9)):
    """(lang_pred, q, n_tokens): EXACT per-language token-count quantiles
    (discrete, DuckDB quantile_disc semantics: the value at sorted index
    ceil(q·n) − 1).

    Scale shape: quantiles over a 10¹²-row corpus without a sort — one
    map pass emits (lang, n_tokens) per doc, one pre-aggregated count
    shuffle builds the (lang, n_tokens) histogram (cardinality bounded
    by languages × max doc length, NOT by corpus rows), and the driver
    cumsums that small histogram."""
    import numpy as np
    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import sum_by

    def per_doc(batch: pd.DataFrame) -> pa.Table:
        lang = lang_id(batch)["lang_pred"]
        toks = token_count(batch)["n_tokens"]
        return pa.table(
            {
                "lang_pred": lang,
                "n_tokens": toks,
                "cnt": pa.array(np.ones(len(batch), np.int64)),
            }
        )

    hist = (
        sum_by(
            docs.map_batches(per_doc, batch_format="pandas"),
            ["lang_pred", "n_tokens"],
            "cnt",
        )
        .to_pandas()
        .sort_values(["lang_pred", "n_tokens"])
    )
    out_lang, out_q, out_n = [], [], []
    for lang, g in hist.groupby("lang_pred", sort=True):
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["n_tokens"].to_numpy()
        n = int(cum[-1])
        for q in qs:
            rank = int(np.ceil(q * n))
            out_lang.append(lang)
            out_q.append(float(q))
            out_n.append(int(vals[np.searchsorted(cum, max(rank, 1))]))
    return rd.from_arrow(
        pa.table(
            {
                "lang_pred": pa.array(out_lang, pa.string()),
                "q": pa.array(out_q, pa.float64()),
                "n_tokens": pa.array(out_n, pa.int64()),
            }
        )
    )


class _LangQualityTopK:
    """Actor-pool partial top-k: per batch, emit each language's k best
    (quality DESC, doc_id ASC) docs — the global per-language top-k is
    contained in the union of per-block top-ks under the same total
    order, so the final reduce sees at most k × #langs × #blocks rows."""

    def __init__(self, k: int) -> None:
        self.k = k
        self.scorer = TextQualityScorer()

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        q = self.scorer(batch).to_pandas()
        lang = lang_id(batch).to_pandas()
        df = pd.DataFrame(
            {
                "lang_pred": lang["lang_pred"],
                "doc_id": q["doc_id"],
                "quality": q["quality"],
            }
        )
        df = df.sort_values(
            ["lang_pred", "quality", "doc_id"],
            ascending=[True, False, True],
        )
        return pa.Table.from_pandas(
            df.groupby("lang_pred", sort=False).head(self.k),
            preserve_index=False,
        )


def top_per_lang(docs, k: int = 10):
    """(lang_pred, doc_id, quality, rk): each language's k
    highest-quality documents with rank 1..k — deterministic total
    order (quality DESC, doc_id ASC), the group-top-k selection step of
    a per-language data-curation pipeline.

    Scale shape: one actor-pool pass emits per-block per-language
    partial top-ks; the driver reduce input is bounded by
    k × #langs × #blocks rows regardless of corpus size."""
    import ray.data as rd

    partials = (
        docs.map_batches(
            _LangQualityTopK,
            fn_constructor_kwargs={"k": k},
            concurrency=2,
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(
            ["lang_pred", "quality", "doc_id"],
            ascending=[True, False, True],
        )
    )
    top = partials.groupby("lang_pred", sort=True).head(k).copy()
    top["rk"] = top.groupby("lang_pred").cumcount() + 1
    return rd.from_arrow(
        pa.table(
            {
                "lang_pred": pa.array(top["lang_pred"], pa.string()),
                "doc_id": pa.array(top["doc_id"], pa.int64()),
                "quality": pa.array(top["quality"], pa.float64()),
                "rk": pa.array(top["rk"].to_numpy(), pa.int64()),
            }
        )
    )


def ngram_counts(docs, top: int = 50, num_buckets: int = 64):
    """(bigram, n): the corpus's ``top`` most frequent adjacent token
    bigrams (lowercased ASCII tokens), deterministic (n DESC, bigram
    ASC) tie order — corpus n-gram statistics for contamination and
    boilerplate analysis.

    Scale shape: per-batch local bigram counts (one tokenize pass, one
    vectorized value_counts) → pre-aggregated count shuffle keyed on
    bigram → exact top-k via per-block partial top-k (after global
    aggregation each bigram is unique, so the union of per-block
    top-ks contains the global top-k); the driver reduce is bounded by
    top × #blocks rows. At real multi-node scale raise ``num_buckets``
    so one bucket of distinct bigram counts fits a worker heap (bucket
    count is semantics-free)."""
    import itertools

    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import sum_by

    def local_counts(batch: pd.DataFrame) -> pa.Table:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        total = int(lens.sum())
        if total < 2:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        flat = np.fromiter(
            itertools.chain.from_iterable(toks), dtype=object, count=total
        )
        # a bigram starts at every position except each doc's last token
        valid = np.ones(total, bool)
        valid[np.cumsum(lens[lens > 0]) - 1] = False
        starts = valid[:-1]
        big = pd.Series(flat[:-1][starts]) + " " + pd.Series(flat[1:][starts])
        vc = big.value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    summed = sum_by(
        docs.map_batches(local_counts, batch_format="pandas"),
        ["bigram"],
        "n",
        num_buckets=num_buckets,
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n", "bigram"], ascending=[False, True]
        )
        return pa.Table.from_pandas(df.head(top), preserve_index=False)

    cand = (
        summed.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "bigram"], ascending=[False, True])
        .head(top)
    )
    return rd.from_arrow(
        pa.table(
            {
                "bigram": pa.array(cand["bigram"].to_numpy(object), pa.string()),
                "n": pa.array(cand["n"].to_numpy(np.int64)),
            }
        )
    )


def repetition_ratio(batch: pd.DataFrame) -> pa.Table:
    """(doc_id, n_bigrams, n_distinct, rep_ratio): within-document
    adjacent-bigram repetition — the C4/Gopher-style boilerplate signal
    (rep_ratio = 1 − distinct/total bigrams; docs with < 2 tokens are
    excluded, matching the SQL oracle's group semantics). Map-only: no
    shuffle at any scale."""
    import itertools

    toks = batch["text"].str.lower().str.findall(TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    total = int(lens.sum())
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
            "rep_ratio": pa.array([], pa.float64()),
        }
    )
    if total < 2:
        return empty
    flat = np.fromiter(
        itertools.chain.from_iterable(toks), dtype=object, count=total
    )
    doc_of = np.repeat(batch["doc_id"].to_numpy(np.int64), lens)
    valid = np.ones(total, bool)
    valid[np.cumsum(lens[lens > 0]) - 1] = False
    starts = valid[:-1]
    if not starts.any():
        return empty
    big = pd.Series(flat[:-1][starts]) + " " + pd.Series(flat[1:][starts])
    df = pd.DataFrame({"doc_id": doc_of[:-1][starts], "bg": big})
    g = df.groupby("doc_id", sort=False)["bg"].agg(["size", "nunique"])
    g = g.reset_index()
    ratio = round_half_away(
        1.0 - g["nunique"].to_numpy(np.float64) / g["size"].to_numpy(np.float64),
        6,
    )
    return pa.table(
        {
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "n_bigrams": pa.array(g["size"].to_numpy(np.int64)),
            "n_distinct": pa.array(g["nunique"].to_numpy(np.int64)),
            "rep_ratio": pa.array(ratio, pa.float64()),
        }
    )


class CurationFilter:
    """Actor-pool end-to-end curation filter: keep documents that are
    (a) detected English, (b) above a quality floor, (c) below a
    repetition ceiling — the composed keep/drop decision of a
    training-data curation pipeline, computed in ONE fused map pass
    (all three signals vectorized per batch; no shuffle at any scale).
    Docs with < 2 tokens have no repetition evidence and carry
    rep_ratio 0.0 (they are rejected by the quality floor anyway)."""

    def __init__(
        self,
        lang: str = "en",
        min_quality: float = 0.3,
        max_rep: float = 0.05,
    ) -> None:
        self.lang = lang
        self.min_quality = min_quality
        self.max_rep = max_rep
        self.scorer = TextQualityScorer()

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        q = self.scorer(batch).to_pandas()
        lang = lang_id(batch)["lang_pred"].to_pandas().to_numpy(object)
        rep = repetition_ratio(batch).to_pandas().set_index("doc_id")[
            "rep_ratio"
        ]
        rep_full = (
            pd.Series(batch["doc_id"].to_numpy(np.int64))
            .map(rep)
            .fillna(0.0)
            .to_numpy(np.float64)
        )
        quality = q["quality"].to_numpy(np.float64)
        keep = (
            (lang == self.lang)
            & (quality >= self.min_quality)
            & (rep_full <= self.max_rep)
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(np.int64)[keep], pa.int64()
                ),
                "lang_pred": pa.array(lang[keep], pa.string()),
                "quality": pa.array(quality[keep], pa.float64()),
                "rep_ratio": pa.array(rep_full[keep], pa.float64()),
            }
        )


def tfidf_top_terms(docs, k: int = 3, num_buckets: int = 64):
    """(doc_id, term, score, rk): each document's ``k`` highest
    tf-idf terms (tf = in-doc count, idf = ln(N/df), ties by term asc)
    — the keyword-extraction step of a corpus-analysis pipeline.

    Scale shape: tf is map-only (a document lives in one row); df is a
    pre-aggregated (term) count shuffle over the (doc, term) pairs; the
    idf attach is one hash join on term; the per-doc top-k runs in one
    doc_id-bucketed pass (whole docs co-locate), vectorized
    sort + cumcount per bucket. N is a metadata count."""
    import ray.data as rd

    from graphsetintersection_ray.stages.graph_build import compact_blocks
    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        sum_by,
    )

    n_docs = docs.count()

    def tf_rows(batch: pd.DataFrame) -> pa.Table:
        import itertools

        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        total = int(lens.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        flat = np.fromiter(
            itertools.chain.from_iterable(toks), dtype=object, count=total
        )
        doc_of = np.repeat(batch["doc_id"].to_numpy(np.int64), lens)
        g = (
            pd.DataFrame({"doc_id": doc_of, "term": flat})
            .groupby(["doc_id", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "term": pa.array(g["term"].to_numpy(object), pa.string()),
                "tf": pa.array(g["tf"].to_numpy(np.int64)),
            }
        )

    tf = docs.map_batches(tf_rows, batch_format="pandas").materialize()
    df = sum_by(
        tf.map_batches(
            lambda t: pa.table(
                {
                    "term": t["term"],
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["term"],
        "n",
        out_col="df",
        num_buckets=num_buckets,
    )
    joined = compact_blocks(tf).join(
        compact_blocks(df),
        join_type="inner",
        num_partitions=16,
        on=("term",),
    )

    def score_rows(t: pa.Table) -> pa.Table:
        tf_ = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_ = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = round_half_away(tf_ * np.log(float(n_docs) / df_), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "score": pa.array(score, pa.float64()),
            }
        )

    scored = joined.map_batches(score_rows, batch_format="pyarrow")

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("term", pa.string()),
            pa.field("score", pa.float64()),
            pa.field("rk", pa.int64()),
        ]
    )

    def topk(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True]
        )
        g["rk"] = g.groupby("doc_id").cumcount() + 1
        g = g[g["rk"] <= k]
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "term": pa.array(g["term"].to_numpy(object), pa.string()),
                "score": pa.array(g["score"].to_numpy(np.float64)),
                "rk": pa.array(g["rk"].to_numpy(np.int64)),
            }
        )

    return bucket_groups(
        scored.map_batches(
            lambda b: _add_bucket(b, ["doc_id"], num_buckets),
            batch_format="pandas",
        ),
        topk,
        num_buckets,
    )


# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------

# ASCII-anchored, lookahead-free patterns so Python re and DuckDB RE2
# match byte-identically (same portability contract as TOKEN_RE above).
PII_EMAIL_RE = r"[a-zA-Z0-9._]+@[a-zA-Z0-9]+\.[a-zA-Z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PATTERNS = [
    ("emails", PII_EMAIL_RE, "[EMAIL]"),
    ("phones", PII_PHONE_RE, "[PHONE]"),
    ("ips", PII_IP_RE, "[IP]"),
]


class PIIScrubber:
    """Actor-pool stage: count and redact PII spans (emails, NANP-style
    phone numbers, IPv4 addresses) in a text column — the
    pre-training-corpus privacy-scrub pass. Regexes compile once per
    actor in ``__init__``; per batch each pattern is one vectorized
    pandas-str count plus one vectorized replace, applied in fixed
    order (email → phone → ip) so the redaction chain is deterministic
    and SQL-replayable. Map-only: zero shuffle at any corpus size."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        import re

        self.text_col = text_col
        self.id_col = id_col
        self.pats = [
            (name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS
        ]

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        text = batch[self.text_col]
        cols = {
            self.id_col: pa.array(
                batch[self.id_col].to_numpy(np.int64), pa.int64()
            )
        }
        clean = text
        for name, pat, repl in self.pats:
            cols[f"n_{name}"] = pa.array(
                text.str.count(pat).to_numpy(np.int64)
            )
            clean = clean.str.replace(pat, repl, regex=True)
        cols["clean"] = pa.array(clean.to_numpy(object), pa.string())
        return pa.table(cols)


def event_log_lines(batch: pd.DataFrame) -> pd.DataFrame:
    """(event_id, text): a value-defined raw-log line per event — the
    contact fields (email, phone, IPv4) are derived deterministically
    from the event's own columns (see FIXTURES.md), so the PII scrub
    over them is replayable in SQL without external data. Field
    presence varies per row (email iff user_id % 3 != 0, phone iff
    event_id % 2 == 0, ip iff (user_id + event_id) % 5 != 0) so the
    scrub counts carry real signal. Vectorized string assembly."""
    uid = batch["user_id"].to_numpy(np.int64)
    eid = batch["event_id"].to_numpy(np.int64)
    uid_s = pd.Series(uid).astype(str)
    eid_s = pd.Series(eid).astype(str)
    email = " <u" + uid_s + "@ex" + pd.Series(uid % 10).astype(str) + ".com>"
    phone = (
        " call 555-"
        + pd.Series(100 + uid % 900).astype(str)
        + "-"
        + pd.Series(eid % 10000).astype(str).str.zfill(4)
    )
    ip = (
        " from 10."
        + pd.Series(uid % 256).astype(str)
        + "."
        + pd.Series(eid % 256).astype(str)
        + "."
        + pd.Series((uid + eid) % 256).astype(str)
    )
    line = (
        "user "
        + uid_s
        + email.where(uid % 3 != 0, "")
        + phone.where(eid % 2 == 0, "")
        + ip.where((uid + eid) % 5 != 0, "")
        + " during "
        + pd.Series(batch["event_type"].to_numpy(object))
    )
    return pd.DataFrame({"event_id": eid, "text": line})


def source_quality(docs, num_buckets: int = 16):
    """(source, n_docs, mean_quality): per-source document counts and
    mean quality — the domain-level curation signal (filter or reweight
    whole sources by their aggregate quality, RefinedWeb-style).

    Exactness: per-doc quality is already rounded to 6 decimals, so it
    is summed as INTEGER micro-units — the aggregate is bit-exact and
    reduction-order-free (no float summation-order drift vs the SQL
    oracle). Scale shape: one map pass emits (source, n, q_int)
    partials pre-aggregated per block (bounded by sources × blocks, not
    docs); ONE bounded bucket shuffle keyed on source reduces both sums
    together — no driver join, no lineage re-execution."""
    from graphsetintersection_ray.stages.shuffle import _add_bucket, bucket_groups

    scorer = TextQualityScorer()

    def partial(batch: pd.DataFrame) -> pa.Table:
        q = scorer(batch).to_pandas()
        qi = np.rint(q["quality"].to_numpy(np.float64) * 1e6).astype(np.int64)
        g = (
            pd.DataFrame({"source": batch["source"].to_numpy(object), "qi": qi})
            .groupby("source", sort=False)
            .agg(n=("qi", "size"), q_int=("qi", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"].to_numpy(object), pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "q_int": pa.array(g["q_int"].to_numpy(np.int64)),
            }
        )

    out_schema = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("n_docs", pa.int64()),
            pa.field("mean_quality", pa.float64()),
        ]
    )

    def reduce_group(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        agg = (
            g.groupby("source", sort=True)
            .agg(n=("n", "sum"), q_int=("q_int", "sum"))
            .reset_index()
        )
        mean_q = round_half_away(
            agg["q_int"].to_numpy(np.float64)
            / (1e6 * agg["n"].to_numpy(np.float64)),
            6,
        )
        return pa.table(
            {
                "source": pa.array(agg["source"].to_numpy(object), pa.string()),
                "n_docs": pa.array(agg["n"].to_numpy(np.int64)),
                "mean_quality": pa.array(mean_q, pa.float64()),
            }
        )

    partials = docs.map_batches(partial, batch_format="pandas")
    bucketed = partials.map_batches(
        lambda b: _add_bucket(b, ["source"], num_buckets),
        batch_format="pandas",
    )
    return bucket_groups(bucketed, reduce_group, num_buckets)


def oov_rate(docs, vocab_k: int = 65536, num_buckets: int = 64):
    """(doc_id, n_tokens, n_oov, oov_rate): per-document out-of-vocab
    rate against the corpus's own top-``vocab_k`` token vocabulary
    (count DESC, token ASC ties) — the tokenizer-coverage signal of a
    training-data pipeline (docs full of rare junk tokens score high).
    Docs with zero tokens are absent (no coverage evidence).

    Scale shape: the vocab is built like ``ngram_counts`` — per-batch
    local counts, one pre-aggregated count shuffle keyed on token
    (cardinality = vocab size, not corpus rows), exact top-k via
    per-block partial top-ks — then broadcast once via ``ray.put``
    (vocab_k strings, fixed size); the per-doc pass is map-only."""
    import ray
    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import sum_by

    def local_counts(batch: pd.DataFrame) -> pa.Table:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        flat = [t for ts in toks for t in ts]
        vc = pd.Series(flat, dtype=object).value_counts()
        return pa.table(
            {
                "t": pa.array(vc.index.to_numpy(object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    summed = sum_by(
        docs.map_batches(local_counts, batch_format="pandas"),
        ["t"],
        "n",
        num_buckets=num_buckets,
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "t"], ascending=[False, True])
        return pa.Table.from_pandas(df.head(vocab_k), preserve_index=False)

    vocab = (
        summed.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "t"], ascending=[False, True])
        .head(vocab_k)["t"]
        .to_numpy(object)
    )
    vocab_ref = ray.put(set(vocab.tolist()))

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("n_oov", pa.int64()),
            pa.field("oov_rate", pa.float64()),
        ]
    )

    def per_doc(batch: pd.DataFrame) -> pa.Table:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        keep = lens > 0
        if not keep.any():
            return out_schema.empty_table()
        import itertools

        voc = ray.get(vocab_ref)
        flat = np.fromiter(
            itertools.chain.from_iterable(toks[keep]),
            dtype=object,
            count=int(lens[keep].sum()),
        )
        oov_flags = ~pd.Series(flat).isin(voc).to_numpy()
        doc_of = np.repeat(
            batch["doc_id"].to_numpy(np.int64)[keep], lens[keep]
        )
        g = pd.DataFrame({"doc_id": doc_of, "o": oov_flags.astype(np.int64)})
        agg = g.groupby("doc_id", sort=False)["o"].agg(["size", "sum"])
        n_tok = agg["size"].to_numpy(np.int64)
        n_oov = agg["sum"].to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(agg.index.to_numpy(np.int64), pa.int64()),
                "n_tokens": pa.array(n_tok),
                "n_oov": pa.array(n_oov),
                "oov_rate": pa.array(
                    round_half_away(n_oov / n_tok, 6), pa.float64()
                ),
            }
        )

    return docs.map_batches(per_doc, batch_format="pandas")


def corpus_report(
    docs,
    benchmark_mod: int = 97,
    num_buckets: int = 32,
    lang: str = "en",
    min_quality: float = 0.3,
    max_rep: float = 0.05,
):
    """(n_docs, total_tokens, mean_quality): the END-TO-END curation
    pipeline in one composed pass — keep documents that (1) pass the
    CurationFilter gates (English, quality floor, repetition ceiling),
    (2) are the canonical copy of their content fingerprint among the
    gate survivors (exact dedup, min doc_id wins), and (3) are not
    benchmark-contaminated (fingerprint anti-join vs the value-defined
    ``doc_id % benchmark_mod == 0`` slice of the FULL corpus) — then
    report the surviving corpus's size, token volume and mean quality
    as one row. The filter order (curate → dedup → decontaminate) is
    part of the contract and replayed identically by the SQL oracle.

    Scale shape: one fused map pass per block (all gate signals +
    fingerprint + token count + integer-micro-unit quality), one
    bounded fp-bucket shuffle for the dedup min-by, a broadcast
    blocklist built from the small benchmark slice, and a final
    aggregate over per-block partials (3 ints per block)."""
    import ray
    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import _add_bucket, bucket_groups

    scorer = TextQualityScorer()

    def features(batch: pd.DataFrame) -> pa.Table:
        q = scorer(batch).to_pandas()
        langs = lang_id(batch)["lang_pred"].to_numpy(zero_copy_only=False)
        rep = repetition_ratio(batch).to_pandas().set_index("doc_id")[
            "rep_ratio"
        ]
        rep_full = (
            pd.Series(batch["doc_id"].to_numpy(np.int64))
            .map(rep)
            .fillna(0.0)
            .to_numpy(np.float64)
        )
        quality = q["quality"].to_numpy(np.float64)
        keep = (
            (langs == lang)
            & (quality >= min_quality)
            & (rep_full <= max_rep)
        )
        fps = fingerprint(batch).to_pandas()
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(np.int64)[keep], pa.int64()
                ),
                "fp": pa.array(
                    fps["fp"].to_numpy(object)[keep], pa.string()
                ),
                "n_tokens": pa.array(
                    q["n_tokens"].to_numpy(np.int64)[keep]
                ),
                "qi": pa.array(
                    np.rint(quality[keep] * 1e6).astype(np.int64)
                ),
            }
        )

    def _bench_fps(b: pd.DataFrame) -> pa.Table:
        sel = b[(b["doc_id"].to_numpy(np.int64) % benchmark_mod) == 0]
        return fingerprint(sel).select(["fp"])

    bench = docs.map_batches(_bench_fps, batch_format="pandas").materialize()
    block_ref = ray.put(
        np.unique(bench.to_pandas()["fp"].to_numpy(dtype=object))
    )

    part_schema = pa.schema(
        [
            pa.field("n", pa.int64()),
            pa.field("tok", pa.int64()),
            pa.field("q_int", pa.int64()),
        ]
    )

    def dedup_and_partial(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return part_schema.empty_table()
        # canonical copy per fingerprint among gate survivors
        g = g.sort_values("doc_id").drop_duplicates("fp", keep="first")
        # decontaminate: drop fingerprints in the benchmark blocklist
        g = g[~g["fp"].isin(ray.get(block_ref))]
        return pa.table(
            {
                "n": pa.array([len(g)], pa.int64()),
                "tok": pa.array([int(g["n_tokens"].sum())], pa.int64()),
                "q_int": pa.array([int(g["qi"].sum())], pa.int64()),
            }
        )

    feats = docs.map_batches(features, batch_format="pandas")
    bucketed = feats.map_batches(
        lambda b: _add_bucket(b, ["fp"], num_buckets), batch_format="pandas"
    )
    parts = bucket_groups(bucketed, dedup_and_partial, num_buckets).to_pandas()
    if len(parts) == 0:  # zero gate survivors -> an all-zero report
        parts = pd.DataFrame({"n": [0], "tok": [0], "q_int": [0]})
    n = int(parts["n"].sum())
    return rd.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([n], pa.int64()),
                "total_tokens": pa.array(
                    [int(parts["tok"].sum())], pa.int64()
                ),
                "mean_quality": pa.array(
                    [
                        float(
                            round_half_away(
                                np.array(
                                    [parts["q_int"].sum() / (1e6 * max(n, 1))]
                                ),
                                6,
                            )[0]
                        )
                    ],
                    pa.float64(),
                ),
            }
        )
    )


def unigram_logprob(docs, num_buckets: int = 64):
    """(doc_id, n_tokens, avg_logprob): unigram language-model score —
    each token scored ln(count(token)/total_tokens) under the corpus's
    own unigram distribution, averaged per document (the KenLM-style
    perplexity-filtering signal: gibberish scores far below fluent
    text). Zero-token docs are absent.

    Exactness: per-token logprobs are rounded to 6 decimals and summed
    as INTEGER micro-units, so the per-doc aggregate is bit-exact and
    reduction-order-free (same trick as source_quality); the final
    average is one rounded division.

    Scale shape: the unigram table is one pre-aggregated count shuffle
    (cardinality = vocab size); the (token -> logprob-int) map is
    broadcast once via ``ray.put``; the per-doc pass is map-only."""
    import itertools

    import ray
    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import sum_by

    def local_counts(batch: pd.DataFrame) -> pa.Table:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        flat = [t for ts in toks for t in ts]
        vc = pd.Series(flat, dtype=object).value_counts()
        return pa.table(
            {
                "t": pa.array(vc.index.to_numpy(object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    vc = sum_by(
        docs.map_batches(local_counts, batch_format="pandas"),
        ["t"],
        "n",
        num_buckets=num_buckets,
    ).to_pandas()
    total = int(vc["n"].sum())
    lp_int = np.rint(
        round_half_away(
            np.log(vc["n"].to_numpy(np.float64) / total), 6
        )
        * 1e6
    ).astype(np.int64)
    lp_ref = ray.put(
        dict(zip(vc["t"].to_numpy(object).tolist(), lp_int.tolist()))
    )

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("avg_logprob", pa.float64()),
        ]
    )

    def per_doc(batch: pd.DataFrame) -> pa.Table:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        keep = lens > 0
        if not keep.any():
            return out_schema.empty_table()
        lp = ray.get(lp_ref)
        flat = np.fromiter(
            itertools.chain.from_iterable(toks[keep]),
            dtype=object,
            count=int(lens[keep].sum()),
        )
        # every token is in the table by construction (trained on the
        # same corpus); one vectorized map pass
        vals = pd.Series(flat).map(lp).to_numpy(np.int64)
        doc_of = np.repeat(
            batch["doc_id"].to_numpy(np.int64)[keep], lens[keep]
        )
        g = (
            pd.DataFrame({"doc_id": doc_of, "v": vals})
            .groupby("doc_id", sort=False)["v"]
            .agg(["size", "sum"])
        )
        n_tok = g["size"].to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(g.index.to_numpy(np.int64), pa.int64()),
                "n_tokens": pa.array(n_tok),
                "avg_logprob": pa.array(
                    round_half_away(
                        g["sum"].to_numpy(np.float64) / (1e6 * n_tok), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return docs.map_batches(per_doc, batch_format="pandas")


# Above this many distinct bigrams the (bigram → logprob) map stops being
# broadcast and the scoring switches to the hash-join path. At 10^12-turn
# scale the bigram vocabulary is unbounded (unlike the unigram vocab), so
# the join path is the production default shape; env-overridable so tests
# force it at sf scale.
BIGRAM_BROADCAST_MAX = int(os.environ.get("GRAFT_BIGRAM_BROADCAST_MAX", 2_000_000))


def _doc_bigrams(batch: pd.DataFrame):
    """flat (doc_id, 't1 t2') arrays for every within-doc adjacent token
    pair. Docs are whole rows, so pairs never cross batches."""
    import itertools

    toks = batch["text"].str.lower().str.findall(TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    flat = np.fromiter(
        itertools.chain.from_iterable(toks), dtype=object, count=total
    )
    doc_of = np.repeat(batch["doc_id"].to_numpy(np.int64), lens)
    same = doc_of[1:] == doc_of[:-1]
    pairs = flat[:-1][same] + " " + flat[1:][same]
    return doc_of[:-1][same], pairs


def bigram_logprob(docs, num_buckets: int = 64):
    """(doc_id, n_bigrams, avg_logprob): add-one-smoothed bigram-LM score
    — each adjacent token pair scored ln((c(t1,t2)+1) / (c(t1)+V)) under
    the corpus's own bigram counts (V = unigram vocab size), averaged per
    document. Docs with <2 tokens are absent. The conditional-fluency
    complement of ``unigram_logprob``: repeated rare-next-token text
    scores low even when its unigrams are common.

    Exactness: per-pair logprobs rounded to 6 decimals, summed as integer
    micro-units (reduction-order-free), one rounded division at the end —
    same contract as unigram_logprob, so the DuckDB oracle is exact.

    Scale shape: bigram/unigram counts are pre-aggregated count shuffles.
    Below ``BIGRAM_BROADCAST_MAX`` distinct bigrams the (pair → lpi) map
    is broadcast once and scoring is map-only. Above it — the 100 TB
    regime, where the bigram vocabulary keeps growing — scoring is one
    hash join of per-doc pair partials against the LM table keyed on the
    pair, then a pre-aggregated per-doc sum shuffle. Both paths are
    tested equal at a forced-zero threshold."""
    import ray
    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import sum_by

    def pair_counts(batch: pd.DataFrame) -> pa.Table:
        _, pairs = _doc_bigrams(batch)
        vc = pd.Series(pairs, dtype=object).value_counts()
        return pa.table(
            {
                "pair": pa.array(vc.index.to_numpy(object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    def tok_counts(batch: pd.DataFrame) -> pa.Table:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        vc = pd.Series(
            [t for ts in toks for t in ts], dtype=object
        ).value_counts()
        return pa.table(
            {
                "t": pa.array(vc.index.to_numpy(object), pa.string()),
                "n1": pa.array(vc.to_numpy(np.int64)),
            }
        )

    docs = docs.materialize()
    bg = sum_by(
        docs.map_batches(pair_counts, batch_format="pandas"),
        ["pair"], "n", num_buckets=num_buckets,
    ).materialize()
    ug = sum_by(
        docs.map_batches(tok_counts, batch_format="pandas"),
        ["t"], "n1", num_buckets=num_buckets,
    ).materialize()
    vocab = ug.count()
    n_bigram_kinds = bg.count()
    # join fan-out sized by the DATA, not the bucket constant: Ray's
    # hash-join reserves resources per partition, and a 64-partition join
    # over a few hundred rows stalls an 8-cpu cluster outright
    from graphsetintersection_ray.stages.shuffle import sized_buckets

    jp = sized_buckets(n_bigram_kinds)

    def lm_rows(t: pa.Table) -> pa.Table:
        """(pair, lpi): join already done — t has (pair, n, n1)."""
        c12 = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t["n1"].to_numpy(zero_copy_only=False).astype(np.float64)
        lpi = np.rint(
            round_half_away(np.log((c12 + 1.0) / (c1 + vocab)), 6) * 1e6
        ).astype(np.int64)
        return pa.table({"pair": t["pair"], "lpi": pa.array(lpi)})

    def with_t1(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t1 = pc.list_element(pc.split_pattern(t["pair"], " "), 0)
        return pa.table({"pair": t["pair"], "n": t["n"], "t1": t1})

    # compact_blocks: the bucket shuffle emits column-less empty blocks
    # that crash Acero hash joins ("no match for key field") — every
    # join input is normalized through it
    from graphsetintersection_ray.stages.graph_build import compact_blocks

    lm = (
        compact_blocks(bg.map_batches(with_t1, batch_format="pyarrow"))
        .join(
            compact_blocks(ug),
            join_type="inner",
            num_partitions=jp,
            on=("t1",),
            right_on=("t",),
        )
        .map_batches(lm_rows, batch_format="pyarrow")
        .materialize()
    )

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_bigrams", pa.int64()),
            pa.field("avg_logprob", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        nb = t["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_bigrams": pa.array(nb),
                "avg_logprob": pa.array(
                    round_half_away(s / (1e6 * nb), 6), pa.float64()
                ),
            }
        )

    if n_bigram_kinds <= BIGRAM_BROADCAST_MAX:
        lm_df = lm.to_pandas()
        lm_ref = ray.put(
            dict(
                zip(
                    lm_df["pair"].to_numpy(object).tolist(),
                    lm_df["lpi"].to_numpy(np.int64).tolist(),
                )
            )
        )

        def per_doc(batch: pd.DataFrame) -> pa.Table:
            doc_of, pairs = _doc_bigrams(batch)
            if len(pairs) == 0:
                return out_schema.empty_table()
            lpm = ray.get(lm_ref)
            vals = pd.Series(pairs).map(lpm).to_numpy(np.int64)
            g = (
                pd.DataFrame({"doc_id": doc_of, "v": vals})
                .groupby("doc_id", sort=False)["v"]
                .agg(["size", "sum"])
            )
            return finalize(
                pa.table(
                    {
                        "doc_id": pa.array(g.index.to_numpy(np.int64)),
                        "n_bigrams": pa.array(g["size"].to_numpy(np.int64)),
                        "s": pa.array(g["sum"].to_numpy(np.int64)),
                    }
                )
            )

        return docs.map_batches(per_doc, batch_format="pandas")

    # join path: per-doc pair partials ⋈ LM on the pair, then one
    # pre-aggregated per-doc sum shuffle
    def doc_pair_partials(batch: pd.DataFrame) -> pa.Table:
        doc_of, pairs = _doc_bigrams(batch)
        if len(pairs) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pair": pa.array([], pa.string()),
                    "k": pa.array([], pa.int64()),
                }
            )
        g = (
            pd.DataFrame({"doc_id": doc_of, "pair": pairs})
            .groupby(["doc_id", "pair"], sort=False)
            .size()
            .reset_index(name="k")
        )
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "pair": pa.array(g["pair"].to_numpy(object), pa.string()),
                "k": pa.array(g["k"].to_numpy(np.int64)),
            }
        )

    scored = (
        compact_blocks(
            docs.map_batches(doc_pair_partials, batch_format="pandas")
        )
        .join(
            compact_blocks(lm),
            join_type="inner",
            num_partitions=jp,
            on=("pair",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_bigrams": t["k"],
                    "s": pa.array(
                        t["k"].to_numpy(zero_copy_only=False)
                        * t["lpi"].to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    summed = sum_by(
        scored, ["doc_id"], ["n_bigrams", "s"], num_buckets=num_buckets
    )
    return summed.map_batches(finalize, batch_format="pyarrow")


def sequence_pack(docs, seq_len: int = 2048):
    """Greedy fixed-length sequence-packing schedule over the corpus.

    Training-data packing: documents are concatenated in ``doc_id`` order
    and each document is assigned to the training sequence (pack) that
    contains its FIRST token — ``pack_id = start_offset // seq_len`` with
    ``start_offset`` = Σ n_tokens over all lower-doc_id docs. Output
    (doc_id, n_tokens, start_offset, pack_id), one row per document.

    This is a distributed SCAN (ordered prefix sum), the primitive Ray
    Data lacks natively:

    1. map-only token counts, materialized once as the reduced
       (doc_id, n_tokens) table (16 B/doc — ~160 GB for 10^10 docs,
       object-store-resident, never the raw text twice);
    2. ORDER-PRESERVING range buckets over doc_id (monotone
       ``(id-lo)*B // span``, so bucket-local order is global order),
       per-bucket token totals pre-aggregated per block and reduced on
       the driver — O(#buckets) rows, the classic two-phase scan;
    3. exclusive per-bucket global offsets broadcast via ``ray.put``;
       each bucket then cumsums locally and adds its offset.

    No all-to-all beyond the single bounded bucket sort; driver state is
    one int64 per bucket.
    """
    import ray
    import ray.data as rd

    from graphsetintersection_ray.stages.shuffle import (
        bucket_groups,
        sized_buckets,
    )

    out_schema = pa.schema(
        {
            "doc_id": pa.int64(),
            "n_tokens": pa.int64(),
            "start_offset": pa.int64(),
            "pack_id": pa.int64(),
        }
    )
    counts = docs.map_batches(
        token_count, batch_format="pandas"
    ).materialize()

    def id_partials(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "lo": pd.Series([], dtype=np.int64),
                    "hi": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        ids = b["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {"lo": [ids.min()], "hi": [ids.max()], "n": [len(b)]}
        )

    # O(#blocks) driver rows: id range + row count in one pass
    parts = counts.map_batches(id_partials, batch_format="pandas").to_pandas()
    if len(parts) == 0 or parts["n"].sum() == 0:
        return rd.from_arrow(out_schema.empty_table())
    lo = int(parts["lo"].min())
    hi = int(parts["hi"].max())
    span = hi - lo + 1
    num_buckets = sized_buckets(int(parts["n"].sum()))

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        # monotone in doc_id -> bucket-local order is global order
        return (ids - lo) * num_buckets // span

    def local_totals(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "__bucket": bucket_of(b["doc_id"].to_numpy(np.int64)),
                    "n_tokens": b["n_tokens"].to_numpy(np.int64),
                }
            )
            .groupby("__bucket", sort=False)["n_tokens"]
            .sum()
            .reset_index()
        )
        return g

    # per-bucket corpus token totals -> exclusive prefix on the driver
    # (<= num_buckets x #blocks tiny int rows cross the wire)
    tot = counts.map_batches(local_totals, batch_format="pandas").to_pandas()
    tot = tot.groupby("__bucket")["n_tokens"].sum()
    offsets = np.zeros(num_buckets + 1, np.int64)
    offsets[tot.index.to_numpy(np.int64) + 1] = tot.to_numpy(np.int64)
    offsets = np.cumsum(offsets)  # offsets[b] = tokens before bucket b
    off_ref = ray.put(offsets)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = bucket_of(b["doc_id"].to_numpy(np.int64))
        return b

    def pack(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values("doc_id")
        ntok = g["n_tokens"].to_numpy(np.int64)
        off = ray.get(off_ref)[int(g["__bucket"].iloc[0])]
        start = off + np.cumsum(ntok) - ntok
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "n_tokens": pa.array(ntok),
                "start_offset": pa.array(start),
                "pack_id": pa.array(start // seq_len),
            }
        )

    return bucket_groups(
        counts.map_batches(add_bucket, batch_format="pandas"),
        pack,
        num_buckets,
    )


def doc_chunks(docs, chunk_len: int = 64, overlap: int = 16):
    """Overlapping fixed-size chunk schedule per document (map-only).

    The RAG/long-context prep step: each document's token stream is cut
    into windows of ``chunk_len`` tokens advancing by ``stride =
    chunk_len - overlap``; the final window is short. Output one row per
    chunk: (doc_id, chunk_idx, chunk_start, chunk_len) — the schedule a
    downstream slicing stage consumes. Zero-token docs produce no
    chunks; a doc with n <= chunk_len tokens produces exactly one.

    Fully vectorized flat expansion (repeat/arange over the batch), no
    shuffle, no per-row Python. The SQL oracle replays it with a lateral
    ``UNNEST(range(n_chunks))``.
    """
    if overlap >= chunk_len:
        raise ValueError("overlap must be < chunk_len")
    stride = chunk_len - overlap

    def per_doc(batch: pd.DataFrame) -> pa.Table:
        n = batch["text"].str.count(TOKEN_RE).to_numpy(np.int64)
        ids = batch["doc_id"].to_numpy(np.int64)
        nc = np.where(
            n <= 0,
            0,
            np.where(n <= chunk_len, 1, (n - chunk_len + stride - 1) // stride + 1),
        ).astype(np.int64)
        total = int(nc.sum())
        doc_of = np.repeat(ids, nc)
        n_of = np.repeat(n, nc)
        first = np.repeat(np.cumsum(nc) - nc, nc)
        idx = np.arange(total, dtype=np.int64) - first
        start = idx * stride
        return pa.table(
            {
                "doc_id": pa.array(doc_of),
                "chunk_idx": pa.array(idx),
                "chunk_start": pa.array(start),
                "chunk_len": pa.array(np.minimum(chunk_len, n_of - start)),
            }
        )

    return docs.map_batches(per_doc, batch_format="pandas")


def vocab_growth(docs, n_points: int = 8, num_buckets: int = 64):
    """(doc_threshold, vocab): the Heaps-law vocabulary-growth curve —
    distinct lowercase tokens whose FIRST occurrence has doc_id ≤ t, at
    ``n_points`` evenly spaced doc_id thresholds. The tokenizer-budget /
    corpus-diversity signal of a training-data audit.

    Scale shape: per-batch (token → min doc_id) combiner, ONE bucketed
    min-reduce keyed by token (shuffle volume = distinct tokens per
    batch, never corpus token occurrences), then a map-only searchsorted
    histogram of first-occurrence ids against the threshold grid and an
    n_points-row sum. No corpus sort, no driver materialization of the
    vocabulary."""
    import itertools

    from graphsetintersection_ray.stages.shuffle import (
        _add_bucket,
        bucket_groups,
        sum_by,
    )

    md = int(docs.max("doc_id") or 0)
    ts = np.unique(
        (np.arange(1, n_points + 1, dtype=np.int64) * md) // n_points
    )

    def tok_first(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        total = int(lens.sum())
        if total == 0:
            return _add_bucket(
                pd.DataFrame(
                    {
                        "tok": pd.Series([], dtype=object),
                        "first_doc": pd.Series([], dtype=np.int64),
                    }
                ),
                ["tok"],
                num_buckets,
            )
        flat = np.fromiter(
            itertools.chain.from_iterable(toks), dtype=object, count=total
        )
        doc_of = np.repeat(batch["doc_id"].to_numpy(np.int64), lens)
        g = (
            pd.DataFrame({"tok": flat, "first_doc": doc_of})
            .groupby("tok", sort=False)["first_doc"]
            .min()
            .reset_index()
        )
        return _add_bucket(g, ["tok"], num_buckets)

    def reduce_min(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "first_doc": pa.array([], pa.int64()),
                }
            )
        g = (
            t.to_pandas()
            .groupby("tok", sort=False)["first_doc"]
            .min()
            .reset_index()
        )
        return pa.table(
            {
                "tok": pa.array(g["tok"].to_numpy(object), pa.string()),
                "first_doc": pa.array(g["first_doc"].to_numpy(np.int64)),
            }
        )

    first_seen = bucket_groups(
        docs.map_batches(tok_first, batch_format="pandas"),
        reduce_min,
        num_buckets,
        batch_format="pyarrow",
    )

    def hist(t: pa.Table) -> pa.Table:
        fd = np.sort(t["first_doc"].to_numpy(zero_copy_only=False))
        n = np.searchsorted(fd, ts, side="right")
        return pa.table(
            {
                "doc_threshold": pa.array(ts),
                "vocab": pa.array(n.astype(np.int64)),
            }
        )

    return sum_by(
        first_seen.map_batches(hist, batch_format="pyarrow"),
        ["doc_threshold"],
        "vocab",
        out_col="vocab",
        num_buckets=1,
    )


# fixed, public logistic weights over the SQL-reproducible quality
# features — a deterministic stand-in for a fasttext-style quality
# classifier (the features and rounding match text_quality exactly, so
# the engine and the DuckDB oracle compute identical inputs)
QUALITY_LR_BIAS = -1.0
QUALITY_LR_W_ALPHA = 2.5
QUALITY_LR_W_STOP = 1.5
QUALITY_LR_W_LEN = 1.0


class QualityLogistic:
    """Actor-pool stage — (doc_id, lr_score): σ(w·x + b) over the
    rounded quality features (alpha_ratio, stopword_ratio,
    min(1, n_tokens/500)); the model-scoring stage of a curation
    pipeline (weights are constants here; a learned model would load
    once per actor in __init__ exactly the same way)."""

    def __init__(self) -> None:
        self.scorer = TextQualityScorer()

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        feats = self.scorer(batch)
        alpha = feats["alpha_ratio"].to_numpy(zero_copy_only=False)
        stop = feats["stopword_ratio"].to_numpy(zero_copy_only=False)
        n_tokens = feats["n_tokens"].to_numpy(zero_copy_only=False)
        z = (
            QUALITY_LR_BIAS
            + QUALITY_LR_W_ALPHA * alpha
            + QUALITY_LR_W_STOP * stop
            + QUALITY_LR_W_LEN * np.minimum(1.0, n_tokens / 500.0)
        )
        score = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                "doc_id": feats["doc_id"],
                "lr_score": pa.array(round_half_away(score, 6), pa.float64()),
            }
        )


def bm25_scores(
    docs,
    query_terms: tuple[str, ...] = ("spark", "sort", "merge"),
    k1: float = 1.2,
    b: float = 0.75,
    num_buckets: int = 32,
) -> rd.Dataset:
    """(doc_id, score): Okapi BM25 relevance of every document matching
    at least one of ``query_terms`` — the ranked-retrieval primitive a
    curation/decontamination pipeline runs against a benchmark query
    set. idf is the Lucene non-negative variant
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``.

    Exactness: the per-term component is computed with the SAME
    parenthesization as the SQL oracle (bit-identical IEEE doubles),
    rounded to integer micro-units per (doc, term), and summed as
    int64 — so the per-doc score is reduction-order-free at any
    parallelism.

    Scale shape: tokenize is map-only; only rows for QUERY terms leave
    the map (shuffle volume ~ matching docs x |query|, not tokens); df
    is a |query|-row reduce; avgdl comes from per-batch (token, doc)
    count partials folded on the driver (O(#blocks) rows); the final
    per-doc sum is one bounded doc-bucketed shuffle of the matching
    rows."""
    import ray

    from graphsetintersection_ray.stages.shuffle import sum_by

    qset = sorted(set(query_terms))
    n_docs = docs.count()
    if n_docs == 0:
        return rd.from_arrow(
            pa.schema(
                [pa.field("doc_id", pa.int64()), pa.field("score", pa.float64())]
            ).empty_table()
        )

    def tf_rows(batch: pd.DataFrame) -> pa.Table:
        import itertools

        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        total = int(lens.sum())
        dids = batch["doc_id"].to_numpy(np.int64)
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                }
            )
        flat = np.fromiter(
            itertools.chain.from_iterable(toks), dtype=object, count=total
        )
        doc_of = np.repeat(dids, lens)
        dl_of = np.repeat(lens, lens)
        hit = np.isin(flat, qset)
        g = (
            pd.DataFrame(
                {
                    "doc_id": doc_of[hit],
                    "term": flat[hit],
                    "dl": dl_of[hit],
                }
            )
            .groupby(["doc_id", "term", "dl"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "term": pa.array(g["term"].to_numpy(object), pa.string()),
                "tf": pa.array(g["tf"].to_numpy(np.int64)),
                "dl": pa.array(g["dl"].to_numpy(np.int64)),
            }
        )

    def dl_partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        return pd.DataFrame(
            {
                "tok_sum": [int(toks.str.len().sum())],
                "n": [len(batch)],
            }
        )

    parts = docs.map_batches(dl_partials, batch_format="pandas").to_pandas()
    total_tokens = int(parts["tok_sum"].sum())
    avgdl = total_tokens / n_docs

    matches = docs.map_batches(
        tf_rows, batch_format="pandas"
    ).materialize()

    # df per query term: (doc, term) rows are distinct by construction
    ones = matches.map_batches(
        lambda t: pa.table(
            {
                "term": t["term"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    df_tbl = sum_by(ones, ["term"], "one", out_col="df", num_buckets=1)
    df_map = {
        r["term"]: int(r["df"]) for r in df_tbl.take_all()
    }
    df_ref = ray.put(df_map)

    def micro(t: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        terms = t["term"].to_numpy(zero_copy_only=False)
        dfv = np.array([dfm[x] for x in terms], np.float64)
        # parenthesization mirrored by the SQL oracle — keep in sync
        idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
        comp = idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / avgdl)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "micro": pa.array(
                    round_half_away(comp * 1e6, 0).astype(np.int64)
                ),
            }
        )

    summed = sum_by(
        matches.map_batches(micro, batch_format="pyarrow"),
        ["doc_id"],
        "micro",
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        m = t["micro"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "score": pa.array(m / 1e6, pa.float64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")
