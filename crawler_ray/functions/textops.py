"""Text-analysis batch kernels for training-data pipelines.

All functions are vectorized ``map_batches`` bodies over the ``documents``
table (doc_id, text, lang, source, n_chars). They extend the reference's
scalar-function surface (SURVEY.md §2.8) with the operations a large-scale
corpus pipeline needs: token counting, quality scoring, language ID,
fingerprinting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_ray.hashing import xxh64_array

TOKEN_RE = r"[A-Za-z0-9_]+"
PUNCT_RE = r"[.,!?;:]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "was", "on", "as"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "se", "las", "por", "un", "una", "con"},
    "de": {"der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist", "des", "im", "nicht", "ein"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une", "que", "est", "dans", "qui"},
}


def token_count(texts: pd.Series) -> np.ndarray:
    """# of \\w+ token matches per text (BPE-ish word splitting)."""
    return texts.str.count(TOKEN_RE).fillna(0).to_numpy(np.int64)


def punct_ratio(texts: pd.Series, n_chars: pd.Series | None = None) -> np.ndarray:
    n = (n_chars if n_chars is not None else texts.str.len()).to_numpy(np.float64)
    p = texts.str.count(PUNCT_RE).fillna(0).to_numpy(np.float64)
    return np.divide(p, n, out=np.zeros_like(p), where=n > 0)


def _stop_hits(words: pd.Series, stopset: set) -> tuple[np.ndarray, np.ndarray]:
    """(hits, totals) per row for a token-list Series, fully vectorized:
    explode to one row per token, Series.isin against the stopword set,
    groupby(row).sum — no per-document Python."""
    n = len(words)
    ex = words.explode().dropna()
    if len(ex) == 0:
        return np.zeros(n), np.zeros(n)
    hits = ex.isin(stopset).groupby(level=0).sum()
    totals = ex.groupby(level=0).size()
    idx = words.index
    return (hits.reindex(idx).fillna(0).to_numpy(np.float64),
            totals.reindex(idx).fillna(0).to_numpy(np.float64))


def quality_score(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic quality features: length, token count, punct/stopword/digit
    ratios and a composite [0,1] score."""
    out = batch[["doc_id"]].copy()
    text = batch["text"].astype("string")
    n = text.str.len().to_numpy(np.float64)
    toks = token_count(text)
    out["n_chars"] = n.astype(np.int64)
    out["n_tokens"] = toks
    out["punct_ratio"] = punct_ratio(text)
    words = text.str.lower().str.findall(TOKEN_RE)
    hits, totals = _stop_hits(words, set().union(*_STOPWORDS.values()))
    out["stop_ratio"] = np.divide(hits, totals, out=np.zeros_like(hits), where=totals > 0)
    out["digit_ratio"] = np.divide(
        text.str.count(r"\d").fillna(0).to_numpy(np.float64), n, out=np.zeros(len(n)), where=n > 0
    )
    # composite: long enough, words present, not digit/punct soup
    out["score"] = np.clip(
        np.minimum(n / 200.0, 1.0) * (1.0 - out["digit_ratio"]) * (1.0 - np.minimum(out["punct_ratio"] * 4, 1.0)),
        0.0, 1.0,
    )
    return out


def lang_id(batch: pd.DataFrame) -> pd.DataFrame:
    """n-gram/stopword language-ID heuristic → lang_pred per doc.

    CJK character fraction decides 'zh'; otherwise the stopword set with the
    most hits among en/es/de/fr wins (ties → alphabetical; no hits → 'en').
    """
    text = batch["text"].astype("string")
    n = text.str.len().to_numpy(np.float64)
    cjk = text.str.count(r"[一-鿿]").fillna(0).to_numpy(np.float64)
    cjk_frac = np.divide(cjk, n, out=np.zeros_like(cjk), where=n > 0)
    words = text.str.lower().str.findall(TOKEN_RE)
    # per-language stopword hit counts, vectorized (exploded-token isin +
    # groupby); winner = argmax over alphabetically-sorted languages (argmax
    # takes the first max ⇒ alphabetical tie-break), zero hits ⇒ 'en'
    langs = sorted(_STOPWORDS)
    score_mat = np.stack([_stop_hits(words, _STOPWORDS[lang])[0] for lang in langs], axis=1)
    best = np.asarray(langs, object)[score_mat.argmax(axis=1)]
    preds = np.where(cjk_frac > 0.05, "zh",
                     np.where(score_mat.max(axis=1) > 0, best, "en"))
    out = batch[["doc_id"]].copy()
    if "lang" in batch.columns:
        out["lang"] = batch["lang"]
    out["lang_pred"] = preds
    return out


def fingerprint(batch: pd.DataFrame, window: int = 8) -> pd.DataFrame:
    """Rolling-hash document fingerprint: xxh64 of each ``window``-gram of
    the token sequence, reduced by min (winnowing-lite). Equal fingerprints
    ⇒ near-certain shared window."""
    text = batch["text"].astype("string")
    words = text.str.lower().str.findall(TOKEN_RE)
    fps = np.zeros(len(batch), np.uint64)
    for i, ws in enumerate(words):
        ws = list(ws) if not isinstance(ws, list) else ws
        if not ws:
            continue
        grams = [" ".join(ws[j : j + window]) for j in range(max(1, len(ws) - window + 1))]
        fps[i] = xxh64_array(grams).min()
    out = batch[["doc_id"]].copy()
    out["fingerprint"] = fps.astype(np.int64)  # int64 column (bit pattern)
    return out


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Intra-document repetition features (Gopher-style quality filter,
    Rae et al. 2021 "Scaling Language Models" app. A1.1, public): per doc
    the duplicate-token fraction ``1 - distinct/total`` and the share of
    the single most frequent token. Each doc is independent, so the
    operator is an embarrassingly-parallel ``map_batches`` — no shuffle at
    any corpus size. Vectorized as one explode + two hash groupbys per
    batch (no per-row Python).

    Token = ``string_split(text, ' ')`` (the documents fixture is strictly
    single-space-joined alnum tokens, so this matches the DuckDB oracle
    exactly and no float ever depends on regex parity).
    """
    ex = (batch[["doc_id"]]
          .assign(tok=batch["text"].astype("string").str.split(" "))
          .explode("tok"))
    per_tok = ex.groupby(["doc_id", "tok"], sort=False).size().rename("c").reset_index()
    g = per_tok.groupby("doc_id", sort=False)["c"]
    agg = pd.DataFrame({"total": g.sum(), "distinct": g.count(), "top": g.max()})
    total = agg["total"].to_numpy(np.float64)
    out = pd.DataFrame({
        "doc_id": agg.index.to_numpy(np.int64),
        "n_tokens": agg["total"].to_numpy(np.int64),
        "dup_frac": 1.0 - agg["distinct"].to_numpy(np.float64) / total,
        "top_share": agg["top"].to_numpy(np.float64) / total,
    })
    # flag on the RAW ratio: engine and oracle derive it from the identical
    # IEEE division of identical ints, so the comparison is exact; callers
    # round the ratios for display AFTER any thresholding
    out["flagged"] = ((out["dup_frac"] > 0.75) | (out["top_share"] > 0.2)).astype(np.int64)
    return out
