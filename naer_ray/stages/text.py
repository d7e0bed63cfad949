"""Text-analysis operators for training-data pipelines.

* :func:`lang_id` — character-n-gram + stopword-profile heuristic
  language ID (no external models; deterministic).
* :func:`quality_score` — length / punctuation / stopword / repetition
  heuristics composed into a [0, 1] score.
* :func:`token_counts` — whitespace tokens plus a BPE-ish regex token
  count (the GPT-2 pre-tokenizer pattern, public).
* :func:`fingerprint` — 64-bit rolling-hash document fingerprint with
  winnowing (k-gram window minima), the classic near-dup sketch.

All stages are per-batch ``map_batches`` transforms over Arrow batches;
profiles/regexes are module-level constants compiled once per process.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..testdata import hash_u32

# minimal seed stopword profiles (public common-word lists, truncated)
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "para", "que"},
    "it": {"il", "la", "gli", "e", "è", "un", "una", "in", "per", "che"},
}

# common character bigrams per language (tiny seed profiles)
_CHAR_PROFILES: dict[str, set[str]] = {
    "en": {"th", "he", "in", "er", "an"},
    "de": {"en", "er", "ch", "de", "ei"},
    "fr": {"es", "le", "de", "en", "re"},
    "es": {"de", "en", "el", "la", "os"},
    "it": {"di", "la", "er", "on", "re"},
}

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# GPT-2 pre-tokenizer pattern (public), simplified for stdlib `re`
_BPE_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


def detect_language(text: str) -> tuple[str, float]:
    """Best language + confidence via stopword hits and char-bigram hits."""
    toks = [w.lower() for w in _WORD_RE.findall(text)][:200]
    tl = text.lower()[:500]
    bigrams = {tl[i : i + 2] for i in range(len(tl) - 1)}
    best, best_score = "unknown", 0.0
    total = max(len(toks), 1)
    for lang in _LANG_PROFILES:
        stop_hits = sum(1 for w in toks if w in _LANG_PROFILES[lang])
        char_hits = len(bigrams & _CHAR_PROFILES[lang])
        score = stop_hits / total + 0.02 * char_hits
        if score > best_score:
            best, best_score = lang, score
    if best_score < 0.02:
        best = "unknown"
    return best, round(best_score, 6)


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    def f(batch: pa.Table) -> pa.Table:
        langs, confs = [], []
        for t in batch[text_col].to_pylist():
            lang, c = detect_language(t or "")
            langs.append(lang)
            confs.append(c)
        return pa.table(
            {
                id_col: batch[id_col],
                "pred_lang": pa.array(langs, pa.string()),
                "lang_confidence": pa.array(confs, pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=8192)


def quality_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Heuristic quality in [0,1]: length, alpha ratio, stopword presence,
    repetition (distinct-token ratio)."""
    stop = _LANG_PROFILES["en"]

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out = []
        for t in batch[text_col].to_pylist():
            t = t or ""
            toks = t.split()
            n = len(toks)
            if n == 0:
                out.append(0.0)
                continue
            alpha = sum(c.isalpha() or c.isspace() for c in t) / max(len(t), 1)
            stop_ratio = sum(1 for w in toks if w.lower() in stop) / n
            uniq_ratio = len(set(toks)) / n
            length_score = min(n / 50.0, 1.0)
            score = (
                0.3 * length_score
                + 0.25 * alpha
                + 0.2 * min(stop_ratio * 4, 1.0)
                + 0.25 * uniq_ratio
            )
            out.append(round(min(max(score, 0.0), 1.0), 6))
        return pa.table(
            {id_col: pa.array(ids), "quality": pa.array(out, pa.float64())}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=8192)


def token_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    def f(batch: pa.Table) -> pa.Table:
        ws, bpe = [], []
        for t in batch[text_col].to_pylist():
            t = t or ""
            ws.append(len(t.split()))
            bpe.append(len(_BPE_RE.findall(t)))
        return pa.table(
            {
                id_col: batch[id_col],
                "ws_tokens": pa.array(ws, pa.int64()),
                "bpe_tokens": pa.array(bpe, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=8192)


def winnow_fingerprint(text: str, k: int = 8, window: int = 4) -> int:
    """Winnowing fingerprint: min rolling k-gram hash per window, XOR-folded.

    Standard document-fingerprinting scheme (Schleimer et al. 2003 —
    public algorithm); deterministic via FNV-1a over utf-8 bytes.
    Fully vectorized: the k-byte FNV runs as k numpy passes over a
    sliding byte window (the dedup._stable_shingles technique), window
    minima via a second sliding view, and the golden-ratio mix as one
    array multiply (array uint ops wrap silently — no scalar-overflow
    RuntimeWarning).
    """
    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        return hash_u32(text.lower())
    win = np.lib.stride_tricks.sliding_window_view(data, k)
    h = np.full(win.shape[0], 2166136261, dtype=np.uint32)
    prime = np.uint32(16777619)
    for j in range(k):
        h = (h ^ win[:, j]) * prime
    hashes = h.astype(np.uint64)
    if len(hashes) > window:
        hashes = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
    mixed = np.unique(hashes) * np.uint64(0x9E3779B97F4A7C15)
    return int(np.bitwise_xor.reduce(mixed))


def fingerprints(ds, text_col: str = "text", id_col: str = "doc_id"):
    def f(batch: pa.Table) -> pa.Table:
        fps = [winnow_fingerprint(t or "") for t in batch[text_col].to_pylist()]
        return pa.table(
            {id_col: batch[id_col], "fingerprint": pa.array(fps, pa.uint64())}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=8192)
