"""Text-analysis columns for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen) with exact DuckDB SQL twins —
these run in the hot path of a 100 TB corpus scan, so no Python is allowed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for an n-gram-free heuristic lang ID.
# (A real deployment swaps in fastText/cld3 behind the same column contract.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "por"],
}

_WORD_SPLIT = r"\s+"


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text, empty strings dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), _WORD_SPLIT), lambda t: t != "")


def token_count_col(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def word_ngrams_col(toks: Column, n: int) -> Column:
    """Overlapping word n-grams joined by single spaces; [] when the doc is
    shorter than n tokens. sequence() is guarded: Spark's sequence(1, 0)
    counts DOWN, so the short-doc case must short-circuit to array().

    The single definition shared by the quality (Gopher repetition),
    decontamination (GPT-3 13-gram) and span-dedup (ExactSubstr k-gram)
    families — one place for the short-doc guard."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_ish_token_count_col(text: Column | str) -> Column:
    """Subword-ish token count: split on the GPT-2-style pretokenizer boundary
    (word / number / punctuation runs). Overcounts vs a real BPE by a stable
    factor — good enough for budget accounting at corpus scale."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), 0)
    return F.size(pieces)


def _isin_pred(words: list[str]):
    # closure factory: higher-order fns infer lambda arity, so the predicate
    # must be a genuine 1-arg lambda (no default-arg capture tricks).
    captured = list(words)
    return lambda t: t.isin(*captured)


def lang_score_cols(text: Column | str) -> list[Column]:
    """Per-language marker-hit counts; argmax = predicted language."""
    toks = tokens_col(text)
    return [
        F.size(F.filter(toks, _isin_pred(words))).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]


def lang_id_col(text: Column | str) -> Column:
    """Predicted language = argmax marker count, 'und' when all zero.
    Ties break by the fixed language order (en, de, fr, es) — deterministic."""
    toks = tokens_col(text)
    scores = [
        (lang, F.size(F.filter(toks, _isin_pred(words))))
        for lang, words in LANG_MARKERS.items()
    ]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:  # fixed order, strict > keeps first-wins ties
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def quality_score_col(text: Column | str) -> Column:
    """Heuristic doc quality in [0,1]: mean word length sanity, alpha ratio,
    stopword presence. Mirrors Gopher/C4-style filters as one expression."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    mean_wl = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    en = LANG_MARKERS["en"]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*en)))
    stop_ratio = F.when(n_tok > 0, stop_hits.cast("double") / n_tok).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((wl_ok + alpha_ratio + F.least(stop_ratio * 5.0, F.lit(1.0))) / 3.0, 6)


def fingerprint_col(text: Column | str, k: int = 8) -> Column:
    """Document fingerprint: md5 of the first-k + last-k normalized tokens —
    a cheap rolling-hash-style near-head/tail signature for exact-ish dedup."""
    toks = tokens_col(text)
    head = F.slice(toks, 1, k)
    n = F.size(toks)
    tail = F.when(n > k, F.slice(toks, -k, k)).otherwise(F.array())
    return F.md5(F.concat_ws(" ", F.concat(head, tail)))
