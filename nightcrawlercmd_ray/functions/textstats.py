"""Text analysis primitives for training-data pipelines.

These go beyond the reference (which has no text analytics besides word
extraction) and provide the language-ID / quality-scoring / token-counting /
fingerprinting operators a 100 TB web-text pipeline needs. All functions are
pure and deterministic; the Ray stages in ``stages/textops.py`` vectorize them
per batch.
"""

from __future__ import annotations

import re

from .urlnorm import hash64

WORD_RE = re.compile(r"[\wäöüÄÖÜß]+", re.UNICODE)
# BPE-ish pretokenizer: contractions, letter runs, digit runs, punct runs
BPE_RE = re.compile(r"'[a-z]{1,2}|[^\W\d_]+|\d{1,3}|[^\s\w]+", re.UNICODE)
SENT_RE = re.compile(r"[.!?]+[\s$]")

# n-gram-free stopword heuristic over the three corpus languages (FIXTURES.md:
# lang ∈ en/de/fr round-robin). Larger lists cost accuracy nothing here.
_STOPWORDS = {
    "en": {
        "the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
        "on", "are", "with", "as", "his", "they", "be", "at", "this", "have",
        "from", "or", "had", "by", "not", "but", "what", "all", "were", "when",
    },
    "de": {
        "der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
        "auf", "für", "von", "den", "des", "dem", "sich", "auch", "als",
        "es", "an", "werden", "aus", "wird", "bei", "einer", "um", "zu",
    },
    "fr": {
        "le", "la", "les", "et", "est", "pas", "une", "un", "des", "du",
        "dans", "pour", "que", "qui", "sur", "avec", "par", "au", "plus",
        "ce", "il", "elle", "sont", "mais", "ou", "se", "ne", "vous",
    },
}


def tokens(text: str) -> list[str]:
    return WORD_RE.findall(text.lower())


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    return len(text.split())


def token_count_bpe(text: str) -> int:
    """BPE-ish pretoken count (approximates LLM token budget ~1 pretoken/token)."""
    return len(BPE_RE.findall(text.lower()))


def detect_lang(text: str) -> str:
    """Stopword-vote language ID over en/de/fr; 'und' (undetermined) when no
    stopword hits. Ties broken by language code order (deterministic)."""
    toks = tokens(text)
    if not toks:
        return "und"
    best_lang, best_score = "und", 0
    for lang in sorted(_STOPWORDS):
        score = sum(1 for t in toks if t in _STOPWORDS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def quality_features(text: str) -> dict[str, float]:
    """Deterministic quality features (Gopher/C4-style heuristics, from the
    published filtering literature): length, word stats, symbol ratios."""
    n_chars = len(text)
    toks = tokens(text)
    n_tokens = len(toks)
    n_alpha = sum(1 for c in text if c.isalpha())
    n_digit = sum(1 for c in text if c.isdigit())
    n_upper = sum(1 for c in text if c.isupper())
    n_space = sum(1 for c in text if c.isspace())
    n_punct = n_chars - n_alpha - n_digit - n_space
    mean_word_len = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    n_sents = len(SENT_RE.findall(text + " "))
    all_stop = set().union(*_STOPWORDS.values())
    stop_ratio = (sum(1 for t in toks if t in all_stop) / n_tokens) if n_tokens else 0.0
    uniq_ratio = (len(set(toks)) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "n_sents": float(n_sents),
        "mean_word_len": mean_word_len,
        "alpha_ratio": n_alpha / n_chars if n_chars else 0.0,
        "digit_ratio": n_digit / n_chars if n_chars else 0.0,
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "upper_ratio": n_upper / n_chars if n_chars else 0.0,
        "stop_ratio": stop_ratio,
        "uniq_token_ratio": uniq_ratio,
    }


def quality_score(text: str) -> float:
    """Composite [0,1] quality score from the features: rewards sane word
    length, stopword presence, low symbol noise, non-trivial length."""
    f = quality_features(text)
    if f["n_tokens"] < 3:
        return 0.0
    s = 1.0
    s *= min(1.0, f["n_tokens"] / 50.0) ** 0.5
    s *= 1.0 if 3.0 <= f["mean_word_len"] <= 10.0 else 0.5
    s *= min(1.0, f["stop_ratio"] / 0.1)
    s *= max(0.0, 1.0 - 2.0 * f["digit_ratio"])
    s *= max(0.0, 1.0 - 2.0 * max(0.0, f["punct_ratio"] - 0.25))
    return round(min(1.0, s), 6)


def fingerprint(text: str, window: int = 64) -> int:
    """Rolling-hash document fingerprint: min of 64-bit window hashes (a
    1-element MinHash — cheap near-identity signature); whole-text hash when
    shorter than one window."""
    data = text.encode("utf-8", "surrogatepass")
    if len(data) <= window:
        return hash64(data)
    # polynomial rolling hash, base 257 mod 2^61-1, then min over windows
    mod = (1 << 61) - 1
    base = 257
    power = pow(base, window - 1, mod)
    h = 0
    for b in data[:window]:
        h = (h * base + b) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * power) * base + data[i]) % mod
        if h < best:
            best = h
    return best


def shingles(text: str, k: int = 5) -> set[str]:
    """Word k-shingles (lowercased token windows) for Jaccard/MinHash."""
    toks = tokens(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0
