"""Text-analysis kernels for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

These generalize the reference's per-result text metrics (char-count
A2, src/ui/MainWindow.cpp:1994; preview M20) to corpus scale. All are
pure per-row functions packaged for vectorized use inside
``map_batches``; stateful variants (compiled patterns / profile tables)
belong in actor ``__init__``.
"""

from __future__ import annotations

import re


# --- token counting ------------------------------------------------------

_BPEISH_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def token_count_ws(text: str) -> int:
    """Whitespace tokenization count (len(text.split()))."""
    return len(text.split())


def token_count_bpeish(text: str) -> int:
    """BPE-ish: words + individual punctuation marks."""
    return len(_BPEISH_RE.findall(text))


# --- quality scoring -----------------------------------------------------

_PUNCT_RE = re.compile(r"[.,;:!?…，。；：！？]")
_STOPWORDS = {
    "en": frozenset("the a an and or of to in is are was were for on with as at by it this that".split()),
    "de": frozenset("der die das und oder ist sind ein eine zu in mit für auf als bei es".split()),
    "fr": frozenset("le la les et ou est sont un une de à dans avec pour sur il ce que".split()),
    "es": frozenset("el la los las y o es son un una de a en con para sobre que este".split()),
}
_ALL_STOP = frozenset().union(*_STOPWORDS.values())


def quality_stats(text: str, words: list[str] | None = None) -> dict:
    """Length / punctuation / stopword heuristics (one row). Pass a
    precomputed ``text.split()`` to share the tokenization with other
    kernels in a fused annotate pass."""
    n_chars = len(text)
    words = text.split() if words is None else words
    n_words = len(words)
    n_punct = len(_PUNCT_RE.findall(text))
    n_stop = sum(1 for w in words if w.lower() in _ALL_STOP)
    mean_word_len = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
        "mean_word_len": mean_word_len,
    }


def quality_score(text: str, words: list[str] | None = None) -> float:
    """Composite [0,1] quality heuristic: rewards mid-length documents,
    sane word lengths, some punctuation and stopword presence."""
    s = quality_stats(text, words)
    if s["n_words"] == 0:
        return 0.0
    length_term = min(1.0, s["n_words"] / 100.0)
    wordlen_term = 1.0 if 2.0 <= s["mean_word_len"] <= 12.0 else 0.3
    stop_term = min(1.0, s["stopword_ratio"] * 4.0)
    punct_term = min(1.0, s["punct_ratio"] * 50.0 + 0.5)
    return round(0.4 * length_term + 0.2 * wordlen_term + 0.2 * stop_term + 0.2 * punct_term, 6)


# --- language ID (character/word n-gram heuristic) -----------------------

# Tiny per-language profiles: highly characteristic function words plus
# script ranges. Deterministic and dependency-free; a real deployment
# would pin a fastText-style model in the actor instead.
_LANG_MARKERS = {
    "en": frozenset("the and of to is in that it was for with are this you".split()),
    "de": frozenset("der die das und ist nicht ein eine mit für auf zeit".split()),
    "fr": frozenset("le la les et est pas une dans pour avec que temps".split()),
    "es": frozenset("el la los las y es no una tiempo para con persona".split()),
}


def lang_id(text: str) -> str:
    """Heuristic language ID: CJK script share, else marker-word vote."""
    if not text:
        return "und"
    n = min(len(text), 4000)
    sample = text[:n]
    cjk = sum(1 for c in sample if "一" <= c <= "鿿")
    if cjk * 5 >= n:
        return "zh"
    words = sample.lower().split()
    if not words:
        return "und"
    scores = {
        lang: sum(1 for w in words if w in markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else "und"


# --- fingerprinting ------------------------------------------------------

_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def rolling_fingerprint(text: str) -> int:
    """Polynomial rolling hash over the whitespace-normalized text —
    a cheap whole-document fingerprint (order-sensitive, unlike the
    content hash which covers raw bytes)."""
    acc = 0
    for tok in text.split():
        h = 0
        for ch in tok:
            h = (h * _FP_BASE + ord(ch)) % _FP_MOD
        acc = (acc * _FP_BASE + h + 1) % _FP_MOD
    return acc


def shingles(text: str, k: int = 5) -> set[int]:
    """Word k-shingle hash set (for MinHash / Jaccard)."""
    words = text.split()
    if len(words) < k:
        return {_stable_hash64(" ".join(words))} if words else set()
    out = set()
    join = " ".join
    for i in range(len(words) - k + 1):
        out.add(_stable_hash64(join(words[i : i + k])))
    return out


def _stable_hash64(s: str) -> int:
    """Process-stable 64-bit string hash (NOT Python hash(), which is
    salted per process)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
