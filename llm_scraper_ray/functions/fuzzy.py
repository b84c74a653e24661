"""Fuzzy string similarity + within-document near-dup field dedup (SURVEY.md E10).

The reference uses ``rapidfuzz.fuzz.ratio`` (``util/scraper/content_cleaner.py:8-24``)
— the normalized Indel similarity: ``100 * (1 - indel_distance / (len(a)+len(b)))``,
equivalently ``100 * 2*LCS(a,b) / (len(a)+len(b))``. rapidfuzz is not in this
environment, so ``ratio`` is re-implemented from the published definition with
a banded O(len(a)*len(b)/64) bit-parallel LCS (Hyyrö's algorithm via Python
big-int bitsets) — deterministic and dependency-free.
"""

from __future__ import annotations

from .textnorm import normalize_ws_lower


def _lcs_length(a: str, b: str) -> int:
    """Bit-parallel LCS length (Hunt–Szymanski / Hyyrö style on big ints)."""
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    # positions of each char of the longer string as a bitmask
    masks: dict[str, int] = {}
    for i, ch in enumerate(a):
        masks[ch] = masks.get(ch, 0) | (1 << i)
    width = (1 << len(a)) - 1
    row = 0
    for ch in b:
        m = masks.get(ch, 0)
        x = row | m
        y = x - ((row << 1) | 1)
        row = x & ~y & width
    return bin(row).count("1")


def ratio(a: str, b: str) -> float:
    """rapidfuzz-compatible ``fuzz.ratio`` ∈ [0, 100]."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 200.0 * _lcs_length(a, b) / total


def partial_ratio(a: str, b: str) -> float:
    """rapidfuzz-style ``fuzz.partial_ratio``: best ``ratio`` of the shorter
    string against any equal-length window of the longer (used by the M9
    precision/recall fuzzy fallback, ``precision_recall.py:334-348``)."""
    if not a or not b:
        return 100.0 if a == b else 0.0
    s, l = (a, b) if len(a) <= len(b) else (b, a)
    if len(s) == len(l):
        return ratio(s, l)
    best = 0.0
    for start in range(0, len(l) - len(s) + 1):
        window = l[start : start + len(s)]
        r = 200.0 * _lcs_length(s, window) / (len(s) + len(window))
        if r > best:
            best = r
            if best == 100.0:
                break
    return best


def deduplicate_fields(text_content: dict[str, str], threshold: float = 90) -> dict[str, str]:
    """E10 — drop fields whose normalized text is ≥threshold similar to any
    kept field; first-wins in dict order (``content_cleaner.py:8-24``).

    O(n²) within one document only — a per-row map, no shuffle
    (the reference has no cross-document near-dedup; SURVEY.md §2.8).
    """
    deduped: dict[str, str] = {}
    kept_norm: list[str] = []
    for tag, text in text_content.items():
        norm_text = normalize_ws_lower(text)
        if any(ratio(norm_text, old) >= threshold for old in kept_norm):
            continue
        deduped[tag] = text
        kept_norm.append(norm_text)
    return deduped
