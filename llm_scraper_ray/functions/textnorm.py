"""Scalar text-normalization kernels (SURVEY.md E9, E11–E15, E19, E20, E22).

Each function re-states one reference normalizer with identical regex
semantics; all are pure and vectorizable per batch (applied over pandas/Arrow
string columns inside ``map_batches``).
"""

from __future__ import annotations

import re

_WS = re.compile(r"\s+")
_NON_ALNUM = re.compile(r"[\W_]+")
_CAMEL_BOUND1 = re.compile(r"(?<!\s)([A-Z])")
_CAMEL_BOUND2 = re.compile(r"([a-z])([A-Z])")
_REPEAT_WORD = re.compile(r"(\b\w+\b)(, \1)+")
_THINK = re.compile(r"<think>.*?</think>", flags=re.DOTALL)
_THINK_TAIL = re.compile(r"^.*?</think>", flags=re.DOTALL)
_JSON_FENCE = re.compile(r"^```json\n?|```$", flags=re.MULTILINE)
_PY_FENCE = re.compile(r"^```python\n?|```$", flags=re.MULTILINE)
_GRAPH_KEY = re.compile(r"[^a-zA-Z0-9_-]")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_FNAME = re.compile(r"[^a-zA-Z0-9]+")


def normalize_ws_lower(text: str) -> str:
    """E9 — ``util/scraper/content_cleaner.py:5-6``."""
    return _WS.sub(" ", text.strip().lower())


def normalize_alnum(s) -> str:
    """E11 — ``precision_recall.py:17-22`` (lower, strip all non-alnum)."""
    if not isinstance(s, str):
        s = str(s)
    s = s.lower()
    s = _NON_ALNUM.sub("", s)
    return s.strip()


def split_camel_case(name: str) -> str:
    """E12 — ``precision_recall.py:60-72``: spaces at case boundaries, collapse ws."""
    name = _CAMEL_BOUND1.sub(r" \1", name)
    name = _CAMEL_BOUND2.sub(r"\1 \2", name)
    return " ".join(name.split())


def collapse_repeated_words(triple: str) -> str:
    """E13 — ``method2.py:30-33``."""
    triple = _REPEAT_WORD.sub(r"\1", triple)
    triple = _WS.sub(" ", triple)
    return triple.strip()


def remove_think_tags(text: str) -> str:
    """E14 — ``util/llm_utils/response_cleaner.py:3-17`` (shorter of two scrubs)."""
    cleaned1 = _THINK.sub("", text).strip()
    cleaned2 = _THINK_TAIL.sub("", text).strip()
    return cleaned1 if len(cleaned1) < len(cleaned2) else cleaned2


def extract_json_fence(text: str) -> str:
    """E14 — ``response_cleaner.py:19-26``."""
    return _JSON_FENCE.sub("", text).strip()


def extract_python_fence(text: str) -> str:
    """E14 — ``response_cleaner.py:28-35``."""
    return _PY_FENCE.sub("", text).strip()


def graph_key(name: str) -> str:
    """E19 — node key: strip whitespace then forbidden chars → '_'
    (``KG.py:48-52,67-70``)."""
    return _GRAPH_KEY.sub("_", "".join(name.split()))


def split_sentences(text: str, min_chars: int = 5) -> list[str]:
    """E20 — pipes/tabs → '.', sentence split, drop short fragments
    (``precision_recall.py:313-332``)."""
    text = text.replace("|", ". ").replace("\t", ". ")
    parts = _SENT_SPLIT.split(text)
    return [p.strip() for p in parts if len(p.strip()) >= min_chars]


def sanitize_filename(name: str) -> str:
    """E22 — alnum+underscore folder name (``util/media/folder_manager.py:17-30``)."""
    return _FNAME.sub("_", name).strip("_")


# E23 — price/time/number patterns (``util/scraper/proxy.py:13-15``)
PRICE_RE = re.compile(r"[$€£]\s?\d{1,3}(?:,\d{3})*(?:\.\d{2})?")
TIME_RE = re.compile(r"\b\d{1,2}:\d{2}(?::\d{2})?\s?(?:[AaPp][Mm])?\b")
NUMBER_RE = re.compile(r"-?\d{1,3}(?:,\d{3})*(?:\.\d+)?")


def extract_prices(text: str) -> list[str]:
    return PRICE_RE.findall(text)


def extract_times(text: str) -> list[str]:
    return TIME_RE.findall(text)
