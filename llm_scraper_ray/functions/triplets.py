"""Triplet parsing, cleaning and NL templating (SURVEY.md E12, E15, E17, E18, E21).

The triplet is the reference's central analysis record:
``((subj_type, subj_name), predicate, (obj_type, obj_name))`` with an optional
float weight (``analysis/relationship_analysis.py:18-22``;
``data/validated_triplets/validated_triplets_1.txt``). These kernels parse and
normalize that shape without ``eval``/``ast.literal_eval`` on untrusted text.
"""

from __future__ import annotations

import re

# relationship_analysis.py:17-22 — verbatim grammar (verbose regex)
TRIPLET_PATTERN = r"""
\(\(\s*['"`]([^'"`]+)['"`]\s*,\s*['"`]([^'"`]+)['"`]\s*\)\s*,      # Subject
\s*['"`]([^'"`]+)['"`]\s*,                                      # Predicate
\s*\(\s*['"`]([^'"`]+)['"`]\s*,\s*['"`]([^'"`]+)['"`]\s*\)\)       # Object
"""
_TRIPLET_RE = re.compile(TRIPLET_PATTERN, flags=re.VERBOSE)

Triplet = tuple[tuple[str, str], str, tuple[str, str]]


def parse_triplets(text: str) -> list[Triplet]:
    """E17 — all triplets matched by the reference grammar
    (``relationship_analysis.py:66-71``)."""
    return [
        ((subj_type, subj_ent), pred, (obj_type, obj_ent))
        for subj_type, subj_ent, pred, obj_type, obj_ent in _TRIPLET_RE.findall(text)
    ]


_QUOTED_PHRASE = re.compile(r"'([a-zA-Z]+(?:\s+[a-zA-Z]+)+)'")


def camelize_quoted_phrases(s: str) -> str:
    """E15 step 2 — 'Govee Smart Light Bulbs' → 'GoveeSmartLightBulbs'
    (``response_cleaner.py:48-51``); the eval-based steps are replaced by the
    regex grammar parser above."""
    return _QUOTED_PHRASE.sub(
        lambda m: "'" + "".join(w.capitalize() for w in m.group(1).split()) + "'", s
    )


def canonicalize_keywords(triplet: Triplet, keywords: dict[str, str]) -> Triplet:
    """E18 — config keyword map rewrites subject/object names
    (``scrape_pp.py:137-146``)."""
    (st, sn), p, (ot, on) = triplet
    return ((st, keywords.get(sn, sn)), p, (ot, keywords.get(on, on)))


# E21 — predicate-specific 5-variant phrasings
# (search_validation_playwright.py:85-163). Table-driven restatement of the
# same strings; {s} = subject_value, {o} = object_value. Entries keyed by
# (predicate, subj_type-or-None, obj_type-or-None).
_VARIANTS: dict[tuple[str, str | None, str | None], list[str]] = {
    ("hasSensor", "device", "sensor"): [
        "{s} has {o}", "{s} is equipped with {o}", "{o} is part of {s}",
        "{s} comes with {o}", "{s} features {o}",
    ],
    ("manufacturedBy", "device", "manufacturer"): [
        "{s} is manufactured by {o}", "{s} is produced by {o}",
        "{s} comes from {o}", "{o} manufactures {s}", "{s} is built by {o}",
    ],
    ("compatibleWith", None, None): [
        "{s} is compatible with {o}", "{s} works with {o}",
        "{o} is supported by {s}", "{s} pairs with {o}",
        "{s} integrates well with {o}",
    ],
    ("performs", "device", "process"): [
        "{s} performs {o}", "{s} carries out {o}", "{s} executes {o}",
        "{s} completes {o}", "{s} undertakes {o}",
    ],
    ("hasPolicy", None, None): [
        "{s} has policy {o}", "{s} adopts the {o} policy",
        "{s} follows the {o} policy", "{s} implements the {o} policy",
        "{s} operates under the {o} policy",
    ],
    ("statesInPolicy", None, "privacyPolicy"): [
        "{s} is stated in policy {o}", "Policy {o} specifies {s}",
        "Policy {o} outlines {s}", "{s} is mentioned in policy {o}",
        "{s} is detailed in policy {o}",
    ],
    ("follows", "privacyPolicy", "regulation"): [
        "{s} follows {o}", "{s} adheres to {o}", "{s} complies with {o}",
        "{s} upholds {o}", "{s} observes {o}",
    ],
    ("developedBy", "application", "manufacturer"): [
        "{s} is developed by {o}", "{o} develops {s}", "{s} is created by {o}",
        "{s} is engineered by {o}", "{s} is built under the guidance of {o}",
    ],
}


def format_triplet(triplet: Triplet) -> list[str]:
    """E21 — NL query variants for a triplet; [] for unknown predicates
    (matches ``search_validation_playwright.py:85-163``)."""
    (subj_type, subj_value), predicate, (obj_type, obj_value) = triplet
    for (pred, st, ot), templates in _VARIANTS.items():
        if pred != predicate:
            continue
        if st is not None and st != subj_type:
            continue
        if ot is not None and ot != obj_type:
            continue
        return [t.format(s=subj_value, o=obj_value) for t in templates]
    return []
