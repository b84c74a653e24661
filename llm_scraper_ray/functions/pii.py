"""PII redaction kernels for training-data curation.

Beyond the reference's operator set (its pipelines ship raw scraped text to
the LLM stages; a production training-data pipeline scrubs identifiers
first). The patterns are written in the RE2-compatible subset (no
lookaround, no backrefs) and are the SINGLE source for both the Python
kernel and the DuckDB oracle SQL (``scrub_sql_expr``), so the two sides can
never drift.
"""

from __future__ import annotations

import re

# RE2-compatible (also valid stdlib ``re``): order matters — emails are
# scrubbed before phones so phone digits inside an address never match.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def scrub_pii(text: str) -> tuple[str, dict[str, int]]:
    """Redact PII spans; returns (scrubbed_text, per-kind match counts)."""
    counts: dict[str, int] = {}
    for name, rx, repl in _COMPILED:
        text, n = rx.subn(repl, text)
        counts[f"n_{name}"] = n
    return text, counts


def _sql_quote_pattern(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def scrub_sql_expr(col: str) -> str:
    """DuckDB expression applying the same redactions in the same order."""
    expr = col
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, {_sql_quote_pattern(pat)}, '{repl}', 'g')"
    return expr


def count_sql_expr(col: str, kind: str) -> str:
    """DuckDB expression counting matches of one pattern kind — applied to
    the text AFTER the earlier patterns were scrubbed (mirrors subn order)."""
    expr = col
    for name, pat, repl in PII_PATTERNS:
        if name == kind:
            return f"len(regexp_extract_all({expr}, {_sql_quote_pattern(pat)}))"
        expr = f"regexp_replace({expr}, {_sql_quote_pattern(pat)}, '{repl}', 'g')"
    raise KeyError(kind)
