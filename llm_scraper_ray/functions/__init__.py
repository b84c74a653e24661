"""Pure, deterministic per-record kernels (no Ray).

These are the scalar/row functions of SURVEY.md §2.3 — canonicalization,
HTML→text extraction, selector extraction, normalizers, fuzzy dedup —
used both by the distributed stages and by the sequential oracle crawler,
so engine-vs-oracle tests exercise distribution, not kernel drift.
"""
