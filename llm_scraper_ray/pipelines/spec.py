"""The crawl-order specification shared by oracle and engine.

The reference's crawl order is an accident of sequential file order
(``extract_pages.py:160`` — ``for url in tqdm(product_urls)``). Under
parallel execution that order must be *defined* (SURVEY.md §7.4.2). This
module is the single normative statement of the definition; the sequential
oracle (pipelines/oracle.py) and the Ray engine (pipelines/crawl.py) both
implement it, and the pytest suite asserts they agree exactly.

Definitions
-----------

candidate  = (url_hash, canon_url, host, depth, warc_ts)
             warc_ts = the page's capture timestamp from the frontier
             metadata index when known, else -1 (unknown sorts last).

priority   = (depth ASC, warc_ts DESC, url_hash ASC)   [host-interleaved BFS:
             shallow first, then most recent capture, SHA-1 as total tiebreak]

One frontier round:
  1. DEDUP      group candidates by url_hash, keep minimum depth
  2. SEEN       drop candidates already in the seen set (state at round start)
  3. ROBOTS     drop candidates whose path starts with a disallowed prefix
                for their host; robots-blocked hashes ARE marked seen
  4. SELECT     per host, take the first ``max_per_round`` candidates by
                priority (budget from the politeness table, default 4);
                the remainder is DEFERRED to the next round unchanged
  5. MARK       selected hashes are added to the seen set (hit or miss alike)
  6. FETCH      selected → pages-table lookup by url_hash;
                hit → extract text + outlinks; miss → status 'miss'
  7. ORDER      within each host, selected sorted by priority → hrank 0,1,…;
                the round's global order = sort by (hrank ASC, priority) —
                i.e. every host's first pick, then every host's second pick…
                appended to the global ledger after all previous rounds
  8. EXPAND     outlinks → canonicalize (non-http(s) dropped) → new
                candidates at depth+1 with warc_ts looked up from metadata
  9. NEXT       frontier = deferred ∪ new candidates

The crawl ends when the frontier is empty after steps 1-3, or after
``max_rounds``. The seen set, the extracted table (url_hash → byte-identical
text) and the order ledger are the verified outputs.
"""

from __future__ import annotations

UNKNOWN_TS = -1
DEFAULT_BUDGET = 4


def priority_key(depth: int, warc_ts: int, url_hash: bytes) -> tuple:
    """The normative priority: depth asc, warc_ts desc, url_hash asc."""
    return (depth, -warc_ts, url_hash)
