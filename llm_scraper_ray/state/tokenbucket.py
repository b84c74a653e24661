"""Per-host politeness token buckets (SURVEY.md F5).

The reference's politeness is implicit fixed sleeps (≥3 s/page,
``extract_pages.py:18-21``; 2 s pagination, ``modules/amazon.py:55,78``).
This engine makes the budget explicit data: each host gets
``max_per_round`` fetch tokens per frontier round (fixtures table
``politeness``), refilled at round boundaries. The *global* per-host budget
is enforced by the per-round top-k selection shuffle
(pipelines/crawl.py); this bucket is the per-worker guard used by fetcher
actors so no actor can exceed its lease even under retry replays.
"""

from __future__ import annotations


class TokenBucket:
    def __init__(self, budgets: dict[str, int], default: int = 4):
        self._budgets = budgets
        self._default = default
        self._tokens: dict[str, int] = {}

    def refill(self) -> None:
        """New frontier round: every host back to full budget."""
        self._tokens.clear()

    def capacity(self, host: str) -> int:
        return self._budgets.get(host, self._default)

    def try_take(self, host: str, n: int = 1) -> bool:
        have = self._tokens.get(host, self.capacity(host))
        if have < n:
            return False
        self._tokens[host] = have - n
        return True
