"""Proxy-pool state actor (SURVEY.md F4).

The reference downloads a free proxy list, probes it with 5 threads, uses
the first worker and blacklists failures
(``util/scraper/proxy.py:22-91``). Network probing does not exist in this
sandbox, so the POOL SEMANTICS are the product: a named Ray actor holding
the rotation state (candidates, current, blacklist), with the reference's
behavior — serve the current proxy until a failure report, then advance,
skipping blacklisted entries; per-actor threading replaced by actor-serialized
calls. A real deployment injects a prober callable.
"""

from __future__ import annotations

import ray


class ProxyPoolState:
    """Pure-Python pool logic (unit-testable without Ray)."""

    def __init__(self, proxies: list[str]):
        self.candidates = list(proxies)
        self.blacklist: set[str] = set()
        self._idx = 0

    def current(self) -> str | None:
        while self._idx < len(self.candidates):
            p = self.candidates[self._idx]
            if p not in self.blacklist:
                return p
            self._idx += 1
        return None

    def report_failure(self, proxy: str) -> str | None:
        """Blacklist a failed proxy and advance (proxy.py:59-91 semantics)."""
        self.blacklist.add(proxy)
        if self._idx < len(self.candidates) and self.candidates[self._idx] == proxy:
            self._idx += 1
        return self.current()

    def refill(self, proxies: list[str]) -> None:
        """Reload the candidate list (the reference re-downloads on exhaustion)."""
        self.candidates = [p for p in proxies if p not in self.blacklist]
        self._idx = 0


@ray.remote(num_cpus=0)
class ProxyPoolActor:
    """Shared rotation state for all fetch workers (one per crawl run)."""

    def __init__(self, proxies: list[str]):
        self.state = ProxyPoolState(proxies)

    def lease(self) -> str | None:
        return self.state.current()

    def report_failure(self, proxy: str) -> str | None:
        return self.state.report_failure(proxy)

    def refill(self, proxies: list[str]) -> None:
        self.state.refill(proxies)
