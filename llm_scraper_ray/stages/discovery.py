"""Search-driven URL discovery (SURVEY.md F12/F13).

The reference types a category query into a site's search bar, harvests
product links by selector, and paginates via the "next" anchor with a
VISITED guard (``extract_product_urls.py:82-141``; Google variant
``util/scraper/search_scraper.py:47-104``). No live search exists in this
sandbox, so the stand-in "search backend" is a deterministic index over the
stored pages corpus; everything around it is the real stage shape:

  - a stateful actor pool (per-actor index built once in ``__init__`` — the
    browser-session analog);
  - search-URL construction from (host, query) (F13,
    ``scrapping_manager.py:74-102``);
  - pagination as repeated fixed-size result pages until exhaustion, with a
    per-call seen-guard (the reference's ``VISITED`` list);
  - output = frontier-shaped seed rows, to be canonicalized + deduped by the
    crawl's F15/F8 machinery.
"""

from __future__ import annotations

import os
from urllib.parse import quote_plus

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

PAGE_SIZE = 10  # results per "search page" (pagination granularity)


def search_url(host: str, query: str, page: int = 0) -> str:
    """F13 — home + urlencoded query (scrapping_manager.py:74-102 shape)."""
    suffix = f"&page={page}" if page else ""
    return f"https://{host}/search?q={quote_plus(query)}{suffix}"


class SearchDiscovery:
    """Actor: per-host inverted text index built once; ``__call__`` takes
    (host, query) rows and emits discovered (host, query, url, rank) rows by
    paginating through matches."""

    def __init__(self, pages_dir: str, num_buckets: int):
        # index: host → [(url, lowercase text)] — text only, no html bytes
        self.by_host: dict[str, list[tuple[str, str]]] = {}
        for b in range(num_buckets):
            path = os.path.join(pages_dir, f"bucket={b:02d}", "part.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path, columns=["url", "text"])
            for url, text in zip(t["url"].to_pylist(), t["text"].to_pylist()):
                host = url.split("://", 1)[1].split("/", 1)[0].split(":")[0].lower()
                self.by_host.setdefault(host, []).append((url, text.lower()))
        for rows in self.by_host.values():
            rows.sort()  # deterministic result order

    def search(self, host: str, query: str) -> list[str]:
        """All result pages for one (host, query), paginated with a VISITED
        guard (extract_product_urls.py:12,39-41 semantics)."""
        matches = [
            url for url, text in self.by_host.get(host, []) if query.lower() in text
        ]
        visited: set[str] = set()
        out: list[str] = []
        page = 0
        while True:
            page_hits = matches[page * PAGE_SIZE : (page + 1) * PAGE_SIZE]
            if not page_hits:
                break  # no "next" anchor
            for url in page_hits:
                if url not in visited:
                    visited.add(url)
                    out.append(url)
            page += 1
        return out

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        hosts, queries, urls, ranks, surls = [], [], [], [], []
        for host, query in zip(batch["host"], batch["query"]):
            for rank, url in enumerate(self.search(host, query)):
                hosts.append(host)
                queries.append(query)
                urls.append(url)
                ranks.append(rank)
                surls.append(search_url(host, query, rank // PAGE_SIZE))
        return pa.Table.from_pydict(
            {
                "host": pa.array(hosts, pa.string()),
                "query": pa.array(queries, pa.string()),
                "url": pa.array(urls, pa.string()),
                "rank": pa.array(ranks, pa.int32()),
                "search_url": pa.array(surls, pa.string()),
            }
        )
