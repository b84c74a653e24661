"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship fetch+extract crawl on sf0.001;
``queries()``/``oracle_sql()`` expose the operator surface of
``llm_scraper_ray.pipelines.queries`` (SURVEY.md §2 + training-data ops).

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic pages corpus from sf0.001 →
    full frontier crawl (politeness + seen-set + byte-identical extraction)
    → extracted rows as a Ray Dataset."""
    from llm_scraper_ray.pipelines.queries import _crawl_for

    _, result = _crawl_for("/root/testdata/sf0.001")
    return result.extracted_dataset(
        columns=["url_hash", "canon_url", "host", "depth", "fetch_status", "text", "n_chars"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from llm_scraper_ray.pipelines.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from llm_scraper_ray.pipelines.queries import all_oracle_sql

    return all_oracle_sql()
