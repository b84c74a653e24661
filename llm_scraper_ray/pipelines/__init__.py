"""Pipelines: the crawl loop, its sequential oracle, and the query surface."""
