"""llm_scraper_ray — a Ray-Data-native rewrite of the DAMSlabUMBC/llm-scraper
fetch+extract engine.

From-scratch engine: URL frontier + politeness scheduler + URL-seen set +
deterministic HTML→text extraction, expressed as ``ray.data.Dataset``
pipelines over Parquet/Arrow, plus the data-processing operator surface the
reference implements (SURVEY.md §2) and the large-scale training-data ops
(dedup, similarity search, text analysis).

Nothing here calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by
the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.2.0"
