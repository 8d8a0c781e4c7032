"""Driver contract for the Ray-Data-native extraction engine.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in xs_vlm_ocr_ray) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at tiny scale: deterministic synthetic
    Common-Crawl-style pages (seed=42, 200 rows — the committed-golden
    corpus) → classify → actor-pool HTML extraction → results.

    Returns the results as a pandas DataFrame (stable schema:
    url, extracted_text, success, error, content_hash).
    """
    from xs_vlm_ocr_ray.pipelines.queries import extract_pages

    return extract_pages("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (plus the training-data additions: dedup family, text analysis,
    similarity search)."""
    from xs_vlm_ocr_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query (same column
    names, same rounding). Non-SQL-expressible ops (minhash/simhash/
    fingerprints/langid/quality/LSH-ANN/extraction) are intentionally
    absent → rows-only driver check."""
    from xs_vlm_ocr_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
