"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship generation-loop BFS crawl over the corpus
derived from ``/root/testdata/sf0.001`` (plus intelligence columns) and
returns the results table.  ``queries()`` / ``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the training-data ops
(dedup / ANN / text analysis / multimodal plumbing).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: corpus derivation →
    generation-loop BFS crawl → extract → intelligence → results table."""
    from deepwebharvester_ray.pipelines.queries import q_crawl_intel

    return q_crawl_intel("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented pipeline/operator (SURVEY.md §2)."""
    from deepwebharvester_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; the BFS
    crawl replay and approximate (LSH/SimHash/rolling-hash) operators are
    intentionally omitted → rows-only check."""
    from deepwebharvester_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
