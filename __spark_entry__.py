"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the oracle-checked operator surface implemented in
``board_game_scraper_spark.queries`` (one entry per SURVEY.md §2 operator
family).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from board_game_scraper_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.q_merge_latest_wins(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry."""
    return dict(q.ORACLES)
