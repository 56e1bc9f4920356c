"""Local-file replay source (S9) — archived pages from a directory.

Reference: ``bgg_hotness.py:43-74`` re-parses archived hotness XML files,
taking the snapshot date from the file name.  Spark-first:
``spark.read.format("binaryFile")`` over the directory, date via
``regexp_extract(input_file_name())`` (E14 family), then the normal
parse stage — archived files are just fetch results with a synthetic
URL, so the whole downstream pipeline is reused unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# file names like hotness-20240101000000.xml (bgg_hotness.py:52-56 takes
# the date from the stem; same 14-digit shape as archive.org URLs E14)
_STAMP_RE = r"(\d{14})"


def read_archived_pages(
    spark: SparkSession,
    path: str,
    callback_kind: str = "bgg_hotness",
    glob: str = "*.xml",
) -> DataFrame:
    """Directory of archived files → FETCHED-shaped rows.

    url_canon is synthesized from the file stamp so each archive snapshot
    gets a distinct doc_id; archived_at carries the stamp as a timestamp.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    stamp = F.regexp_extract(F.col("path"), _STAMP_RE, 1)
    return raw.select(
        F.concat(
            F.lit("https://boardgamegeek.com/hotness/archive/"), stamp
        ).alias("url_canon"),
        F.xxhash64(F.col("path")).alias("url_hash"),
        F.lit("boardgamegeek.com").alias("host"),
        F.lit(0).alias("priority"),
        F.lit(callback_kind).alias("callback_kind"),
        F.lit(0).alias("attempt"),
        F.lit(200).alias("status"),
        F.lit("text/xml").alias("content_type"),
        F.decode(F.col("content"), "utf-8").alias("body"),
        F.lit(0).alias("latency_ms"),
        F.to_timestamp(stamp, "yyyyMMddHHmmss").alias("archived_at"),
    )
