"""Feed sources & sinks (S1-S4, S11-adjacent).

Reference behaviors reproduced:

- S1 multi-path JSONL scan with malformed-row dropping
  (``merge.py:170``: spark.read.json(mode=DROPMALFORMED,
  dropFieldIfAllNull=True)).  Ours takes an explicit schema — inference
  at 10^10 rows is a full extra pass — and keeps a ``_file_seq``
  provenance column derived from the lexicographic order of input file
  names, which reproduces the reference's later-file-wins tie-break
  (merge.py:62-67) deterministically.
- S2 JSONL writer (``merge.py:249,257``).
- S3 part-concat sink (``merge.py:245-253``): the reference concatenates
  sorted part files driver-side; ours keeps it distributed via
  sortWithinPartitions + single-partition write only when a single file
  is demanded.
- S4 CSV seed scan (``spiders/bgg.py:182-226``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    paths: Sequence[str],
    schema: StructType | None = None,
    with_file_seq: bool = True,
) -> DataFrame:
    """Multi-path JSONL read (S1).

    DROPMALFORMED matches merge.py:170; ``_file_seq`` numbers input
    files in sorted-name order (feed files embed the run timestamp in
    the name, __main__.py:109, so name order == time order).
    """
    reader = spark.read.option("mode", "DROPMALFORMED")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(list(paths))
    if not with_file_seq:
        return df
    # Scale-safe sequence numbering: the distinct file list is usually
    # tiny, but a 10^6-file feed merge would single-task a global
    # window — use the partition-parallel zipWithIndex from split.py.
    from ..operators.split import global_row_ids

    files = (
        global_row_ids(
            df.select(F.input_file_name().alias("_file_name")).distinct(),
            ["_file_name"],
            id_col="_file_seq",
        )
        .withColumn("_file_seq", F.col("_file_seq").cast("int"))
    )
    return (
        df.withColumn("_file_name", F.input_file_name())
        .join(F.broadcast(files), "_file_name")
        .drop("_file_name")
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    sort_within: Sequence[str] | None = None,
) -> None:
    """JSONL write (S2) + deterministic part layout (S3).

    ``single_file`` reproduces concat_files (merge.py:245-253) as a
    coalesce(1) write — only sane for small outputs; at scale keep parts
    and use ``sort_within`` for per-part determinism.
    """
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").json(path)


def read_seed_csv(
    spark: SparkSession,
    path: str,
    url_template: str,
    id_col: str,
    priority: int = 0,
) -> DataFrame:
    """CSV seed scan (S4, bgg.py:182-226): id/username column → seed URLs.

    ``url_template`` uses ``{id}`` — e.g.
    ``https://boardgamegeek.com/xmlapi2/user?name={id}``.
    """
    pre, _, post = url_template.partition("{id}")
    raw = spark.read.option("header", True).csv(path)
    return raw.select(
        F.concat(F.lit(pre), F.col(id_col).cast("string"), F.lit(post))
        .alias("url"),
        F.lit("csv_seed").alias("source"),
        F.lit(priority).alias("priority"),
    ).where(F.col("url").isNotNull())
