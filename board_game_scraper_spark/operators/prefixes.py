"""Adaptive prefix partitioning (A2/J6) — reference ``prefixes.py``.

The reference builds a driver-side trie of username prefixes
(``prefixes.py:53-68``), recursively splitting any prefix with more than
LIMIT (1M, ``prefixes.py:23``) items, then routes each record to its
longest matching prefix bucket (``prefixes.py:99-103``).  That is adaptive
range partitioning: it exists purely so no output bucket exceeds a size
cap — i.e. skew handling.

Spark-first version: iterate k = 1..max_depth entirely in DataFrames —
``groupBy(substring(key,1,k)).count()`` — and split oversized prefixes.
Each iteration is one map-side-combinable aggregation over only the rows
still in oversized prefixes (the frontier shrinks geometrically), so at
100 TB this is a handful of cheap scans rather than a driver trie of 10^8
nodes.  Assignment is then a broadcast longest-prefix join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# prefixes.py:22-30: keys are lowercased, every non-[a-z] byte becomes '_'.
def parse_key(col):
    """Sanitize a prefix key — mirrors prefixes.py:27-30 (_parse_key)."""
    return F.regexp_replace(F.lower(col), "[^a-z]", "_")


def compute_prefixes(
    df: DataFrame,
    key_col: str,
    limit: int = 1_000_000,
    max_depth: int = 8,
) -> DataFrame:
    """Return DataFrame(prefix string, n long): the adaptive prefix set.

    Invariant (reference ``_prefixes`` prefixes.py:61-68): a prefix is
    emitted iff its count <= limit, else it is split one character deeper.
    Unlike the reference we only emit non-empty prefixes (the reference
    enumerates the fixed alphabet a-z_, emitting zero-count buckets; empty
    buckets carry no data so they are irrelevant to partitioning).
    """
    keyed = df.select(parse_key(F.col(key_col)).alias("_k")).where(
        F.col("_k").isNotNull() & (F.length("_k") > 0)
    )
    results = None
    pending = keyed
    for depth in range(1, max_depth + 1):
        counts = pending.groupBy(
            F.substring("_k", 1, depth).alias("prefix")
        ).agg(F.count(F.lit(1)).alias("n"))
        done = counts.where(F.col("n") <= limit)
        results = done if results is None else results.unionByName(done)
        over = counts.where(F.col("n") > limit)
        # Keep only rows whose prefix is still oversized (frontier shrinks).
        pending = pending.join(
            F.broadcast(over.select("prefix")),
            on=F.substring(pending["_k"], 1, depth) == F.col("prefix"),
            how="left_semi",
        )
        if depth == max_depth:
            # Anything still oversized is emitted at max depth (cap).
            tail = pending.groupBy(
                F.substring("_k", 1, depth).alias("prefix")
            ).agg(F.count(F.lit(1)).alias("n"))
            results = results.unionByName(tail)
    return results


def assign_longest_prefix(
    df: DataFrame, key_col: str, prefixes: DataFrame
) -> DataFrame:
    """Add a ``prefix`` column: the longest prefix bucket for each row.

    Reference analog: ``trie.longest_prefix`` per record
    (prefixes.py:99-103).  The prefix set is small (≤ alphabet^depth,
    bounded by data/limit), so a broadcast equi-join per depth beats any
    UDF: we join on substring(key, 1, len) for each distinct prefix
    length and keep the longest match per row.
    """
    lengths = [r[0] for r in prefixes.select(F.length("prefix")).distinct().collect()]
    keyed = df.withColumn("_k", parse_key(F.col(key_col)))
    matched = None
    for ln in sorted(lengths):
        p = prefixes.where(F.length("prefix") == ln).select("prefix")
        m = keyed.join(
            F.broadcast(p),
            on=F.substring(keyed["_k"], 1, ln) == p["prefix"],
            how="inner",
        ).select(*df.columns, F.col("prefix"), F.lit(ln).alias("_plen"))
        matched = m if matched is None else matched.unionByName(m)
    if matched is None:
        return df.withColumn("prefix", F.lit(None).cast("string"))
    # Longest match per row: max_by over prefix length.
    row = F.struct(*[F.col(c) for c in df.columns])
    out = matched.groupBy(row.alias("_row")).agg(
        F.max_by(F.col("prefix"), F.col("_plen")).alias("prefix")
    )
    return out.select("_row.*", "prefix")


def write_by_prefix(
    df: DataFrame, key_col: str, path: str, limit: int = 1_000_000
) -> DataFrame:
    """Partition-by-prefix write (reference split_file prefixes.py:127-161)."""
    prefixes = compute_prefixes(df, key_col, limit=limit)
    assigned = assign_longest_prefix(df, key_col, prefixes)
    assigned.write.mode("overwrite").partitionBy("prefix").parquet(path)
    return prefixes
