"""Document deduplication operators (training-pipeline additions).

Beyond the reference's key-based dedup (A1 merge.py:202-208 / F6 URL
dedup), a 100 TB corpus pipeline needs *content* dedup.  All operators
work on a DataFrame with (id_col, text_col) and stay JVM-side (built-in
functions) except where noted; the LSH band join is the scale path —
candidate pairs come from equi-joins on band keys, never an O(n²)
cross join.

Operators:
- exact_dedup            md5 hash groupBy (exact duplicates)
- simhash                64-bit SimHash from token hashes (Charikar)
- minhash_signatures     K-permutation MinHash via xxhash64(salt+shingle)
- lsh_bands              banding of the signature for bucket join
- near_dup_pairs         candidate pairs from shared bands + verified
                         n-gram Jaccard similarity
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokens_col(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def shingles_col(text_col, k: int = 3):
    """k-word shingles as an array column (JVM-side HOFs, no UDF)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    parts = [F.element_at(toks, i) for i in range(1, k + 1)]

    def make(i):
        return F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        )

    return F.transform(idx, make)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact content dedup: keep min(id) per content hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = 64) -> DataFrame:
    """SimHash: sign-aggregate of per-token hash bits.

    Pure built-ins: per token t, xxhash64(t) contributes +1/-1 per bit;
    the fingerprint bit b is 1 iff the sum over tokens is >= 0.  Computed
    with aggregate() over the token array — one narrow pass, no shuffle,
    no UDF.
    """
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    # For each bit b (unrolled — shiftright needs a literal shift), the
    # fingerprint bit is set iff sum over tokens of (2*bit(h,b)-1) >= 0.
    def _merge_for(b: int):
        # closure factory: a default-arg lambda would change the arity
        # PySpark infers for the HOF callback
        return lambda acc, t: acc + (
            F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)).cast("int")
            * 2
            - 1
        )

    fingerprint = None
    for b in range(bits):
        bit_sum = F.aggregate(toks, F.lit(0), _merge_for(b))
        # bit 63 is the sign bit of int64: its contribution is -2^63
        term = F.when(bit_sum >= 0, F.lit(1 << b if b < 63 else -(1 << 63))
                      .cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return df.select(F.col(id_col), fingerprint.alias("simhash"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 16, shingle_k: int = 3) -> DataFrame:
    """MinHash signature: min over shingles of xxhash64(perm_salt, shingle)
    for each of num_perm salted hash functions — all JVM-side."""
    sh = shingles_col(F.col(text_col), shingle_k)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda p: F.array_min(
            F.transform(sh, lambda s: F.xxhash64(p.cast("string"), s))
        ),
    )
    return df.select(F.col(id_col), sig.alias("signature"))


def lsh_bands(signatures: DataFrame, id_col: str,
              bands: int = 4, rows_per_band: int = 4) -> DataFrame:
    """Band the signature: (id, band, band_key).  Docs sharing a
    (band, band_key) are near-dup candidates — found by equi-join, the
    only approach that survives 10^10 docs."""
    out = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ":",
                        F.slice(
                            F.col("signature"),
                            b * rows_per_band + 1,
                            rows_per_band,
                        ).cast("array<string>"),
                    )
                ),
            )
        ).alias("band", "band_key"),
    )
    return out


def ngram_jaccard(a_shingles, b_shingles):
    """Jaccard over shingle sets (array columns)."""
    inter = F.size(F.array_intersect(a_shingles, b_shingles))
    union = F.size(F.array_union(a_shingles, b_shingles))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidate generation + exact verify.

    1. signatures → bands → self-equi-join on (band, band_key):
       candidates, deduped to one row per (a, b) pair.
    2. verify with exact shingle Jaccard; keep >= threshold.
    The verify join re-attaches shingles by id — two broadcast-able or
    shuffle-hash joins, no cross product anywhere.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k)
    banded = lsh_bands(sigs, id_col, bands, num_perm // bands)
    left = banded.select(
        F.col(id_col).alias("a"), "band", "band_key"
    )
    right = banded.select(
        F.col(id_col).alias("b"), "band", "band_key"
    )
    cand = (
        left.join(right, ["band", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sh = df.select(
        F.col(id_col), shingles_col(F.col(text_col), shingle_k).alias("sh")
    )
    verified = (
        cand.join(sh.select(F.col(id_col).alias("a"),
                            F.col("sh").alias("sh_a")), "a")
        .join(sh.select(F.col(id_col).alias("b"),
                        F.col("sh").alias("sh_b")), "b")
        .select(
            "a",
            "b",
            F.round(ngram_jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def dedup_keep_first(df: DataFrame, id_col: str, text_col: str,
                     threshold: float = 0.7) -> DataFrame:
    """Corpus-level near-dup removal: drop every doc that is a near-dup
    of a lower-id doc (greedy canonical-min rule — deterministic)."""
    pairs = near_dup_pairs(df, id_col, text_col, threshold)
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
