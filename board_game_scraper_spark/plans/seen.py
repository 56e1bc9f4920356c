"""URL-seen set (F6/F7) — sharded bloom filter + exact anti-join.

Reference analog: Scrapy's request dupefilter (implicit) and the
driver-side ``_ids_seen`` set (spiders/bgg.py:229-242,256-261).  A
driver-side set dies at 10^10 URLs; the Spark-native design is:

1. **Exact layer**: the ``url_seen`` snapshot table (schemas.URL_SEEN).
   Candidate dedup = ``left_anti`` join on ``url_hash`` — one shuffle,
   always correct.
2. **Bloom prefilter**: per-shard numpy bitmaps persisted next to the
   table (shard = pmod(url_hash, n_shards)).  Candidates are checked
   shard-locally via ``applyInPandas``; definite-new rows (bloom miss)
   skip the expensive exact join entirely.  At the 10^10 design point:
   4096 shards x ~2.4M keys x 14 bits ≈ 4 MB per shard — each task
   touches exactly one shard file, nothing is broadcast (SURVEY.md §4).

False positives only ever send a row to the exact join (never wrongly
drop it), so the bloom layer is a pure optimization with zero effect on
membership semantics — property-tested against a Python set oracle.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS_PER_KEY = 14
N_HASHES = 7  # ~optimal for 14 bits/key → fp ≈ 0.1%


def _bit_positions(hashes: np.ndarray, m_bits: int) -> np.ndarray:
    """k bit positions per 64-bit key via double hashing (h1 + i*h2)."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(m_bits)
    h2 = (h >> np.uint64(17) | np.uint64(1)) % np.uint64(m_bits)
    i = np.arange(N_HASHES, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(np.int64)


class ShardedBloom:
    """Per-shard bloom bitmaps on disk (one small file per shard)."""

    def __init__(self, path: str | Path, n_shards: int = 64,
                 shard_capacity: int = 1_000_000):
        self.path = Path(path)
        self.n_shards = n_shards
        self.m_bits = max(shard_capacity * BITS_PER_KEY, 1024)
        self.path.mkdir(parents=True, exist_ok=True)

    def _shard_file(self, shard: int) -> Path:
        return self.path / f"bloom-{shard:05d}.npy"

    def _load(self, shard: int) -> np.ndarray:
        f = self._shard_file(shard)
        if f.exists():
            return np.load(f)
        return np.zeros(self.m_bits // 8 + 1, dtype=np.uint8)

    def add_hashes(self, shard: int, hashes: np.ndarray) -> None:
        bits = self._load(shard)
        pos = _bit_positions(hashes, self.m_bits).ravel()
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        tmp = self._shard_file(shard).with_suffix(".tmp.npy")
        np.save(tmp, bits)
        tmp.replace(self._shard_file(shard))

    def maybe_contains(self, shard: int, hashes: np.ndarray) -> np.ndarray:
        bits = self._load(shard)
        pos = _bit_positions(hashes, self.m_bits)
        hit = (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    # -- Spark-side plumbing -------------------------------------------------

    def shard_col(self):
        return F.pmod(F.col("url_hash"), F.lit(self.n_shards)).cast("int")

    def add(self, df: DataFrame) -> int:
        """Insert url_hash values, shard-parallel (applyInPandas)."""
        bloom = self

        def _add(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf):
                shard = int(pdf["_shard"].iloc[0])
                bloom.add_hashes(shard, pdf["url_hash"].to_numpy(np.int64))
            return pd.DataFrame({"shard": [int(pdf["_shard"].iloc[0])],
                                 "n": [len(pdf)]})

        stats = (
            df.select("url_hash")
            .withColumn("_shard", self.shard_col())
            .groupBy("_shard")
            .applyInPandas(_add, "shard int, n long")
        )
        return sum(r["n"] for r in stats.collect())

    def prefilter(self, candidates: DataFrame) -> DataFrame:
        """Add ``maybe_seen boolean`` — False means definitely new."""
        bloom = self
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in candidates.schema.fields
        ) + ", maybe_seen boolean"

        def _check(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf):
                shard = int(pdf["_shard"].iloc[0])
                pdf = pdf.copy()
                pdf["maybe_seen"] = bloom.maybe_contains(
                    shard, pdf["url_hash"].to_numpy(np.int64)
                )
            else:
                pdf = pdf.assign(maybe_seen=pd.Series(dtype=bool))
            return pdf.drop(columns=["_shard"])

        return (
            candidates.withColumn("_shard", self.shard_col())
            .groupBy("_shard")
            .applyInPandas(_check, out_schema)
        )


BLOOM_ROW_SCHEMA = "shard int, version long, bits binary"


class SnapshotBloom:
    """Cluster-safe sharded bloom: bitmaps live as (shard, version, bits)
    rows in a SnapshotTable instead of executor-local files.

    - ``add``: new url_hash deltas are cogrouped with each shard's latest
      bitmap (``applyInPandas`` over ``cogroup`` — the bitmap and the
      delta meet shard-locally on an executor, nothing broadcast); only
      TOUCHED shards append a new (version+1) row — merge-on-read, same
      pattern as the frontier's delta commits.
    - ``prefilter``: candidates cogroup with latest bitmaps per shard.
    - ``compact()``: keep only the latest row per shard.

    The file-based ``ShardedBloom`` above assumes a shared filesystem
    (true in local mode and on NFS/fuse DFS mounts); this variant only
    needs the snapshot table's storage, so it works on any cluster.
    Same bit math (``_bit_positions``), same false-positive-only
    semantics.
    """

    def __init__(self, spark, path: str | Path, n_shards: int = 64,
                 shard_capacity: int = 1_000_000):
        from pyspark.sql.types import (
            BinaryType, IntegerType, LongType, StructField, StructType,
        )

        from ..tables import SnapshotTable

        self.spark = spark
        self.n_shards = n_shards
        self.m_bits = max(shard_capacity * BITS_PER_KEY, 1024)
        schema = StructType([
            StructField("shard", IntegerType(), False),
            StructField("version", LongType(), False),
            StructField("bits", BinaryType(), False),
        ])
        self.table = SnapshotTable(spark, path, schema)

    def shard_col(self):
        return F.pmod(F.col("url_hash"), F.lit(self.n_shards)).cast("int")

    def _latest(self) -> DataFrame:
        from pyspark.sql import Window

        t = self.table.read()
        w = Window.partitionBy("shard").orderBy(F.col("version").desc())
        return (
            t.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("shard", "bits")
        )

    def add(self, df: DataFrame) -> None:
        m_bits = self.m_bits
        snap = self.table.current_snapshot()
        version = (snap["id"] + 1) if snap else 1

        def _merge(key, cand: pd.DataFrame, bits_pdf: pd.DataFrame):
            if not len(cand):
                return pd.DataFrame(
                    {"shard": [], "version": [], "bits": []}
                ).astype({"shard": "int32", "version": "int64"})
            if len(bits_pdf):
                bits = np.frombuffer(bits_pdf["bits"].iloc[0],
                                     dtype=np.uint8).copy()
            else:
                bits = np.zeros(m_bits // 8 + 1, dtype=np.uint8)
            pos = _bit_positions(
                cand["url_hash"].to_numpy(np.int64), m_bits
            ).ravel()
            np.bitwise_or.at(bits, pos // 8,
                             (1 << (pos % 8)).astype(np.uint8))
            return pd.DataFrame({"shard": [int(key[0])],
                                 "version": [version],
                                 "bits": [bits.tobytes()]})

        deltas = df.select("url_hash").withColumn("shard", self.shard_col())
        updated = (
            deltas.groupBy("shard")
            .cogroup(self._latest().groupBy("shard"))
            .applyInPandas(_merge, BLOOM_ROW_SCHEMA)
        )
        self.table.append(updated, lineage={"version": version})

    def prefilter(self, candidates: DataFrame) -> DataFrame:
        m_bits = self.m_bits
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in candidates.schema.fields
        ) + ", maybe_seen boolean"

        def _check(key, cand: pd.DataFrame, bits_pdf: pd.DataFrame):
            cand = cand.drop(columns=["_shard"])
            if not len(cand):
                return cand.assign(maybe_seen=pd.Series(dtype=bool))
            if not len(bits_pdf):
                return cand.assign(maybe_seen=False)
            bits = np.frombuffer(bits_pdf["bits"].iloc[0], dtype=np.uint8)
            pos = _bit_positions(cand["url_hash"].to_numpy(np.int64),
                                 m_bits)
            hit = (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
            return cand.assign(maybe_seen=hit.all(axis=0).astype(bool))

        shards = self._latest().withColumnRenamed("shard", "_shard")
        return (
            candidates.withColumn("_shard", self.shard_col())
            .groupBy("_shard")
            .cogroup(shards.groupBy("_shard"))
            .applyInPandas(_check, out_schema)
        )

    def compact(self) -> None:
        """Fold history: one latest row per shard."""
        self.table.overwrite(self._latest().withColumn(
            "version", F.lit(0).cast("long")
        ).select("shard", "version", "bits"))


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: "ShardedBloom | SnapshotBloom | None" = None,
) -> DataFrame:
    """Rows of ``candidates`` whose url_hash is NOT in ``seen``.

    With a bloom sidecar: definite-new rows bypass the exact join; only
    bloom-maybe rows shuffle against the seen table.  Without: plain
    left_anti (J1 shape, bgg.py:256-261).
    """
    seen_keys = seen.select("url_hash")
    if bloom is None:
        return candidates.join(seen_keys, "url_hash", "left_anti")
    flagged = bloom.prefilter(candidates)
    definite_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(seen_keys, "url_hash", "left_anti")
    return definite_new.unionByName(confirmed_new)
