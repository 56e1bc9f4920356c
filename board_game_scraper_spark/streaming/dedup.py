"""Stateful streaming URL-seen set (SURVEY §2.11/§2.12).

``unseen_stream`` is the pure Structured Streaming counterpart of
``plans/seen.filter_unseen``: a custom stateful operator built on
``applyInPandasWithState`` (the arbitrary-state API).  Incoming URL
rows are grouped by hash shard; each shard keeps its set of seen
64-bit hashes in the state store and emits only first-seen rows —
exactly Scrapy's dupefilter semantics (reference: implicit dupefilter +
``_ids_seen``, spiders/bgg.py:229-242), but distributed, restart-safe
(state lives in the streaming checkpoint), and continuous.

Scale notes:
- shard-by-``pmod(url_hash, n_shards)`` gives the same partition-local
  state layout as the batch SnapshotBloom design;
- two state payloads (``state=`` param):
  * ``"exact"`` — per-shard exact hash array.  Exact semantics, but
    state grows O(seen) and is rewritten wholesale per batch: fine for
    10^6-10^7 URLs/shard with the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass``), not for 10^10.
  * ``"bloom"`` — per-shard FIXED-SIZE bloom bitmap (the same
    ``_bit_positions`` math as the batch SnapshotBloom).  State is
    ~shard_capacity*14/8 bytes forever; a bounded false-positive rate
    (~0.1% at the 14-bit design point) means a tiny fraction of
    first-seen URLs is wrongly suppressed — the standard crawl-frontier
    trade (the batch path recovers these via its exact anti-join; a
    streaming deployment that cannot tolerate FPs routes bloom-maybe
    rows to a batch-side exact check instead of dropping them).
- no watermark: URL identity never expires (GroupStateTimeout.NoTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.seen import BITS_PER_KEY, _bit_positions

OUT_SCHEMA = "url_canon string, url_hash long"
STATE_SCHEMA = "hashes array<long>"
STATE_SCHEMA_BLOOM = "bits binary"


def unseen_stream(urls: DataFrame, n_shards: int = 64,
                  state: str = "exact",
                  shard_capacity: int = 1_000_000) -> DataFrame:
    """Streaming DataFrame (url_canon, url_hash, ...) → first-seen rows.

    Works across micro-batches AND restarts: the per-shard seen set is
    checkpointed state, so a URL emitted in batch 1 is suppressed in
    batch 100 or after a crash-recovery.  ``state="bloom"`` swaps the
    exact array for a fixed-size bloom bitmap (see module docstring).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _dedup(key, pdfs: Iterator[pd.DataFrame], st):
        seen = set(st.get[0]) if st.exists else set()
        out_u, out_h = [], []
        for pdf in pdfs:
            for u, h in zip(pdf["url_canon"], pdf["url_hash"]):
                h = int(h)
                if h not in seen:
                    seen.add(h)
                    out_u.append(u)
                    out_h.append(h)
        st.update((sorted(seen),))
        yield pd.DataFrame({"url_canon": out_u, "url_hash": out_h})

    m_bits = max(shard_capacity * BITS_PER_KEY, 1024)

    def _dedup_bloom(key, pdfs: Iterator[pd.DataFrame], st):
        bits = (np.frombuffer(st.get[0], dtype=np.uint8).copy()
                if st.exists
                else np.zeros(m_bits // 8 + 1, dtype=np.uint8))
        frames = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            hashes = pdf["url_hash"].to_numpy(np.int64)
            pos = _bit_positions(hashes, m_bits)
            hit = (
                (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
            ).all(axis=0)
            # first occurrence within the batch wins; later dups in the
            # same batch see the bits set below
            fresh_mask = ~hit
            fresh = pdf.loc[fresh_mask, ["url_canon", "url_hash"]]
            if len(fresh):
                fresh = fresh.drop_duplicates(subset="url_hash")
                fpos = _bit_positions(
                    fresh["url_hash"].to_numpy(np.int64), m_bits
                ).ravel()
                np.bitwise_or.at(bits, fpos // 8,
                                 (1 << (fpos % 8)).astype(np.uint8))
                frames.append(fresh)
        st.update((bits.tobytes(),))
        yield (pd.concat(frames, ignore_index=True) if frames
               else pd.DataFrame({"url_canon": pd.Series(dtype=object),
                                  "url_hash": pd.Series(dtype=np.int64)}))

    fn, schema = ((_dedup_bloom, STATE_SCHEMA_BLOOM)
                  if state == "bloom" else (_dedup, STATE_SCHEMA))
    shard = F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    return (
        urls.select("url_canon", "url_hash")
        .withColumn("_shard", shard)
        .groupBy("_shard")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
