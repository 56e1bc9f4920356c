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
  state layout as the batch ShardedBloom/SnapshotBloom designs;
- state per shard is an exact hash array here (correctness first); at
  the 10^10-URL design point configure the RocksDB state store
  (``spark.sql.streaming.stateStore.providerClass``) so shard state
  spills to disk, or swap the state payload for the 4 MB bloom bitmap +
  an exact side table, trading a bounded false-positive rate for
  memory like the batch path does.
- no watermark: URL identity never expires (GroupStateTimeout.NoTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "url_canon string, url_hash long"
STATE_SCHEMA = "hashes array<long>"


def unseen_stream(urls: DataFrame, n_shards: int = 64) -> DataFrame:
    """Streaming DataFrame (url_canon, url_hash, ...) → first-seen rows.

    Works across micro-batches AND restarts: the per-shard seen set is
    checkpointed state, so a URL emitted in batch 1 is suppressed in
    batch 100 or after a crash-recovery.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _dedup(key, pdfs: Iterator[pd.DataFrame], state):
        seen = set(state.get[0]) if state.exists else set()
        out_u, out_h = [], []
        for pdf in pdfs:
            for u, h in zip(pdf["url_canon"], pdf["url_hash"]):
                h = int(h)
                if h not in seen:
                    seen.add(h)
                    out_u.append(u)
                    out_h.append(h)
        state.update((sorted(seen),))
        yield pd.DataFrame({"url_canon": out_u, "url_hash": out_h})

    shard = F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    return (
        urls.select("url_canon", "url_hash")
        .withColumn("_shard", shard)
        .groupBy("_shard")
        .applyInPandasWithState(
            _dedup,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
