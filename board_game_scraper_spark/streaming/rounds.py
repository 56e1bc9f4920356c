"""Incremental crawl execution (SURVEY.md §2.11).

The reference is a long-running incremental crawler (LoopingExtension
tasks at 5min/1h cadence, extensions.py:90,215) rather than a stream
processor.  We reproduce the stream-shaped semantics two ways:

1. **BSP rounds** (plans/crawl.py) — the default and the one the
   equality tests pin down: deterministic micro-batches with external
   state tables (seen/frontier), exactly-once via snapshot commits.
   This is the foreachBatch pattern without needing a streaming source.

2. **Structured Streaming wrapper** (this module): a rate-source-driven
   trigger loop where each micro-batch executes one crawl round via
   ``foreachBatch``.  State stays in the snapshot tables (the analog of
   ``flatMapGroupsWithState`` for the seen set — external state scales
   past executor memory and survives restarts, which the built-in state
   store only does with RocksDB + checkpoint dirs).  Late/retry data is
   gated by the ``not_before_round`` event-time column (F9), so no
   watermark is needed: retries are *scheduled* state, not late events.

The wrapper demonstrates Trigger/foreachBatch plumbing; determinism
tests run against the BSP loop (same code path inside).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.crawl import CrawlEngine


def stream_crawl(
    engine: CrawlEngine,
    max_rounds: int,
    trigger_seconds: int = 1,
):
    """Drive crawl rounds from a Structured Streaming trigger.

    Each micro-batch runs exactly one BSP round; the rate source is only
    a metronome (its rows are ignored).  Returns the StreamingQuery —
    caller awaits termination; the query stops itself when the frontier
    drains or ``max_rounds`` is hit.
    """
    spark: SparkSession = engine.spark
    state = {"rounds": 0}

    def run_one_round(batch_df, batch_id: int) -> None:
        if state["rounds"] >= max_rounds:
            return
        round_no = engine.last_round() + 1
        metrics = engine.run_round(round_no)
        state["rounds"] += 1
        if metrics.get("done") or state["rounds"] >= max_rounds:
            # stop asynchronously; stop() inside foreachBatch deadlocks
            state["done"] = True

    query = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.foreachBatch(run_one_round)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )

    import time

    while query.isActive:
        if state.get("done") or state["rounds"] >= max_rounds:
            query.stop()
            break
        time.sleep(0.2)
    query.awaitTermination(30)
    return state["rounds"]
