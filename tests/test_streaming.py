"""Structured Streaming wrapper: one crawl round per micro-batch."""

import pytest

from board_game_scraper_spark import schemas, synth
from board_game_scraper_spark.plans.crawl import CrawlEngine
from board_game_scraper_spark.streaming.rounds import stream_crawl


def test_stream_crawl_runs_rounds(spark, corpus_small, tmp_path):
    seeds_pd, pages_pd = corpus_small
    seeds = spark.createDataFrame(seeds_pd, schemas.SEEDS)
    pages = spark.createDataFrame(pages_pd, schemas.PAGES)
    eng = CrawlEngine(spark, tmp_path / "stream", pages)
    eng.seed(seeds)
    ran = stream_crawl(eng, max_rounds=2, trigger_seconds=1)
    assert ran == 2
    assert eng.last_round() == 2
    assert eng.documents.read().count() > 0


def test_stateful_streaming_unseen(spark, tmp_path):
    """applyInPandasWithState seen set: dedups across micro-batches AND
    across a query restart (state restored from the checkpoint)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from board_game_scraper_spark.streaming.dedup import unseen_stream

    src = tmp_path / "src"
    out = tmp_path / "out"
    cp = tmp_path / "cp"
    src.mkdir()

    def write_batch(name, urls):
        pdf = pd.DataFrame({"url_canon": urls})
        df = spark.createDataFrame(pdf).withColumn(
            "url_hash", F.xxhash64("url_canon")
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name)
        )
        import shutil
        for i, f in enumerate(
            sorted((tmp_path / "stage" / name).glob("*.parquet"))
        ):
            shutil.copy(f, src / f"{name}-{i}.parquet")

    def run_query():
        stream = spark.readStream.schema(
            "url_canon string, url_hash long"
        ).parquet(str(src))
        q = (
            unseen_stream(stream, n_shards=4)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(cp))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("b1", ["https://a/1", "https://a/2", "https://a/1"])
    run_query()
    got1 = {r["url_canon"] for r in
            spark.read.parquet(str(out)).collect()}
    assert got1 == {"https://a/1", "https://a/2"}

    # restart with new data: previously-seen URLs stay suppressed
    write_batch("b2", ["https://a/2", "https://a/3"])
    run_query()
    got2 = {r["url_canon"] for r in
            spark.read.parquet(str(out)).collect()}
    assert got2 == {"https://a/1", "https://a/2", "https://a/3"}


def test_stateful_streaming_unseen_bloom_state(spark, tmp_path):
    """Bloom-bitmap state payload (fixed-size per shard): same first-seen
    semantics across batches and restarts — in-batch duplicates, cross-
    batch duplicates, and checkpoint recovery all suppressed."""
    import pandas as pd
    from pyspark.sql import functions as F

    from board_game_scraper_spark.streaming.dedup import unseen_stream

    src = tmp_path / "src"
    out = tmp_path / "out"
    cp = tmp_path / "cp"
    src.mkdir()

    def write_batch(name, urls):
        pdf = pd.DataFrame({"url_canon": urls})
        df = spark.createDataFrame(pdf).withColumn(
            "url_hash", F.xxhash64("url_canon")
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name)
        )
        import shutil
        for i, f in enumerate(
            sorted((tmp_path / "stage" / name).glob("*.parquet"))
        ):
            shutil.copy(f, src / f"{name}-{i}.parquet")

    def run_query():
        stream = spark.readStream.schema(
            "url_canon string, url_hash long"
        ).parquet(str(src))
        q = (
            unseen_stream(stream, n_shards=4, state="bloom",
                          shard_capacity=10_000)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(cp))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [f"https://b/{i}" for i in range(50)] + ["https://b/7"]
    write_batch("b1", batch1)
    run_query()
    got1 = {r["url_canon"] for r in spark.read.parquet(str(out)).collect()}
    assert got1 == {f"https://b/{i}" for i in range(50)}

    # restart: bitmap restored from checkpoint; old URLs suppressed
    write_batch("b2", ["https://b/7", "https://b/99", "https://b/100"])
    run_query()
    got2 = {r["url_canon"] for r in spark.read.parquet(str(out)).collect()}
    assert got2 == ({f"https://b/{i}" for i in range(50)}
                    | {"https://b/99", "https://b/100"})
