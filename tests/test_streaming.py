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
