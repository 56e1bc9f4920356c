"""Scaling-efficiency evidence: the same frontier replay at local[8] vs
local[32] (the sandbox proxy for N vs 4N executors — BASELINE.json
north_rule; no real cluster available here).

Each parallelism level runs in a fresh subprocess (fresh JVM) so nothing
is shared.  Writes BENCH/BASELINE.md with throughput at both levels and
efficiency = (tput_4N / tput_N) / 4.

Usage: python tools/bench_scaling.py [--scale S] [--rounds R]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import pandas as pd
from board_game_scraper_spark.session import get_spark
from board_game_scraper_spark import synth, schemas
from board_game_scraper_spark.plans.crawl import CrawlEngine
import tempfile, shutil

cpus = int(sys.argv[1]); scale = float(sys.argv[2]); rounds = int(sys.argv[3])
spark = get_spark("scaling", master="local[%d]" % cpus,
                  shuffle_partitions=cpus,
                  extra_conf={{"spark.driver.memory": "48g"}})
# Full-frontier replay (the north-metric shape: the 10^10-URL frontier
# already exists; we replay schedule+fetch+parse over it in politeness
# windows).  Seeds = every URL in the corpus; realistic page weights
# (100 rating comments per thing page, like the reference's pagesize).
_, pages_pd = synth.corpus(
    n_browse=int(20000*scale), n_users=int(8000*scale),
    n_other=int(500*scale), comments_per_game=100)
seeds_pd = pd.DataFrame(
    {{"url": pages_pd.url_canon, "source": "replay", "priority": 0}})
seeds = spark.createDataFrame(seeds_pd, schemas.SEEDS)
pages = spark.createDataFrame(pages_pd, schemas.PAGES).cache(); pages.count()
root = tempfile.mkdtemp(prefix="scale_")
eng = CrawlEngine(spark, root, pages, window_sec=100000.0)
t0 = time.perf_counter()
eng.seed(seeds)
ms = eng.crawl(rounds)
dt = time.perf_counter() - t0
urls = sum(m.get("scheduled",0) + 2*m.get("fetched",0) for m in ms)
items = sum(m.get("parsed_items",0) for m in ms)
shutil.rmtree(root, ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": cpus, "seconds": round(dt,2),
    "urls": urls, "parsed_items": items,
    "urls_per_sec": round(urls/dt,1), "pages": int(pages.count()),
    "rounds": len(ms)}}))
"""


def run_level(cpus: int, scale: float, rounds: int) -> dict:
    script = CHILD.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(scale), str(rounds)],
        capture_output=True, text=True, timeout=3000, cwd=str(REPO),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT from local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    r8 = run_level(8, args.scale, args.rounds)
    r32 = run_level(32, args.scale, args.rounds)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0
    time_ratio = r8["seconds"] / r32["seconds"]

    md = f"""# BENCH/BASELINE — frontier replay scaling evidence

North rule (BASELINE.json): frontier throughput (URLs
scheduled+fetched+parsed/sec) with scaling efficiency >= 0.8 from N to 4N
executors.  Sandbox proxy (driver instruction): identical replay at
local[8] vs local[32], same deterministic corpus (seed 42).

| level | cores | pages corpus | rounds | URLs counted | seconds | URLs/sec |
|---|---|---|---|---|---|---|
| N  | 8  | {r8['pages']} | {r8['rounds']} | {r8['urls']} | {r8['seconds']} | {r8['urls_per_sec']} |
| 4N | 32 | {r32['pages']} | {r32['rounds']} | {r32['urls']} | {r32['seconds']} | {r32['urls_per_sec']} |

- **Throughput scaling N→4N: {r32['urls_per_sec']}/{r8['urls_per_sec']} = {r32['urls_per_sec']/r8['urls_per_sec']:.2f}x**
- **Scaling efficiency: {eff:.2f}** (target >= 0.8 of perfect 4x)
- Wall-clock speedup: {time_ratio:.2f}x
- Parsed items: {r32['parsed_items']} (identical at both levels: {r8['parsed_items'] == r32['parsed_items']})

## Extrapolation to the 10^10-URL design point (SURVEY.md §4)

Sandbox replay is ~10^4 pages standing in for 10^10 URLs.  At design
scale the per-round fixed cost (job scheduling, snapshot commit) is
amortized over ~10^6-row
per-host batches, so the parallel fraction → 1 and measured efficiency
here is a lower bound.  Partitioning math at design point: 4096 url-hash
shards; bloom seen-set ~2.4M keys/shard ≈ 4 MB at 14 bits/key (fits
executor memory); hot-host (boardgamegeek.com) handled by the two-phase
salted top-K window (plans/frontier.py) + AQE skew join.

Run of: `python tools/bench_scaling.py --scale {args.scale} --rounds {args.rounds}`
"""
    out = REPO / "BENCH"
    out.mkdir(exist_ok=True)
    (out / "BASELINE.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
