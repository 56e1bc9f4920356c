"""Multi-executor metric-exactness check: the crawl loop's DRIVING
counts (scheduled, pending, fresh, retries) must be identical between
single-JVM local[N] and a real multi-executor deployment.

Why this needs its own check: an Observation on a cached-and-reused
frame double-fires when a broadcast build and the main job materialize
the same cached partitions on DIFFERENT executors before either stores
them — local mode's in-JVM block locks dedup the computation, a
cluster does not.  Measured before the fix (local-cluster[4,8],
scale-0.2 corpus): scheduled reported 4895 of 2463 rows, pending went
negative, and the crawl ran a phantom extra round.  The engine now
takes every driving count from aggregates riding singly-materialized
WRITE jobs or from manifest arithmetic (plans/crawl.py run_round
"counts" note, CrawlEngine.frontier_rows).

Usage: python tools/check_cluster_counts.py [scale]
Exit 0 = every per-round metric dict identical across deployments.
"""

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, tempfile, shutil, os
sys.path.insert(0, {repo!r})
os.makedirs("/dev/shm/spark-local", exist_ok=True)
os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/spark-local"
from board_game_scraper_spark.session import get_spark
from board_game_scraper_spark import schemas
from board_game_scraper_spark.plans.crawl import CrawlEngine

mode, data = sys.argv[1], sys.argv[2]
if mode == "cluster":
    spark = get_spark("chk", master="local-cluster[4,8,20480]",
                      shuffle_partitions=32,
                      extra_conf={{"spark.driver.memory": "8g",
                                  "spark.executor.memory": "14g",
                                  "spark.executor.extraJavaOptions": "-XX:+UseParallelGC",
                                  "spark.executor.heartbeatInterval": "60s",
                                  "spark.network.timeout": "600s"}})
else:
    spark = get_spark("chk", master="local[8]", shuffle_partitions=8,
                      extra_conf={{"spark.driver.memory": "16g"}})
pages = spark.read.schema(schemas.PAGES).parquet(data + "/pages").cache()
pages.count()
seeds = spark.read.schema(schemas.SEEDS).parquet(data + "/seeds")
root = tempfile.mkdtemp(prefix="chk_", dir="/dev/shm")
eng = CrawlEngine(spark, root, pages, window_sec=100000.0)
eng.seed(seeds)
ms = eng.crawl(8)
shutil.rmtree(root, ignore_errors=True)
# discovered is documented reporting-only (filter_unseen's two branches
# traverse the cached frame; exactness is pinned for DRIVING counts)
for m in ms:
    m.pop("discovered", None)
print("METRICS " + json.dumps(ms))
"""


def run(mode: str, data: str) -> list[dict]:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=str(REPO)), mode, data],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO),
    )
    for line in out.stdout.splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[8:])
    raise RuntimeError(f"no METRICS from {mode}:\n{out.stderr[-2000:]}")


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    import pandas as pd  # noqa: F401

    sys.path.insert(0, str(REPO))
    from board_game_scraper_spark import synth

    data = tempfile.mkdtemp(prefix="chk_corpus_")
    _, pages_pd = synth.corpus(
        n_browse=int(3000 * scale), n_users=int(1500 * scale),
        n_other=int(150 * scale), comments_per_game=10)
    seeds_pd = pd.DataFrame(
        {"url": pages_pd.url_canon, "source": "replay", "priority": 0})
    synth.write_corpus_parquet(pages_pd, seeds_pd, data, n_files=16)

    local = run("local", data)
    cluster = run("cluster", data)
    if local == cluster:
        print(f"OK: {len(local)} rounds, metrics identical across "
              f"local[8] and local-cluster[4,8]")
        sys.exit(0)
    print("MISMATCH")
    print("local  :", json.dumps(local))
    print("cluster:", json.dumps(cluster))
    sys.exit(1)


if __name__ == "__main__":
    import pandas as pd  # noqa: F401

    main()
