"""Round-5 probes: basePath multi-dir hive read; lazy page_rows; cosine rank."""
import sys, tempfile, time
sys.path.insert(0, "/root/repo")
from board_game_scraper_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("probe5", master="local[8]", shuffle_partitions=8)

# --- 1. basePath read over multiple hive-partitioned data dirs ------------
import os
root = tempfile.mkdtemp(prefix="bp_")
for i in range(3):
    df = spark.range(i * 10, i * 10 + 10).withColumn(
        "item_kind", F.when(F.col("id") % 2 == 0, "page").otherwise("game"))
    df.write.partitionBy("item_kind").parquet(f"{root}/data/d{i}")
paths = [f"{root}/data/d{i}" for i in range(3)]
try:
    r = (spark.read.option("basePath", root)
         .parquet(*paths))
    print("BASEPATH-root cols:", r.columns, "rows:", r.count())
except Exception as e:
    print("BASEPATH-root FAIL:", str(e)[:200])
try:
    r = (spark.read.option("basePath", f"{root}/data")
         .parquet(*paths))
    print("BASEPATH-data cols:", r.columns, "rows:", r.count())
except Exception as e:
    print("BASEPATH-data FAIL:", str(e)[:200])
# per-dir basePath? Each dir its own base -> what the current union does.

# --- 2. lazy page_rows: correctness + single sort (exchange reuse) ---------
from board_game_scraper_spark.operators.split import page_rows
df = spark.range(1000).select(F.col("id").alias("k"))
paged = page_rows(df, size=40, order_keys=["k"])
plan = paged._jdf.queryExecution().executedPlan().toString()
print("REUSE-EXCHANGE:", "ReusedExchange" in plan or "TableCacheQueryStage" in plan)
nwin = sum(1 for l in plan.splitlines() if "Window [" in l and "_pid" not in l)
print("UNPARTITIONED-WINDOWS:", nwin)
rows = {r["k"]: r for r in paged.collect()}
ok = (len(rows) == 1000 and rows[0]["page"] == 0 and rows[0]["previous"] is None
      and rows[39]["page"] == 0 and rows[40]["page"] == 1
      and rows[999]["page"] == 24 and rows[999]["next"] is None
      and all(r["count"] == 1000 for r in rows.values()))
print("PAGE-OK:", ok)
rangex = plan.count("rangepartitioning")
print("RANGE-EXCHANGES-IN-PLAN:", rangex)

# --- 3. cosine rank self-join ----------------------------------------------
from board_game_scraper_spark.queries import q_cosine_topk
try:
    out = q_cosine_topk(spark, "/root/testdata/sf0.001").collect()
    print("COSINE rows:", len(out), "ranks:", sorted(r["rk"] for r in out))
    print("COSINE schema:", q_cosine_topk(spark, "/root/testdata/sf0.001").schema.simpleString())
except Exception as e:
    print("COSINE FAIL:", str(e)[:300])

spark.stop()
