"""Oracle-checked query surface (driver contract in __spark_entry__.py).

Each ``q_*`` function takes (spark, sf_dir) and returns a DataFrame; the
matching entry in ``ORACLES`` is ANSI SQL DuckDB runs over the same
parquet tables.  Every query exercises one operator family from
SURVEY.md §2 (reference file:line in each docstring); together they are
the engine's regression surface.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the SQL oracle (driver hashes values under sorted
column names).

Float discipline: any aggregate over doubles is either cast to DECIMAL
before summing (exact in both engines) or rounded to a tolerance-safe
number of decimals, so cross-engine partial-sum ordering can't flip the
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _par(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive scan spreading (guide §2.5, "input skew: one huge
    unsplittable file ... repartition immediately after the read").

    The sandbox testdata tables are single-file single-ROW-GROUP parquet
    (verified with pyarrow: sf0.1 lineitem = 600k rows in 1 row group),
    which Spark cannot split — so every operator between such a scan and
    the first exchange runs as ONE task no matter how many cores the
    session has.  For compute-dense pipelines (per-row md5/shingle HOFs,
    embedding dot products, Python parse kernels) that serializes the
    dominant cost: measured at 10x-sf0.1 stretch scale, the
    near_dup_pairs signature stage is 19.1 s serial vs 2.3 s after a
    hash repartition, minhash_band 2.6 s vs 0.4 s.

    Only fires when the scan yields fewer partitions than the session's
    parallelism — at real scale (many files / row groups) it is the
    identity and adds NO shuffle.  The explicit numPartitions keeps AQE
    from coalescing the tiny exchange back to one partition; hashing on
    the table's unique key avoids round-robin's sort-before-repartition.
    Row order changes, results do not (every consumer is a key
    aggregation, equi-join, or row-wise projection; the oracle hash is
    order-insensitive).  Applied only where per-row compute outweighs
    one narrow-payload shuffle — NOT to plain scan+partial-agg queries
    (lineitem_agg, dedup_exact ...), where shuffling full rows out of
    the same serial scan would cost more than it distributes."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *[F.col(k) for k in keys])


# ---------------------------------------------------------------------------
# Merge / dedup family (A1, merge.py:62-67,202-208)
# ---------------------------------------------------------------------------

def q_merge_latest_wins(spark, sf_dir):
    """Latest-wins dedup per user: the reference's core merge operator
    (merge.py:202-208 reduceByKey argmax; ties → larger event_id, mirroring
    the later-file-wins tie-break merge.py:62-67)."""
    ev = _t(spark, sf_dir, "events")
    payload = F.struct(*[F.col(c) for c in ev.columns])
    ordering = F.struct(F.col("ts"), F.col("event_id"))
    out = ev.groupBy("user_id").agg(F.max_by(payload, ordering).alias("_r"))
    return out.select(
        F.col("user_id").alias("user_id"),
        F.col("_r.event_id").alias("event_id"),
        F.col("_r.ts").alias("ts"),
        F.col("_r.event_type").alias("event_type"),
        F.col("_r.value").alias("value"),
    )


def q_dedup_exact(spark, sf_dir):
    """Exact content dedup by hash (training-pipeline op; groupBy md5)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.col("text")).alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


# ---------------------------------------------------------------------------
# Frontier scheduling family (F1-F3, F8, F9, F11)
# ---------------------------------------------------------------------------

def q_topk_per_host(spark, sf_dir):
    """Per-host politeness top-K (F1/F2: spiders/bgg.py:284-291 priorities +
    settings.py:153-155 budgets), modeled as top-3 events per event_type by
    (value desc, event_id asc)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("event_type", "event_id", "value", "rk")
    )


def q_batchify(spark, sf_dir):
    """Request batching (F8, bgg.py:251-294: ≤10 ids per API URL,
    comma-joined): bucket ordered ids per group into batches of 10."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    rn = F.row_number().over(w)
    batched = ev.select(
        "event_type",
        "event_id",
        F.floor((rn - 1) / 10).cast("int").alias("batch"),
    )
    return batched.groupBy("event_type", "batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.concat_ws(",", F.array_sort(F.collect_list("event_id"))).alias("ids_csv"),
    )


def q_retry_backoff(spark, sf_dir):
    """Retry with exponential backoff (F9, settings.py:247-253: delayed
    retry, backoff capped): failed fetches get not_before = ts + delay*2^attempt."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "error")
    attempt = F.pmod(F.col("event_id"), F.lit(5)).cast("int")
    backoff = F.least(
        F.pow(F.lit(2.0), attempt) * 5, F.lit(100.0)
    ).cast("long")
    return ev.select(
        "event_id",
        attempt.alias("attempt"),
        backoff.alias("backoff_sec"),
        (F.unix_timestamp("ts") + backoff).alias("not_before_epoch"),
    )


def q_rescrape_window(spark, sf_dir):
    """Rescrape suppression (F11, extensions.py:137-145: drop re-crawl
    within window): keep an event only if >= 600s after the user's
    previous event."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        ev.withColumn("prev_ts", prev)
        .where(
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") >= 600)
        )
        .select("event_id", "user_id", "ts")
    )


def q_anti_join_seen(spark, sf_dir):
    """Seen-set anti-join (J1/F7, bgg.py:256-261 _ids_seen filter): orders
    whose customer is NOT in the 'seen' set (negative balance)."""
    orders = _t(spark, sf_dir, "orders")
    seen = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0)
    return orders.join(
        F.broadcast(seen.select(F.col("c_custkey").alias("o_custkey"))),
        on="o_custkey",
        how="left_anti",
    ).select("o_orderkey", "o_custkey")


# ---------------------------------------------------------------------------
# Canonicalization / extraction family (C5, C8, E8, E12, E13, E14)
# ---------------------------------------------------------------------------

def q_extract_bgg_id(spark, sf_dir):
    """BGG id normalization (C5, utils.py:280-288 regex ^/(board)?game/(\\d+))
    over synthesized paths."""
    orders = _t(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("/boardgame/"), F.col("o_orderkey").cast("string"), F.lit("/name")
    )
    return orders.select(
        "o_orderkey",
        url.alias("path"),
        F.regexp_extract(url, r"^/(board)?game/(\d+)", 2).cast("long").alias("bgg_id"),
    )


def q_range_validate(spark, sf_dir):
    """Range validation (C8, utils.py:190-197): value in [lo,hi] else NULL."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            (F.col("l_quantity") >= 5) & (F.col("l_quantity") <= 45),
            F.col("l_quantity"),
        ).alias("qty_valid"),
    )


def q_value_id_encode(spark, sf_dir):
    """value:id encoding (E8, bgg.py:85-105): 'Name:123' strings + trailing
    ' Rank' strip."""
    nation = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.concat_ws(
            ":", F.col("n_name"), F.col("n_nationkey").cast("string")
        ).alias("value_id"),
        F.regexp_replace(
            F.concat(F.col("n_name"), F.lit(" Rank")), " [Rr]ank$", ""
        ).alias("rank_stripped"),
    )


def q_interval_parse(spark, sf_dir):
    """Interval parse (E12, spielen.py:16-27: '2 - 4 Spieler' → min,max)."""
    part = _t(spark, sf_dir, "part")
    text = F.concat(
        F.col("p_size").cast("string"),
        F.lit(" - "),
        (F.col("p_size") + 2).cast("string"),
        F.lit(" Spieler"),
    )
    return part.select(
        "p_partkey",
        text.alias("raw"),
        F.regexp_extract(text, r"(\d+)(\s*-\s*(\d+))?", 1).cast("int").alias("lo"),
        F.regexp_extract(text, r"(\d+)(\s*-\s*(\d+))?", 3).cast("int").alias("hi"),
    )


def q_lenient_int(spark, sf_dir):
    """Lenient int parse (E13, bgg.py:31-49: '~1,234 votes' → 1234)."""
    cust = _t(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("~"),
        F.format_number(F.col("c_custkey").cast("long") * 1000, 0),
        F.lit(" votes"),
    )
    digits = F.regexp_replace(raw, "[^0-9]", "")
    return cust.select(
        "c_custkey",
        raw.alias("raw"),
        digits.cast("long").alias("votes"),
    )


def q_archive_date(spark, sf_dir):
    """Timestamp from archive URL (E14, bgg_rankings.py:23-24:
    web.archive.org/web/YYYYMMDDHHMMSS/)."""
    ev = _t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("http://web.archive.org/web/"),
        F.date_format("ts", "yyyyMMddHHmmss"),
        F.lit("/https://boardgamegeek.com/browse/boardgame"),
    )
    return ev.select(
        "event_id",
        url.alias("url"),
        F.to_timestamp(
            F.regexp_extract(url, r"/web/(\d{14})", 1), "yyyyMMddHHmmss"
        ).alias("archived_at"),
    )


def q_clean_text(spark, sf_dir):
    """normalize-space cleanup (C7 JVM-side tail + C10 _remove_empty,
    merge.py:81-93): collapse whitespace, NULL when empty."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    cleaned = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.when(F.length(cleaned) > 0, cleaned).alias("text_clean"),
    )


# ---------------------------------------------------------------------------
# Pagination / partitioning family (S11, A2)
# ---------------------------------------------------------------------------

def q_pagination(spark, sf_dir):
    """Paginated split (S11, split.py:113-117: count/previous/next/page).

    Runs the scale-safe two-pass operator (operators/split.py): global
    positions come from a range-partitioned sort + per-partition
    row_number + broadcast offsets — no single-partition WindowExec
    anywhere in the plan (VERDICT r03 'wrong' #2)."""
    from .operators.split import page_rows

    docs = _t(spark, sf_dir, "documents")
    return page_rows(docs, size=25, order_keys=["doc_id"]).select(
        "doc_id", "page", "count", "previous", "next"
    )


def q_prefix_count(spark, sf_dir):
    """Adaptive prefix counting (A2, prefixes.py:53-68): counts per
    sanitized 2-char key prefix ([^a-z] → '_', prefixes.py:27-30)."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    key = F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "_")
    return docs.groupBy(F.substring(key, 1, 2).alias("prefix")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Text-analysis family (training-pipeline ops)
# ---------------------------------------------------------------------------

def q_token_count(spark, sf_dir):
    """Token counting over documents (whitespace tokenizer)."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


def q_quality_score(spark, sf_dir):
    """Document quality scoring: stopword ratio + mean token length."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    # materialize the split once — inline, each of the 5 references below
    # would re-run the regex split per row (guide §1.2: per-task work)
    tdf = docs.select("doc_id", "text", toks.alias("toks"))
    tk = F.col("toks")
    stop = F.filter(tk, lambda x: x.isin(*STOPWORDS))
    return tdf.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        F.size(stop).alias("n_stopwords"),
        F.round(F.size(stop) / F.size(tk), 4).alias("stopword_ratio"),
        F.round(
            (F.length(F.trim(F.col("text"))) - F.size(tk) + 1)
            / F.size(tk),
            4,
        ).alias("mean_token_len"),
    )


def _sh_from_toks(k: int = 3):
    """k-word shingles from a MATERIALIZED ``toks`` array column.

    The tokenizer split() must be a real column, not an inline
    expression: interpreted HOF lambdas re-evaluate their body per
    element, and CollapseProject inlines a non-cheap expression into a
    lambda when it is referenced once syntactically — so an inline
    split() runs 3x per shingle (measured 24x slowdown of minhash_band
    at sf0.1: 7.2s vs 0.30s).  The 4 syntactic references to ``toks``
    here (size + k element_at) keep CollapseProject from substituting
    the split back in (it refuses to duplicate non-cheap expressions,
    SPARK-36718)."""
    tk = F.col("toks")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (k - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tk, i + j) for j in range(k)]
        ),
    )


def q_minhash_band(spark, sf_dir):
    """MinHash near-dup bucketing: 3-word shingles → md5 → min per doc;
    docs sharing a band value are near-dup candidates."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tdf = docs.select("doc_id", toks.alias("toks"))
    minhash = F.array_min(F.transform(_sh_from_toks(), F.md5))
    return tdf.select("doc_id", minhash.alias("minhash"))


# ---------------------------------------------------------------------------
# Similarity-search family (embeddings)
# ---------------------------------------------------------------------------

def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 against the vec_id=0 query vector
    (training-pipeline ANN baseline; exact, rounded for cross-engine
    float stability)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    joined = emb.where(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("embedding", "qvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    norm_q = F.sqrt(F.aggregate("qvec", F.lit(0.0), lambda acc, x: acc + x * x))
    cos = F.round(dot / (norm_a * norm_q), 4)
    # Distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps, no single-partition window); the rank window
    # then runs over only 10 rows.
    top = (
        joined.select("vec_id", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    # Rank over the 10 surviving rows WITHOUT a global window (keeps
    # the bench tail free of WARN WindowExec noise): rk = 1 + number of
    # rows strictly ahead in (cosine desc, vec_id asc) order — a 10×10
    # broadcast self-join.
    ahead = top.select(F.col("cosine").alias("_c2"),
                       F.col("vec_id").alias("_v2"))
    return (
        top.join(
            F.broadcast(ahead),
            (F.col("_c2") > F.col("cosine"))
            | ((F.col("_c2") == F.col("cosine"))
               & (F.col("_v2") < F.col("vec_id"))),
            "left",
        )
        .groupBy("vec_id", "cosine")
        .agg((F.count("_v2") + 1).cast("int").alias("rk"))
    )


# ---------------------------------------------------------------------------
# Relational / analytics family (flagship aggregation + join)
# ---------------------------------------------------------------------------

def q_lineitem_agg(spark, sf_dir):
    """TPC-H Q1-style aggregation (flagship scan+agg; DECIMAL casts keep
    sums bit-equal across engines)."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_agg(spark, sf_dir):
    """Broadcast-dim join + agg (J4 label-resolution shape,
    pipelines.py:87-130: explode → broadcast join small dim → re-agg):
    revenue per nation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Content-dedup family v2 (SimHash / MinHash-LSH / near-dup verify).
# Production operators (operators/dedup.py) use xxhash64; these oracle
# variants use the low 60 bits of md5 so DuckDB can reproduce the hash
# exactly — same logic, portable hash.
# ---------------------------------------------------------------------------

def _h60(col):
    """Low-60-bit md5 hash, reproducible in DuckDB via
    ('0x'||substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_H60_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _toks(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def _shingles(text_col, k=3):
    toks = _toks(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )


def q_simhash(spark, sf_dir):
    """SimHash fingerprint (training-pipeline near-dup op): 16-bit
    sign-aggregate of per-token hashes, all JVM-side HOFs.

    One md5 per distinct token (not one per token PER BIT): each token's
    hash is bound once via a 1-element transform input (HOF inputs are
    evaluated once; lambda bodies are re-evaluated per element), its 16
    ±1 bit contributions are unrolled into an array, and a single
    aggregate() keeps the 16 running sums elementwise.  Same sums in the
    same order as the per-bit formulation → identical fingerprints."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    tdf = docs.select(
        "doc_id", F.array_distinct(_toks(F.col("text"))).alias("toks")
    )

    def contrib(t):
        # bind h = _h60(t) once per token via the HOF input position
        return F.element_at(
            F.transform(
                F.array(_h60(t)),
                lambda h: F.array(
                    *[
                        F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int")
                        * 2
                        - 1
                        for b in range(16)
                    ]
                ),
            ),
            1,
        )

    sums = F.aggregate(
        F.col("toks"),
        F.array_repeat(F.lit(0), 16),
        lambda acc, t: F.zip_with(acc, contrib(t), lambda a, b: a + b),
    )
    sdf = tdf.select("doc_id", sums.alias("sums"))
    sim = None
    for b in range(16):
        term = F.when(
            F.element_at(F.col("sums"), b + 1) >= 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sdf.select("doc_id", sim.cast("long").alias("simhash"))


def _minhash_sig_col():
    """8-perm MinHash signature from a MATERIALIZED ``sh`` column: ONE
    pass over the shingles; per shingle all 8 salted hashes at once,
    folded with an elementwise running min.  min commutes with the fold,
    so the result equals the per-perm array_min formulation exactly
    (shingle arrays are never empty: split('') yields [''], and
    element_at past the end is NULL which concat_ws skips, so the 2^62
    seed never survives)."""
    return F.aggregate(
        F.col("sh"),
        F.array_repeat(F.lit(1 << 62).cast("long"), 8),
        lambda acc, s: F.zip_with(
            acc,
            # unrolled, pre-merged literal salts: concat("p:", s) builds
            # the same md5 input bytes as concat(cast(p), ":", s)
            F.array(*[_h60(F.concat(F.lit(f"{p}:"), s)) for p in range(8)]),
            lambda a, b: F.least(a, b),
        ),
    )


def q_minhash_lsh_bands(spark, sf_dir):
    """MinHash-LSH banding: 8-perm signature → 2 bands of 4 → band key.
    Docs sharing (band, band_key) are near-dup candidates found by
    equi-join (the only shape that survives 10^10 docs)."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    tdf = docs.select("doc_id", _toks(F.col("text")).alias("toks"))
    shdf = tdf.select("doc_id", _sh_from_toks().alias("sh"))
    sigdf = shdf.select("doc_id", _minhash_sig_col().alias("sig"))
    banded = sigdf.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ":",
                        F.slice(F.col("sig"), b * 4 + 1, 4)
                        .cast("array<string>"),
                    )
                ),
            )
        ).alias("band", "band_key"),
    )
    return banded


def _docs_with_near_dups(spark, sf_dir):
    """documents ∪ mutated copies (first token dropped, doc_id+100000) —
    deterministic near-duplicates for pair detection."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace(F.trim(F.col("text")), r"^\S+\s+", "").alias("text"),
    )
    return docs.unionByName(mutated)


def q_near_dup_pairs(spark, sf_dir):
    """LSH candidate pairs + exact shingle-Jaccard verify >= 0.5 over a
    corpus with planted near-duplicates."""
    docs = _docs_with_near_dups(spark, sf_dir)
    tdf = docs.select("doc_id", _toks(F.col("text")).alias("toks"))
    sh = tdf.select("doc_id", _sh_from_toks().alias("sh"))
    sigdf = sh.select("doc_id", _minhash_sig_col().alias("sig"))
    banded = sigdf.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ":",
                        F.slice(F.col("sig"), b * 4 + 1, 4)
                        .cast("array<string>"),
                    )
                ),
            )
        ).alias("band_key"),
    )
    # Candidate pairs by GROUPING on band_key instead of a self-join:
    # the join computed the whole signature pipeline twice (broadcast
    # build side + stream side, no exchange reuse), i.e. ~2x the query's
    # dominant cost.  One shuffle of (band_key, doc_id), sorted bucket
    # members, ordered in-bucket pairs via posexplode (per-row memory
    # stays O(bucket), the pair count is identical to the join's
    # output).  Same pair set: (a < b) sharing >= 1 band, then distinct.
    buckets = banded.groupBy("band_key").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    cand = (
        buckets.where(F.size("ids") >= 2)
        .select("ids", F.posexplode("ids").alias("i", "a"))
        .select(
            "a",
            F.explode(
                F.slice(F.col("ids"), F.col("i") + 2, F.size("ids"))
            ).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("a"),
                            F.col("sh").alias("sh_a")), "a")
        .join(sh.select(F.col("doc_id").alias("b"),
                        F.col("sh").alias("sh_b")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.5)
    )
    return verified


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (training-pipeline dedup op):
    embeddings ∪ deterministic perturbed copies (vec_id+100000, first
    component +0.25) → 4-table × 8-plane hyperplane-LSH bucketing →
    candidate pairs by (table, bucket) EQUI-join → exact cosine verify
    >= 0.9.  Same shape as ``operators/similarity.embedding_near_dup``
    (which derives hyperplane weights from xxhash64); this oracle
    variant derives them from md5 so DuckDB reproduces the buckets
    bit-exactly — same production-vs-oracle hash split as the
    SimHash/MinHash family above.  Bucket bits take the sign of a
    6-decimal-rounded plane dot so float noise can't flip a bit in one
    engine only.  LSH recall < 1 by design: BOTH engines drop the same
    pairs, so the comparison stays exact while the plan stays
    all-pairs-free (banded equi-join, never a cartesian)."""
    emb = _t(spark, sf_dir, "embeddings")
    e64 = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", e64.alias("emb")).unionByName(
        emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array(F.element_at(e64, 1) + F.lit(0.25)),
                F.slice(e64, 2, 63),
            ).alias("emb"),
        )
    )
    def plane_dot(t, p):
        # The hyperplane weights are pure constants — md5 of the literal
        # "t:p:d" — but Catalyst does not constant-fold through HOF
        # lambdas, so the inline formulation re-hashed 4*8*64 = 2048
        # md5+conv PER ROW.  Fold them here in Python (hashlib.md5 of the
        # same bytes, same % 2001 - 1000 / 1000.0 arithmetic → identical
        # IEEE doubles → identical bucket bits).
        import hashlib

        w = F.array(
            *[
                F.lit(
                    (
                        int(
                            hashlib.md5(
                                f"{t}:{p}:{d}".encode()
                            ).hexdigest()[:15],
                            16,
                        )
                        % 2001
                        - 1000
                    )
                    / 1000.0
                )
                for d in range(64)
            ]
        )
        return F.round(
            F.aggregate(
                F.zip_with(F.col("emb"), w, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    sigs = None
    for t in range(4):
        bucket = None
        for p in range(8):
            bit = (
                F.when(plane_dot(t, p) >= 0, F.lit(1 << p))
                .otherwise(F.lit(0))
            )
            bucket = bit if bucket is None else bucket + bit
        bt = base.select(
            "vec_id", F.lit(t).alias("t"), bucket.cast("long").alias("bucket")
        )
        sigs = bt if sigs is None else sigs.unionByName(bt)
    # grouped in-bucket pair expansion instead of a self-join (which
    # would compute every table's bucketing twice) — same pair set
    buckets = sigs.groupBy("t", "bucket").agg(
        F.array_sort(F.collect_list("vec_id")).alias("ids")
    )
    cand = (
        buckets.where(F.size("ids") >= 2)
        .select("ids", F.posexplode("ids").alias("i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.slice(F.col("ids"), F.col("i") + 2, F.size("ids"))
            ).alias("id_b"),
        )
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    va = base.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("va"))
    vb = base.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot / (na * nb), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.9)
    )


def q_fingerprint(spark, sf_dir):
    """Winnowing-style document fingerprint: 4 smallest shingle hashes
    combined into one md5 (rolling-hash min-sketch)."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    tdf = docs.select("doc_id", _toks(F.col("text")).alias("toks"))
    shdf = tdf.select("doc_id", _sh_from_toks().alias("sh"))
    hashes = F.array_sort(F.transform(F.col("sh"), _h60))
    mins = F.slice(hashes, 1, 4)
    return shdf.select(
        "doc_id",
        F.md5(F.concat_ws(":", mins.cast("array<string>"))).alias(
            "fingerprint"
        ),
    )


# ---------------------------------------------------------------------------
# Text-analysis family v2
# ---------------------------------------------------------------------------

_LANGS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "ein",
           "nicht"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "que"),
    "es": ("el", "de", "que", "y", "los", "un", "por", "con", "una", "las"),
}


def q_language_id(spark, sf_dir):
    """Language ID by stopword-profile hits; deterministic tie-break by
    profile order en > de > fr > es."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    # two materialization steps: the split once (not once per language
    # filter), then the 4 per-language scores once (not once per WHEN arm)
    tdf = docs.select("doc_id", _toks(F.col("text")).alias("toks"))
    sdf = tdf.select(
        "doc_id",
        F.array(
            *[
                F.size(F.filter(F.col("toks"), lambda t: t.isin(*words)))
                for words in _LANGS.values()
            ]
        ).alias("sc"),
    )
    sc = {lang: F.element_at(F.col("sc"), i + 1)
          for i, lang in enumerate(_LANGS)}
    best = F.greatest(*sc.values())
    lang = (
        F.when(best <= 0, F.lit(None).cast("string"))
        .when(sc["en"] == best, F.lit("en"))
        .when(sc["de"] == best, F.lit("de"))
        .when(sc["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return sdf.select(
        "doc_id", lang.alias("lang_pred"), best.alias("lang_score")
    )


def q_bpe_token_count(spark, sf_dir):
    """BPE-ish regex token count (letters / digits / punct runs)."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.trim(F.col("text")), F.lit(pat), 0))
        .alias("bpe_tokens"),
        F.size(_toks(F.col("text"))).alias("ws_tokens"),
    )


def q_quality_full(spark, sf_dir):
    """Composite quality score: length / stopword / distinct /
    punctuation components (pre-training quality gate)."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    # materialize the split once (inline, the ~10 references below would
    # each re-run the regex split per row)
    tdf = docs.select(
        "doc_id",
        F.trim(F.col("text")).alias("text"),
        _toks(F.trim(F.col("text"))).alias("toks"),
    )
    text = F.col("text")
    toks = F.col("toks")
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(*_LANGS["en"])))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop / n_tok
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    score = (
        F.lit(0.25) * len_score
        + F.lit(0.25) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.25) * distinct_ratio
        + F.lit(0.25) * (1 - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return tdf.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(score, 4).alias("quality"),
    )


def q_array_except_stopwords(spark, sf_dir):
    """Per-row set difference (U3, luding.py:91 link-except shape):
    first 5 sorted distinct non-stopword tokens."""
    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    toks = _toks(F.col("text"))
    stops = F.array(*[F.lit(w) for w in _LANGS["en"]])
    kept = F.slice(F.array_sort(F.array_except(toks, stops)), 1, 5)
    return docs.select(
        "doc_id", F.concat_ws(",", kept).alias("top_tokens")
    )


def q_commons_rewrite(spark, sf_dir):
    """Commons image-URL rewrite (C12, pipelines.py:146-184): dbpedia
    file pages → Special:Redirect; other URLs untouched."""
    from .functions.text import commons_image_url_col

    part = _t(spark, sf_dir, "part")
    url = F.when(
        F.col("p_partkey") % 2 == 0,
        F.concat(F.lit("http://dbpedia.org/resource/File:Img_"),
                 F.col("p_partkey").cast("string"), F.lit(".jpg")),
    ).otherwise(
        F.concat(F.lit("https://example.com/img/"),
                 F.col("p_partkey").cast("string"), F.lit(".png"))
    )
    return part.select(
        "p_partkey",
        url.alias("url"),
        commons_image_url_col(url).alias("resolved"),
    )


def q_explode_collect(spark, sf_dir):
    """Label-resolution join shape (J4, pipelines.py:87-130): broadcast
    dim join then ordered collect_list back per group."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation),
                  cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.concat_ws(
                ",",
                F.slice(F.array_sort(F.collect_list("c_custkey")), 1, 10)
                .cast("array<string>"),
            ).alias("first_custkeys"),
        )
    )


def q_union_distinct(spark, sf_dir):
    """Set union (U2, extensions.py:166-174 premium-user union)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


def q_rankings_extract(spark, sf_dir):
    """bgg_rankings historical-layout extraction (E2,
    bgg_rankings.py:247-277): era-B HTML generated deterministically from
    ``part``, parsed by the REAL parser (stdlib DOM, Arrow-batched); the
    oracle recomputes the planted ground truth directly."""
    from .plans.parse import parse_bgg_rankings

    part = _par(_t(spark, sf_dir, "part"), "p_partkey")
    pk = F.col("p_partkey")
    rank_s = (pk % 997 + 1).cast("string")
    bayes_s = F.concat(
        (pk % 5 + 5).cast("string"), F.lit("."),
        F.lpad((pk % 100).cast("string"), 2, "0"),
    )
    body = F.concat(
        F.lit('<html><body><div class="simplebox"><table>'
              "<tr><th>Rank</th><th>Game</th><th>Rating</th></tr><tr><td>"),
        rank_s,
        F.lit('</td><td><a href="/game/'), (pk + 1).cast("string"),
        F.lit('">Game '), (pk + 1).cast("string"),
        F.lit("</a></td><td>"), bayes_s,
        F.lit("</td></tr></table></div></body></html>"),
    )
    src = part.select("p_partkey", body.alias("body"))

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for k, b in zip(pdf["p_partkey"], pdf["body"]):
                games = parse_bgg_rankings(
                    "https://boardgamegeek.com/rankbrowse.php3", b
                )["games"]
                if games:
                    g = games[0]
                    rows.append((int(k), g["bgg_id"], g["rank"], g["name"],
                                 g["bayes_rating"]))
            yield pd.DataFrame(
                rows,
                columns=["p_partkey", "bgg_id", "rank", "name",
                         "bayes_rating"],
            )

    return src.mapInPandas(
        _kernel,
        "p_partkey long, bgg_id long, rank int, name string, "
        "bayes_rating double",
    )


def q_geeklist_extract(spark, sf_dir):
    """bgg_geeklist item extraction (bgg_geeklist.py:49-106) incl. the
    excluded-id rule (197551): listitem HTML generated from ``customer``,
    parsed by the real parser; oracle recomputes ground truth."""
    from .plans.parse import parse_bgg_geeklist

    cust = _par(_t(spark, sf_dir, "customer"), "c_custkey")
    ck = F.col("c_custkey")
    gid = F.when(ck % 100 == 0, F.lit(197551)).otherwise(ck).cast("string")
    rank_s = (ck % 500 + 1).cast("string")
    body = F.concat(
        F.lit('<html><body><div data-objecttype="listitem">'
              '<div class="geeklist_item_title"><a href="/item/1">'),
        rank_s, F.lit(":</a> "),
        F.lit('<a href="/boardgame/'), gid, F.lit('/g">Game '), gid,
        F.lit("</a></div></div></body></html>"),
    )
    src = cust.select("c_custkey", body.alias("body"))

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for k, b in zip(pdf["c_custkey"], pdf["body"]):
                games = parse_bgg_geeklist(
                    "https://boardgamegeek.com/geeklist/1/x", b
                )["games"]
                if games:
                    g = games[0]
                    rows.append((int(k), g["bgg_id"], g["rank"], g["name"]))
            yield pd.DataFrame(
                rows, columns=["c_custkey", "bgg_id", "rank", "name"]
            )

    return src.mapInPandas(
        _kernel, "c_custkey long, bgg_id long, rank int, name string"
    )


def q_dbpedia_extract(spark, sf_dir):
    """dbpedia property-table fold (dbpedia.py:375-521): the synthetic
    SPARQL-XML generator is the planted ground truth — the kernel builds
    each page from the key and runs the REAL parser; the oracle
    recomputes the expected fields directly."""
    from .plans.parse import parse_dbpedia_game
    from .synth import dbpedia_game_body

    cust = _par(_t(spark, sf_dir, "customer"), "c_custkey")
    src = cust.select("c_custkey")

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for k in pdf["c_custkey"]:
                k = int(k)
                g = parse_dbpedia_game(
                    f"dbp://{k}", dbpedia_game_body(k)
                )["games"][0]
                rows.append((k, g["bgg_id"], g["name"], g["year"],
                             g["designer"][0], g["publisher"][0],
                             g["min_players"], g["min_age"]))
            yield pd.DataFrame(
                rows,
                columns=["c_custkey", "bgg_id", "name", "year",
                         "designer", "publisher", "min_players",
                         "min_age"],
            )

    return src.mapInPandas(
        _kernel,
        "c_custkey long, bgg_id long, name string, year int, "
        "designer string, publisher string, min_players int, min_age int",
    )


def q_entity_resolution(spark, sf_dir):
    """J5 entity resolution (reference cluster.py:187-337) through the
    real operator pipeline: exact-id edges + blocked fuzzy-name edges +
    connected components.  Planted cross-source triples per customer —
    two records share a bgg_id (exact edge), a third links only by name
    similarity (fuzzy edge, token-block join) — so every component and
    canonical id is known in closed form for the oracle."""
    from .operators.cluster import resolve_entities

    cust = _t(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    year = (1990 + ck % 30).cast("int")
    a = cust.select(
        (2 * ck).alias("rec_id"), ck.alias("bgg_id"),
        F.concat(F.lit("alpha beta game"), ck.cast("string")).alias("name"),
        year.alias("year"),
    )
    b = cust.select(
        (2 * ck + 1).alias("rec_id"), ck.alias("bgg_id"),
        F.concat(F.lit("alpha beta game"), ck.cast("string")).alias("name"),
        year.alias("year"),
    )
    c = cust.select(
        (10_000_000 + ck).alias("rec_id"),
        F.lit(None).cast("long").alias("bgg_id"),
        F.concat(F.lit("alpha beta gamma"), ck.cast("string"),
                 F.lit(" game"), ck.cast("string")).alias("name"),
        year.alias("year"),
    )
    records = a.unionByName(b).unionByName(c)
    return resolve_entities(records, "rec_id", "name", "year")


def q_labels_resolve(spark, sf_dir):
    """C13/J4 label resolution (pipelines.py:61-143) through the real
    operator: planted Q-id arrays + a labels dim; unresolvable ids drop,
    order = (id position, language priority)."""
    from .operators.labels import resolve_labels

    cust = _t(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    items = cust.select(
        ck.alias("key"),
        F.array(
            F.concat(F.lit("Q"), (ck % 50).cast("string")),
            F.concat(F.lit("Q"), (ck % 37 + 50).cast("string")),
            F.lit("Q9999"),
        ).alias("designer"),
    )
    qid = F.concat(F.lit("Q"), (ck - 1).cast("string"))
    dim = cust.where(ck <= 87).select(
        qid.alias("qid"),
        F.array(
            F.concat(F.lit("en "), qid), F.concat(F.lit("de "), qid)
        ).alias("labels"),
    )
    out = resolve_labels(items, dim, "key", ("designer",))
    return out.select("key", F.concat_ws("|", "designer").alias("designers"))


# ---------------------------------------------------------------------------
# Formerly rows-only entries, now fully oracled: the IVF index build is
# reproducible in SQL (id-stratified seeds + quantized means), and the
# fake media decoder is sha256-based, so DuckDB recomputes it exactly.
# ---------------------------------------------------------------------------

def q_ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed approximate nearest neighbors (scale path of the
    similarity-search family; centroid quantizer + nprobe pruning).
    Oracle-checked end-to-end: id-stratified seeds + quantized Lloyd
    means make the whole index build reproducible in DuckDB.

    Production shape (VERDICT r02 #3): the index is BUILT once
    (``ivf_build`` → parquet partitioned by list_id) and the query is a
    partition-pruned scan of the 2 probed lists + exact rerank — the
    corpus is never re-assigned per query."""
    import tempfile

    from .operators.similarity import (
        ivf_build, ivf_topk_indexed, make_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    vectors = emb.where(F.col("vec_id") != 0)
    centroids = make_centroids(vectors, nlist=4, strat="id")
    # Fresh dir per invocation: a fixed shared path raced when two
    # harness processes ran the query concurrently on same-named
    # datasets (one overwrites while the other's lazy scan reads —
    # ADVICE r03).  The dir leaks until tmp cleanup; it is small.
    index = tempfile.mkdtemp(prefix="bgs_ivf_index_")
    ivf_build(vectors, centroids, index)
    return ivf_topk_indexed(spark, index, query, centroids, k=10, nprobe=2)


def q_hotness_extract(spark, sf_dir):
    """bgg_hotness XMLAPI2 extraction (S7/E1 family,
    bgg_hotness.py:43-99): hotness XML generated deterministically from
    ``part``, parsed by the REAL parse_hotness kernel (Arrow-batched);
    the oracle recomputes the planted ground truth directly."""
    from .plans.parse import parse_hotness

    part = _par(_t(spark, sf_dir, "part"), "p_partkey")
    pk = F.col("p_partkey")
    gid_s = (pk + 1).cast("string")
    rank_s = (pk % 50 + 1).cast("string")
    body = F.concat(
        F.lit('<?xml version="1.0"?><items><item id="'), gid_s,
        F.lit('" rank="'), rank_s,
        F.lit('"><name value="Game '), gid_s,
        F.lit('"/><thumbnail value="https://cf.geekdo-images.com/thumb/'),
        gid_s, F.lit('.jpg"/></item></items>'),
    )
    src = part.select("p_partkey", body.alias("body"))

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for k, b in zip(pdf["p_partkey"], pdf["body"]):
                d = parse_hotness(
                    "https://boardgamegeek.com/xmlapi2/hot?type=boardgame",
                    b,
                )
                if d["games"]:
                    g = d["games"][0]
                    rows.append((int(k), g["bgg_id"], g["rank"], g["name"],
                                 g["image_url"][0], len(d["spans"])))
            yield pd.DataFrame(
                rows,
                columns=["p_partkey", "bgg_id", "rank", "name", "thumb",
                         "n_spans"],
            )

    return src.mapInPandas(
        _kernel,
        "p_partkey long, bgg_id long, rank int, name string, "
        "thumb string, n_spans int",
    )


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: media refs → Arrow-batched feature extraction
    (deterministic fake decoder standing in for image codecs)."""
    from .functions.media import extract_features

    docs = _par(_t(spark, sf_dir, "documents"), "doc_id")
    media = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        ),
        F.lit("image").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
    )
    feats = extract_features(media, dim=8)
    return feats.select(
        "doc_id",
        "media_ref",
        "feat_dim",
        F.round(F.element_at("feature", 1), 4).alias("f0"),
    )


# ---------------------------------------------------------------------------
# Registry + oracles
# ---------------------------------------------------------------------------

QUERIES = {
    "merge_latest_wins": q_merge_latest_wins,
    "dedup_exact": q_dedup_exact,
    "topk_per_host": q_topk_per_host,
    "batchify": q_batchify,
    "retry_backoff": q_retry_backoff,
    "rescrape_window": q_rescrape_window,
    "anti_join_seen": q_anti_join_seen,
    "extract_bgg_id": q_extract_bgg_id,
    "range_validate": q_range_validate,
    "value_id_encode": q_value_id_encode,
    "interval_parse": q_interval_parse,
    "lenient_int": q_lenient_int,
    "archive_date": q_archive_date,
    "clean_text": q_clean_text,
    "pagination": q_pagination,
    "prefix_count": q_prefix_count,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "minhash_band": q_minhash_band,
    "cosine_topk": q_cosine_topk,
    "lineitem_agg": q_lineitem_agg,
    "join_agg": q_join_agg,
    "simhash": q_simhash,
    "minhash_lsh_bands": q_minhash_lsh_bands,
    "near_dup_pairs": q_near_dup_pairs,
    "embedding_near_dup": q_embedding_near_dup,
    "fingerprint": q_fingerprint,
    "language_id": q_language_id,
    "bpe_token_count": q_bpe_token_count,
    "quality_full": q_quality_full,
    "array_except_stopwords": q_array_except_stopwords,
    "commons_rewrite": q_commons_rewrite,
    "explode_collect": q_explode_collect,
    "union_distinct": q_union_distinct,
    "rankings_extract": q_rankings_extract,
    "geeklist_extract": q_geeklist_extract,
    "dbpedia_extract": q_dbpedia_extract,
    "entity_resolution": q_entity_resolution,
    "labels_resolve": q_labels_resolve,
    "ann_ivf_topk": q_ann_ivf_topk,
    "media_features": q_media_features,
    "hotness_extract": q_hotness_extract,
}

_TOKS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_SHINGLES_SQL = (
    "list_transform(generate_series(1, greatest(len({t}) - 2, 1)), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2])"
).format(t="t")
_STOPS_EN = "('the','and','of','to','a','in','is','it','you','that')"

ORACLES = {
    "merge_latest_wins": """
        SELECT user_id, event_id, ts, event_type, value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_dups
        FROM documents GROUP BY 1
    """,
    "topk_per_host": """
        SELECT event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id ASC) AS rk
        FROM events
        QUALIFY rk <= 3
    """,
    "batchify": """
        WITH numbered AS (
            SELECT event_type, event_id,
                   CAST(floor((row_number() OVER (
                       PARTITION BY event_type ORDER BY event_id) - 1) / 10)
                       AS INT) AS batch
            FROM events)
        SELECT event_type, batch, count(*) AS n,
               array_to_string(list_sort(list(event_id)), ',') AS ids_csv
        FROM numbered GROUP BY 1, 2
    """,
    "retry_backoff": """
        SELECT event_id,
               CAST(event_id % 5 AS INT) AS attempt,
               CAST(least(power(2.0, event_id % 5) * 5, 100.0) AS BIGINT)
                   AS backoff_sec,
               CAST(floor(epoch(ts)) AS BIGINT)
                   + CAST(least(power(2.0, event_id % 5) * 5, 100.0) AS BIGINT)
                   AS not_before_epoch
        FROM events WHERE event_type = 'error'
    """,
    "rescrape_window": """
        SELECT event_id, user_id, ts FROM (
            SELECT event_id, user_id, ts,
                   lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events)
        WHERE prev_ts IS NULL
           OR floor(epoch(ts)) - floor(epoch(prev_ts)) >= 600
    """,
    "anti_join_seen": """
        SELECT o_orderkey, o_custkey FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c
            WHERE c.c_acctbal < 0 AND c.c_custkey = o.o_custkey)
    """,
    "extract_bgg_id": """
        SELECT o_orderkey,
               '/boardgame/' || o_orderkey || '/name' AS path,
               CAST(regexp_extract(
                   '/boardgame/' || o_orderkey || '/name',
                   '^/(board)?game/(\\d+)', 2) AS BIGINT) AS bgg_id
        FROM orders
    """,
    "range_validate": """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity BETWEEN 5 AND 45
                    THEN l_quantity END AS qty_valid
        FROM lineitem
    """,
    "value_id_encode": """
        SELECT n_nationkey,
               n_name || ':' || n_nationkey AS value_id,
               regexp_replace(n_name || ' Rank', ' [Rr]ank$', '')
                   AS rank_stripped
        FROM nation
    """,
    "interval_parse": """
        SELECT p_partkey,
               p_size || ' - ' || (p_size + 2) || ' Spieler' AS raw,
               CAST(regexp_extract(
                   p_size || ' - ' || (p_size + 2) || ' Spieler',
                   '(\\d+)(\\s*-\\s*(\\d+))?', 1) AS INT) AS lo,
               CAST(regexp_extract(
                   p_size || ' - ' || (p_size + 2) || ' Spieler',
                   '(\\d+)(\\s*-\\s*(\\d+))?', 3) AS INT) AS hi
        FROM part
    """,
    "lenient_int": """
        SELECT c_custkey,
               '~' || format('{:,}', c_custkey * 1000) || ' votes' AS raw,
               CAST(regexp_replace(
                   '~' || format('{:,}', c_custkey * 1000) || ' votes',
                   '[^0-9]', '', 'g') AS BIGINT) AS votes
        FROM customer
    """,
    "archive_date": """
        SELECT event_id,
               'http://web.archive.org/web/' || strftime(ts, '%Y%m%d%H%M%S')
                   || '/https://boardgamegeek.com/browse/boardgame' AS url,
               strptime(regexp_extract(
                   'http://web.archive.org/web/' || strftime(ts, '%Y%m%d%H%M%S')
                       || '/https://boardgamegeek.com/browse/boardgame',
                   '/web/(\\d{14})', 1), '%Y%m%d%H%M%S') AS archived_at
        FROM events
    """,
    "clean_text": """
        SELECT doc_id,
               nullif(trim(regexp_replace(text, '\\s+', ' ', 'g')), '')
                   AS text_clean
        FROM documents
    """,
    "pagination": """
        WITH numbered AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY doc_id) AS rn,
                   count(*) OVER () AS total
            FROM documents)
        SELECT doc_id,
               CAST(floor((rn - 1) / 25) AS INT) AS page,
               total AS count,
               CASE WHEN floor((rn - 1) / 25) > 0
                    THEN CAST(floor((rn - 1) / 25) - 1 AS INT) END AS previous,
               CASE WHEN floor((rn - 1) / 25) < floor((total - 1) / 25)
                    THEN CAST(floor((rn - 1) / 25) + 1 AS INT) END AS next
        FROM numbered
    """,
    "prefix_count": """
        SELECT substring(
                   regexp_replace(lower(text), '[^a-z]', '_', 'g'), 1, 2)
                   AS prefix,
               count(*) AS n
        FROM documents GROUP BY 1
    """,
    "token_count": """
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               length(text) AS n_chars_computed
        FROM documents
    """,
    "quality_score": """
        WITH toks AS (
            SELECT doc_id, text,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents)
        SELECT doc_id,
               len(t) AS n_tokens,
               len(list_filter(t, x -> x IN
                   ('the','a','an','and','or','of','to','in','is','it')))
                   AS n_stopwords,
               round(len(list_filter(t, x -> x IN
                   ('the','a','an','and','or','of','to','in','is','it')))
                   / CAST(len(t) AS DOUBLE), 4) AS stopword_ratio,
               round((length(trim(text)) - len(t) + 1)
                   / CAST(len(t) AS DOUBLE), 4) AS mean_token_len
        FROM toks
    """,
    "minhash_band": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents)
        SELECT doc_id,
               list_min(list_transform(
                   list_transform(
                       generate_series(1, greatest(len(t) - 2, 1)),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                   s -> md5(s))) AS minhash
        FROM toks
    """,
    "cosine_topk": """
        WITH q AS (
            SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT e.vec_id,
                   round(
                       list_dot_product(e.embedding, q.qvec)
                       / (sqrt(list_dot_product(e.embedding, e.embedding))
                          * sqrt(list_dot_product(q.qvec, q.qvec))), 4)
                       AS cosine
            FROM embeddings e, q WHERE e.vec_id != 0)
        SELECT vec_id, cosine,
               CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC)
                   AS INT) AS rk
        FROM scored
        QUALIFY rk <= 10
    """,
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                   AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2))))
                   AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem GROUP BY 1, 2
    """,
    "join_agg": """
        SELECT n_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
    """,
    "simhash": f"""
        WITH toks AS (
            SELECT doc_id, list_distinct({_TOKS_SQL}) AS t FROM documents)
        SELECT doc_id,
               CAST(list_reduce(list_transform(generate_series(0, 15), b ->
                   CASE WHEN list_reduce(list_transform(t, tok ->
                       CAST((( ('0x' || substr(md5(tok),1,15))::BIGINT >> b)
                            & 1) * 2 - 1 AS INT)), (x, y) -> x + y) >= 0
                        THEN 1 << b ELSE 0 END), (x, y) -> x + y)
                   AS BIGINT) AS simhash
        FROM toks
    """,
    "minhash_lsh_bands": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
        sig AS (
            SELECT doc_id,
                   list_transform(generate_series(0, 7), p ->
                       list_min(list_transform({_SHINGLES_SQL}, s ->
                           ('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || s),
                                           1, 15))::BIGINT))) AS sg
            FROM toks)
        SELECT doc_id,
               CAST(b AS INT) AS band,
               md5(array_to_string(sg[b*4+1 : b*4+4], ':')) AS band_key
        FROM sig, (VALUES (0), (1)) bands(b)
    """,
    "near_dup_pairs": f"""
        WITH all_docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id,
                   regexp_replace(trim(text), '^\\S+\\s+', '') AS text
            FROM documents),
        toks AS (
            SELECT doc_id, {_TOKS_SQL} AS t FROM all_docs),
        sh AS (
            SELECT doc_id, {_SHINGLES_SQL} AS sh FROM toks),
        sig AS (
            SELECT doc_id, sh,
                   list_transform(generate_series(0, 7), p ->
                       list_min(list_transform(sh, s ->
                           ('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || s),
                                           1, 15))::BIGINT))) AS sg
            FROM sh),
        banded AS (
            SELECT doc_id,
                   md5(array_to_string(sg[b*4+1 : b*4+4], ':')) AS band_key
            FROM sig, (VALUES (0), (1)) bands(b)),
        cand AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM banded l JOIN banded r USING (band_key)
            WHERE l.doc_id < r.doc_id)
        SELECT a, b,
               round(len(list_intersect(sa.sh, sb.sh))
                   / CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 4)
                   AS jaccard
        FROM cand
        JOIN sh sa ON sa.doc_id = a
        JOIN sh sb ON sb.doc_id = b
        WHERE round(len(list_intersect(sa.sh, sb.sh))
                  / CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 4)
              >= 0.5
    """,
    "embedding_near_dup": """
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
            UNION ALL
            SELECT vec_id + 100000 AS vec_id,
                   list_prepend(embedding[1]::DOUBLE + 0.25,
                                (embedding::DOUBLE[])[2:]) AS emb
            FROM embeddings),
        sigs AS (
            SELECT vec_id, tt.t AS t,
                   CAST(list_sum(list_transform(generate_series(0, 7), p ->
                       CASE WHEN round(list_dot_product(emb,
                                list_transform(generate_series(0, 63), d ->
                                    ((('0x' || substr(md5(
                                          CAST(tt.t AS VARCHAR) || ':' ||
                                          CAST(p AS VARCHAR) || ':' ||
                                          CAST(d AS VARCHAR)), 1, 15))
                                        ::BIGINT % 2001) - 1000) / 1000.0)),
                              6) >= 0
                            THEN 1 << p ELSE 0 END)) AS BIGINT) AS bucket
            FROM base, (VALUES (0), (1), (2), (3)) tt(t)),
        cand AS (
            SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
            FROM sigs l JOIN sigs r USING (t, bucket)
            WHERE l.vec_id < r.vec_id)
        SELECT id_a, id_b,
               round(list_dot_product(a.emb, b.emb)
                   / (sqrt(list_dot_product(a.emb, a.emb))
                      * sqrt(list_dot_product(b.emb, b.emb))), 4) AS cosine
        FROM cand
        JOIN base a ON a.vec_id = id_a
        JOIN base b ON b.vec_id = id_b
        WHERE round(list_dot_product(a.emb, b.emb)
                  / (sqrt(list_dot_product(a.emb, a.emb))
                     * sqrt(list_dot_product(b.emb, b.emb))), 4) >= 0.9
    """,
    "fingerprint": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
        h AS (
            SELECT doc_id,
                   list_sort(list_transform({_SHINGLES_SQL}, s ->
                       ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS hs
            FROM toks)
        SELECT doc_id,
               md5(array_to_string(hs[1:4], ':')) AS fingerprint
        FROM h
    """,
    "language_id": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
        scores AS (
            SELECT doc_id,
                   len(list_filter(t, x -> x IN {_STOPS_EN})) AS s_en,
                   len(list_filter(t, x -> x IN
                       ('der','die','und','das','ist','von','mit','den',
                        'ein','nicht'))) AS s_de,
                   len(list_filter(t, x -> x IN
                       ('le','la','et','les','des','un','une','du','est',
                        'que'))) AS s_fr,
                   len(list_filter(t, x -> x IN
                       ('el','de','que','y','los','un','por','con','una',
                        'las'))) AS s_es
            FROM toks)
        SELECT doc_id,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN NULL
                    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                    ELSE 'es' END AS lang_pred,
               greatest(s_en, s_de, s_fr, s_es) AS lang_score
        FROM scores
    """,
    "bpe_token_count": f"""
        SELECT doc_id,
               len(regexp_extract_all(trim(text),
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS bpe_tokens,
               len({_TOKS_SQL}) AS ws_tokens
        FROM documents
    """,
    "quality_full": f"""
        WITH base AS (
            SELECT doc_id, trim(text) AS tx, {_TOKS_SQL} AS t
            FROM documents),
        m AS (
            SELECT doc_id,
                   len(t) AS n_tok,
                   length(tx) AS n_chars,
                   length(tx) - length(regexp_replace(tx, '[^\\w\\s]', '',
                       'g')) AS n_punct,
                   len(list_filter(t, x -> x IN {_STOPS_EN})) AS stop,
                   len(list_distinct(t)) AS n_distinct
            FROM base)
        SELECT doc_id,
               n_tok AS n_tokens,
               round(stop / CAST(n_tok AS DOUBLE), 4) AS stop_ratio,
               round(n_distinct / CAST(n_tok AS DOUBLE), 4)
                   AS distinct_ratio,
               round(
                   0.25 * least(n_tok / 20.0, 1.0)
                   + 0.25 * least(stop / CAST(n_tok AS DOUBLE) * 4, 1.0)
                   + 0.25 * (n_distinct / CAST(n_tok AS DOUBLE))
                   + 0.25 * (1 - least(n_punct
                       / CAST(greatest(n_chars, 1) AS DOUBLE) * 5, 1.0)),
                   4) AS quality
        FROM m
    """,
    "array_except_stopwords": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
        SELECT doc_id,
               array_to_string(
                   (list_sort(list_distinct(
                       list_filter(t, x -> x NOT IN {_STOPS_EN}))))[1:5],
                   ',') AS top_tokens
        FROM toks
    """,
    "commons_rewrite": """
        SELECT p_partkey,
               CASE WHEN p_partkey % 2 = 0
                    THEN 'http://dbpedia.org/resource/File:Img_'
                         || p_partkey || '.jpg'
                    ELSE 'https://example.com/img/' || p_partkey || '.png'
               END AS url,
               CASE WHEN p_partkey % 2 = 0
                    THEN 'https://commons.wikimedia.org/wiki/Special:Redirect/file/Img_'
                         || p_partkey || '.jpg'
                    ELSE 'https://example.com/img/' || p_partkey || '.png'
               END AS resolved
        FROM part
    """,
    "explode_collect": """
        SELECT n_name,
               count(*) AS n_customers,
               array_to_string(list_sort(list(c_custkey))[1:10], ',')
                   AS first_custkeys
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
    """,
    "union_distinct": """
        SELECT DISTINCT user_id FROM events
        WHERE event_type IN ('click', 'purchase')
    """,
    "hotness_extract": """
        SELECT p_partkey,
               p_partkey + 1 AS bgg_id,
               CAST(p_partkey % 50 + 1 AS INT) AS rank,
               'Game ' || (p_partkey + 1) AS name,
               'https://cf.geekdo-images.com/thumb/' || (p_partkey + 1)
                   || '.jpg' AS thumb,
               CAST(2 AS INT) AS n_spans
        FROM part
    """,
    "rankings_extract": """
        SELECT p_partkey,
               p_partkey + 1 AS bgg_id,
               CAST(p_partkey % 997 + 1 AS INT) AS rank,
               'Game ' || (p_partkey + 1) AS name,
               CAST((p_partkey % 5 + 5) || '.' ||
                    lpad(CAST(p_partkey % 100 AS VARCHAR), 2, '0')
                    AS DOUBLE) AS bayes_rating
        FROM part
    """,
    "geeklist_extract": """
        SELECT c_custkey,
               c_custkey AS bgg_id,
               CAST(c_custkey % 500 + 1 AS INT) AS rank,
               'Game ' || c_custkey AS name
        FROM customer
        WHERE c_custkey % 100 <> 0
    """,
    "dbpedia_extract": """
        SELECT c_custkey,
               c_custkey AS bgg_id,
               'DBp Game ' || c_custkey AS name,
               CAST(1985 + c_custkey % 40 AS INT) AS year,
               'Designer ' || (c_custkey % 20) AS designer,
               'Publisher ' || (c_custkey % 10) AS publisher,
               CAST(1 + c_custkey % 4 AS INT) AS min_players,
               CAST(6 + c_custkey % 10 AS INT) AS min_age
        FROM customer
    """,
    # planted components {2k, 2k+1, 10^7+k} → canonical = min = 2k
    "entity_resolution": """
        SELECT CAST(2 * c_custkey AS BIGINT) AS rec_id,
               CAST(2 * c_custkey AS BIGINT) AS canonical_id
        FROM customer
        UNION ALL
        SELECT CAST(2 * c_custkey + 1 AS BIGINT),
               CAST(2 * c_custkey AS BIGINT)
        FROM customer
        UNION ALL
        SELECT CAST(10000000 + c_custkey AS BIGINT),
               CAST(2 * c_custkey AS BIGINT)
        FROM customer
    """,
    "labels_resolve": """
        SELECT c_custkey AS key,
               'en Q' || (c_custkey % 50) || '|de Q' || (c_custkey % 50)
               || '|en Q' || (c_custkey % 37 + 50)
               || '|de Q' || (c_custkey % 37 + 50) AS designers
        FROM customer
    """,
    # Full IVF index build + probe, mirrored step-by-step: id-stratified
    # seeds → tie-broken nearest-seed assignment → quantized Lloyd mean
    # (integer sums: float sum order is engine-dependent) → reassign →
    # probe the 2 lists nearest the query → exact top-10 rerank.
    "ann_ivf_topk": """
        WITH q AS (
            SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        vecs AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
        seeds AS (
            SELECT CAST(vec_id % 4 AS BIGINT) AS list_id,
                   arg_min(embedding, vec_id) AS cvec
            FROM vecs GROUP BY 1),
        a0 AS (
            SELECT vec_id, embedding, list_id FROM (
                SELECT v.vec_id, v.embedding, s.list_id,
                       row_number() OVER (PARTITION BY v.vec_id ORDER BY
                           round(list_dot_product(v.embedding, s.cvec)
                             / (sqrt(list_dot_product(v.embedding,
                                                      v.embedding))
                                * sqrt(list_dot_product(s.cvec, s.cvec))),
                             9) DESC,
                           s.list_id DESC) AS rn
                FROM vecs v CROSS JOIN seeds s)
            WHERE rn = 1),
        dims AS (
            SELECT unnest(generate_series(1,
                       (SELECT len(qvec) FROM q))) AS pos),
        cents AS (
            SELECT list_id, list(m ORDER BY pos) AS cvec FROM (
                SELECT list_id, dims.pos AS pos,
                       sum(CAST(floor(CAST(a0.embedding[dims.pos]
                           AS DOUBLE) * 1e6)
                           AS BIGINT)) / count(*) / 1e6 AS m
                FROM a0, dims
                GROUP BY 1, 2)
            GROUP BY 1),
        a1 AS (
            SELECT vec_id, embedding, list_id FROM (
                SELECT v.vec_id, v.embedding, c.list_id,
                       row_number() OVER (PARTITION BY v.vec_id ORDER BY
                           round(list_dot_product(
                                   list_transform(v.embedding,
                                       x -> CAST(x AS DOUBLE)), c.cvec)
                             / (sqrt(list_dot_product(v.embedding,
                                                      v.embedding))
                                * sqrt(list_dot_product(c.cvec, c.cvec))),
                             9) DESC,
                           c.list_id DESC) AS rn
                FROM vecs v CROSS JOIN cents c)
            WHERE rn = 1),
        qlists AS (
            SELECT list_id FROM cents, q
            ORDER BY round(list_dot_product(
                         cents.cvec,
                         list_transform(q.qvec, x -> CAST(x AS DOUBLE)))
                     / (sqrt(list_dot_product(cents.cvec, cents.cvec))
                        * sqrt(list_dot_product(q.qvec, q.qvec))),
                     9) DESC, list_id ASC
            LIMIT 2),
        probe AS (SELECT a1.* FROM a1 JOIN qlists USING (list_id))
        SELECT p.vec_id,
               round(list_dot_product(p.embedding, q.qvec)
                 / (sqrt(list_dot_product(p.embedding, p.embedding))
                    * sqrt(list_dot_product(q.qvec, q.qvec))), 4)
                   AS cosine
        FROM probe p, q
        ORDER BY cosine DESC, p.vec_id ASC
        LIMIT 10
    """,
    # The fake decoder is sha256(media_ref): first uint32 (little-endian)
    # % 10000 / 10000 — reproduced digit-by-digit (DuckDB has no
    # hex-to-int builtin, so nibbles come from strpos lookup).
    "media_features": """
        WITH m AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'img://' || CAST(doc_id AS VARCHAR) AS media_ref
            FROM documents),
        h AS (SELECT doc_id, media_ref, sha256(media_ref) AS h,
                     '0123456789abcdef' AS hx FROM m)
        SELECT doc_id, media_ref, CAST(8 AS INT) AS feat_dim,
               round(((
                   (strpos(hx, substr(h,1,1))-1)*16
                   + (strpos(hx, substr(h,2,1))-1)
                   + ((strpos(hx, substr(h,3,1))-1)*16
                      + (strpos(hx, substr(h,4,1))-1)) * 256
                   + ((strpos(hx, substr(h,5,1))-1)*16
                      + (strpos(hx, substr(h,6,1))-1)) * 65536
                   + ((strpos(hx, substr(h,7,1))-1)*16
                      + (strpos(hx, substr(h,8,1))-1)) * 16777216
               ) % 10000) / 10000.0, 4) AS f0
        FROM h
    """,
}
