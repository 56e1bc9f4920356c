"""Latest-wins merge semantics vs a row-at-a-time Python oracle.

Oracle reproduces merge.py:62-67 (_compare): keep second iff
second._latest >= first._latest (ties → later-encountered wins),
rows with null keys dropped (merge.py:185-196).
"""

from datetime import datetime

from pyspark.sql import functions as F

from board_game_scraper_spark.operators.merge import (
    merge_latest_wins,
    remove_empty,
)

ROWS = [
    # (bgg_id, name, scraped_at, file_seq)
    (1, "A v1", datetime(2024, 1, 1), 1),
    (1, "A v2", datetime(2024, 1, 2), 2),   # later ts wins
    (2, "B v1", datetime(2024, 1, 5), 1),
    (2, "B v2", datetime(2024, 1, 5), 2),   # tie → later file wins
    (3, "C v1", datetime(2024, 1, 1), 3),
    (None, "dropped", datetime(2024, 1, 9), 4),  # null key → dropped
    (4, None, datetime(2024, 1, 1), 1),
    (4, "D v2", None, 2),                    # null latest loses to any
]


def python_oracle(rows):
    out = {}
    for bgg_id, name, ts, seq in rows:
        if bgg_id is None:
            continue
        key = bgg_id
        latest = (str(ts), seq) if ts is not None else None
        prev = out.get(key)
        if prev is None:
            out[key] = (latest, name, ts, seq)
            continue
        prev_latest = prev[0]
        # _compare: second wins iff first has no latest, or second has
        # latest >= first's (merge.py:62-67).
        if not prev_latest or (latest and latest >= prev_latest):
            out[key] = (latest, name, ts, seq)
    return {k: v[1] for k, v in out.items()}


def test_merge_latest_wins_matches_oracle(spark):
    df = spark.createDataFrame(
        ROWS, "bgg_id int, name string, scraped_at timestamp, file_seq int"
    )
    got = merge_latest_wins(
        df,
        keys=["bgg_id"],
        latest=["scraped_at"],
        latest_types=["date"],
        file_seq_col="file_seq",
    )
    got_map = {r["bgg_id"]: r["name"] for r in got.collect()}
    assert got_map == python_oracle(ROWS)


def test_merge_latest_required_drops_null_latest(spark):
    df = spark.createDataFrame(
        ROWS, "bgg_id int, name string, scraped_at timestamp, file_seq int"
    )
    got = merge_latest_wins(
        df,
        keys=["bgg_id"],
        latest=["scraped_at"],
        latest_required=True,
        file_seq_col="file_seq",
    )
    ids = {r["bgg_id"] for r in got.collect()}
    assert 4 in ids  # the non-null-latest row survives
    got_4 = [r for r in got.collect() if r["bgg_id"] == 4][0]
    assert got_4["name"] is None  # 'D v2' had null scraped_at → dropped


def test_merge_latest_min_filter(spark):
    df = spark.createDataFrame(
        ROWS, "bgg_id int, name string, scraped_at timestamp, file_seq int"
    )
    got = merge_latest_wins(
        df,
        keys=["bgg_id"],
        latest=["scraped_at"],
        latest_min=datetime(2024, 1, 3),
        file_seq_col="file_seq",
    )
    ids = {r["bgg_id"] for r in got.collect()}
    assert ids == {2}


def test_merge_projection_sorted_names(spark):
    df = spark.createDataFrame(
        ROWS, "bgg_id int, name string, scraped_at timestamp, file_seq int"
    )
    got = merge_latest_wins(df, keys=["bgg_id"], latest=["scraped_at"])
    assert got.columns == sorted(got.columns)  # merge.py:239 sorted names
    got2 = merge_latest_wins(
        df, keys=["bgg_id"], latest=["scraped_at"],
        fieldnames=["name", "bgg_id"],
    )
    assert got2.columns == ["name", "bgg_id"]
    got3 = merge_latest_wins(
        df, keys=["bgg_id"], latest=["scraped_at"],
        fieldnames_exclude=["file_seq"],
    )
    assert "file_seq" not in got3.columns


def test_remove_empty(spark):
    df = spark.createDataFrame(
        [("", ["a"], True), ("x", [], False), (None, None, True)],
        "s string, arr array<string>, b boolean",
    )
    got = remove_empty(df).collect()
    assert got[0]["s"] is None and got[0]["arr"] == ["a"]
    assert got[1]["s"] == "x" and got[1]["arr"] is None
    # booleans untouched unless remove_false
    got_rf = remove_empty(df, remove_false=True).collect()
    assert got_rf[1]["b"] is None
