"""robots.txt gate (F5)."""

from pyspark.sql import functions as F

from board_game_scraper_spark.plans.robots import (
    filter_allowed,
    parse_robots_body,
    robots_table,
)

ROBOTS_BODY = """
# comment
User-agent: Googlebot
Disallow: /google-only/

User-agent: *
Disallow: /xmlapi2/
Disallow: /private
Allow: /

User-agent: other
Disallow: /
"""


def test_parse_robots_body():
    assert parse_robots_body(ROBOTS_BODY) == ["/xmlapi2/", "/private"]
    assert parse_robots_body(None) == []
    assert parse_robots_body("") == []
    assert parse_robots_body("User-agent: *\nDisallow:") == []  # allow-all


def test_filter_allowed(spark):
    robots = spark.createDataFrame(
        [("a.example", ["/blocked/"], 1),
         ("www.wikidata.org", ["/"], 1)],
        "host string, disallow_prefixes array<string>, fetched_round int",
    )
    cands = spark.createDataFrame(
        [("https://a.example/ok/1", "a.example"),
         ("https://a.example/blocked/2", "a.example"),
         ("https://b.example/anything", "b.example"),      # no robots row
         ("https://www.wikidata.org/wiki/Q1", "www.wikidata.org")],  # opt-out
        "url_canon string, host string",
    )
    got = {r["url_canon"] for r in filter_allowed(cands, robots).collect()}
    assert got == {
        "https://a.example/ok/1",
        "https://b.example/anything",
        "https://www.wikidata.org/wiki/Q1",
    }


def test_robots_table_from_fetch(spark):
    fetched = spark.createDataFrame(
        [("a.example", ROBOTS_BODY)], "host string, body string"
    )
    tbl = robots_table(fetched, 3).collect()
    assert tbl[0]["disallow_prefixes"] == ["/xmlapi2/", "/private"]
    assert tbl[0]["fetched_round"] == 3
