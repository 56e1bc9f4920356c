"""Parse stage — partition-parallel Arrow UDF over fetched pages.

One ``mapInPandas`` stage turns fetched bodies into: interleaved
text+media span sequences (BASELINE.json input_hint), typed item rows,
and discovered URLs (E4 link harvest — this closes the BSP loop).

Reference parse callbacks reproduced (behavior, not code):

- ``spiders/bgg.py:399-427``  parse (browse HTML): harvest game links +
  next-page link (priority +1, bgg.py:408-413).
- ``spiders/bgg.py:429-652``  parse_game (thing XML): name/description
  through the C7 clean chain (incl. the double-encoded entity hack,
  utils.py:78-86), value:id encoding for links (E8, bgg.py:85-105),
  range validation (C8), rank struct (E9, bgg.py:640-650); rating
  comments → RatingItems + discovered collection (+1, bgg.py:686-688)
  and user (+3, bgg.py:375) URLs.
- ``spiders/bgg.py:654-729``  parse_collection (collection XML) →
  RatingItems with composite key "{user}:{bgg_id}" (bgg.py:709-710).
- ``spiders/bgg.py:732-762``  parse_user (user XML) → one UserItem.
- ``spiders/luding.py:52-107`` / ``spiders/spielen.py:80-183``:
  single-game HTML with interval parsing (E12, spielen.py:16-27).

All parsing is stdlib (ElementTree + regex): no per-row Python crossing
the JVM boundary — one Arrow batch in, one Arrow batch out.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd

from functools import lru_cache

from ..functions.canon import canonicalize_one
from ..functions.text import clean_text_one

# Discovered URLs repeat heavily across pages of one batch (the same
# user/collection URLs appear on every thing page mentioning the user) —
# canonicalization is pure, so memoize per worker.
_canon_cached = lru_cache(maxsize=1_000_000)(canonicalize_one)
# Names/descriptions repeat across overlapping batches; the C7 chain is
# pure → memoize (bit-identical output, just cached).
clean_text_one = lru_cache(maxsize=500_000)(clean_text_one)

BGG = "https://boardgamegeek.com"

_RE_GAME_LINK = re.compile(r'<a href="/boardgame/(\d+)/[^"]*">([^<]*)</a>')
_RE_NEXT_PAGE = re.compile(r'<a title="next page" href="([^"]+)"')
_RE_H1 = re.compile(r"<h1>([^<]*)</h1>")
_RE_PLAYERS = re.compile(r"(\d+)(\s*-\s*(\d+))?")

# Deterministic "scraped_at" (the reference stamps now(), utils.py:99-103;
# replay must be reproducible, so we stamp a fixed UTC instant).
SCRAPED_AT = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)


def _validate_range(value, lower=None, upper=None):
    """utils.py:190-197."""
    if value is None:
        return None
    if (lower is None or lower <= value) and (upper is None or value <= upper):
        return value
    return None


def _int(v):
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def _float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _span(kind, offset, text=None, media_ref=None):
    return {"kind": kind, "text": text, "media_ref": media_ref,
            "offset": offset}


def batchify(ids: list[int], size: int = 10) -> list[list[int]]:
    """bgg.py:263 batching: sorted ids in chunks of `size`."""
    s = sorted(ids)
    return [s[i : i + size] for i in range(0, len(s), size)]


def _thing_url(ids: list[int]) -> str:
    from ..synth import thing_url

    return thing_url(ids)


def _collection_url(name: str) -> str:
    from ..synth import collection_url

    return collection_url(name)


def _user_url(name: str) -> str:
    from ..synth import user_url

    return user_url(name)


def parse_browse(url_canon: str, body: str) -> dict:
    """bgg.py:399-427: 0 items, requests for games + next page."""
    spans, discovered, seen_ids, order = [], [], set(), []
    for m in _RE_GAME_LINK.finditer(body):
        gid = int(m.group(1))
        spans.append(_span("text", len(spans), text=clean_text_one(m.group(2))))
        if gid not in seen_ids:
            seen_ids.add(gid)
            order.append(gid)
    for batch in batchify(order):
        discovered.append(
            {"url": _thing_url(batch), "priority": 0,
             "callback_kind": "bgg_thing"}
        )
    nxt = _RE_NEXT_PAGE.search(body)
    if nxt:
        discovered.append(
            {"url": BGG + nxt.group(1), "priority": 1,
             "callback_kind": "bgg_browse"}
        )
    return {"spans": spans, "games": [], "users": [], "ratings": [],
            "discovered": discovered}


def _link_values(item: ET.Element, link_type: str) -> list[str]:
    """E8 value:id encoding (bgg.py:85-105): 'Value:123' strings."""
    out = []
    for ln in item.findall(f"link[@type='{link_type}']"):
        value, lid = ln.get("value"), ln.get("id")
        if value:
            out.append(f"{value}:{lid}" if lid else value)
    return out


def parse_thing(url_canon: str, body: str) -> dict:
    """bgg.py:429-652 parse_game + embedded rating comments."""
    root = ET.fromstring(body)
    spans, games, ratings, discovered = [], [], [], []
    users_seen = []
    for item in root.findall("item"):
        gid = _int(item.get("id"))
        name_el = item.find("name[@type='primary']")
        name = clean_text_one(name_el.get("value")) if name_el is not None else None
        desc_el = item.find("description")
        desc = clean_text_one(desc_el.text) if desc_el is not None else None

        def attr_val(tag, cast=_int, el=item):
            e = el.find(tag)
            return cast(e.get("value")) if e is not None else None

        year = _validate_range(attr_val("yearpublished"), -4000, 2035)
        ratings_el = item.find("statistics/ratings")
        rank_el = item.find("statistics/ratings/ranks/rank[@name='boardgame']")
        image_el = item.find("image")
        video_els = item.findall("videos/video")

        avg = attr_val("average", _float, ratings_el) if ratings_el is not None else None
        game = {
            "bgg_id": gid,
            "name": name,
            "alt_name": None,
            "year": year,
            "description": desc,
            "designer": _link_values(item, "boardgamedesigner") or None,
            "artist": _link_values(item, "boardgameartist") or None,
            "publisher": _link_values(item, "boardgamepublisher") or None,
            "url": f"{BGG}/boardgame/{gid}/",
            "image_url": [image_el.text] if image_el is not None else None,
            "video_url": [v.get("link") for v in video_els] or None,
            "min_players": _validate_range(attr_val("minplayers"), 1, None),
            "max_players": _validate_range(attr_val("maxplayers"), 1, None),
            "min_players_rec": None,
            "max_players_rec": None,
            "min_players_best": None,
            "max_players_best": None,
            "min_age": _validate_range(attr_val("minage"), 0, 21),
            "max_age": None,
            "min_age_rec": None,
            "min_time": _validate_range(attr_val("playingtime"), 1, None),
            "max_time": _validate_range(attr_val("playingtime"), 1, None),
            "category": _link_values(item, "boardgamecategory") or None,
            "mechanic": _link_values(item, "boardgamemechanic") or None,
            "cooperative": None,
            "compilation": None,
            "compilation_of": None,
            "family": _link_values(item, "boardgamefamily") or None,
            "expansion": _link_values(item, "boardgameexpansion") or None,
            "implementation": None,
            "integration": None,
            "rank": _int(rank_el.get("value")) if rank_el is not None else None,
            "add_rank": None,
            "num_votes": _validate_range(
                attr_val("usersrated", el=ratings_el) if ratings_el is not None else None,
                0, None),
            "avg_rating": _validate_range(avg, 1, 10),
            "stddev_rating": _validate_range(
                attr_val("stddev", _float, ratings_el) if ratings_el is not None else None,
                0, None),
            "bayes_rating": _validate_range(
                attr_val("bayesaverage", _float, ratings_el) if ratings_el is not None else None,
                0, 10),
            "complexity": _validate_range(
                attr_val("averageweight", _float, ratings_el) if ratings_el is not None else None,
                1, 5),
            "language_dependency": None,
            "scraped_at": SCRAPED_AT,
        }
        games.append(game)

        # Interleaved spans: text, text, image, video per item (input_hint).
        spans.append(_span("text", len(spans), text=name))
        if desc:
            spans.append(_span("text", len(spans), text=desc))
        if image_el is not None:
            spans.append(_span("image", len(spans), media_ref=image_el.text))
        for v in video_els:
            spans.append(_span("video", len(spans), media_ref=v.get("link")))

        for c in item.findall("comment"):
            user = (c.get("username") or "").lower()  # items.py:554-556
            if not user:
                continue
            ratings.append(
                {
                    "item_id": f"{user}:{gid}",  # bgg.py:709-710
                    "bgg_id": gid,
                    "bgg_user_name": user,
                    "bgg_user_rating": _validate_range(
                        _float(c.get("rating")), 1, 10),
                    "bgg_user_owned": None,
                    "bgg_user_wishlist": None,
                    "bgg_user_play_count": None,
                    "comment": clean_text_one(c.get("value")),
                    "scraped_at": SCRAPED_AT,
                }
            )
            if user not in users_seen:
                users_seen.append(user)
    for user in users_seen:
        discovered.append(
            {"url": _collection_url(user), "priority": 1,
             "callback_kind": "bgg_collection"}  # bgg.py:686-688
        )
        discovered.append(
            {"url": _user_url(user), "priority": 3,
             "callback_kind": "bgg_user"}  # bgg.py:375
        )
    return {"spans": spans, "games": games, "users": [], "ratings": ratings,
            "discovered": discovered}


def parse_user(url_canon: str, body: str) -> dict:
    """bgg.py:732-762: exactly 1 item, 0 requests."""
    root = ET.fromstring(body)

    def attr_val(tag):
        e = root.find(tag)
        return e.get("value") if e is not None else None

    name = (root.get("name") or "").lower()
    user = {
        "item_id": _int(root.get("id")),
        "bgg_user_name": name,
        "first_name": clean_text_one(attr_val("firstname")),
        "last_name": clean_text_one(attr_val("lastname")),
        "registered": _int(attr_val("yearregistered")),
        "last_login": None,
        "country": clean_text_one(attr_val("country")),
        "external_link": None,
        "image_url": None,
        "scraped_at": SCRAPED_AT,
    }
    spans = [_span("text", 0, text=" ".join(
        filter(None, [user["first_name"], user["last_name"]])) or name)]
    return {"spans": spans, "games": [], "users": [user], "ratings": [],
            "discovered": []}


def parse_collection(url_canon: str, body: str) -> dict:
    """bgg.py:654-729: RatingItems keyed '{user}:{bgg_id}'."""
    root = ET.fromstring(body)
    m = re.search(r"username=([^&]+)", url_canon)
    user = (m.group(1) if m else "").lower()
    spans, ratings = [], []
    for item in root.findall("item"):
        gid = _int(item.get("objectid"))
        rating_el = item.find("stats/rating")
        status_el = item.find("status")
        plays_el = item.find("numplays")
        ratings.append(
            {
                "item_id": f"{user}:{gid}",
                "bgg_id": gid,
                "bgg_user_name": user,
                "bgg_user_rating": _validate_range(
                    _float(rating_el.get("value")) if rating_el is not None else None,
                    1, 10),
                "bgg_user_owned": (
                    status_el.get("own") == "1" if status_el is not None else None),
                "bgg_user_wishlist": None,
                "bgg_user_play_count": _int(plays_el.text) if plays_el is not None else None,
                "comment": None,
                "scraped_at": SCRAPED_AT,
            }
        )
        spans.append(_span("text", len(spans), text=f"{user} rates {gid}"))
    return {"spans": spans, "games": [], "users": [], "ratings": ratings,
            "discovered": []}


def _parse_simple_game(url_canon: str, body: str, source: str) -> dict:
    """luding.py:52-107 / spielen.py:80-183: 1 item, 0 requests."""
    h1 = _RE_H1.search(body)
    name = clean_text_one(h1.group(1)) if h1 else None
    pm = _RE_PLAYERS.search(body[h1.end():] if h1 else body)
    lo = _int(pm.group(1)) if pm else None
    hi = _int(pm.group(3)) if pm and pm.group(3) else lo
    game = {k: None for k in (
        "bgg_id", "alt_name", "year", "description", "designer", "artist",
        "publisher", "image_url", "video_url", "min_players_rec",
        "max_players_rec", "min_players_best", "max_players_best", "min_age",
        "max_age", "min_age_rec", "min_time", "max_time", "category",
        "mechanic", "cooperative", "compilation", "compilation_of", "family",
        "expansion", "implementation", "integration", "rank", "add_rank",
        "num_votes", "avg_rating", "stddev_rating", "bayes_rating",
        "complexity", "language_dependency")}
    game.update(
        {
            "name": name,
            "url": url_canon,
            "min_players": _validate_range(lo, 1, None),
            "max_players": _validate_range(hi, 1, None),
            "scraped_at": SCRAPED_AT,
        }
    )
    spans = [_span("text", 0, text=name)]
    if pm:
        spans.append(_span("text", 1, text=clean_text_one(pm.group(0))))
    return {"spans": spans, "games": [game], "users": [], "ratings": [],
            "discovered": []}


PARSERS = {
    "bgg_browse": parse_browse,
    "bgg_thing": parse_thing,
    "bgg_user": parse_user,
    "bgg_collection": parse_collection,
    "luding_game": lambda u, b: _parse_simple_game(u, b, "luding"),
    "spielen_game": lambda u, b: _parse_simple_game(u, b, "spielen"),
}


def parse_page(url_canon: str, callback_kind: str, body: str) -> dict:
    parser = PARSERS.get(callback_kind)
    if parser is None or body is None:
        return {"spans": [], "games": [], "users": [], "ratings": [],
                "discovered": []}
    try:
        return parser(url_canon, body)
    except ET.ParseError:
        # DROPMALFORMED semantics (merge.py:170): bad page → nothing.
        return {"spans": [], "games": [], "users": [], "ratings": [],
                "discovered": []}


def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: FETCHED batches → PARSED batches."""
    for pdf in batches:
        rows = []
        for url_canon, kind, body in zip(
            pdf["url_canon"], pdf["callback_kind"], pdf["body"]
        ):
            parsed = parse_page(url_canon, kind, body)
            # Canonicalize discoveries batch-locally (C1-C3) so the
            # downstream dedup joins on canonical keys.
            disc = []
            for d in parsed["discovered"]:
                canon = _canon_cached(d["url"])
                if canon:
                    disc.append({"url": canon, "priority": d["priority"],
                                 "callback_kind": d["callback_kind"]})
            rows.append(
                {
                    "url_canon": url_canon,
                    "doc_id": url_canon,
                    "spans": parsed["spans"],
                    "games": parsed["games"],
                    "users": parsed["users"],
                    "ratings": parsed["ratings"],
                    "discovered": disc,
                }
            )
        yield pd.DataFrame(
            rows,
            columns=["url_canon", "doc_id", "spans", "games", "users",
                     "ratings", "discovered"],
        )


def run_parse(fetched_ok, target_partitions: int | None = None):
    """fetched (status==200) → PARSED DataFrame (one Arrow stage).

    ``target_partitions``: AQE sizes the upstream join output by *bytes*
    (~64MB partitions), which throttles this CPU-bound stage; repartition
    to ~2x cores so every core parses.  The body shuffle it costs is far
    cheaper than the serial parse it prevents.
    """
    from ..schemas import PARSED

    src = fetched_ok.select("url_canon", "callback_kind", "body")
    if target_partitions is None:
        target_partitions = (
            fetched_ok.sparkSession.sparkContext.defaultParallelism * 2
        )
    if target_partitions:
        src = src.repartition(target_partitions)
    return src.mapInPandas(parse_batches, PARSED)
