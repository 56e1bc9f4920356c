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


MIN_VOTES = 20  # bgg.py:147


def _median_grouped(values: list[float], interval: float = 1.0):
    """statistics.median_grouped — exact formula L + ((n/2 - cf)/f)*h
    (E7, bgg.py:73-83; not equal to percentile_approx, so computed here
    bit-for-bit)."""
    import statistics

    if not values:
        return None
    return float(statistics.median_grouped(values, interval))


def _expand_votes(pairs: list[tuple[float, int]]) -> list[float]:
    """(value, numvotes) → value repeated numvotes times
    (bgg.py:73-79 _parse_votes)."""
    out: list[float] = []
    for value, votes in pairs:
        out.extend([value] * votes)
    return out


def _filter_votes(votes_best: int, votes_rec: int, votes_not: int,
                  best: bool, min_votes: int = MIN_VOTES) -> bool:
    """bgg.py:323-334: drop rows with < min_votes/2 total; majority rule
    (Recommended counts as 'true' unless scoring Best)."""
    if votes_best + votes_rec + votes_not < min_votes / 2:
        return False
    votes_true, votes_false = votes_best, votes_not
    if best:
        votes_false += votes_rec
    else:
        votes_true += votes_rec
    return votes_true > votes_false


def _parse_numplayers(raw: str | None) -> int | None:
    """'4+' → 5 (bgg.py:52-61)."""
    if not raw:
        return None
    n = _int(raw)
    if n:
        return n
    if raw.endswith("+"):
        n = _int(raw[:-1]) or -1
        return n + 1
    return None


def _fold_player_poll(item: ET.Element, min_players, max_players):
    """E6 (bgg.py:336-357 _player_count_votes): (min_rec, max_rec,
    min_best, max_best) from the suggested_numplayers poll."""
    poll = item.find("poll[@name='suggested_numplayers']")
    if poll is None or (_int(poll.get("totalvotes")) or 0) < MIN_VOTES:
        return min_players, max_players, min_players, max_players
    votes = []
    for res in poll.findall("results"):
        players = _parse_numplayers(res.get("numplayers"))
        if not players:
            continue

        def nv(val):
            e = res.find(f"result[@value='{val}']")
            return (_int(e.get("numvotes")) or 0) if e is not None else 0

        votes.append((players, nv("Best"), nv("Recommended"),
                      nv("Not Recommended")))
    votes.sort(key=lambda x: x[0])
    rec = [v[0] for v in votes if _filter_votes(v[1], v[2], v[3], False)]
    best = [v[0] for v in votes if _filter_votes(v[1], v[2], v[3], True)]
    return (
        min(rec, default=min_players),
        max(rec, default=max_players),
        min(best, default=min_players),
        max(best, default=max_players),
    )


def _poll_stat(item: ET.Element, name: str, attr: str = "value",
               enum: bool = False):
    """E7 (bgg.py:359-373 _poll): median_grouped over expanded votes;
    None when the poll has < MIN_VOTES total."""
    poll = item.find(f"poll[@name='{name}']")
    if poll is None or (_int(poll.get("totalvotes")) or 0) < MIN_VOTES:
        return None
    pairs = []
    for i, res in enumerate(poll.findall("results/result"), start=1):
        value = i if enum else _int(res.get(attr))
        votes = _int(res.get("numvotes")) or 0
        if value is not None:
            pairs.append((value, votes))
    expanded = _expand_votes(pairs)
    return _median_grouped(expanded) if expanded else None


def _remove_rank_suffix(value: str | None) -> str | None:
    """bgg.py:92-98 _remove_rank."""
    if value and value.lower().endswith(" rank"):
        return value[:-5]
    return value


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
        min_p = _validate_range(attr_val("minplayers"), 1, None)
        max_p = _validate_range(attr_val("maxplayers"), 1, None)
        min_rec, max_rec, min_best, max_best = _fold_player_poll(
            item, min_p, max_p
        )
        add_rank = [
            {
                "game_type": r.get("name"),
                "game_type_id": _int(r.get("id")),
                "name": _remove_rank_suffix(r.get("friendlyname")),
                "rank": _int(r.get("value")),
                "bayes_rating": _float(r.get("bayesaverage")),
            }
            for r in item.findall(
                "statistics/ratings/ranks/rank[@type='family']"
            )
        ]
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
            "min_players": min_p,
            "max_players": max_p,
            "min_players_rec": min_rec,
            "max_players_rec": max_rec,
            "min_players_best": min_best,
            "max_players_best": max_best,
            "min_age": _validate_range(attr_val("minage"), 0, 21),
            "max_age": None,
            "min_age_rec": _validate_range(
                _poll_stat(item, "suggested_playerage"), 0, 21),
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
            "add_rank": add_rank or None,
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
            "language_dependency": _validate_range(
                _poll_stat(item, "language_dependence", attr="level",
                           enum=True),
                1, 5),
            "published_at": None,
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


def _interval(text: str | None) -> tuple[int | None, int | None]:
    """spielen.py:16-27 _parse_interval: '2 - 4' → (2, 4); '3' → (3, 3)."""
    if not text:
        return None, None
    m = _RE_PLAYERS.search(text)
    if not m:
        return None, None
    lo = _int(m.group(1))
    hi = _int(m.group(3)) if m.group(3) else lo
    return lo, hi


def _simple_game_row(url_canon: str, **kw) -> dict:
    game = {k: None for k in (
        "bgg_id", "alt_name", "year", "description", "designer", "artist",
        "publisher", "image_url", "video_url", "min_players_rec",
        "max_players_rec", "min_players_best", "max_players_best", "min_age",
        "max_age", "min_age_rec", "min_time", "max_time", "category",
        "mechanic", "cooperative", "compilation", "compilation_of", "family",
        "expansion", "implementation", "integration", "rank", "add_rank",
        "num_votes", "avg_rating", "stddev_rating", "bayes_rating",
        "complexity", "language_dependency", "published_at",
        "min_players", "max_players", "name")}
    game.update({"url": url_canon, "scraped_at": SCRAPED_AT})
    game.update(kw)
    return game


def parse_luding(url_canon: str, body: str) -> dict:
    """luding.py:52-107 parse_game: labeled-table-row extraction over the
    stdlib DOM engine (E2) — name, year, description, designer/artist/
    publisher links, players interval, age, image."""
    from ..functions.html import parse_html

    doc = parse_html(body)
    h1 = doc.select_first("h1")
    name = clean_text_one(h1.text()) if h1 else None

    def row_cell(label: str):
        for tr in doc.select("table tr"):
            tds = tr.child_elements("td")
            if len(tds) >= 2 and tds[0].text() == label:
                return tds[1]
        return None

    def cell_text(label: str):
        cell = row_cell(label)
        return clean_text_one(cell.text()) if cell is not None else None

    def cell_links(label: str):
        cell = row_cell(label)
        if cell is None:
            return None
        vals = [clean_text_one(a.text()) for a in cell.select("a")]
        return [v for v in vals if v] or None

    players = cell_text("No. of players:")
    lo, hi = _interval(players)
    age = _lenient_int(cell_text("Age:"))
    images = [img.get("src") for img in doc.select("table img")
              if img.get("src")]
    images = [_urljoin(url_canon, i) for i in images]
    game = _simple_game_row(
        url_canon,
        name=name,
        year=_lenient_int(cell_text("Year:")),
        description=cell_text("Box text:"),
        designer=cell_links("Designer:"),
        artist=cell_links("Art:"),
        publisher=cell_links("Publisher name:"),
        image_url=images or None,
        min_players=_validate_range(lo, 1, None),
        max_players=_validate_range(hi, 1, None),
        min_age=_validate_range(age, 0, 21),
    )
    spans = [_span("text", 0, text=name)]
    if game["description"]:
        spans.append(_span("text", len(spans), text=game["description"]))
    for i in images:
        spans.append(_span("image", len(spans), media_ref=i))
    return {"spans": spans, "games": [game], "users": [], "ratings": [],
            "discovered": []}


def parse_spielen(url_canon: str, body: str) -> dict:
    """spielen.py:80-183 parse_game: fullBox labeled-div pairs, rating
    spans, complexity-dot counting — on the stdlib DOM engine (E2)."""
    from ..functions.html import parse_html

    doc = parse_html(body)
    box = doc.select_first("div.fullBox") or doc
    h2 = box.select_first("h2")
    name = clean_text_one(h2.text()) if h2 else None
    # description = text siblings after the h2
    # (.//h2/following-sibling::text())
    desc = None
    if h2 is not None and h2.parent is not None:
        sib = h2.parent.children
        texts = [c for c in sib[sib.index(h2) + 1:] if isinstance(c, str)]
        desc = clean_text_one(" ".join(texts)) or None

    def labeled_div(*labels):
        """div[b = "Label"]/following-sibling::div."""
        for d in box.select("div"):
            bs = d.child_elements("b")
            if bs and bs[0].text() in labels:
                parent = d.parent
                kids = parent.child_elements() if parent else []
                idx = kids.index(d)
                if idx + 1 < len(kids) and kids[idx + 1].tag == "div":
                    return kids[idx + 1]
        return None

    def labeled_text(*labels):
        cell = labeled_div(*labels)
        return clean_text_one(cell.text()) if cell is not None else None

    lo_p, hi_p = _interval(labeled_text("Spieler:"))
    lo_t, hi_t = _interval(labeled_text("Dauer:"))
    age = _lenient_int(labeled_text("Alter:"))
    pub_div = labeled_div("Verlag:", "Verlage:")
    publishers = (
        [clean_text_one(a.text()) for a in pub_div.select("a")]
        if pub_div is not None else None
    )
    images = [i for i in (
        [img.get("data-src") for img in box.select("img")][:1]
        + [img.get("data-large-src")
           for img in box.select("div.screenshotlist img")]
    ) if i]
    images = [_urljoin(url_canon, i) for i in images]
    videos = [
        _urljoin(url_canon, f.get("src") or f.get("data-src"))
        for f in box.select("iframe")
        if f.get("src") or f.get("data-src")
    ]
    votes_el = box.select_first("span.votes")
    avg_el = box.select_first("span.average")
    # complexity = dots before the red marker + 1 (spielen.py:171-177)
    complexity = None
    comp_div = None
    for d in box.select("div"):
        if d.text() != "Komplexität:" or d.parent is None:
            continue
        kids = d.parent.child_elements()
        idx = kids.index(d)
        nxt = kids[idx + 1] if idx + 1 < len(kids) else None
        if nxt is not None and nxt.tag == "div" and nxt.select("span"):
            comp_div = nxt
            break
    if comp_div is not None:
        spans_el = comp_div.child_elements("span")
        n_before = 0
        for s in spans_el:
            if "red" in s.classes:
                break
            n_before += 1
        complexity = float(n_before + 1)

    game = _simple_game_row(
        url_canon,
        name=name,
        description=desc,
        year=_lenient_int(labeled_text("Erscheinungsjahr:")),
        designer=[labeled_text("Autor:", "Autoren:")]
        if labeled_text("Autor:", "Autoren:") else None,
        artist=[labeled_text("Illustrator:", "Illustratoren:")]
        if labeled_text("Illustrator:", "Illustratoren:") else None,
        publisher=[p for p in publishers or [] if p] or None,
        family=[labeled_text("Spielfamilie:", "Spielfamilien:")]
        if labeled_text("Spielfamilie:", "Spielfamilien:") else None,
        image_url=images or None,
        video_url=videos or None,
        min_players=_validate_range(lo_p, 1, None),
        max_players=_validate_range(hi_p, 1, None),
        min_time=_validate_range(lo_t, 1, None),
        max_time=_validate_range(hi_t, 1, None),
        min_age=_validate_range(age, 0, 21),
        num_votes=_lenient_int(votes_el.text()) if votes_el else None,
        avg_rating=_float(avg_el.text()) if avg_el else None,
        complexity=complexity,
    )
    spans = [_span("text", 0, text=name)]
    if desc:
        spans.append(_span("text", len(spans), text=desc))
    for i in images:
        spans.append(_span("image", len(spans), media_ref=i))
    for v in videos:
        spans.append(_span("video", len(spans), media_ref=v))
    return {"spans": spans, "games": [game], "users": [], "ratings": [],
            "discovered": []}


def jmes_path(data, path: str):
    """Minimal JMESPath subset used by the reference loaders (E3,
    wikidata.py:196-256): dotted keys, '[]' list projection, '*'
    wildcard over dict values.  Returns a flat list of matches."""
    nodes = [data]
    for part in path.split("."):
        proj = part.endswith("[]")
        key = part[:-2] if proj else part
        nxt = []
        for node in nodes:
            if key == "*":
                values = list(node.values()) if isinstance(node, dict) else []
            elif isinstance(node, dict) and key in node:
                values = [node[key]]
            else:
                values = []
            for v in values:
                if proj or (key == "*" and isinstance(v, list)):
                    if isinstance(v, list):
                        nxt.extend(v)
                else:
                    nxt.append(v)
        nodes = nxt
    return nodes


def _first(values):
    for v in values:
        if v is not None and v != "":
            return v
    return None


def parse_wikidata_entity(url_canon: str, body: str) -> dict:
    """E3 (wikidata.py:196-256): EntityData JSON → GameItem via the
    reference's jmespath list, TakeFirst on name."""
    import json as _json

    doc = _json.loads(body)
    entities = doc.get("entities", {})
    spans, games = [], []
    for qid, ent in entities.items():
        name = _first(
            jmes_path(ent, "labels.en.value")
            + jmes_path(ent, "aliases.en[].value")
            + jmes_path(ent, "labels.*.value")
            + jmes_path(ent, "aliases.*[].value")
        )
        name = clean_text_one(name)
        alt = [clean_text_one(v) for v in (
            jmes_path(ent, "labels.*.value")
            + jmes_path(ent, "aliases.*[].value"))]
        alt = [a for i, a in enumerate(alt) if a and a not in alt[:i]]
        designer = (
            jmes_path(ent, "claims.P178[].mainsnak.datavalue.value.id")
            + jmes_path(ent, "claims.P50[].mainsnak.datavalue.value.id")
            + jmes_path(ent, "claims.P170[].mainsnak.datavalue.value.id")
            + jmes_path(ent, "claims.P287[].mainsnak.datavalue.value.id")
        )
        bgg_id = _int(_first(
            jmes_path(ent, "claims.P2339[].mainsnak.datavalue.value")))

        def amount(pid):
            raw = _first(jmes_path(
                ent, f"claims.{pid}[].mainsnak.datavalue.value.amount"))
            return _int(raw.lstrip("+")) if raw else None

        image = _first(jmes_path(ent, "claims.P18[].mainsnak.datavalue.value"))
        game = {k: None for k in (
            "alt_name", "year", "description", "artist", "publisher",
            "video_url", "min_players_rec", "max_players_rec",
            "min_players_best", "max_players_best", "min_age", "max_age",
            "min_age_rec", "min_time", "max_time", "category", "mechanic",
            "cooperative", "compilation", "compilation_of", "family",
            "expansion", "implementation", "integration", "rank",
            "add_rank", "num_votes", "avg_rating", "stddev_rating",
            "bayes_rating", "complexity", "language_dependency",
            "published_at")}
        game.update(
            {
                "bgg_id": bgg_id,
                "name": name,
                "alt_name": alt or None,
                "designer": designer or None,
                "url": url_canon,
                "image_url": [image] if image else None,
                "min_players": _validate_range(amount("P1872"), 1, None),
                "max_players": _validate_range(amount("P1873"), 1, None),
                "scraped_at": SCRAPED_AT,
            }
        )
        games.append(game)
        spans.append(_span("text", len(spans), text=name))
        if image:
            spans.append(_span("image", len(spans), media_ref=image))
    return {"spans": spans, "games": games, "users": [], "ratings": [],
            "discovered": []}


_SPARQL_NS = "{http://www.w3.org/2005/sparql-results#}"


def parse_sparql(url_canon: str, body: str) -> dict:
    """E5/S8 (wikidata.py:138-176): namespaced bindings → discovered
    EntityData URLs (priority +1, wikidata.py:108)."""
    root = ET.fromstring(body)
    spans, discovered = [], []
    for uri_el in root.iter(f"{_SPARQL_NS}uri"):
        uri = uri_el.text or ""
        m = re.search(r"/entity/Q(\d+)", uri)
        if not m:
            continue
        qid = int(m.group(1))
        from ..synth import wikidata_entity_url

        discovered.append(
            {"url": wikidata_entity_url(qid), "priority": 1,
             "callback_kind": "wikidata_entity"}
        )
        spans.append(_span("text", len(spans), text=f"Q{qid}"))
    return {"spans": spans, "games": [], "users": [], "ratings": [],
            "discovered": discovered}


def parse_rank_history(url_canon: str, body: str) -> dict:
    """E16 (bgg_json_rankings.py:115-156): {"data": [[ms_epoch, rank]]} →
    one GameItem per point with published_at = the epoch."""
    import json as _json

    doc = _json.loads(body)
    m = re.search(r"objectid=(\d+)", url_canon)
    gid = int(m.group(1)) if m else None
    spans, games = [], []
    for ms, rank in doc.get("data", []):
        ts = datetime.utcfromtimestamp(ms / 1000.0)
        game = {k: None for k in (
            "alt_name", "year", "description", "designer", "artist",
            "publisher", "image_url", "video_url", "min_players",
            "max_players", "min_players_rec", "max_players_rec",
            "min_players_best", "max_players_best", "min_age", "max_age",
            "min_age_rec", "min_time", "max_time", "category", "mechanic",
            "cooperative", "compilation", "compilation_of", "family",
            "expansion", "implementation", "integration", "add_rank",
            "num_votes", "avg_rating", "stddev_rating", "bayes_rating",
            "complexity", "language_dependency")}
        game.update(
            {
                "bgg_id": gid,
                "name": f"game-{gid}",
                "url": url_canon,
                "rank": _int(rank),
                "published_at": ts,
                "scraped_at": SCRAPED_AT,
            }
        )
        games.append(game)
        spans.append(
            _span("text", len(spans), text=f"rank {rank} at {ts.date()}")
        )
    return {"spans": spans, "games": games, "users": [], "ratings": [],
            "discovered": []}


def parse_hotness(url_canon: str, body: str) -> dict:
    """bgg_hotness.py:76-99: 50 ranked items with thumbnails."""
    root = ET.fromstring(body)
    spans, games = [], []
    for item in root.findall("item"):
        gid = _int(item.get("id"))
        name_el = item.find("name")
        thumb_el = item.find("thumbnail")
        name = clean_text_one(name_el.get("value")) if name_el is not None else None
        thumb = thumb_el.get("value") if thumb_el is not None else None
        game = {k: None for k in (
            "alt_name", "year", "description", "designer", "artist",
            "publisher", "video_url", "min_players", "max_players",
            "min_players_rec", "max_players_rec", "min_players_best",
            "max_players_best", "min_age", "max_age", "min_age_rec",
            "min_time", "max_time", "category", "mechanic", "cooperative",
            "compilation", "compilation_of", "family", "expansion",
            "implementation", "integration", "add_rank", "num_votes",
            "avg_rating", "stddev_rating", "bayes_rating", "complexity",
            "language_dependency", "published_at")}
        game.update(
            {
                "bgg_id": gid,
                "name": name,
                "url": url_canon,
                "rank": _int(item.get("rank")),
                "image_url": [thumb] if thumb else None,
                "scraped_at": SCRAPED_AT,
            }
        )
        games.append(game)
        spans.append(_span("text", len(spans), text=name))
        if thumb:
            spans.append(_span("image", len(spans), media_ref=thumb))
    return {"spans": spans, "games": games, "users": [], "ratings": [],
            "discovered": []}


_GAME_FIELDS = (
    "bgg_id", "name", "alt_name", "year", "description", "designer",
    "artist", "publisher", "url", "image_url", "video_url", "min_players",
    "max_players", "min_players_rec", "max_players_rec", "min_players_best",
    "max_players_best", "min_age", "max_age", "min_age_rec", "min_time",
    "max_time", "category", "mechanic", "cooperative", "compilation",
    "compilation_of", "family", "expansion", "implementation", "integration",
    "rank", "add_rank", "num_votes", "avg_rating", "stddev_rating",
    "bayes_rating", "complexity", "language_dependency", "published_at",
    "scraped_at",
)


def _game_row(**kw) -> dict:
    row = dict.fromkeys(_GAME_FIELDS)
    row["scraped_at"] = SCRAPED_AT
    row.update(kw)
    return row


# bgg_rankings.py:20-24 regexes (behavioral port)
_RE_DIGITS = re.compile(r"^\D*(\d+).*$")
_RE_ANY_BGG_ID = re.compile(r"/(?:board)?game/(\d+)")
_RE_ARCHIVE_DATE = re.compile(r"web\.archive\.org/web/(\d{4,14})")
_RE_WAYBACK_TITLE_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$|^\d{8,14}$")


def _lenient_int(s: str | None):
    """_parse_int(lenient=True) (bgg_rankings.py:27-43): first digit run."""
    if not s:
        return None
    v = _int(s.strip())
    if v is not None:
        return v
    m = _RE_DIGITS.match(s)
    return _int(m.group(1)) if m else None


def _bgg_id_from_href(href: str | None):
    """_extract_bgg_id (bgg_rankings.py:46-66): works on direct AND
    archive-prefixed URLs (the id pattern lives in the embedded path)."""
    if not href:
        return None
    m = _RE_ANY_BGG_ID.search(href)
    return _int(m.group(1)) if m else None


def _archive_date(url: str):
    """_extract_date (bgg_rankings.py:101-115): wayback timestamp from
    the URL path, E14 shape."""
    m = _RE_ARCHIVE_DATE.search(url or "")
    if not m:
        return None
    stamp = m.group(1).ljust(14, "0")[:14]
    try:
        return datetime.strptime(stamp, "%Y%m%d%H%M%S")
    except ValueError:
        return None


def _urljoin(base: str, href: str) -> str:
    if not href or "://" in href[:10]:
        return href
    from urllib.parse import urljoin

    return urljoin(base, href)


def parse_bgg_rankings(url_canon: str, body: str) -> dict:
    """bgg_rankings.py:183-354: one callback, four historical layouts +
    wayback-toolbar navigation.

    Contract (bgg_rankings.py:184-188): the modern browse page yields
    exactly 100 items and 12 requests.  Rebuilt on the stdlib DOM engine
    (functions/html.py) — real selector semantics, not regexes (E2).
    """
    from ..functions.html import parse_html

    doc = parse_html(body)
    published_at = _archive_date(url_canon) or SCRAPED_AT
    spans, games, discovered, seen_urls = [], [], [], set()

    def follow(href: str, priority: int):
        target = _urljoin(url_canon, href)
        if target and target not in seen_urls:
            seen_urls.add(target)
            discovered.append({"url": target, "priority": priority,
                               "callback_kind": "bgg_rankings"})

    def emit(game: dict, image: str | None):
        games.append(game)
        if game.get("name"):
            spans.append(_span("text", len(spans), text=game["name"]))
        if image:
            spans.append(_span("image", len(spans), media_ref=image))

    # pagination (all eras): //a[contains(@title,'page')]/@href, prio 1
    for a in doc.select("a[title]"):
        if "page" in (a.get("title") or "") and a.get("href"):
            follow(a.get("href"), 1)

    # Era A: modern browse table#collectionitems (bgg_rankings.py:207-246)
    for row in doc.select("table#collectionitems tr"):
        link_el = row.select_first("td.collection_objectname a")
        bgg_id = _bgg_id_from_href(
            _urljoin(url_canon, link_el.get("href")) if link_el else None
        )
        if not bgg_id:
            continue
        year_el = row.select_first(
            "td.collection_objectname span.smallerfont.dull"
        )
        img_el = row.select_first("td.collection_thumbnail img")
        image = (_urljoin(url_canon, img_el.get("src"))
                 if img_el is not None else None)
        ratings = [c.text() for c in row.select("td.collection_bggrating")]
        rank_el = row.select_first("td.collection_rank")
        game = _game_row(
            bgg_id=bgg_id,
            name=clean_text_one(link_el.text()) or None,
            year=_lenient_int(year_el.text() if year_el else None),
            rank=_lenient_int(rank_el.text() if rank_el else None),
            image_url=[image] if image else None,
            url=_urljoin(url_canon, link_el.get("href")),
            published_at=published_at,
        )
        if len(ratings) == 3:
            game["bayes_rating"] = _float(ratings[0])
            game["avg_rating"] = _float(ratings[1])
            game["num_votes"] = _int(ratings[2])
        emit(game, image)

    # Era B: rankbrowse.php3 simplebox, exactly-3-cell rows
    # (bgg_rankings.py:247-277)
    for row in doc.select("div.simplebox table tr"):
        cells = row.child_elements("td")
        if len(cells) != 3:
            continue
        link_el = cells[1].select_first("a")
        bgg_id = _bgg_id_from_href(
            _urljoin(url_canon, link_el.get("href")) if link_el else None
        )
        if not bgg_id:
            continue
        emit(
            _game_row(
                bgg_id=bgg_id,
                rank=_lenient_int(cells[0].text()),
                name=clean_text_one(cells[1].text()) or None,
                bayes_rating=_float(cells[2].text()),
                url=_urljoin(url_canon, link_el.get("href")),
                published_at=published_at,
            ),
            None,
        )

    # Era C: browser.php gamebrowser_table, 5+-cell rows
    # (bgg_rankings.py:278-311)
    for row in doc.select("table.gamebrowser_table tr"):
        cells = row.child_elements("td")
        if len(cells) < 5:
            continue
        link_el = cells[2].select_first("a")
        bgg_id = _bgg_id_from_href(
            _urljoin(url_canon, link_el.get("href")) if link_el else None
        )
        if not bgg_id:
            continue
        img_el = cells[1].select_first("img")
        image = (_urljoin(url_canon, img_el.get("src"))
                 if img_el is not None else None)
        emit(
            _game_row(
                bgg_id=bgg_id,
                rank=_lenient_int(cells[0].text()),
                name=clean_text_one(cells[2].text()) or None,
                bayes_rating=_float(cells[3].text()),
                num_votes=_lenient_int(cells[4].text()),
                image_url=[image] if image else None,
                url=_urljoin(url_canon, link_el.get("href")),
                published_at=published_at,
            ),
            image,
        )

    # Era D: top50.htm / topn.php3 — table whose header row contains
    # <h3>Bayesian Average</h3> (bgg_rankings.py:313-344)
    for table in doc.select("table"):
        header_rows = table.select("tr")
        if not any(
            "Bayesian Average" in h3.text()
            for r in header_rows for td in r.child_elements("td")
            for h3 in td.child_elements("h3")
        ):
            continue
        for row in header_rows:
            cells = row.child_elements("td")
            if len(cells) < 4:
                continue
            link_el = cells[1].select_first("a")
            bgg_id = _bgg_id_from_href(
                _urljoin(url_canon, link_el.get("href")) if link_el else None
            )
            rank = _lenient_int(cells[0].text())
            if not bgg_id or not rank:
                continue
            emit(
                _game_row(
                    bgg_id=bgg_id,
                    rank=rank,
                    name=clean_text_one(cells[1].text()) or None,
                    bayes_rating=_float(cells[2].text()),
                    num_votes=_lenient_int(cells[3].text()),
                    url=_urljoin(url_canon, link_el.get("href")),
                    published_at=published_at,
                ),
                None,
            )

    # Wayback toolbar navigation: archive snapshots whose anchor @title
    # parses as a date, prio -1 (bgg_rankings.py:345-354)
    for a in doc.select("div#wm-ipp table a"):
        title, href = a.get("title"), a.get("href")
        if title and href and _RE_WAYBACK_TITLE_DATE.match(title.strip()):
            follow(href, -1)

    return {"spans": spans, "games": games, "users": [], "ratings": [],
            "discovered": discovered}


# bgg_geeklist.py:34-35: not part of the rankings
EXCLUDE_GEEKLIST_BGG_IDS = frozenset((197551, 167330))
_RE_GEEKLIST_TITLE = re.compile(
    r"^\s*bgg\s*top.*from\s*(\d+\s*[a-z]+\s*\d+)\s*to\s*(\d+\s*[a-z]+\s*\d+).*$",
    re.IGNORECASE,
)


def parse_bgg_geeklist(url_canon: str, body: str) -> dict:
    """bgg_geeklist.py:49-137: geeklist items → ranked GameItems, child
    geeklists + pagination → follow requests."""
    from ..functions.html import parse_html

    doc = parse_html(body)
    spans, games, discovered, seen_urls = [], [], [], set()

    def follow(href: str):
        target = _urljoin(url_canon, href)
        if target and target not in seen_urls:
            seen_urls.add(target)
            discovered.append({"url": target, "priority": 0,
                               "callback_kind": "bgg_geeklist"})

    # pagination (bgg_geeklist.py:108-114)
    for a in doc.select("a[title]"):
        if "page" in (a.get("title") or "") and a.get("href"):
            follow(a.get("href"))

    # published_at from "<title>"/"div.geeklist_title" date range
    # (bgg_geeklist.py:118-130: the range END is the publication date)
    published_at = None
    titles = [t.text() for t in doc.select("title")]
    titles += [t.text() for t in doc.select("div.geeklist_title")]
    for t in titles:
        m = _RE_GEEKLIST_TITLE.match(t or "")
        if m:
            try:
                published_at = datetime.strptime(
                    re.sub(r"\s+", " ", m.group(2)).strip(), "%d %b %Y"
                )
                break
            except ValueError:
                pass

    for item in doc.select("[data-objecttype=listitem]"):
        title_el = item.select_first(".geeklist_item_title")
        if title_el is None:
            continue
        anchors = title_el.select("a")
        rank_text = anchors[0].text() if anchors else None
        rank = _int(rank_text[:-1]) if rank_text else None

        bgg_id = None
        for a in anchors:
            bgg_id = _bgg_id_from_href(_urljoin(url_canon, a.get("href")))
            if bgg_id:
                break
        if bgg_id and bgg_id not in EXCLUDE_GEEKLIST_BGG_IDS:
            name = (clean_text_one(anchors[1].text())
                    if len(anchors) > 1 else None)
            image = None
            for img in item.select("img"):
                if (img.get("alt") or "").startswith("Board Game:"):
                    image = _urljoin(url_canon, img.get("src"))
                    break
            games.append(
                _game_row(
                    bgg_id=bgg_id,
                    name=name or None,
                    rank=rank,
                    image_url=[image] if image else None,
                    url=_urljoin(url_canon, anchors[1].get("href"))
                    if len(anchors) > 1 else None,
                    published_at=published_at,
                )
            )
            if name:
                spans.append(_span("text", len(spans), text=name))
            if image:
                spans.append(_span("image", len(spans), media_ref=image))
            continue
        # not a game: follow a child geeklist link (bgg_geeklist.py:76-84)
        if len(anchors) > 1:
            href = anchors[1].get("href")
            if href and "/geeklist/" in href:
                follow(href)

    return {"spans": spans, "games": games, "users": [], "ratings": [],
            "discovered": discovered}


def parse_dbpedia_games(url_canon: str, body: str) -> dict:
    """dbpedia.py:341-373 parse_games: game-URI bindings → one
    property-table SPARQL request per game (callback dbpedia_game)."""
    from ..synth import dbpedia_game_url

    root = ET.fromstring(body)
    spans, discovered = [], []
    for b in root.iter(f"{_SPARQL_NS}binding"):
        if b.get("name") != "game":
            continue
        uri_el = b.find(f"{_SPARQL_NS}uri")
        if uri_el is None or not uri_el.text:
            continue
        m = re.search(r"/resource/Game_(\d+)$", uri_el.text)
        if not m:
            continue
        g = int(m.group(1))
        discovered.append({"url": dbpedia_game_url(g), "priority": 0,
                           "callback_kind": "dbpedia_game"})
        spans.append(_span("text", len(spans), text=uri_el.text))
    return {"spans": spans, "games": [], "users": [], "ratings": [],
            "discovered": discovered}


def _dbp_bindings(body: str):
    """(property, value_text, value_uri, value_lang, label, label_lang)
    per result row."""
    root = ET.fromstring(body)
    rows = []
    for res in root.iter(f"{_SPARQL_NS}result"):
        prop = val = uri = lang = label = label_lang = None
        for b in res.findall(f"{_SPARQL_NS}binding"):
            name = b.get("name")
            u = b.find(f"{_SPARQL_NS}uri")
            lit = b.find(f"{_SPARQL_NS}literal")
            if name == "property" and u is not None:
                prop = u.text
            elif name == "value":
                if u is not None:
                    uri = u.text
                elif lit is not None:
                    val = lit.text
                    lang = lit.get(
                        "{http://www.w3.org/XML/1998/namespace}lang")
            elif name == "label" and lit is not None:
                label = lit.text
                label_lang = lit.get(
                    "{http://www.w3.org/XML/1998/namespace}lang")
        if prop:
            rows.append((prop, val, uri, lang, label, label_lang))
    return rows


def parse_dbpedia_game(url_canon: str, body: str) -> dict:
    """dbpedia.py:375-521 parse_game: fold the property table into one
    GameItem — per field, a property-preference list with en-first
    language fallback (the reference's stacked add_xpath calls +
    TakeFirst loader semantics)."""
    rows = _dbp_bindings(body)

    def literals(prop, lang=None):
        return [clean_text_one(v) for p, v, _u, lg, _l, _ll in rows
                if p == prop and v and (lang is None or lg == lang)]

    def labels(prop, lang=None):
        return [clean_text_one(lb) for p, _v, _u, _lg, lb, ll in rows
                if p == prop and lb and (lang is None or ll == lang)]

    def uris(prop):
        return [u for p, _v, u, _lg, _l, _ll in rows if p == prop and u]

    def first(*cands):
        for c in cands:
            if c:
                return c[0]
        return None

    RDFS = "http://www.w3.org/2000/01/rdf-schema#label"
    FOAF_NAME = "http://xmlns.com/foaf/0.1/name"
    DBP_NAME = "http://dbpedia.org/property/name"
    name = first(
        literals(RDFS, "en"), literals(FOAF_NAME, "en"),
        literals(DBP_NAME, "en"),
        literals(RDFS), literals(FOAF_NAME), literals(DBP_NAME),
    )
    alt = []
    for p in (RDFS, FOAF_NAME, DBP_NAME):
        for v in literals(p):
            if v and v not in alt:
                alt.append(v)
    desc = first(
        literals("http://dbpedia.org/ontology/abstract", "en"),
        literals("http://www.w3.org/2000/01/rdf-schema#comment", "en"),
        literals("http://dbpedia.org/ontology/abstract"),
        literals("http://www.w3.org/2000/01/rdf-schema#comment"),
    )
    year = _lenient_int(first(
        literals("http://dbpedia.org/property/date"),
        literals("http://dbpedia.org/property/years"),
    ))
    designer = (labels("http://dbpedia.org/ontology/designer", "en")
                or labels("http://dbpedia.org/ontology/designer")) or None
    publisher = (labels("http://dbpedia.org/ontology/publisher", "en")
                 or labels("http://dbpedia.org/ontology/publisher")) or None
    images = (
        uris("http://xmlns.com/foaf/0.1/depiction")
        + uris("http://dbpedia.org/ontology/thumbnail")
        + uris("http://dbpedia.org/property/imageLink")
    ) or None
    bgg_id = _lenient_int(first(
        literals("http://dbpedia.org/property/bggid")))
    game = _game_row(
        bgg_id=bgg_id,
        name=name,
        alt_name=alt or None,
        year=_validate_range(year, -4000, 2035),
        description=desc,
        designer=designer,
        publisher=publisher,
        image_url=images,
        min_players=_validate_range(
            _lenient_int(first(
                literals("http://dbpedia.org/property/players"))), 1, None),
        min_age=_validate_range(
            _lenient_int(first(
                literals("http://dbpedia.org/property/ages"))), 0, 21),
        url=url_canon,
    )
    spans = [_span("text", 0, text=name)]
    if desc:
        spans.append(_span("text", len(spans), text=desc))
    for i in images or []:
        spans.append(_span("image", len(spans), media_ref=i))
    return {"spans": spans, "games": [game], "users": [], "ratings": [],
            "discovered": []}


PARSERS = {
    "bgg_browse": parse_browse,
    "bgg_thing": parse_thing,
    "bgg_user": parse_user,
    "bgg_collection": parse_collection,
    "luding_game": parse_luding,
    "spielen_game": parse_spielen,
    "wikidata_entity": parse_wikidata_entity,
    "wikidata_sparql": parse_sparql,
    "bgg_rank_history": parse_rank_history,
    "bgg_hotness": parse_hotness,
    "bgg_rankings": parse_bgg_rankings,
    "bgg_geeklist": parse_bgg_geeklist,
    "dbpedia_games": parse_dbpedia_games,
    "dbpedia_game": parse_dbpedia_game,
}


def parse_page(url_canon: str, callback_kind: str, body: str) -> dict:
    parser = PARSERS.get(callback_kind)
    if parser is None or body is None:
        return {"spans": [], "games": [], "users": [], "ratings": [],
                "discovered": []}
    try:
        return parser(url_canon, body)
    except (ET.ParseError, ValueError, KeyError, TypeError):
        # DROPMALFORMED semantics (merge.py:170): bad page → nothing.
        # (json.JSONDecodeError is a ValueError.)
        return {"spans": [], "games": [], "users": [], "ratings": [],
                "discovered": []}


# Pages per emitted Arrow batch.  One page can explode into ~10^3 item
# rows (100 rating comments x 10 games, reference page_size bgg.py:124);
# yielding per input partition would hold the whole partition's nested
# output in worker memory at once.
PARSE_CHUNK_PAGES = 64


def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: FETCHED batches → PARSED batches (chunked)."""
    cols = ["url_canon", "doc_id", "spans", "games", "users", "ratings",
            "discovered"]
    rows: list[dict] = []
    for pdf in batches:
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
            if len(rows) >= PARSE_CHUNK_PAGES:
                yield pd.DataFrame(rows, columns=cols)
                rows = []
    if rows:
        yield pd.DataFrame(rows, columns=cols)


def parse_arrow_batches(batches):
    """mapInArrow kernel: build the nested output columnar, straight to
    Arrow.  The dict→pandas-object→Arrow path costs ~3x the parse itself
    (measured: 1.5s compute vs 4.3s emit for 1.8M nested rows);
    ``pa.array(list_of_lists_of_dicts, type=list<struct>)`` converts in
    C++ in one pass.
    """
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from ..schemas import PARSED

    arrow_schema = to_arrow_schema(PARSED)
    types = {f.name: f.type for f in arrow_schema}

    def emit(rows: list[dict]) -> pa.RecordBatch:
        arrays = [
            pa.array([r["url_canon"] for r in rows], types["url_canon"]),
            pa.array([r["doc_id"] for r in rows], types["doc_id"]),
        ]
        for col in ("spans", "games", "users", "ratings", "discovered"):
            arrays.append(
                pa.array([r[col] for r in rows], types[col])
            )
        return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    rows: list[dict] = []
    for rb in batches:
        urls = rb.column(0).to_pylist()
        kinds = rb.column(1).to_pylist()
        bodies = rb.column(2).to_pylist()
        for url_canon, kind, body in zip(urls, kinds, bodies):
            parsed = parse_page(url_canon, kind, body)
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
            if len(rows) >= PARSE_CHUNK_PAGES:
                yield emit(rows)
                rows = []
    if rows:
        yield emit(rows)


def parse_flat_batches(batches):
    """mapInArrow kernel emitting the PARSE_FLAT shape: one 'fetch' row
    per input URL (any status — retries/metrics derive from it), one
    'page' row (spans + discovered) per 200, plus one flat row per
    extracted item."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from ..schemas import PARSE_FLAT

    arrow_schema = to_arrow_schema(PARSE_FLAT)
    types = {f.name: f.type for f in arrow_schema}

    def emit(rows: list[tuple]) -> pa.RecordBatch:
        cols = list(zip(*rows))
        names = ["url_canon", "item_kind", "spans", "discovered", "game",
                 "user", "rating", "fetch"]
        arrays = [pa.array(list(c), types[n]) for n, c in zip(names, cols)]
        return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    rows: list[tuple] = []
    for rb in batches:
        cols = {name: rb.column(i).to_pylist()
                for i, name in enumerate(rb.schema.names)}
        for i, url_canon in enumerate(cols["url_canon"]):
            status = cols["status"][i]
            fetch = {
                "url_hash": cols["url_hash"][i],
                "host": cols["host"][i],
                "priority": cols["priority"][i],
                "callback_kind": cols["callback_kind"][i],
                "attempt": cols["attempt"][i],
                "status": status,
                "latency_ms": cols["latency_ms"][i],
            }
            rows.append((url_canon, "fetch", None, None, None, None, None,
                         fetch))
            if status != 200:
                continue
            parsed = parse_page(url_canon, cols["callback_kind"][i],
                                cols["body"][i])
            disc = []
            for d in parsed["discovered"]:
                canon = _canon_cached(d["url"])
                if canon:
                    disc.append({"url": canon, "priority": d["priority"],
                                 "callback_kind": d["callback_kind"]})
            rows.append((url_canon, "page", parsed["spans"], disc,
                         None, None, None, None))
            for g in parsed["games"]:
                rows.append((url_canon, "game", None, None, g, None, None,
                             None))
            for u in parsed["users"]:
                rows.append((url_canon, "user", None, None, None, u, None,
                             None))
            for r in parsed["ratings"]:
                rows.append((url_canon, "rating", None, None, None, None,
                             r, None))
            if len(rows) >= PARSE_CHUNK_PAGES * 64:
                yield emit(rows)
                rows = []
    if rows:
        yield emit(rows)


def run_parse_flat(fetched, target_partitions: int | None = 0):
    """fetched (ALL statuses) → PARSE_FLAT DataFrame — the crawl loop's
    single fused parse pass.  Designed to be written ONCE: no nested
    page-level arrays for items, and per-URL 'fetch' rows ride along so
    every downstream consumer (item tables, metrics, retries, discovery)
    is a cheap filtered read of the one scratch parquet.

    ``target_partitions=0`` (default): NO repartition — the fetch stage
    is a broadcast semi-join over the corpus scan, so the input already
    has scan-width partitioning and repartitioning would shuffle every
    page body (the exact exchange the broadcast fetch exists to avoid).
    Pass an explicit width only when the input is known to be skewed or
    narrower than the cluster."""
    from ..schemas import PARSE_FLAT

    src = fetched.select(
        "url_canon", "callback_kind", "body", "url_hash", "host",
        "priority", "attempt", "status", "latency_ms",
    )
    if target_partitions is None:
        target_partitions = (
            fetched.sparkSession.sparkContext.defaultParallelism * 2
        )
    if target_partitions:
        src = src.repartition(target_partitions)
    return src.mapInArrow(parse_flat_batches, PARSE_FLAT)


def parse_flat_write_batches(batches, out_dir: str, partition: bool,
                             codec: str):
    """Worker-side parquet sink for the fused parse stage: wraps
    ``parse_flat_batches`` and writes its output straight from the
    Python worker with pyarrow, yielding only tiny per-kind row counts.

    WHY: at local[32] the JVM parquet writer puts 32 writer tasks in ONE
    heap — column-writer allocation + codec buffers made the write stage
    scale only ~1.6x from 8→32 cores while the parse compute scaled
    3.28x (BENCH/BASELINE.md decomposition, VERDICT r03 'next' #1).
    Python workers are separate PROCESSES: each writes its own file with
    its own allocator, which is exactly the per-executor layout a real
    cluster has.  The JVM side of the stage now only carries the stats
    rows.

    Files land as ``item_kind=<kind>/part-<task>.parquet`` (hive layout,
    same as the JVM ``partitionBy`` writer) or flat when ``partition``
    is false.  Each file is written to a dot-prefixed temp name and
    renamed on task completion, so a failed/retried task never leaves a
    half-written file visible to the parquet reader (dot-files are
    ignored by Spark's file index)."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    # Filenames carry (partitionId, attemptNumber) so the DRIVER can
    # reconcile after the job: a task retried/speculated after its
    # renames leaves BOTH attempts' files visible (the rename below runs
    # before Spark marks the task committed — ADVICE r04 #2), and the
    # parse is deterministic per partition, so keeping exactly one file
    # per (partition, kind) restores exactly-once output.  See
    # reconcile_task_attempts().
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx else 0
    att = ctx.attemptNumber() if ctx else 0
    task_id = f"{pid:05d}-a{att}-{uuid.uuid4().hex[:8]}"
    writers: dict[str, tuple] = {}
    counts: dict[str, int] = {}

    def get_writer(kind: str, schema: pa.Schema):
        got = writers.get(kind)
        if got is None:
            d = (os.path.join(out_dir, f"item_kind={kind}")
                 if partition else out_dir)
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, f"part-{task_id}-{kind}.parquet")
            tmp = os.path.join(d, f".tmp-{task_id}-{kind}.parquet")
            got = (pq.ParquetWriter(tmp, schema, compression=codec),
                   tmp, final)
            writers[kind] = got
        return got[0]

    try:
        for rb in parse_flat_batches(batches):
            kinds_col = rb.column(1)  # item_kind
            for kind in pc.unique(kinds_col).to_pylist():
                sub = rb.filter(pc.equal(kinds_col, kind))
                counts[kind] = counts.get(kind, 0) + sub.num_rows
                tbl = pa.Table.from_batches([sub])
                if partition:
                    # the partition value lives in the dir name
                    tbl = tbl.drop_columns(["item_kind"])
                    wkey = kind
                else:
                    wkey = "_all"
                get_writer(wkey, tbl.schema).write_table(tbl)
    finally:
        for w, tmp, final in writers.values():
            w.close()
    for _, tmp, final in writers.values():
        os.rename(tmp, final)
    if counts:
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(counts.keys()), pa.string()),
             pa.array([counts[k] for k in counts], pa.int64())],
            names=["item_kind", "n"],
        )


def reconcile_task_attempts(out_dir: str) -> int:
    """Driver-side exactly-once repair for the worker-side write.

    ``parse_flat_write_batches`` renames its temp files inside the task
    (Python workers cannot see Spark's task-commit protocol), so a task
    attempt that completed its renames but was then retried — failure
    during result serialization, fetch failure, speculative execution —
    leaves two attempts' files visible and would duplicate rows
    (ADVICE r04 #2).  The parse is deterministic per input partition
    (round-robin repartition is sort-stabilized by
    spark.sql.execution.sortBeforeRepartition, default on), so every
    attempt of a partition writes identical rows: keeping exactly ONE
    file per (partition id, kind) — the highest attempt number —
    restores exactly-once semantics.  Called by the driver after the
    job succeeds, before the data dir is committed via ``add_files``.
    Returns the number of duplicate files removed."""
    import os
    import re

    pat = re.compile(r"part-(\d+)-a(\d+)-[0-9a-f]+-(.+)\.parquet$")
    removed = 0
    for root, _dirs, names in os.walk(out_dir):
        best: dict[tuple[str, str], tuple[int, str]] = {}
        dupes: list[str] = []
        for name in names:
            m = pat.match(name)
            if not m:
                continue
            key = (m.group(1), m.group(3))
            att = int(m.group(2))
            prev = best.get(key)
            if prev is None:
                best[key] = (att, name)
            elif att > prev[0]:
                dupes.append(prev[1])
                best[key] = (att, name)
            else:
                dupes.append(name)
        for name in dupes:
            os.unlink(os.path.join(root, name))
            removed += 1
    return removed


def run_parse_flat_write(fetched, out_dir: str, partition: bool = True,
                         codec: str | None = None,
                         target_partitions: int | None = 0):
    """Fused parse + worker-side parquet write: returns a tiny
    (item_kind, n) stats DataFrame whose materialization runs the whole
    schedule→fetch→parse→write pipeline as ONE job and lands the
    PARSE_FLAT rows in ``out_dir`` (the items table's next data dir —
    committed afterwards via ``SnapshotTable.add_files``).

    Codec default comes from $SPARK_GRAFT_NATIVE_CODEC (else snappy,
    matching the JVM writer); each worker process compresses
    independently (no shared-JVM codec contention)."""
    import os
    from functools import partial

    if codec is None:
        codec = os.getenv("SPARK_GRAFT_NATIVE_CODEC", "snappy")

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    src = fetched.select(
        "url_canon", "callback_kind", "body", "url_hash", "host",
        "priority", "attempt", "status", "latency_ms",
    )
    if target_partitions is None:
        target_partitions = (
            fetched.sparkSession.sparkContext.defaultParallelism * 2
        )
    if target_partitions:
        src = src.repartition(target_partitions)
    stats_schema = StructType([
        StructField("item_kind", StringType(), False),
        StructField("n", LongType(), False),
    ])
    fn = partial(parse_flat_write_batches, out_dir=out_dir,
                 partition=partition, codec=codec)
    return src.mapInArrow(fn, stats_schema)


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
    return src.mapInArrow(parse_arrow_batches, PARSED)
