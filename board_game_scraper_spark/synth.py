"""Deterministic synthetic crawl corpus (seed 42, no wall-clock).

Stands in for the HTTP downloader (S5) per FIXTURES.md §2-3: a closed URL
universe where every URL the parse stage can discover exists in the
``pages`` table.  Page shapes mirror the reference's fixtures:

- BGG browse HTML        (spiders/bgg.py:399-427 parse contract)
- BGG thing XML w/ stats + rating comments (bgg.py:429-652)
- BGG user XML           (bgg.py:732-762)
- BGG collection XML     (bgg.py:654-729)
- Luding / Spielen game HTML (luding.py:52-107, spielen.py:80-183)

Determinism note: the reference batches game ids *after* seen-filtering
(bgg.py:251-294), which makes batch-URL composition depend on crawl
history.  To keep the corpus closed we batch per browse page (sorted ids,
10 per batch, duplicates allowed across pages); URL-level dedup (F6) then
carries the dedup burden — game-id dedup (F7) applies at the item layer.

Statuses are deterministic per URL (md5-derived): ~3% 429, ~2% 503,
~2% 404, ~1% 202, rest 200 — exercising retry (F9) and drop paths.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlencode

import pandas as pd

from .functions.canon import canonicalize_one

BGG = "https://boardgamegeek.com"
LUDING = "https://www.luding.org"
SPIELEN = "https://gesellschaftsspiele.spielen.de"


def _h(s: str) -> int:
    """Deterministic 64-bit hash (not Python's randomized hash())."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def browse_url(page: int) -> str:
    return f"{BGG}/browse/boardgame/page/{page}"


def thing_url(ids: list[int]) -> str:
    """Canonical thing-API URL — sorted params like bgg.py:244-249."""
    params = urlencode(
        sorted({"id": ",".join(map(str, sorted(ids))), "stats": "1"}.items())
    )
    return f"{BGG}/xmlapi2/thing?{params}"


def user_url(name: str) -> str:
    params = urlencode(sorted({"name": name}.items()))
    return f"{BGG}/xmlapi2/user?{params}"


def collection_url(name: str) -> str:
    params = urlencode(
        sorted({"username": name, "stats": "1", "version": "0"}.items())
    )
    return f"{BGG}/xmlapi2/collection?{params}"


def luding_url(i: int) -> str:
    return f"{LUDING}/cgi-bin/GameData.py/ENgameid/{i}"


def spielen_url(i: int) -> str:
    return f"{SPIELEN}/alle-brettspiele/spiel-{i}"


def page_games(page: int, n_games: int, per_page: int = 20) -> list[int]:
    """Deterministic, overlapping game list for one browse page."""
    return sorted(
        {1 + _h(f"g:{page}:{j}") % n_games for j in range(per_page)}
    )


def game_users(game_id: int, n_users: int, k: int = 2) -> list[str]:
    return [f"user{1 + _h(f'u:{game_id}:{j}') % n_users}" for j in range(k)]


def status_for(url: str) -> int:
    b = _h("st:" + url) % 100
    if b < 3:
        return 429
    if b < 5:
        return 503
    if b < 7:
        return 404
    if b < 8:
        return 202
    return 200


def latency_for(url: str) -> int:
    return 50 + _h("lat:" + url) % 400


# ---------------------------------------------------------------------------
# Page bodies (kept format-synced with plans/parse.py)
# ---------------------------------------------------------------------------

def browse_body(page: int, n_browse: int, n_games: int) -> str:
    links = "\n".join(
        f'<td><a href="/boardgame/{gid}/game-{gid}">Game {gid}</a></td>'
        for gid in page_games(page, n_games)
    )
    nxt = (
        f'<a title="next page" href="/browse/boardgame/page/{page + 1}">next</a>'
        if page < n_browse
        else ""
    )
    return f"<html><body><table>{links}</table>{nxt}</body></html>"


def _game_name(gid: int) -> str:
    # Entity-hack case every 7th game: BGG's double-encoded 'Ü'
    # (utils.py:78-86) — parse must decode '&amp;#195;&amp;#156;' to 'Ü'.
    if gid % 7 == 0:
        return f"Game &amp;#195;&amp;#156;ber {gid}"
    return f"Game {gid}"


def thing_body(ids: list[int], n_users: int,
               comments_per_game: int = 2) -> str:
    items = []
    for gid in sorted(ids):
        comments = "\n".join(
            f'<comment username="{u}" rating="{1 + _h(f"r:{gid}:{u}") % 10}" '
            f'value="nice game {gid} — &amp;#195;&amp;#156;berraschend   gut, '
            f'plays {1 + _h(f"pc:{gid}:{u}") % 60} times"/>'
            for u in game_users(gid, n_users, comments_per_game)
        )
        year = 1990 + _h(f"y:{gid}") % 35
        avg = round(4 + (_h(f"avg:{gid}") % 600) / 100, 2)
        rank = 1 + _h(f"rk:{gid}") % 5000
        items.append(
            f"""<item type="boardgame" id="{gid}">
<thumbnail>https://cf.geekdo-images.com/thumb/{gid}.jpg</thumbnail>
<image>https://cf.geekdo-images.com/original/{gid}.jpg</image>
<name type="primary" sortindex="1" value="{_game_name(gid)}"/>
<description>Description   of game {gid} &amp; friends.
With multiple   spaces.</description>
<yearpublished value="{year}"/>
<minplayers value="{1 + _h(f"mnp:{gid}") % 3}"/>
<maxplayers value="{2 + _h(f"mxp:{gid}") % 6}"/>
<playingtime value="{30 + _h(f"pt:{gid}") % 90}"/>
<minage value="{6 + _h(f"ma:{gid}") % 10}"/>
<link type="boardgamedesigner" id="{100 + gid % 50}" value="Designer {100 + gid % 50}"/>
<link type="boardgamecategory" id="{200 + gid % 20}" value="Category {200 + gid % 20}"/>
<link type="boardgamemechanic" id="{300 + gid % 15}" value="Mechanic {300 + gid % 15}"/>
<videos total="1"><video id="{gid}" link="https://www.youtube.com/watch?v=v{gid}"/></videos>
<statistics page="1"><ratings>
<usersrated value="{10 + _h(f"nv:{gid}") % 9000}"/>
<average value="{avg}"/>
<stddev value="1.5"/>
<bayesaverage value="{round(avg - 0.3, 2)}"/>
<ranks><rank type="subtype" id="1" name="boardgame" friendlyname="Board Game Rank" value="{rank}" bayesaverage="{round(avg - 0.3, 2)}"/></ranks>
<averageweight value="{round(1 + (_h(f"cx:{gid}") % 400) / 100, 2)}"/>
</ratings></statistics>
{comments}
</item>"""
        )
    return '<?xml version="1.0" encoding="utf-8"?><items>' + "\n".join(items) + "</items>"


def user_body(name: str) -> str:
    uid = _h("uid:" + name) % 10**6
    return (
        '<?xml version="1.0" encoding="utf-8"?>'
        f'<user id="{uid}" name="{name}">'
        f'<firstname value="First{uid % 100}"/>'
        f'<lastname value="Last{uid % 100}"/>'
        f'<yearregistered value="{2005 + uid % 20}"/>'
        f'<country value="Country{uid % 30}"/>'
        "</user>"
    )


def collection_body(name: str, n_games: int) -> str:
    gids = sorted({1 + _h(f"c:{name}:{j}") % n_games for j in range(8)})
    items = "\n".join(
        f'<item objecttype="thing" objectid="{gid}" subtype="boardgame">'
        f'<stats><rating value="{1 + _h(f"cr:{name}:{gid}") % 10}"/></stats>'
        f'<status own="{_h(f"own:{name}:{gid}") % 2}" />'
        f'<numplays>{_h(f"np:{name}:{gid}") % 50}</numplays></item>'
        for gid in gids
    )
    return (
        '<?xml version="1.0" encoding="utf-8"?>'
        f'<items totalitems="{len(gids)}">' + items + "</items>"
    )


def luding_body(i: int) -> str:
    return (
        f"<html><body><h1>Luding Game {i}</h1>"
        f"<table><tr><td>Year</td><td>{1980 + i % 45}</td></tr>"
        f"<tr><td>Players</td><td>{1 + i % 4} - {2 + i % 6}</td></tr>"
        "</table></body></html>"
    )


def spielen_body(i: int) -> str:
    return (
        f'<html><body><div class="fullBox"><h1>Spiel {i}</h1>'
        f"<p>{1 + i % 4} - {2 + i % 6} Spieler</p>"
        f"<p>ab {6 + i % 10} Jahren</p></div></body></html>"
    )


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

def corpus(
    n_browse: int = 25,
    n_users: int = 50,
    n_other: int = 20,
    per_page: int = 20,
    comments_per_game: int = 2,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build (seeds, pages) DataFrames.  n_games = n_browse * 15.

    ``comments_per_game`` scales per-page parse work (the reference
    fetches 100 rating comments per thing page, bgg.py:124); tests use 2
    for speed, benchmarks use realistic volumes.
    """
    n_games = max(n_browse * 15, 30)
    pages: dict[str, tuple[int, str, str]] = {}  # canon -> (status, ctype, body)

    def add(url: str, ctype: str, body: str) -> str:
        canon = canonicalize_one(url)
        assert canon is not None, url
        if canon not in pages:
            pages[canon] = (status_for(canon), ctype, body)
        return canon

    for p in range(1, n_browse + 1):
        add(browse_url(p), "text/html", browse_body(p, n_browse, n_games))
        gids = page_games(p, n_games, per_page)
        for i in range(0, len(gids), 10):
            batch = gids[i : i + 10]
            add(thing_url(batch), "text/xml",
                thing_body(batch, n_users, comments_per_game))
    for u in range(1, n_users + 1):
        name = f"user{u}"
        add(user_url(name), "text/xml", user_body(name))
        add(collection_url(name), "text/xml", collection_body(name, n_games))
    for i in range(1, n_other + 1):
        add(luding_url(i), "text/html", luding_body(i))
        add(spielen_url(i), "text/html", spielen_body(i))

    pages_df = pd.DataFrame(
        [
            {
                "url_canon": canon,
                "status": status,
                "content_type": ctype,
                "body": body,
                "latency_ms": latency_for(canon),
            }
            for canon, (status, ctype, body) in sorted(pages.items())
        ]
    )

    # Seeds: all browse pages (~80% of hosts traffic is BGG — the hot-host
    # skew the north_rule requires), plus other-host game pages and a few
    # direct user URLs (priority +3 like bgg.py:375).
    seeds = []
    for p in range(1, n_browse + 1):
        seeds.append({"url": browse_url(p), "source": "bgg", "priority": 0})
    for i in range(1, n_other + 1):
        seeds.append({"url": luding_url(i), "source": "luding", "priority": 0})
        seeds.append({"url": spielen_url(i), "source": "spielen", "priority": 0})
    for u in range(1, min(n_users, 10) + 1):
        seeds.append({"url": user_url(f"user{u}"), "source": "bgg", "priority": 3})
    return pd.DataFrame(seeds), pages_df


def callback_kind_for(url_canon: str) -> str:
    """Dispatch column: which parser handles this URL (the reference's
    Request.callback, bgg.py:284-291, as data)."""
    if "/browse/boardgame" in url_canon:
        return "bgg_browse"
    if "/xmlapi2/thing" in url_canon:
        return "bgg_thing"
    if "/xmlapi2/user" in url_canon:
        return "bgg_user"
    if "/xmlapi2/collection" in url_canon:
        return "bgg_collection"
    if "luding.org" in url_canon:
        return "luding_game"
    if "spielen.de" in url_canon:
        return "spielen_game"
    return "unknown"
