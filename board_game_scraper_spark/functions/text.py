"""Text cleaning chain (C7) + scalar helpers (SURVEY.md §2.10).

Reproduces the reference's loader processor chain
(``loaders.py:17-19``: remove_tags → replace_all_entities →
normalize_space) including the intentional double-encoded-entity hack
(``utils.py:63-86``): BGG encodes 'Ü' as '&amp;#195;&amp;#156;', so the
chain first collapses '&amp;' → '&', then decodes *runs* of numeric
entities as UTF-8 byte sequences — which can corrupt correctly-encoded
text; the reference accepts that (utils.py:80-82 comment) and so do we,
bit for bit.

w3lib (the reference's tag/entity library) is not a dependency here; tag
removal and entity replacement are reimplemented with stdlib re+html.
"""

from __future__ import annotations

import html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# utils.py:37-38
REGEX_ENTITIES = re.compile(r"(&#(\d+);)+")
REGEX_SINGLE_ENT = re.compile(r"&#(\d+);")
_REGEX_TAG = re.compile(r"<[^>]*>")
_REGEX_SPACE = re.compile(r"\s+")


def _replace_utf_entities(match: re.Match) -> str:
    """Decode a run of numeric entities as UTF-8 bytes (utils.py:63-70)."""
    try:
        values = [int(v) for v in REGEX_SINGLE_ENT.findall(match.group(0))]
        if all(0 < v < 256 for v in values):
            return bytes(values).decode()
    except Exception:
        pass
    return match.group(0)


def replace_utf_entities(string: str) -> str:
    """utils.py:73-75."""
    return REGEX_ENTITIES.sub(_replace_utf_entities, string)


def replace_all_entities(string: str) -> str:
    """utils.py:78-86 — the '&amp;' collapse hack then full entity decode."""
    collapsed = string.replace("&amp;", "&").replace("&amp;", "&").replace(
        "&amp;", "&"
    )
    return html.unescape(replace_utf_entities(collapsed))


def remove_tags(string: str) -> str:
    """Strip markup tags, keep text content (w3lib remove_tags analog)."""
    return _REGEX_TAG.sub("", string)


def normalize_space(string: str) -> str:
    """XPath normalize-space: trim + collapse internal whitespace."""
    return _REGEX_SPACE.sub(" ", string).strip()


def clean_text_one(value: str | None) -> str | None:
    """Full C7 chain for one value (loaders.py:17-19 order)."""
    if value is None:
        return None
    out = normalize_space(replace_all_entities(remove_tags(value)))
    return out if out else None


@pandas_udf(StringType())
def clean_text(values: pd.Series) -> pd.Series:
    """Vectorized C7 chain (Arrow batch; loaders.py:14-46 default input)."""
    return values.map(clean_text_one, na_action="ignore")


def clear_list(values) -> list | None:
    """Order-preserving dedupe + drop falsey; [] → None.

    Reference: pytility.clear_list used ~20x (items.py:81-82, bgg.py:203).
    """
    if values is None:
        return None
    seen, out = set(), []
    for v in values:
        if v and v not in seen:
            seen.add(v)
            out.append(v)
    return out or None


def clear_list_col(col):
    """Column version of clear_list: array_distinct(filter(non-falsey)),
    NULL when empty — pure built-ins (JVM-side), SURVEY §2.10."""
    cleaned = F.array_distinct(
        F.filter(col, lambda e: e.isNotNull() & (e != F.lit("")))
    )
    return F.when(F.size(cleaned) > 0, cleaned)


def validate_range_col(col, lower=None, upper=None):
    """Value in [lower, upper] else NULL (utils.py:190-197, C8)."""
    cond = F.lit(True)
    if lower is not None:
        cond = cond & (col >= F.lit(lower))
    if upper is not None:
        cond = cond & (col <= F.lit(upper))
    return F.when(cond, col)


def normalize_space_col(col):
    """JVM-side normalize-space (no UDF) for already-tagless text."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def limit_images_col(col, n: int):
    """C11 (pipelines.py:187-239): copy first n URLs; 0 → none (NULL),
    -1 → all."""
    if n == 0:
        return F.lit(None).cast("array<string>")
    if n < 0:
        return col
    limited = F.slice(col, 1, n)
    return F.when(F.size(limited) > 0, limited)


# C12 (pipelines.py:146-184 ResolveImagePipeline): dbpedia/wikidata file
# pages → commons Special:Redirect.  regex mirrors pipelines.py:157.
_COMMONS_PATH_RE = r"^/(resource/File:|wiki/Special:EntityData/)(.+)$"
_COMMONS_URL = "https://commons.wikimedia.org/wiki/Special:Redirect/file/"


_COMMONS_FULL_RE = (
    r"^https?://(?:[a-z]{2}\.dbpedia\.org|(?:www\.)?dbpedia\.org"
    r"|(?:www\.)?wikidata\.org)"
    r"/(resource/File:|wiki/Special:EntityData/)(.+)$"
)


def commons_image_url_col(col):
    """Rewrite one URL column: matched file-page paths → commons redirect
    URL (spaces → underscores per pipelines.py:171); others unchanged.
    Pure regex (parse_url rejects URLs containing spaces, which the
    reference's urlparse tolerates — pipelines.py:161).
    """
    file_id = F.regexp_extract(col, _COMMONS_FULL_RE, 2)
    rewritten = F.concat(
        F.lit(_COMMONS_URL), F.regexp_replace(file_id, " ", "_")
    )
    return F.when(file_id != "", rewritten).otherwise(col)


def commons_image_urls_col(arr_col):
    """C12 over an array column (image_url is array<string>)."""
    return F.transform(arr_col, commons_image_url_col)
