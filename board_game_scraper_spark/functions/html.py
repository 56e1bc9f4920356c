"""Minimal HTML DOM + CSS-selector engine (stdlib only) — E2.

The reference extracts with parsel/cssselect (``spiders/bgg_rankings.py:
207-246``, ``spiders/bgg_geeklist.py:49-77``, ``spiders/spielen.py:
65-132``).  Neither ships in this sandbox, so this module implements the
selector subset those spiders actually use on top of
``html.parser.HTMLParser``:

- compound simple selectors: ``tag``, ``.class``, ``#id``, ``[attr]``,
  ``[attr=value]`` and combinations (``td.collection_objectname``)
- the descendant combinator (``table#collectionitems tr``)
- attribute / text extraction per node

This is a real tree walk over a parsed DOM — unlike regexes it survives
attribute reordering, nesting, and unrelated markup.  It is executed
inside Arrow-batch parse kernels only (never per-row across the JVM
boundary).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

# Elements that never have closing tags in the wild.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Real-world pages frequently leave these unclosed; auto-close on a new
# sibling so rows don't nest inside each other.
_AUTOCLOSE = {
    "tr": {"tr"},
    "td": {"td", "th", "tr"},
    "th": {"td", "th", "tr"},
    "li": {"li"},
    "option": {"option"},
    "p": {"p", "div", "table", "ul", "ol"},
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node or str (text)
        self.parent = parent

    # -- accessors ---------------------------------------------------------

    def get(self, attr: str, default=None):
        return self.attrs.get(attr, default)

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def text(self) -> str:
        """All descendant text, whitespace-normalized."""
        parts: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                parts.append(c)
            else:
                stack.extend(reversed(c.children))
        return re.sub(r"\s+", " ", "".join(parts)).strip()

    def iter(self):
        """All descendant element nodes, document order."""
        stack = list(reversed([c for c in self.children if isinstance(c, Node)]))
        while stack:
            n = stack.pop()
            yield n
            stack.extend(
                reversed([c for c in n.children if isinstance(c, Node)])
            )

    def child_elements(self, tag: str | None = None) -> list:
        out = [c for c in self.children if isinstance(c, Node)]
        if tag:
            out = [c for c in out if c.tag == tag]
        return out

    # -- selection ----------------------------------------------------------

    def select(self, selector: str) -> list:
        """Descendant-combinator CSS select (the parsel subset)."""
        parts = [_parse_simple(p) for p in selector.split()]
        current = [self]
        for part in parts:
            nxt, seen = [], set()
            for node in current:
                for cand in node.iter():
                    if id(cand) not in seen and _matches(cand, part):
                        seen.add(id(cand))
                        nxt.append(cand)
            current = nxt
        return current

    def select_first(self, selector: str):
        found = self.select(selector)
        return found[0] if found else None


_SIMPLE_RE = re.compile(
    r"([a-zA-Z][\w-]*|\*)?((?:[.#][\w-]+|\[[^\]]+\])*)$"
)
_PIECE_RE = re.compile(r"[.#][\w-]+|\[[^\]]+\]")


def _parse_simple(part: str):
    m = _SIMPLE_RE.match(part)
    if not m:
        raise ValueError(f"unsupported selector: {part!r}")
    tag = m.group(1)
    classes, node_id, attrs = [], None, []
    for piece in _PIECE_RE.findall(m.group(2) or ""):
        if piece.startswith("."):
            classes.append(piece[1:])
        elif piece.startswith("#"):
            node_id = piece[1:]
        else:  # [attr] or [attr=value]
            inner = piece[1:-1]
            if "=" in inner:
                k, v = inner.split("=", 1)
                attrs.append((k, v.strip("'\"")))
            else:
                attrs.append((inner, None))
    return (None if tag in (None, "*") else tag.lower(), classes, node_id,
            attrs)


def _matches(node: Node, part) -> bool:
    tag, classes, node_id, attrs = part
    if tag and node.tag != tag:
        return False
    if node_id and node.attrs.get("id") != node_id:
        return False
    if classes and not set(classes) <= node.classes:
        return False
    for k, v in attrs:
        if k not in node.attrs:
            return False
        if v is not None and node.attrs.get(k) != v:
            return False
    return True


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("__root__")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        # Loop: '<tr><td>a<tr>' must close BOTH the td and the still-open
        # tr, or the new row nests inside the previous one (legacy
        # close-tag-omitting archive layouts).
        while True:
            close_on = _AUTOCLOSE.get(self.stack[-1].tag)
            if close_on and tag in close_on:
                self.stack.pop()
            else:
                break
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        self.stack[-1].children.append(
            Node(tag, dict(attrs), parent=self.stack[-1])
        )

    def handle_endtag(self, tag):
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray close tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(body: str) -> Node:
    """Parse an HTML document into a selectable DOM (lenient)."""
    builder = _TreeBuilder()
    builder.feed(body or "")
    return builder.root


__all__ = ["Node", "parse_html", "unescape"]
