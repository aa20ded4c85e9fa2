"""Minimal CSS-selector engine over stdlib ``html.parser`` — the P1/P2
extraction substrate (SURVEY §2.2).

The reference extracts fields with BeautifulSoup CSS selectors per site
(``div.section_latest_article ul li`` Naver_Crawler.py:109, ``ul.type2
li`` + ``span.byline em:nth-of-type(3)`` Gukje_Crawler.py:103,60-79,
``find_all('article')`` with div fallbacks Google_Crawler.py:163-166).
No HTML library ships in this sandbox, so this module implements the
selector subset those profiles actually use, from scratch, on top of
``html.parser.HTMLParser``:

* simple selectors: ``tag``, ``.class``, ``#id``, ``[attr]``,
  ``[attr=value]``, ``:nth-of-type(n)`` — combinable
  (``span.byline em:nth-of-type(3)``)
* descendant combinator (space), alternation (comma)
* document-order results, entity unescaping (``convert_charrefs``),
  ``<br>`` → newline in text extraction (Naver_Crawler.py:90-93's
  ``<br>`` → ``\\n`` summary handling)

This is parse-layer Python and therefore runs ONLY inside the Arrow
``mapInPandas`` parse UDFs (the sanctioned UDF slot, SURVEY §2.10) —
never per-row on the driver.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_TAGS = {
    "br", "img", "meta", "link", "input", "hr", "area", "base", "col",
    "embed", "source", "track", "wbr",
}

_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_TRIM = re.compile(r"[ \t]*\n[ \t]*")


class Node:
    """One element. ``children`` holds Nodes and raw text strings."""

    __slots__ = ("tag", "attrs", "children", "parent", "type_index")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        # 1-based index among same-tag element siblings (:nth-of-type)
        self.type_index = 1
        if parent is not None:
            same = sum(1 for c in parent.children if isinstance(c, Node) and c.tag == tag)
            self.type_index = same + 1
            parent.children.append(self)

    # -- text -----------------------------------------------------------
    def raw_text(self) -> str:
        parts: list[str] = []
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag == "br":
                parts.append("\n")
            else:
                parts.append(c.raw_text())
        return "".join(parts)

    def text(self) -> str:
        return norm_text(self.raw_text())

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)


def norm_text(s: str) -> str:
    """Whitespace normalization both the engine and the parity model use:
    collapse space runs, trim around newlines (from ``<br>``), strip."""
    return _NL_TRIM.sub("\n", _WS_RUN.sub(" ", s)).strip()


class _TreeBuilder(HTMLParser):
    SELF_NESTING_CLOSERS = {"li": {"li"}, "p": {"p"}, "option": {"option"}}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        closers = self.SELF_NESTING_CLOSERS.get(tag)
        if closers and self.stack[-1].tag in closers:
            self.stack.pop()
        node = Node(tag, dict(attrs), self.stack[-1])
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        Node(tag, dict(attrs), self.stack[-1])

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray close tag: ignored (lenient, like real-world parsers)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> Node:
    tb = _TreeBuilder()
    tb.feed(text)
    tb.close()
    return tb.root


# ---------------------------------------------------------------- selectors

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attrs>(?:\[[^\]]+\])*)"
    r"(?P<nth>:nth-of-type\(\d+\))?"
)


class _Simple:
    __slots__ = ("tag", "id", "classes", "attrs", "nth")

    def __init__(self, token: str):
        m = _SIMPLE_RE.fullmatch(token)
        if not m or not token:
            raise ValueError(f"unsupported selector token: {token!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.id = m.group("id")[1:] if m.group("id") else None
        self.classes = [c for c in (m.group("classes") or "").split(".") if c]
        self.attrs: list[tuple[str, str | None]] = []
        for am in re.finditer(r"\[([\w:-]+)(?:=\"?([^\]\"]*)\"?)?\]", m.group("attrs") or ""):
            self.attrs.append((am.group(1), am.group(2)))
        self.nth = int(m.group("nth")[len(":nth-of-type("):-1]) if m.group("nth") else None

    def matches(self, node: Node) -> bool:
        if self.tag and node.tag != self.tag:
            return False
        if self.id and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = (node.attrs.get("class") or "").split()
            if any(c not in have for c in self.classes):
                return False
        for name, value in self.attrs:
            got = node.attrs.get(name)
            if got is None or (value is not None and got != value):
                return False
        if self.nth is not None and node.type_index != self.nth:
            return False
        return True


class Selector:
    """Compiled selector list: comma alternation of descendant chains."""

    def __init__(self, selector: str):
        self.chains: list[list[_Simple]] = [
            [_Simple(tok) for tok in alt.split()] for alt in selector.split(",") if alt.strip()
        ]

    def _chain_matches(self, chain: list[_Simple], node: Node) -> bool:
        if not chain[-1].matches(node):
            return False
        i = len(chain) - 2
        anc = node.parent
        while i >= 0 and anc is not None:
            if chain[i].matches(anc):
                i -= 1
            anc = anc.parent
        return i < 0

    def select(self, root: Node) -> list[Node]:
        out: list[Node] = []

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, Node):
                    if any(self._chain_matches(ch, c) for ch in self.chains):
                        out.append(c)
                    walk(c)

        walk(root)
        return out


_SEL_CACHE: dict[str, Selector] = {}


def select(root: Node, selector: str) -> list[Node]:
    sel = _SEL_CACHE.get(selector)
    if sel is None:
        sel = _SEL_CACHE[selector] = Selector(selector)
    return sel.select(root)


def select_first(root: Node, selector: str) -> Node | None:
    hits = select(root, selector)
    return hits[0] if hits else None
