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

    __slots__ = ("tag", "attrs", "children", "parent", "type_index", "tag_counts")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        # per-parent same-tag counter keeps :nth-of-type O(1) per insert
        # (counting siblings on every insert was O(n²) in sibling count)
        self.tag_counts: dict[str, int] = {}
        # 1-based index among same-tag element siblings (:nth-of-type)
        self.type_index = 1
        if parent is not None:
            n = parent.tag_counts.get(tag, 0) + 1
            parent.tag_counts[tag] = n
            self.type_index = n
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


def parse_html_stdlib(text: str) -> Node:
    """html.parser-backed tree build — the reference semantics for the
    fast tokenizer below (tests/test_html_parse.py cross-checks the two
    over the full 10-site corpus)."""
    tb = _TreeBuilder()
    tb.feed(text)
    tb.close()
    return tb.root


_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>"
)
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-\w:.]*)(?:\s*=\s*(\"([^\"]*)\"|'([^']*)'|[^\s>]*))?"
)
_RAWTEXT_CLOSE = {"script": re.compile(r"</script\s*>", re.I),
                  "style": re.compile(r"</style\s*>", re.I)}
# html.parser folds a trailing '/' into an UNQUOTED attribute value
# ('<a href=/foo/>' → value '/foo/', open tag — not self-closing): the
# tag text ends in value context iff its last attr is '=' + optional
# whitespace + an unquoted value with no trailing whitespace (round-3
# ADVICE divergence; '<a href= />' is href='/' too, html.parser allows
# whitespace after '=').
_UNQUOTED_VAL_TAIL = re.compile(r"=\s*[^\s>'\"]*$")


def parse_html(text: str) -> Node:
    """Single-pass regex tokenizer (~2× html.parser, which spends the
    page budget in pure-Python ``goahead``/``parse_starttag``). Produces
    the same tree as ``parse_html_stdlib`` for the constructs the corpus
    and selector engine use: elements with double/single/bare attributes,
    void + self-closing tags, li/p/option self-nesting recovery, stray
    ``<`` as data, comments, doctype/PI skip, script/style raw text, and
    charref unescaping in data and attribute values."""
    from html import unescape

    root = Node("#document", {}, None)
    stack = [root]
    pos, n = 0, len(text)
    find = text.find
    closers = _TreeBuilder.SELF_NESTING_CLOSERS
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            chunk = text[pos:]
            stack[-1].children.append(unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > pos:
            chunk = text[pos:lt]
            stack[-1].children.append(unescape(chunk) if "&" in chunk else chunk)
        head = text[lt + 1: lt + 2]
        if head == "!":
            if text.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end < 0 else end + 3
            else:  # doctype / bogus declaration
                end = find(">", lt)
                pos = n if end < 0 else end + 1
            continue
        if head == "?":
            end = find(">", lt)
            pos = n if end < 0 else end + 1
            continue
        m = _TAG_RE.match(text, lt)
        if m is None:  # stray '<' is data (html.parser leniency)
            stack[-1].children.append("<")
            pos = lt + 1
            continue
        closing, tag, attrtext, selfclose = m.groups()
        tag = tag.lower()
        pos = m.end()
        if selfclose and attrtext and _UNQUOTED_VAL_TAIL.search(attrtext):
            attrtext += "/"  # the '/' belongs to the unquoted value
            selfclose = ""
        if closing:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        attrs: dict[str, str | None] = {}
        if attrtext:
            for am in _ATTR_RE.finditer(attrtext):
                if not am.group(1):
                    continue
                if am.group(3) is not None:
                    val: str | None = am.group(3)
                elif am.group(4) is not None:
                    val = am.group(4)
                elif am.group(2) is not None:
                    # 'attr=' with an empty value is '' (html.parser), not
                    # None — None means the '=' itself was absent
                    val = am.group(2)
                else:
                    val = None
                if val is not None and "&" in val:
                    val = unescape(val)
                attrs[am.group(1).lower()] = val
        tag_closers = closers.get(tag)
        if tag_closers and stack[-1].tag in tag_closers:
            stack.pop()
        node = Node(tag, attrs, stack[-1])
        if selfclose or tag in VOID_TAGS:
            continue
        rawtext = _RAWTEXT_CLOSE.get(tag)
        if rawtext is not None:
            mm = rawtext.search(text, pos)
            end = mm.start() if mm else n
            if end > pos:
                node.children.append(text[pos:end])
            pos = mm.end() if mm else n
            continue
        stack.append(node)
    return root


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
        if len(chain) == 1:
            return True
        i = len(chain) - 2
        anc = node.parent
        while i >= 0 and anc is not None:
            if chain[i].matches(anc):
                i -= 1
            anc = anc.parent
        return i < 0

    def select(self, root: Node) -> list[Node]:
        out: list[Node] = []
        chains = self.chains
        single = chains[0] if len(chains) == 1 else None
        cm = self._chain_matches

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, Node):
                    if (cm(single, c) if single is not None
                            else any(cm(ch, c) for ch in chains)):
                        out.append(c)
                    walk(c)

        walk(root)
        return out

    def select_first(self, root: Node) -> Node | None:
        """First match in document order, abandoning the walk at the hit —
        field fallback chains call this thousands of times per page."""
        chains = self.chains
        single = chains[0] if len(chains) == 1 else None
        cm = self._chain_matches

        def walk(n: Node) -> Node | None:
            for c in n.children:
                if isinstance(c, Node):
                    if (cm(single, c) if single is not None
                            else any(cm(ch, c) for ch in chains)):
                        return c
                    r = walk(c)
                    if r is not None:
                        return r
            return None

        return walk(root)


_SEL_CACHE: dict[str, Selector] = {}


def select(root: Node, selector: str) -> list[Node]:
    sel = _SEL_CACHE.get(selector)
    if sel is None:
        sel = _SEL_CACHE[selector] = Selector(selector)
    return sel.select(root)


def select_first(root: Node, selector: str) -> Node | None:
    sel = _SEL_CACHE.get(selector)
    if sel is None:
        sel = _SEL_CACHE[selector] = Selector(selector)
    return sel.select_first(root)
