"""Tiny DOM + CSS-ish selection over stdlib ``html.parser``.

The reference drives BeautifulSoup with a small, fixed set of operations:
``find``/``find_all`` by tag + class/string/id, sibling navigation, ``.text``
and attribute access (e.g. ``Common.py:171,189-214,275-285,310-319``).  This
module implements exactly that subset on an element tree built with
``html.parser`` — zero third-party deps, so it runs inside Arrow-batched
pandas UDFs in this sandbox.  On a real cluster the same extractor call
sites can swap in selectolax/lxml (same find/find_all surface) for ~10x
parse speed; the golden tests pin byte-identical outputs either way.

Parsing is the Python-side cost center of the whole engine: it happens once
per page inside a batch UDF, every downstream field op is a Spark column.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    """One element (or the document root). Text children are plain ``str``."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    # -- attribute access -------------------------------------------------
    def __getitem__(self, key: str) -> str:
        v = self.attrs.get(key)
        if v is None:
            raise KeyError(key)
        return v

    def get(self, key: str, default=None):
        v = self.attrs.get(key)
        return default if v is None else v

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    # -- text -------------------------------------------------------------
    @property
    def text(self) -> str:
        """All descendant text concatenated, BeautifulSoup ``.text`` style."""
        out: list[str] = []
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                out.append(n)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    # -- traversal --------------------------------------------------------
    def iter_desc(self):
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, Node):
                yield n
                stack.extend(reversed(n.children))

    def _matches(self, tag, class_, id_, string) -> bool:
        if tag is not None and self.tag != tag:
            return False
        if class_ is not None:
            # BS4 semantics: a one-token query matches any element whose class
            # list contains it; a multi-token query matches the literal
            # attribute value (our fixtures use literal values).
            if " " in class_:
                if (self.attrs.get("class") or "") != class_:
                    return False
            elif class_ not in self.classes:
                return False
        if id_ is not None and self.attrs.get("id") != id_:
            return False
        if string is not None and self.text != string:
            return False
        return True

    def find_all(self, tag=None, class_=None, id=None, string=None, attrs=None):
        if attrs:
            class_ = attrs.get("class", class_)
            id = attrs.get("id", id)
        return [
            n
            for n in self.iter_desc()
            if n._matches(tag, class_, id, string)
        ]

    def find(self, tag=None, class_=None, id=None, string=None, attrs=None):
        if attrs:
            class_ = attrs.get("class", class_)
            id = attrs.get("id", id)
        for n in self.iter_desc():
            if n._matches(tag, class_, id, string):
                return n
        return None

    # -- siblings ---------------------------------------------------------
    def _element_siblings(self):
        if self.parent is None:
            return [], -1
        sibs = [c for c in self.parent.children if isinstance(c, Node)]
        return sibs, sibs.index(self)

    def find_next_sibling(self, tag=None, class_=None):
        sibs, i = self._element_siblings()
        for n in sibs[i + 1:]:
            if n._matches(tag, class_, None, None):
                return n
        return None

    def find_next_siblings(self, tag=None, class_=None):
        sibs, i = self._element_siblings()
        return [n for n in sibs[i + 1:] if n._matches(tag, class_, None, None)]

    def find_previous_sibling(self, tag=None, class_=None):
        sibs, i = self._element_siblings()
        for n in reversed(sibs[:i]):
            if n._matches(tag, class_, None, None):
                return n
        return None


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # close the nearest open ancestor with this tag (lenient, like bs4)
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if not data:
            return
        # merge adjacent text nodes — html.parser may split a run at char
        # refs even with convert_charrefs=True, and page_text strips per node
        kids = self.cur.children
        if kids and isinstance(kids[-1], str):
            kids[-1] += data
        else:
            kids.append(data)


def parse_html(html: bytes | str) -> Node:
    """Parse an HTML document (bytes are decoded utf-8/replace) into a tree."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root
