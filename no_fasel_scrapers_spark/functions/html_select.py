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

import re
from html import unescape
from html.parser import HTMLParser

from no_fasel_scrapers_spark.functions.charset import decode_html

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    """One element (or the document root). Text children are plain ``str``."""

    __slots__ = ("tag", "attrs", "children", "parent", "_index")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        # document root only: tag -> nodes in document order (creation
        # order), so root-level find/find_all skip the tree walk
        self._index: dict[str, list[Node]] | None = None

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
        if self._index is not None and tag is not None:
            pool = self._index.get(tag, ())
            return [n for n in pool if n._matches(tag, class_, id, string)]
        return [
            n
            for n in self.iter_desc()
            if n._matches(tag, class_, id, string)
        ]

    def find(self, tag=None, class_=None, id=None, string=None, attrs=None):
        if attrs:
            class_ = attrs.get("class", class_)
            id = attrs.get("id", id)
        if self._index is not None and tag is not None:
            for n in self._index.get(tag, ()):
                if n._matches(tag, class_, id, string):
                    return n
            return None
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


def parse_html_stdlib(html: bytes | str) -> Node:
    """Reference tree builder on stdlib ``html.parser`` (the semantics oracle
    for the fast tokenizer below; kept for the parity tests)."""
    if isinstance(html, (bytes, bytearray)):
        html = decode_html(html)
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# Fast tokenizer — same tree as parse_html_stdlib, ~3x the throughput.
#
# html.parser spends most of its time in goahead()'s incremental-feed
# bookkeeping (updatepos, multi-regex probing per tag) that a one-shot,
# whole-document scanner doesn't need.  Parsing is the single Python-side
# cost center of the engine (SURVEY.md §7.3), so this is the hot loop.
# Parity with the stdlib tree is pinned by tests/test_canonical.py's
# corpus comparison and the golden byte-identity suite.
# ---------------------------------------------------------------------------

# tag name per html.parser's tagfind_tolerant
_STARTTAG = re.compile(r"<([a-zA-Z][^\t\n\r\f />\x00]*)")
# fast path for well-formed simple tags — one match replaces the
# locatestarttagend probe + per-attribute loop.  Restricted to inputs
# where the tolerant grammar provably produces the same result: plain
# names, double-quoted values without '&' (no unescape), optional '/>'
_SIMPLE_TAG = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9-]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*(?:=\"[^\"&]*\")?)*)"
    r"\s*(/?)>"
)
_SIMPLE_ATTR = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:=\"([^\"]*)\")?"
)
# html.parser's endtagfind (strict) and tagfind_tolerant (fallback name)
_ENDTAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_TAGNAME = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)")
# html.parser's locatestarttagend_tolerant, verbatim: where the start tag's
# attribute grammar stops; check_for_whole_start_tag's dispatch on the next
# char decides tag end vs incomplete vs data fallback
_LOCATE = re.compile(
    r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
        )
        (?:\s*,)*                    # possibly followed by a comma
      )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""",
    re.VERBOSE,
)
# html.parser's attrfind_tolerant, verbatim (matched at absolute positions
# so the delimiter lookbehind sees the preceding separator)
_ATTR = re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_ATTR_LEAD = re.compile(r"(?:\s|/(?!>))*")
_INCOMPLETE_NEXT = frozenset(
    "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)
# _markupbase comment close: '--' + optional whitespace + '>' (NOT just the
# literal '-->'), so '<!--x-- >' closes exactly like stdlib
_COMMENT_CLOSE = re.compile(r"--\s*>")
# _markupbase marked-section grammar: <![cdata[...]]> / <![if ...]>
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MS_CLOSE = re.compile(r"]\s*]\s*>")
_MS_IF_CLOSE = re.compile(r"]\s*>")
_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE)
    for t in ("script", "style")
}


def _parse_attrs(
    s: str, pos: int, endpos: int
) -> tuple[dict[str, str | None], str]:
    """Parse attributes of the start tag spanning s[pos:endpos] (pos = just
    after the tag name, endpos = just after the closing '>').  Returns
    (attrs, end): end '>' = plain tag, '/>' = self-closing, anything else =
    malformed (html.parser emits the whole tag as data)."""
    attrs: dict[str, str | None] = {}
    pos = _ATTR_LEAD.match(s, pos).end()
    while pos < endpos:
        m = _ATTR.match(s, pos)
        if m is None:
            break
        name = m.group(1).lower()
        v = m.group(3)
        if v is None:
            val = None
        else:
            if v[:1] in "\"'" and len(v) >= 2 and v[-1:] == v[:1]:
                v = v[1:-1]
            val = unescape(v) if "&" in v else v
        attrs[name] = val  # duplicate attr: last one wins, like dict(list)
        pos = m.end()
    return attrs, s[pos:endpos].strip()


def parse_html(html: bytes | str) -> Node:
    """Parse an HTML document into a tree.  Bytes pass the charset
    sniffing ladder first (functions/charset.py: BOM → ≤1024-byte meta
    prescan → utf-8 default, errors='replace') — every extractor and the
    crawl oracle inherit legacy-encoding support from this one line."""
    if isinstance(html, (bytes, bytearray)):
        s = decode_html(html)
    else:
        s = html
    root = Node("[document]", {}, None)
    index: dict[str, list[Node]] = {}
    root._index = index
    cur = root
    i, n = 0, len(s)
    find = s.find

    def emit_text(t: str) -> None:
        if t and "&" in t:
            t = unescape(t)  # can strip invalid charrefs down to ''
        if not t:
            return
        kids = cur.children
        if kids and isinstance(kids[-1], str):
            kids[-1] += t
        else:
            kids.append(t)

    def _incomplete_fallback(pos: int) -> int:
        # html.parser goahead: an incomplete construct at EOF is emitted as
        # data up to (and including) the next '>', else up to the next '<'
        # (or one char), then scanning resumes
        gt = find(">", pos + 1)
        if gt >= 0:
            k = gt + 1
        else:
            nxt = find("<", pos + 1)
            k = nxt if nxt >= 0 else pos + 1
        emit_text(s[pos:k])
        return k

    def _close(tag: str) -> None:
        nonlocal cur
        node = cur
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            cur = node.parent

    while i < n:
        lt = find("<", i)
        if lt < 0:
            emit_text(s[i:])
            break
        if lt > i:
            emit_text(s[i:lt])
        c = s[lt + 1 : lt + 2]
        if c == "!":
            if s.startswith("<!--", lt):
                cm = _COMMENT_CLOSE.search(s, lt + 4)
                if cm is not None:
                    i = cm.end()
                    continue
            elif s.startswith("<![", lt):
                nm = _DECLNAME.match(s, lt + 3)
                name = nm.group().strip().lower() if nm else None
                if name in ("temp", "cdata", "ignore", "include", "rcdata"):
                    cm = _MS_CLOSE.search(s, lt + 3)
                elif name in ("if", "else", "endif"):
                    cm = _MS_IF_CLOSE.search(s, lt + 3)
                else:  # stdlib raises here; be lenient, swallow to '>'
                    cm = None
                if cm is not None:
                    i = cm.end()
                    continue
                # unterminated marked section → same data fallback as below
            else:  # <!doctype ...>, bogus declarations: swallow to '>'
                end = find(">", lt + 2)
                if end >= 0:
                    i = end + 1
                    continue
            # unterminated comment/declaration/marked section: html.parser
            # emits '<!--x>'-style chunks as data
            i = _incomplete_fallback(lt)
        elif c == "?":
            end = find(">", lt + 2)
            i = end + 1 if end >= 0 else _incomplete_fallback(lt)
        elif c == "/":
            m = _ENDTAG.match(s, lt)
            if m is not None:
                _close(m.group(1).lower())
                i = m.end()
                continue
            gt = find(">", lt + 1)
            if gt < 0:
                i = _incomplete_fallback(lt)
                continue
            nm = _TAGNAME.match(s, lt + 2)
            if nm is not None:
                # '</tag junk>': html.parser closes the tag, skips to '>'
                _close(nm.group(1).lower())
                gt2 = find(">", nm.end())
                i = n if gt2 < 0 else gt2 + 1
            elif s.startswith("</>", lt):
                i = lt + 3
            else:  # bogus comment, swallowed to '>'
                i = gt + 1
        elif c and (("a" <= c <= "z") or ("A" <= c <= "Z")):
            sm = _SIMPLE_TAG.match(s, lt)
            if sm is not None:  # well-formed simple tag: one-regex path
                tag = sm.group(1).lower()
                attrs = {}
                if sm.group(2):
                    for am in _SIMPLE_ATTR.finditer(sm.group(2)):
                        attrs[am.group(1).lower()] = am.group(2)
                self_closing = sm.group(3) == "/"
                node = Node(tag, attrs, cur)
                cur.children.append(node)
                if tag in index:
                    index[tag].append(node)
                else:
                    index[tag] = [node]
                i = sm.end()
                if self_closing or tag in _VOID:
                    pass
                elif tag in _CDATA_CLOSE:
                    cm = _CDATA_CLOSE[tag].search(s, i)
                    if cm is None:
                        break
                    if cm.start() > i:
                        node.children.append(s[i : cm.start()])
                    i = cm.end()
                else:
                    cur = node
                continue
            m = _STARTTAG.match(s, lt)
            # check_for_whole_start_tag: dispatch on the char where the
            # attribute grammar stops
            j = _LOCATE.match(s, lt).end()
            nc = s[j : j + 1]
            if nc == ">":
                endpos = j + 1
            elif nc == "/" and s.startswith("/>", j):
                endpos = j + 2
            elif nc == "" or nc == "/" or nc in _INCOMPLETE_NEXT:
                i = _incomplete_fallback(lt)  # incomplete tag at EOF → data
                continue
            else:
                endpos = j  # grammar stopped mid-tag → data fallback below
            tag = m.group(1).lower()
            attrs, end = _parse_attrs(s, m.end(), endpos)
            if end not in (">", "/>"):
                # malformed start tag: html.parser's tolerant fallback emits
                # the whole tag as data, charrefs NOT converted
                kids = cur.children
                chunk = s[lt:endpos]
                if kids and isinstance(kids[-1], str):
                    kids[-1] += chunk
                else:
                    kids.append(chunk)
                i = endpos
                continue
            self_closing = end == "/>"
            node = Node(tag, attrs, cur)
            cur.children.append(node)
            if tag in index:
                index[tag].append(node)
            else:
                index[tag] = [node]
            i = endpos
            if self_closing or tag in _VOID:
                pass
            elif tag in _CDATA_CLOSE:  # raw-text elements, no charref decode
                cm = _CDATA_CLOSE[tag].search(s, i)
                if cm is None:  # unterminated: html.parser drops the data
                    break
                if cm.start() > i:
                    node.children.append(s[i : cm.start()])
                i = cm.end()
            else:
                cur = node
        else:  # lone '<' — data, like html.parser's tolerant mode
            emit_text("<")
            i = lt + 1
    return root
