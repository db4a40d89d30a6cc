"""Parity of the fast regex tokenizer vs the stdlib html.parser tree.

``functions/html_select.parse_html`` is a one-shot regex scanner that must
produce the *identical* Node tree to ``parse_html_stdlib`` (the
html.parser-backed oracle) — the golden byte-identity invariant
(BASELINE.json: byte-identical extracted text per url) is pinned against
the stdlib semantics, so the fast path may not diverge on anything the
fuzzer can find.  No Spark needed here: pure Python unit tests.
"""

from __future__ import annotations

import random

import pytest

from no_fasel_scrapers_spark.functions.html_select import (
    parse_html,
    parse_html_stdlib,
)
from no_fasel_scrapers_spark.sources.pagegen import detail_page


def assert_tree_eq(a, b, path="root"):
    if isinstance(a, str) or isinstance(b, str):
        assert a == b, (path, repr(a)[:100], repr(b)[:100])
        return
    assert a.tag == b.tag, (path, a.tag, b.tag)
    assert a.attrs == b.attrs, (path, a.tag, a.attrs, b.attrs)
    assert len(a.children) == len(b.children), (path, a.tag)
    for i, (x, y) in enumerate(zip(a.children, b.children)):
        assert_tree_eq(x, y, f"{path}/{a.tag}[{i}]")


EDGE_CASES = [
    '<div class="a b"><a href="/x">t&amp;x</a><br><img src=y></div>',
    "<ul><li>1<li>2<li>3</ul>",
    "<script>if (a<b && c>d) {}</script><p>after</p>",
    "<style>a > b { color: red }</style>text",
    "<!-- comment --><!DOCTYPE html><?php x ?><p>ok</p>",
    '<div data-x="&lt;tag&gt;" empty="" novalue flag>txt &copy; &#169; &nbsp;</div>',
    "<a href='single'>q</a>",
    "<div/><span>sib</span>",
    "a < b and c > d",
    "<p>unclosed <b>bold",
    '<DIV CLASS="Up"><A HREF="/X">T</A></DIV>',
    '<div  attr = "spaced"   other=unquoted/>',
    "<td></tr></td><p>x</p>",
    "<script>no close",
    '<iframe src="https://h/?x=1&amp;y=2"></iframe>',
    "<div><!-- nested <div> in comment --></div>",
    '<a string-attr="v">«unicode» текст</a>',
    '<div class="a/b" x=1/>y</div>',  # x='1/', NOT self-closing (stdlib quirk)
    "<em>a</em",  # truncated end tag becomes data
    "<div class>c</div>",
    "<SCRIPT>x</SCRIPT>done",
    "<script >x</script>after",
    "<style>s</ style>after",
    "<div a=1 a=2>dup</div>",  # duplicate attr: last wins
    "<br/>",
    "<input type=checkbox checked>",
    "<p>a<>b</p>",
    "<p>&notareal;</p>",
    "<p>&amp</p>",
    "<div a=1/ b=2>mid-slash</div>",
    "<div //>x</div>",
    '<a b="x>y">gt-in-quote</a>',
    "<div / >bad</div>",
    '<span a="1"b=2>glued</span>',
    '<p class="">empty-class</p>',
    "<wbr/>tail",
    '<a href="/x" /><b>z</b>',
    "<p>x</p junk><i>y</i>",  # '</p junk>' closes p (tagname fallback)
    "</>solo",
    "</ >b",
    "<p></p attr=1>t",
    "<div><p>a</div>b</p>c",
    '<b a="x',  # incomplete at EOF → data
    '<b a="x>rest',
    "<!--x>y",  # unterminated comment with '>' → '<!--x>' is data
    "<!--x",
    "<!doctype",
    "<?pi",
    "<p>t<",
    "<p>t< ",
    "<1notag>",
    "<p>&#65;&#x41;&Aacute;</p>",
    "<a href=/x#f?q=1&b=2>l</a>",
    "<table><tr><td>c1<td>c2</tr></table>",
    "<![CDATA[x]]>t",
    "<![CDATA[a>b]]>t",
    "<![if lt IE 9]>x<![endif]>",
    "<![CDATA[unterminated",
    "pre<![CDATA[</p>]]><p>z</p>",
    '<a b="<!-tag><em &amp;<b/>text &x',
    "&#6<!-- c --><div>&x</div>",  # invalid charref unescapes to ''
    "<!--x-- >y<p>z</p>",  # comment closes on '--' + whitespace + '>'
    "<!--a--  >b",
    "<!--x--->y",
    "<!-- -- > -->t",
]


@pytest.mark.parametrize("k", range(len(EDGE_CASES)))
def test_edge_case_parity(k):
    assert_tree_eq(parse_html(EDGE_CASES[k]), parse_html_stdlib(EDGE_CASES[k]))


def test_fixture_page_parity():
    for i in range(60):
        _, html, _ = detail_page(i)
        assert_tree_eq(parse_html(html), parse_html_stdlib(html))


FRAGS = [
    "<div>", "</div>", '<a href="x">', "text ", "&amp;", "<br>",
    "<img src=y>", "<script>", "</script>", "<!-- c -->",
    '<p class="k l">', "</p>", "&#65;", "< ", ">", '"', "'", "<span",
    " attr=1>", "</", "tag>", "<b/>", "&x", "<a b=", '="v">', "<em ",
    "/>", "<!-", "-->", "<?", "<![CDATA[", "]]>", "=", '<a b="',
    "<a b='", "<", "]]", "-", "&#6", "&#x41", "&am", ";", "&#",
    "<sp an>", "</p ", "= ", '"q"', "-- >", "--", " >",
]


@pytest.mark.parametrize("seed", [7, 11, 23, 41])
def test_fuzz_parity(seed):
    rng = random.Random(seed)
    for _ in range(800):
        html = "".join(
            rng.choice(FRAGS) for _ in range(rng.randint(1, 25))
        )
        try:
            ref = parse_html_stdlib(html)
        except Exception:
            continue  # stdlib raises on unknown marked sections; no oracle
        assert_tree_eq(parse_html(html), ref)


def test_root_index_matches_walk():
    """Root-level find/find_all via the tag index == full tree walk."""
    for i in range(20):
        _, html, _ = detail_page(i)
        fast = parse_html(html)
        walk = parse_html_stdlib(html)  # no index → iter_desc path
        for tag, cls in [
            ("div", None),
            ("div", "col-xl-2 col-lg-3 col-md-6"),
            ("i", "fas fa-dot-circle"),
            ("a", None),
            ("nosuch", None),
        ]:
            got = [n.attrs for n in fast.find_all(tag, class_=cls)]
            want = [n.attrs for n in walk.find_all(tag, class_=cls)]
            assert got == want, (tag, cls)
