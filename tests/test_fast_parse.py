"""Differential harness for the fast HTML tag scanner (layout.py).

The fast path must be byte-identical to the stdlib html.parser route
on EVERYTHING: every corpus document (where it must also actually take
the fast path — that's the perf claim), every golden doc, and
hypothesis-fuzzed HTML designed to hit the subset boundaries (where
bailing to the stdlib parser is fine, divergence is not).
"""

import pytest

from pdfextract_ray.kernel.layout import (_BlockCollector, _fast_feed,
                                          parse_blocks, tokenize)


def _stdlib_blocks(html: str) -> _BlockCollector:
    c = _BlockCollector()
    c.feed(html)
    c.close()
    return c


def _snap(c: _BlockCollector):
    return (c.body_blocks, c.header_blocks, c.footer_blocks, c.columns)


def _assert_equal(html: str):
    assert _snap(parse_blocks(html)) == _snap(_stdlib_blocks(html)), repr(html)


def test_corpus_docs_fast_path_and_parity(tiny_corpus):
    bails = 0
    for h in tiny_corpus["html"].to_pylist():
        html = bytes(h).decode("utf-8", errors="replace")
        c = _BlockCollector()
        if not _fast_feed(html, c):
            bails += 1
        _assert_equal(html)
    assert bails == 0, f"{bails}/48 corpus docs bailed to the stdlib parser"


def test_corpus_tokens_identical(tiny_corpus):
    # end-to-end: the glyph stream, not just blocks
    import pdfextract_ray.kernel.layout as L
    for h in tiny_corpus["html"].to_pylist()[:12]:
        html = bytes(h).decode("utf-8", errors="replace")
        fast = tokenize(html)
        # force the stdlib route by monkeypatching the fast feed off
        orig = L._fast_feed
        L._fast_feed = lambda *_: False
        try:
            slow = tokenize(html)
        finally:
            L._fast_feed = orig
        assert fast == slow


EDGE_CASES = [
    "",
    "plain text only",
    "<p>a</p>",
    "<p>a &amp; b &lt;c&gt; &#65; &#x41; &unknown; &amp</p>",
    "a < b and c > d",
    "<p>x<",                          # trailing lone <
    "<",
    "<p",                             # unterminated tag
    "<p class='single'>q</p>",        # single-quoted attr -> stdlib
    "<p class=bare>q</p>",            # unquoted attr -> stdlib
    "<!-- comment --><p>a</p>",       # comment -> stdlib
    "<!DOCTYPE html><p>a</p>",        # declaration -> stdlib
    "<?pi data?><p>a</p>",            # PI -> stdlib
    "<![CDATA[x]]><p>a</p>",          # marked section -> stdlib
    "<my-widget>x</my-widget>",       # nonsubset tag name -> stdlib
    "<p/>self<br/>closed",
    "<script>var a = '<p>not a block</p>';</script><p>real</p>",
    "<script>unterminated...",
    "<style>body{}</style><p>s</p>",
    "<script>a</style>b</script><p>after</p>",  # wrong closer inside cdata
    "<SCRIPT>X</SCRIPT><p>u</p>",
    "<header>site</header><footer>foot</footer><p>body</p>",
    "<body data-columns=\"3\"><p>cols</p></body>",
    "<body data-columns=\"x\"><p>bad cols</p></body>",
    "<h1 class=\"a b\">T</h1><p class=\"hang\">r</p>",
    "<p hidden>valueless attr</p>",
    "<p CLASS=\"Upper\">case</p>",
    "<P>upper tag</P>",
    "</>",
    "</ p>",
    "</p extra=\"x\">tail</p>",
    "<p>&#1114112; out of range</p>",
    "text<p>im</p>plicit",
    "<div><div>nested</div></div>",
    "<td>cell</td><th>head</th><caption>cap</caption>",
    "<pre>  spaced  text  </pre>",
    "<p>é unicode 　 text</p>",
]


@pytest.mark.parametrize("html", EDGE_CASES)
def test_edge_cases_parity(html):
    _assert_equal(html)


def test_hypothesis_fuzz_parity():
    from hypothesis import given, settings as hsettings, strategies as st

    piece = st.one_of(
        st.sampled_from([
            "<p>", "</p>", "<h1>", "</h1>", "<li ", "class=\"a\">",
            "class='a'>", "<script>", "</script>", "<style>", "</style>",
            "<header>", "</header>", "<!--", "-->", "<!", ">", "<", "&",
            "&amp;", "&#65;", "&bogus", ";", "/>", "</", "<body "
            "data-columns=\"2\">", "text words here", " ", "\n", "\"",
            "'", "=", "<p", "<di", "eé", "</P >",
        ]),
        st.text(max_size=8))
    doc = st.lists(piece, max_size=24).map("".join)

    @hsettings(max_examples=300, deadline=None)
    @given(doc)
    def check(html):
        _assert_equal(html)

    check()


MALFORMED_DECLS = ["<![0", "<![CDATA[x", "<!0>after", "<![",
                   "<![x]>tail", "<!>", "<p>a</p><![0<p>b</p>",
                   "<![ ]]>", "<!-x->", "x<![y"]


@pytest.mark.parametrize("html", MALFORMED_DECLS)
def test_malformed_declarations_never_raise(html):
    """CPython's _markupbase raises bare AssertionError on malformed
    marked sections ('<![0' — found by the fuzz above); the collector
    recovers like a browser's bogus-comment rule (skip to '>'), so NO
    byte input crashes the kernel. Parity still holds: the fast path
    bails every '<!' to the same recovering parser."""
    _assert_equal(html)  # must not raise, and both routes agree


def test_malformed_declaration_end_to_end():
    from pdfextract_ray.kernel import run_document
    r = run_document(b"<p>before</p><![0<p>after</p>")
    assert "before" in r.text and "after" in r.text
    r2 = run_document(b"<![0")
    assert r2.text == ""
