"""Lockstep gate for the single-pass stream walker (core/stream_extract)
vs the tree-walker specification (core/extract._Walker), mirroring the
minify discipline (_stream_minify vs _parse_tree/_emit).

Every behavior difference between the two strategies is a bug in the
stream walker by definition — the tree path IS the spec the goldens and
the reference fixtures pin.
"""

import random

import pytest

from html_to_document_spark.core.extract import (
    DEFAULT_OPTIONS,
    ExtractOptions,
    _finalize_spans,
    _stream_eligible,
    _tree_spans,
    extract_document,
)
from html_to_document_spark.core.minify import minify_tokens


def tree_extract(html, opts=DEFAULT_OPTIONS):
    """The tree-walker strategy, forced (bypasses the stream router)."""
    spans = _tree_spans(minify_tokens(html), opts, html)
    for hook in opts.after_parse:
        spans = hook(spans)
    return _finalize_spans(spans, opts)


def stream_spans_extract(html, opts=DEFAULT_OPTIONS):
    """The token-list stream driver, forced (the router only uses it
    for <style> documents — keep it pinned on everything)."""
    from html_to_document_spark.core import stream_extract as se
    from html_to_document_spark.core import css as _css

    tokens = minify_tokens(html)
    sheet = _css.Stylesheet()
    se.collect_styles_from_tokens(tokens, sheet)
    spans = se.stream_spans(tokens, opts, sheet)
    for hook in opts.after_parse:
        spans = hook(spans)
    return _finalize_spans(spans, opts)


META_OPTS = ExtractOptions(with_meta=True)
BOILER_OPTS = ExtractOptions(
    boilerplate_max_link_density=0.5, boilerplate_min_text_density=3.0
)
UNDROP_OPTS = ExtractOptions(
    drop_tags=frozenset({"nav", "template"})  # script/style un-dropped
)
OVERRIDE_OPTS = ExtractOptions(
    tag_overrides={"aside": "drop", "q": "paragraph", "dl": "list"}
)
CLASSDROP_OPTS = ExtractOptions(
    drop_class_re=r"sidebar|comment|menu|promo"
)
IMGCRAWL_OPTS = ExtractOptions(img_src_crawl=True, with_meta=True)

ALL_OPTS = [DEFAULT_OPTIONS, META_OPTS, BOILER_OPTS, UNDROP_OPTS,
            OVERRIDE_OPTS, CLASSDROP_OPTS, IMGCRAWL_OPTS]

CASES = [
    # chunking + block boundaries
    "<p>hello <b>world</b></p><div>frag <span>inline</span> text</div>",
    "<h2 id=sec>Title</h2>text tail",
    "<p></p><p> </p><p><span></span></p>",
    # breaks, images, rules
    "a<br>b<br/><img src='m://1' alt='pic'>c<hr>d",
    "<p>x<img src=only></p>",
    # crawl img-src resolution (lazy-load / srcset) — identity unless
    # img_src_crawl is on
    "<img src=ph.gif data-src=real.jpg><img src=a srcset='x 1x, y 2x'>",
    # figure-instance ids in meta (caption pairing): ordinals count in
    # document order, nesting pops correctly, orphan figcaption bare
    "<img src=a><figure><figcaption>c1</figcaption><img src=b></figure>"
    "<figure><img src=c></figure><figcaption>orphan</figcaption>",
    "<figure><div><img src=n1></div><figure><img src=n2></figure>"
    "<img src=n3></figure><img src=out>",
    "<figure/><figure><img src=z></figure>",
    "<p>t<img srcset='a.jpg 480w, b.jpg 960w'>u</p><img data-srcset='m 2x'>",
    # lists: nesting, inlined paragraphs, breaks, empty items
    "<ul><li>one</li><li><p>para</p></li><li>pre<p>mid</p>post</li></ul>",
    "<ol><li>a<ul><li>deep</li></ul>tail</li><li></li></ol>",
    "<ul><li><p>first</p><p>second</p>x</li></ul>",
    "<ul><li>t<div>block</div>after</li><li><p></p></li></ul>",
    "<ul>stray text<li>x</li><div>ignored</div><ul><li>same-depth</li></ul></ul>",
    "<ul><li>a<hr>b</li></ul>",
    # positional prev-is-p: hidden/dropped siblings still occupy their
    # raw index and a hidden <p> still counts as "prev is a p"
    # (ADVICE r3 high: stream counters diverged from _list_item's
    # positional prev[0] == 'p' check)
    "<ul><li>a<p style='display:none'>h</p><p>x</p></li></ul>",
    "<ul><li><p>a</p><p style='display:none'>h</p><p>x</p></li></ul>",
    "<ul><li>a<script>s</script><p>x</p></li></ul>",
    "<ul><li>a<p/>x</li></ul>",
    "<ul><li>a<p/><p>x</p></li></ul>",
    "<ul><li><p>a</p><span style='display:none'>z</span></li></ul>",
    "<ul><li><p>a</p><script>s</script><p>x</p></li></ul>",
    # tables: sections, spans, captions, nesting, ragged rows
    "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>",
    "<table><thead><tr><th>h</th></tr></thead><tbody><tr><td>x</td></tr>"
    "</tbody><tfoot><tr><td>f</td></tr></tfoot></table>",
    "<table><tr><td colspan=2>w</td></tr><tr><td>a</td><td>b</td></tr></table>",
    "<table><tr><td rowspan=2>tall</td><td>r1</td></tr><tr><td>r2</td></tr></table>",
    "<table><caption>cap</caption><tr><td>x</td></tr></table>",
    "<table><caption style='caption-side:bottom'>cap</caption>"
    "<tr><td>x</td></tr></table>",
    "<table><tr><td><table><tr><td>inner</td></tr></table>outer</td></tr></table>",
    "<table><tr><td>a<div>blk</div>b<br>c<img src=i></td></tr></table>",
    "<table><colgroup><col></colgroup><tr><td>x</td></tr></table>",
    "<table><div>ignored</div><tr><td>x</td></tr>loose</table>",
    "<table><thead><div>skip</div><tr><th>h</th></tr></thead></table>",
    # self-closed <tr/>: parse_tokens builds a childless tr node and the
    # tree's _table lands an empty grid row (ADVICE r3 medium: the
    # stream walker silently discarded it)
    "<table><tr/><tr><td>x</td></tr></table>",
    "<table><tbody><tr/></tbody><tr><td>y</td></tr></table>",
    "<table><tr/></table>",
    "<table><thead><tr/><tr><th>h</th></tr></thead></table>",
    "<p>before<table><tr><td>cell</td></tr></table>after</p>",
    "<table><tr><td><ul><li>li-in-cell</li></ul></td></tr></table>",
    # pages and pagebreaks
    "<section class='page'>p1</section><section class='page'>p2</section>",
    "<section class='page'>only</section>",
    "<section class='page-break'></section>tail",
    "<div><section class='page'>in-div</section></div>",
    "<section class='page'>a</section><script>x</script>",
    "<ul><li><section class='page'>pg</section></li></ul>",
    "<section id=plain>not a page</section>",
    # scoped pre-buffer edge trims (r5-cont fuzz): the overall leading
    # lstrip must reach processed text whose first-child flag was
    # consumed by a dropped unmatched close, and the overall trailing
    # rstrip must reach a processed token resolved mid-doc by a text
    # sibling when only root-ignored closes follow it
    "\t</custom-tag>\nz\n<pre> \nz\n<tr><b>\t",
    "</li>\t</nav></tbody></tr> y <colgroup>"
    "<section class='page'></table><pre>",
    "<pre> </em></div></tr></thead>a b</thead> y \t</div>  </script>",
    "<pre></pre>a ",
    "a </div>  ",
    "<pre>a ",
    # drops, hidden, rawtext
    "<p>keep</p><script>var x = '<div>not a div</div>';</script><p>more</p>",
    "<nav><a href=/>home</a></nav>content",
    "<p style='display:none'>gone</p><p>kept</p>",
    "<span style='display: NONE '>gone</span>text",
    "<style>p { display: none }</style><p>hidden</p><div>shown</div>",
    "<style>.x { display: none }</style><p class=x>no</p><p>yes</p>",
    "<p>a</p><style>p{color:red}</style><p>late stylesheet</p>",
    # anchors / hrefs / link density
    "<p><a href='/x'>link one</a> and <a href='/y'>two</a></p>",
    "<div><a href=/>tiny</a></div>",
    # implied closes & malformed input
    "<p>one<p>two<p>three",
    "<ul><li>a<li>b<li>c</ul>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<p>text</div>more</p>end",
    "<b>unclosed <i>nested",
    "<p>para<div>closes p</div>",
    "< 5 is not a tag > but text",
    "x</p>y</div>z",
    "<li>li outside list</li>",
    "<td>cell outside table</td>",
    "<tr><td>row outside</td></tr>",
    # entities
    "<p>a &amp; b &lt;tag&gt; &#65;</p>",
    "<p title='a&amp;b'>attr entity</p>",
    # pre interaction (minify post-pass)
    "<pre>  raw\n  space  </pre><p>  collapsed  text </p>",
    "<pre><code>x = 1</code></pre>",
    # custom/unknown elements
    "<custom-el>inline by default</custom-el><p>after</p>",
    # degenerate "<<tag ...>" tokens: the tokenizer lumps them into one
    # open token with tag '' — parse_tokens still parses the attrs, so
    # a style there must reach the hidden() check in every strategy
    # (r4 extended fuzz: the stream classifier gated attr parsing on a
    # non-empty tag and kept a subtree the tree drops)
    "<<ol style='display:none'>x y  z\nline\ntail ",
    "<<div class=page>inside",
    "<<b>text</b>after",
    # EMPTY rawtext element inside a caption (minify's pop-on-any-close
    # renames </tbody> to </script>): with script un-dropped, the empty
    # content must NOT leave a '' in the flatten parts — a later block
    # sibling would see a truthy parts list and emit a spurious newline
    # caption (found by the 60k extended fuzz, round 3)
    "<table><caption><script></tbody><tr></caption></table>",
    "<table><caption><script></script><div>x</div></caption>"
    "<tr><td>c</td></tr></table>",
    # headings h1-h6 + ids
    "".join(f"<h{i} id=h{i}>H{i}</h{i}>" for i in range(1, 7)),
    # empty / degenerate
    "", "   ", "<div></div>", "plain text only",
    # readability-style class/id pruning (drop_class_re opts arm):
    # class hit, id hit, case-insensitive hit, nested survivor text,
    # list/table context, and a classless control
    '<div class="sidebar">junk</div><p>keep</p>',
    '<div id="comment-area"><p>spam</p><ul><li>x</li></ul></div>tail',
    '<p class="MENU-bar">hidden</p><p class="content">shown</p>',
    '<ul><li class="promo">ad</li><li>real</li></ul>',
    '<table><tr><td class="sidebar">a</td><td>b</td></tr></table>',
    '<span class="promotion">inline hit</span> outside',
]


@pytest.mark.parametrize("opts", ALL_OPTS, ids=[
    "default", "meta", "boilerplate", "undrop", "overrides", "classdrop",
    "imgcrawl"])
def test_stream_matches_tree_on_cases(opts):
    for html in CASES:
        expected = tree_extract(html, opts)
        assert extract_document(html, opts) == expected, html
        assert stream_spans_extract(html, opts) == expected, html


def test_stream_path_is_actually_taken():
    """Guard against silently routing everything to the tree path."""
    assert _stream_eligible(DEFAULT_OPTIONS)
    assert _stream_eligible(META_OPTS)
    assert not _stream_eligible(ExtractOptions(minify=False))
    assert not _stream_eligible(
        ExtractOptions(on_document=(lambda nodes: nodes,))
    )
    assert not _stream_eligible(
        ExtractOptions(tag_overrides={"x-y": lambda w, n: None})
    )


def test_stream_fallback_on_exotic_rawtext_override():
    """script overridden to a block kind routes through the tree spec
    mid-stream and still returns the tree answer."""
    opts = ExtractOptions(tag_overrides={"script": "paragraph"})
    html = "<p>a</p><script>code here</script><p>b</p>"
    assert extract_document(html, opts) == tree_extract(html, opts)


PIECES = [
    "<div>", "</div>", "<p>", "</p>", "<span>", "</span>", "<b>", "</b>",
    "<ul>", "</ul>", "<ol>", "</ol>", "<li>", "</li>",
    "<table>", "</table>", "<thead>", "</thead>", "<tbody>", "</tbody>",
    "<tfoot>", "</tfoot>", "<tr>", "</tr>", "<td>", "</td>",
    "<th>", "</th>", "<caption>", "</caption>",
    "<td colspan=2>", "<td rowspan=2>", "<colgroup>", "</colgroup>",
    "<section class='page'>", "<section class='page-break'>",
    "<section>", "</section>",
    "<h2>", "</h2>", "<h2 id=z>", "<blockquote>", "</blockquote>",
    "<a href='/l'>", "</a>", "<em>", "</em>",
    "<pre>", "</pre>", "<code>", "</code>",
    "<script>", "</script>", "<style>", "</style>", "<nav>", "</nav>",
    "<br>", "<hr>", "<img src='m'>", "<img src='m' alt='a'>", "<wbr>",
    "<p style='display:none'>", "<span style='display:none'>",
    "<custom-tag>", "</custom-tag>", "<input>", "<p/>", "<li/>", "<td/>",
    "<div class='sidebar'>", "<li class=promo>", "<td id=comment-x>",
    "<span class='menu'>",
    "<caption/>",
    "x", " y ", "  ", "a b", "\nz\n", "t&amp;u", "w",
]


@pytest.mark.parametrize("opts", ALL_OPTS, ids=[
    "default", "meta", "boilerplate", "undrop", "overrides", "classdrop",
    "imgcrawl"])
def test_stream_matches_tree_fuzz(opts):
    """Differential fuzz: random tag soup (unbalanced, nested, hostile)
    must extract identically through both strategies."""
    rng = random.Random(0xBEEF01)
    for _ in range(4000):
        html = "".join(
            rng.choice(PIECES) for _ in range(rng.randint(1, 20))
        )
        expected = tree_extract(html, opts)
        assert extract_document(html, opts) == expected, html
        assert stream_spans_extract(html, opts) == expected, html


def test_stream_matches_tree_fuzz_structured():
    """Deep-nesting fuzz biased toward well-formed structures (lists in
    lists, tables in cells, pages in divs) where the stream walker's
    frame bookkeeping is most at risk."""
    rng = random.Random(0xBEEF02)

    def gen(depth):
        roll = rng.random()
        if depth > 4 or roll < 0.25:
            return rng.choice(["txt", " s ", "a&lt;b", "<br>",
                               "<img src=i>", "<hr>"])
        inner = "".join(gen(depth + 1) for _ in range(rng.randint(0, 4)))
        shape = rng.randrange(8)
        if shape == 0:
            return f"<div>{inner}</div>"
        if shape == 1:
            return f"<p>{inner}</p>"
        if shape == 2:
            items = "".join(
                f"<li>{gen(depth + 1)}</li>"
                for _ in range(rng.randint(1, 3))
            )
            return f"<{rng.choice(('ul', 'ol'))}>{items}</ul>"
        if shape == 3:
            rows = "".join(
                "<tr>" + "".join(
                    f"<td>{gen(depth + 1)}</td>"
                    for _ in range(rng.randint(1, 3))
                ) + "</tr>"
                for _ in range(rng.randint(1, 3))
            )
            cap = "<caption>c</caption>" if rng.random() < 0.3 else ""
            return f"<table>{cap}{rows}</table>"
        if shape == 4:
            return f"<section class='page'>{inner}</section>"
        if shape == 5:
            return f"<span>{inner}</span>"
        if shape == 6:
            return f"<a href='/x'>{inner}</a>"
        return f"<blockquote>{inner}</blockquote>"

    for _ in range(1500):
        html = "".join(gen(0) for _ in range(rng.randint(1, 5)))
        for opts in (DEFAULT_OPTIONS, META_OPTS):
            assert extract_document(html, opts) == tree_extract(html, opts), html


def test_shared_kind_map_is_capped():
    """Unknown tags memoize as 'inline' into the process-global default
    kind map — adversarial junk tags ('<3 w>' tokenizes to tag '3')
    must not grow it without bound (ADVICE r3 low)."""
    from html_to_document_spark.core import stream_extract as se

    before = dict(se._SHARED_DEFAULT_MAP)
    try:
        # fill way past the cap with unique junk tags
        for i in range(se._KIND_MAP_MAX_SIZE + 500):
            html = f"<junk{i} w>x</junk{i}>"
            assert extract_document(html) == tree_extract(html), html
        assert len(se._SHARED_DEFAULT_MAP) <= se._KIND_MAP_MAX_SIZE
        # over-cap unknown tags still classify correctly, just uncached
        html = "<totally-novel-tag>y</totally-novel-tag>"
        assert extract_document(html) == tree_extract(html)
    finally:
        se._SHARED_DEFAULT_MAP.clear()
        se._SHARED_DEFAULT_MAP.update(before)


def test_resolve_img_src_rules():
    from html_to_document_spark.core.extract import resolve_img_src as r

    assert r(None) is None and r(None, crawl=True) is None
    assert r({"src": "a"}) == "a"
    # crawl=False ignores everything but src (reference parity)
    assert r({"src": "a", "data-src": "b"}) == "a"
    # lazy-load priority order, trimmed
    assert r({"src": "a", "data-src": " b "}, crawl=True) == "b"
    assert r({"data-lazy-src": "c", "src": "a"}, crawl=True) == "c"
    assert r({"data-original": "d"}, crawl=True) == "d"
    assert r({"data-src": "", "src": "a"}, crawl=True) == "a"
    # srcset: largest w wins over any x; x breaks w-less ties
    assert r(
        {"src": "s", "srcset": "a.jpg 480w, b.jpg 960w, c.jpg 2x"},
        crawl=True,
    ) == "b.jpg"
    assert r({"srcset": "x 1x, y 2x"}, crawl=True) == "y"
    # descriptor-less candidates: first wins (key ties at (0,0))
    assert r({"srcset": "p, q"}, crawl=True) == "p"
    # malformed descriptors are ignored, not fatal
    assert r({"srcset": "a 12qw, b 7w"}, crawl=True) == "b"
    # empty/whitespace-only entries skipped; all-empty falls to src
    assert r({"srcset": " , ", "src": "s"}, crawl=True) == "s"
    # data-srcset honored when srcset is absent
    assert r({"data-srcset": "m 100w, n 300w"}, crawl=True) == "n"
