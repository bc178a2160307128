"""Z1 typed serializer: reference-shaped HTML output (pinned goldens,
html.serializer.ts:137-187 tag resolution, :262-304 thead regrouping)
plus the strong meta-mode fixpoint extract(serialize(s), meta) == s."""

import pytest

from html_to_document_spark.core.extract import ExtractOptions, extract_document
from html_to_document_spark.core.serializer import serialize_spans

META = ExtractOptions(with_meta=True)

# (source html, expected serialized html) — reference-shaped, typed
GOLDEN = [
    (
        "<h2>Title</h2><p>Body text</p>",
        "<h2>Title</h2><p>Body text</p>",
    ),
    (
        "<ol><li>one</li><li>two<ul><li>deep</li></ul></li></ol>",
        "<ol><li>one</li><li>two<ul><li>deep</li></ul></li></ol>",
    ),
    (
        "<table><thead><tr><th>h1</th><th>h2</th></tr></thead>"
        "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>",
        "<table><thead><tr><th>h1</th><th>h2</th></tr></thead>"
        "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>",
    ),
    (
        "<table><thead><tr><th>Head</th></tr></thead>"
        "<tbody><tr><td>Body</td></tr></tbody>"
        "<tfoot><tr><td>Foot</td></tr></tfoot></table>",
        "<table><thead><tr><th>Head</th></tr></thead>"
        "<tbody><tr><td>Body</td></tr></tbody>"
        "<tfoot><tr><td>Foot</td></tr></tfoot></table>",
    ),
    (
        '<table><caption style="caption-side: bottom">Cap</caption>'
        "<tr><td>x</td></tr></table>",
        '<table><caption style="caption-side: bottom">Cap</caption>'
        "<tr><td>x</td></tr></table>",
    ),
    (
        '<p>go <a href="/x">here</a></p><img src="media://1" alt="pic"><hr>',
        '<p><a href="/x">go here</a></p><img src="media://1" alt="pic"><hr>',
    ),
    (
        '<section class="page"><p>one</p></section>'
        '<section class="page"><p>two</p></section>',
        '<p>one</p><section class="page-break"></section><p>two</p>',
    ),
    (
        "<blockquote>quoted</blockquote><pre>raw  text</pre>",
        "<blockquote>quoted</blockquote><pre>raw  text</pre>",
    ),
]


@pytest.mark.parametrize("html,expected", GOLDEN, ids=range(len(GOLDEN)))
def test_serializer_reference_shape(html, expected):
    spans = extract_document(html, META)
    assert serialize_spans(spans) == expected


META_FIXPOINT_CASES = [
    "<h1>A</h1><h3>B</h3><p>c d</p>",
    "<ul><li>a</li><li>b<ol><li>c</li><li>d</li></ol></li><li>e</li></ul>",
    "<table><thead><tr><th>h</th></tr></thead><tr><td>a</td><td>b</td></tr>"
    "<tfoot><tr><td>f</td></tr></tfoot></table>",
    "<table><tfoot><tr><td>only-foot</td></tr></tfoot>"
    "<tr><td>mid</td></tr></table>",
    "<table><caption>Top</caption><tr><td>x</td></tr></table>",
    '<table><caption style="caption-side: bottom">Bot</caption>'
    "<tr><td>x</td></tr></table>",
    '<p>line one<br>line two</p><img src="u"><hr>',
    '<div>bare</div><p>with <a href="/h">link</a> text</p>',
    '<section class="page"><p>p1</p></section>'
    '<section class="page"><p>p2</p></section>',
    "<li>stray</li><p></p>",
    "<ol><li>1</li></ol><ul><li>u</li></ul>",  # adjacent different lists
]


@pytest.mark.parametrize("html", META_FIXPOINT_CASES, ids=range(len(META_FIXPOINT_CASES)))
def test_meta_fixpoint(html):
    """extract∘serialize is the identity on meta-bearing spans for
    structured HTML (the typed paths, not just the <pre> carve-out)."""
    spans1 = extract_document(html, META)
    html2 = serialize_spans(spans1)
    spans2 = extract_document(html2, META)
    assert spans2 == spans1, f"serialized: {html2!r}"


def test_non_canonical_falls_back_to_pre():
    spans = [("text", "a  b", None, 0)]  # double space: minify would eat it
    assert serialize_spans(spans) == "<pre>a  b</pre>"
    spans = [("text", " lead", None, 0)]
    assert serialize_spans(spans) == "<pre> lead</pre>"


def test_four_tuple_typed_emission():
    spans = [("text", "plain", None, 0), ("text", "", None, 1),
             ("image", None, "m://1", 2), ("pagebreak", None, None, 3)]
    assert serialize_spans(spans) == (
        '<p>plain</p><hr><img src="m://1">'
        '<section class="page-break"></section>'
    )
