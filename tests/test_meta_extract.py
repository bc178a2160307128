"""Metadata-bearing extraction (T7 list levels, T9 tag names, L6
heading levels, L10 hrefs, L12 image alt — SURVEY.md §2)."""

from html_to_document_spark.core.extract import ExtractOptions, extract_document

OPTS = ExtractOptions(with_meta=True)


def spans_of(html):
    return extract_document(html, OPTS)


def test_heading_and_paragraph_meta():
    got = spans_of("<h2>Title</h2><p>Body</p>")
    assert got[0][:4] == ("text", "Title", None, 0)
    assert got[0][4] == {"tag": "h2", "level": "2"}
    assert got[1][4] == {"tag": "p"}


def test_list_levels():
    html = ("<ul><li>a<ul><li>b<ol><li>c</li></ol></li></ul></li>"
            "<li>d</li></ul>")
    got = spans_of(html)
    levels = [(s[1], s[4]["level"]) for s in got]
    assert levels == [("a", "0"), ("b", "1"), ("c", "2"), ("d", "0")]
    assert all(s[4]["tag"] == "li" for s in got)


def test_href_and_image_meta():
    got = spans_of('<p>go <a href="/x">here</a></p>'
                   '<img src="media://1" alt="pic">')
    assert got[0][4] == {"tag": "p", "href": "/x"}
    assert got[1][0] == "image" and got[1][4] == {"tag": "img", "alt": "pic"}


def test_table_caption_hr_meta():
    got = spans_of("<table><caption>C</caption><tr><td>A</td></tr></table><hr>")
    assert [s[4]["tag"] for s in got] == ["caption", "table", "hr"]


def test_meta_off_keeps_four_tuple():
    got = extract_document("<p>x</p>")
    assert got == [("text", "x", None, 0)]


def test_dom_quoted_gt_in_attribute():
    """Tokenizer regression (ADVICE r1): '>' inside a quoted attribute
    value must not truncate the tag and leak attr garbage into text."""
    from html_to_document_spark.core.dom import parse_html

    nodes = parse_html('<p><a title="a>b" href="/x">link</a></p>')
    assert nodes == [
        ["p", None, [["a", {"title": "a>b", "href": "/x"}, [("#text", "link")]]]]
    ]


def test_dom_unterminated_quote_fallback():
    """Malformed (unterminated quote / unquoted apostrophe) tags keep
    the naive '<[^>]+>' tokenization."""
    from html_to_document_spark.core.dom import parse_html

    assert parse_html("<a title=don't>x</a>") == [
        ["a", {"title": "don't"}, [("#text", "x")]]
    ]


def test_custom_drop_tags():
    """Custom drop_tags: removed default drop tags fall back to inline
    (the original dispatch chain's default), added tags drop."""
    from html_to_document_spark.core.extract import (
        DROP_TAGS, ExtractOptions, extract_document,
    )

    # un-drop nav, drop p
    opts = ExtractOptions(drop_tags=frozenset(DROP_TAGS - {"nav"}) | {"em"})
    got = extract_document(
        "<p>a <em>gone</em> b</p><nav>menu</nav>", opts
    )
    # dropping <em> skips the node: the flanking single spaces remain
    assert got == [("text", "a  b", None, 0), ("text", "menu", None, 1)]


def test_text_density_boilerplate():
    """north_star text-density scoring: short many-tag chunks drop."""
    from html_to_document_spark.core.extract import (
        ExtractOptions, extract_document,
    )

    html = ("<div><b>Home</b><b>About</b><b>Contact</b><b>Blog</b></div>"
            "<p>This is a real paragraph of genuine article content with "
            "enough words to stand on its own.</p>")
    plain = extract_document(html)
    assert [s[1] for s in plain] == [
        "HomeAboutContactBlog",
        "This is a real paragraph of genuine article content with enough "
        "words to stand on its own.",
    ]
    dense = extract_document(
        html, ExtractOptions(boilerplate_min_text_density=6.0)
    )
    assert [s[1] for s in dense] == [
        "This is a real paragraph of genuine article content with enough "
        "words to stand on its own.",
    ]
    # long chunks survive regardless of density (min_keep_len guard)
    long_menu = "<div>" + "<b>word </b>" * 30 + "</div>"
    kept = extract_document(
        long_menu, ExtractOptions(boilerplate_min_text_density=6.0)
    )
    assert len(kept) == 1


def test_id_bookmark_meta_roundtrip():
    """L11 bookmark/id: element ids surface in span metadata and
    round-trip through the typed serializer."""
    from html_to_document_spark.core.serializer import serialize_spans

    html = '<h2 id="intro">Title</h2><p id="p1">Body</p><p>plain</p>'
    spans = spans_of(html)
    assert spans[0][4] == {"tag": "h2", "level": "2", "id": "intro"}
    assert spans[1][4] == {"tag": "p", "id": "p1"}
    assert spans[2][4] == {"tag": "p"}
    out = serialize_spans(spans)
    assert out == html
    assert spans_of(out) == spans


def test_li_id_roundtrip():
    from html_to_document_spark.core.serializer import serialize_spans

    html = '<ul><li id="first">a</li><li>b</li></ul>'
    spans = spans_of(html)
    assert spans[0][4]["id"] == "first" and "id" not in spans[1][4]
    out = serialize_spans(spans)
    assert out == html
    assert spans_of(out) == spans
