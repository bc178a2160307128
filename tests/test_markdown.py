"""Spans -> Markdown serializer (core/markdown.py)."""

from __future__ import annotations

from html_to_document_spark.core.extract import ExtractOptions, extract_document
from html_to_document_spark.core.markdown import serialize_markdown

OPTS = ExtractOptions(with_meta=True)


def md_of(html: str) -> str:
    return serialize_markdown(extract_document(html, OPTS))


def test_headings_paragraphs_hr():
    got = md_of("<h2>Title here</h2><p>body text</p><hr><h4>sub</h4>")
    assert got == "## Title here\n\nbody text\n\n---\n\n#### sub"


def test_lists_nested_and_ordered():
    got = md_of(
        "<ul><li>a</li><li>b<ul><li>deep</li></ul></li></ul>"
        "<ol><li>one</li><li>two</li></ol>"
    )
    assert got == (
        "- a\n- b\n  - deep\n\n1. one\n1. two"
    )


def test_table_with_thead_and_caption():
    got = md_of(
        "<table><caption>Cap</caption><thead><tr><th>h1</th><th>h2</th>"
        "</tr></thead><tbody><tr><td>a</td><td>b</td></tr></tbody></table>"
    )
    assert got == (
        "*Cap*\n\n"
        "| h1 | h2 |\n"
        "| --- | --- |\n"
        "| a | b |"
    )


def test_table_headerless_promotes_first_row():
    got = md_of("<table><tr><td>a</td><td>b</td></tr>"
                "<tr><td>c</td><td>d</td></tr></table>")
    assert got == "| a | b |\n| --- | --- |\n| c | d |"


def test_image_and_link():
    got = md_of('<p><a href="http://x.example/y">click</a></p>'
                '<img src="pic.png" alt="a pic">')
    assert got == "[click](http://x.example/y)\n\n![a pic](pic.png)"


def test_image_without_alt_or_ref():
    got = serialize_markdown([("image", "", None, 0)])
    assert got == "![]()"


def test_deterministic_and_empty():
    assert serialize_markdown([]) == ""
    spans = extract_document("<h1>t</h1><p>p</p>", OPTS)
    assert serialize_markdown(spans) == serialize_markdown(list(spans))


def test_to_markdown_distributed(spark):
    from html_to_document_spark.operators.extract_spans import (
        extract_spans_from_html,
        to_markdown,
    )

    df = spark.createDataFrame(
        [
            ("d1", "<h2>Ti</h2><ul><li>a</li><li>b</li></ul><p>tail</p>"),
            ("d2", "<p>just text</p>"),
            ("d3", ""),
        ],
        "doc_id string, html string",
    )
    spans = extract_spans_from_html(df, options=OPTS)
    got = {r.doc_id: r.markdown for r in to_markdown(spans).collect()}
    assert got["d1"] == "## Ti\n\n- a\n- b\n\ntail"
    assert got["d2"] == "just text"
    assert got["d3"] == ""
    # parity with the local serializer over the same extraction
    assert got["d1"] == serialize_markdown(extract_document(
        "<h2>Ti</h2><ul><li>a</li><li>b</li></ul><p>tail</p>", OPTS))
