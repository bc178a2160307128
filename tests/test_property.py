"""Property-based robustness: arbitrary (including malformed) HTML must
never crash extraction, and outputs must satisfy the span invariants:
offsets are contiguous from 0, kinds are from the closed set, text/ref
nullability follows the kind, and extraction is deterministic."""

import string

from hypothesis import given, settings, strategies as st

from html_to_document_spark.core.extract import (
    IMAGE,
    PAGEBREAK,
    TABLE,
    TEXT,
    extract_document,
)
from html_to_document_spark.core.serializer import serialize_spans

KINDS = {TEXT, IMAGE, TABLE, PAGEBREAK}

text_chunk = st.text(
    alphabet=string.ascii_letters + string.digits + " \n\t&<>\"'/.-",
    max_size=40,
)
tag = st.sampled_from(
    "p div span ul ol li table tr td th h1 h3 pre br img hr a strong "
    "section nav script style blockquote custom-x dl dt dd".split()
)


@st.composite
def html_fragment(draw, depth=0):
    kind = draw(st.integers(0, 3 if depth < 4 else 1))
    if kind == 0:
        return draw(text_chunk)
    if kind == 1:
        t = draw(tag)
        return f"<{t}>" if draw(st.booleans()) else f"</{t}>"
    t = draw(tag)
    inner = "".join(
        draw(html_fragment(depth=depth + 1))  # type: ignore[misc]
        for _ in range(draw(st.integers(0, 3)))
    )
    attrs = ' class="a b" style="color: red"' if draw(st.booleans()) else ""
    return f"<{t}{attrs}>{inner}</{t}>"


@st.composite
def html_doc(draw):
    return "".join(draw(html_fragment()) for _ in range(draw(st.integers(0, 6))))


@given(html_doc())
@settings(max_examples=300, deadline=None)
def test_extract_never_crashes_and_invariants(html):
    spans = extract_document(html)
    for i, (kind, text, ref, offset) in enumerate(spans):
        assert offset == i
        assert kind in KINDS
        if kind == TEXT or kind == TABLE:
            assert isinstance(text, str) and ref is None
        else:
            assert text is None
    # determinism
    assert extract_document(html) == spans
    # serializer accepts any valid span list
    serialize_spans(spans)


@given(html_doc())
@settings(max_examples=100, deadline=None)
def test_serializer_fixpoint(html):
    """serialize∘extract is a fixpoint after one application whenever
    the table cells survive linearization (always true for generated
    docs without tab/newline-bearing cells)."""
    spans1 = extract_document(html)
    if any(
        k == TABLE and any(ch in c for row in (t or "").split("\n")
                           for c in row.split("\t") for ch in "\t\n")
        for (k, t, _, _) in spans1
    ):
        return
    # whitespace-only text spans (e.g. a bare <br>) are erased by the
    # minify inter-tag rule on re-parse — inherent to the reference's
    # `>\s+<` pass; exclude them from the fixpoint property
    if any(k == TEXT and t and not t.strip() for (k, t, _, _) in spans1):
        return
    spans2 = extract_document(serialize_spans(spans1))
    assert spans2 == spans1


# ---------------------------------------------------------------------------
# round-2 additions: typed-serializer meta fixpoint and quote-aware
# tokenizer fuzz
# ---------------------------------------------------------------------------

_WORD = st.text(alphabet="abcdefgxyz", min_size=1, max_size=6)


@st.composite
def structured_html(draw):
    """Canonical structured fragments (single-space words) hitting the
    serializer's TYPED paths: headings, paragraphs, nested lists,
    tables with optional thead, hr, images."""
    parts = []
    for _ in range(draw(st.integers(1, 5))):
        kind = draw(st.sampled_from(
            ["h", "p", "list", "table", "hr", "img"]))
        words = " ".join(draw(st.lists(_WORD, min_size=1, max_size=4)))
        if kind == "h":
            lvl = draw(st.integers(1, 6))
            parts.append(f"<h{lvl}>{words}</h{lvl}>")
        elif kind == "p":
            parts.append(f"<p>{words}</p>")
        elif kind == "list":
            tag = draw(st.sampled_from(["ul", "ol"]))
            items = draw(st.lists(_WORD, min_size=1, max_size=3))
            inner = "".join(f"<li>{w}</li>" for w in items)
            nested = draw(st.booleans())
            if nested:
                sub = draw(st.sampled_from(["ul", "ol"]))
                inner += f"<li>{draw(_WORD)}<{sub}><li>{draw(_WORD)}</li></{sub}></li>"
            parts.append(f"<{tag}>{inner}</{tag}>")
        elif kind == "table":
            head = draw(st.booleans())
            h = f"<thead><tr><th>{draw(_WORD)}</th></tr></thead>" if head else ""
            parts.append(
                f"<table>{h}<tr><td>{draw(_WORD)}</td><td>{words}</td></tr></table>"
            )
        elif kind == "hr":
            parts.append("<hr>")
        else:
            parts.append(f'<img src="media://{draw(_WORD)}">')
    return "".join(parts)


@given(structured_html())
@settings(max_examples=200, deadline=None)
def test_typed_serializer_meta_fixpoint(html):
    """extract∘serialize is the identity on meta-bearing spans for
    generated structured HTML (all typed serializer paths)."""
    from html_to_document_spark.core.extract import ExtractOptions

    opts = ExtractOptions(with_meta=True)
    spans1 = extract_document(html, opts)
    html2 = serialize_spans(spans1)
    spans2 = extract_document(html2, opts)
    assert spans2 == spans1, f"serialized: {html2!r}"


_ATTR_VAL = st.text(
    alphabet="ab> /='\"<", min_size=0, max_size=8
)


@given(_WORD, _ATTR_VAL, _WORD)
@settings(max_examples=200, deadline=None)
def test_tokenizer_quoted_attr_fuzz(attr_word, val, text_word):
    """Quote-aware tokenizer: for any double-quoted attribute value
    without a double quote inside, the tag parses whole and no attr
    garbage leaks into extracted text."""
    from html_to_document_spark.core.dom import parse_html

    val = val.replace('"', "")
    html = f'<p><a title="{val}" id="{attr_word}">{text_word}</a></p>'
    nodes = parse_html(html)
    assert nodes[0][0] == "p"
    a = nodes[0][2][0]
    assert a[0] == "a"
    assert a[1]["id"] == attr_word
    assert a[2] == [("#text", text_word)]
