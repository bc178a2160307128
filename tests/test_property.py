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
